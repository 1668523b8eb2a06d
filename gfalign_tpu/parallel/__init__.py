from .mesh import make_mesh, default_mesh_shape
from .score_step import sharded_scoring_step, make_sharded_scorer
