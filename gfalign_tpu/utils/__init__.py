from .fmt import CoutState, cout, gfa_round, label
from .log import Log, lg
