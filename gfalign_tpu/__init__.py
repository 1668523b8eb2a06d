"""gfalign-tpu: a TPU-native graph-alignment framework.

A from-scratch re-design of the capabilities of vgl-hub/gfalign (reference:
/root/reference) for TPU hardware.  The compute path is JAX/XLA/Pallas; the
host runtime (parsers, packers) has native C++ fast paths; parallelism is
expressed with jax.sharding meshes + collectives instead of threads.

Subpackages
-----------
io        GFA1/GFA2, GAF, FASTQ parsing -> packed tensors; writers
graph     graph model, name<->id vocab, adjacency, assembly statistics
ops       device kernels: batched NW path alignment, base-level DP
engine    the six subcommand engines (align/evalGFA/subgraph/search/filter/evalPath)
parallel  mesh construction, sharded scoring steps, collective reductions
cli       drop-in command-line surface mirroring the reference's flags
"""

__version__ = "0.1.0"
