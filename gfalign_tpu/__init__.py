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


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: remote-compile transports on the
    TPU tunnel cost 30-70 s PER KERNEL SHAPE, dominating short runs (a
    10-shape align pass pays ~5 min of pure compilation).  The on-disk
    cache makes every shape a one-time cost across processes (measured:
    35 s cold -> <0.1 s cached load).  Opt out with
    GFALIGN_TPU_NO_COMPILE_CACHE=1; cache dir override via
    GFALIGN_TPU_COMPILE_CACHE_DIR."""
    import os

    if os.environ.get("GFALIGN_TPU_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "GFALIGN_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"))
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - jax absent or too old
        pass


_enable_compile_cache()
