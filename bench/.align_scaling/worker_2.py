
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if nproc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
else:
    from gfalign_tpu.io import native
    native.set_threads(1)
from gfalign_tpu.io.gfa import read_gfa
from gfalign_tpu.io.fastq import load_reads
from gfalign_tpu.engine.graph_align import (PRESETS, align_reads,
                                            align_reads_distributed,
                                            emit_gaf)
t0 = time.perf_counter()
graph = read_gfa('/root/repo/bench/.workload/graph.gfa')
reads = load_reads(['/root/repo/bench/.align_scaling/reads_sub.fq'])
params = PRESETS["hifi"]
prep_s = time.perf_counter() - t0
t0 = time.perf_counter()
if nproc > 1:
    text = align_reads_distributed(graph, reads, params, (pid, nproc))
else:
    import io as _io
    buf = _io.StringIO()
    emit_gaf(align_reads(graph, reads, params=params), buf.write)
    text = buf.getvalue()
dt = time.perf_counter() - t0
if pid == 0:
    with open('/root/repo/bench/.align_scaling/dist.gaf', "w") as fh:
        fh.write(text)
    print(f"ALIGN_T {dt:.3f} PREP {prep_s:.3f}")
