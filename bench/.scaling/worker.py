
import io, sys, time
sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
if nproc > 1:
    jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                               num_processes=nproc, process_id=pid)
from gfalign_tpu.engine.alignments import AlignmentSet
from gfalign_tpu.engine.search import search
from gfalign_tpu.io.gfa import read_gfa

graph = read_gfa('bench/.scaling/graph.gfa')
aln = AlignmentSet()
# same axis selection as the CLI (cli/main.py): thin read sets replicate
# the reads and shard the frontier; large ones shard the reads
from gfalign_tpu.engine.evaluate import FRONTIER_SHARD_MAX_READS
n_rec = sum(1 for ln in open('bench/.scaling/tangle.gaf', "rb") if ln.strip())
frontier_shard = nproc > 1 and n_rec <= FRONTIER_SHARD_MAX_READS
shard = (pid, nproc) if nproc > 1 and not frontier_shard else None
aln.load('bench/.scaling/tangle.gaf', shard=shard, shard_by="qname")
out = io.StringIO()
# evaluate_fn=None lets the engine pick its fast path (native driver on
# CPU); distributed runs pass the sharding evaluator, whose calls the
# native driver absorbs when the shm exchange is up (eval_s then stays 0
# and the total is the meaningful number)
eval_s = [0.0]
evaluate_fn = None
if nproc > 1:
    from gfalign_tpu.engine.evaluate import (distributed_evaluator,
                                             frontier_sharded_evaluator)
    base_fn = (frontier_sharded_evaluator() if frontier_shard
               else distributed_evaluator())
    def evaluate_fn(*a, **kw):
        t = time.perf_counter()
        try:
            return base_fn(*a, **kw)
        finally:
            eval_s[0] += time.perf_counter() - t
    evaluate_fn.frontier_sharded = getattr(base_fn, "frontier_sharded",
                                           False)
    evaluate_fn.read_sharded = getattr(base_fn, "read_sharded", False)
t0 = time.perf_counter()
search(graph, aln, 'bench/.scaling/search_nodelist.tsv', '497', '504',
       max_steps=2000, out=out, evaluate_fn=evaluate_fn)
dt = time.perf_counter() - t0
import hashlib
print("RESULT", dt)
print("EVAL", eval_s[0])
print("HASH", hashlib.sha256(out.getvalue().encode()).hexdigest(),
      len(out.getvalue()))
