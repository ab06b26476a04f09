import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.lasso import dmemory_checking as dmc
from hypergreco_tpu.ops import mle

be = get_backend("goldilocks")
args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=be)
pk, vk = bfv.setup()
circuit = bfv._circuit(pk)
inputs_dense, ct0is_dense = bfv.get_inputs(args)
inputs = [be.from_ints(x) for x in inputs_dense]
values = circuit.evaluate(inputs)

# find the lasso node
ln = None
for nid in circuit.topo_order():
    node = circuit.nodes[nid]
    if type(node).__name__ == "LassoCircuitNode":
        ln = node
        lid = nid
ins = circuit.node_inputs[lid]
lin = values[ins[0]]
lasso = ln.inner
print("num_vars", lasso.num_vars, "logm", lasso.logm,
      "num_memories", lasso.pp.num_memories, "num_chunks", lasso.num_chunks)

def timeit(label, fn, n=10):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(jax.tree.leaves(out))
    print(f"{label}: {(time.time()-t0)/n*1e3:.1f}ms")
    return out

wits, dims = timeit("polynomialize", lambda: lasso.polynomialize(lin))
wdicts = [dmc.witness_dict(w) for w in wits]

cap = 1 << 17
if not getattr(lasso, "_progs", {}).get("dprove"):
    out = lasso.prove_claim_reduction_device(lin, dt.new_dtx(cap))
    jax.block_until_ready(jax.tree.leaves(out))
prog = lasso._progs["dprove"]
dtx0 = dt.new_dtx(cap)
r, gamma, tau, dtx1 = timeit("collation prog", lambda: prog(lin, wdicts, dt.new_dtx(cap)))

M = len(wdicts)
logl = mle.num_vars(be, wdicts[0]["e"])
logm = mle.num_vars(be, wdicts[0]["final_cts"])
chunk_of = tuple(lasso.pp.memory_to_dimension_index)
build1, loop1, sc, build2, loop2 = dmc._progs(
    be.spec.name, M, logl, logm, len(dims), chunk_of, False)

LVL1, w1 = timeit("build1 (rw tree)", lambda: build1(wdicts, gamma, tau))
print("LVL1 shape:", jax.tree.leaves(LVL1)[0].shape)
z1, dtx2 = timeit("loop1 (rw layers)", lambda: loop1(LVL1, w1, dtx1))
dtx3 = timeit("sc (rw sumcheck)", lambda: sc(wdicts, dims, z1, gamma, tau, dtx2))
LVL2, w2 = timeit("build2 (if tree)", lambda: build2(wdicts, gamma, tau))
print("LVL2 shape:", jax.tree.leaves(LVL2)[0].shape)
dtx4 = timeit("loop2 (if layers + fc)", lambda: loop2(LVL2, w2, wdicts, dtx3))
