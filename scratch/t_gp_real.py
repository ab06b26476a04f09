import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.gkr.dgrand_product import _gp_build_jit, _gp_loop_jit
from hypergreco_tpu.lasso import dmemory_checking as dmc
from hypergreco_tpu.ops import mle
import random

be = get_backend("goldilocks")
args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=be)
pk, vk = bfv.setup()
circuit = bfv._circuit(pk)
inputs_dense, _ = bfv.get_inputs(args)
inputs = [be.from_ints(x) for x in inputs_dense]
values = circuit.evaluate(inputs)
for nid in circuit.topo_order():
    node = circuit.nodes[nid]
    if type(node).__name__ == "LassoCircuitNode":
        lasso, lid = node.inner, nid
lin = values[circuit.node_inputs[lid][0]]
cap = 1 << 17
out = lasso.prove_claim_reduction_device(lin, dt.new_dtx(cap))
jax.block_until_ready(jax.tree.leaves(out))

wits, dims = lasso.polynomialize(lin)
wdicts = [dmc.witness_dict(w) for w in wits]
M = len(wdicts)
logl = mle.num_vars(be, wdicts[0]["e"])
logm = mle.num_vars(be, wdicts[0]["final_cts"])
chunk_of = tuple(lasso.pp.memory_to_dimension_index)
build1, loop1, sc, build2, loop2 = dmc._progs(
    be.spec.name, M, logl, logm, len(dims), chunk_of, False)

def timeit(label, fn, n=5):
    out = fn(); jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(); jax.block_until_ready(jax.tree.leaves(out))
    print(f"{label}: {(time.time()-t0)/n*1e3:.1f}ms")
    return out

gamma = be.scalar(be.spec.ext(12345), ext=True)
tau = be.scalar(be.spec.ext(67890), ext=True)
LVL1, w1 = timeit("dmc build1 real", lambda: build1(wdicts, gamma, tau))
z1, dtx2 = timeit("dmc loop1 real (fresh dtx)",
                  lambda: loop1(LVL1, w1, dt.new_dtx(cap)))

# same program via _gp_loop_jit on the SAME LVL1/w1
m = 2 * M
gl = _gp_loop_jit(be.spec.name, M * 2, logl, cap)
timeit("_gp_loop_jit on real LVL1", lambda: gl(LVL1, w1, dt.new_dtx(cap)))

# synthetic LVL of same shape
rng = random.Random(1)
leaves = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << logl)])
          for _ in range(2 * M)]
gb = _gp_build_jit(be.spec.name, 2 * M, logl, False)
LVLs, w1s = gb(leaves)
jax.block_until_ready(jax.tree.leaves((LVLs, w1s)))
print("shapes:", jax.tree.leaves(LVL1)[0].shape, jax.tree.leaves(LVLs)[0].shape)
timeit("_gp_loop_jit synthetic", lambda: gl(LVLs, w1s, dt.new_dtx(cap)))
timeit("dmc loop1 synthetic", lambda: loop1(LVLs, w1s, dt.new_dtx(cap)))

# fresh re-jit of the dmc loop1 body (bypassing lru_cache + persistent cache key)
from hypergreco_tpu.gkr.dgrand_product import gp_layer_rounds
fresh = jax.jit(lambda LVL, w1, dtx: gp_layer_rounds(be, LVL, w1, logl, dtx))
timeit("fresh jit on real LVL1", lambda: fresh(LVL1, w1, dt.new_dtx(cap)))
timeit("dmc loop1 real AGAIN", lambda: loop1(LVL1, w1, dt.new_dtx(cap)))
# interleave: does order matter?
timeit("_gp_loop_jit real AGAIN", lambda: gl(LVL1, w1, dt.new_dtx(cap)))
