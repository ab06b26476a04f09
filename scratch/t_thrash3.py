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

tiny = jax.jit(lambda x: x + 1)
xs = jnp.zeros((8,), jnp.uint32)

def t(label, n=10):
    jax.block_until_ready(tiny(xs))
    t0 = time.time()
    for _ in range(n):
        out = tiny(xs)
    jax.block_until_ready(out)
    print(f"tiny after {label}: {(time.time()-t0)/n*1e3:.2f}ms", flush=True)

be = get_backend("goldilocks")
args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=be)
pk, vk = bfv.setup()
circuit = bfv._circuit(pk)
inputs_dense, ct0is_dense = bfv.get_inputs(args)
inputs = [be.from_ints(x) for x in inputs_dense]
t("inputs")
values = circuit.evaluate(inputs)
jax.block_until_ready(jax.tree.leaves(values))
t("circuit.evaluate (13 node programs)")

for nid in circuit.topo_order():
    node = circuit.nodes[nid]
    if type(node).__name__ == "LassoCircuitNode":
        lasso, lid = node.inner, nid
lin = values[circuit.node_inputs[lid][0]]

wits, dims = lasso.polynomialize(lin)
jax.block_until_ready(jax.tree.leaves(dims))
t("polynomialize")

cap = 1 << 17
wdicts = [dmc.witness_dict(w) for w in wits]
gamma = be.scalar(be.spec.ext(12345), ext=True)
tau = be.scalar(be.spec.ext(67890), ext=True)
M = len(wdicts)
logl = mle.num_vars(be, wdicts[0]["e"])
logm = mle.num_vars(be, wdicts[0]["final_cts"])
chunk_of = tuple(lasso.pp.memory_to_dimension_index)
build1, loop1, sc, build2, loop2 = dmc._progs(
    be.spec.name, M, logl, logm, len(dims), chunk_of, False)

LVL1, w1 = build1(wdicts, gamma, tau)
jax.block_until_ready(jax.tree.leaves(LVL1))
t("build1")
z1, dtx2 = loop1(LVL1, w1, dt.new_dtx(cap))
jax.block_until_ready(jax.tree.leaves(dtx2.log_len))
t("loop1")
dtx3 = sc(wdicts, dims, z1, gamma, tau, dtx2)
jax.block_until_ready(dtx3.log_len)
t("sc")
LVL2, w2 = build2(wdicts, gamma, tau)
jax.block_until_ready(jax.tree.leaves(LVL2))
t("build2")
dtx4 = loop2(LVL2, w2, wdicts, dtx3)
jax.block_until_ready(dtx4.log_len)
t("loop2")

from hypergreco_tpu.gkr.circuit import prove_gkr_device
point, dtxp = bfv._dpoint_jit if hasattr(bfv, "_dpoint_jit") else (None, None)
proof = bfv.prove(args, pk, device=True)
t("first full device prove")
proof = bfv.prove(args, pk, device=True)
t("second full device prove")

import gc
import hypergreco_tpu.gkr.circuit as gcirc
gcirc._PROG_CACHE.clear()
for n in circuit.nodes:
    if hasattr(n, "_progs"):
        n._progs.clear()
if hasattr(lasso, "_progs"):
    lasso._progs.clear()
lasso._poly_prog_cache = None
gc.collect()
t("after dropping node program refs")
jax.clear_caches()
gc.collect()
t("after jax.clear_caches()")
