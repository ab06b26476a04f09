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
rng = random.Random(1)
cap = 1 << 17

# reference probe: the gp loop on synthetic data (m=12, logl=13)
leaves = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << 13)])
          for _ in range(12)]
gb = _gp_build_jit(be.spec.name, 12, 13, False)
LVLs, w1s = gb(leaves)
jax.block_until_ready(jax.tree.leaves((LVLs, w1s)))
gl = _gp_loop_jit(be.spec.name, 12, 13, cap)

def probe(label, n=3):
    out = gl(LVLs, w1s, dt.new_dtx(cap))
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = gl(LVLs, w1s, dt.new_dtx(cap))
        jax.block_until_ready(jax.tree.leaves(out))
    print(f"probe after {label}: {(time.time()-t0)/n*1e3:.1f}ms", flush=True)

probe("start")

args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=be)
pk, vk = bfv.setup()
circuit = bfv._circuit(pk)
inputs_dense, ct0is_dense = bfv.get_inputs(args)
inputs = [be.from_ints(x) for x in inputs_dense]
probe("inputs upload")

values = circuit.evaluate(inputs)
jax.block_until_ready(jax.tree.leaves(values))
probe("circuit.evaluate")

for nid in circuit.topo_order():
    node = circuit.nodes[nid]
    if type(node).__name__ == "LassoCircuitNode":
        lasso, lid = node.inner, nid
lin = values[circuit.node_inputs[lid][0]]

wits, dims = lasso.polynomialize(lin)
jax.block_until_ready(jax.tree.leaves(dims))
probe("polynomialize")

wdicts = [dmc.witness_dict(w) for w in wits]
gamma = be.scalar(be.spec.ext(12345), ext=True)
tau = be.scalar(be.spec.ext(67890), ext=True)
M = len(wdicts)
logl = mle.num_vars(be, wdicts[0]["e"])
logm = mle.num_vars(be, wdicts[0]["final_cts"])
chunk_of = tuple(lasso.pp.memory_to_dimension_index)

# collation program
if not getattr(lasso, "_progs", {}).get("dprove"):
    out = lasso.prove_claim_reduction_device(lin, dt.new_dtx(cap))
    jax.block_until_ready(jax.tree.leaves(out))
probe("full lasso dprove (collation+MC warm)")

build1, loop1, sc, build2, loop2 = dmc._progs(
    be.spec.name, M, logl, logm, len(dims), chunk_of, False)
LVL1, w1 = build1(wdicts, gamma, tau)
jax.block_until_ready(jax.tree.leaves(LVL1))
probe("build1")
z1, dtx2 = loop1(LVL1, w1, dt.new_dtx(cap))
jax.block_until_ready(dtx2.log_len)
probe("loop1")
