import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.gkr.dgrand_product import _gp_build_jit, _gp_loop_jit
import random

be = get_backend("goldilocks")
rng = random.Random(1)
cap = 1 << 17
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
probe("inputs")

# replicate Circuit.evaluate node by node
values = [None] * len(circuit.nodes)
it = iter(inputs)
for nid in circuit.topo_order():
    node = circuit.nodes[nid]
    if node.is_input():
        values[nid] = next(it)
        continue
    ins = [values[j] for j in circuit.node_inputs[nid]]
    values[nid] = node.evaluate(be, ins)
    jax.block_until_ready(jax.tree.leaves(values[nid]))
    probe(f"node {nid} {type(node).__name__}")
