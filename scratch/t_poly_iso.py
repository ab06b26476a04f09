import sys, time, os
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

P = C.SK_ENC_16384_8x54
args = load_witness_json("/root/repo/fixtures/goldilocks_%s.json" % P.name)
be = get_backend("goldilocks")
bfv = BfvEncrypt(P, be=be)
pk, vk = bfv.setup()
circuit = bfv._circuit(pk)
inputs_dense, _ = bfv.get_inputs(args)
inputs = [be.from_ints(x) for x in inputs_dense]
values = circuit.evaluate(inputs)
jax.block_until_ready(jax.tree.leaves(values))
# find lasso node input
from hypergreco_tpu.gkr.circuit import LassoCircuitNode
nid = next(i for i, n in enumerate(circuit.nodes) if isinstance(n, LassoCircuitNode))
node = circuit.nodes[nid].inner
lin = values[circuit.node_inputs[nid][0]]
w, d = node.polynomialize(lin)  # warm/compile
jax.block_until_ready(jax.tree.leaves([x.__dict__ if hasattr(x,'__dict__') else x for x in d]))
for i in range(3):
    t0 = time.time()
    wits, dims = node.polynomialize(lin)
    jax.block_until_ready(jax.tree.leaves(dims))
    t1 = time.time()
    jax.block_until_ready(jax.tree.leaves([list(vars(wi).values()) if hasattr(wi,'__dict__') else wi for wi in wits]))
    print("poly dims sync: %.3f, full sync: %.3f" % (t1-t0, time.time()-t0), flush=True)
