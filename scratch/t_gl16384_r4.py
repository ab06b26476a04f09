import sys, time, os
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

key = os.environ.get("CFG", "gl16384")
P = {"gl8192": C.SK_ENC_8192_4x55, "gl16384": C.SK_ENC_16384_8x54, "gl32768": C.SK_ENC_32768_16x59}[key]
fx = "/root/repo/fixtures/goldilocks_%s.json" % P.name
if not os.path.exists(fx):
    fx = "/root/reference/bfv-gkr/src/data/goldilocks/%s.json" % P.name
args = load_witness_json(fx)
be = get_backend("goldilocks")
bfv = BfvEncrypt(P, be=be)
pk, vk = bfv.setup()
circuit = bfv._circuit(pk)
inputs_dense, _ = bfv.get_inputs(args)
inputs = [be.from_ints(x) for x in inputs_dense]
t0=time.time(); jax.block_until_ready(circuit.evaluate(inputs)); print("witness warm: %.1f" % (time.time()-t0), flush=True)
t0=time.time(); jax.block_until_ready(circuit.evaluate(inputs)); print("witness steady: %.2f" % (time.time()-t0), flush=True)
t0=time.time(); bfv.prove(args, pk, device=True); print("prove warm: %.1f" % (time.time()-t0), flush=True)
for i in range(2):
    t0=time.time(); proof = bfv.prove(args, pk, device=True); print("prove steady %d: %.3f" % (i, time.time()-t0), flush=True)
t0=time.time(); ok = bfv.verify(vk, inputs_dense, args["ct0is"], proof); print("verify: %.2f ok=%s bytes=%d" % (time.time()-t0, ok, len(proof)))
