import sys, time
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from hypergreco_tpu import runtime; runtime.init()
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

args, consts = generate_witness(64, [82638181], seed=5)
bfv = BfvEncrypt(consts)
pk, vk = bfv.setup()
proof = bfv.prove(args, pk, device=False)
inputs_dense, _ = bfv.get_inputs(args)
t0=time.time()
assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
print("host verify OK", time.time()-t0)
t0=time.time()
assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
print("verify again", time.time()-t0)
# tamper
bad = bytearray(proof); bad[100] ^= 1
try:
    bfv.verify(vk, inputs_dense, args["ct0is"], bytes(bad)); print("TAMPER NOT DETECTED!!")
except Exception as e:
    print("tamper detected:", type(e).__name__, str(e)[:60])
