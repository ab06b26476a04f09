import sys, time
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from hypergreco_tpu import runtime; runtime.init()
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness
from hypergreco_tpu.ops import bn254
from hypergreco_tpu.ops.fe import get_backend

args, consts = generate_witness(64, [82638181], seed=5, p=bn254.P)
be = get_backend("bn254")
bfv = BfvEncrypt(consts, be=be)
pk, vk = bfv.setup()
t0=time.time(); proof = bfv.prove(args, pk, device=False); print("bn254 host prove:", time.time()-t0)
inputs_dense, _ = bfv.get_inputs(args)
t0=time.time(); assert bfv.verify(vk, inputs_dense, args["ct0is"], proof); print("bn254 verify:", time.time()-t0)
t0=time.time(); proof2 = bfv.prove(args, pk, device=True); print("bn254 device prove:", time.time()-t0)
assert proof2 == proof, "device/host proof bytes differ"
print("bn254 tiny e2e OK; proof bytes:", len(proof))
