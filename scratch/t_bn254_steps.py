import sys, time
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
from hypergreco_tpu import runtime; runtime.init()
import os; os.environ["HYPERGRECO_TRACE"]="1"
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness
from hypergreco_tpu.ops import bn254
from hypergreco_tpu.ops.fe import get_backend

t0=time.time()
args, consts = generate_witness(64, [82638181], seed=5, p=bn254.P)
print("witness gen:", time.time()-t0, flush=True)
be = get_backend("bn254")
bfv = BfvEncrypt(consts, be=be)
pk, vk = bfv.setup()
print("setup done", flush=True)
t0=time.time(); proof = bfv.prove(args, pk, device=False); print("bn254 host prove:", time.time()-t0, flush=True)
inputs_dense, _ = bfv.get_inputs(args)
t0=time.time(); assert bfv.verify(vk, inputs_dense, args["ct0is"], proof); print("bn254 verify:", time.time()-t0, flush=True)
