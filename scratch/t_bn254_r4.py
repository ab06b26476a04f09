import sys, time, os
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.ops import bn254

n = int(os.environ.get("N", "64"))
t0=time.time()
args, consts = generate_witness(n, [82638181], seed=7, p=bn254.P)
print("witness gen: %.1fs" % (time.time()-t0), flush=True)
be = get_backend("bn254")
bfv = BfvEncrypt(consts, be=be)
pk, vk = bfv.setup()
t0=time.time(); ph = bfv.prove(args, pk, device=True); print("bn254 dev prove warm: %.1fs, %d bytes" % (time.time()-t0, len(ph)), flush=True)
t0=time.time(); ph = bfv.prove(args, pk, device=True); print("bn254 dev prove steady: %.2fs" % (time.time()-t0), flush=True)
inputs_dense, _ = bfv.get_inputs(args)
t0=time.time()
assert bfv.verify(vk, inputs_dense, args["ct0is"], ph)
print("verify: %.2fs OK" % (time.time()-t0))
