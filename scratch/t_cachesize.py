import sys, os, time
sys.path.insert(0, "/root/repo")
cache = sys.argv[1]
os.environ["HYPERGRECO_JAX_CACHE"] = cache
from hypergreco_tpu import runtime
import jax
jax.config.update("jax_platforms", "cpu")
runtime.init()
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=get_backend("goldilocks"))
pk, vk = bfv.setup()
t0=time.time(); proof = bfv.prove(args, pk, device=True); print("cold prove: %.1fs" % (time.time()-t0))
inputs_dense, _ = bfv.get_inputs(args)
assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
print("verify ok, proof bytes:", len(proof))
