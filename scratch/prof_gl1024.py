import sys, os, time, json
sys.path.insert(0, "/root/repo")
os.environ["HYPERGRECO_TRACE"] = "1"
from hypergreco_tpu import runtime
runtime.init()
import jax
print("devices:", jax.devices())
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils import tracing

args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=get_backend("goldilocks"))
pk, vk = bfv.setup()

t0=time.time(); proof = bfv.prove(args, pk, device=True); print("warm-up prove (incl compile):", time.time()-t0)
tracing.reset()
t0=time.time(); proof = bfv.prove(args, pk, device=True); prove_s = time.time()-t0
print("steady prove:", prove_s)

inputs_dense, _ = bfv.get_inputs(args)
t0=time.time(); bfv.verify(vk, inputs_dense, args["ct0is"], proof); print("warm-up verify:", time.time()-t0)
tracing.reset()
t0=time.time(); assert bfv.verify(vk, inputs_dense, args["ct0is"], proof); verify_s = time.time()-t0
print("steady verify:", verify_s)
print("proof bytes:", len(proof))
