import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ["HYPERGRECO_TRACE"] = "1"
os.environ["HYPERGRECO_SYNC_SPANS"] = "1"
from hypergreco_tpu import runtime
runtime.init()
import jax
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils import tracing

args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=get_backend("goldilocks"))
pk, vk = bfv.setup()
t0=time.time(); bfv.prove(args, pk, device=True); print("warm:", time.time()-t0)
tracing.reset()
t0=time.time(); proof = bfv.prove(args, pk, device=True); print("steady SYNC prove:", time.time()-t0)
