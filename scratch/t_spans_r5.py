import os, sys, time
os.environ["HYPERGRECO_SYNC_SPANS"] = "1"
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils import tracing
key = sys.argv[1] if len(sys.argv) > 1 else "gl1024"
NAMES = {"gl1024": "SK_ENC_1024_1x27", "gl4096": "SK_ENC_4096_2x55", "gl16384": "SK_ENC_16384_8x54", "gl32768": "SK_ENC_32768_16x59"}
params = getattr(C, NAMES[key])
be = get_backend("goldilocks")
fix = f"/root/reference/bfv-gkr/src/data/goldilocks/{params.name}.json"
if not os.path.exists(fix):
    fix = f"/root/repo/fixtures/goldilocks_{params.name}.json"
args = load_witness_json(fix)
bfv = BfvEncrypt(params, be=be)
pk, vk = bfv.setup()
bfv.prove(args, pk, device=True)  # warm
tracing.reset()
t0 = time.time()
bfv.prove(args, pk, device=True)
print(f"steady(sync spans) {time.time()-t0:.3f}s")
from hypergreco_tpu.utils.tracing import _TLS
for r in _TLS.roots:
    print("\n".join(r.render()))
