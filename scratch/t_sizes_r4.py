import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import circuit as gc

args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=get_backend("goldilocks"))
pk, vk = bfv.setup()
t0=time.time(); bfv.prove(args, pk, device=True); print("warm: %.1f" % (time.time()-t0), flush=True)
for i in range(3):
    t0=time.time(); p = bfv.prove(args, pk, device=True); print("steady %d: %.3f" % (i, time.time()-t0), flush=True)

# executable sizes of everything in the program cache
tot = 0
for k, fn in gc._PROG_CACHE.items():
    try:
        szs = [e.memory_analysis().generated_code_size_in_bytes for e in fn._cache_size and [] or []]
    except Exception:
        pass
print("prog cache entries:", len(gc._PROG_CACHE))
import jax._src.pjit as pj
# use the traced lowering size via cost analysis of cached executables
for k, fn in list(gc._PROG_CACHE.items()):
    try:
        cs = []
        for key, entry in getattr(fn, "_cache", {}).items():
            pass
    except Exception:
        pass
