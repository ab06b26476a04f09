"""Profile host verify from a saved proof (scratch/proofs/<key>.bin)."""
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
from hypergreco_tpu import runtime

runtime.init()

from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

key = sys.argv[1] if len(sys.argv) > 1 else "gl1024"
nprof = int(sys.argv[2]) if len(sys.argv) > 2 else 30
CONFIGS = {
    "gl1024": ("goldilocks", "SK_ENC_1024_1x27"),
    "gl2048": ("goldilocks", "SK_ENC_2048_1x52"),
    "gl4096": ("goldilocks", "SK_ENC_4096_2x55"),
    "gl8192": ("goldilocks", "SK_ENC_8192_4x55"),
    "gl16384": ("goldilocks", "SK_ENC_16384_8x54"),
    "gl32768": ("goldilocks", "SK_ENC_32768_16x59"),
    "bn1024": ("bn254", "SK_ENC_1024_1x27"),
    "bn2048": ("bn254", "SK_ENC_2048_1x52"),
    "bn4096": ("bn254", "SK_ENC_4096_2x55"),
}
field, pname = CONFIGS[key]
params = getattr(C, pname)
be = get_backend(field)

DATA = "/root/reference/bfv-gkr/src/data"
fixture = os.path.join(DATA, field, params.name + ".json")
if not os.path.exists(fixture):
    fixture = os.path.join(
        "/root/repo/fixtures", f"{field}_{params.name.lower()}_65537.json"
    )
    if not os.path.exists(fixture):
        fixture = os.path.join("/root/repo/fixtures", f"{field}_{params.name}.json")
args = load_witness_json(fixture)
with open(f"/root/repo/scratch/proofs/{key}.bin", "rb") as f:
    proof = f.read()

bfv = BfvEncrypt(params, be=be)
pk, vk = bfv.setup()
inputs_dense, _ = bfv.get_inputs(args)

for i in range(3):
    t0 = time.time()
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
    print(f"verify[{i}]: {time.time()-t0:.4f}s", flush=True)

pr = cProfile.Profile()
pr.enable()
bfv.verify(vk, inputs_dense, args["ct0is"], proof)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(nprof)
st.sort_stats("tottime").print_stats(20)
