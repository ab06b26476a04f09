"""Profile the host verifier (pure numpy) — where do the ms go?"""
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

key = sys.argv[1] if len(sys.argv) > 1 else "gl4096"
CONFIGS = {
    "gl1024": ("goldilocks", "SK_ENC_1024_1x27"),
    "gl4096": ("goldilocks", "SK_ENC_4096_2x55"),
    "gl16384": ("goldilocks", "SK_ENC_16384_8x54"),
    "bn1024": ("bn254", "SK_ENC_1024_1x27"),
}
field, pname = CONFIGS[key]
params = getattr(C, pname)
be = get_backend(field)

DATA = "/root/reference/bfv-gkr/src/data"
fixture = os.path.join(DATA, field, params.name + ".json")
if not os.path.exists(fixture):
    fixture = os.path.join("/root/repo/fixtures", f"{field}_{params.name}.json")
args = load_witness_json(fixture)

bfv = BfvEncrypt(params, be=be)
pk, vk = bfv.setup()
t0 = time.time()
proof = bfv.prove(args, pk, device=False)
print(f"prove(host): {time.time()-t0:.1f}s, {len(proof)} bytes", flush=True)
inputs_dense, _ = bfv.get_inputs(args)

t0 = time.time()
bfv.verify(vk, inputs_dense, args["ct0is"], proof)
t_warm = time.time() - t0
t0 = time.time()
bfv.verify(vk, inputs_dense, args["ct0is"], proof)
print(f"verify: warm1 {t_warm:.3f}s warm2 {time.time()-t0:.3f}s", flush=True)

pr = cProfile.Profile()
pr.enable()
bfv.verify(vk, inputs_dense, args["ct0is"], proof)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(30)
