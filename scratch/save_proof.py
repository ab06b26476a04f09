"""Prove one config (device path on whatever jax picks) and save the proof
bytes to scratch/proofs/<key>.bin for fast verifier iteration."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime

runtime.init()

from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

key = sys.argv[1]
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
if not os.path.exists(fixture):
    from hypergreco_tpu.models.bfv.witness_gen import generate_witness
    from hypergreco_tpu.ops import bn254
    import json

    p = bn254.P if field == "bn254" else (1 << 64) - (1 << 32) + 1
    args, _ = generate_witness(params.N, list(params.QIS), seed=0, p=p)
    with open(fixture, "w") as f:
        json.dump(args, f)
else:
    args = load_witness_json(fixture)

bfv = BfvEncrypt(params, be=be)
pk, vk = bfv.setup()
t0 = time.time()
proof = bfv.prove(args, pk, device=True)
t1 = time.time() - t0
t0 = time.time()
proof = bfv.prove(args, pk, device=True)
t2 = time.time() - t0
print(f"{key}: prove warm={t1:.2f}s steady={t2:.2f}s bytes={len(proof)}", flush=True)
os.makedirs("/root/repo/scratch/proofs", exist_ok=True)
with open(f"/root/repo/scratch/proofs/{key}.bin", "wb") as f:
    f.write(proof)
inputs_dense, _ = bfv.get_inputs(args)
t0 = time.time()
ok = bfv.verify(vk, inputs_dense, args["ct0is"], proof)
print(f"{key}: verify {time.time()-t0:.3f}s ok={ok}", flush=True)
