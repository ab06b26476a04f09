"""Verify timing under BENCH conditions (typed inputs, parsed ct0is)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hypergreco_tpu import runtime
runtime.init()
import numpy as np
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

key = sys.argv[1]
CONFIGS = {
    "gl1024": ("goldilocks", "SK_ENC_1024_1x27", 0.0109),
    "gl2048": ("goldilocks", "SK_ENC_2048_1x52", 0.00984),
    "gl4096": ("goldilocks", "SK_ENC_4096_2x55", 0.0108),
    "gl8192": ("goldilocks", "SK_ENC_8192_4x55", 0.0209),
    "gl16384": ("goldilocks", "SK_ENC_16384_8x54", 0.0849),
    "gl32768": ("goldilocks", "SK_ENC_32768_16x59", 0.1079),
    "bn1024": ("bn254", "SK_ENC_1024_1x27", 0.022),
}
field, pname, base = CONFIGS[key]
params = getattr(C, pname)
be = get_backend(field)
fx = f"/root/reference/bfv-gkr/src/data/{field}/{params.name}.json"
if not os.path.exists(fx):
    fx = f"/root/repo/fixtures/{field}_{params.name}.json"
args = load_witness_json(fx)
proof = open(f"/root/repo/scratch/proofs/{key}.bin", "rb").read()
bfv = BfvEncrypt(params, be=be)
pk, vk = bfv.setup()
inputs_dense, _ = bfv.get_inputs(args)
ct0is = [[int(x) for x in ct] for ct in args["ct0is"]]
iv = [np.asarray(x, dtype=np.uint64) for x in inputs_dense] if field == "goldilocks" else inputs_dense
for i in range(4):
    t0 = time.time()
    assert bfv.verify(vk, iv, ct0is, proof)
    dt = time.time() - t0
    print(f"{key} verify[{i}]: {dt*1e3:.1f}ms  vs_baseline={base/dt:.2f}", flush=True)
