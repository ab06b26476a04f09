import sys, json, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.witness_gen import generate_witness
for pname in ("SK_ENC_16384_8x54", "SK_ENC_32768_16x59"):
    params = getattr(C, pname)
    out = f"/root/repo/fixtures/goldilocks_{params.name}.json"
    import os
    if os.path.exists(out):
        print("exists", out); continue
    t0 = time.time()
    args, _ = generate_witness(params.N, list(params.QIS), seed=0, p=(1 << 64) - (1 << 32) + 1)
    with open(out, "w") as f:
        json.dump(args, f)
    print(f"{pname}: {time.time()-t0:.1f}s -> {out}", flush=True)
