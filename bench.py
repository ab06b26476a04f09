#!/usr/bin/env python
"""Benchmark: BFV sk-encryption setup/witness/prove/verify across configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, "configs": {...}}

- headline metric = Goldilocks 1024_1x27 steady-state prove time;
  vs_baseline = reference_time / our_time (>1 = faster than the reference's
  Apple M1 numbers, BASELINE.md / README.md:39-56).
- "configs" holds per-config {witness_s, prove_s, verify_s, proof_bytes,
  vs_baseline_prove} for every config that fit in the time budget
  (HYPERGRECO_BENCH_BUDGET seconds, default 2700). Partial results are
  flushed to BENCH_PARTIAL.json after every config.

Config list: HYPERGRECO_BENCH_CONFIGS, comma-separated, default
"gl1024,gl2048,gl4096,gl8192,bn1024,gl32768". Reference fixtures are used
when mounted; otherwise witnesses come from the native generator.

Measures steady-state proving (second run in-process: compiled programs and
wiring caches warm — the serving configuration) on whatever device jax
selects (real TPU under axon; CPU otherwise).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hypergreco_tpu import runtime

runtime.init()

import jax

from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

DATA = "/root/reference/bfv-gkr/src/data"

# (key, field, params, baseline {witness, prove, verify} seconds — README.md)
CONFIGS = {
    "gl1024": ("goldilocks", C.SK_ENC_1024_1x27, 0.00723, 0.103, 0.0109),
    "gl2048": ("goldilocks", C.SK_ENC_2048_1x52, 0.0119, 0.159, 0.00984),
    "gl4096": ("goldilocks", C.SK_ENC_4096_2x55, 0.02473, 0.265, 0.0108),
    "gl8192": ("goldilocks", C.SK_ENC_8192_4x55, 0.0815, 0.588, 0.0209),
    "gl16384": ("goldilocks", C.SK_ENC_16384_8x54, 0.310, 1.51, 0.0849),
    "gl32768": ("goldilocks", C.SK_ENC_32768_16x59, 1.04, 5.06, 0.1079),
    "bn1024": ("bn254", C.SK_ENC_1024_1x27, 0.039, 0.236, 0.022),
    "bn2048": ("bn254", C.SK_ENC_2048_1x52, 0.0778, 0.308, 0.0101),
    "bn4096": ("bn254", C.SK_ENC_4096_2x55, 0.2322, 0.575, 0.0163),
}

DEFAULT = "gl1024,gl2048,gl4096,gl8192,gl16384,gl32768,bn1024"


def _load_args(field: str, params) -> dict:
    fixture = os.path.join(DATA, field, params.name + ".json")
    if os.path.exists(fixture):
        return load_witness_json(fixture)
    cached = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures",
        f"{field}_{params.name}.json",
    )
    if os.path.exists(cached):
        return load_witness_json(cached)
    from hypergreco_tpu.models.bfv.witness_gen import generate_witness
    from hypergreco_tpu.ops import bn254

    p = bn254.P if field == "bn254" else (1 << 64) - (1 << 32) + 1
    args, _ = generate_witness(params.N, list(params.QIS), seed=0, p=p)
    os.makedirs(os.path.dirname(cached), exist_ok=True)
    with open(cached, "w") as f:
        json.dump(args, f)
    return args


def run_config(key: str) -> dict:
    field, params, b_wit, b_prove, b_verify = CONFIGS[key]
    be = get_backend(field)
    args = _load_args(field, params)
    bfv = BfvEncrypt(params, be=be)
    pk, vk = bfv.setup()

    # witness phase (JSON -> padded MLEs -> full circuit evaluation)
    circuit = bfv._circuit(pk)
    inputs_dense, _ = bfv.get_inputs(args)
    inputs = [be.from_ints(x) for x in inputs_dense]
    jax.block_until_ready(circuit.evaluate(inputs))  # warm
    t0 = time.time()
    inputs_dense2, _ = bfv.get_inputs(args)
    inputs2 = [be.from_ints(x) for x in inputs_dense2]
    jax.block_until_ready(circuit.evaluate(inputs2))
    witness_s = time.time() - t0

    # warmup: trace + compile (persistent-cache backed); fall back to the
    # host-transcript prover if the device-resident path fails — the fallback
    # is RECORDED (path + error), never silent
    device, fallback_error = True, None
    try:
        bfv.prove(args, pk, device=device)
    except Exception as e:
        device = False
        fallback_error = f"{type(e).__name__}: {e}"[:300]
        bfv.prove(args, pk, device=device)
    t0 = time.time()
    proof = bfv.prove(args, pk, device=device)
    prove_s = time.time() - t0

    bfv.verify(vk, inputs_dense, args["ct0is"], proof)  # warm
    t0 = time.time()
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
    verify_s = time.time() - t0

    out = {
        "witness_s": round(witness_s, 4),
        "prove_s": round(prove_s, 4),
        "verify_s": round(verify_s, 4),
        "proof_bytes": len(proof),
        "path": "device" if device else "host",
        "vs_baseline_witness": round(b_wit / witness_s, 4),
        "vs_baseline_prove": round(b_prove / prove_s, 4),
        "vs_baseline_verify": round(b_verify / verify_s, 4),
    }
    if fallback_error:
        out["device_path_error"] = fallback_error
    return out


def main():
    budget = float(os.environ.get("HYPERGRECO_BENCH_BUDGET", "2700"))
    keys = os.environ.get("HYPERGRECO_BENCH_CONFIGS", DEFAULT).split(",")
    t_start = time.time()
    results, errors = {}, {}
    for key in keys:
        key = key.strip()
        if not key:
            continue
        if results and time.time() - t_start > budget:
            errors[key] = "skipped: time budget exhausted"
            continue
        try:
            results[key] = run_config(key)
        except Exception as e:  # keep earlier configs' numbers
            errors[key] = f"{type(e).__name__}: {e}"[:300]
        partial = {"configs": results, "errors": errors}
        with open("BENCH_PARTIAL.json", "w") as f:
            json.dump(partial, f, indent=1)

    head = results.get("gl1024")
    out = {
        "metric": "bfv_sk_enc_1024_1x27_goldilocks_prove",
        "value": head["prove_s"] if head else None,
        "unit": "s",
        "vs_baseline": head["vs_baseline_prove"] if head else 0.0,
        "configs": results,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
