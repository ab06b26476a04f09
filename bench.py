#!/usr/bin/env python
"""Benchmark: BFV sk-encryption setup/witness/prove/verify across configs.

Prints ONE JSON line per completed config (each a full, cumulative headline):
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, "configs": {...}}
The LAST printed line is the final result. Lines are flushed immediately, so
even if the process is killed mid-run the most recent line is a complete,
parseable headline covering every config measured so far.

- headline metric = Goldilocks 1024_1x27 steady-state prove time;
  vs_baseline = reference_time / our_time (>1 = faster than the reference's
  Apple M1 numbers, BASELINE.md / README.md:39-56).
- "configs" holds per-config {witness_s, prove_s, verify_s, proof_bytes,
  vs_baseline_*} for every config that fit the budget.

Isolation: each config runs in its OWN subprocess under a hard wall-clock
cap (HYPERGRECO_BENCH_CONFIG_TIMEOUT, default 900 s) so a hung compile or a
tunnel failure can never eat the whole window — the parent always exits 0
with whatever completed (the round-1..3 driver benches all died rc=124 with
zero output because one in-process config stalled past the driver's clock).
Compiled programs are shared between subprocesses via the persistent JAX
compilation cache (runtime.init), so isolation costs only process startup.

Config list: HYPERGRECO_BENCH_CONFIGS, comma-separated, default orders
cheapest-compile-first. Overall budget: HYPERGRECO_BENCH_BUDGET seconds
(default 2400); remaining configs are skipped (recorded) once exceeded.
Reference fixtures are used when mounted; otherwise witnesses come from the
native generator (cached under fixtures/).

Measures steady-state proving (second run in-process: compiled programs and
wiring caches warm — the serving configuration) on whatever device jax
selects (real TPU under axon; CPU otherwise).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

DATA = "/root/reference/bfv-gkr/src/data"

# (key, field, params-name, baseline {witness, prove, verify} s — README.md)
CONFIGS = {
    "gl1024": ("goldilocks", "SK_ENC_1024_1x27", 0.00723, 0.103, 0.0109),
    "gl2048": ("goldilocks", "SK_ENC_2048_1x52", 0.0119, 0.159, 0.00984),
    "gl4096": ("goldilocks", "SK_ENC_4096_2x55", 0.02473, 0.265, 0.0108),
    "gl8192": ("goldilocks", "SK_ENC_8192_4x55", 0.0815, 0.588, 0.0209),
    "gl16384": ("goldilocks", "SK_ENC_16384_8x54", 0.310, 1.51, 0.0849),
    "gl32768": ("goldilocks", "SK_ENC_32768_16x59", 1.04, 5.06, 0.1079),
    "bn1024": ("bn254", "SK_ENC_1024_1x27", 0.039, 0.236, 0.022),
    "bn2048": ("bn254", "SK_ENC_2048_1x52", 0.0778, 0.308, 0.0101),
    "bn4096": ("bn254", "SK_ENC_4096_2x55", 0.2322, 0.575, 0.0163),
}

# cheapest compiles first (VERDICT r3 #1a): the expensive shapes can time
# out without costing the small configs their numbers
DEFAULT = "gl1024,gl2048,gl4096,gl8192,bn1024,gl16384,gl32768"


def _load_args(field: str, params) -> dict:
    from hypergreco_tpu.models.bfv.circuit import load_witness_json

    fixture = os.path.join(DATA, field, params.name + ".json")
    if os.path.exists(fixture):
        return load_witness_json(fixture)
    cached = os.path.join(REPO, "fixtures", f"{field}_{params.name}.json")
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
    from hypergreco_tpu import runtime

    runtime.init()

    import jax

    from hypergreco_tpu.models.bfv import constants as C
    from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
    from hypergreco_tpu.ops.fe import get_backend

    field, pname, b_wit, b_prove, b_verify = CONFIGS[key]
    params = getattr(C, pname)
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


def _emit(results: dict, errors: dict):
    """Print the cumulative headline JSON line (flushed) + partial file."""
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
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "BENCH_PARTIAL.json"), "w") as f:
        json.dump({"configs": results, "errors": errors}, f, indent=1)


def main():
    budget = float(os.environ.get("HYPERGRECO_BENCH_BUDGET", "2400"))
    per_cfg = float(
        os.environ.get("HYPERGRECO_BENCH_CONFIG_TIMEOUT", "900")
    )
    keys = [
        k.strip()
        for k in os.environ.get("HYPERGRECO_BENCH_CONFIGS", DEFAULT).split(",")
        if k.strip()
    ]
    t_start = time.time()
    results, errors = {}, {}
    for key in keys:
        remaining = budget - (time.time() - t_start)
        if results and remaining < 30:
            errors[key] = "skipped: time budget exhausted"
            _emit(results, errors)
            continue
        cap = min(per_cfg, max(remaining, 60))
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--config", key],
                capture_output=True,
                text=True,
                timeout=cap,
                cwd=REPO,
                start_new_session=True,
            )
            if proc.returncode == 0:
                line = proc.stdout.strip().splitlines()[-1]
                results[key] = json.loads(line)
            else:
                tail = (proc.stderr or proc.stdout or "").strip()[-300:]
                errors[key] = f"rc={proc.returncode}: {tail}"
        except subprocess.TimeoutExpired:
            errors[key] = f"timeout after {cap:.0f}s (hard per-config cap)"
        except Exception as e:
            errors[key] = f"{type(e).__name__}: {e}"[:300]
        _emit(results, errors)
    if not results and not errors:
        _emit(results, errors)
    sys.exit(0)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--config":
        print(json.dumps(run_config(sys.argv[2])), flush=True)
    else:
        main()
