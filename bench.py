#!/usr/bin/env python
"""Benchmark: BFV sk-encryption proof generation (Goldilocks, n=1024, K=1).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}
vs_baseline = reference_time / our_time (>1 means faster than the
reference's Apple M1 number, BASELINE.md: proof gen 103 ms for this config).

Measures steady-state proving (second run in-process: compiled programs and
wiring caches warm — the serving configuration), on whatever device jax
selects (real TPU under axon; CPU otherwise).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hypergreco_tpu import runtime

runtime.init()

from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.models.bfv.constants import SK_ENC_1024_1x27

BASELINE_S = 0.103  # README.md:39 (Apple M1, 10 cores)

FIXTURE = (
    "/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json"
)


def main():
    if os.path.exists(FIXTURE):
        args = load_witness_json(FIXTURE)
    else:  # standalone: generate a fresh witness with the native generator
        from hypergreco_tpu.models.bfv.witness_gen import generate_witness

        args, _ = generate_witness(
            1024, list(SK_ENC_1024_1x27.QIS), seed=0
        )
    bfv = BfvEncrypt(SK_ENC_1024_1x27)
    pk, vk = bfv.setup()

    bfv.prove(args, pk)  # warmup: trace + compile (persistent-cache backed)

    t0 = time.time()
    proof = bfv.prove(args, pk)
    dt = time.time() - t0

    inputs_dense, _ = bfv.get_inputs(args)
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)

    print(
        json.dumps(
            {
                "metric": "bfv_sk_enc_1024_1x27_goldilocks_prove",
                "value": round(dt, 3),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / dt, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
