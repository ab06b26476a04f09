"""Goldilocks BFV e2e across the reference config matrix.

Reference parity: generate_sk_enc_test! instantiations
(sk_encryption_circuit.rs:552-586): 2048_1x52, 4096_2x55, 8192_4x55 on the
mounted fixtures, plus self-generated 16384_8x54 / 32768_16x59 (fixture
JSONs for those are stripped from the mount, .MISSING_LARGE_BLOBS).

Tiering: these are full-scale proves on the CPU test backend — gated behind
HYPERGRECO_SLOW=1 (the 1024 config runs un-gated in test_bfv_e2e.py; the
TPU bench exercises every config at speed).
"""

import os

import pytest

from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json

DATA = "/root/reference/bfv-gkr/src/data/goldilocks"

SLOW = os.environ.get("HYPERGRECO_SLOW") == "1"
pytestmark = [
    pytest.mark.skipif(
        not SLOW, reason="full-scale e2e proves; set HYPERGRECO_SLOW=1"
    ),
    pytest.mark.slow,
]

FIXTURE_CONFIGS = [
    C.SK_ENC_2048_1x52,
    C.SK_ENC_4096_2x55,
    C.SK_ENC_8192_4x55,
]


def _run_e2e(params, args):
    bfv = BfvEncrypt(params)
    pk, vk = bfv.setup()
    proof = bfv.prove(args, pk, device=False)
    inputs_dense, _ = bfv.get_inputs(args)
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
    return proof


@pytest.mark.parametrize(
    "params", FIXTURE_CONFIGS, ids=lambda p: p.name
)
def test_sk_enc_valid_fixture(params):
    path = os.path.join(DATA, params.name + ".json")
    if not os.path.exists(path):
        pytest.skip("reference fixture not mounted")
    _run_e2e(params, load_witness_json(path))


@pytest.mark.parametrize("n_qis", [(16384, 8), (32768, 16)])
def test_sk_enc_valid_generated(n_qis):
    """Configs whose reference fixtures are stripped: prove a freshly
    generated witness under the reference parameter sets."""
    from hypergreco_tpu.models.bfv.witness_gen import generate_witness

    n, k = n_qis
    params = {8: C.SK_ENC_16384_8x54, 16: C.SK_ENC_32768_16x59}[k]
    args, consts = generate_witness(n, list(params.QIS), seed=1)
    assert consts.K == params.K
    _run_e2e(params, args)
