"""BFV sk-encryption end-to-end on the reference witness fixture.

Mirrors the reference's integration spine (generate_sk_enc_test!,
bfv-gkr/src/test.rs + sk_encryption_circuit.rs:552-626): load witness JSON,
setup -> prove -> verify. The reference fixtures under
/root/reference/bfv-gkr/src/data are read-only test vectors."""

import os

import pytest

from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.models.bfv.constants import SK_ENC_1024_1x27

FIXTURE = (
    "/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json"
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not mounted"
)


@pytest.fixture(scope="module")
def setup_1024():
    args = load_witness_json(FIXTURE)
    bfv = BfvEncrypt(SK_ENC_1024_1x27)
    pk, vk = bfv.setup()
    return bfv, args, pk, vk


def test_sk_enc_valid_1024(setup_1024):
    bfv, args, pk, vk = setup_1024
    proof = bfv.prove(args, pk)
    inputs_dense, _ = bfv.get_inputs(args)
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)


def test_sk_enc_tampered_ct0is_rejected(setup_1024):
    bfv, args, pk, vk = setup_1024
    proof = bfv.prove(args, pk)
    inputs_dense, _ = bfv.get_inputs(args)
    bad_ct0is = [list(c) for c in args["ct0is"]]
    bad_ct0is[0][3] = str((int(bad_ct0is[0][3]) + 1))
    with pytest.raises(ValueError):
        bfv.verify(vk, inputs_dense, bad_ct0is, proof)


def test_sk_enc_corrupted_proof_rejected(setup_1024):
    bfv, args, pk, vk = setup_1024
    proof = bytearray(bfv.prove(args, pk))
    proof[100] ^= 0x01
    inputs_dense, _ = bfv.get_inputs(args)
    with pytest.raises(ValueError):
        bfv.verify(vk, inputs_dense, args["ct0is"], bytes(proof))


def test_sk_enc_self_generated_witness(setup_1024):
    """Native witness generator (no bfv-py): fresh encryption proves under
    the same parameter set (generator reproduces the reference constants
    exactly for these qis — see test_witness_gen)."""
    from hypergreco_tpu.models.bfv.witness_gen import generate_witness

    bfv, _, pk, vk = setup_1024
    args2, consts = generate_witness(1024, [82638181], seed=11)
    assert consts.R1_BOUNDS == SK_ENC_1024_1x27.R1_BOUNDS
    proof = bfv.prove(args2, pk)
    inputs_dense, _ = bfv.get_inputs(args2)
    assert bfv.verify(vk, inputs_dense, args2["ct0is"], proof)
