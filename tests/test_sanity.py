"""Sanity-check mode (HYPERGRECO_SANITY=1): internal prover equalities.

Parity with the reference's `sanity-check` cargo feature
(lasso/Cargo.toml:27-28): collation claim vs direct evaluation
(lasso.rs:265-267), grand-product root cross-check (prover.rs:207-211),
multiset-hash balance (prover.rs:136-141). Runs a full tiny-config BFV
prove/verify with every check active.
"""

from hypergreco_tpu import runtime
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness


def test_sanity_flag(monkeypatch):
    monkeypatch.delenv("HYPERGRECO_SANITY", raising=False)
    assert not runtime.sanity_enabled()
    monkeypatch.setenv("HYPERGRECO_SANITY", "1")
    assert runtime.sanity_enabled()


def test_sanity_mode_e2e_tiny(monkeypatch):
    monkeypatch.setenv("HYPERGRECO_SANITY", "1")
    args, consts = generate_witness(64, [82638181], seed=5)
    bfv = BfvEncrypt(consts)
    pk, vk = bfv.setup()
    proof = bfv.prove(args, pk, device=False)
    inputs_dense, _ = bfv.get_inputs(args)
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
