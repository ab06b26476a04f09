"""Multi-chip BFV prover: shard-count-invariant proof bytes.

The full prover (every node reduction, the Lasso collation, the
memory-checking sumcheck, and both grand-product trees) runs with its
sumcheck hypercubes sharded over an "hc" mesh axis; proof bytes must be
identical at 1/2/4/8 devices (SURVEY.md §4: shard-count-invariant
transcripts on the virtual CPU mesh).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_setup():
    args, consts = generate_witness(64, [82638181], seed=7)
    bfv = BfvEncrypt(consts)
    pk, vk = bfv.setup()
    proof_1 = bfv.prove(args, pk, device=False)
    return bfv, args, pk, vk, proof_1


def test_bfv_tiny_proof_size_pinned(tiny_setup):
    """Transcript-format pin for the n=64 tiny config (VERDICT r3 weak #8)."""
    _, _, _, _, proof_1 = tiny_setup
    assert len(proof_1) == 22464


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_bfv_proof_shard_count_invariant(tiny_setup, ndev):
    bfv, args, pk, vk, proof_1 = tiny_setup
    devices = jax.devices()[:ndev]
    if len(devices) < ndev:
        pytest.skip(f"need {ndev} virtual devices")
    mesh = Mesh(np.array(devices).reshape(ndev), ("hc",))
    proof_n = bfv.prove(args, pk, device=False, mesh=mesh)
    assert proof_n == proof_1


def test_bfv_mesh_proof_verifies(tiny_setup):
    bfv, args, pk, vk, proof_1 = tiny_setup
    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices).reshape(len(devices)), ("hc",))
    proof = bfv.prove(args, pk, device=False, mesh=mesh)
    inputs_dense, _ = bfv.get_inputs(args)
    assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
