"""Vectorized BFV circuit construction == per-gate reference builder.

configure() builds VanillaNode wiring with numpy index arithmetic (needed
at the 32768_16x59 scale: ~1M gates per node); configure_per_gate() is the
readable per-gate spec. This test checks the two produce elementwise-equal
wiring arrays, identical graph topology and identical Lasso lookups for
K=1 and K=2.
"""

import numpy as np
import pytest

from hypergreco_tpu.gkr.circuit import Circuit, FftNode, InputNode, VanillaNode
from hypergreco_tpu.lasso.node import LassoNode
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.constants import (
    SK_ENC_1024_1x27,
    SK_ENC_4096_2x55,
)


def _build_pair(params, K=None):
    bfv = BfvEncrypt(params, num_reps=K)
    pk, _ = bfv.setup()
    cv, cg = Circuit(bfv.be), Circuit(bfv.be)
    bfv.configure(cv, pk)
    bfv.configure_per_gate(cg, pk)
    return bfv, cv, cg


def _assert_same(bfv, cv, cg):
    assert len(cv.nodes) == len(cg.nodes)
    assert cv.node_inputs == cg.node_inputs
    p = bfv.be.spec.p
    for i, (nv, ng) in enumerate(zip(cv.nodes, cg.nodes)):
        assert type(nv).__name__ == type(ng).__name__, i
        if isinstance(nv, InputNode):
            assert (nv.log2_size, nv.num_reps) == (ng.log2_size, ng.num_reps)
        elif isinstance(nv, FftNode):
            assert (nv.log2_size, nv.inverse) == (ng.log2_size, ng.inverse)
        elif isinstance(nv, VanillaNode):
            assert (nv.P, nv.log2_sub, nv.R, nv.G) == (
                ng.P, ng.log2_sub, ng.R, ng.G,
            ), i
            cst_v, lin_v, quad_v = nv._build_wiring(p)
            cst_g, lin_g, quad_g = ng._build_wiring(p)
            np.testing.assert_array_equal(cst_v, cst_g, err_msg=f"node {i}")
            assert len(lin_v) == len(lin_g) and len(quad_v) == len(quad_g)
            for sv, sg in zip(lin_v, lin_g):
                np.testing.assert_array_equal(sv["coef"], sg["coef"])
                np.testing.assert_array_equal(sv["src"], sg["src"])
            for sv, sg in zip(quad_v, quad_g):
                np.testing.assert_array_equal(sv["coef"], sg["coef"])
                np.testing.assert_array_equal(sv["a"], sg["a"])
                np.testing.assert_array_equal(sv["b"], sg["b"])
                assert (sv["pa"], sv["pb"]) == (sg["pa"], sg["pb"])
        else:  # LassoCircuitNode
            iv, ig = nv.inner, ng.inner
            assert isinstance(iv, LassoNode)
            assert iv.num_vars == ig.num_vars
            assert iv.lookups == ig.lookups


def test_wiring_parity_k1():
    _assert_same(*_build_pair(SK_ENC_1024_1x27))


def test_wiring_parity_k2():
    _assert_same(*_build_pair(SK_ENC_4096_2x55))


def test_north_star_circuit_builds_fast():
    """32768_16x59 (the reference's headline config): full circuit
    construction incl. all VanillaNode wiring arrays must stay in the
    seconds/sub-GB regime (VERDICT r1: the per-gate builder would need
    minutes and GBs here)."""
    import time

    from hypergreco_tpu.models.bfv.constants import SK_ENC_32768_16x59

    t0 = time.time()
    bfv = BfvEncrypt(SK_ENC_32768_16x59)
    pk, _ = bfv.setup()
    c = Circuit(bfv.be)
    bfv.configure(c, pk)
    p = bfv.be.spec.p
    for n in c.nodes:
        if isinstance(n, VanillaNode):
            n._build_wiring(p)
    elapsed = time.time() - t0
    assert len(c.nodes) == 102
    assert elapsed < 60, f"north-star circuit build took {elapsed:.1f}s"
