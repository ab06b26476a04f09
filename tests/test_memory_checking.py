"""Offline memory checking: roundtrip + soundness on a mixed-lookup trace."""

import random

import pytest

from hypergreco_tpu.lasso import memory_checking as mc
from hypergreco_tpu.lasso.selectors import RowSelector
from hypergreco_tpu.ops import mle
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.utils.transcript import TranscriptReader, TranscriptWriter

BE = get_backend("goldilocks")
SPEC = BE.spec

LOGL, LOGM = 3, 4
L, MT = 1 << LOGL, 1 << LOGM


def _build(seed, tamper_e=False):
    rng = random.Random(seed)
    tables = [
        list(range(MT)),  # identity
        [i if i < 5 else 0 for i in range(MT)],  # truncated
        list(range(MT)),
    ]
    sels = [
        RowSelector.from_intervals(LOGL, [(0, 4)]),
        RowSelector.from_intervals(LOGL, [(4, 8)]),
        RowSelector.from_intervals(LOGL, [(0, 8)]),
    ]
    chunk_of = [0, 0, 1]
    # addresses per chunk (memory 1's rows must stay < 5 for the truncated
    # table to be an honest read; irrelevant for balance, values are read)
    dims = [
        [rng.randrange(MT) for _ in range(L)],
        [rng.randrange(MT) for _ in range(L)],
    ]

    witnesses = []
    for m in range(3):
        addrs = dims[chunk_of[m]]
        e = [0] * L
        ts = [0] * L
        final = [0] * MT
        for j in range(L):
            if sels[m].contains(j):
                a = addrs[j]
                ts[j] = final[a]
                final[a] += 1
                e[j] = tables[m][a]
        if tamper_e:
            e[1] = (e[1] + 3) % SPEC.p
        witnesses.append(
            mc.MemoryWitness(
                dim=BE.from_ints(addrs),
                e=BE.from_ints(e),
                read_ts=BE.from_ints(ts),
                final_cts=BE.from_ints(final),
                subtable=BE.from_ints(tables[m]),
                selector=sels[m],
                sel_dense=BE.from_ints(sels[m].dense()),
            )
        )
    dims_by_chunk = [witnesses[0].dim, witnesses[2].dim]

    def table_mle(i):
        return lambda spec, point: mle.eval_host(spec, tables[i], point)

    shapes = [
        mc.MemoryShape(selector=sels[m], table_mle=table_mle(m), chunk_index=chunk_of[m])
        for m in range(3)
    ]
    return witnesses, chunk_of, dims_by_chunk, shapes


GAMMA = (123456789123456789, 55555)
TAU = (987654321987654321, 7777)


def test_roundtrip():
    witnesses, chunk_of, dims_by_chunk, shapes = _build(42)
    tw = TranscriptWriter(SPEC)
    pout = mc.prove_memory_checking(
        BE, witnesses, chunk_of, dims_by_chunk, GAMMA, TAU, tw
    )
    proof = tw.into_proof()
    tr = TranscriptReader(SPEC, proof)
    vout = mc.verify_memory_checking(
        SPEC, shapes, 2, LOGL, LOGM, GAMMA, TAU, tr
    )
    tr.assert_consumed()
    assert vout["z1"] == pout["z1"] and vout["z2"] == pout["z2"]
    assert vout["final_cts_openings"] == pout["final_cts_openings"]


def test_tampered_witness_rejected():
    witnesses, chunk_of, dims_by_chunk, shapes = _build(42, tamper_e=True)
    tw = TranscriptWriter(SPEC)
    mc.prove_memory_checking(BE, witnesses, chunk_of, dims_by_chunk, GAMMA, TAU, tw)
    tr = TranscriptReader(SPEC, tw.into_proof())
    with pytest.raises(ValueError):
        mc.verify_memory_checking(SPEC, shapes, 2, LOGL, LOGM, GAMMA, TAU, tr)


def test_secure_gamma_tau_roundtrip():
    """secure_gamma_tau=True keeps gamma/tau in the extension field end to
    end (ADVICE r1: the old path dropped the ext coefficient on the prover
    side only and the roundtrip failed)."""
    witnesses, chunk_of, dims_by_chunk, shapes = _build(44)
    tw = TranscriptWriter(SPEC)
    mc.prove_memory_checking(
        BE, witnesses, chunk_of, dims_by_chunk, GAMMA, TAU, tw,
        secure_gamma_tau=True,
    )
    tr = TranscriptReader(SPEC, tw.into_proof())
    mc.verify_memory_checking(
        SPEC, shapes, 2, LOGL, LOGM, GAMMA, TAU, tr, secure_gamma_tau=True
    )
    tr.assert_consumed()


def test_device_mc_matches_host():
    """Device-resident MC prover: byte-identical transcript to the host."""
    import jax

    from hypergreco_tpu.gkr import dtranscript as dt
    from hypergreco_tpu.lasso import dmemory_checking as dmc

    witnesses, chunk_of, dims_by_chunk, shapes = _build(45)
    tw = TranscriptWriter(SPEC)
    mc.prove_memory_checking(BE, witnesses, chunk_of, dims_by_chunk, GAMMA, TAU, tw)
    host_proof = tw.into_proof()

    dtx = dt.new_dtx(8192)
    gamma_dev = BE.scalar(GAMMA, ext=True)
    tau_dev = BE.scalar(TAU, ext=True)

    wdicts = [dmc.witness_dict(w) for w in witnesses]

    def run(wds, dims, dtx):
        return dmc.mc_rounds(
            BE, wds, chunk_of, dims, gamma_dev, tau_dev, dtx
        )

    dtx = jax.jit(run)(wdicts, dims_by_chunk, dtx)
    dev_proof = dt.log_to_proof(BE, dtx.log_lo, dtx.log_hi, int(dtx.log_len))
    assert dev_proof == host_proof

    tr = TranscriptReader(SPEC, dev_proof)
    mc.verify_memory_checking(SPEC, shapes, 2, LOGL, LOGM, GAMMA, TAU, tr)
    tr.assert_consumed()


def test_corrupted_proof_rejected():
    witnesses, chunk_of, dims_by_chunk, shapes = _build(43)
    tw = TranscriptWriter(SPEC)
    mc.prove_memory_checking(BE, witnesses, chunk_of, dims_by_chunk, GAMMA, TAU, tw)
    proof = bytearray(tw.into_proof())
    proof[10] ^= 0x04
    tr = TranscriptReader(SPEC, bytes(proof))
    with pytest.raises(ValueError):
        mc.verify_memory_checking(SPEC, shapes, 2, LOGL, LOGM, GAMMA, TAU, tr)
