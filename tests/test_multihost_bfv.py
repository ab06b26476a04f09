"""Multi-HOST BFV prover smoke test (SURVEY.md §4).

Two jax.distributed CPU processes (4 virtual devices each) form one global
8-device "hc" mesh; each process runs the mesh-sharded host-path prover on
the tiny n=64 config and asserts its proof bytes equal the single-process
proof. Exercises the cross-process pieces of gkr/sumcheck.prove_sum_check:
global-array resharding via jitted identities and the replicate-then-fetch
digest path (every host finishes the identical Fiat-Shamir transcript, so
challenges agree without any host<->host communication).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["HG_REPO"])
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["HG_COORD"],
    num_processes=2,
    process_id=int(os.environ["HG_PID"]),
)
import numpy as np
from jax.sharding import Mesh

from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

args, consts = generate_witness(64, [82638181], seed=7)
bfv = BfvEncrypt(consts)
pk, vk = bfv.setup()
mesh = Mesh(np.array(jax.devices()).reshape(8), ("hc",))
proof = bfv.prove(args, pk, device=False, mesh=mesh)
import hashlib

print("PROOFHASH", len(proof), hashlib.sha256(proof).hexdigest(), flush=True)
inputs_dense, _ = bfv.get_inputs(args)
assert bfv.verify(vk, inputs_dense, args["ct0is"], proof)
print("WORKER_OK", flush=True)
"""


def test_two_process_mesh_proof_byte_invariant(tmp_path):
    import hashlib

    import jax

    # golden single-process proof (this pytest process is CPU-pinned by
    # conftest)
    from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
    from hypergreco_tpu.models.bfv.witness_gen import generate_witness

    args, consts = generate_witness(64, [82638181], seed=7)
    bfv = BfvEncrypt(consts)
    pk, vk = bfv.setup()
    golden = bfv.prove(args, pk, device=False)
    golden_hash = hashlib.sha256(golden).hexdigest()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env_base = {
        **os.environ,
        "HG_REPO": REPO,
        "HG_COORD": "localhost:12655",
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    }
    procs = []
    for pid in range(2):
        env = dict(env_base, HG_PID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    for out in outs:
        assert "WORKER_OK" in out, out[-2000:]
        line = [ln for ln in out.splitlines() if ln.startswith("PROOFHASH")]
        assert line, out[-2000:]
        _, nbytes, phash = line[0].split()
        assert int(nbytes) == len(golden)
        assert phash == golden_hash, "multi-host proof bytes differ"
