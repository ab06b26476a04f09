import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
from hypergreco_tpu import runtime
import jax; jax.config.update("jax_platforms", "cpu")
runtime.init()
import numpy as np
from jax.sharding import Mesh
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

args, consts = generate_witness(64, [82638181], seed=7)
bfv = BfvEncrypt(consts)
pk, vk = bfv.setup()
t0=time.time(); p1 = bfv.prove(args, pk, device=True); print("dev 1-dev: %.1fs %d bytes" % (time.time()-t0, len(p1)), flush=True)
for nd in (2,):
    mesh = Mesh(np.array(jax.devices()[:nd]).reshape(nd), ("hc",))
    t0=time.time(); pn = bfv.prove(args, pk, device=True, mesh=mesh)
    print("dev %d-dev: %.1fs %s" % (nd, time.time()-t0, "BYTES MATCH" if pn == p1 else "MISMATCH"), flush=True)
inputs_dense, _ = bfv.get_inputs(args)
assert bfv.verify(vk, inputs_dense, args["ct0is"], p1)
print("DEVICE-MESH OK")
