import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
import jax; jax.config.update("jax_platforms", "cpu")
runtime.init()
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

args, consts = generate_witness(64, [82638181], seed=7)
bfv = BfvEncrypt(consts)
pk, vk = bfv.setup()
t0=time.time(); ph = bfv.prove(args, pk, device=False); print("host prove: %.1fs, %d bytes" % (time.time()-t0, len(ph)))
t0=time.time(); pd = bfv.prove(args, pk, device=True); print("dev prove: %.1fs, %d bytes" % (time.time()-t0, len(pd)))
assert ph == pd, "host/device proof bytes differ"
inputs_dense, _ = bfv.get_inputs(args)
assert bfv.verify(vk, inputs_dense, args["ct0is"], ph)
print("PARITY+VERIFY OK")
