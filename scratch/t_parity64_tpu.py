import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt
from hypergreco_tpu.models.bfv.witness_gen import generate_witness

args, consts = generate_witness(64, [82638181], seed=7)
bfv = BfvEncrypt(consts)
pk, vk = bfv.setup()
t0=time.time(); ph = bfv.prove(args, pk, device=False); print("host prove: %.1fs, %d bytes" % (time.time()-t0, len(ph)), flush=True)
t0=time.time(); pd = bfv.prove(args, pk, device=True); print("dev prove: %.1fs, %d bytes" % (time.time()-t0, len(pd)), flush=True)
assert ph == pd, "host/device proof bytes differ"
t0=time.time(); pd = bfv.prove(args, pk, device=True); print("dev prove warm: %.2fs" % (time.time()-t0), flush=True)
inputs_dense, _ = bfv.get_inputs(args)
t0=time.time()
assert bfv.verify(vk, inputs_dense, args["ct0is"], ph)
print("verify: %.2fs" % (time.time()-t0))
print("PARITY+VERIFY OK")
