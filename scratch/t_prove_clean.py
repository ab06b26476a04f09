import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
from hypergreco_tpu.ops.fe import get_backend

tiny = jax.jit(lambda x: x + 1)
xs = jnp.zeros((8,), jnp.uint32)
jax.block_until_ready(tiny(xs))
t0=time.time()
for _ in range(10): out = tiny(xs)
jax.block_until_ready(out)
print(f"tiny fresh: {(time.time()-t0)/10*1e3:.2f}ms", flush=True)

be = get_backend("goldilocks")
args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=be)
pk, vk = bfv.setup()
t0=time.time(); bfv.prove(args, pk, device=True); print("warm prove:", round(time.time()-t0,1), flush=True)
for i in range(3):
    t0=time.time(); proof = bfv.prove(args, pk, device=True)
    print(f"steady prove {i}: {time.time()-t0:.3f}s", flush=True)
t0=time.time()
for _ in range(10): out = tiny(xs)
jax.block_until_ready(out)
print(f"tiny after: {(time.time()-t0)/10*1e3:.2f}ms", flush=True)
