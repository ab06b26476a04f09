import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x * 3 + 1)
x0 = jnp.zeros((1024,), jnp.uint32)
jax.block_until_ready(f(x0))

# independent dispatches
t0 = time.time()
outs = [f(x0) for _ in range(25)]
jax.block_until_ready(outs)
print(f"25 independent: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# chained dispatches
t0 = time.time()
x = x0
for _ in range(25):
    x = f(x)
jax.block_until_ready(x)
print(f"25 chained:     {(time.time()-t0)*1e3:.1f}ms", flush=True)

# chained, bigger program (keccak squeeze-ish)
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dtranscript as dt
be = get_backend("goldilocks")
g = jax.jit(lambda dtx: dt.squeeze_challenge(be, dtx)[1])
d = dt.new_dtx(1 << 17)
d2 = g(d); jax.block_until_ready(d2.log_len)
t0 = time.time()
d = dt.new_dtx(1 << 17)
for _ in range(25):
    d = g(d)
jax.block_until_ready(d.log_len)
print(f"25 chained keccak-squeeze: {(time.time()-t0)*1e3:.1f}ms", flush=True)
