import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax, jax.numpy as jnp, numpy as np

L = 1 << 19
x = jnp.asarray(np.random.randint(0, 65536, L, dtype=np.int32))
x4 = jnp.asarray(np.random.randint(0, 65536, (4, L), dtype=np.int32))

f1 = jax.jit(lambda a: jnp.argsort(a, stable=True))
f4 = jax.jit(lambda a: jnp.argsort(a, axis=-1, stable=True))
fs = jax.jit(lambda a: jnp.searchsorted(a, a, side="left"))
fc = jax.jit(lambda a: jnp.cumsum(a))
jax.block_until_ready(f1(x)); jax.block_until_ready(f4(x4)); s=f1(x); jax.block_until_ready(fs(s)); jax.block_until_ready(fc(x))
for name, f, a in [("argsort 1x", f1, x), ("argsort 4x", f4, x4), ("searchsorted", fs, s), ("cumsum", fc, x)]:
    t0=time.time()
    for _ in range(3): r = f(a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/3*1000:.1f}ms")
