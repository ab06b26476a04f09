import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax, jax.numpy as jnp, numpy as np

L, M = 1 << 19, 1 << 16
addr = jnp.asarray(np.random.randint(0, M, L, dtype=np.int32))
perm = jnp.asarray(np.random.permutation(L).astype(np.int32))
vals = jnp.asarray(np.random.randint(0, 100, L, dtype=np.int32))

hist = jax.jit(lambda a: jnp.zeros(M + 1, jnp.int32).at[a].add(1, mode="drop")[:M])
pset = jax.jit(lambda p, v: jnp.zeros(L, jnp.int32).at[p].set(v))
gath = jax.jit(lambda p, v: v[p])
cums = jax.jit(lambda v: jnp.cumsum(v))
for f, a in [(hist, (addr,)), (pset, (perm, vals)), (gath, (perm, vals)), (cums, (vals,))]:
    jax.block_until_ready(f(*a))
for name, f, a in [("hist scatter-add", hist, (addr,)), ("perm scatter-set", pset, (perm, vals)), ("gather", gath, (perm, vals)), ("cumsum", cums, (vals,))]:
    t0=time.time()
    for _ in range(3): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.time()-t0)/3*1000:.1f}ms", flush=True)
