import sys, time
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import random
import jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.ops import ntt

be = get_backend("goldilocks")
spec = be.spec
rng = random.Random(3)
logl, npts = 7, 2
L = 1 << logl
pts = be.from_ints([spec.ext(rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(npts*logl)], ext=True)
pts = be.reshape(pts, (npts, logl))
als = be.from_ints([spec.ext(rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(npts)], ext=True)
wtab = ntt._wpow_table(spec.name, L, False)

def t(label, f, *a):
    t0=time.time(); r = jax.jit(f)(*a); jax.block_until_ready(jax.tree.leaves(r)); print(f"{label}: {time.time()-t0:.1f}s", flush=True)

def fold_barrier(x, n):
    x = jax.tree.map(jax.lax.optimization_barrier, x)
    acc = jax.tree.map(lambda a: a[0], x)
    for i in range(1, n):
        acc = be.add(acc, jax.tree.map(lambda a, i=i: a[i], x))
    return acc
t("fold w/ opt-barrier", lambda p, al: fold_barrier(be.mul(jax.tree.map(lambda a: a[:, None], al), ntt.dft_rows(be, p, wtab, logl, npts)), npts), pts, als)
print("DONE")
