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

def fold_1d(x, n):
    flat = jax.tree.map(lambda a: a.reshape(-1), x)
    acc = jax.tree.map(lambda a: a[0:L], flat)
    for i in range(1, n):
        acc = be.add(acc, jax.tree.map(lambda a, i=i: a[i*L:(i+1)*L], flat))
    return acc
t("fold 1d-slices", lambda p, al: fold_1d(be.mul(jax.tree.map(lambda a: a[:, None], al), ntt.dft_rows(be, p, wtab, logl, npts)), npts), pts, als)
# 2-D keepdims variant
def fold_2d(x, n):
    acc = jax.tree.map(lambda a: a[0:1], x)
    for i in range(1, n):
        acc = be.add(acc, jax.tree.map(lambda a, i=i: a[i:i+1], x))
    return jax.tree.map(lambda a: a[0], acc)
t("fold 2d-keepdims", lambda p, al: fold_2d(be.mul(jax.tree.map(lambda a: a[:, None], al), ntt.dft_rows(be, p, wtab, logl, npts)), npts), pts, als)
print("DONE")
