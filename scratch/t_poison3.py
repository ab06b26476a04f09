import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
import numpy as np
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.ops import ntt
from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.gkr.dgrand_product import _gp_build_jit, _gp_loop_jit
import random

be = get_backend("goldilocks")
rng = random.Random(1)
cap = 1 << 17
leaves = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << 13)])
          for _ in range(12)]
gb = _gp_build_jit(be.spec.name, 12, 13, False)
LVLs, w1s = gb(leaves)
jax.block_until_ready(jax.tree.leaves((LVLs, w1s)))
gl = _gp_loop_jit(be.spec.name, 12, 13, cap)

def probe(label, n=3):
    out = gl(LVLs, w1s, dt.new_dtx(cap))
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = gl(LVLs, w1s, dt.new_dtx(cap))
        jax.block_until_ready(jax.tree.leaves(out))
    print(f"probe after {label}: {(time.time()-t0)/n*1e3:.1f}ms", flush=True)

probe("start")
x = be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << 12)])

# (a) bitrev constant gather only
bitrev, stages = ntt._plan(be.spec.name, 1 << 12, False)
fa = jax.jit(lambda v: jax.tree.map(lambda a: a[..., bitrev], v))
jax.block_until_ready(jax.tree.leaves(fa(x)))
probe("bitrev-gather program")

# (b) one unrolled butterfly stage with CONSTANT indices
p0, p1, tw = stages[5]
fb = jax.jit(lambda v: be.add(jax.tree.map(lambda a: a[..., p0], v),
                              be.mul(tw, jax.tree.map(lambda a: a[..., p1], v))))
jax.block_until_ready(jax.tree.leaves(fb(x)))
probe("one static-stage butterfly")

# (c) the scan-based full ntt
y = ntt.ntt(be, x)
jax.block_until_ready(jax.tree.leaves(y))
probe("scan-based ntt 2^12")
