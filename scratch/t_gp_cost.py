import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.gkr.grand_product import _gp_expr
from hypergreco_tpu.gkr.dgrand_product import _gp_build_jit, _gp_loop_jit
import random

be = get_backend("goldilocks")
rng = random.Random(1)
m = 12

def mk_tables(n, logn, ext=True):
    return [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << logn)],
                         ext=False) for _ in range(n)]

def timeit(label, fn, n=5):
    out = fn(); jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(); jax.block_until_ready(jax.tree.leaves(out))
    print(f"{label}: {(time.time()-t0)/n*1e3:.1f}ms")
    return out

# tree2-shape: m=12 instances of 2^16 leaves
leaves = mk_tables(m, 16)
build = _gp_build_jit(be.spec.name, m, 16, False)
LVL, w1 = timeit("build m=12 logl=16", lambda: build(leaves))

loop = _gp_loop_jit(be.spec.name, m, 16, 1 << 17)
timeit("loop m=12 logl=16 (15 layers)", lambda: loop(LVL, w1, dt.new_dtx(1 << 17)))

# single biggest layer (l=15) via rounds() standalone at [26, 2^15]
expr = _gp_expr(m)
stk_tabs = mk_tables(2 * m + 1, 15)
cdev = dsc.powers(be, be.ext.ones(()), m, trailing_one=True)

from hypergreco_tpu.gkr.sumcheck import _stack_jit, _kinds
tabs = [be.lift(t) for t in stk_tabs]
stk = _stack_jit(be.spec.name, len(tabs), 15, _kinds(be, tabs))(tabs)

fn = dsc._prove_jit(be.spec.name, expr.key(), m, 15)
timeit("rounds l=15 buf=2^15 (15 rounds)",
       lambda: fn(stk, cdev, dt.new_dtx(1 << 17), jnp.int32(15), jnp.int32(1 << 15)))
timeit("rounds l=8  buf=2^15 (8 rounds)",
       lambda: fn(stk, cdev, dt.new_dtx(1 << 17), jnp.int32(8), jnp.int32(1 << 8)))
timeit("rounds l=2  buf=2^15 (2 rounds)",
       lambda: fn(stk, cdev, dt.new_dtx(1 << 17), jnp.int32(2), jnp.int32(4)))
