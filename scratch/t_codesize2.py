import sys
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.gkr.grand_product import _gp_expr
from hypergreco_tpu.gkr.sumcheck import _stack_jit, _kinds
import random

be = get_backend("goldilocks")
rng = random.Random(1)
cap = 1 << 17
m = 12

def sz(label, f, *args):
    print(label, f.lower(*args).compile().memory_analysis().generated_code_size_in_bytes / 1e6, "MB", flush=True)

expr = _gp_expr(m)
tabs = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << 12)], ext=True) for _ in range(2*m+1)]
stk = _stack_jit(be.spec.name, len(tabs), 12, _kinds(be, tabs))(tabs)
cdev = dsc.powers(be, be.ext.ones(()), m, trailing_one=True)
fn = dsc._prove_jit(be.spec.name, expr.key(), m, 12)
sz("rounds gp-expr logn=12:", fn, stk, cdev, dt.new_dtx(cap), jnp.int32(12), jnp.int32(1 << 12))

# eq_table_dyn alone
eqf = jax.jit(lambda pbuf, l: dsc.eq_table_dyn(be, pbuf, 12, l))
pbuf = be.zeros((12,), ext=True)
sz("eq_table_dyn bufv=12:", eqf, pbuf, jnp.int32(5))

# write_ext + squeeze pair
g = jax.jit(lambda dtx, x: dt.squeeze_challenge(be, dt.write_ext(be, dtx, x))[1])
x4 = be.zeros((4,), ext=True)
sz("write_ext+squeeze:", g, dt.new_dtx(cap), x4)

# digest_scalar on [13, 4096] ext
dg = jax.jit(lambda t: dsc.digest_scalar(be, t))
big = be.zeros((13, 1 << 12), ext=True)
sz("digest_scalar [13,4096]:", dg, big)
