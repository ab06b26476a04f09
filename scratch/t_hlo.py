import sys
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.gkr.grand_product import _gp_expr
from hypergreco_tpu.gkr.sumcheck import _stack_jit, _kinds
import random, re, collections

be = get_backend("goldilocks")
rng = random.Random(1)
cap = 1 << 17
m = 12
expr = _gp_expr(m)
tabs = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << 12)], ext=True) for _ in range(2*m+1)]
stk = _stack_jit(be.spec.name, len(tabs), 12, _kinds(be, tabs))(tabs)
cdev = dsc.powers(be, be.ext.ones(()), m, trailing_one=True)
fn = dsc._prove_jit(be.spec.name, expr.key(), m, 12)
comp = fn.lower(stk, cdev, dt.new_dtx(cap), jnp.int32(12), jnp.int32(1 << 12)).compile()
txt = comp.as_text()
print("compiled text len:", len(txt))
# histogram HLO ops
ops = collections.Counter(re.findall(r"= \w+\[?[^ ]* (\w+)\(", txt))
for op, c in ops.most_common(15):
    print(f"{op}: {c}")
open("/tmp/rounds_hlo.txt", "w").write(txt)
