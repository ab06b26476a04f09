import sys
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
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
gl = _gp_loop_jit(be.spec.name, 12, 13, cap)

lowered = gl.lower(LVLs, w1s, dt.new_dtx(cap))
comp = lowered.compile()
ma = comp.memory_analysis()
print("gp loop:", ma, flush=True)

lb = gb.lower(leaves)
print("gp build:", lb.compile().memory_analysis(), flush=True)

tiny = jax.jit(lambda x: x + 1)
print("tiny:", tiny.lower(jnp.zeros((8,), jnp.uint32)).compile().memory_analysis())

g = jax.jit(lambda dtx: dt.squeeze_challenge(be, dtx)[1])
print("1 squeeze:", g.lower(dt.new_dtx(cap)).compile().memory_analysis())
