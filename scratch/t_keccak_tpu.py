import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops import keccak_jax as kj

@jax.jit
def perm_n(sp, n):
    def body(i, s):
        lo, hi = kj._keccak_f(s.lo, s.hi) if hasattr(kj, "_keccak_f") else kj.keccak_f(s.lo, s.hi)
        return kj.Sponge(lo, hi, s.pos)
    return jax.lax.fori_loop(0, n, body, sp)

sp = kj.new_sponge()
r = perm_n(sp, 10); jax.block_until_ready(r.lo)  # warm
for n in (100, 1000):
    t0=time.time(); r = perm_n(sp, n); jax.block_until_ready(r.lo)
    dt = time.time()-t0
    print(f"{n} permutations: {dt*1e3:.1f}ms -> {dt/n*1e6:.1f}us each")
