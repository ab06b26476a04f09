import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp

tiny = jax.jit(lambda x: x + 1)
xs = jnp.zeros((8,), jnp.uint32)

def t(label, n=10):
    jax.block_until_ready(tiny(xs))
    t0 = time.time()
    for _ in range(n):
        out = tiny(xs)
    jax.block_until_ready(out)
    print(f"{label}: {(time.time()-t0)/n*1e3:.2f}ms", flush=True)

t("tiny fresh")

# (a) many live buffers: 200 x 10MB
bufs = [jnp.zeros((2_500_000,), jnp.uint32) + i for i in range(200)]
jax.block_until_ready(bufs[-1])
t("tiny with 200x10MB buffers")

# (b) many executables: 50 distinct compiled programs
progs = []
for i in range(50):
    f = jax.jit(lambda x, i=i: x * (i + 2) + i)
    jax.block_until_ready(f(xs))
    progs.append(f)
t("tiny with +50 small executables")

# (c) a few BIG executables (unrolled keccak-ish loops)
from hypergreco_tpu.ops import keccak_jax as kj
from hypergreco_tpu.gkr import dtranscript as dt
from hypergreco_tpu.ops.fe import get_backend
be = get_backend("goldilocks")
big = []
for k in range(3):
    def mk(k=k):
        def run(dtx):
            for i in range(10 + k):
                c, dtx = dt.squeeze_challenge(be, dtx)
            return dtx
        return jax.jit(run)
    f = mk()
    out = f(dt.new_dtx(1 << 17))
    jax.block_until_ready(out.log_len)
    big.append(f)
t("tiny with +3 keccak-loop executables")

del bufs
import gc; gc.collect()
t("tiny after freeing buffers")
