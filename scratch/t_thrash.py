import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.gkr.dgrand_product import _gp_build_jit, _gp_loop_jit
import random

be = get_backend("goldilocks")
rng = random.Random(1)
cap = 1 << 17
M = 6
logl = 13

def timeit(label, fn, n=5):
    out = fn(); jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(); jax.block_until_ready(jax.tree.leaves(out))
    print(f"{label}: {(time.time()-t0)/n*1e3:.1f}ms", flush=True)
    return out

leaves = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << logl)])
          for _ in range(2 * M)]
gb = _gp_build_jit(be.spec.name, 2 * M, logl, False)
LVLs, w1s = gb(leaves)
jax.block_until_ready(jax.tree.leaves((LVLs, w1s)))
gl = _gp_loop_jit(be.spec.name, 2 * M, logl, cap)
timeit("loop BEFORE full prove", lambda: gl(LVLs, w1s, dt.new_dtx(cap)))

# now load the whole prover
from hypergreco_tpu.models.bfv import constants as C
from hypergreco_tpu.models.bfv.circuit import BfvEncrypt, load_witness_json
args = load_witness_json("/root/reference/bfv-gkr/src/data/goldilocks/sk_enc_1024_1x27_65537.json")
bfv = BfvEncrypt(C.SK_ENC_1024_1x27, be=be)
pk, vk = bfv.setup()
t0 = time.time(); bfv.prove(args, pk, device=True)
print("warm prove:", time.time() - t0, flush=True)
t0 = time.time(); bfv.prove(args, pk, device=True)
print("steady prove:", time.time() - t0, flush=True)

timeit("loop AFTER full prove", lambda: gl(LVLs, w1s, dt.new_dtx(cap)))

# tiny program after full prove
tiny = jax.jit(lambda x: x + 1)
xs = jnp.zeros((8,), jnp.uint32)
timeit("tiny op AFTER", lambda: tiny(xs), n=10)

# distribution over 10 calls of gl
outs = gl(LVLs, w1s, dt.new_dtx(cap)); jax.block_until_ready(jax.tree.leaves(outs))
for i in range(6):
    t0 = time.time()
    outs = gl(LVLs, w1s, dt.new_dtx(cap)); jax.block_until_ready(jax.tree.leaves(outs))
    print(f"gl call {i}: {(time.time()-t0)*1e3:.1f}ms", flush=True)

# free the prover's programs/arrays and retry
import hypergreco_tpu.gkr.circuit as gcirc
gcirc._PROG_CACHE.clear()
del bfv, pk, vk
import gc; gc.collect()
timeit("gl after releasing prover objects", lambda: gl(LVLs, w1s, dt.new_dtx(cap)))

import hypergreco_tpu.gkr.dgrand_product as dgp
import hypergreco_tpu.gkr.dsumcheck as dsc2
import hypergreco_tpu.lasso.dmemory_checking as dmc2
import hypergreco_tpu.ops.mle as mle2
dgp._gp_build_jit.cache_clear(); dgp._gp_loop_jit.cache_clear()
dsc2._prove_jit.cache_clear(); dmc2._progs.cache_clear()
jax.clear_caches()
gc.collect()
timeit("tiny op after clear_caches", lambda: tiny(xs), n=10)
gl2 = jax.jit(lambda LVL, w1, dtx: __import__('hypergreco_tpu.gkr.dgrand_product', fromlist=['gp_layer_rounds']).gp_layer_rounds(be, LVL, w1, logl, dtx))
timeit("gl (recompiled) after clear_caches", lambda: gl2(LVLs, w1s, dt.new_dtx(cap)))
