import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime; runtime.init()
import jax, jax.numpy as jnp
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr import dsumcheck as dsc, dtranscript as dt
from hypergreco_tpu.gkr.sumcheck import SumcheckExpr, Term
import random

be = get_backend("goldilocks")
rng = random.Random(1)

def bench(ntab, logn, terms, label):
    expr = SumcheckExpr(terms, ntab)
    tables = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << logn)]) for _ in range(ntab)]
    cdev = dsc.coeffs_device(be, [])
    dtx = dt.new_dtx(1 << 14)
    out = dsc.prove_sum_check_device(be, expr, cdev, tables, dtx)
    jax.block_until_ready(out[2].log_len)
    t0 = time.time()
    N = 20
    for _ in range(N):
        dtx2 = dt.new_dtx(1 << 14)
        out = dsc.prove_sum_check_device(be, expr, cdev, tables, dtx2)
    jax.block_until_ready(out[2].log_len)
    dt_ = (time.time()-t0)/N
    print(f"{label}: {dt_*1e3:.2f}ms total, {dt_/logn*1e3:.2f}ms/round")

# FFT-node-like: deg2, 2 tables+, logn 11
bench(2, 11, [Term(None, (0,1))], "deg2 2tab 2^11")
bench(2, 14, [Term(None, (0,1))], "deg2 2tab 2^14")
# rw sumcheck-like: 21 tables deg3 25 terms logn 13
terms = []
for m in range(5):
    sel = 1 + 4 + 3*m
    terms += [Term(None,(0,sel,1+(m%4))), Term(None,(0,sel,sel+1)), Term(None,(0,sel,sel+2)), Term(None,(0,sel)), Term(None,(0,))]
bench(1+4+15, 13, terms, "deg3 20tab 25term 2^13")
# GP layer-like: deg3 11 tables, logn 12
terms = [Term(i,(0,2*i+1,2*i+2)) for i in range(5)]
expr = SumcheckExpr(terms, 11)
tables = [be.from_ints([rng.randrange(be.spec.p) for _ in range(1 << 12)]) for _ in range(11)]
coefs = dsc.powers(be, be.ext.ones(()), 5)
dtx = dt.new_dtx(1 << 14)
out = dsc.prove_sum_check_device(be, expr, coefs, tables, dtx); jax.block_until_ready(out[2].log_len)
t0=time.time()
for _ in range(20):
    out = dsc.prove_sum_check_device(be, expr, coefs, tables, dt.new_dtx(1 << 14))
jax.block_until_ready(out[2].log_len)
print(f"GP-layer deg3 11tab 2^12: {(time.time()-t0)/20*1e3:.2f}ms")
