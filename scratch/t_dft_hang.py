import sys, time
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import random
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.ops import ntt, mle

be = get_backend("goldilocks")
spec = be.spec
rng = random.Random(3)
for logl, npts in [(7, 1), (7, 2), (16, 2)]:
    pts = [[spec.ext(rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(logl)] for _ in range(npts)]
    als = [spec.ext(rng.randrange(spec.p), rng.randrange(spec.p)) for _ in range(npts)]
    t0 = time.time()
    d = ntt.dft_row_mle(be, pts, als, logl, False)
    jax.block_until_ready(jax.tree.leaves(d))
    t1 = time.time()
    # correctness oracle vs direct dense computation for small L
    if logl == 7:
        import numpy as np
        L = 1 << logl
        w = spec.root_of_unity(L)
        vals = be.to_host(d)
        for j in [0, 1, 5, 100]:
            exp = spec.zero
            for pt, al in zip(pts, als):
                prod = spec.one
                for b in range(logl):
                    wjb = pow(w, (j << b) % L, spec.p)
                    f = spec.eadd(spec.esub(spec.one, pt[b]), spec.escale(pt[b], wjb))
                    prod = spec.emul(prod, f)
                exp = spec.eadd(exp, spec.emul(al, prod))
            assert spec._c(vals[j]) == exp, (j, vals[j], exp)
    print(f"dft logl={logl} npts={npts}: {t1-t0:.1f}s OK", flush=True)
print("DONE")
