import sys, time
sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu")
import random
from hypergreco_tpu.ops.fe import get_backend
from hypergreco_tpu.gkr.grand_product import prove_grand_product, verify_grand_product
from hypergreco_tpu.utils.transcript import TranscriptWriter, TranscriptReader

be = get_backend("goldilocks")
rng = random.Random(1)
for m, logl in [(2, 6), (10, 7), (10, 16)]:
    leaves = [be.from_ints([rng.randrange(1, be.spec.p) for _ in range(1 << logl)]) for _ in range(m)]
    tw = TranscriptWriter(be.spec)
    t0 = time.time()
    prove_grand_product(be, leaves, tw)
    print(f"gp m={m} logl={logl}: {time.time()-t0:.1f}s", flush=True)
print("DONE")
