import sys, time
sys.path.insert(0, "/root/repo")
from hypergreco_tpu import runtime
runtime.init()
import jax, jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev, dev.platform)

# unique program to defeat any in-process cache: use a distinct constant
SALT = int(time.time()) % 100000
@jax.jit
def f(x):
    return (x * 3 + SALT).sum()

x = jnp.ones((256,), jnp.uint32)
t0=time.time(); f(x).block_until_ready(); print("tiny compile+run: %.3fs" % (time.time()-t0))
for i in range(3):
    t0=time.time(); f(x).block_until_ready(); print("tiny dispatch+sync: %.4fs" % (time.time()-t0))
# pure transfer latency
y = jnp.zeros((8,), jnp.uint32)
for i in range(3):
    t0=time.time(); np.asarray(y); print("tiny d2h: %.4fs" % (time.time()-t0))
big = jnp.zeros((1<<20,), jnp.uint32)
jax.block_until_ready(big)
for i in range(2):
    t0=time.time(); np.asarray(big); print("4MB d2h: %.4fs" % (time.time()-t0))
# h2d
h = np.zeros((1<<20,), np.uint32)
for i in range(2):
    t0=time.time(); jax.block_until_ready(jax.device_put(h)); print("4MB h2d: %.4fs" % (time.time()-t0))
# enqueue-only latency (async)
t0=time.time()
for i in range(20):
    y2 = f(x)
print("20 async enqueues: %.4fs" % (time.time()-t0))
jax.block_until_ready(y2)
