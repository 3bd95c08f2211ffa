"""Threshold of constant-size poisoning + reversibility."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((H, W, 3), np.float32))
b = jnp.asarray(rng.random((H, W, 3), np.float32))


@jax.jit
def jb(a, b):
    return a + (b - a) * 0.1


def lat(label, n=5):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(a, b))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:48s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

kept = []
for kb in [64, 512, 2048, 8192]:
    n = kb * 256  # f32 elements
    cst = jnp.asarray(rng.random(n, np.float32))

    def make(cst):
        @jax.jit
        def f(x):
            return (x[:n] + cst).sum()

        return f

    f = make(cst)
    xarg = jnp.asarray(rng.random(n, np.float32))
    jax.block_until_ready(f(xarg))
    kept.append(f)
    lat(f"after const {kb} KB program")

# reversibility
del kept
jax.clear_caches()
import gc

gc.collect()
jax.block_until_ready(jb(a, b))
lat("after del+clear_caches+gc")
