"""Threshold refinement: 4/16/32/64KB; numpy-literal vs device-array closure;
iota-computed coords sanity."""
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

# iota meshgrid in-jit (the replacement pattern)
@jax.jit
def jiota(img):
    py = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    px = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    return img[..., 0] * px + img[..., 1] * py

jax.block_until_ready(jiota(a))
lat("after iota program")

kept = []
for kb in [4, 16, 32, 48]:
    n = kb * 256
    cst = jnp.asarray(rng.random(n, np.float32))

    def make(cst, n):
        @jax.jit
        def f(x):
            return (x + cst).sum()

        return f

    f = make(cst, n)
    xarg = jnp.asarray(rng.random(n, np.float32))
    jax.block_until_ready(f(xarg))
    kept.append(f)
    lat(f"after DEVICE const {kb} KB")

# numpy closure (literal in HLO)
cstnp = rng.random(64 * 256).astype(np.float32)

@jax.jit
def fnp(x):
    return (x + cstnp).sum()

xarg = jnp.asarray(rng.random(64 * 256, np.float32))
jax.block_until_ready(fnp(xarg))
kept.append(fnp)
lat("after NUMPY const 64 KB")
