"""Bisect the poison trigger: rows in {512K, 1M, 2M}, then the exact
bilinear_sample program from the TAA slow path."""
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


def lat(label, n=6):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(a, b))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:44s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

for rows in [1 << 19, 1 << 20, 1 << 21]:
    table = jnp.asarray(rng.random((1 << 21, 3), np.float32))
    idx = jnp.asarray(rng.integers(0, 1 << 21, rows).astype(np.int32))

    @jax.jit
    def jg(table, idx):
        return table[idx].sum()

    jax.block_until_ready(jg(table, idx))
    lat(f"after gather rows={rows} ch=3")

# exact TAA slow-path program
sys.path.insert(0, "/root/repo")
from arkoserenderer_tpu.ops.image import bilinear_sample

xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px_, py_ = np.meshgrid(xs, ys)
px = jnp.asarray(px_.ravel())
py = jnp.asarray(py_.ravel())
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 0.5)


@jax.jit
def jg2(hist, vel):
    velocity = vel.reshape(-1, 2)
    return bilinear_sample(hist, px - velocity[:, 0], py - velocity[:, 1]).reshape(H, W, 3)


jax.block_until_ready(jg2(b, vel))
lat("after TAA bilinear_sample program")
