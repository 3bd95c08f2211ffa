"""Separate: closure constants vs vel strided slice."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
N = H * W
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


def bilin(flat, x, y):
    fx = x - 0.5
    fy = y - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)
    c00 = flat[y0i * W + x0i]
    c10 = flat[y0i * W + x1i]
    c01 = flat[y1i * W + x0i]
    c11 = flat[y1i * W + x1i]
    return (c00 * (1 - tx) + c10 * tx) * (1 - ty) + (c01 * (1 - tx) + c11 * tx) * ty


xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px2, py2 = np.meshgrid(xs, ys)
px = jnp.asarray(px2.ravel())
py = jnp.asarray(py2.ravel())
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 0.5)

# (h) px/py as ARGS + vel slices
jh = jax.jit(
    lambda img, vel, px, py: bilin(
        img.reshape(-1, 3),
        px - vel.reshape(-1, 2)[:, 0],
        py - vel.reshape(-1, 2)[:, 1],
    ).reshape(H, W, 3)
)
jax.block_until_ready(jh(b, vel, px, py))
lat("(h) px/py args + vel slices")

# (i) closure px/py, x/y offsets as flat args (no vel)
ox = jnp.asarray((rng.random(N, np.float32) - 0.5) * 0.5)
oy = jnp.asarray((rng.random(N, np.float32) - 0.5) * 0.5)
ji = jax.jit(
    lambda img, ox, oy: bilin(img.reshape(-1, 3), px - ox, py - oy).reshape(H, W, 3)
)
jax.block_until_ready(ji(b, ox, oy))
lat("(i) closure px/py, no vel slice")
