"""Bisect continued: output size, closure constants, input reshape."""
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

x = jnp.asarray(rng.uniform(0, W, N).astype(np.float32))
y = jnp.asarray(rng.uniform(0, H, N).astype(np.float32))
flat = jnp.asarray(rng.random((N, 3), np.float32))


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


# (e) full-size output
je = jax.jit(lambda flat, x, y: bilin(flat, x, y))
jax.block_until_ready(je(flat, x, y))
lat("(e) full (N,3) output")

# (f) (H,W,3) input reshaped inside, (H,W,3) output
jf = jax.jit(lambda img, x, y: bilin(img.reshape(-1, 3), x, y).reshape(H, W, 3))
jax.block_until_ready(jf(b, x, y))
lat("(f) reshape in/out")

# (g) px/py closure constants
xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px_, py_ = np.meshgrid(xs, ys)
px = jnp.asarray(px_.ravel())
py = jnp.asarray(py_.ravel())
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 0.5)

jg = jax.jit(
    lambda img, vel: bilin(
        img.reshape(-1, 3),
        px - vel.reshape(-1, 2)[:, 0],
        py - vel.reshape(-1, 2)[:, 1],
    ).reshape(H, W, 3)
)
jax.block_until_ready(jg(b, vel))
lat("(g) closure px/py + vel reshape")
