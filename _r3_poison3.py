"""Bisect WITHIN bilinear_sample: which component poisons dispatch?"""
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
    print(f"{label:44s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

x = jnp.asarray(rng.uniform(0, W, N).astype(np.float32))
y = jnp.asarray(rng.uniform(0, H, N).astype(np.float32))
idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
flat = jnp.asarray(rng.random((N, 3), np.float32))

# (a) float coord math only, no gather
@jax.jit
def ja(x, y):
    fx = x - 0.5
    fy = y - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    return (y0i * W + x0i).sum()

jax.block_until_ready(ja(x, y))
lat("(a) coord math only")

# (b) one gather, precomputed indices
@jax.jit
def jb1(flat, idx):
    return flat[idx].sum()

jax.block_until_ready(jb1(flat, idx))
lat("(b) 1 gather precomputed idx")

# (c) one gather with COMPUTED indices (int math feeding gather)
@jax.jit
def jc(flat, x, y):
    x0i = jnp.clip(jnp.floor(x - 0.5).astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(jnp.floor(y - 0.5).astype(jnp.int32), 0, H - 1)
    return flat[y0i * W + x0i].sum()

jax.block_until_ready(jc(flat, x, y))
lat("(c) 1 gather computed idx")

# (d) 4 gathers computed idx + lerp (full bilinear on flat table)
@jax.jit
def jd(flat, x, y):
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
    return ((c00 * (1 - tx) + c10 * tx) * (1 - ty)
            + (c01 * (1 - tx) + c11 * tx) * ty).sum()

jax.block_until_ready(jd(flat, x, y))
lat("(d) 4-gather bilinear")
