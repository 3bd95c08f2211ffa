"""Clean-session (numpy-closures only) cost of gather-heavy image ops at
1080p: 4-gather bilinear TAA path, 16-gather catmull-rom, full TAA."""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from arkoserenderer_tpu.ops.image import (
    bilinear_sample,
    bilinear_sample_small_offset,
    neighborhood_min_max,
    sample_catmull_rom,
)

H, W = 1080, 1920
rng = np.random.default_rng(0)
color = jnp.asarray(rng.random((H, W, 3), np.float32))
hist = jnp.asarray(rng.random((H, W, 3), np.float32))
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 6.0)  # multi-px

# NUMPY pixel centers (safe literals)
xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px_, py_ = np.meshgrid(xs, ys)
px = px_.ravel()
py = py_.ravel()


def taa_gather(color, hist, vel):
    velocity = vel.reshape(-1, 2)
    prev_x = px - velocity[:, 0]
    prev_y = py - velocity[:, 1]
    h = bilinear_sample(hist, prev_x, prev_y).reshape(H, W, 3)
    lo, hi = neighborhood_min_max(color)
    h = jnp.clip(h, lo, hi)
    return h + (color - h) * 0.1


def taa_catmull(color, hist, vel):
    velocity = vel.reshape(-1, 2)
    prev_x = px - velocity[:, 0]
    prev_y = py - velocity[:, 1]
    h = sample_catmull_rom(hist, prev_x, prev_y).reshape(H, W, 3)
    lo, hi = neighborhood_min_max(color)
    h = jnp.clip(h, lo, hi)
    return h + (color - h) * 0.1


def taa_fast(color, hist, vel):
    h = bilinear_sample_small_offset(hist, -vel[..., 0], -vel[..., 1])
    lo, hi = neighborhood_min_max(color)
    h = jnp.clip(h, lo, hi)
    return h + (color - h) * 0.1


FNS = {
    "gather4_bilinear": taa_gather,
    "gather16_catmull": taa_catmull,
    "shift9_fast": taa_fast,
}
jitted = {}
for name, fn in FNS.items():
    j = jax.jit(fn)
    jax.block_until_ready(j(color, hist, vel))
    jitted[name] = j

acc = {k: [] for k in FNS}
for rep in range(5):
    for name, j in jitted.items():
        t0 = time.perf_counter()
        for _ in range(10):
            out = j(color, hist, vel)
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 10 * 1e3)

for name, ts in acc.items():
    print(f"{name:20s} {statistics.median(ts):8.3f} ms")
