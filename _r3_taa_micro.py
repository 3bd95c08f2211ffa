"""Round-3: standalone decomposition of the TAA pass cost at 1080p.
Variants isolate: history resample (9-shift fast path vs flat-gather slow
path vs cond), neighborhood min/max, and the blend. One process, interleaved.
"""
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
)

H, W = 1080, 1920
rng = np.random.default_rng(0)
color = jnp.asarray(rng.random((H, W, 3), np.float32))
hist = jnp.asarray(rng.random((H, W, 3), np.float32))
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 0.5)  # sub-px

xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px_, py_ = np.meshgrid(xs, ys)
px = jnp.asarray(px_.ravel())
py = jnp.asarray(py_.ravel())


def taa_full(color, hist, vel):
    velocity = vel.reshape(-1, 2)
    prev_x = px - velocity[:, 0]
    prev_y = py - velocity[:, 1]
    max_v = jnp.max(jnp.abs(vel))

    def _fast(_):
        return bilinear_sample_small_offset(hist, -vel[..., 0], -vel[..., 1])

    def _slow(_):
        return bilinear_sample(hist, prev_x, prev_y).reshape(H, W, 3)

    h = jax.lax.cond(max_v <= 1.0, _fast, _slow, None)
    lo, hi = neighborhood_min_max(color)
    h = jnp.clip(h, lo, hi)
    on = ((prev_x >= 0) & (prev_x < W) & (prev_y >= 0) & (prev_y < H)).reshape(H, W, 1)
    alpha = jnp.where(~on, 1.0, 0.1)
    return h + (color - h) * alpha


def taa_nocond_fast(color, hist, vel):
    h = bilinear_sample_small_offset(hist, -vel[..., 0], -vel[..., 1])
    lo, hi = neighborhood_min_max(color)
    h = jnp.clip(h, lo, hi)
    return h + (color - h) * 0.1


def taa_gather(color, hist, vel):
    velocity = vel.reshape(-1, 2)
    prev_x = px - velocity[:, 0]
    prev_y = py - velocity[:, 1]
    h = bilinear_sample(hist, prev_x, prev_y).reshape(H, W, 3)
    lo, hi = neighborhood_min_max(color)
    h = jnp.clip(h, lo, hi)
    return h + (color - h) * 0.1


def resample_only(color, hist, vel):
    return bilinear_sample_small_offset(hist, -vel[..., 0], -vel[..., 1])


def clamp_only(color, hist, vel):
    lo, hi = neighborhood_min_max(color)
    return jnp.clip(hist, lo, hi)


def blend_only(color, hist, vel):
    return hist + (color - hist) * 0.1


FNS = {
    "full": taa_full,
    "nocond_fast": taa_nocond_fast,
    "gather_path": taa_gather,
    "resample_only": resample_only,
    "clamp_only": clamp_only,
    "blend_only": blend_only,
}

jitted = {}
for name, fn in FNS.items():
    j = jax.jit(fn)
    jax.block_until_ready(j(color, hist, vel))
    jitted[name] = j
    print("warmed", name, flush=True)

acc = {k: [] for k in FNS}
for rep in range(5):
    for name, j in jitted.items():
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(color, hist, vel)
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 5 * 1e3)

for name, ts in acc.items():
    print(f"{name:16s} {statistics.median(ts):8.2f} ms  (reps {['%.1f' % t for t in ts]})")
