"""Round-3: isolate why blend_only measured 6.5ms in the TAA micro.
Phase 1: blend alone (same inputs/arrays as taa_micro). Phase 2: blend
interleaved with the 58ms gather program. Per-phase: 5 rounds of
(5 calls, block at end), plus per-call blocking latencies."""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from arkoserenderer_tpu.ops.image import bilinear_sample

H, W = 1080, 1920
rng = np.random.default_rng(0)
color = jnp.asarray(rng.random((H, W, 3), np.float32))
hist = jnp.asarray(rng.random((H, W, 3), np.float32))
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 0.5)

xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px_, py_ = np.meshgrid(xs, ys)
px = jnp.asarray(px_.ravel())
py = jnp.asarray(py_.ravel())


def blend_only(color, hist, vel):
    return hist + (color - hist) * 0.1


def gather_path(color, hist, vel):
    velocity = vel.reshape(-1, 2)
    prev_x = px - velocity[:, 0]
    prev_y = py - velocity[:, 1]
    return bilinear_sample(hist, prev_x, prev_y).reshape(H, W, 3)


jb = jax.jit(blend_only)
jg = jax.jit(gather_path)
jax.block_until_ready(jb(color, hist, vel))
jax.block_until_ready(jg(color, hist, vel))


def measure(j, label):
    ts = []
    for rep in range(5):
        t0 = time.perf_counter()
        for _ in range(5):
            out = j(color, hist, vel)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / 5 * 1e3)
    print(f"{label:28s} {statistics.median(ts):8.2f} ms  {['%.1f' % t for t in ts]}")


print("--- phase 1: blend alone ---")
measure(jb, "blend alone")
print("--- phase 2: rotation with gather ---")
for rep in range(3):
    measure(jg, "gather")
    measure(jb, "blend after gather")
print("--- phase 3: per-call blocking blend ---")
lat = []
for i in range(10):
    t0 = time.perf_counter()
    jax.block_until_ready(jb(color, hist, vel))
    lat.append((time.perf_counter() - t0) * 1e3)
print("blend block-each:", " ".join(f"{t:6.2f}" for t in lat))
