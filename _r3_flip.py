"""Round-3: find what flips per-call blocking latency from 0.02ms to 27ms.
Phases: (a) clean blend; (b) after creating 2M-element device arrays;
(c) after compiling+running the gather program; (d) blend again."""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
rng = np.random.default_rng(0)
color = jnp.asarray(rng.random((H, W, 3), np.float32))
hist = jnp.asarray(rng.random((H, W, 3), np.float32))
vel = jnp.asarray((rng.random((H, W, 2), np.float32) - 0.5) * 0.5)


@jax.jit
def jb(color, hist, vel):
    return hist + (color - hist) * 0.1


def lat(label, n=8):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(color, hist, vel))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:34s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(color, hist, vel))
lat("(a) clean blend")

xs = (np.arange(W, dtype=np.float32) + 0.5)
ys = (np.arange(H, dtype=np.float32) + 0.5)
px_, py_ = np.meshgrid(xs, ys)
px = jnp.asarray(px_.ravel())
py = jnp.asarray(py_.ravel())
jax.block_until_ready(px)
lat("(b) after big flat arrays")

sys.path.insert(0, "/root/repo")
from arkoserenderer_tpu.ops.image import bilinear_sample

lat("(b2) after repo import")


@jax.jit
def jg(color, hist, vel):
    velocity = vel.reshape(-1, 2)
    prev_x = px - velocity[:, 0]
    prev_y = py - velocity[:, 1]
    return bilinear_sample(hist, prev_x, prev_y).reshape(H, W, 3)


jax.block_until_ready(jg(color, hist, vel))
lat("(c) after gather compile+run")
lat("(d) blend again")
time.sleep(2)
lat("(e) after 2s sleep")
