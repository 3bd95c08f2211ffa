"""Does a device->host readback (np.asarray on a device array) poison?
Also: donation, and jnp scalar upload per call."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((1080, 1920, 3), np.float32))
b = jnp.asarray(rng.random((1080, 1920, 3), np.float32))


@jax.jit
def jb(a, b):
    return a + (b - a) * 0.1


def lat(label, n=4):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(a, b))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:34s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

x = np.asarray(a)  # D2H
_ = x.copy()
lat("after np.asarray readback")

w = jnp.asarray(rng.random((4096, 4, 4), np.float32))
y = np.asarray(w).copy()
lat("after 4096x4x4 readback")

# donation
@jax.jit
def jd(s, b):
    return s + b * 0.1

jd2 = jax.jit(lambda s, b: s + b * 0.1, donate_argnums=(0,))
s = jnp.asarray(rng.random((1080, 1920, 3), np.float32))
s = jd2(s, b)
jax.block_until_ready(s)
lat("after donated call")

# scalar upload per call
v = jnp.asarray(3, jnp.int32)
lat("after scalar upload")
