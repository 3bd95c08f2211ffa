"""Per-config poison probe: build config (arg), run 2 frames, then measure
trivial-blend dispatch latency. ~28ms => the config's program captures a
device array somewhere. Usage: python _r3_cfgprobe.py <config>"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

name = sys.argv[1]
rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((1080, 1920, 3), np.float32))
b = jnp.asarray(rng.random((1080, 1920, 3), np.float32))


@jax.jit
def jb(a, b):
    return a + (b - a) * 0.1


def lat(label, n=5):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(a, b))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:28s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

from bench import run_config

line = run_config(name, small=False, iters=5, timings=False)
lat(f"after {name}")
