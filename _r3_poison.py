"""Round-3: characterize the post-gather dispatch degradation.
Q1: does a tiny gather trigger it?  Q2: threshold on gather size?
Q3: fixed per-dispatch penalty or proportional?  Q4: reversible
(clear_caches, deleting arrays)?"""
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((H, W, 3), np.float32))
b = jnp.asarray(rng.random((H, W, 3), np.float32))
tiny = jnp.asarray(rng.random((128,), np.float32))


@jax.jit
def jb(a, b):
    return a + (b - a) * 0.1


@jax.jit
def jtiny(t):
    return t * 2.0


def lat(label, f=None, args=None, n=6):
    f = f or jb
    args = args or (a, b)
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:44s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
jax.block_until_ready(jtiny(tiny))
lat("baseline blend")
lat("baseline tiny", jtiny, (tiny,))

# Q1/Q2: gathers of increasing size
for size, rows in [(1024, 256), (65536, 4096), (1 << 20, 1 << 18)]:
    table = jnp.asarray(rng.random((size, 8), np.float32))
    idx = jnp.asarray(rng.integers(0, size, rows).astype(np.int32))

    @jax.jit
    def jg(table, idx):
        return table[idx].sum()

    jax.block_until_ready(jg(table, idx))
    lat(f"after gather table={size} rows={rows}")

lat("tiny after gathers", jtiny, (tiny,))

# Q4: reversibility
jax.clear_caches()
jax.block_until_ready(jb(a, b))
lat("after clear_caches")
