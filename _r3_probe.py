"""Fresh-process poison probe: python _r3_probe.py <case>.
Prints baseline latency, runs the case program once, prints post latency."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

case = sys.argv[1]
H, W = 1080, 1920
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
    print(f"{label:40s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

if case == "np8mb":
    cst = rng.random(2 * 1024 * 1024).astype(np.float32)

    @jax.jit
    def f(x):
        return (x + cst).sum()

    arg = jnp.asarray(rng.random(2 * 1024 * 1024, np.float32))
elif case == "np4kb":
    cst = rng.random(1024).astype(np.float32)

    @jax.jit
    def f(x):
        return (x + cst).sum()

    arg = jnp.asarray(rng.random(1024, np.float32))
elif case == "dev1kb":
    cst = jnp.asarray(rng.random(256, np.float32))

    @jax.jit
    def f(x):
        return (x + cst).sum()

    arg = jnp.asarray(rng.random(256, np.float32))
elif case == "dev3":
    cst = jnp.asarray(np.array([0.2126, 0.7152, 0.0722], np.float32))

    @jax.jit
    def f(x):
        return (x * cst).sum()

    arg = jnp.asarray(rng.random(3, np.float32))
elif case == "intrace8mb":
    cstnp = rng.random(2 * 1024 * 1024).astype(np.float32)

    @jax.jit
    def f(x):
        return (x + jnp.array(cstnp)).sum()

    arg = jnp.asarray(rng.random(2 * 1024 * 1024, np.float32))
elif case == "dev128b":
    cst = jnp.asarray(rng.random(32, np.float32))

    @jax.jit
    def f(x):
        return (x + cst).sum()

    arg = jnp.asarray(rng.random(32, np.float32))
else:
    raise SystemExit(f"unknown case {case}")

jax.block_until_ready(f(arg))
lat(f"after {case}")
