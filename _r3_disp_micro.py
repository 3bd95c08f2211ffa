"""Round-3: separate per-dispatch overhead (axon tunnel RPC) from HBM
bandwidth: empty jit, tiny blend, 1080p blend, and K blends fused in one jit
(fori_loop) so per-call overhead amortizes."""
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
tiny = jnp.asarray(rng.random((8, 8), np.float32))


@jax.jit
def empty(x):
    return x


@jax.jit
def blend1(a, b):
    return a + (b - a) * 0.1


@jax.jit
def blend10(a, b):
    def body(i, c):
        return c + (b - c) * 0.1

    return jax.lax.fori_loop(0, 10, body, a)


@jax.jit
def blend10_unrolled(a, b):
    c = a
    for i in range(10):
        c = (c + (b - c) * 0.1) * (1.0 + 1e-7 * i)
    return c


@jax.jit
def tinyop(t):
    return t * 2.0


FNS = {
    "empty_1080p": (empty, (a,)),
    "tiny_8x8": (tinyop, (tiny,)),
    "blend1": (blend1, (a, b)),
    "blend10_fori": (blend10, (a, b)),
    "blend10_unroll": (blend10_unrolled, (a, b)),
}
for name, (f, args) in FNS.items():
    jax.block_until_ready(f(*args))

acc = {k: [] for k in FNS}
for rep in range(5):
    for name, (f, args) in FNS.items():
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(*args)
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 10 * 1e3)

for name, ts in acc.items():
    print(f"{name:16s} {statistics.median(ts):8.3f} ms")
