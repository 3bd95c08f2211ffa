"""Round-3: per-call blocking latencies around program switches. Six distinct
1080p programs (like the TAA micro); print each call's latency in sequence
pattern AAAAABBBBB... to expose first-call-after-switch cost."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((H, W, 3), np.float32))
b = jnp.asarray(rng.random((H, W, 3), np.float32))

fns = []
for k in range(6):
    c = 0.1 + 0.01 * k

    def make(c):
        @jax.jit
        def f(a, b):
            return a + (b - a) * c + jnp.sin(a * c) * 1e-3

        return f

    fns.append(make(c))

for f in fns:
    jax.block_until_ready(f(a, b))

for rnd in range(2):
    for i, f in enumerate(fns):
        lat = []
        for call in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(a, b))
            lat.append((time.perf_counter() - t0) * 1e3)
        print(f"round{rnd} prog{i}: " + " ".join(f"{t:7.2f}" for t in lat))
