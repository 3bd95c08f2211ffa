"""Round-3: measure executable-switch overhead on the tunneled chip.
Same blend program called repeatedly vs alternating with a second program.
Also: per-call blocking latency of one blend."""
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


@jax.jit
def f1(a, b):
    return a + (b - a) * 0.1


@jax.jit
def f2(a, b):
    return a * 0.9 + b * 0.1 + 1e-6


@jax.jit
def f3(a, b):
    return jnp.sqrt(jnp.abs(a - b) + 1e-6)


for f in (f1, f2, f3):
    jax.block_until_ready(f(a, b))

def bench(label, fn_seq, n=30):
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn_seq[i % len(fn_seq)](a, b)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / n * 1e3)
    print(f"{label:24s} {statistics.median(ts):8.3f} ms/call")

bench("same_prog_x30", [f1])
bench("alt_2_progs", [f1, f2])
bench("alt_3_progs", [f1, f2, f3])

# blocking per call
ts = []
for i in range(20):
    t0 = time.perf_counter()
    jax.block_until_ready(f1(a, b))
    ts.append((time.perf_counter() - t0) * 1e3)
print("block_each_same    median", statistics.median(ts))
ts = []
fns = [f1, f2, f3]
for i in range(21):
    t0 = time.perf_counter()
    jax.block_until_ready(fns[i % 3](a, b))
    ts.append((time.perf_counter() - t0) * 1e3)
print("block_each_alt3    median", statistics.median(ts))
