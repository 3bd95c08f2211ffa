"""Which D2H paths poison? Run each case in its own process:
python _r3_readback2.py <case>; cases: npasarray nparray deviceget item
small jnp_indexcopy"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

case = sys.argv[1]
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

w = jnp.asarray(rng.random((4096, 4, 4), np.float32))
if case == "npasarray":
    _ = np.asarray(w)
elif case == "nparray":
    _ = np.array(w)
elif case == "deviceget":
    _ = jax.device_get(w)
elif case == "item":
    _ = float(w[0, 0, 0])
elif case == "small":
    s = jnp.asarray(np.float32(3.0))
    _ = np.asarray(s)
elif case == "jnp_indexcopy":
    # stay on device: jnp copy then single blocking transfer via tolist? no —
    # control: no readback at all
    _ = jnp.array(w) + 1.0
    jax.block_until_ready(_)
else:
    raise SystemExit("unknown")
lat(f"after {case}")
