"""Round-3: standalone traversal micro-bench on the TPU — packed-record wide
traversal, chunk-size sweep, vs binary. One process, interleaved."""
import dataclasses
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _cfg
from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.ops import bvh as B

cfg = _cfg(small=False)
scene, camera = build_test_scene(viewport=(cfg.width, cfg.height))
arrays = scene.build(with_bvh=True)
bvh = arrays.bvh
print("bvh nodes:", bvh.node_min.shape[0], "wide nodes:", bvh.wide_meta.shape[0],
      "tris:", bvh.tri_v0.shape[0], flush=True)
bvh_bin = dataclasses.replace(bvh, wide_meta=None)

rng = np.random.default_rng(7)
n = 960 * 540

xs = rng.uniform(-8, 8, n); zs = rng.uniform(-8, 8, n)
org_c = np.stack([xs, np.zeros(n) + 0.05, zs], -1).astype(np.float32)
dir_c = np.tile(np.array([[0.3, 0.9, 0.2]], np.float32), (n, 1))
org_i = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
d = rng.normal(size=(n, 3)).astype(np.float32)
dir_i = d / np.linalg.norm(d, axis=-1, keepdims=True)

cases = {}
for label, (o, dr, ah) in {
    "coh_anyhit": (org_c, dir_c, True),
    "inc_closest": (org_i, dir_i, False),
}.items():
    oj = jnp.asarray(o); dj = jnp.asarray(dr)
    for ck in (8192, 32768, 129600):
        fn = jax.jit(lambda oo, dd, ah=ah, ck=ck: B.trace_rays(
            bvh, oo, dd, any_hit=ah, chunk_size=ck))
        r = jax.block_until_ready(fn(oj, dj))
        cases[f"{label}:wide:{ck//1024}k"] = (fn, oj, dj, r)
    fnb = jax.jit(lambda oo, dd, ah=ah: B.trace_rays(
        bvh_bin, oo, dd, any_hit=ah, chunk_size=8192))
    rb = jax.block_until_ready(fnb(oj, dj))
    cases[f"{label}:bin:8k"] = (fnb, oj, dj, rb)
    w = np.asarray(cases[f"{label}:wide:8k"][3].hit)
    b = np.asarray(rb.hit)
    print(f"{label}: hits wide {w.sum()} bin {b.sum()} mismatch {(w!=b).sum()}",
          flush=True)

acc = {k: [] for k in cases}
for rep in range(3):
    for name, (fn, oj, dj, _) in cases.items():
        t0 = time.perf_counter()
        for _ in range(2):
            out = fn(oj, dj)
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 2 * 1e3)

for name, times in acc.items():
    print(f"{name:26s} {statistics.median(times):9.2f} ms "
          f"(reps {[round(t,1) for t in times]})", flush=True)
