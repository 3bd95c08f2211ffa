"""Round-3 profile: fused-frame ablation matrix for the 1080p forward config,
one process, interleaved reps (the only timing methodology DEVNOTES trusts
on the tunneled chip)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _cfg
from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.models.standard import Renderer

VARIANTS = {
    "full": {},
    "no_taa": dict(taa=False),
    "no_bloom": dict(bloom=False),
    "no_shadows": dict(shadows=False),
    "no_taa_no_bloom": dict(taa=False, bloom=False),
}


def make(kw):
    cfg = _cfg(small=False)
    scene, camera = build_test_scene(viewport=(cfg.width, cfg.height))
    return Renderer(scene, camera, cfg, **kw)


renderers = {}
for name, kw in VARIANTS.items():
    t0 = time.perf_counter()
    r = make(kw)
    jax.block_until_ready(r.render_frame())
    jax.block_until_ready(r.render_frame())
    renderers[name] = r
    print(f"built+warmed {name} in {time.perf_counter()-t0:.1f}s", flush=True)

# interleaved measurement: 4 rounds x 3 frames each
acc = {k: [] for k in VARIANTS}
for rep in range(4):
    for name, r in renderers.items():
        t0 = time.perf_counter()
        for _ in range(3):
            out = r.render_frame()
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 3 * 1e3)

import statistics
base = None
for name, times in acc.items():
    med = statistics.median(times)
    if name == "full":
        base = med
    delta = "" if base is None or name == "full" else f"  delta {med-base:+.1f}"
    print(f"{name:18s} {med:8.2f} ms  (reps: {[round(t,1) for t in times]}){delta}",
          flush=True)
