"""Round-3 profile 3: decompose VisibilityShading via ops-level ablation
knobs (packed_shading._ABLATE), fused forward frame, steady-state feedback
(render_frame -> cached shadow map warm), one process, interleaved."""
import dataclasses
import statistics
import sys
import time

import jax

sys.path.insert(0, "/root/repo")
from bench import _cfg
from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.ops import packed_shading as PS

VARIANTS = ["full", "const_rec", "uniform_rec", "no_tex", "no_shadow"]

renderers = {}
for name in VARIANTS:
    PS._ABLATE = {name} if name != "full" else set()
    cfg = _cfg(small=False)
    cfg = dataclasses.replace(
        cfg, texture_quality="stochastic1", shadow_filter="stochastic"
    )
    scene, camera = build_test_scene(viewport=(cfg.width, cfg.height))
    t0 = time.perf_counter()
    r = Renderer(scene, camera, cfg)
    jax.block_until_ready(r.render_frame())
    jax.block_until_ready(r.render_frame())
    jax.block_until_ready(r.render_frame())
    renderers[name] = r
    print(f"built+warmed {name} in {time.perf_counter()-t0:.1f}s", flush=True)
PS._ABLATE = set()

acc = {k: [] for k in renderers}
for rep in range(4):
    for name, r in renderers.items():
        t0 = time.perf_counter()
        for _ in range(3):
            out = r.render_frame()
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 3 * 1e3)

base = None
for name, times in acc.items():
    med = statistics.median(times)
    if name == "full":
        base = med
    d = "" if name == "full" else f"  delta {med-base:+.1f}"
    print(f"{name:14s} {med:8.2f} ms  (reps: {[round(t,1) for t in times]}){d}",
          flush=True)
