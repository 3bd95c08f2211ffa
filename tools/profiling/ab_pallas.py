"""Clean-session A/B: Pallas raster stage vs the XLA sort-raster at 1080p.

Round-2 measured Pallas raster slower IN A POISONED SESSION (237 vs 208 ms);
this re-measures both paths clean. Run each arm in its OWN process:
    python _r3_ab_pallas.py xla
    python _r3_ab_pallas.py pallas
No readbacks until after the timing loop (poison law 2).
"""
import dataclasses
import sys
import time

import jax

from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig

arm = sys.argv[1] if len(sys.argv) > 1 else "xla"
W, H = 1920, 1080
cfg = PipelineConfig(
    width=W, height=H,
    raster=RasterConfig(tile_h=8, tile_w=128, max_tris_per_tile=256,
                        bin_chunk=2048, use_pallas=(arm == "pallas")),
    shadow_map_size=2048,
)
scene, cam = build_test_scene(viewport=(W, H))
r = Renderer(scene, cam, cfg, taa=False, bloom=False)
for i in range(3):
    jax.block_until_ready(r.render_frame())
t0 = time.perf_counter()
N = 20
for i in range(N):
    out = r.render_frame()
jax.block_until_ready(out)
ms = (time.perf_counter() - t0) / N * 1e3
print(f"{arm}: {ms:.3f} ms/frame at 1080p (forward, no taa/bloom)")
