"""Benchmark: steady-state ms/frame of the flagship forward pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference's implied 16.667 ms/frame (60 FPS) budget at 1080p
(arkose/rendering/RenderPipeline.cpp:82 per BASELINE.md); ``vs_baseline`` is
budget / measured, so > 1.0 means faster than the reference's budget.

Runs on whatever JAX platform the environment provides (the real TPU chip
under the driver; XLA:CPU elsewhere — pass --small for CI-sized frames).
"""

from __future__ import annotations

import json
import sys
import time

BUDGET_MS = 16.667


def main() -> None:
    small = "--small" in sys.argv

    import jax

    from arkoserenderer_tpu.assets.procedural import build_test_scene
    from arkoserenderer_tpu.core.types import RasterConfig
    from arkoserenderer_tpu.models.standard import Renderer
    from arkoserenderer_tpu.rendering.pipeline import PipelineConfig

    if small:
        cfg = PipelineConfig(
            width=256, height=256,
            raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256, bin_chunk=512),
            shadow_map_size=256,
        )
    else:
        cfg = PipelineConfig(
            width=1920, height=1080,
            raster=RasterConfig(tile_h=8, tile_w=128, max_tris_per_tile=256, bin_chunk=2048),
            shadow_map_size=2048,
        )

    scene, camera = build_test_scene(viewport=(cfg.width, cfg.height))
    renderer = Renderer(scene, camera, cfg)

    # Warmup (compile) then steady state.
    for _ in range(2):
        jax.block_until_ready(renderer.render_frame())
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = renderer.render_frame()
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3

    res = f"{cfg.width}x{cfg.height}"
    print(
        json.dumps(
            {
                "metric": f"ms/frame {res} forward(visbuf raster+shadow+PBR+TAA+bloom+tonemap), "
                          f"procedural scene, single chip",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BUDGET_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
