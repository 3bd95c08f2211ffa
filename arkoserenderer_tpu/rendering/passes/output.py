"""Output pass: tonemap + film effects + display encode.

Role-equivalent to OutputNode (arkose/rendering/output/OutputNode.cpp:11-202):
the scene color is already pre-exposed (lights multiplied by camera
exposure during shading), so this pass applies the selected tonemap operator,
vignette, ISO-scaled film grain, and the sRGB transfer function, producing
the final LDR image in [0,1].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from arkoserenderer_tpu.ops import tonemap as tm
from arkoserenderer_tpu.ops.texture import linear_to_srgb
from arkoserenderer_tpu.rendering.pipeline import FrameContext, PipelineConfig, RenderPass
from arkoserenderer_tpu.rendering.registry import Registry


class OutputPass(RenderPass):
    name = "Output"

    def __init__(
        self,
        mode: str | None = None,
        vignette_intensity: float = 0.18,
        film_grain_gain: float = 0.0,
    ):
        self.mode = mode
        self.vignette_intensity = vignette_intensity
        self.film_grain_gain = film_grain_gain

    def construct(self, cfg: PipelineConfig, reg: Registry):
        h, w = cfg.height, cfg.width
        reg.get("SceneColor")
        reg.create("LDR", (h, w, 3), jnp.float32)
        mode = tm.MODES[self.mode or cfg.tonemap_mode]
        vign = self.vignette_intensity
        grain = self.film_grain_gain
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        u, v = np.meshgrid(xs, ys)
        uv = jnp.asarray(np.stack([u, v], axis=-1))
        pxy = jnp.asarray(
            np.stack(np.meshgrid(np.arange(w, dtype=np.float32),
                                 np.arange(h, dtype=np.float32)), axis=-1)
        )

        def execute(state: dict, ctx: FrameContext) -> dict:
            c = jnp.maximum(state["SceneColor"], 0.0)
            c = tm.tonemap(c, mode)
            if vign > 0.0:
                c = tm.vignette(c, uv, vign)
            if grain > 0.0:
                c = tm.film_grain(c, pxy, ctx.frame_index.astype(jnp.float32), grain)
            return {"LDR": jnp.clip(linear_to_srgb(c), 0.0, 1.0)}

        return execute
