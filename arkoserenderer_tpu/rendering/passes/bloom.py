"""Bloom: downsample pyramid + tent upsample + additive blend.

Role-equivalent to BloomNode (arkose/rendering/nodes/BloomNode.cpp +
shaders/bloom/{downsample,upsample,blend}.comp): a mip pyramid built by box
downsampling, collapsed back up with tent-filter upsamples, blended into
SceneColor with a small weight.
"""

from __future__ import annotations

import jax.numpy as jnp

from arkoserenderer_tpu.ops.image import blur3, downsample2x, upsample2x
from arkoserenderer_tpu.rendering.pipeline import FrameContext, PipelineConfig, RenderPass
from arkoserenderer_tpu.rendering.registry import Registry


class BloomPass(RenderPass):
    name = "Bloom"

    def __init__(self, levels: int = 5, strength: float = 0.04):
        self.levels = levels
        self.strength = strength

    def construct(self, cfg: PipelineConfig, reg: Registry):
        reg.get("SceneColor")
        # Clamp level count to what the viewport can halve evenly.
        levels = self.levels
        h, w = cfg.height, cfg.width
        lv = 0
        while lv < levels and h % 2 == 0 and w % 2 == 0 and h > 8 and w > 8:
            h //= 2
            w //= 2
            lv += 1
        levels = lv
        strength = self.strength

        def execute(state: dict, ctx: FrameContext) -> dict:
            color = state["SceneColor"]
            chain = [color]
            x = color
            for _ in range(levels):
                x = downsample2x(blur3(x))
                chain.append(x)
            up = chain[-1]
            for i in range(levels - 1, 0, -1):
                up = chain[i] + upsample2x(up)
            bloom = upsample2x(up) if levels > 0 else color
            return {"SceneColor": color + strength * bloom}

        return execute
