"""Upscale pass: LDR render-res -> display-res (the DLSS slot).

Role-equivalent to DLSSNode (arkose/rendering/upscaling/DLSSNode.cpp:8-101):
sits at the end of the chain; the pipeline renders at cfg.width/height and
this pass produces the display-resolution image. (The reference also drives
a global texture mip bias from the ratio — our texture LOD already uses
analytic gradients in render-pixel space, which is equivalent.)
"""

from __future__ import annotations

import jax.numpy as jnp

from arkoserenderer_tpu.ops.upscale import upscale
from arkoserenderer_tpu.rendering.pipeline import FrameContext, PipelineConfig, RenderPass
from arkoserenderer_tpu.rendering.registry import Registry


class UpscalePass(RenderPass):
    name = "Upscale"

    def __init__(self, display_width: int, display_height: int, sharpness: float = 0.4):
        self.display = (display_width, display_height)
        self.sharpness = sharpness

    def construct(self, cfg: PipelineConfig, reg: Registry):
        reg.get("LDR")
        dw, dh = self.display
        reg.create("LDRDisplay", (dh, dw, 3), jnp.float32)
        sharp = self.sharpness

        def execute(state: dict, ctx: FrameContext) -> dict:
            out = upscale(state["LDR"], dh, dw, sharp)
            return {"LDRDisplay": out}

        return execute
