"""Sky pass: environment map where no geometry covered the pixel.

Role-equivalent to SkyViewNode (arkose/rendering/nodes/SkyViewNode.cpp):
fills background with the equirect env map along camera rays and writes the
camera-reprojection sky velocity TAA needs.
"""

from __future__ import annotations

from arkoserenderer_tpu.ops.shading import shade_sky
from arkoserenderer_tpu.rendering.pipeline import (
    FrameContext,
    PipelineConfig,
    RenderPass,
    pixel_centers,
)
from arkoserenderer_tpu.rendering.registry import Registry
import jax.numpy as jnp


class SkyPass(RenderPass):
    name = "SkyView"

    def construct(self, cfg: PipelineConfig, reg: Registry):
        h, w = cfg.height, cfg.width
        reg.get("SceneColor")
        reg.get("SceneCoverage")
        reg.get("SceneVelocity")
        px, py = pixel_centers(cfg)

        full_h = cfg.frame_height

        def execute(state: dict, ctx: FrameContext) -> dict:
            color = state["SceneColor"].reshape(-1, 3)
            valid = state["SceneCoverage"].reshape(-1)
            py_global = py + ctx.row_offset.astype(py.dtype)
            out, sky_vel = shade_sky(
                ctx.scene, ctx.camera, color, valid, px, py_global, w, full_h
            )
            vel = state["SceneVelocity"].reshape(-1, 2)
            vel = jnp.where(valid[:, None], vel, sky_vel)
            return {
                "SceneColor": out.reshape(h, w, 3),
                "SceneVelocity": vel.reshape(h, w, 2),
            }

        return execute
