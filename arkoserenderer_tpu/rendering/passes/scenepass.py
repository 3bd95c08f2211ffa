"""Scene pass — always node #0, like the reference's GpuScene node.

Role-equivalent to the per-frame GpuScene execute (GpuScene.cpp:476-1011):
the per-frame scene-side work that must happen before any rendering. Round-1
scope: GPU skinning of the vertex pool from the uploaded joint palette
(skinning.comp analogue). Streaming, TLAS refit and light upload slot in
here as they land.

Publishes: geom.positions / geom.normals / geom.tangents — the (possibly
animated) object-space geometry every raster/shadow/shading pass consumes.
"""

from __future__ import annotations

from arkoserenderer_tpu.ops.skinning import skin_vertices
from arkoserenderer_tpu.rendering.pipeline import FrameContext, PipelineConfig, RenderPass
from arkoserenderer_tpu.rendering.registry import Registry


class ScenePass(RenderPass):
    name = "Scene"

    def construct(self, cfg: PipelineConfig, reg: Registry):
        reg.publish("geom.positions")
        reg.publish("geom.normals")
        reg.publish("geom.tangents")
        has_skin = cfg.scene.has_skin

        def execute(state: dict, ctx: FrameContext) -> dict:
            s = ctx.scene
            if has_skin:
                p, n, t = skin_vertices(
                    s.positions, s.normals, s.tangents,
                    s.skin_joints, s.skin_weights, s.palette,
                )
            else:
                p, n, t = s.positions, s.normals, s.tangents
            return {"geom.positions": p, "geom.normals": n, "geom.tangents": t}

        return execute
