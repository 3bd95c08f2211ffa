"""Directional sun shadow map: depth-only raster from the light's ortho view.

Role-equivalent to DirectionalShadowDrawNode (8k ortho shadow map drawn via
the meshlet depth-only path, arkose/rendering/shadow/
DirectionalShadowDrawNode.cpp); the PCF projection to screen space happens in
the shading pass (projectShadow.comp equivalent lives in ops/shadow.py).

Publishes: ShadowMap.sun (S, S) f32 reverse-Z depth.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from arkoserenderer_tpu.core import mathx as mx
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.ops import raster
from arkoserenderer_tpu.rendering.passes.geometry import transform_vertices_clip
from arkoserenderer_tpu.rendering.pipeline import FrameContext, PipelineConfig, RenderPass
from arkoserenderer_tpu.rendering.registry import Registry


class SunShadowPass(RenderPass):
    name = "SunShadow"

    def construct(self, cfg: PipelineConfig, reg: Registry):
        s = cfg.shadow_map_size
        reg.create("ShadowMap.sun", (s, s), jnp.float32, clear=mx.DEPTH_FAR)
        # Shadow raster tiles: same config family, bigger bins are fine since
        # the light view covers the whole scene.
        rcfg = dataclasses.replace(cfg.raster, tile_h=min(cfg.raster.tile_h, s),
                                   tile_w=min(cfg.raster.tile_w, s))

        def execute(state: dict, ctx: FrameContext) -> dict:
            clip = transform_vertices_clip(ctx.scene, ctx.scene.lights.sun_view_proj)
            setup = raster.setup_triangles(
                clip, ctx.scene.indices, ctx.scene.tri_valid, s, s,
                cull_backfaces=False,  # avoid peter-panning on single-sided geo
            )
            bins = raster.bin_triangles(setup, s, s, rcfg)
            _, depth = raster.rasterize_tiles(setup, bins, s, s, rcfg, depth_only=True)
            return {"ShadowMap.sun": depth}

        return execute
