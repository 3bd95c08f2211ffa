"""Pallas tile raster vs the XLA reference implementation (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from arkoserenderer_tpu.core import mathx as mx
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.ops import raster
from arkoserenderer_tpu.ops.raster_pallas import rasterize_tiles_pallas

W, H = 64, 64
CFG = RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=64, max_global_tris=32)


def random_scene(rng, n=60):
    centers = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-3, 3, n), rng.uniform(-10, -2, n)], -1
    )
    offs = rng.normal(size=(n, 3, 3)) * 0.8
    verts = (centers[:, None] + offs).astype(np.float32).reshape(-1, 3)
    idx = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    proj = mx.perspective_reverse_z(np.radians(70.0), W / H, 0.1, 100.0)
    clip = np.asarray(mx.transform_points_h(proj, jnp.asarray(verts)))
    return clip, idx


def test_pallas_matches_xla_raster(rng):
    clip, idx = random_scene(rng)
    setup = raster.setup_triangles(
        jnp.asarray(clip), jnp.asarray(idx), jnp.ones(len(idx), bool), W, H,
        cull_backfaces=False,
    )
    bins = raster.bin_triangles(setup, W, H, CFG)
    vis_ref, depth_ref = raster.rasterize_tiles(setup, bins, W, H, CFG)
    vis_pl, depth_pl = rasterize_tiles_pallas(
        setup, bins, W, H, CFG, interpret=True
    )
    np.testing.assert_allclose(np.asarray(depth_pl), np.asarray(depth_ref), atol=1e-6)
    a, b = np.asarray(vis_pl), np.asarray(vis_ref)
    np.testing.assert_array_equal(a == -1, b == -1)
    assert (a != b).mean() < 0.001  # ids may differ only at exact depth ties


def test_pallas_includes_global_list(rng):
    # One huge floor triangle (goes to the global list) + small ones.
    clip, idx = random_scene(rng, 20)
    big = np.array(
        [[-50, -1, 50], [50, -1, 50], [0, -1, -50]], np.float32
    )
    proj = mx.perspective_reverse_z(np.radians(70.0), W / H, 0.1, 100.0)
    big_clip = np.asarray(mx.transform_points_h(proj, jnp.asarray(big)))
    clip = np.concatenate([clip, big_clip])
    idx = np.concatenate([idx, [[len(clip) - 3, len(clip) - 2, len(clip) - 1]]]).astype(np.int32)
    cfg = RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=64,
                       max_tiles_per_tri=4, max_global_tris=32)
    setup = raster.setup_triangles(
        jnp.asarray(clip), jnp.asarray(idx), jnp.ones(len(idx), bool), W, H,
        cull_backfaces=False, w_eps=0.1,
    )
    bins = raster.bin_triangles(setup, W, H, cfg)
    assert int(bins.global_count) >= 1
    vis_ref, depth_ref = raster.rasterize_tiles(setup, bins, W, H, cfg)
    vis_pl, depth_pl = rasterize_tiles_pallas(setup, bins, W, H, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(depth_pl), np.asarray(depth_ref), atol=1e-6)


def test_pipeline_with_pallas_raster():
    from arkoserenderer_tpu.assets.procedural import build_test_scene
    from arkoserenderer_tpu.models.standard import Renderer
    from arkoserenderer_tpu.rendering.pipeline import PipelineConfig

    cfg_p = PipelineConfig(
        width=96, height=96,
        raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256,
                            max_global_tris=64, use_pallas=True),
        shadow_map_size=128,
    )
    scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
    r = Renderer(scene, cam, cfg_p, taa=False, bloom=False)
    img_pallas = np.array(r.render_frame())

    cfg_x = PipelineConfig(
        width=96, height=96,
        raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256,
                            max_global_tris=64, use_pallas=False),
        shadow_map_size=128,
    )
    scene2, cam2 = build_test_scene(viewport=(96, 96), n_spheres=1)
    r2 = Renderer(scene2, cam2, cfg_x, taa=False, bloom=False)
    img_xla = np.array(r2.render_frame())
    np.testing.assert_allclose(img_pallas, img_xla, atol=1e-5)
