"""Pixel-band SPMD tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.parallel.sharded import ShardedRenderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig

W, H = 128, 128
CFG = PipelineConfig(
    width=W,
    height=H,
    raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256, bin_chunk=512),
    shadow_map_size=256,
)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single_device(n_devices):
    # Bloom off: its pyramid is band-local under sharding (halo TODO) and
    # would differ at seams. Everything else must match the single-device
    # render exactly.
    scene, cam = build_test_scene(viewport=(W, H))
    ref = Renderer(scene, cam, CFG, bloom=False)
    a = np.asarray(ref.render_frame())

    scene2, cam2 = build_test_scene(viewport=(W, H))
    shr = ShardedRenderer(scene2, cam2, CFG, n_devices=n_devices, bloom=False)
    b = np.array(shr.render_frame())

    assert b.shape == (H, W, 3)
    mism = np.abs(a - b) > 1e-5
    assert mism.mean() < 1e-3, f"sharded render diverges: {mism.mean():.4f}"


def test_sharded_multi_frame_stable():
    scene, cam = build_test_scene(viewport=(W, H))
    shr = ShardedRenderer(scene, cam, CFG, n_devices=8, bloom=False)
    for _ in range(3):
        img = np.array(shr.render_frame())
    assert np.all(np.isfinite(img))
    assert 0.05 < img.mean() < 0.95
