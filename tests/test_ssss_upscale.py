"""SSSS (config #5 component) and the upscaler slot (DLSS analogue)."""

import numpy as np

from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig

CFG = PipelineConfig(
    width=96, height=96,
    raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256),
    shadow_map_size=128,
)


def test_ssss_blurs_only_subsurface_materials():
    scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
    scene.materials[2].subsurface = 1.0  # the sphere becomes "skin"
    r = Renderer(scene, cam, CFG, ssss=True, taa=False, bloom=False)
    img_sss = np.array(r.render_frame())

    scene2, cam2 = build_test_scene(viewport=(96, 96), n_spheres=1)
    scene2.materials[2].subsurface = 1.0
    r2 = Renderer(scene2, cam2, CFG, ssss=False, taa=False, bloom=False)
    img_ref = np.array(r2.render_frame())

    mat = np.asarray(r.state["SceneMaterial"])
    skin = mat[..., 3] > 0.5
    assert skin.any()
    diff = np.abs(img_sss - img_ref).mean(-1)
    # Skin pixels change, non-skin pixels unchanged.
    assert diff[skin].mean() > diff[~skin].mean() * 3
    assert diff[~skin].max() < 1e-4


def test_upscale_pass_produces_display_res():
    scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
    r = Renderer(scene, cam, CFG, taa=False, bloom=False, upscale_to=(192, 192))
    r.render_frame()
    out = np.asarray(r.state["LDRDisplay"])
    assert out.shape == (192, 192, 3)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0
    # Upscaled image resembles the low-res one (downsample back and compare).
    low = np.asarray(r.state["LDR"])
    ds = out.reshape(96, 2, 96, 2, 3).mean((1, 3))
    assert np.abs(ds - low).mean() < 0.05


def test_ideal_render_resolution():
    from arkoserenderer_tpu.ops.upscale import ideal_render_resolution

    w, h = ideal_render_resolution(1920, 1080, "quality")
    assert w <= 1920 / 1.4 and h <= 1080 / 1.4
    assert w % 8 == 0 and h % 8 == 0
