"""Native .ark* asset loading against the reference's own shipped files
(cereal JSON archives — MeshAsset.h:147 .arkmsh, MaterialAsset .arkmat,
LevelAsset .arklvl). Data only; no reference code involved."""

from pathlib import Path

import numpy as np
import pytest

from arkoserenderer_tpu.assets.ark import load_arklvl, load_arkmat, load_arkmsh
from arkoserenderer_tpu.core.types import SceneLimits
from arkoserenderer_tpu.scene.scene import Scene

ASSETS = Path("/root/reference/assets/assets")

pytestmark = pytest.mark.skipif(
    not ASSETS.exists(), reason="reference sample assets not mounted"
)


def small_scene():
    return Scene(limits=SceneLimits(
        max_vertices=1 << 16, max_indices=3 << 16, max_drawables=64,
        max_materials=32, max_textures=32, texture_pool_texels=1 << 18,
    ))


def test_arkmsh_box_loads_with_material():
    scene = small_scene()
    sids = load_arkmsh(scene, ASSETS / "sample/models/Box/Box.arkmsh")
    assert len(sids) == 1
    seg = scene.segments[sids[0]]
    assert seg.positions.shape == (24, 3)
    assert seg.num_triangles == 12
    # Red.arkmat: colorTint (0.8, 0, 0, 1), roughness 1.
    mat = scene.materials[seg.material]
    np.testing.assert_allclose(
        mat.base_color_factor, [0.8, 0.0, 0.0, 1.0], atol=1e-6)
    assert mat.roughness_factor == 1.0


def test_arkmat_defaults():
    scene = small_scene()
    mid = load_arkmat(scene, ASSETS / "engine/default/DefaultMaterial.arkmat")
    m = scene.materials[mid]
    assert m.base_color_tex == 0          # no texture refs in the file
    assert 0.0 <= m.metallic_factor <= 1.0


def test_arklvl_cornellbox_camera_and_missing_mesh():
    scene = small_scene()
    res = load_arklvl(scene, ASSETS / "sample/levels/CornellBox.arklvl")
    # The shipped level references an .arkmsh not present in the checkout:
    # reported, not fatal.
    assert res["missing"], "expected the absent CornellBox-Original.arkmsh"
    assert len(res["cameras"]) == 1
    cam = res["cameras"][0]
    np.testing.assert_allclose(cam.position, [0.0, 1.0, 4.0], atol=1e-6)
    assert cam.focal_length_mm == 30.0
    assert cam.f_number == 11.0
    assert cam.iso == 400.0


def test_arklvl_humandemo_parses_directional_light():
    scene = small_scene()
    res = load_arklvl(scene, ASSETS / "sample/levels/HumanDemo/HumanDemo.arklvl")
    assert res["lights"] == 1
    assert scene.sun is not None
    assert scene.sun.illuminance_lux == 90000.0
    d = np.asarray(scene.sun.direction, np.float64)
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, atol=1e-5)
    assert d[1] < 0.0   # points downward


def test_ark_box_renders_end_to_end():
    """The loaded Box.arkmsh renders through the full pipeline with its
    .arkmat material: red pixels on screen."""
    from arkoserenderer_tpu.core.types import RasterConfig
    from arkoserenderer_tpu.models.standard import Renderer
    from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
    from arkoserenderer_tpu.scene.camera import Camera
    from arkoserenderer_tpu.scene.lights import DirectionalLight

    scene = small_scene()
    sids = load_arkmsh(scene, ASSETS / "sample/models/Box/Box.arkmsh")
    w = np.eye(4, dtype=np.float32)
    scene.add_instance(sids[0], w)
    scene.sun = DirectionalLight(
        direction=np.array([0.3, -1.0, -0.4], np.float32),
        illuminance_lux=90000.0)
    scene.ambient_lx = 5000.0
    cam = Camera(viewport=(96, 96))
    cam.look_at((1.6, 1.3, 2.2), (0.0, 0.0, 0.0))
    cfg = PipelineConfig(
        width=96, height=96,
        raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256),
        shadow_map_size=128,
    )
    r = Renderer(scene, cam, cfg, taa=False, bloom=False)
    img = np.array(r.render_frame())
    assert np.isfinite(img).all()
    # The box fills the view center; red dominates there.
    center = img[36:60, 36:60]
    assert center[..., 0].mean() > center[..., 1].mean() * 1.5
    assert center[..., 0].mean() > 0.1


def test_meshviewer_inspects_arkmsh(capsys):
    """The MeshViewer CLI accepts the reference's .arkmsh directly."""
    from arkoserenderer_tpu.apps import meshviewer

    meshviewer.main([
        str(ASSETS / "sample/models/Box/Box.arkmsh"), "--no-render",
    ])
    out = capsys.readouterr().out
    assert "segments" in out.lower() or "Mesh" in out
