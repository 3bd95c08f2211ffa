"""glTF importer tests against the reference's sample assets (data only —
the reference tree is the natural source of test scenes; no code involved)."""

from pathlib import Path

import numpy as np
import pytest

from arkoserenderer_tpu.assets.gltf import load_gltf, parse_gltf, read_accessor
from arkoserenderer_tpu.core.types import SceneLimits
from arkoserenderer_tpu.scene.scene import Scene

SAMPLES = Path("/root/reference/assets/assets/sample/models")

pytestmark = pytest.mark.skipif(
    not SAMPLES.exists(), reason="reference sample assets not mounted"
)


def small_scene():
    return Scene(
        limits=SceneLimits(
            max_vertices=1 << 18, max_indices=3 << 18, max_drawables=256,
            max_materials=64, max_textures=64, texture_pool_texels=1 << 22,
        )
    )


def test_cornell_box_geometry():
    scene = small_scene()
    res = load_gltf(scene, SAMPLES / "CornellBox" / "CornellBox.gltf")
    assert res.instance_count > 0
    arrays = scene.build()
    tri_valid = np.asarray(arrays.tri_valid)
    assert tri_valid.sum() > 10
    pos = np.asarray(arrays.positions)
    assert np.isfinite(pos).all()
    # Cornell box is roughly unit scale and closed: bounding sphere sane.
    center, radius = scene.bounding_sphere()
    assert 0.5 < radius < 50.0


def test_damaged_helmet_textures():
    scene = small_scene()
    res = load_gltf(
        scene, SAMPLES / "DamagedHelmet" / "DamagedHelmet.gltf", max_texture_size=128
    )
    assert len(res.texture_ids) >= 3  # base/normal/mr at least
    assert res.instance_count >= 1
    mats = scene.materials
    assert any(m.base_color_tex >= 4 for m in mats)  # non-default texture assigned


def test_glb_container():
    glb = SAMPLES.parent.parent / "engine" / "test" / "material" / "clearcoat" / "CompareClearcoat.glb"
    if not glb.exists():
        pytest.skip("no glb sample")
    g = parse_gltf(glb)
    assert "meshes" in g.doc and g.buffers


def test_accessor_decode_head_positions():
    # (Sponza.gltf ships without its .bin in the reference checkout; the
    # Head model is the largest complete sample.)
    g = parse_gltf(SAMPLES / "Head" / "lpshead.gltf")
    prim = g.doc["meshes"][0]["primitives"][0]
    pos = read_accessor(g, prim["attributes"]["POSITION"])
    assert pos.shape[1] == 3 and pos.dtype == np.float32
    acc = g.doc["accessors"][prim["attributes"]["POSITION"]]
    np.testing.assert_allclose(pos.min(0), acc["min"], rtol=1e-5)
    np.testing.assert_allclose(pos.max(0), acc["max"], rtol=1e-5)


def test_cornell_interior_renders():
    from arkoserenderer_tpu.core.types import RasterConfig
    from arkoserenderer_tpu.models.standard import Renderer
    from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
    from arkoserenderer_tpu.scene.camera import Camera
    from arkoserenderer_tpu.scene.lights import DirectionalLight
    from arkoserenderer_tpu.assets.procedural import gradient_env_map

    scene = Scene(
        limits=SceneLimits(
            max_vertices=1 << 19, max_indices=3 << 19, max_drawables=512,
            max_materials=64, max_textures=128, texture_pool_texels=1 << 23,
        )
    )
    load_gltf(scene, SAMPLES / "CornellBox" / "CornellBox.gltf", max_texture_size=64)
    scene.sun = DirectionalLight(direction=np.array([0.2, -1.0, 0.1], np.float32))
    scene.set_env_map(gradient_env_map(16), brightness=8000.0)
    scene.ambient_lx = 8000.0
    cam = Camera(viewport=(128, 128))
    center, radius = scene.bounding_sphere()
    cam.look_at(center + np.array([0.0, 0.0, radius * 1.6]), center)
    cfg = PipelineConfig(
        width=128, height=128,
        raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=512, bin_chunk=2048),
        shadow_map_size=256,
    )
    r = Renderer(scene, cam, cfg, taa=False, bloom=False)
    img = np.array(r.render_frame())
    assert np.isfinite(img).all()
    vis = np.asarray(r.state["Visibility"])
    assert (vis >= 0).mean() > 0.5  # inside the atrium, mostly geometry
    assert img.std() > 0.03
