"""Incremental geometry streaming (VertexManager streaming state machine)."""

import numpy as np
import pytest

from arkoserenderer_tpu.assets.procedural import build_test_scene, make_box
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
from arkoserenderer_tpu.scene.scene import Material

CFG = PipelineConfig(
    width=96, height=96,
    raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256),
    shadow_map_size=128,
)


def test_stream_instance_appears_without_rebuild():
    scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
    red = scene.add_material(Material(
        base_color_factor=np.array([0.9, 0.1, 0.1, 1.0], np.float32)))
    box = make_box((1.2, 1.2, 1.2))
    box.material = red
    sid = scene.add_segment(box)

    r = Renderer(scene, cam, CFG, taa=False, bloom=False)
    img0 = np.array(r.render_frame())
    compiled_before = r.pipeline._compiled

    w = np.eye(4, dtype=np.float32)
    w[:3, 3] = (1.5, 0.6, 1.5)
    r.scene_arrays = scene.stream_instance(r.scene_arrays, sid, w)
    img1 = np.array(r.render_frame())

    # The streamed box renders...
    assert np.abs(img1 - img0).max() > 0.05
    assert np.isfinite(img1).all()
    # ...with the SAME compiled frame function (no retrace/rebuild).
    assert r.pipeline._compiled is compiled_before

    # Streaming again stacks more instances.
    w2 = np.array(w); w2[:3, 3] = (1.5, 0.6, -1.0)
    r.scene_arrays = scene.stream_instance(r.scene_arrays, sid, w2)
    img2 = np.array(r.render_frame())
    assert np.abs(img2 - img1).max() > 0.05


def test_stream_instance_capacity_error():
    scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
    sid = 1  # the sphere segment
    r = Renderer(scene, cam, CFG, taa=False, bloom=False)
    w = np.eye(4, dtype=np.float32)
    with pytest.raises(RuntimeError, match="pools full"):
        for _ in range(10000):
            r.scene_arrays = scene.stream_instance(r.scene_arrays, sid, w)


def test_stream_matches_full_rebuild():
    """A streamed scene must render the same image as the equivalent scene
    built from scratch."""
    def fresh(extra):
        scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
        mat = scene.add_material(Material(
            base_color_factor=np.array([0.2, 0.8, 0.3, 1.0], np.float32)))
        box = make_box((1.0, 1.0, 1.0))
        box.material = mat
        sid = scene.add_segment(box)
        if extra:
            w = np.eye(4, dtype=np.float32)
            w[:3, 3] = (1.8, 0.5, 0.5)
            scene.add_instance(sid, w)
        return scene, cam, sid

    scene_a, cam_a, _ = fresh(extra=True)
    ra = Renderer(scene_a, cam_a, CFG, taa=False, bloom=False)
    ra.render_frame()
    ref = np.array(ra.render_frame())  # frame 1 (same jitter as below)

    scene_b, cam_b, sid = fresh(extra=False)
    rb = Renderer(scene_b, cam_b, CFG, taa=False, bloom=False)
    rb.render_frame()
    w = np.eye(4, dtype=np.float32)
    w[:3, 3] = (1.8, 0.5, 0.5)
    rb.scene_arrays = scene_b.stream_instance(rb.scene_arrays, sid, w)
    got = np.array(rb.render_frame())
    np.testing.assert_allclose(got, ref, atol=1e-5)
