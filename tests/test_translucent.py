"""Single-layer transparency (Forward translucent pass analogue)."""

import numpy as np

from arkoserenderer_tpu.assets.procedural import build_test_scene, make_box
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
from arkoserenderer_tpu.scene.scene import BLEND_TRANSLUCENT, Material

CFG = PipelineConfig(
    width=96, height=96,
    raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256),
    shadow_map_size=128,
)


def scene_with_glass(alpha):
    scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
    glass = scene.add_material(Material(
        base_color_factor=np.array([0.4, 0.6, 0.9, alpha], np.float32),
        roughness_factor=0.1, blend_mode=BLEND_TRANSLUCENT,
    ))
    box = make_box((1.6, 1.6, 0.1))
    box.material = glass
    bid = scene.add_segment(box)
    w = np.eye(4, dtype=np.float32)
    w[:3, 3] = (-2.0, 1.0, 1.6)  # in front of the first sphere
    scene.add_instance(bid, w)
    return scene, cam


def test_translucency_blends_not_occludes():
    scene, cam = scene_with_glass(0.5)
    assert scene.static_info().has_translucent
    r = Renderer(scene, cam, CFG, taa=False, bloom=False)
    img_glass = np.array(r.render_frame())

    scene_op, cam2 = scene_with_glass(0.0)  # fully transparent
    r2 = Renderer(scene_op, cam2, CFG, taa=False, bloom=False)
    img_clear = np.array(r2.render_frame())

    scene3, cam3 = build_test_scene(viewport=(96, 96), n_spheres=1)
    r3 = Renderer(scene3, cam3, CFG, taa=False, bloom=False)
    img_none = np.array(r3.render_frame())

    # alpha=0 glass leaves the image essentially unchanged (tiny drift is
    # allowed: the extra instance enlarges the scene bounds, refitting the
    # sun shadow projection and shifting PCF taps slightly).
    assert np.abs(img_clear - img_none).mean() < 2e-3
    # alpha=0.5 glass changes some pixels but the scene remains visible
    # behind it (not fully occluded).
    diff = np.abs(img_glass - img_none).mean(-1)
    assert (diff > 0.02).any()
    changed = diff > 0.02
    # Behind-glass pixels still correlate with the original image.
    corr = np.corrcoef(img_glass[changed].ravel(), img_none[changed].ravel())[0, 1]
    assert corr > 0.5
