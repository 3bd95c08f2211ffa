"""Golden-image regression tests.

The reference has no automated image tests (SURVEY.md §4); we do better:
deterministic CPU renders of canonical scenes compared against committed
goldens. Regenerate with:  python tests/test_golden.py --regen
"""

from pathlib import Path

import numpy as np
import pytest

from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.core.types import RasterConfig
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
from arkoserenderer_tpu.utils.imageio import load_image_rgba, save_png, to_u8

GOLDEN_DIR = Path(__file__).parent / "goldens"
CFG = PipelineConfig(
    width=96, height=96,
    raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256),
    shadow_map_size=128,
)


def render_cases():
    def forward():
        scene, cam = build_test_scene(viewport=(96, 96))
        r = Renderer(scene, cam, CFG, taa=False, bloom=False)
        return np.array(r.render_frame())

    def full_post():
        scene, cam = build_test_scene(viewport=(96, 96))
        r = Renderer(scene, cam, CFG, ssao=True, motion_blur=True)
        return np.array(r.render_frames(3))

    def rt():
        scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
        r = Renderer(scene, cam, CFG, rt_shadows=True, rt_reflections=True,
                     ddgi=True, taa=False, bloom=False)
        return np.array(r.render_frames(2))

    def pathtraced():
        from arkoserenderer_tpu.models.pathtracer import PathTracer

        scene, cam = build_test_scene(viewport=(96, 96), n_spheres=1)
        t = PathTracer(scene, cam, 96, 96, max_bounces=2, seed=7)
        t.render_sample(4)
        return np.array(t.ldr())

    return {
        "forward": forward,
        "full_post": full_post,
        "rt": rt,
        "pathtraced": pathtraced,
    }


@pytest.mark.parametrize("name", sorted(render_cases().keys()))
def test_golden(name):
    golden_path = GOLDEN_DIR / f"{name}.png"
    if not golden_path.exists():
        pytest.skip(f"golden missing — run: python tests/test_golden.py --regen")
    img = to_u8(render_cases()[name]())
    golden = load_image_rgba(str(golden_path))[..., :3]
    diff = np.abs(img.astype(int) - golden.astype(int))
    # Allow small numeric drift; fail on structural change.
    assert diff.mean() < 1.5, f"{name}: mean abs diff {diff.mean():.2f}"
    assert (diff > 24).mean() < 0.005, f"{name}: {(diff > 24).mean():.2%} pixels changed"


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name, fn in render_cases().items():
            save_png(str(GOLDEN_DIR / f"{name}.png"), fn())
            print("wrote", name)
