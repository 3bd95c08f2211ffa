"""Golden-image regression tests.

The reference has no automated image tests (SURVEY.md §4); we do better:
deterministic CPU renders of canonical scenes compared against committed
goldens, at 256x256 (round-3 upgrade from 96x96), including one real glTF
asset (DamagedHelmet, the reference's own sample model) and the RT / DDGI
configs. Regenerate with:  python tests/test_golden.py --regen
"""

from pathlib import Path

import numpy as np
import pytest

from arkoserenderer_tpu.assets.procedural import (
    build_test_scene,
    gradient_env_map,
)
from arkoserenderer_tpu.core.types import RasterConfig, SceneLimits
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
from arkoserenderer_tpu.utils.imageio import load_image_rgba, save_png, to_u8

GOLDEN_DIR = Path(__file__).parent / "goldens"
RES = 256
CFG = PipelineConfig(
    width=RES, height=RES,
    raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=256),
    shadow_map_size=256,
)
SAMPLES = Path("/root/reference/assets/assets/sample/models")


def render_cases():
    def forward():
        scene, cam = build_test_scene(viewport=(RES, RES))
        r = Renderer(scene, cam, CFG, taa=False, bloom=False)
        return np.array(r.render_frame())

    def full_post():
        scene, cam = build_test_scene(viewport=(RES, RES))
        r = Renderer(scene, cam, CFG, ssao=True, motion_blur=True)
        return np.array(r.render_frames(3))

    def rt():
        from arkoserenderer_tpu.scene.lights import SpotLight

        scene, cam = build_test_scene(viewport=(RES, RES), n_spheres=1)
        # Shadow-casting spot: pins RTLocalShadowPass (exact local masks).
        scene.spots.append(SpotLight(
            position=np.array([0.5, 3.0, 1.0], np.float32),
            direction=np.array([-0.2, -1.0, -0.1], np.float32),
            luminous_intensity_cd=150000.0,
            cast_shadows=True,
        ))
        r = Renderer(scene, cam, CFG, rt_shadows=True, rt_reflections=True,
                     taa=False, bloom=False)
        return np.array(r.render_frames(2))

    def ddgi():
        from arkoserenderer_tpu.ops.ddgi import ProbeGridConfig

        scene, cam = build_test_scene(viewport=(RES, RES), n_spheres=1)
        r = Renderer(scene, cam, CFG, ddgi=ProbeGridConfig(),
                     taa=False, bloom=False)
        return np.array(r.render_frames(2))

    def showcase():
        # The BASELINE north-star frame: raster + RT shadows/reflections +
        # DDGI + SSAO + full post in ONE pipeline (bench --config showcase).
        from arkoserenderer_tpu.ops.ddgi import ProbeGridConfig

        scene, cam = build_test_scene(viewport=(RES, RES), n_spheres=1)
        r = Renderer(scene, cam, CFG, rt_shadows=True, rt_reflections=True,
                     ddgi=ProbeGridConfig(), ssao=True, fog=True,
                     motion_blur=True)
        return np.array(r.render_frames(2))

    def pathtraced():
        from arkoserenderer_tpu.models.pathtracer import PathTracer

        scene, cam = build_test_scene(viewport=(RES, RES), n_spheres=1)
        t = PathTracer(scene, cam, RES, RES, max_bounces=2, seed=7)
        t.render_sample(4)
        return np.array(t.ldr())

    def helmet():
        # Real glTF asset golden: the reference's own DamagedHelmet sample
        # (base color + normal + metallic-roughness + emissive textures).
        from arkoserenderer_tpu.assets.gltf import load_gltf
        from arkoserenderer_tpu.scene.camera import Camera
        from arkoserenderer_tpu.scene.lights import DirectionalLight
        from arkoserenderer_tpu.scene.scene import Scene

        scene = Scene(limits=SceneLimits(
            max_vertices=1 << 18, max_indices=3 << 18, max_drawables=64,
            max_materials=32, max_textures=32, texture_pool_texels=1 << 22,
        ))
        load_gltf(scene, SAMPLES / "DamagedHelmet" / "DamagedHelmet.gltf",
                  max_texture_size=256)
        scene.sun = DirectionalLight(
            direction=np.array([-0.5, -1.0, -0.6], np.float32),
            illuminance_lux=90000.0,
        )
        scene.set_env_map(gradient_env_map(32), brightness=8000.0)
        scene.ambient_lx = 4000.0
        center, radius = scene.bounding_sphere()
        cam = Camera(viewport=(RES, RES))
        cam.look_at(center + np.array([radius * 0.4, radius * 0.5, radius * 2.0]),
                    center)
        r = Renderer(scene, cam, CFG, taa=False, bloom=False)
        return np.array(r.render_frame())

    return {
        "forward": forward,
        "full_post": full_post,
        "rt": rt,
        "ddgi": ddgi,
        "showcase": showcase,
        "pathtraced": pathtraced,
        "helmet": helmet,
    }


# pathtraced is the slowest single test in the suite (~124 s serial: a
# multi-spp converged PT frame); it runs in the nightly heavy lane — PT
# correctness stays gate-covered by test_pathtracer + the truth harness.
@pytest.mark.parametrize(
    "name",
    [pytest.param(n, marks=pytest.mark.heavy) if n == "pathtraced" else n
     for n in sorted(render_cases().keys())],
)
def test_golden(name):
    if name == "helmet" and not SAMPLES.exists():
        pytest.skip("reference sample assets not mounted")
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

    import jax

    # Goldens are XLA:CPU-deterministic; force cpu before the first dispatch
    # (the environment presets a tunneled TPU platform).
    jax.config.update("jax_platforms", "cpu")

    if "--regen" in sys.argv:
        GOLDEN_DIR.mkdir(exist_ok=True)
        only = [a for a in sys.argv[2:] if not a.startswith("-")]
        for name, fn in render_cases().items():
            if only and name not in only:
                continue
            save_png(str(GOLDEN_DIR / f"{name}.png"), fn())
            print("wrote", name)
