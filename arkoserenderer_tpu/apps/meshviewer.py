"""Mesh viewer: asset inspection + turntable rendering.

Role-equivalent to MeshViewerApp (arkose/application/apps/MeshViewerApp.cpp
— asset inspection/editing with LOD/segment UI): prints the asset's
structure (segments, materials, skeletons, animations, meshlet statistics)
and renders a turntable strip around it.

Usage:
  python -m arkoserenderer_tpu.apps.meshviewer model.gltf --frames 8
"""

from __future__ import annotations

import argparse

import numpy as np


def describe(scene) -> str:
    lines = []
    total_tris = sum(s.num_triangles for s in scene.segments)
    total_verts = sum(len(s.positions) for s in scene.segments)
    lines.append(
        f"segments: {len(scene.segments)}  vertices: {total_verts}  triangles: {total_tris}"
    )
    for i, seg in enumerate(scene.segments):
        skin = f" skeleton={seg.skeleton}" if seg.skeleton >= 0 else ""
        lines.append(
            f"  [{i:3d}] verts={len(seg.positions):7d} tris={seg.num_triangles:7d} "
            f"material={seg.material}{skin}"
        )
    lines.append(f"materials: {len(scene.materials)}")
    for i, m in enumerate(scene.materials):
        lines.append(
            f"  [{i:3d}] base={np.round(m.base_color_factor, 2).tolist()} "
            f"rough={m.roughness_factor:.2f} metal={m.metallic_factor:.2f} "
            f"blend={m.blend_mode} tex(bc/n/mr)={m.base_color_tex}/{m.normal_tex}/{m.mr_tex}"
        )
    if scene.skeletons:
        lines.append(
            f"skeletons: {len(scene.skeletons)} "
            f"({[s.num_joints for s in scene.skeletons]} joints)"
        )
    if scene.animations:
        lines.append(
            "animations: "
            + ", ".join(f"{c.name or '?'} ({c.duration:.2f}s)" for c in scene.animations)
        )
    return "\n".join(lines)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("asset", help="glTF/GLB or baked .arkscene.npz")
    ap.add_argument("--frames", type=int, default=8, help="turntable frame count")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--out", type=str, default="/tmp/meshviewer_{frame}.png")
    ap.add_argument("--meshlets", action="store_true")
    ap.add_argument("--no-render", action="store_true")
    args = ap.parse_args(argv)

    from arkoserenderer_tpu.assets.procedural import gradient_env_map
    from arkoserenderer_tpu.core.types import SceneLimits
    from arkoserenderer_tpu.scene.scene import Scene

    scene = Scene(limits=SceneLimits(
        max_vertices=1 << 19, max_indices=3 << 19, max_drawables=1024,
        max_materials=256, max_textures=256, texture_pool_texels=1 << 23,
    ))
    if str(args.asset).endswith(".npz"):
        from arkoserenderer_tpu.assets.baked import load_baked

        scene = load_baked(args.asset, limits=scene.limits)
    else:
        from arkoserenderer_tpu.assets.gltf import load_gltf

        load_gltf(scene, args.asset, max_texture_size=256)

    print(describe(scene))
    if args.meshlets:
        from arkoserenderer_tpu.assets.meshopt import build_meshlets

        total = sum(
            build_meshlets(s.positions, s.indices).count for s in scene.segments
        )
        print(f"meshlets: {total}")

    if args.no_render:
        return

    from arkoserenderer_tpu.assets.procedural import gradient_env_map
    from arkoserenderer_tpu.core.types import RasterConfig
    from arkoserenderer_tpu.models.standard import Renderer
    from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
    from arkoserenderer_tpu.scene.camera import Camera
    from arkoserenderer_tpu.scene.lights import DirectionalLight
    from arkoserenderer_tpu.utils.imageio import save_png

    scene.sun = DirectionalLight(direction=np.array([0.4, -1.0, -0.3], np.float32))
    scene.set_env_map(gradient_env_map(32), brightness=8000.0)
    scene.ambient_lx = 6000.0
    cam = Camera(viewport=(args.size, args.size))
    center, radius = scene.bounding_sphere()
    cfg = PipelineConfig(
        width=args.size, height=args.size,
        raster=RasterConfig(tile_h=8, tile_w=16, max_tris_per_tile=512),
        shadow_map_size=512,
    )
    cam.look_at(center + np.array([radius * 2.0, radius * 0.7, 0.0]), center)
    r = Renderer(scene, cam, cfg, taa=False)
    for f in range(args.frames):
        angle = 2 * np.pi * f / args.frames
        eye = center + radius * 2.0 * np.array(
            [np.cos(angle), 0.35, np.sin(angle)], np.float32
        )
        cam.look_at(eye, center)
        img = np.asarray(r.render_frame())
        save_png(args.out.format(frame=f), img)
    print(f"rendered {args.frames} turntable frames -> {args.out}")


if __name__ == "__main__":
    main()
