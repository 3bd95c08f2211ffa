"""Native .ark* asset loading (the reference's own serialized formats).

The reference serializes its assets with cereal archives —
MeshAsset.h:147 (`.arkmsh`), MaterialAsset (`.arkmat`), LevelAsset
(`.arklvl`), SetAsset (`.arkset`) — and every asset shipped in its tree
uses cereal's JSON archive flavor (name-value pairs, `cereal_class_version`
markers, `{"nullopt": ...}` for std::optional). This module loads those
files directly into a Scene, so existing reference content works without
re-export:

  * .arkmat — MaterialAsset.h:95-190: colorTint, metallic/roughness
    factors, blend mode (Opaque | Masked | Translucent), mask cutoff,
    double-sided, optional texture refs (baseColor/emissiveColor/
    normalMap/materialProperties image paths).
  * .arkmsh — MeshAsset.h: LODs -> meshSegments with positions /
    texcoord0s / normals / tangents / jointIndices / jointWeights /
    indices + a material asset path per segment.
  * .arklvl — LevelAsset: objects (TRS transform + mesh asset ref),
    lights, cameras (physical-camera parameters matching scene/camera.py's
    f-number/ISO/shutter model), optional environment map + probe grid.

Asset paths inside the files are relative to the assets ROOT (the
directory containing the leading "assets/..." component), resolved by
walking up from the referencing file.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from arkoserenderer_tpu.core.logging import get_logger
from arkoserenderer_tpu.scene.scene import (
    BLEND_MASKED,
    BLEND_OPAQUE,
    BLEND_TRANSLUCENT,
    Material,
    MeshSegment,
)

log = get_logger("arkose_tpu.ark")

_BLEND = {
    "Opaque": BLEND_OPAQUE,
    "Masked": BLEND_MASKED,
    "Translucent": BLEND_TRANSLUCENT,
}


def _vec(d, *keys):
    return np.array([d[k] for k in keys], np.float32)


def _opt(d):
    """cereal std::optional: {"nullopt": true} or {"nullopt": false,
    "data": ...}; plain values pass through."""
    if isinstance(d, dict) and "nullopt" in d:
        return None if d["nullopt"] else d.get("data")
    return d


def find_assets_root(path: Path) -> Path:
    """Walk up until the directory that CONTAINS the "assets/" prefix used
    by in-file asset paths."""
    p = Path(path).resolve()
    for parent in p.parents:
        if (parent / "assets").is_dir() and parent.name != "assets":
            return parent
        if parent.name == "assets" and parent.parent.name == "assets":
            return parent.parent.parent
    return p.parent


def _resolve(root: Path, ref: str) -> Path | None:
    if not ref:
        return None
    cand = root / ref
    if cand.exists():
        return cand
    # Some refs are relative to the referencing file's directory instead.
    return None


def load_arkmat(scene, path: Path, max_texture_size: int | None = None) -> int:
    """.arkmat -> scene material id (MaterialAsset.h:95-190 field set)."""
    path = Path(path)
    doc = json.loads(path.read_text())["material"]
    root = find_assets_root(path)

    def tex_of(slot, srgb):
        ref = _opt(doc.get(slot))
        if ref is None:
            return None
        img_path = ref.get("image") if isinstance(ref, dict) else ref
        p = _resolve(root, img_path) if isinstance(img_path, str) else None
        if p is None:
            log.warning("%s: %s image %r not found", path.name, slot, img_path)
            return None
        from arkoserenderer_tpu.utils.imageio import load_image_rgba

        img = load_image_rgba(str(p))
        if max_texture_size and max(img.shape[:2]) > max_texture_size:
            from arkoserenderer_tpu.ops.mattex import _np_resize_bilinear

            s = max_texture_size / max(img.shape[:2])
            img = _np_resize_bilinear(
                img, max(int(img.shape[1] * s), 1), max(int(img.shape[0] * s), 1)
            ).astype(np.uint8)
        return scene.add_texture(img, srgb=srgb)

    kw = {}
    base_tex = tex_of("baseColor", srgb=True)
    if base_tex is not None:
        kw["base_color_tex"] = base_tex
    nrm_tex = tex_of("normalMap", srgb=False)
    if nrm_tex is not None:
        kw["normal_tex"] = nrm_tex
    mr_tex = tex_of("materialProperties", srgb=False)
    if mr_tex is not None:
        kw["mr_tex"] = mr_tex
    emi_tex = tex_of("emissiveColor", srgb=True)
    if emi_tex is not None:
        kw["emissive_tex"] = emi_tex

    mat = Material(
        base_color_factor=_vec(doc["colorTint"], "x", "y", "z", "w"),
        metallic_factor=float(doc.get("metallicFactor", 0.0)),
        roughness_factor=float(doc.get("roughnessFactor", 1.0)),
        blend_mode=_BLEND.get(doc.get("blendMode", "Opaque"), BLEND_OPAQUE),
        alpha_cutoff=float(doc.get("maskCutoff", 0.5)),
        double_sided=bool(doc.get("doubleSided", False)),
        **kw,
    )
    return scene.add_material(mat)


def load_arkmsh(scene, path: Path, lod: int = 0,
                max_texture_size: int | None = None) -> list[int]:
    """.arkmsh -> list of scene segment ids for one LOD (MeshAsset.h's
    LODs[lod].meshSegments). Materials referenced per segment load through
    load_arkmat (cached per path)."""
    path = Path(path)
    doc = json.loads(path.read_text())["mesh"]
    root = find_assets_root(path)
    lods = doc.get("LODs", [])
    if not lods:
        return []
    lod = min(lod, len(lods) - 1)
    mat_cache: dict = {}
    seg_ids = []
    for seg in lods[lod].get("meshSegments", []):
        pos = np.array(
            [[v["x"], v["y"], v["z"]] for v in seg["positions"]], np.float32
        )
        nrm = (
            np.array([[v["x"], v["y"], v["z"]] for v in seg["normals"]], np.float32)
            if seg.get("normals") else None
        )
        uv = (
            np.array([[v["x"], v["y"]] for v in seg["texcoord0s"]], np.float32)
            if seg.get("texcoord0s") else None
        )
        tan = (
            np.array(
                [[v["x"], v["y"], v["z"], v["w"]] for v in seg["tangents"]],
                np.float32,
            )
            if seg.get("tangents") else None
        )
        idx = np.array(seg["indices"], np.int32)
        mat_ref = seg.get("material", "")
        mat_id = 0
        if mat_ref:
            if mat_ref not in mat_cache:
                p = _resolve(root, mat_ref) or (path.parent / Path(mat_ref).name)
                if p is not None and Path(p).exists():
                    mat_cache[mat_ref] = load_arkmat(
                        scene, p, max_texture_size=max_texture_size
                    )
                else:
                    log.warning("%s: material %r not found", path.name, mat_ref)
                    mat_cache[mat_ref] = 0
            mat_id = mat_cache[mat_ref]
        if nrm is None:
            # Flat normals from triangle winding.
            nrm = np.zeros_like(pos)
            tri = idx.reshape(-1, 3)
            fn = np.cross(pos[tri[:, 1]] - pos[tri[:, 0]],
                          pos[tri[:, 2]] - pos[tri[:, 0]])
            for k in range(3):
                np.add.at(nrm, tri[:, k], fn)
            nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
        ms = MeshSegment(
            positions=pos, normals=nrm, uvs=uv, tangents=tan, indices=idx,
            material=mat_id, name=doc.get("name", path.stem),
        )
        seg_ids.append(scene.add_segment(ms))
    return seg_ids


def load_arklvl(scene, path: Path, max_texture_size: int | None = None) -> dict:
    """.arklvl -> instances + camera + environment into the Scene
    (LevelAsset: objects with TRS transforms referencing .arkmsh assets).

    Returns {"instances": n, "cameras": [Camera...], "missing": [refs]} —
    missing mesh refs are skipped with a warning (several shipped levels
    reference meshes not present in the reference checkout)."""
    from arkoserenderer_tpu.core import mathx as mx
    from arkoserenderer_tpu.scene.camera import Camera

    path = Path(path)
    doc = json.loads(path.read_text())["level"]
    root = find_assets_root(path)
    n_inst = 0
    missing: list[str] = []
    msh_cache: dict = {}
    for obj in doc.get("objects", []):
        mesh_ref = obj.get("mesh")
        ref_path = (mesh_ref or {}).get("data", "") if isinstance(mesh_ref, dict) else ""
        if not ref_path:
            continue
        if ref_path not in msh_cache:
            p = _resolve(root, ref_path)
            if p is None:
                log.warning("%s: mesh %r not found", path.name, ref_path)
                missing.append(ref_path)
                msh_cache[ref_path] = None
            else:
                msh_cache[ref_path] = load_arkmsh(
                    scene, p, max_texture_size=max_texture_size
                )
        seg_ids = msh_cache[ref_path]
        if not seg_ids:
            continue
        t = obj["transform"]
        q = _vec(t["orientation"], "x", "y", "z", "w")
        r3 = np.asarray(mx.quat_to_mat3(q, xp=np), np.float32)
        s = _vec(t["scale"], "x", "y", "z")
        w = np.eye(4, dtype=np.float32)
        w[:3, :3] = r3 * s[None, :]
        w[:3, 3] = _vec(t["translation"], "x", "y", "z")
        for sid in seg_ids:
            scene.add_instance(sid, w)
            n_inst += 1

    # Lights: cereal variant {"index": N, "data": {...}} per type; the
    # light's direction is its transform's forward = orientation * -Z
    # (arklib globalForward, Transform.h:56).
    from arkoserenderer_tpu.scene.lights import (
        DirectionalLight,
        PointLight,
        SpotLight,
    )

    n_lights = 0
    for li in doc.get("lights", []):
        t = li.get("transform", {})
        q = _vec(t.get("orientation", dict(x=0, y=0, z=0, w=1)),
                 "x", "y", "z", "w")
        q = q / max(np.linalg.norm(q), 1e-8)   # files ship unnormalized quats
        fwd = np.asarray(
            mx.quat_rotate(q[None, :], np.array([[0.0, 0.0, -1.0]], np.float32))
        )[0].astype(np.float32)
        pos = _vec(t.get("translation", dict(x=0, y=0, z=0)), "x", "y", "z")
        color = _vec(li.get("color", dict(x=1, y=1, z=1)), "x", "y", "z")
        data = li.get("data", {})
        params = data.get("data", {}) if isinstance(data, dict) else {}
        kind = li.get("type", "")
        casts = bool(li.get("castsShadows", True))
        if kind == "DirectionalLight":
            scene.sun = DirectionalLight(
                direction=fwd, color=color,
                illuminance_lux=float(params.get("illuminance", 90000.0)),
            )
            n_lights += 1
        elif kind == "SpotLight":
            scene.spots.append(SpotLight(
                position=pos, direction=fwd, color=color,
                luminous_intensity_cd=float(
                    params.get("luminousIntensity", 1000.0)),
                outer_cone_angle=float(params.get("outerConeAngle", 0.5)),
                inner_cone_angle=float(
                    params.get("innerConeAngle",
                               params.get("outerConeAngle", 0.5) * 0.66)),
                cast_shadows=casts,
            ))
            n_lights += 1
        elif kind in ("PointLight", "SphereLight"):
            scene.points.append(PointLight(
                position=pos, color=color,
                luminous_intensity_cd=float(
                    params.get("luminousIntensity", 1000.0)),
                cast_shadows=casts,
            ))
            n_lights += 1
        elif kind:
            log.warning("%s: unsupported light type %r", path.name, kind)

    cameras = []
    for c in doc.get("cameras", []):
        cam = Camera()
        cam.position = _vec(c["position"], "x", "y", "z")
        q = _vec(c["orientation"], "x", "y", "z", "w")
        cam.orientation = q
        cam.focal_length_mm = float(c.get("focalLength", 30.0))
        cam.f_number = float(c.get("fNumber", 16.0))
        cam.iso = float(c.get("iso", 400.0))
        cam.shutter_speed = float(c.get("shutterSpeed", 1.0 / 400.0))
        cam.focus_depth = float(c.get("focusDepth", 5.0))
        cam.near = float(c.get("nearClipPlane", 0.25))
        cameras.append(cam)

    env_set = False
    env = _opt(doc.get("environmentMap"))
    if env and isinstance(env, dict):
        p = _resolve(root, env.get("assetPath", ""))
        if p is not None:
            from arkoserenderer_tpu.assets.external import DDSImage

            try:
                dds = DDSImage.parse(Path(p).read_bytes())
                img = dds.mips[0].astype(np.float32) / 255.0
                scene.set_env_map(
                    img[..., :3], brightness=float(env.get("brightnessFactor", 1.0))
                )
                env_set = True
            except Exception as e:  # corrupt/unsupported codec: keep default
                log.warning("%s: env map %s failed to load: %s", path.name, p, e)
        else:
            log.warning("%s: env map %r not found",
                        path.name, env.get("assetPath"))

    return {"instances": n_inst, "cameras": cameras, "missing": missing,
            "lights": n_lights, "env": env_set}
