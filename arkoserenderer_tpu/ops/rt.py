"""Shared ray-traced shading helpers for screen-space RT passes.

Role-equivalent to the reference's RT hit-group shaders (the closest-hit
surface reconstruction in shaders/rt-reflections/raygen.rgen, rt-shadow/
raygen.rgen, and common/rtData access patterns): given BVH hits, reconstruct
the surface (position/normal/uv/material), evaluate simple direct lighting
(sun with an any-hit shadow ray) and optionally previous-frame DDGI for
ambient — the same "simplified shading at ray hits" the reference uses for
secondary rays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arkoserenderer_tpu.core import mathx as mx
from arkoserenderer_tpu.ops.bvh import Hit, trace_rays
from arkoserenderer_tpu.ops.envmap import sample_equirect


def surface_at_hits(scene, hit: Hit):
    """Reconstruct geometry + material ids at hit points."""
    tri = jnp.maximum(hit.tri, 0)
    corners = scene.indices[tri]
    inst = scene.tri_instance[tri]
    bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
    obj_pos = jnp.einsum("rk,rkc->rc", bary, scene.positions[corners])
    w_m = scene.world[inst]
    world_pos = jnp.einsum("rij,rj->ri", w_m[:, :3, :3], obj_pos) + w_m[:, :3, 3]
    obj_nrm = jnp.einsum("rk,rkc->rc", bary, scene.normals[corners])
    nrm = mx.normalize(jnp.einsum("rij,rj->ri", scene.normal_mat[inst], obj_nrm))
    uv = jnp.einsum("rk,rkc->rc", bary, scene.uvs[corners])
    mat_id = scene.inst_material[inst]
    return world_pos, nrm, uv, mat_id


def shade_hits_simple(
    scene,
    hit: Hit,
    ray_dirs: jax.Array,
    exposure: jax.Array,
    ddgi_sample=None,   # callable (world_pos, normal) -> irradiance, optional
) -> jax.Array:
    """(R, 3) radiance: diffuse sun + optional DDGI ambient at hits, env on
    miss. Pre-exposed."""
    world_pos, nrm, uv, mat_id = surface_at_hits(scene, hit)
    nrm = nrm * jnp.where(mx.vdot(nrm, -ray_dirs) < 0.0, -1.0, 1.0)
    albedo = scene.materials.base_color_factor[mat_id][:, :3]
    emissive = scene.materials.emissive_factor[mat_id]

    sun_l = -scene.lights.sun_direction
    occl = trace_rays(
        scene.bvh, world_pos + nrm * 1e-2,
        jnp.broadcast_to(sun_l, world_pos.shape), any_hit=True,
    )
    n_dot_l = jnp.clip(mx.vdot(nrm, sun_l[None, :], keepdims=False), 0.0, 1.0)
    color = (
        albedo / jnp.pi
        * (scene.lights.sun_color * exposure)[None, :]
        * (n_dot_l * (~occl.hit))[:, None]
        * scene.lights.sun_valid
    ) + emissive * exposure
    if ddgi_sample is not None:
        color = color + ddgi_sample(world_pos, nrm) * albedo / jnp.pi

    env = sample_equirect(scene.env_map, ray_dirs) * scene.env_brightness * exposure
    return jnp.where(hit.hit[:, None], color, env)


def trace_shadow_mask(
    scene,
    world_pos: jax.Array,    # (N, 3) receiver points
    light_dir: jax.Array,    # (3,) direction TOWARD the light
    valid: jax.Array,        # (N,) geometry coverage
    t_max: float | jax.Array = 1e4,
    bias: float = 3e-2,
) -> jax.Array:
    """(N,) visibility mask via any-hit rays (rt-shadow raygen analogue).

    Bias is applied along the LIGHT direction so no surface normal is needed
    — the pass can run straight off the depth buffer before shading."""
    dirs = jnp.broadcast_to(light_dir, world_pos.shape)
    origins = world_pos + dirs * bias
    occl = trace_rays(scene.bvh, origins, dirs, t_max=t_max, any_hit=True)
    return jnp.where(valid, (~occl.hit).astype(jnp.float32), 1.0)
