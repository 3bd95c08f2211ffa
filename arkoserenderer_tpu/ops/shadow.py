"""Shadow-map projection + PCF filtering.

Role-equivalent to the reference's screen-space shadow projection compute
(arkose/rendering/shadow/DirectionalShadowProjectNode.cpp +
shaders/shadow/projectShadow.comp): given a light-space depth map rendered by
the depth-only raster path, produce a per-pixel [0,1] shadow mask with
disc-offset PCF. Uses reverse-Z depth consistently with ops/raster.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arkoserenderer_tpu.core.halton import fibonacci_disc
from arkoserenderer_tpu.core.mathx import transform_points_h


def project_to_shadow_uv(shadow_vp: jax.Array, world_pos: jax.Array):
    """(4,4) light view-proj + (N,3) world pos -> uv (N,2) in [0,1], depth (N,)."""
    clip = transform_points_h(shadow_vp, world_pos)
    w = clip[:, 3]
    inv_w = jnp.where(jnp.abs(w) > 1e-12, 1.0 / jnp.where(w == 0, 1.0, w), 0.0)
    ndc = clip[:, :3] * inv_w[:, None]
    uv = jnp.stack([ndc[:, 0] * 0.5 + 0.5, 0.5 - ndc[:, 1] * 0.5], axis=-1)
    return uv, ndc[:, 2]


def _fetch_shadow_depth(shadow_map: jax.Array, uv: jax.Array):
    """Nearest fetch with clamp; shadow_map is (S, S) reverse-Z depth."""
    s = shadow_map.shape[0]
    x = jnp.clip((uv[:, 0] * s).astype(jnp.int32), 0, s - 1)
    y = jnp.clip((uv[:, 1] * s).astype(jnp.int32), 0, s - 1)
    return shadow_map.reshape(-1)[y * s + x]


def sample_shadow_pcf(
    shadow_map: jax.Array,
    shadow_vp: jax.Array,
    world_pos: jax.Array,
    n_dot_l: jax.Array,
    constant_bias: float = 1.5e-3,
    slope_bias: float = 3.5e-3,
    radius_texels: float = 1.5,
    num_taps: int = 8,
) -> jax.Array:
    """(N,) shadow visibility in [0,1]; 1 = fully lit.

    Reverse-Z comparison: the receiver is lit when its light-space depth is
    >= the stored (closest-to-light = largest) depth minus bias. Slope bias
    scales with tan(acos(n.l)) like the reference's slope-scaled bias.
    """
    s = shadow_map.shape[0]
    uv, depth = project_to_shadow_uv(shadow_vp, world_pos)
    slope = jnp.sqrt(jnp.maximum(1.0 - n_dot_l**2, 0.0)) / jnp.maximum(n_dot_l, 0.1)
    bias = constant_bias + slope_bias * jnp.clip(slope, 0.0, 3.0)

    taps = jnp.asarray(fibonacci_disc(num_taps) * (radius_texels / s))
    inside = (
        (uv[:, 0] > 0.0) & (uv[:, 0] < 1.0) & (uv[:, 1] > 0.0) & (uv[:, 1] < 1.0)
    )

    def one_tap(i, acc):
        tap_uv = uv + taps[i]
        occ = _fetch_shadow_depth(shadow_map, tap_uv)
        lit = (depth + bias >= occ).astype(jnp.float32)
        return acc + lit

    lit = jax.lax.fori_loop(0, num_taps, one_tap, jnp.zeros(uv.shape[0])) / num_taps
    # Outside the shadow frustum: fully lit (sun covers the whole scene bounds).
    return jnp.where(inside, lit, 1.0)
