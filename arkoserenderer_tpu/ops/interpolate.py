"""Visibility-buffer attribute reconstruction.

Given the raster's per-pixel triangle ids, rebuild perspective-correct
barycentrics *analytically* at each pixel center — plus their screen-space
derivatives for gradient-correct texture LOD — and interpolate vertex
attributes. This is the TPU equivalent of the reference's deferred
visibility-buffer shading front-end (arkose/shaders/visibility-buffer/
shadeVisibilityBuffer.comp "CalcFullBary" + analytic gradients at lines
~183-187 per SURVEY.md §2.5): no implicit quad derivatives exist on TPU, so
analytic gradients are the only (and better) option.

All functions operate on flattened pixel arrays (N = H*W) so callers can
reshape/tile however the pass prefers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from arkoserenderer_tpu.ops.raster import TriSetup, edge_fn


class PixelGeom(NamedTuple):
    """Per-pixel interpolation data (all (N, ...))."""

    tri: jax.Array       # (N,) i32 triangle id (clamped to 0 where invalid)
    valid: jax.Array     # (N,) bool — pixel covered by geometry
    corners: jax.Array   # (N, 3) i32 vertex indices of the triangle
    bary: jax.Array      # (N, 3) perspective-correct barycentrics at center
    bary_dx: jax.Array   # (N, 3) bary at +1px in x (for gradients)
    bary_dy: jax.Array   # (N, 3) bary at +1px in y


def _persp_bary(sxy, inv_w, px, py):
    """Perspective-correct barycentrics of pixel (px,py) w.r.t. triangle
    screen corners sxy (N,3,2) with per-vertex 1/w (N,3)."""
    e0 = edge_fn(sxy[:, 1], sxy[:, 2], px, py)
    e1 = edge_fn(sxy[:, 2], sxy[:, 0], px, py)
    e2 = edge_fn(sxy[:, 0], sxy[:, 1], px, py)
    e = jnp.stack([e0, e1, e2], axis=-1)  # screen-space (unnormalized)
    pw = e * inv_w
    return pw / jnp.sum(pw, axis=-1, keepdims=True)


def pixel_barycentrics(
    vis_flat: jax.Array,
    setup: TriSetup,
    indices: jax.Array,
    px: jax.Array,
    py: jax.Array,
) -> PixelGeom:
    """vis_flat: (N,) tri ids (VIS_NONE = background); px/py: (N,) pixel centers."""
    valid = vis_flat >= 0
    tri = jnp.maximum(vis_flat, 0)
    sxy = setup.screen_xy[tri]       # (N, 3, 2)
    inv_w = setup.inv_w[tri]         # (N, 3)
    corners = indices[tri]           # (N, 3)
    bary = _persp_bary(sxy, inv_w, px, py)
    bary_dx = _persp_bary(sxy, inv_w, px + 1.0, py)
    bary_dy = _persp_bary(sxy, inv_w, px, py + 1.0)
    return PixelGeom(
        tri=tri, valid=valid, corners=corners, bary=bary, bary_dx=bary_dx, bary_dy=bary_dy
    )


def interpolate(attr: jax.Array, geom: PixelGeom) -> jax.Array:
    """(V, C) vertex attribute -> (N, C) perspective-correct per-pixel value."""
    vals = attr[geom.corners]  # (N, 3, C)
    return jnp.einsum("nk,nkc->nc", geom.bary, vals)


def interpolate_with_grad(attr: jax.Array, geom: PixelGeom):
    """Returns (value, d/dx, d/dy), each (N, C)."""
    vals = attr[geom.corners]  # (N, 3, C)
    v = jnp.einsum("nk,nkc->nc", geom.bary, vals)
    vx = jnp.einsum("nk,nkc->nc", geom.bary_dx, vals)
    vy = jnp.einsum("nk,nkc->nc", geom.bary_dy, vals)
    return v, vx - v, vy - v
