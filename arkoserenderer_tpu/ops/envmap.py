"""Equirectangular environment map sampling.

Role-equivalent to the reference's sky-view/environment sampling
(arkose/rendering/nodes/SkyViewNode.cpp + shaders/sky-view): direction ->
equirect UV -> bilinear fetch from an HBM-resident (H, W, 3) radiance map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def direction_to_equirect_uv(d: jax.Array) -> jax.Array:
    """(N,3) unit directions -> (N,2) uv; v=0 at +Y (up), u wraps at -Z."""
    u = jnp.arctan2(d[:, 0], -d[:, 2]) / (2.0 * jnp.pi) + 0.5
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) / jnp.pi
    return jnp.stack([u, v], axis=-1)


def sample_equirect(env: jax.Array, d: jax.Array) -> jax.Array:
    """Bilinear sample of an equirect (H, W, 3) map along (N, 3) directions.
    U wraps, V clamps."""
    h, w = env.shape[0], env.shape[1]
    uv = direction_to_equirect_uv(d)
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0.astype(jnp.int32) + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    flat = env.reshape(-1, env.shape[-1])
    c00 = flat[y0i * w + x0i]
    c10 = flat[y0i * w + x1i]
    c01 = flat[y1i * w + x0i]
    c11 = flat[y1i * w + x1i]
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def average_radiance(env: jax.Array) -> jax.Array:
    """Solid-angle-weighted mean radiance (cheap flat-ambient estimate)."""
    h = env.shape[0]
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    weights = jnp.sin(theta)[:, None, None]
    return jnp.sum(env * weights, axis=(0, 1)) / (jnp.sum(weights) * env.shape[1])
