"""Image-space helpers: bilinear resampling, pyramids, separable blurs.

Shared by the post chain (TAA reprojection, bloom pyramid, DoF, motion blur
— the counterparts of the reference's postprocess compute shaders). All
functions are pure jnp over (H, W, C) images and fuse under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Sample (H, W, C) at float pixel coords (x, y are (N,) pixel-center
    based: sampling at x=0.5 hits texel 0's center). Clamp addressing."""
    h, w = img.shape[0], img.shape[1]
    fx = x - 0.5
    fy = y - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[:, None]
    ty = (fy - y0)[:, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    flat = img.reshape(-1, img.shape[-1])
    c00 = flat[y0i * w + x0i]
    c10 = flat[y0i * w + x1i]
    c01 = flat[y1i * w + x0i]
    c11 = flat[y1i * w + x1i]
    return (c00 * (1 - tx) + c10 * tx) * (1 - ty) + (c01 * (1 - tx) + c11 * tx) * ty


def downsample2x(img: jax.Array) -> jax.Array:
    """Exact 2x2 box downsample; H and W must be even."""
    h, w, c = img.shape
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def upsample2x(img: jax.Array) -> jax.Array:
    """2x nearest upsample followed by a 3x3 tent — cheap bilinear-ish."""
    up = jnp.repeat(jnp.repeat(img, 2, axis=0), 2, axis=1)
    return blur3(up)


def blur3(img: jax.Array) -> jax.Array:
    """3x3 binomial ([1,2,1]/4 separable) blur with edge clamp."""
    k = jnp.array([0.25, 0.5, 0.25])

    def conv_axis(x, axis):
        lo = jnp.take(x, jnp.maximum(jnp.arange(x.shape[axis]) - 1, 0), axis=axis)
        hi = jnp.take(
            x, jnp.minimum(jnp.arange(x.shape[axis]) + 1, x.shape[axis] - 1), axis=axis
        )
        return k[0] * lo + k[1] * x + k[2] * hi

    return conv_axis(conv_axis(img, 0), 1)


def neighborhood_min_max(img: jax.Array):
    """Per-pixel 3x3 min / max (for TAA neighborhood clamping)."""
    h, w = img.shape[0], img.shape[1]

    def shift(dy, dx):
        ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
        xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
        return img[ys][:, xs]

    lo = img
    hi = img
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            s = shift(dy, dx)
            lo = jnp.minimum(lo, s)
            hi = jnp.maximum(hi, s)
    return lo, hi


def sample_catmull_rom(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """9-tap Catmull-Rom resampling (the optimized bilinear-tap formulation
    used for sharper TAA history, cf. the reference's optional Catmull-Rom
    history in taa.comp)."""
    h, w = img.shape[0], img.shape[1]
    fx = x - 0.5
    fy = y - 0.5
    cx = jnp.floor(fx - 0.5) + 0.5  # center tap
    cy = jnp.floor(fy - 0.5) + 0.5
    tx = fx - cx
    ty = fy - cy

    def weights(t):
        t2 = t * t
        t3 = t2 * t
        w0 = -0.5 * t3 + t2 - 0.5 * t
        w1 = 1.5 * t3 - 2.5 * t2 + 1.0
        w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
        w3 = 0.5 * t3 - 0.5 * t2
        return w0, w1, w2, w3

    wx = weights(tx)
    wy = weights(ty)
    acc = 0.0
    for j, wyj in enumerate(wy):
        for i, wxi in enumerate(wx):
            xi = jnp.clip((cx + (i - 1)).astype(jnp.int32), 0, w - 1)
            yj = jnp.clip((cy + (j - 1)).astype(jnp.int32), 0, h - 1)
            acc = acc + img.reshape(-1, img.shape[-1])[yj * w + xi] * (wxi * wyj)[:, None]
    return acc


def luminance(rgb: jax.Array) -> jax.Array:
    return jnp.sum(rgb * jnp.array([0.2126, 0.7152, 0.0722]), axis=-1, keepdims=True)
