"""Spatial upscaling: Catmull-Rom upsample + RCAS-style sharpening.

Role-equivalent to the reference's upscaling slot (arkose/rendering/
upscaling/DLSSNode.cpp — an ExternalFeature evaluating DLSS with an
``idealRenderResolution`` below display resolution): the vendor black box is
replaced by an open FSR1-style spatial chain — high-order resample (EASU
stand-in) + robust contrast-adaptive sharpening (RCAS stand-in). Temporal
accumulation already happens in TAA upstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from arkoserenderer_tpu.ops.image import sample_catmull_rom
from arkoserenderer_tpu.ops.postprocess import cas


def upscale(img: jax.Array, out_h: int, out_w: int, sharpness: float = 0.4) -> jax.Array:
    """(h, w, C) -> (out_h, out_w, C) Catmull-Rom resample + sharpen."""
    h, w = img.shape[0], img.shape[1]
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h)
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w)
    gx, gy = jnp.meshgrid(xs, ys)
    out = sample_catmull_rom(img, gx.reshape(-1), gy.reshape(-1))
    out = jnp.clip(out.reshape(out_h, out_w, img.shape[-1]), 0.0, 1.0)
    if sharpness > 0.0:
        out = cas(out, sharpness)
    return out


def ideal_render_resolution(display_w: int, display_h: int, quality: str = "quality"):
    """Render-resolution presets (DLSSNode::optimalRenderResolution analogue)."""
    scale = {"quality": 1.5, "balanced": 1.7, "performance": 2.0}[quality]
    return int(display_w / scale) & ~7, int(display_h / scale) & ~7
