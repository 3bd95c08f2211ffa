"""Image file IO for outputs and golden tests."""

from __future__ import annotations

import numpy as np


def to_u8(img) -> np.ndarray:
    """[0,1] float image -> uint8."""
    a = np.asarray(img)
    return np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_png(path: str, img) -> None:
    from PIL import Image

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = to_u8(a)
    Image.fromarray(a).save(path)


def encode_png(img) -> bytes:
    """Encode to PNG bytes in memory (live-viewer frame streaming)."""
    import io

    from PIL import Image

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = to_u8(a)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return buf.getvalue()


def load_image_rgba(path: str) -> np.ndarray:
    """Load any PIL-supported image as (H, W, 4) uint8."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"))
