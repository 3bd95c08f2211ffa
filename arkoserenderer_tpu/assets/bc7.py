"""BC7 block compression — mode 6 profile.

Role-equivalent to the reference's TextureCompressor BC7 path
(arkcore/asset/TextureCompressor.cpp, which wraps the vendored bc7enc
library): high-quality RGBA block compression for color textures. Round 1
implements the MODE 6 profile only — one subset, 7.7.7.7 endpoints with two
per-endpoint p-bits and 4-bit indices — which is the workhorse mode for
opaque/alpha color content (bc7enc's own fast profile is mode-6-only too).
The remaining modes (partitions + rotation) are a later round.

Everything is host-side NumPy, vectorized over blocks (bake-time code).

Mode 6 bit layout (LSB-first across the 16-byte block):
  [0..6]   mode bits: six zeros then a one (first set bit at position 6)
  [7..62]  endpoints R0 R1 G0 G1 B0 B1 A0 A1, 7 bits each
  [63..64] p-bits P0 P1 (the endpoints' shared low bit)
  [65..127] 4-bit indices, texel 0's MSB omitted (anchor; always 0)
"""

from __future__ import annotations

import numpy as np

# The spec's 4-bit interpolation weights: c = ((64-w)*e0 + w*e1 + 32) >> 6.
_WEIGHTS4 = np.array(
    [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64], np.int64
)


def _blocks_from_image(img: np.ndarray):
    h, w = img.shape[:2]
    assert h % 4 == 0 and w % 4 == 0, "BC7 needs 4x4-aligned dimensions"
    b = img.reshape(h // 4, 4, w // 4, 4, 4).transpose(0, 2, 1, 3, 4)
    return b.reshape(-1, 16, 4).astype(np.int64)  # (nblocks, texel, rgba)


def _image_from_blocks(texels: np.ndarray, h: int, w: int):
    b = texels.reshape(h // 4, w // 4, 4, 4, 4).transpose(0, 2, 1, 3, 4)
    return b.reshape(h, w, 4).astype(np.uint8)


def _pack_bits(fields):
    """fields: list of (value_array (n,), nbits) LSB-first -> (n, 16) uint8."""
    n = len(fields[0][0])
    out = np.zeros((n, 128), bool)
    pos = 0
    for val, bits in fields:
        for i in range(bits):
            out[:, pos] = (val >> i) & 1
            pos += 1
    assert pos == 128
    return np.packbits(out, axis=1, bitorder="little")


def _unpack_bits(blocks: np.ndarray):
    return np.unpackbits(blocks.reshape(-1, 16), axis=1, bitorder="little")


def compress_bc7_mode6(img: np.ndarray) -> np.ndarray:
    """(H, W, 4) uint8 -> (H/4 * W/4, 16) uint8 BC7 mode-6 blocks.

    Endpoints are the block's farthest color pair; indices project texels
    onto the endpoint segment.
    """
    px = _blocks_from_image(img)                       # (n, 16, 4)
    # Endpoint selection: the farthest-pair heuristic (exact for two-color
    # blocks, near-principal-axis otherwise): the texel farthest from the
    # block mean, then the texel farthest from THAT one.
    n = len(px)
    rows = np.arange(n)
    mean = px.mean(axis=1, keepdims=True)
    i0 = np.argmax(((px - mean) ** 2).sum(-1), axis=1)
    lo = px[rows, i0]                                  # (n, 4)
    i1 = np.argmax(((px - lo[:, None, :]) ** 2).sum(-1), axis=1)
    hi = px[rows, i1]

    # Project texels onto the lo->hi segment for index selection.
    axis = (hi - lo).astype(np.float64)                # (n, 4)
    denom = (axis * axis).sum(-1)
    denom = np.where(denom > 0, denom, 1.0)
    t = ((px - lo[:, None, :]) * axis[:, None, :]).sum(-1) / denom[:, None]
    idx = np.clip(np.rint(t * 15.0), 0, 15).astype(np.int64)   # (n, 16)

    # Anchor constraint: texel 0's index MSB must be 0 — swap endpoints
    # (and flip indices) where it is not.
    swap = idx[:, 0] >= 8
    lo2 = np.where(swap[:, None], hi, lo)
    hi2 = np.where(swap[:, None], lo, hi)
    idx = np.where(swap[:, None], 15 - idx, idx)

    # Quantize endpoints to 7 bits + a shared-per-endpoint p-bit (low bit).
    def quant(e):
        p = (e >> 0) & 1                 # take the low bit majority-free
        p = (p.sum(-1) >= 2).astype(np.int64)  # one p-bit across channels
        e7 = np.clip((e - p[:, None]) >> 1, 0, 127)
        return e7, p

    e0, p0 = quant(lo2)
    e1, p1 = quant(hi2)

    # Index field: texel 0 uses 3 bits (anchor), the rest 4 — pack as one
    # 63-bit little-endian integer per block.
    idx_field = np.zeros(len(px), dtype=object)
    shift = 0
    for i in range(16):
        bits = 3 if i == 0 else 4
        idx_field = idx_field + (idx[:, i].astype(object) << shift)
        shift += bits

    fields = [
        (np.full(len(px), 1 << 6, np.int64), 7),       # mode 6 marker
        (e0[:, 0], 7), (e1[:, 0], 7),
        (e0[:, 1], 7), (e1[:, 1], 7),
        (e0[:, 2], 7), (e1[:, 2], 7),
        (e0[:, 3], 7), (e1[:, 3], 7),
        (p0, 1), (p1, 1),
        (idx_field, 63),
    ]
    # _pack_bits needs int shifts; expand the object-int index field here.
    out = np.zeros((n, 128), bool)
    pos = 0
    for val, bits in fields:
        v = val
        for i in range(bits):
            if v.dtype == object:
                out[:, pos] = np.array([(int(x) >> i) & 1 for x in v], bool)
            else:
                out[:, pos] = (v >> i) & 1
            pos += 1
    assert pos == 128
    return np.packbits(out, axis=1, bitorder="little")


def decompress_bc7(blocks: np.ndarray, height: int, width: int) -> np.ndarray:
    """(nblocks, 16) or flat uint8 BC7 blocks -> (H, W, 4) uint8.

    Mode 6 only; other modes decode to magenta (loud, not silent) until the
    full decoder lands.
    """
    bits = _unpack_bits(np.ascontiguousarray(blocks, np.uint8))  # (n, 128)
    n = bits.shape[0]
    is_mode6 = (bits[:, :6] == 0).all(axis=1) & (bits[:, 6] == 1)

    def field(pos, nb):
        v = np.zeros(n, np.int64)
        for i in range(nb):
            v |= bits[:, pos + i].astype(np.int64) << i
        return v

    e = [field(7 + 7 * k, 7) for k in range(8)]  # R0 R1 G0 G1 B0 B1 A0 A1
    p0 = field(63, 1)
    p1 = field(64, 1)
    ep0 = np.stack([(e[0] << 1) | p0, (e[2] << 1) | p0,
                    (e[4] << 1) | p0, (e[6] << 1) | p0], -1)  # (n, 4)
    ep1 = np.stack([(e[1] << 1) | p1, (e[3] << 1) | p1,
                    (e[5] << 1) | p1, (e[7] << 1) | p1], -1)

    texels = np.zeros((n, 16, 4), np.int64)
    pos = 65
    for i in range(16):
        nb = 3 if i == 0 else 4
        w = _WEIGHTS4[field(pos, nb)]
        pos += nb
        texels[:, i] = ((64 - w[:, None]) * ep0 + w[:, None] * ep1 + 32) >> 6
    texels = np.where(is_mode6[:, None, None], texels, 0)
    # Magenta for unsupported modes.
    texels[~is_mode6] = np.array([255, 0, 255, 255], np.int64)
    return _image_from_blocks(np.clip(texels, 0, 255), height, width)
