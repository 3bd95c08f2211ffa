"""BC7 block compression (mode-6 encoder) + FULL 8-mode decoder.

Role-equivalent to the reference's TextureCompressor BC7 path
(arkcore/asset/TextureCompressor.cpp, which wraps the vendored bc7enc
library): high-quality RGBA block compression for color textures. The
encoder implements the MODE 6 profile — one subset, 7.7.7.7 endpoints with
two per-endpoint p-bits and 4-bit indices — the workhorse mode for color
content (bc7enc's own fast profile is mode-6-only too). The DECODER covers
all 8 modes (partitions, p-bits, rotations, dual index sets), so any
externally-produced BC7 .dds loads correctly; it is fuzz-verified block-
for-block against an independent decoder (Pillow's BCn codec) in tests.

The partition and anchor-index tables below are the BC7 format's fixed
spec constants (Khronos Data Format / D3D11 functional spec section on
BPTC), transcribed via an oracle-recovery harness and verified entry by
entry against the independent decoder.

Everything is host-side NumPy, vectorized over blocks (bake-time code).

Mode 6 bit layout (LSB-first across the 16-byte block):
  [0..6]   mode bits: six zeros then a one (first set bit at position 6)
  [7..62]  endpoints R0 R1 G0 G1 B0 B1 A0 A1, 7 bits each
  [63..64] p-bits P0 P1 (the endpoints' shared low bit)
  [65..127] 4-bit indices, texel 0's MSB omitted (anchor; always 0)
"""

from __future__ import annotations

import numpy as np

# The spec's interpolation weights: c = ((64-w)*e0 + w*e1 + 32) >> 6.
_WEIGHTS2 = np.array([0, 21, 43, 64], np.int64)
_WEIGHTS3 = np.array([0, 9, 18, 27, 37, 46, 55, 64], np.int64)
_WEIGHTS4 = np.array(
    [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64], np.int64
)
_WEIGHTS = {2: _WEIGHTS2, 3: _WEIGHTS3, 4: _WEIGHTS4}

# Mode parameters: (subsets, partition bits, rotation bits, index-selection
# bit, color bits, alpha bits, per-endpoint p-bits, shared p-bits, index
# bits, secondary index bits).
_MODES = {
    0: (3, 4, 0, 0, 4, 0, 1, 0, 3, 0),
    1: (2, 6, 0, 0, 6, 0, 0, 1, 3, 0),
    2: (3, 6, 0, 0, 5, 0, 0, 0, 2, 0),
    3: (2, 6, 0, 0, 7, 0, 1, 0, 2, 0),
    4: (1, 0, 2, 1, 5, 6, 0, 0, 2, 3),
    5: (1, 0, 2, 0, 7, 8, 0, 0, 2, 2),
    6: (1, 0, 0, 0, 7, 7, 1, 0, 4, 0),
    7: (2, 6, 0, 0, 5, 5, 1, 0, 2, 0),
}

_PARTITION2 = np.array([
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1],
    [0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1],
    [0, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1],
    [0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1, 1],
    [0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1],
    [0, 0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1, 1],
    [0, 1, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 0],
    [0, 1, 1, 1, 0, 0, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0],
    [0, 0, 1, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0],
    [0, 1, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 0, 1],
    [0, 0, 1, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0],
    [0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0],
    [0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0],
    [0, 0, 1, 1, 0, 1, 1, 0, 0, 1, 1, 0, 1, 1, 0, 0],
    [0, 0, 0, 1, 0, 1, 1, 1, 1, 1, 1, 0, 1, 0, 0, 0],
    [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0],
    [0, 1, 1, 1, 0, 0, 0, 1, 1, 0, 0, 0, 1, 1, 1, 0],
    [0, 0, 1, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0],
    [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1],
    [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1],
    [0, 1, 0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0],
    [0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0],
    [0, 0, 1, 1, 1, 1, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0],
    [0, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0],
    [0, 1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 0, 1, 0, 0, 1],
    [0, 1, 0, 1, 1, 0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1],
    [0, 1, 1, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 1, 0],
    [0, 0, 0, 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 0, 0, 0],
    [0, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 1, 0, 0],
    [0, 0, 1, 1, 1, 0, 1, 1, 1, 1, 0, 1, 1, 1, 0, 0],
    [0, 1, 1, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0, 1, 1, 0],
    [0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1],
    [0, 1, 1, 0, 0, 1, 1, 0, 1, 0, 0, 1, 1, 0, 0, 1],
    [0, 0, 0, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 0],
    [0, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0],
    [0, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0],
    [0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0],
    [0, 0, 0, 0, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1, 0, 0],
    [0, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 1],
    [0, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 1, 1, 1, 0, 0],
    [0, 0, 1, 1, 1, 0, 0, 1, 1, 1, 0, 0, 0, 1, 1, 0],
    [0, 1, 1, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 0, 0, 1],
    [0, 1, 1, 0, 0, 0, 1, 1, 0, 0, 1, 1, 1, 0, 0, 1],
    [0, 1, 1, 1, 1, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1],
    [0, 0, 0, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 1, 1, 1],
    [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0],
    [0, 0, 1, 0, 0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1, 0],
    [0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 0, 1, 1, 1],
], np.int64)

_PARTITION3 = np.array([
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 2, 2, 1, 2, 2, 2, 2],
    [0, 0, 0, 1, 0, 0, 1, 1, 2, 2, 1, 1, 2, 2, 2, 1],
    [0, 0, 0, 0, 2, 0, 0, 1, 2, 2, 1, 1, 2, 2, 1, 1],
    [0, 2, 2, 2, 0, 0, 2, 2, 0, 0, 1, 1, 0, 1, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 1, 1, 2, 2],
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 2, 2, 0, 0, 2, 2],
    [0, 0, 2, 2, 0, 0, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 1, 1, 2, 2, 1, 1],
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2],
    [0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2],
    [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2],
    [0, 0, 1, 2, 0, 0, 1, 2, 0, 0, 1, 2, 0, 0, 1, 2],
    [0, 1, 1, 2, 0, 1, 1, 2, 0, 1, 1, 2, 0, 1, 1, 2],
    [0, 1, 2, 2, 0, 1, 2, 2, 0, 1, 2, 2, 0, 1, 2, 2],
    [0, 0, 1, 1, 0, 1, 1, 2, 1, 1, 2, 2, 1, 2, 2, 2],
    [0, 0, 1, 1, 2, 0, 0, 1, 2, 2, 0, 0, 2, 2, 2, 0],
    [0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 1, 2, 1, 1, 2, 2],
    [0, 1, 1, 1, 0, 0, 1, 1, 2, 0, 0, 1, 2, 2, 0, 0],
    [0, 0, 0, 0, 1, 1, 2, 2, 1, 1, 2, 2, 1, 1, 2, 2],
    [0, 0, 2, 2, 0, 0, 2, 2, 0, 0, 2, 2, 1, 1, 1, 1],
    [0, 1, 1, 1, 0, 1, 1, 1, 0, 2, 2, 2, 0, 2, 2, 2],
    [0, 0, 0, 1, 0, 0, 0, 1, 2, 2, 2, 1, 2, 2, 2, 1],
    [0, 0, 0, 0, 0, 0, 1, 1, 0, 1, 2, 2, 0, 1, 2, 2],
    [0, 0, 0, 0, 1, 1, 0, 0, 2, 2, 1, 0, 2, 2, 1, 0],
    [0, 1, 2, 2, 0, 1, 2, 2, 0, 0, 1, 1, 0, 0, 0, 0],
    [0, 0, 1, 2, 0, 0, 1, 2, 1, 1, 2, 2, 2, 2, 2, 2],
    [0, 1, 1, 0, 1, 2, 2, 1, 1, 2, 2, 1, 0, 1, 1, 0],
    [0, 0, 0, 0, 0, 1, 1, 0, 1, 2, 2, 1, 1, 2, 2, 1],
    [0, 0, 2, 2, 1, 1, 0, 2, 1, 1, 0, 2, 0, 0, 2, 2],
    [0, 1, 1, 0, 0, 1, 1, 0, 2, 0, 0, 2, 2, 2, 2, 2],
    [0, 0, 1, 1, 0, 1, 2, 2, 0, 1, 2, 2, 0, 0, 1, 1],
    [0, 0, 0, 0, 2, 0, 0, 0, 2, 2, 1, 1, 2, 2, 2, 1],
    [0, 0, 0, 0, 0, 0, 0, 2, 1, 1, 2, 2, 1, 2, 2, 2],
    [0, 2, 2, 2, 0, 0, 2, 2, 0, 0, 1, 2, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 0, 1, 2, 0, 0, 2, 2, 0, 2, 2, 2],
    [0, 1, 2, 0, 0, 1, 2, 0, 0, 1, 2, 0, 0, 1, 2, 0],
    [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 0, 0, 0, 0],
    [0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1, 2, 0],
    [0, 1, 2, 0, 2, 0, 1, 2, 1, 2, 0, 1, 0, 1, 2, 0],
    [0, 0, 1, 1, 2, 2, 0, 0, 1, 1, 2, 2, 0, 0, 1, 1],
    [0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 0, 0, 0, 0, 1, 1],
    [0, 1, 0, 1, 0, 1, 0, 1, 2, 2, 2, 2, 2, 2, 2, 2],
    [0, 0, 0, 0, 0, 0, 0, 0, 2, 1, 2, 1, 2, 1, 2, 1],
    [0, 0, 2, 2, 1, 1, 2, 2, 0, 0, 2, 2, 1, 1, 2, 2],
    [0, 0, 2, 2, 0, 0, 1, 1, 0, 0, 2, 2, 0, 0, 1, 1],
    [0, 2, 2, 0, 1, 2, 2, 1, 0, 2, 2, 0, 1, 2, 2, 1],
    [0, 1, 0, 1, 2, 2, 2, 2, 2, 2, 2, 2, 0, 1, 0, 1],
    [0, 0, 0, 0, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1],
    [0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 2, 2, 2, 2],
    [0, 2, 2, 2, 0, 1, 1, 1, 0, 2, 2, 2, 0, 1, 1, 1],
    [0, 0, 0, 2, 1, 1, 1, 2, 0, 0, 0, 2, 1, 1, 1, 2],
    [0, 0, 0, 0, 2, 1, 1, 2, 2, 1, 1, 2, 2, 1, 1, 2],
    [0, 2, 2, 2, 0, 1, 1, 1, 0, 1, 1, 1, 0, 2, 2, 2],
    [0, 0, 0, 2, 1, 1, 1, 2, 1, 1, 1, 2, 0, 0, 0, 2],
    [0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 2, 2, 2, 2],
    [0, 0, 0, 0, 0, 0, 0, 0, 2, 1, 1, 2, 2, 1, 1, 2],
    [0, 1, 1, 0, 0, 1, 1, 0, 2, 2, 2, 2, 2, 2, 2, 2],
    [0, 0, 2, 2, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 2, 2],
    [0, 0, 2, 2, 1, 1, 2, 2, 1, 1, 2, 2, 0, 0, 2, 2],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 1, 1, 2],
    [0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0, 2, 0, 0, 0, 1],
    [0, 2, 2, 2, 1, 2, 2, 2, 0, 2, 2, 2, 1, 2, 2, 2],
    [0, 1, 0, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2],
    [0, 1, 1, 1, 2, 0, 1, 1, 2, 2, 0, 1, 2, 2, 2, 0],
], np.int64)

_ANCHOR2 = np.array([
    15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15,
    15, 2, 8, 2, 2, 8, 8, 15, 2, 8, 2, 2, 8, 8, 2, 2,
    15, 15, 6, 8, 2, 8, 15, 15, 2, 8, 2, 2, 2, 15, 15, 6,
    6, 2, 6, 8, 15, 15, 2, 2, 15, 15, 15, 15, 15, 2, 2, 15,
], np.int64)

_ANCHOR3_A = np.array([
    3, 3, 15, 15, 8, 3, 15, 15, 8, 8, 6, 6, 6, 5, 3, 3,
    3, 3, 8, 15, 3, 3, 6, 10, 5, 8, 8, 6, 8, 5, 15, 15,
    8, 15, 3, 5, 6, 10, 8, 15, 15, 3, 15, 5, 15, 15, 15, 15,
    3, 15, 5, 5, 5, 8, 5, 10, 5, 10, 8, 13, 15, 12, 3, 3,
], np.int64)

_ANCHOR3_B = np.array([
    15, 8, 8, 3, 15, 15, 3, 8, 15, 15, 15, 15, 15, 15, 15, 8,
    15, 8, 15, 3, 15, 8, 15, 8, 3, 15, 6, 10, 15, 15, 10, 8,
    15, 3, 15, 10, 10, 8, 9, 10, 6, 15, 8, 15, 3, 6, 6, 8,
    15, 3, 15, 15, 15, 15, 15, 15, 15, 15, 15, 15, 3, 15, 15, 8,
], np.int64)



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


def _dequant(e: np.ndarray, bits: int) -> np.ndarray:
    """Endpoint (already p-bit-extended) at ``bits`` precision -> 8 bits:
    left-align then replicate the top bits (the spec's unquantization)."""
    v = e << (8 - bits)
    return v | (v >> bits)


def _decode_mode(bits: np.ndarray, mode: int) -> np.ndarray:
    """Decode all blocks of one mode. ``bits``: (n, 128) LSB-first bools.
    Returns (n, 16, 4) uint8 texels."""
    n = bits.shape[0]
    ns, pb, rb, isb, cb, ab, epb, spb, ib, ib2 = _MODES[mode]
    pos = mode + 1                       # mode marker: m zeros then a 1

    def field(nb):
        nonlocal pos
        v = np.zeros(n, np.int64)
        for i in range(nb):
            v |= bits[:, pos + i].astype(np.int64) << i
        pos += nb
        return v

    part = field(pb) if pb else np.zeros(n, np.int64)
    rot = field(rb) if rb else np.zeros(n, np.int64)
    sel = field(isb) if isb else np.zeros(n, np.int64)

    ne = 2 * ns                          # endpoints
    color = np.zeros((n, ne, 3), np.int64)
    for ch in range(3):
        for e in range(ne):
            color[:, e, ch] = field(cb)
    alpha = np.zeros((n, ne), np.int64)
    if ab:
        for e in range(ne):
            alpha[:, e] = field(ab)

    # P-bits extend every channel (including alpha when present).
    cbits, abits = cb, ab
    if epb:
        for e in range(ne):
            pbit = field(1)
            color[:, e] = (color[:, e] << 1) | pbit[:, None]
            if ab:
                alpha[:, e] = (alpha[:, e] << 1) | pbit
        cbits += 1
        abits += 1 if ab else 0
    elif spb:
        for sset in range(ns):
            pbit = field(1)
            for e in (2 * sset, 2 * sset + 1):
                color[:, e] = (color[:, e] << 1) | pbit[:, None]
        cbits += 1

    color8 = _dequant(color, cbits)                       # (n, ne, 3)
    alpha8 = _dequant(alpha, abits) if ab else np.full((n, ne), 255, np.int64)

    # Per-texel subset + anchor layout.
    if ns == 1:
        subset = np.zeros((n, 16), np.int64)
        anchors = [np.zeros(n, np.int64)]
    elif ns == 2:
        subset = _PARTITION2[part]                        # (n, 16)
        anchors = [np.zeros(n, np.int64), _ANCHOR2[part]]
    else:
        subset = _PARTITION3[part]
        anchors = [np.zeros(n, np.int64), _ANCHOR3_A[part], _ANCHOR3_B[part]]

    def read_indices(nbits):
        """Per-texel indices with anchor texels one bit short."""
        nonlocal pos
        idx = np.zeros((n, 16), np.int64)
        is_anchor = np.zeros((n, 16), bool)
        for k, a in enumerate(anchors):
            is_anchor[np.arange(n), a] = True
        # Bit widths vary per block (anchors differ by partition), so walk
        # texels accumulating a per-block cursor.
        cursor = np.full(n, pos, np.int64)
        cols = np.arange(n)
        for t in range(16):
            width = np.where(is_anchor[:, t], nbits - 1, nbits)
            v = np.zeros(n, np.int64)
            for i in range(nbits):           # upper bits read as 0 via mask
                take = i < width
                bit = bits[cols, np.minimum(cursor + i, 127)].astype(np.int64)
                v |= np.where(take, bit, 0) << i
            idx[:, t] = v
            cursor += width
        pos_delta = 16 * nbits - len(anchors)
        pos += pos_delta
        return idx

    idx1 = read_indices(ib)
    idx2 = read_indices(ib2) if ib2 else None

    # Select endpoints by subset, interpolate.
    e0c = np.take_along_axis(
        color8, (2 * subset)[:, :, None].repeat(3, 2), axis=1)     # (n,16,3)
    e1c = np.take_along_axis(
        color8, (2 * subset + 1)[:, :, None].repeat(3, 2), axis=1)
    e0a = np.take_along_axis(alpha8, 2 * subset, axis=1)           # (n,16)
    e1a = np.take_along_axis(alpha8, 2 * subset + 1, axis=1)

    # Index-selection bit (mode 4): sel=1 swaps which index set drives
    # color vs alpha.
    widx_c = _WEIGHTS[ib][idx1]
    if ib2:
        widx_a = _WEIGHTS[ib2][idx2]
        if isb:
            w_color = np.where(sel[:, None] == 1, widx_a, widx_c)
            w_alpha = np.where(sel[:, None] == 1, widx_c, widx_a)
        else:
            w_color, w_alpha = widx_c, widx_a
    else:
        w_color = w_alpha = widx_c

    rgb = ((64 - w_color[:, :, None]) * e0c + w_color[:, :, None] * e1c + 32) >> 6
    a = ((64 - w_alpha) * e0a + w_alpha * e1a + 32) >> 6
    texel = np.concatenate([rgb, a[:, :, None]], axis=-1)          # (n,16,4)

    # Rotation: swap alpha with one color channel (modes 4/5).
    if rb:
        for r, ch in ((1, 0), (2, 1), (3, 2)):
            m = rot == r
            if m.any():
                tmp = texel[m][:, :, ch].copy()
                sub = texel[m]
                sub[:, :, ch] = sub[:, :, 3]
                sub[:, :, 3] = tmp
                texel[m] = sub
    return np.clip(texel, 0, 255)


def decompress_bc7(blocks: np.ndarray, height: int, width: int) -> np.ndarray:
    """(nblocks, 16) or flat uint8 BC7 blocks -> (H, W, 4) uint8.

    Full 8-mode decoder (partitions / p-bits / rotations / dual index
    sets); fuzz-verified against an independent BCn decoder in
    tests/test_bc7.py. All-zero blocks (invalid: no mode bit) decode to
    transparent black, matching hardware behavior.
    """
    bits = _unpack_bits(np.ascontiguousarray(blocks, np.uint8)) > 0  # (n,128)
    n = bits.shape[0]
    texels = np.zeros((n, 16, 4), np.int64)
    mode_of = np.full(n, -1, np.int64)
    for m in range(8):
        is_m = (~bits[:, :m]).all(axis=1) & bits[:, m] if m else bits[:, 0]
        is_m = is_m & (mode_of < 0)
        mode_of[is_m] = m
        if is_m.any():
            texels[is_m] = _decode_mode(bits[is_m], m)
    return _image_from_blocks(np.clip(texels, 0, 255), height, width)
