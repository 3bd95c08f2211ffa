"""Pallas TPU kernel for the per-tile visibility raster.

The Pallas fast path for ops/raster.rasterize_tiles (stage 4): stage 3's
per-tile triangle lists are first PRE-GATHERED into dense (ntiles, K, 16)
blocks with one large XLA gather (gathers inside hot loops lower poorly on
TPU), then a Pallas grid runs one program per tile: the (K, 16) block and the
tile's pixel registers live in VMEM, and a fori loop walks the list updating
the z/vis registers with (tile_h, tile_w)-shaped VPU ops — the shape of a
native (8, 128) f32 tile when cfg uses tile_w=128.

Packed per-triangle layout (lane-padded to 16 floats):
  [0:6]  x0,y0,x1,y1,x2,y2   screen corners
  [6:9]  z0,z1,z2            reverse-Z ndc depth
  [9]    setup-row id as an exact f32 value (< 2^24)
  [10:]  padding
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from arkoserenderer_tpu.core.mathx import DEPTH_FAR
from arkoserenderer_tpu.core.types import VIS_NONE, RasterConfig
from arkoserenderer_tpu.ops.raster import TileBins, TriSetup, num_tiles, tiled_to_image


def _pack_tile_lists(setup: TriSetup, bins: TileBins, cfg: RasterConfig, ntiles: int):
    """Dense per-tile triangle data: (ntiles, K+G, 16) f32 + (ntiles,) counts."""
    k = cfg.max_tris_per_tile
    g = cfg.max_global_tris
    ks = jnp.arange(k, dtype=jnp.int32)[None, :]
    local_ids = bins.sorted_tris[
        jnp.minimum(bins.starts[:, None] + ks, bins.sorted_tris.shape[0] - 1)
    ]  # (ntiles, K)
    local_ok = ks < bins.counts[:, None]

    gs = jnp.arange(g, dtype=jnp.int32)[None, :]
    glob_ids = jnp.broadcast_to(bins.global_tris[None, :], (ntiles, g))
    glob_ok = gs < bins.global_count

    ids = jnp.concatenate([local_ids, glob_ids], axis=1)        # (ntiles, K+G)
    ok = jnp.concatenate([local_ok, jnp.broadcast_to(glob_ok, (ntiles, g))], axis=1)
    # Compact valid entries to the front so the kernel's trip count is tight.
    order = jnp.argsort(~ok, axis=1, stable=True)
    ids = jnp.take_along_axis(ids, order, axis=1)
    counts = jnp.sum(ok, axis=1).astype(jnp.int32)

    safe = jnp.maximum(ids, 0)
    xy = setup.screen_xy[safe].reshape(ntiles, k + g, 6)        # big gather
    z = setup.z_ndc[safe]                                       # (ntiles, K+G, 3)
    # ids ride as exact f32 values (< 2^24; Mosaic lacks scalar bitcast).
    idf = safe.astype(jnp.float32)[..., None]
    pad = jnp.zeros((ntiles, k + g, 6), jnp.float32)
    packed = jnp.concatenate([xy, z, idf, pad], axis=-1)        # (ntiles, K+G, 16)
    return packed, counts


def _raster_kernel(count_ref, packed_ref, depth_ref, vis_ref, *, tile_h, tile_w, ntx):
    """count_ref: scalar-prefetched (ntiles,) SMEM array; packed_ref: this
    tile's (1, K+G, 16) VMEM block."""
    t = pl.program_id(0)
    ty = t // ntx
    tx = t % ntx
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    px = tx.astype(jnp.float32) * tile_w + ix + 0.5
    py = ty.astype(jnp.float32) * tile_h + iy + 0.5

    depth_ref[0] = jnp.full((tile_h, tile_w), DEPTH_FAR, jnp.float32)
    vis_ref[0] = jnp.full((tile_h, tile_w), VIS_NONE, jnp.int32)

    def edge(ax, ay, bx, by):
        return (by - ay) * (px - ax) - (bx - ax) * (py - ay)

    def body(i, _):
        row = packed_ref[0, i]
        x0, y0, x1, y1, x2, y2 = row[0], row[1], row[2], row[3], row[4], row[5]
        z0, z1, z2 = row[6], row[7], row[8]
        tri_id = row[9].astype(jnp.int32)
        e0 = edge(x1, y1, x2, y2)
        e1 = edge(x2, y2, x0, y0)
        e2 = edge(x0, y0, x1, y1)
        area2 = (y1 - y0) * (x2 - x0) - (x1 - x0) * (y2 - y0)
        inv_area = jnp.where(
            jnp.abs(area2) > 1e-12, 1.0 / jnp.where(area2 == 0, 1.0, area2), 0.0
        )
        l0, l1, l2 = e0 * inv_area, e1 * inv_area, e2 * inv_area
        d = l0 * z0 + l1 * z1 + l2 * z2
        covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & (d > depth_ref[0])
        depth_ref[0] = jnp.where(covered, d, depth_ref[0])
        vis_ref[0] = jnp.where(covered, tri_id, vis_ref[0])
        return 0

    jax.lax.fori_loop(0, count_ref[t], body, 0)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "cfg", "depth_only", "interpret")
)
def rasterize_tiles_pallas(
    setup: TriSetup,
    bins: TileBins,
    width: int,
    height: int,
    cfg: RasterConfig = RasterConfig(),
    depth_only: bool = False,
    interpret: bool = False,
):
    """Pallas stage-4 raster; same contract as ops/raster.rasterize_tiles
    (y_offset unsupported yet — single-band only)."""
    nty, ntx = num_tiles(width, height, cfg)
    ntiles = nty * ntx
    kg = cfg.max_tris_per_tile + cfg.max_global_tris

    packed, counts = _pack_tile_lists(setup, bins, cfg, ntiles)

    kernel = functools.partial(
        _raster_kernel, tile_h=cfg.tile_h, tile_w=cfg.tile_w, ntx=ntx
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, kg, 16), lambda t, c: (t, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, cfg.tile_h, cfg.tile_w), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, cfg.tile_h, cfg.tile_w), lambda t, c: (t, 0, 0)),
        ),
    )
    depth_t, vis_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, cfg.tile_h, cfg.tile_w), jnp.float32),
            jax.ShapeDtypeStruct((ntiles, cfg.tile_h, cfg.tile_w), jnp.int32),
        ),
        interpret=interpret,
    )(counts, packed)

    depth = tiled_to_image(
        depth_t.reshape(ntiles, cfg.tile_h * cfg.tile_w), width, height, cfg
    )
    if depth_only:
        vis = jnp.full((height, width), VIS_NONE, jnp.int32)
    else:
        vis = tiled_to_image(
            vis_t.reshape(ntiles, cfg.tile_h * cfg.tile_w), width, height, cfg
        )
    return vis, depth
