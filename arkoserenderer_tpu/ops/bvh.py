"""BVH build + batched ray traversal.

TPU-native replacement for the reference's acceleration-structure stack
(arkose/rendering/backend/base/AccelerationStructure.h — BLAS/TLAS built by
the driver in VulkanAccelerationStructureKHR.cpp): there is no RT hardware on
a TPU, so we build the BVH ourselves and traverse it as a data-parallel
program over ray batches.

Round-1 scope: ONE flat world-space BVH over all static triangles (built
host-side in NumPy, median-split over centroid axes, leaves <= 4 tris).
The two-level TLAS/BLAS split with per-frame refit (GpuScene.cpp:872-1011's
rebuild policy) layers on top later; the traversal kernel is shared.

Traversal: SIMD-over-rays — every ray carries its own small traversal stack
(fixed depth) in registers/VMEM; one while-loop step pops a node per ray,
tests both children's AABBs (internal) or up to 4 Moller-Trumbore triangle
tests (leaf). Divergence costs lanes, not correctness; ray sorting /
compaction between bounces is the later optimization (SURVEY.md §7 hard
part #2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
STACK_DEPTH = 48


class FlatBVH(NamedTuple):
    """Array-of-structs flattened BVH (a pytree of device arrays)."""

    node_min: jax.Array    # (M, 3) f32
    node_max: jax.Array    # (M, 3) f32
    left: jax.Array        # (M,) i32 — child index (internal) or first tri slot (leaf)
    right: jax.Array       # (M,) i32 — child index (internal), unused for leaf
    count: jax.Array       # (M,) i32 — 0 internal, >0 = leaf triangle count
    node_start: jax.Array  # (M,) i32 — first slot of the node's contiguous
    node_end: jax.Array    # (M,) i32   range in tri_order (median-split keeps
                           #            every node's triangles contiguous)
    tri_order: jax.Array   # (T,) i32 — triangle ids grouped by leaf
    tri_v0: jax.Array      # (T, 3) f32 — pretransformed world-space vertices,
    tri_e1: jax.Array      # (T, 3)      in tri_order layout for coalesced
    tri_e2: jax.Array      # (T, 3)      leaf fetches (v0, edge1, edge2)


class Hit(NamedTuple):
    t: jax.Array         # (R,) hit distance (t_max if miss)
    tri: jax.Array       # (R,) i32 ORIGINAL triangle id (-1 = miss)
    u: jax.Array         # (R,) barycentric u (of v1)
    v: jax.Array         # (R,) barycentric v (of v2)
    hit: jax.Array       # (R,) bool


def build_bvh(world_verts: np.ndarray, tris: np.ndarray, tri_valid: np.ndarray) -> FlatBVH:
    """Host-side median-split BVH over world-space triangles.

    ``world_verts``: (V, 3); ``tris``: (T, 3) indices; ``tri_valid``: (T,).
    Invalid (pool-padding) triangles are excluded.
    """
    ids = np.nonzero(tri_valid)[0].astype(np.int32)
    if len(ids) == 0:
        ids = np.zeros((1,), np.int32)  # degenerate: one dummy leaf
    v = world_verts[tris[ids]]                     # (n, 3, 3)
    lo = v.min(axis=1)
    hi = v.max(axis=1)
    centroid = 0.5 * (lo + hi)

    n = len(ids)
    max_nodes = 2 * n
    node_min = np.zeros((max_nodes, 3), np.float32)
    node_max = np.zeros((max_nodes, 3), np.float32)
    left = np.zeros((max_nodes,), np.int32)
    right = np.zeros((max_nodes,), np.int32)
    count = np.zeros((max_nodes,), np.int32)
    node_start = np.zeros((max_nodes,), np.int32)
    node_end = np.zeros((max_nodes,), np.int32)

    order = np.arange(n)
    n_nodes = 1
    # (node index, slice into `order`)
    stack: list[tuple[int, int, int]] = [(0, 0, n)]
    while stack:
        node, s, e = stack.pop()
        node_start[node] = s
        node_end[node] = e
        sel = order[s:e]
        node_min[node] = lo[sel].min(axis=0)
        node_max[node] = hi[sel].max(axis=0)
        if e - s <= LEAF_SIZE:
            left[node] = s
            count[node] = e - s
            continue
        c = centroid[sel]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        mid = (e - s) // 2
        part = np.argpartition(c[:, axis], mid)
        order[s:e] = sel[part]
        l_idx, r_idx = n_nodes, n_nodes + 1
        n_nodes += 2
        left[node] = l_idx
        right[node] = r_idx
        count[node] = 0
        stack.append((l_idx, s, s + mid))
        stack.append((r_idx, s + mid, e))

    tri_order = ids[order]
    tv = world_verts[tris[tri_order]]
    return FlatBVH(
        node_min=jnp.asarray(node_min[:n_nodes]),
        node_max=jnp.asarray(node_max[:n_nodes]),
        left=jnp.asarray(left[:n_nodes]),
        right=jnp.asarray(right[:n_nodes]),
        count=jnp.asarray(count[:n_nodes]),
        node_start=jnp.asarray(node_start[:n_nodes]),
        node_end=jnp.asarray(node_end[:n_nodes]),
        tri_order=jnp.asarray(tri_order),
        tri_v0=jnp.asarray(tv[:, 0].astype(np.float32)),
        tri_e1=jnp.asarray((tv[:, 1] - tv[:, 0]).astype(np.float32)),
        tri_e2=jnp.asarray((tv[:, 2] - tv[:, 0]).astype(np.float32)),
    )


def refit_bvh(bvh: FlatBVH, world_verts: jax.Array, tris: jax.Array) -> FlatBVH:
    """Jit-traceable AABB refit: same topology, new vertex positions.

    The TLAS/BLAS update-in-place analogue (the reference rebuilds or
    updates BLASes for skinned meshes each frame and refits the TLAS,
    GpuScene.cpp:872-1011 + VulkanAccelerationStructureKHR update mode).
    Median-split build keeps every node's triangles CONTIGUOUS in
    ``tri_order``, so each node's bounds are a range-min/max over the leaf
    bound arrays — answered for all nodes at once with a sparse-table RMQ:
    O(T log T) work, fully parallel, no bottom-up sequential walk.
    """
    v = world_verts[tris[bvh.tri_order]]          # (n, 3, 3) in leaf order
    lo = v.min(axis=1)                            # (n, 3)
    hi = v.max(axis=1)
    n = lo.shape[0]
    levels = max(int(np.ceil(np.log2(max(n, 1)))) + 1, 1)

    pw_lo, pw_hi = [lo], [hi]
    for k in range(1, levels):
        half = 1 << (k - 1)
        pad_lo = jnp.full((half, 3), jnp.inf, lo.dtype)
        pad_hi = jnp.full((half, 3), -jnp.inf, hi.dtype)
        # pw[k][i] = reduce over [i, i + 2^k); tail pads never get gathered
        # (every queried range lies inside [0, n)).
        pw_lo.append(jnp.minimum(pw_lo[-1],
                                 jnp.concatenate([pw_lo[-1][half:], pad_lo])[:n]))
        pw_hi.append(jnp.maximum(pw_hi[-1],
                                 jnp.concatenate([pw_hi[-1][half:], pad_hi])[:n]))
    table_lo = jnp.stack(pw_lo)                   # (levels, n, 3)
    table_hi = jnp.stack(pw_hi)

    length = (bvh.node_end - bvh.node_start).astype(jnp.float32)  # >= 1
    k = jnp.floor(jnp.log2(jnp.maximum(length, 1.0)) + 1e-6).astype(jnp.int32)
    second = bvh.node_end - (1 << k)              # range [second, end) tail
    node_min = jnp.minimum(table_lo[k, bvh.node_start], table_lo[k, second])
    node_max = jnp.maximum(table_hi[k, bvh.node_start], table_hi[k, second])
    return bvh._replace(
        node_min=node_min, node_max=node_max,
        tri_v0=v[:, 0], tri_e1=v[:, 1] - v[:, 0], tri_e2=v[:, 2] - v[:, 0],
    )


def _aabb_hit(node_lo, node_hi, origin, inv_dir, t_max):
    """Slab test; returns (hit, t_near). Shapes broadcast over rays."""
    t0 = (node_lo - origin) * inv_dir
    t1 = (node_hi - origin) * inv_dir
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tmin, axis=-1), 0.0)
    far = jnp.minimum(jnp.min(tmax, axis=-1), t_max)
    return near <= far, near


def _tri_hit(v0, e1, e2, origin, direction, t_eps):
    """Moller-Trumbore; returns (valid, t, u, v)."""
    pvec = jnp.cross(direction, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    # Small barycentric slack: rays through shared edges/vertices must hit at
    # least one of the adjacent triangles despite f32 rounding (watertight-ish).
    eps = 1e-6
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
        & (t > t_eps)
    )
    return ok, t, u, v


def trace_rays(
    bvh: FlatBVH,
    origins: jax.Array,     # (R, 3)
    directions: jax.Array,  # (R, 3) need not be normalized
    t_max: float | jax.Array = 1e30,
    t_eps: float = 1e-4,
    any_hit: bool = False,
    max_steps: int = 512,
) -> Hit:
    """Batched closest-hit (or any-hit) traversal.

    All rays advance one BVH node per step in lockstep over the batch; each
    ray owns a fixed-depth stack. ``any_hit=True`` terminates a ray on its
    first accepted intersection (shadow/occlusion rays).
    """
    r = origins.shape[0]
    inv_dir = 1.0 / jnp.where(jnp.abs(directions) < 1e-12,
                              jnp.where(directions < 0, -1e-12, 1e-12), directions)

    stack = jnp.zeros((r, STACK_DEPTH), jnp.int32)
    sp = jnp.ones((r,), jnp.int32)          # node 0 pre-pushed
    best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,)).astype(jnp.float32)
    best_tri = jnp.full((r,), -1, jnp.int32)
    best_u = jnp.zeros((r,))
    best_v = jnp.zeros((r,))

    def cond(state):
        _, sp, _, _, _, _, step = state
        return jnp.any(sp > 0) & (step < max_steps)

    def body(state):
        stack, sp, best_t, best_tri, best_u, best_v, step = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[jnp.arange(r), top]
        sp_pop = jnp.where(active, sp - 1, sp)

        n_lo = bvh.node_min[node]
        n_hi = bvh.node_max[node]
        hit_box, _ = _aabb_hit(n_lo, n_hi, origins, inv_dir, best_t)
        hit_box = hit_box & active

        is_leaf = bvh.count[node] > 0

        # -- leaf: test up to LEAF_SIZE triangles -----------------------------
        first = bvh.left[node]
        lcount = bvh.count[node]
        do_leaf = hit_box & is_leaf
        bt, btri, bu, bv = best_t, best_tri, best_u, best_v
        for k in range(LEAF_SIZE):
            slot = jnp.clip(first + k, 0, bvh.tri_v0.shape[0] - 1)
            ok, t, u, v = _tri_hit(
                bvh.tri_v0[slot], bvh.tri_e1[slot], bvh.tri_e2[slot],
                origins, directions, t_eps,
            )
            take = do_leaf & (k < lcount) & ok & (t < bt)
            bt = jnp.where(take, t, bt)
            btri = jnp.where(take, bvh.tri_order[slot], btri)
            bu = jnp.where(take, u, bu)
            bv = jnp.where(take, v, bv)

        # -- internal: push children, near child last (popped first) ----------
        do_int = hit_box & ~is_leaf
        l_child = bvh.left[node]
        r_child = bvh.right[node]
        hit_l, near_l = _aabb_hit(bvh.node_min[l_child], bvh.node_max[l_child], origins, inv_dir, bt)
        hit_r, near_r = _aabb_hit(bvh.node_min[r_child], bvh.node_max[r_child], origins, inv_dir, bt)
        hit_l = hit_l & do_int
        hit_r = hit_r & do_int
        l_first = near_l <= near_r

        far_child = jnp.where(l_first, r_child, l_child)
        near_child = jnp.where(l_first, l_child, r_child)
        far_ok = jnp.where(l_first, hit_r, hit_l)
        near_ok = jnp.where(l_first, hit_l, hit_r)

        rows = jnp.arange(r)
        new_sp = sp_pop
        stack = stack.at[rows, jnp.minimum(new_sp, STACK_DEPTH - 1)].set(
            jnp.where(far_ok, far_child, stack[rows, jnp.minimum(new_sp, STACK_DEPTH - 1)])
        )
        new_sp = jnp.where(far_ok, jnp.minimum(new_sp + 1, STACK_DEPTH - 1), new_sp)
        stack = stack.at[rows, jnp.minimum(new_sp, STACK_DEPTH - 1)].set(
            jnp.where(near_ok, near_child, stack[rows, jnp.minimum(new_sp, STACK_DEPTH - 1)])
        )
        new_sp = jnp.where(near_ok, jnp.minimum(new_sp + 1, STACK_DEPTH - 1), new_sp)

        if any_hit:
            # A ray that found any hit stops traversing.
            new_sp = jnp.where(btri >= 0, 0, new_sp)

        return stack, new_sp, bt, btri, bu, bv, step + 1

    stack, sp, best_t, best_tri, best_u, best_v, _ = jax.lax.while_loop(
        cond, body,
        (stack, sp, best_t, best_tri, best_u, best_v, jnp.zeros((), jnp.int32)),
    )
    return Hit(
        t=best_t, tri=best_tri, u=best_u, v=best_v, hit=best_tri >= 0
    )


def trace_rays_brute(
    world_verts: np.ndarray,
    tris: np.ndarray,
    tri_valid: np.ndarray,
    origins: np.ndarray,
    directions: np.ndarray,
    t_max: float = 1e30,
    t_eps: float = 1e-4,
):
    """NumPy brute-force reference for tests: O(R x T)."""
    r = origins.shape[0]
    best_t = np.full((r,), t_max, np.float32)
    best_tri = np.full((r,), -1, np.int32)
    for ti in np.nonzero(tri_valid)[0]:
        v0, v1, v2 = world_verts[tris[ti]]
        e1 = v1 - v0
        e2 = v2 - v0
        pvec = np.cross(directions, e2)
        det = (e1[None] * pvec).sum(-1)
        good = np.abs(det) > 1e-12
        inv = np.where(good, 1.0 / np.where(det == 0, 1, det), 0.0)
        tvec = origins - v0
        u = (tvec * pvec).sum(-1) * inv
        qvec = np.cross(tvec, e1)
        v = (directions * qvec).sum(-1) * inv
        t = (e2[None] * qvec).sum(-1) * inv
        ok = good & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_eps) & (t < best_t)
        best_t[ok] = t[ok]
        best_tri[ok] = ti
    return best_t, best_tri
