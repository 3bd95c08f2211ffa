"""3D math: vectors, quaternions, 4x4 matrices, frustum culling.

Equivalent role to the reference's vendored arklib math library
(deps/arklib/include/ark/*.h) and arkcore/core/math/Frustum.h — rebuilt as
pure jnp functions so they trace under jit and batch with vmap.

Conventions (fixed across the whole framework):
  * Right-handed world space, +Y up, camera looks down -Z in view space.
  * Column-vector convention: ``p' = M @ p``; compose left-to-right as
    ``proj @ view @ model``.
  * Clip space: x,y in [-w, w]; depth in [0, w] with **reverse-Z**
    (near plane -> depth 1, far plane -> 0) for f32 precision. The reference
    uses Vulkan [0,1] forward depth; reverse-Z is the TPU-first choice since
    our depth buffer is f32, and all depth comparisons live behind
    ``depth_closer``.
  * Screen/pixel space: x right, y DOWN (row-major images), pixel centers at
    integer + 0.5.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Vectors


def normalize(v, eps: float = 1e-20):
    return v * jnp.reciprocal(jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps))


def vdot(a, b, keepdims: bool = True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def reflect(incident, normal):
    """Reflect ``incident`` about ``normal`` (both pointing away from surface use -I)."""
    return incident - 2.0 * vdot(incident, normal) * normal


# ---------------------------------------------------------------------------
# Quaternions — stored (x, y, z, w)


def quat_identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_from_axis_angle(axis, angle):
    axis = normalize(jnp.asarray(axis, dtype=jnp.float32))
    half = 0.5 * jnp.asarray(angle, dtype=jnp.float32)
    s = jnp.sin(half)
    return jnp.concatenate([axis * s, jnp.cos(half)[..., None]], axis=-1)


def quat_mul(a, b):
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_mat3(q):
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_slerp(a, b, t):
    cos_half = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(cos_half < 0.0, -b, b)
    cos_half = jnp.abs(cos_half)
    cos_half = jnp.minimum(cos_half, 1.0 - 1e-7)
    half = jnp.arccos(cos_half)
    sin_half = jnp.sin(half)
    wa = jnp.sin((1.0 - t) * half) / sin_half
    wb = jnp.sin(t * half) / sin_half
    # Fall back to lerp when nearly parallel.
    near = cos_half > 1.0 - 1e-5
    out = jnp.where(near, (1.0 - t) * a + t * b, wa * a + wb * b)
    return normalize(out)


# ---------------------------------------------------------------------------
# 4x4 matrices


def mat4_identity():
    return jnp.eye(4, dtype=jnp.float32)


def translation(t):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(t, dtype=jnp.float32))


def scale(s):
    s = jnp.broadcast_to(jnp.asarray(s, dtype=jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), jnp.float32)]))


def rotation(q):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(quat_to_mat3(q))


def compose_trs(t, r, s):
    """translation @ rotation @ scale, the glTF node TRS order."""
    m3 = quat_to_mat3(r) * jnp.asarray(s, dtype=jnp.float32)[None, :]
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(m3)
    return m.at[:3, 3].set(jnp.asarray(t, dtype=jnp.float32))


def transform_points(m, p):
    """(..., 4, 4) @ (..., N, 3) -> (..., N, 3) with implicit w=1."""
    r = p @ jnp.swapaxes(m[..., :3, :3], -1, -2)
    return r + m[..., None, :3, 3]


def transform_points_h(m, p):
    """(4,4) @ (N,3) homogeneous -> (N,4) clip positions."""
    r = p @ jnp.swapaxes(m[..., :3, :3], -1, -2) + m[..., None, :3, 3]
    w = p @ m[..., 3, :3] + m[..., None, 3, 3]
    return jnp.concatenate([r, w[..., None]], axis=-1)


def transform_dirs(m, d):
    return d @ jnp.swapaxes(m[..., :3, :3], -1, -2)


def normal_matrix(m):
    """Inverse-transpose of the upper 3x3 (for normals under non-uniform scale)."""
    return jnp.linalg.inv(m[..., :3, :3]).swapaxes(-1, -2)


def look_at(eye, target, up=(0.0, 1.0, 0.0)):
    """View matrix (world -> view), camera at eye looking at target, RH -Z forward."""
    eye = jnp.asarray(eye, dtype=jnp.float32)
    f = normalize(jnp.asarray(target, dtype=jnp.float32) - eye)  # forward (-Z view)
    r = normalize(jnp.cross(f, jnp.asarray(up, dtype=jnp.float32)))
    u = jnp.cross(r, f)
    rot = jnp.stack([r, u, -f], axis=0)  # rows: view axes in world space
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    return m.at[:3, 3].set(-rot @ eye)


def perspective_reverse_z(fov_y: float, aspect: float, near: float, far: float | None = None):
    """Perspective projection, depth in [0,1] REVERSED (near=1, far=0).

    ``far=None`` gives the infinite-far variant. ``fov_y`` is the vertical
    field of view in radians. Y is NOT flipped here (clip +Y = up); the
    viewport transform flips to row-major screen space.
    """
    g = 1.0 / jnp.tan(0.5 * jnp.asarray(fov_y, dtype=jnp.float32))
    m = jnp.zeros((4, 4), dtype=jnp.float32)
    m = m.at[0, 0].set(g / aspect)
    m = m.at[1, 1].set(g)
    if far is None:
        m = m.at[2, 2].set(0.0)
        m = m.at[2, 3].set(near)
    else:
        m = m.at[2, 2].set(near / (far - near))
        m = m.at[2, 3].set(far * near / (far - near))
    m = m.at[3, 2].set(-1.0)
    return m


def orthographic_reverse_z(left, right, bottom, top, near, far):
    """Ortho projection with reversed [0,1] depth (view -Z maps into depth)."""
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, 0].set(2.0 / (right - left))
    m = m.at[1, 1].set(2.0 / (top - bottom))
    m = m.at[2, 2].set(1.0 / (far - near))      # view z=-near -> 1, z=-far -> 0
    m = m.at[0, 3].set(-(right + left) / (right - left))
    m = m.at[1, 3].set(-(top + bottom) / (top - bottom))
    m = m.at[2, 3].set(far / (far - near))
    return m


def apply_jitter(proj, jitter_x: float, jitter_y: float, width: int, height: int):
    """Add a sub-pixel jitter (in pixels, [-0.5,0.5]) to a projection matrix.

    Same mechanism as the reference's Halton-jittered frustum
    (arkose/scene/camera/Camera.cpp:56-68): offsets the clip-space xy by
    2*jitter/extent so that after the viewport transform the image shifts by
    exactly ``jitter`` pixels.
    """
    proj = proj.at[0, 2].add(-2.0 * jitter_x / width)
    return proj.at[1, 2].add(2.0 * jitter_y / height)


def depth_closer(a, b):
    """True where depth ``a`` is closer to the camera than ``b`` (reverse-Z)."""
    return a > b


DEPTH_FAR = 0.0  # clear value for a reverse-Z depth buffer


# ---------------------------------------------------------------------------
# Frustum (reference: arkcore/core/math/Frustum.h:12-16)


def frustum_planes_from_matrix(view_proj):
    """Extract 6 frustum planes (nx,ny,nz,d) with inward normals from a
    view-projection matrix (Gribb-Hartmann). Plane eq: n.p + d >= 0 inside.

    With reverse-Z [0,1] clip depth the near plane is ``w - z >= 0``-side
    swapped: planes are (left, right, bottom, top, near, far).
    """
    r = view_proj
    planes = jnp.stack(
        [
            r[3] + r[0],  # left:   x > -w
            r[3] - r[0],  # right:  x <  w
            r[3] + r[1],  # bottom
            r[3] - r[1],  # top
            r[3] - r[2],  # near (reverse-Z: z < w)
            r[2],         # far  (reverse-Z: z > 0)
        ],
        axis=0,
    )
    n = jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
    return planes / jnp.maximum(n, 1e-20)


def frustum_test_spheres(planes, centers, radii):
    """(6,4) planes vs (N,3)+(N,) spheres -> (N,) bool visible (conservative)."""
    d = centers @ planes[:, :3].T + planes[None, :, 3]  # (N, 6)
    return jnp.all(d >= -radii[:, None], axis=-1)


def aabb_corners(mins, maxs):
    """(...,3),(...,3) -> (...,8,3) corner points."""
    mins = jnp.asarray(mins)
    maxs = jnp.asarray(maxs)
    sel = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=np.float32
    )
    return mins[..., None, :] * (1.0 - sel) + maxs[..., None, :] * sel
