"""Physics: backend abstraction + built-in impulse integrator.

Role-equivalent to the reference's physics layer (arkose/physics/backend/
base/PhysicsBackend.h:14-47 — abstract shapes box/mesh, static/dynamic
instances, impulses — implemented there by Jolt): Jolt has no TPU build, so
the built-in backend is a small fixed-step rigid-body integrator with sphere
/box dynamics against static planes, boxes, and TRIANGLE MESHES (closest-
point-on-triangle contacts with an AABB prefilter) — the shape set of
PhysicsBackend.h:14-47, enough for the Showcase "shoot boxes" interaction
(ShowcaseApp.cpp:267-292). PhysicsScene syncs body transforms to render
instances (attachRenderTransform semantics).
"""

from __future__ import annotations

import abc
import dataclasses

import numpy as np

GRAVITY = np.array([0.0, -9.81, 0.0], np.float32)


@dataclasses.dataclass
class BodyDesc:
    shape: str                   # "sphere" | "box"
    half_extents: np.ndarray     # sphere: [r,r,r]
    mass: float = 1.0            # 0 = static
    restitution: float = 0.3
    friction: float = 0.6


class PhysicsBackend(abc.ABC):
    """Abstract backend (PhysicsBackend.h analogue)."""

    @abc.abstractmethod
    def add_body(self, desc: BodyDesc, position, velocity=(0, 0, 0)) -> int: ...

    @abc.abstractmethod
    def add_static_plane(self, normal, offset: float) -> int: ...

    @abc.abstractmethod
    def add_static_mesh(self, vertices, triangles) -> int:
        """Static triangle-mesh collider (PhysicsBackend.h:14-47's mesh
        shape — Jolt MeshShape in the reference)."""

    @abc.abstractmethod
    def apply_impulse(self, body: int, impulse) -> None: ...

    @abc.abstractmethod
    def step(self, dt: float, substeps: int = 2) -> None: ...

    @abc.abstractmethod
    def body_transform(self, body: int) -> np.ndarray: ...


class BuiltinPhysicsBackend(PhysicsBackend):
    """Semi-implicit Euler + impulse contact resolution (fixed step)."""

    def __init__(self):
        self.pos: list[np.ndarray] = []
        self.vel: list[np.ndarray] = []
        self.desc: list[BodyDesc] = []
        self.planes: list[tuple[np.ndarray, float]] = []
        # Static mesh colliders: per-mesh (v0, e1, e2, normal, aabb_lo, aabb_hi).
        self.meshes: list[tuple] = []

    def add_body(self, desc, position, velocity=(0, 0, 0)) -> int:
        self.pos.append(np.asarray(position, np.float32).copy())
        self.vel.append(np.asarray(velocity, np.float32).copy())
        self.desc.append(desc)
        return len(self.pos) - 1

    def add_static_plane(self, normal, offset: float) -> int:
        n = np.asarray(normal, np.float32)
        self.planes.append((n / np.linalg.norm(n), float(offset)))
        return len(self.planes) - 1

    def add_static_mesh(self, vertices, triangles) -> int:
        """World-space triangle soup as a static collider. Dynamic bodies
        collide via closest-point-on-triangle against their bounding sphere
        (boxes use their inscribed sphere — the builtin backend's
        approximation; the reference gets exact box-vs-mesh from Jolt)."""
        v = np.asarray(vertices, np.float32)
        t = np.asarray(triangles, np.int64).reshape(-1, 3)
        p0 = v[t[:, 0]]
        e1 = v[t[:, 1]] - p0
        e2 = v[t[:, 2]] - p0
        n = np.cross(e1, e2)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        good = norm[:, 0] > 1e-12
        p0, e1, e2, n = p0[good], e1[good], e2[good], n[good] / norm[good]
        tv = np.stack([p0, p0 + e1, p0 + e2], axis=1)
        lo = tv.min(axis=1)
        hi = tv.max(axis=1)
        self.meshes.append((p0, e1, e2, n, lo, hi))
        return len(self.meshes) - 1

    @staticmethod
    def _closest_on_triangles(p, p0, e1, e2):
        """Vectorized closest point on each triangle to point p (Ericson,
        'Real-Time Collision Detection' 5.1.5). Returns (T, 3) points."""
        ap = p[None, :] - p0
        d1 = (e1 * ap).sum(-1)
        d2 = (e2 * ap).sum(-1)
        a = (e1 * e1).sum(-1)
        b = (e1 * e2).sum(-1)
        c = (e2 * e2).sum(-1)
        det = np.maximum(a * c - b * b, 1e-20)
        u = np.clip((c * d1 - b * d2) / det, 0.0, 1.0)
        w = np.clip((a * d2 - b * d1) / det, 0.0, 1.0)
        over = u + w > 1.0
        # Clamp to the diagonal edge where the unconstrained solution leaves
        # the triangle, then re-clamp each edge parameter.
        if over.any():
            bp = p[None, :] - (p0 + e1)
            d3 = ((e2 - e1) * bp).sum(-1)
            ec = ((e2 - e1) ** 2).sum(-1)
            t_d = np.clip(d3 / np.maximum(ec, 1e-20), 0.0, 1.0)
            u = np.where(over, 1.0 - t_d, u)
            w = np.where(over, t_d, w)
        # Edge/vertex regions: clamp the independent parameters too.
        u = np.clip(u, 0.0, 1.0)
        w = np.clip(w, 0.0, 1.0)
        s_sum = u + w
        scale = np.where(s_sum > 1.0, 1.0 / s_sum, 1.0)
        u *= scale
        w *= scale
        return p0 + u[:, None] * e1 + w[:, None] * e2

    def apply_impulse(self, body: int, impulse) -> None:
        d = self.desc[body]
        if d.mass > 0:
            self.vel[body] = self.vel[body] + np.asarray(impulse, np.float32) / d.mass

    def step(self, dt: float, substeps: int = 2) -> None:
        h = dt / substeps
        for _ in range(substeps):
            for i, d in enumerate(self.desc):
                if d.mass <= 0:
                    continue
                self.vel[i] = self.vel[i] + GRAVITY * h
                self.pos[i] = self.pos[i] + self.vel[i] * h
                r = float(d.half_extents[1])  # support height
                # Triangle-mesh contacts: sphere (inscribed for boxes)
                # vs closest point on nearby triangles.
                r_m = float(min(d.half_extents))
                for p0, e1, e2, tn, lo, hi in self.meshes:
                    p = self.pos[i]
                    near = (
                        (p[None, :] + r_m >= lo) & (p[None, :] - r_m <= hi)
                    ).all(axis=1)
                    if not near.any():
                        continue
                    cp = self._closest_on_triangles(
                        p, p0[near], e1[near], e2[near]
                    )
                    delta = p[None, :] - cp
                    dist = np.linalg.norm(delta, axis=-1)
                    k = int(np.argmin(dist))
                    depth = r_m - dist[k]
                    if depth > 0.0:
                        cn = (
                            delta[k] / dist[k] if dist[k] > 1e-9
                            else tn[near][k]
                        )
                        self.pos[i] = self.pos[i] + cn * depth
                        vn = float(np.dot(self.vel[i], cn))
                        if vn < 0.0:
                            vt = self.vel[i] - vn * cn
                            self.vel[i] = (
                                vt * max(1.0 - d.friction * h * 10.0, 0.0)
                                - vn * d.restitution * cn
                            )
                for n, off in self.planes:
                    depth = off + r - float(np.dot(n, self.pos[i]))
                    if depth > 0.0:
                        self.pos[i] = self.pos[i] + n * depth
                        vn = float(np.dot(self.vel[i], n))
                        if vn < 0.0:
                            # Restitution on the normal, friction tangentially.
                            vt = self.vel[i] - vn * n
                            self.vel[i] = (
                                vt * max(1.0 - d.friction * h * 10.0, 0.0)
                                - vn * d.restitution * n
                            )

    def body_transform(self, body: int) -> np.ndarray:
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = self.pos[body]
        return m


@dataclasses.dataclass
class PhysicsScene:
    """Binds physics bodies to render instances (PhysicsScene analogue:
    attachRenderTransform, commit to renderer each frame)."""

    backend: PhysicsBackend
    scene: object  # scene.Scene

    def __post_init__(self):
        self._bindings: list[tuple[int, int]] = []  # (body, instance index)

    def attach(self, body: int, instance_index: int):
        self._bindings.append((body, instance_index))

    def commit(self):
        """Write body transforms into the scene's instance list; the caller
        rebuilds/uploads instance transforms (Scene::update physics step)."""
        for body, inst in self._bindings:
            sid, world, prev, clip, lod_band = self.scene.instances[inst]
            new_world = self.backend.body_transform(body)
            self.scene.instances[inst] = (sid, new_world, world, clip, lod_band)
