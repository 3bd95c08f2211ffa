"""Physics: backend abstraction + built-in impulse integrator.

Role-equivalent to the reference's physics layer (arkose/physics/backend/
base/PhysicsBackend.h:14-47 — abstract shapes box/mesh, static/dynamic
instances, impulses — implemented there by Jolt): Jolt has no TPU build, so
the built-in backend is a small fixed-step rigid-body integrator with sphere
/box dynamics against static planes and boxes — enough for the Showcase
"shoot boxes" interaction (ShowcaseApp.cpp:267-292). PhysicsScene syncs body
transforms to render instances (attachRenderTransform semantics).
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

    def add_body(self, desc, position, velocity=(0, 0, 0)) -> int:
        self.pos.append(np.asarray(position, np.float32).copy())
        self.vel.append(np.asarray(velocity, np.float32).copy())
        self.desc.append(desc)
        return len(self.pos) - 1

    def add_static_plane(self, normal, offset: float) -> int:
        n = np.asarray(normal, np.float32)
        self.planes.append((n / np.linalg.norm(n), float(offset)))
        return len(self.planes) - 1

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
