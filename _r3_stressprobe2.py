"""Per-pass poison localization for the stress config: jit+run each pass
separately, probe dispatch latency after each."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

rng = np.random.default_rng(0)
a = jnp.asarray(rng.random((1080, 1920, 3), np.float32))
b = jnp.asarray(rng.random((1080, 1920, 3), np.float32))


@jax.jit
def jb(a, b):
    return a + (b - a) * 0.1


def lat(label, n=3):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(a, b))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:34s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

from bench import _cfg
from arkoserenderer_tpu.assets.procedural import build_stress_scene
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import FrameContext

cfg = _cfg(small=False)
scene, camera = build_stress_scene(n_instances=4096, viewport=(cfg.width, cfg.height))
renderer = Renderer(scene, camera, cfg, dynamic_transforms=True)
pipe = renderer.pipeline
state = dict(pipe.initial_state())
ctx = FrameContext(
    scene=renderer.scene_arrays,
    camera=camera.state(0),
    frame_index=jnp.asarray(0, jnp.int32),
    delta_time=jnp.asarray(1 / 60, jnp.float32),
    row_offset=jnp.zeros((), jnp.int32),
)
for name, execute in pipe._executes:
    updates = jax.jit(execute)(state, ctx) or {}
    jax.block_until_ready(jax.tree_util.tree_leaves(updates))
    state.update(updates)
    lat(f"after {name}")
