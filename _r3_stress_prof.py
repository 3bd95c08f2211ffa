"""Clean per-pass attribution for the STRESS config (prefix-fused deltas,
readback-free). Also separates host-side time (animate + transform upload)
from device time."""
import dataclasses
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _cfg
from arkoserenderer_tpu.assets.procedural import animate_stress_scene, build_stress_scene
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import FrameContext

cfg0 = _cfg(small=False)
scene, camera = build_stress_scene(n_instances=4096, viewport=(cfg0.width, cfg0.height))
r = Renderer(scene, camera, cfg0, dynamic_transforms=True)
pipe = r.pipeline
full_exec = list(pipe._executes)
print("passes:", [n for n, _ in full_exec], flush=True)

# ---- host-side costs (no device involvement in animate itself) ----
t0 = time.perf_counter()
for i in range(5):
    animate_stress_scene(scene, i / 60.0)
t_anim = (time.perf_counter() - t0) / 5 * 1e3
t0 = time.perf_counter()
for i in range(5):
    arrays = scene.update_instance_transforms(r.scene_arrays)
jax.block_until_ready(arrays.world)
t_upd = (time.perf_counter() - t0) / 5 * 1e3
print(f"host animate: {t_anim:.1f} ms   update+upload: {t_upd:.1f} ms", flush=True)

# ---- steady-state full frame ----
for i in range(3):
    animate_stress_scene(scene, i / 60.0)
    jax.block_until_ready(r.render_frame())
t0 = time.perf_counter()
for i in range(5):
    animate_stress_scene(scene, (3 + i) / 60.0)
    out = r.render_frame()
jax.block_until_ready(out)
print(f"full frame steady: {(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)

# ---- prefix-fused attribution (static scene arrays, fixed frame idx) ----
scene_arrays = r.scene_arrays
cam_state = camera.state(1)
persistent = pipe.registry.persistent_names
init = pipe.initial_state()
inputs = {k: init[k] for k in persistent if k in init}
if "scene.version" in persistent:
    inputs["scene.version"] = jnp.asarray(0, jnp.int32)


def run_prefix(executes, state, scn, cam, frame_index, delta_time):
    ctx = FrameContext(
        scene=scn, camera=cam,
        frame_index=jnp.asarray(frame_index, jnp.int32),
        delta_time=jnp.asarray(delta_time, jnp.float32),
        row_offset=jnp.zeros((), jnp.int32),
    )
    state = dict(state)
    for _name, execute in executes:
        with jax.named_scope(_name):
            updates = execute(state, ctx)
        if updates:
            state.update(updates)
    return state


jits = []
for k in range(1, len(full_exec) + 1):
    sub = full_exec[:k]
    fn = jax.jit(functools.partial(run_prefix, sub))
    t0 = time.perf_counter()
    out = fn(inputs, scene_arrays, cam_state, 1, 1 / 60)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    jits.append((full_exec[k - 1][0], fn))
    print(f"compiled prefix ..{full_exec[k-1][0]} in {time.perf_counter()-t0:.1f}s",
          flush=True)

acc = {name: [] for name, _ in jits}
for rep in range(4):
    for name, fn in jits:
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(inputs, scene_arrays, cam_state, 1, 1 / 60)
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        acc[name].append((time.perf_counter() - t0) / 3 * 1e3)

prev = 0.0
for i, (name, _) in enumerate(jits):
    med = statistics.median(acc[name])
    print(f"{i+1:02d}:{name:22s} {med:8.2f} ms  delta {med-prev:+8.2f}")
    prev = med
