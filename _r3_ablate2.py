"""Round-3 profile 2: PREFIX-fused attribution of the 1080p forward frame.

Builds the forward pipeline once (pinned stochastic1/stochastic quality so
the auto knobs don't confound), then compiles fused prefixes of the pass
list (Scene..pass_k) and measures each; successive deltas attribute cost
in fused context (outputs are returned state, so producers aren't DCE'd).
One process, interleaved reps per DEVNOTES methodology.

NOTE: each prefix gets its OWN standalone closure — jax.jit(self.frame_fn)
wrappers on the same bound method share a cache entry (equal hash), which
silently reused the first prefix's trace on the first attempt."""
import dataclasses
import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import _cfg
from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.models.standard import Renderer
from arkoserenderer_tpu.rendering.pipeline import FrameContext

cfg0 = _cfg(small=False)
cfg0 = dataclasses.replace(
    cfg0, texture_quality="stochastic1", shadow_filter="stochastic"
)
scene, camera = build_test_scene(viewport=(cfg0.width, cfg0.height))
r = Renderer(scene, camera, cfg0)
pipe = r.pipeline
full_exec = list(pipe._executes)
print("passes:", [n for n, _ in full_exec], flush=True)

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


import os
ks = os.environ.get("PREFIX_RANGE", "")
sel = range(1, len(full_exec) + 1)
if ks:
    a, b = ks.split(":")
    sel = range(int(a), int(b) + 1)
fns = {}
for k in sel:
    prefix = tuple(full_exec[:k])
    fn = jax.jit(functools.partial(run_prefix, prefix))
    name = full_exec[k - 1][0]
    t0 = time.perf_counter()
    out = jax.block_until_ready(
        fn(inputs, scene_arrays, cam_state, 1, 1 / 60)
    )
    fns[f"{k:02d}:{name}"] = fn
    print(f"compiled prefix ..{name} in {time.perf_counter()-t0:.1f}s", flush=True)

acc = {k: [] for k in fns}
for rep in range(4):
    for name, fn in fns.items():
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(inputs, scene_arrays, cam_state, 1, 1 / 60)
        jax.block_until_ready(out)
        acc[name].append((time.perf_counter() - t0) / 3 * 1e3)

prev = 0.0
for name, times in acc.items():
    med = statistics.median(times)
    print(f"{name:24s} {med:8.2f} ms  delta {med-prev:+7.2f}   "
          f"(reps: {[round(t,1) for t in times]})", flush=True)
    prev = med
