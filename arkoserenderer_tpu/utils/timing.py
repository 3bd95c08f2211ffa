"""Per-pass timing: the reference's per-node GPU timers, rebuilt for XLA.

Role-equivalent to the per-node timestamp queries + rolling averages the
reference displays against its 16.667 ms budget (VulkanBackend.cpp:1830-1935,
RenderPipeline.cpp:76-108, AvgElapsedTimer.h). XLA fuses across passes inside
the one jitted frame function, so for *timing* we jit each pass's execute
separately and measure blocking wall-clock per pass — an upper bound that
still localizes cost — plus the fused whole-frame time.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from arkoserenderer_tpu.rendering.pipeline import FrameContext, RenderPipeline
from arkoserenderer_tpu.scene.camera import CameraState
from arkoserenderer_tpu.scene.scene import SceneArrays


def time_passes(
    pipe: RenderPipeline,
    state: dict,
    scene: SceneArrays,
    camera: CameraState,
    frame_index: int = 1,
    iters: int = 5,
) -> dict[str, float]:
    """Returns {pass_name: ms} plus '<frame>' for the fused full frame."""
    ctx = FrameContext(
        scene=scene,
        camera=camera,
        frame_index=jnp.asarray(frame_index, jnp.int32),
        delta_time=jnp.asarray(1 / 60, jnp.float32),
        row_offset=jnp.zeros((), jnp.int32),
    )
    results: dict[str, float] = {}
    state = dict(state)
    for name, execute in pipe._executes:
        fn = jax.jit(execute)
        updates = jax.block_until_ready(fn(state, ctx))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            updates = fn(state, ctx)
        jax.block_until_ready(updates)
        results[name] = (time.perf_counter() - t0) / iters * 1e3
        state.update(updates)

    fused = pipe.compile(donate_state=False)
    out = jax.block_until_ready(
        fused(pipe.initial_state(), scene, camera,
              jnp.asarray(frame_index, jnp.int32), jnp.asarray(1 / 60, jnp.float32))
    )
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fused(
            pipe.initial_state(), scene, camera,
            jnp.asarray(frame_index, jnp.int32), jnp.asarray(1 / 60, jnp.float32),
        )
    jax.block_until_ready(out)
    results["<frame>"] = (time.perf_counter() - t0) / iters * 1e3
    return results


def format_timings(timings: dict[str, float], budget_ms: float = 16.667) -> str:
    lines = [f"{'pass':24s} {'ms':>9s}   budget {budget_ms:.3f} ms"]
    for name, ms in timings.items():
        flag = "" if ms < budget_ms else "  <-- over budget"
        lines.append(f"{name:24s} {ms:9.3f}{flag}")
    return "\n".join(lines)
