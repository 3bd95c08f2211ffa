"""Bisect stress-config poisoning: probe after build, after construct,
after first frame, after animate+frame."""
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


def lat(label, n=4):
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jb(a, b))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:34s} " + " ".join(f"{t:6.2f}" for t in ts), flush=True)


jax.block_until_ready(jb(a, b))
lat("baseline")

from bench import _cfg
from arkoserenderer_tpu.assets.procedural import animate_stress_scene, build_stress_scene
from arkoserenderer_tpu.models.standard import Renderer

cfg = _cfg(small=False)
scene, camera = build_stress_scene(n_instances=4096, viewport=(cfg.width, cfg.height))
lat("after build_stress_scene")

renderer = Renderer(scene, camera, cfg, dynamic_transforms=True)
lat("after Renderer construct")

jax.block_until_ready(renderer.render_frame())
lat("after first frame")

animate_stress_scene(scene, 1 / 60)
jax.block_until_ready(renderer.render_frame())
lat("after animate+frame")
