"""Multi-chip SPMD rendering: pixel-band sharding over a device mesh.

The reference is a single-GPU renderer; its parallelism inventory maps to
TPU as laid out in SURVEY.md §2.11: the framebuffer is data-parallel over
pixels, so we shard every screen-space tensor by ROWS over a 1-D
``jax.sharding.Mesh`` axis ("px") with ``shard_map``, replicate the scene
arrays, and let the few cross-band exchanges ride ICI as XLA collectives:

  * each device rasterizes + shades its own horizontal band (no comm);
  * the sun shadow map is rasterized in bands and ``all_gather``-ed so any
    band can sample anywhere (rendering/passes/shadow.py);
  * post passes run band-local (TODO: halo exchange via ppermute for the
    bloom pyramid / wide blurs; seams are bounded by kernel radius).

Scaling knobs beyond DP (ray-batch sharding for the RT passes, probe-batch
sharding for DDGI) plug into the same mesh when those passes land.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from arkoserenderer_tpu.models.standard import make_forward_pipeline
from arkoserenderer_tpu.rendering.pipeline import PipelineConfig
from arkoserenderer_tpu.scene.camera import Camera
from arkoserenderer_tpu.scene.scene import Scene

AXIS = "px"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (AXIS,))


def band_config(cfg: PipelineConfig, n_devices: int) -> PipelineConfig:
    """Full-frame config -> per-device band config."""
    assert cfg.height % n_devices == 0, "frame height must split evenly"
    band_h = cfg.height // n_devices
    assert band_h % cfg.raster.tile_h == 0, "band height must tile evenly"
    assert cfg.shadow_map_size % n_devices == 0
    return dataclasses.replace(
        cfg,
        height=band_h,
        full_height=cfg.height,
        shard_axis=AXIS,
        shard_count=n_devices,
    )


class ShardedRenderer:
    """Renderer running one frame as a shard_map over a pixel-band mesh.

    Persistent state (TAA history, ...) lives row-sharded across devices and
    is donated every frame; the LDR output comes back row-sharded and is
    gathered lazily on host read.
    """

    def __init__(
        self,
        scene: Scene,
        camera: Camera,
        cfg: PipelineConfig,
        n_devices: int | None = None,
        **pipeline_kw,
    ):
        self.mesh = make_mesh(n_devices)
        n = self.mesh.devices.size
        cfg = dataclasses.replace(cfg, scene=scene.static_info())
        self.cfg = cfg
        self.band_cfg = band_config(cfg, n)
        self.pipeline = make_forward_pipeline(self.band_cfg, **pipeline_kw)
        self.scene = scene
        self.camera = camera
        self.scene_arrays = scene.build()
        self.persistent = list(self.pipeline.registry.persistent_names)

        pipe = self.pipeline

        def step(state, scene_arrays, cam_state, frame_index, delta_time):
            out = pipe.frame_fn(state, scene_arrays, cam_state, frame_index, delta_time)
            keep = {k: out[k] for k in self.persistent}
            keep["LDR"] = out["LDR"]
            return keep

        shard = P(AXIS)   # row-sharded screen tensors
        repl = P()        # replicated everything else
        self._step = jax.jit(
            jax.shard_map(
                step,
                mesh=self.mesh,
                in_specs=(shard, repl, repl, repl, repl),
                out_specs=shard,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )

        # Band-sharded initial persistent state: full-frame clears sharded
        # over rows via device_put.
        full_reg_state = {}
        for name in self.persistent:
            desc = pipe.registry._resources[name]
            full_shape = (cfg.height,) + tuple(desc.shape[1:])
            full_reg_state[name] = np.full(full_shape, desc.clear, desc.dtype)
        self.state = jax.device_put(
            full_reg_state,
            jax.sharding.NamedSharding(self.mesh, P(AXIS)),
        )
        self.frame_index = 0
        self._ldr = None

    def render_frame(self):
        cam_state = self.camera.state(self.frame_index)
        out = self._step(
            self.state,
            self.scene_arrays,
            cam_state,
            jnp.asarray(self.frame_index, jnp.int32),
            jnp.asarray(1 / 60, jnp.float32),
        )
        self._ldr = out.pop("LDR")
        self.state = out
        self.camera.post_render()
        self.frame_index += 1
        return self._ldr
