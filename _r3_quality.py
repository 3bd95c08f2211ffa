"""Quality-knob A/B at 1080p forward, one variant per process:
python _r3_quality.py <variant>
Variants flip knobs that existed only to dodge (phantom) gather costs."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _cfg
from arkoserenderer_tpu.assets.procedural import build_test_scene
from arkoserenderer_tpu.models.standard import Renderer

variant = sys.argv[1]
cfg = _cfg(small=False)
kw = {}
repl = {}
if variant == "default":
    pass
elif variant == "trilinear":
    repl["texture_quality"] = "trilinear"
elif variant == "bilin_shadow":
    repl["shadow_filter"] = "bilinear"
elif variant == "sky_full":
    repl["sky_fetch_scale"] = 1
elif variant == "catmull_taa":
    repl["taa_filter"] = "catmull"
elif variant == "all_quality":
    repl.update(texture_quality="trilinear", shadow_filter="bilinear",
                sky_fetch_scale=1, taa_filter="catmull")
else:
    raise SystemExit("unknown variant")
cfg = dataclasses.replace(cfg, **repl)

scene, camera = build_test_scene(viewport=(cfg.width, cfg.height))
r = Renderer(scene, camera, cfg, **kw)
for _ in range(3):
    jax.block_until_ready(r.render_frame())
t0 = time.perf_counter()
for _ in range(10):
    out = r.render_frame()
jax.block_until_ready(out)
ms = (time.perf_counter() - t0) / 10 * 1e3
print(f"{variant:16s} {ms:7.3f} ms/frame", flush=True)
