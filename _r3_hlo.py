"""Round-3 profile step 1: static analysis of the optimized 1080p forward
frame HLO. Counts gather/scatter/sort ops, attributes them to passes via
named_scope op_name metadata, and reports duplication (same source gather
appearing in multiple fusions) — the prime suspect for the in-frame
gather anomaly (METRICS.md: gathers ~20x slower in-frame than standalone).
Pure compile-side: no timing noise.
"""
import collections
import re
import sys

import jax
import jax.numpy as jnp


def main():
    from arkoserenderer_tpu.assets.procedural import build_test_scene
    from arkoserenderer_tpu.models.standard import Renderer
    sys.path.insert(0, "/root/repo")
    from bench import _cfg

    cfg = _cfg(small=False)
    scene, camera = build_test_scene(viewport=(cfg.width, cfg.height))
    renderer = Renderer(scene, camera, cfg)

    fn = renderer.pipeline.compile()
    persistent = renderer.pipeline.registry.persistent_names
    inputs = {k: renderer.state[k] for k in persistent if k in renderer.state}
    if "scene.version" in persistent:
        inputs["scene.version"] = jnp.asarray(0, jnp.int32)
    cam_state = camera.state(0)
    lowered = fn.lower(
        inputs, renderer.scene_arrays, cam_state,
        jnp.asarray(0, jnp.int32), jnp.asarray(1 / 60, jnp.float32),
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/r3_forward_opt.hlo", "w") as f:
        f.write(txt)
    print(f"optimized HLO: {len(txt)} bytes -> /tmp/r3_forward_opt.hlo")

    # --- parse ---------------------------------------------------------
    # Count op kinds inside fusion computations and at top level.
    op_pat = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\]{},*\/ ]+\s+"
                        r"(gather|scatter|sort|dynamic-slice|dynamic-update-slice|"
                        r"all-gather|all-reduce|convert|dot|while|custom-call)\(",
                        re.M)
    meta_pat = re.compile(r'op_name="([^"]*)"')

    kind_counts = collections.Counter()
    gather_by_pass = collections.Counter()
    gather_srcloc = collections.Counter()
    gather_bytes_by_pass = collections.Counter()
    shape_pat = re.compile(r"=\s*(\w+)\[([\d,]*)\]")

    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
                   "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

    for line in txt.splitlines():
        m = op_pat.search(line)
        if not m:
            continue
        kind = m.group(1)
        kind_counts[kind] += 1
        if kind in ("gather", "sort", "scatter", "while"):
            mm = meta_pat.search(line)
            name = mm.group(1) if mm else "?"
            # pass name = first named_scope component after jit(frame_fn)
            parts = name.split("/")
            pas = parts[1] if len(parts) > 1 else name
            key = f"{kind}:{pas}"
            gather_by_pass[key] += 1
            sm = shape_pat.search(line)
            if sm and kind == "gather":
                dt, dims = sm.group(1), sm.group(2)
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                gather_bytes_by_pass[pas] += n * dtype_bytes.get(dt, 4)
            # source-location fingerprint for duplication detection
            sl = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
            if sl and kind == "gather":
                gather_srcloc[(sl.group(1).split("/")[-1], sl.group(2))] += 1

    print("\n== op kind counts (optimized) ==")
    for k, v in kind_counts.most_common():
        print(f"  {k:24s} {v}")
    print("\n== gathers/sorts/scatters/whiles by pass ==")
    for k, v in sorted(gather_by_pass.items()):
        print(f"  {k:40s} {v}")
    print("\n== gather OUTPUT bytes by pass (MB) ==")
    for k, v in sorted(gather_bytes_by_pass.items(), key=lambda x: -x[1]):
        print(f"  {k:30s} {v/1e6:9.2f}")
    print("\n== duplicated gathers (same source line in >1 op) ==")
    for (f_, l_), c in sorted(gather_srcloc.items(), key=lambda x: -x[1]):
        if c > 1:
            print(f"  {f_}:{l_}  x{c}")

    ca = compiled.cost_analysis()
    if ca:
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        keys = ["flops", "bytes accessed", "transcendentals",
                "bytes accessed output", "optimal_seconds"]
        print("\n== cost analysis ==")
        for k in keys:
            if k in d:
                print(f"  {k}: {d[k]:.4g}")

    mem = compiled.memory_analysis()
    if mem:
        print("\n== memory analysis ==")
        for attr in ("argument_size_in_bytes", "output_size_in_bytes",
                     "temp_size_in_bytes", "generated_code_size_in_bytes"):
            try:
                print(f"  {attr}: {getattr(mem, attr)/1e6:.2f} MB")
            except Exception:
                pass


if __name__ == "__main__":
    main()
