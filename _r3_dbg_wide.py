import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from arkoserenderer_tpu.ops import bvh as B

rng = np.random.default_rng(0)

# two blas geos: a quad floor and a small box of tris
def quad(y):
    v = np.array([[-1,y,-1],[1,y,-1],[1,y,1],[-1,y,1]], np.float32)
    t = np.array([[0,1,2],[0,2,3]], np.int32)
    return v, t

def blob(n=20):
    v = rng.uniform(-0.5, 0.5, (n*3,3)).astype(np.float32)
    t = np.arange(n*3, dtype=np.int32).reshape(n,3)
    return v, t

geos = [quad(0.0), blob()]
inst_blas = np.array([0,1,1], np.int32)
o2w = np.stack([np.eye(4,dtype=np.float32)]*3)
o2w[1][:3,3] = [0,1,0]
o2w[2][:3,3] = [2,1,0]
base = np.array([0, 2, 2+20], np.int32)  # global tri base per instance
bvh = B.build_two_level(geos, inst_blas, o2w, base)
print("wide meta:\n", np.asarray(bvh.wide_meta))
print("wide src:\n", np.asarray(bvh.wide_src))
print("root blas:", np.asarray(bvh.wide_root_blas))
print("count:", np.asarray(bvh.count))
print("left:", np.asarray(bvh.left))

origins = rng.uniform(-2, 3, (256, 3)).astype(np.float32)
origins[:, 1] = 3.0
dirs = np.tile(np.array([[0.01, -1.0, 0.02]], np.float32), (256, 1))

hit_w = B.trace_rays(bvh, jnp.asarray(origins), jnp.asarray(dirs))
bvh_bin = bvh.__class__(**{**{f: getattr(bvh, f) for f in bvh.__dataclass_fields__}, "wide_meta": None})
hit_b = B.trace_rays(bvh_bin, jnp.asarray(origins), jnp.asarray(dirs))
hw = np.asarray(hit_w.hit); hb = np.asarray(hit_b.hit)
print("wide hits:", hw.sum(), "binary hits:", hb.sum())
bad = hw != hb
print("mismatches:", bad.sum())
if bad.any():
    i = np.nonzero(bad)[0][0]
    print("ray", i, origins[i], dirs[i], "wide", hw[i], np.asarray(hit_w.tri)[i],
          "bin", hb[i], np.asarray(hit_b.tri)[i])
tw = np.asarray(hit_w.tri); tb = np.asarray(hit_b.tri)
both = hw & hb
print("tri agree:", (tw[both] == tb[both]).mean() if both.any() else None)
