import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo/tests")
from arkoserenderer_tpu.ops import bvh as B
from test_bvh import _two_level_fixture, _world_pool, random_rays

rng = np.random.default_rng(1234)
bvh, geos, inst_blas, o2w, tris = _two_level_fixture(rng)
verts = _world_pool(geos, inst_blas, o2w)
origins, dirs = random_rays(rng, 512)
hit = B.trace_rays(bvh, jnp.asarray(origins), jnp.asarray(dirs))
ref_t, ref_tri = B.trace_rays_brute(verts, tris, np.ones(len(tris), bool), origins, dirs)
got = np.asarray(hit.tri)
bad = (got >= 0) != (ref_tri >= 0)
print("mismatches:", bad.sum(), "of", len(bad))

# Compare against the binary path too
import dataclasses
bvh_bin = dataclasses.replace(bvh, wide_meta=None)
hb = B.trace_rays(bvh_bin, jnp.asarray(origins), jnp.asarray(dirs))
gb = np.asarray(hb.tri)
print("binary vs brute mismatches:", ((gb >= 0) != (ref_tri >= 0)).sum())
print("wide vs binary mismatches:", ((got >= 0) != (gb >= 0)).sum())

if bad.any():
    idxs = np.nonzero(bad)[0]
    print("first bad rays:", idxs[:5])
    i = int(idxs[0])
    print("ray", origins[i], dirs[i], "wide tri", got[i], "ref tri", ref_tri[i], "ref t", ref_t[i])
    # retrace single ray with huge max_steps / deeper stack
    h2 = B.trace_rays(bvh, jnp.asarray(origins[i:i+1]), jnp.asarray(dirs[i:i+1]), max_steps=20000)
    print("single-ray wide retrace tri:", np.asarray(h2.tri))
    # which instance holds ref tri?
    tb = None
    base = 0
    for k in range(len(inst_blas)):
        ntri = len(geos[inst_blas[k]][1])
        if base <= ref_tri[i] < base + ntri:
            print("ref tri in instance", k, "blas", inst_blas[k], "local tri", ref_tri[i]-base)
        base += ntri
