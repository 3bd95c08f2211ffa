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
origins, dirs = random_rays(rng, 512)
i = 2
o0 = origins[i]; d0 = dirs[i]

wm = np.asarray(bvh.wide_meta); ws = np.asarray(bvh.wide_src)
wcb = np.asarray(bvh.wide_cbounds); wrb = np.asarray(bvh.wide_root_blas)
w2o = np.asarray(bvh.inst_w2o)
tq = np.asarray(bvh.tri_quad); torder = np.asarray(bvh.tri_order)
itb = np.asarray(bvh.inst_tri_base)

def tri_hit(v0, e1, e2, o, d, eps=1e-4):
    p = np.cross(d, e2); det = np.dot(e1, p)
    if abs(det) < 1e-12: return None
    inv = 1.0/det; tv = o - v0
    u = np.dot(tv, p)*inv
    q = np.cross(tv, e1)
    v = np.dot(d, q)*inv
    t = np.dot(e2, q)*inv
    if u < -1e-6 or v < -1e-6 or u+v > 1+1e-6 or t < eps: return None
    return t, u, v

def aabb(lo, hi, o, invd, tmax):
    t0 = (lo-o)*invd; t1 = (hi-o)*invd
    tn = np.minimum(t0, t1).max(); tf = np.maximum(t0, t1).min()
    tf = min(tf, tmax)
    if tn <= tf + 1e-6 and tf >= 0: return tn
    return None

# emulate
stack = [0]; cur_inst = -1; base_sp = 0
best_t = 1e30; best_tri = -1
step = 0
while stack and step < 2000:
    step += 1
    top = len(stack)-1
    if top < base_sp:
        cur_inst = -1; base_sp = 0
    desc = stack.pop()
    m = w2o[cur_inst+1]
    o = m[:, :3] @ o0 + m[:, 3]
    d = m[:, :3] @ d0
    invd = 1.0/np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    if desc >= 0:
        cb = wcb[desc]; meta = wm[desc]
        hits = []
        for k in range(8):
            lo = cb[6*k:6*k+3]; hi = cb[6*k+3:6*k+6]
            tn = aabb(lo, hi, o, invd, best_t)
            if tn is not None:
                hits.append((tn, meta[k]))
        hits.sort(key=lambda x: -x[0])
        for tn, dd in hits:
            stack.append(dd)
    else:
        e = -desc - 1; kind = e >> 28; payload = e & 0x0FFFFFFF
        if kind == 0:
            qrow = payload >> 3; qc = payload & 7
            quad = tq[qrow]
            for k in range(qc):
                v0 = quad[9*k:9*k+3]; e1 = quad[9*k+3:9*k+6]; e2 = quad[9*k+6:9*k+9]
                r = tri_hit(v0, e1, e2, o, d)
                if r and r[0] < best_t:
                    best_t = r[0]
                    gtri = itb[max(cur_inst,0)] + torder[qrow*4+k]
                    best_tri = gtri
        else:
            stack.append(wrb[payload])
            cur_inst = payload
            base_sp = len(stack)-1
print("emulated: tri", best_tri, "t", best_t, "steps", step)

# brute force says tri 141, instance 4. Check: does emulator enter inst 4?
# rerun with logging of instance entries
stack = [0]; cur_inst = -1; base_sp = 0
best_t = 1e30; best_tri = -1
entered = []
step = 0
while stack and step < 2000:
    step += 1
    top = len(stack)-1
    if top < base_sp:
        cur_inst = -1; base_sp = 0
    desc = stack.pop()
    m = w2o[cur_inst+1]
    o = m[:, :3] @ o0 + m[:, 3]
    d = m[:, :3] @ d0
    invd = 1.0/np.where(np.abs(d) < 1e-12, np.where(d < 0, -1e-12, 1e-12), d)
    if desc >= 0:
        cb = wcb[desc]; meta = wm[desc]
        for k in range(8):
            lo = cb[6*k:6*k+3]; hi = cb[6*k+3:6*k+6]
            tn = aabb(lo, hi, o, invd, best_t)
            if tn is not None:
                stack.append(meta[k])
    else:
        e = -desc - 1; kind = e >> 28; payload = e & 0x0FFFFFFF
        if kind == 0:
            qrow = payload >> 3; qc = payload & 7
            quad = tq[qrow]
            for k in range(qc):
                v0 = quad[9*k:9*k+3]; e1 = quad[9*k+3:9*k+6]; e2 = quad[9*k+6:9*k+9]
                r = tri_hit(v0, e1, e2, o, d)
                if r and r[0] < best_t:
                    best_t = r[0]
                    best_tri = itb[max(cur_inst,0)] + torder[qrow*4+k]
        else:
            entered.append(payload)
            stack.append(wrb[payload])
            cur_inst = payload
            base_sp = len(stack)-1
print("unordered emulate: tri", best_tri, "t", best_t, "entered instances", entered)
