"""Variant A: always push non-empty children (ignore slab) -> isolates
whether the expand/prune path or the leaf/stack path is buggy."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import opengl_raytracer_tpu.ops.pallas_traversal as PT
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.traversal import raycast_bvh
from opengl_raytracer_tpu.ops.wide_bvh import EMPTY_ENTRY
from opengl_raytracer_tpu.ops.intersect import BIG, EPS
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

PUSH_ALL = os.environ.get('PUSH_ALL', '1') == '1'

def kernel(ox, oy, oz, dx, dy, dz, t0, pw_tiles, pw_entry, tri_tiles,
           t_out, slot_out, stack, *, leaf_octets):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    inv_x, inv_y, inv_z = 1.0/d_x, 1.0/d_y, 1.0/d_z
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8,128), 0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8,1), 0)
    def one_hot(tile, k):
        sel = tile[:, 0:16]*0.0
        for kk in range(8):
            sel = sel + jnp.where(k==kk, tile[:, kk*16:(kk+1)*16], 0.0)
        return sel
    stack[0] = jnp.int32(0)
    def cond(c): return c[0] > 0
    def body(c):
        sp, bt, bslot = c
        sp = sp - 1
        e = stack[sp]
        is_node = e >= 0
        def expand(args):
            bt, bslot, sp = args
            cb = one_hot(pw_tiles[e // 8], e % 8)
            bminx, bminy, bminz = cb[:,0:1], cb[:,1:2], cb[:,2:3]
            bmaxx, bmaxy, bmaxz = cb[:,3:4], cb[:,4:5], cb[:,5:6]
            acc = jnp.zeros((8,128), dtype=jnp.bool_)
            for p in range(8):
                r_ox, r_oy, r_oz = o_x[p:p+1,:], o_y[p:p+1,:], o_z[p:p+1,:]
                r_ix, r_iy, r_iz = inv_x[p:p+1,:], inv_y[p:p+1,:], inv_z[p:p+1,:]
                t1x = (bminx - r_ox)*r_ix; t2x = (bmaxx - r_ox)*r_ix
                t1y = (bminy - r_oy)*r_iy; t2y = (bmaxy - r_oy)*r_iy
                t1z = (bminz - r_oz)*r_iz; t2z = (bmaxz - r_oz)*r_iz
                near = jnp.maximum(jnp.maximum(jnp.minimum(t1x,t2x), jnp.minimum(t1y,t2y)), jnp.minimum(t1z,t2z))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t1x,t2x), jnp.maximum(t1y,t2y)), jnp.maximum(t1z,t2z))
                hit = (far >= near) & (far >= 0.0)
                te = jnp.where(hit, jnp.maximum(near, 0.0), -1.0)
                acc = acc | hit  # no best-t prune
            sub2 = jax.lax.broadcasted_iota(jnp.int32, (8,128), 0)
            bits = jnp.int32(0)
            for j in range(8):
                hj = jnp.any(acc & (sub2 == j))
                bits = bits | (hj.astype(jnp.int32) << j)
            ent = pw_entry[e]
            for j in range(8):
                push = (((bits >> j) & 1) != 0) & (ent[j] != EMPTY_ENTRY)
                @pl.when(push & (sp < PT.STACK_SIZE))
                def _():
                    stack[sp] = ent[j]
                sp = sp + push.astype(jnp.int32)
            return bt, bslot, sp
        def leaf(args):
            bt, bslot, sp = args
            first_octet = -e - 1
            for oct_i in range(leaf_octets):
                o_idx = first_octet + oct_i
                sel = one_hot(tri_tiles[o_idx // 8], o_idx % 8)
                v0x, v0y, v0z = sel[:,0:1], sel[:,1:2], sel[:,2:3]
                e1x, e1y, e1z = sel[:,3:4], sel[:,4:5], sel[:,5:6]
                e2x, e2y, e2z = sel[:,6:7], sel[:,7:8], sel[:,8:9]
                fx, fy, fz = sel[:,9:10], sel[:,10:11], sel[:,11:12]
                slot_vec = (first_octet + oct_i)*8 + sub_iota
                for p in range(8):
                    r_ox, r_oy, r_oz = o_x[p:p+1,:], o_y[p:p+1,:], o_z[p:p+1,:]
                    r_dx, r_dy, r_dz = d_x[p:p+1,:], d_y[p:p+1,:], d_z[p:p+1,:]
                    det = r_dx*fx + r_dy*fy + r_dz*fz
                    inv_det = 1.0/det
                    rx, ry, rz = r_ox-v0x, r_oy-v0y, r_oz-v0z
                    t = -(rx*fx + ry*fy + rz*fz)*inv_det
                    px = ry*r_dz - rz*r_dy
                    py = rz*r_dx - rx*r_dz
                    pz = rx*r_dy - ry*r_dx
                    u = -(e2x*px + e2y*py + e2z*pz)*inv_det
                    vv = (e1x*px + e1y*py + e1z*pz)*inv_det
                    valid = ((jnp.abs(det)>=EPS)&(t>EPS)&(u>=0.0)&(vv>=0.0)&((u+vv)<=1.0))
                    tcand = jnp.where(valid, t, BIG)
                    tmin = jnp.min(tcand, axis=0, keepdims=True)
                    smin = jnp.min(jnp.where(tcand==tmin, slot_vec, np.int32(2**31-1)), axis=0, keepdims=True)
                    brow = bt[p:p+1,:]
                    better = tmin < brow
                    upd = (row_ids == p) & better
                    bt = jnp.where(upd, tmin, bt)
                    bslot = jnp.where(upd, smin, bslot)
            return bt, bslot, sp
        bt, bslot, sp = jax.lax.cond(is_node, expand, leaf, (bt, bslot, sp))
        return sp, bt, bslot
    _, bt, bslot = jax.lax.while_loop(cond, body, (jnp.int32(1), t0[:], jnp.zeros((8,128), jnp.int32)))
    t_out[:] = bt
    slot_out[:] = bslot

sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=32, bvh_method='sah')
data = sc.send()
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(512, 288, cam)
R = 4096
o, d = o[:R], d[:R]
def prep(x): return x.reshape(R//128, 128)
ox,oy,oz = (prep(o[:,i]) for i in range(3))
dx,dy,dz = (prep(d[:,i]) for i in range(3))
t0 = prep(jnp.full((R,), BIG, jnp.float32))
WT = data.pw_tiles.shape[0]; W = data.pw_entry.shape[0]; G = data.pl_tri_tiles.shape[0]
ray_spec = pl.BlockSpec((8,128), lambda i:(i,0), memory_space=pltpu.VMEM)
t, slot = pl.pallas_call(
    partial(kernel, leaf_octets=4),
    grid=(R//1024,),
    in_specs=[ray_spec]*7 + [
        pl.BlockSpec((WT,8,128), lambda i:(0,0,0), memory_space=pltpu.VMEM),
        pl.BlockSpec((W,8), lambda i:(0,0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G,8,128), lambda i:(0,0,0), memory_space=pltpu.VMEM)],
    out_specs=[ray_spec]*2,
    out_shape=[jax.ShapeDtypeStruct((R//128,128), jnp.float32),
               jax.ShapeDtypeStruct((R//128,128), jnp.int32)],
    scratch_shapes=[pltpu.SMEM((PT.STACK_SIZE,), jnp.int32)],
)(ox,oy,oz,dx,dy,dz,t0, data.pw_tiles, data.pw_entry, data.pl_tri_tiles)
tp = np.asarray(t).reshape(-1)
nv = raycast_bvh(data, o, d, max_leaf_tris=32)
tv = np.asarray(nv.t)
bad = np.nonzero(np.abs(tv - tp) > 1e-3)[0]
print('PRUNED(hit-only) variant bad rays:', len(bad), 'of', R)
for i in bad[:5]:
    print(f'  ray {i}: xla t={tv[i]:.4f}  pallas t={tp[i]:.4f}')
