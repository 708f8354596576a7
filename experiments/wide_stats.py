"""Count expand vs leaf iterations in the wide kernel (bounce rays)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas, STACK_SIZE
from opengl_raytracer_tpu.ops.wide_bvh import EMPTY_ENTRY
from opengl_raytracer_tpu.ops.intersect import BIG, finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

leaf = 32
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(1920, 1080, cam)
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
data = sc.send()
lo, hi = data.node_min[0], data.node_max[0]

near = raycast_pallas(data, o, d, max_leaf_tris=leaf)
hit = finalize_hit(data, o, d, near)
seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]) % 1920, jnp.arange(o.shape[0]) // 1920, 0))
_, nd = scatter(seed, hit.normal, d, hit.roughness, True)
o2 = jnp.where(hit.did_hit[:,None], hit.point + hit.normal*1e-4, o)
d2 = jnp.where(hit.did_hit[:,None], nd, d)
perm = jnp.argsort(ray_sort_keys(o2, d2, lo, hi))
o2s, d2s = jax.block_until_ready((o2[perm], d2[perm]))

def count_kernel(ox, oy, oz, dx, dy, dz, t0, pw_tiles, pw_entry_ord, pw_slot_ord,
                 cnt_out, stack):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    inv_x, inv_y, inv_z = 1.0/d_x, 1.0/d_y, 1.0/d_z
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8,1), 0)
    bt = t0[:]
    octant = (((jnp.sum(d_x) < 0.0).astype(jnp.int32) << 2)
              | ((jnp.sum(d_y) < 0.0).astype(jnp.int32) << 1)
              | (jnp.sum(d_z) < 0.0).astype(jnp.int32))
    def one_hot(tile, k):
        sel = tile[:, 0:16]*0.0
        for kk in range(8):
            sel = sel + jnp.where(k==kk, tile[:, kk*16:(kk+1)*16], 0.0)
        return sel
    stack[0] = jnp.int32(0)
    def cond(c): return c[0] > 0
    def body(c):
        sp, ne, nl = c
        sp = sp - 1
        e = stack[sp]
        is_node = e >= 0
        def expand(args):
            ne, nl, sp = args
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
                nr = jnp.maximum(jnp.maximum(jnp.minimum(t1x,t2x), jnp.minimum(t1y,t2y)), jnp.minimum(t1z,t2z))
                fr = jnp.minimum(jnp.minimum(jnp.maximum(t1x,t2x), jnp.maximum(t1y,t2y)), jnp.maximum(t1z,t2z))
                h = (fr >= nr) & (fr >= 0.0)
                te = jnp.where(h, jnp.maximum(nr, 0.0), -1.0)
                acc = acc | (h & (te <= bt[p:p+1,:]))
            ca = jnp.any(acc, axis=1, keepdims=True)
            bits = jnp.sum(jnp.where(ca, jnp.int32(1) << sub_iota, 0))
            ent_o = pw_entry_ord[octant, e]
            slot_o = pw_slot_ord[octant, e]
            for i in range(8):
                j = slot_o[i]
                push = (((bits >> j) & 1) != 0) & (ent_o[i] != EMPTY_ENTRY)
                @pl.when(push & (sp < STACK_SIZE))
                def _():
                    stack[sp] = ent_o[i]
                sp = sp + push.astype(jnp.int32)
            return ne + 1, nl, sp
        def leafp(args):
            ne, nl, sp = args
            return ne, nl + 1, sp
        ne, nl, sp = jax.lax.cond(is_node, expand, leafp, (ne, nl, sp))
        return sp, ne, nl
    _, ne, nl = jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0), jnp.int32(0)))
    ids = jax.lax.broadcasted_iota(jnp.int32, (8,128), 1)
    cnt_out[:] = jnp.where(ids == 0, ne, jnp.where(ids == 1, nl, 0))

def stats(o, d, label):
    R = o.shape[0]
    def prep(x): return x.reshape(R//128, 128)
    ox,oy,oz = (prep(o[:,i]) for i in range(3))
    dx,dy,dz = (prep(d[:,i]) for i in range(3))
    t0 = prep(jnp.full((R,), BIG, jnp.float32))
    WT = data.pw_tiles.shape[0]; W = data.pw_entry.shape[0]
    grid = R // 1024
    ray_spec = pl.BlockSpec((8,128), lambda i:(i,0), memory_space=pltpu.VMEM)
    f = jax.jit(lambda: pl.pallas_call(
        count_kernel,
        grid=(grid,),
        in_specs=[ray_spec]*7 + [
            pl.BlockSpec((WT,8,128), lambda i:(0,0,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8,W,8), lambda i:(0,0,0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8,W,8), lambda i:(0,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8,128), lambda i:(i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid*8,128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK_SIZE,), jnp.int32)],
    )(ox, oy, oz, dx, dy, dz, t0, data.pw_tiles, data.pw_entry_ord,
      data.pw_slot_ord))
    r = f(); _ = int(r[0,0])
    best = 1e9
    for _i in range(3):
        t0_=time.time(); r=f(); _=int(r[0,0]); best=min(best,time.time()-t0_)
    ne = np.asarray(r[::8,0]); nl = np.asarray(r[::8,1])
    tot = int(ne.sum()+nl.sum())
    print(f'{label}: expand mean={ne.mean():.0f} max={ne.max()}, leaf mean={nl.mean():.0f} max={nl.max()}; '
          f'count-only time {best*1000:.0f} ms, {(best)/tot*1e9:.0f} ns/iter ({tot} iters)')

stats(o, d, 'primary 2M')
stats(o2s, d2s, 'bounce sorted 2M')
