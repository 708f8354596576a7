"""Instrumented pallas kernel: count node visits and leaf visits per block."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.intersect import BIG, EPS
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas, _SUB, _LANE, BLOCK
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.traversal import raycast_packet  # noqa
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

def count_kernel(ox, oy, oz, dx, dy, dz, t0, geom, meta, cnt_out, *, n_nodes):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    inv_x, inv_y, inv_z = 1.0/dx[:], 1.0/dy[:], 1.0/dz[:]
    bt = t0[:]
    def cond(c): return c[0] < n_nodes
    def body(c):
        node, nv, lv = c
        g = geom[node]
        t1x=(g[0]-o_x)*inv_x; t2x=(g[3]-o_x)*inv_x
        t1y=(g[1]-o_y)*inv_y; t2y=(g[4]-o_y)*inv_y
        t1z=(g[2]-o_z)*inv_z; t2z=(g[5]-o_z)*inv_z
        near=jnp.maximum(jnp.maximum(jnp.minimum(t1x,t2x),jnp.minimum(t1y,t2y)),jnp.minimum(t1z,t2z))
        far=jnp.minimum(jnp.minimum(jnp.maximum(t1x,t2x),jnp.maximum(t1y,t2y)),jnp.maximum(t1z,t2z))
        hit=(far>=near)&(far>=0.0)
        te=jnp.where(hit,jnp.maximum(near,0.0),-1.0)
        ro=hit&(te<=bt)
        any_open=jnp.any(ro)
        m = meta[node]
        is_leaf = m[2] > 0
        lv = lv + jnp.where(any_open & is_leaf, 1, 0)
        node = jnp.where(any_open & ~is_leaf, node+1, m[0])
        return node, nv+1, lv
    _, nv, lv = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    cnt_out[:] = jnp.where(ids == 0, nv, jnp.where(ids == 1, lv, 0))

def count_stats(data, o, d, label):
    R = o.shape[0]; Rp = ((R + BLOCK - 1)//BLOCK)*BLOCK
    def prep(x):
        if Rp != R: x = jnp.concatenate([x, jnp.zeros((Rp-R,), x.dtype)])
        return x.reshape(Rp//_LANE, _LANE)
    ox,oy,oz = (prep(o[:,i]) for i in range(3))
    dx,dy,dz = (prep(d[:,i]) for i in range(3))
    t0 = prep(jnp.concatenate([jnp.full((R,), BIG, jnp.float32), jnp.full((Rp-R,), -BIG, jnp.float32)]) if Rp!=R else jnp.full((R,), BIG, jnp.float32))
    N = data.pl_geom.shape[0]
    grid = Rp // BLOCK
    ray_spec = pl.BlockSpec((_SUB,_LANE), lambda i:(i,0), memory_space=pltpu.VMEM)
    cnts = pl.pallas_call(
        partial(count_kernel, n_nodes=N),
        grid=(grid,),
        in_specs=[ray_spec]*7 + [pl.BlockSpec((N,8), lambda i:(0,0), memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec((8,_LANE), lambda i:(i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid*8,_LANE), jnp.int32),
    )(ox,oy,oz,dx,dy,dz,t0, data.pl_geom, data.pl_meta)
    nv = np.asarray(cnts[::8,0]); lv = np.asarray(cnts[::8,1])
    print(f'{label}: blocks={grid} node-visits mean={nv.mean():.0f} max={nv.max()} leaf-visits mean={lv.mean():.0f} max={lv.max()} total-iters={nv.sum()}')

leaf = 32
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
data = sc.send()
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(512, 288, cam)
count_stats(data, o, d, 'primary')

near = raycast_pallas(data, o, d, max_leaf_tris=leaf)
hit = finalize_hit(data, o, d, near)
seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]), jnp.zeros(o.shape[0], jnp.int32), 0))
_, nd = scatter(seed, hit.normal, d, hit.roughness, True)
o2 = jnp.where(hit.did_hit[:,None], hit.point + hit.normal*1e-4, o)
d2 = jnp.where(hit.did_hit[:,None], nd, d)
count_stats(data, o2, d2, 'bounce unsorted')
lo, hi = data.node_min[0], data.node_max[0]
perm = jnp.argsort(ray_sort_keys(o2, d2, lo, hi))
count_stats(data, o2[perm], d2[perm], 'bounce sorted')

# Time the count-only kernel (node stepping, no leaf work) to isolate
# per-iteration overhead.
import time as _time
def time_counts(data, o, d, label):
    R = o.shape[0]; Rp = ((R + BLOCK - 1)//BLOCK)*BLOCK
    def prep(x):
        if Rp != R: x = jnp.concatenate([x, jnp.zeros((Rp-R,), x.dtype)])
        return x.reshape(Rp//_LANE, _LANE)
    ox,oy,oz = (prep(o[:,i]) for i in range(3))
    dx,dy,dz = (prep(d[:,i]) for i in range(3))
    t0v = prep(jnp.full((R,), BIG, jnp.float32))
    N = data.pl_geom.shape[0]
    grid = Rp // BLOCK
    ray_spec = pl.BlockSpec((_SUB,_LANE), lambda i:(i,0), memory_space=pltpu.VMEM)
    f = jax.jit(lambda: pl.pallas_call(
        partial(count_kernel, n_nodes=N),
        grid=(grid,),
        in_specs=[ray_spec]*7 + [pl.BlockSpec((N,8), lambda i:(0,0), memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec((8,_LANE), lambda i:(i,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid*8,_LANE), jnp.int32),
    )(ox,oy,oz,dx,dy,dz,t0v, data.pl_geom, data.pl_meta))
    r = f(); _ = int(r[0,0])
    best=1e9
    for _i in range(4):
        t0=_time.time(); r=f(); _=int(r[0,0]); best=min(best,_time.time()-t0)
    tot = int(np.asarray(r[::8,0]).sum())
    print(f'{label}: {best*1000:.1f} ms for {tot} node-step iterations -> {best/tot*1e9:.0f} ns/iter')

time_counts(data, o, d, 'count-only primary')
time_counts(data, o2, d2, 'count-only bounce-unsorted')
time_counts(data, o2[perm], d2[perm], 'count-only bounce-sorted')
