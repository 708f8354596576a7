"""Profile bounce-ray raycast cost: sorted vs unsorted, and sort cost."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

def timeit(label, fn, reps=3):
    r = fn(); jax.block_until_ready(r); _ = float(jnp.asarray(r[0] if isinstance(r, tuple) else r).ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0=time.time(); r = fn(); _ = float(jnp.asarray(r[0] if isinstance(r, tuple) else r).ravel()[0]); best=min(best,time.time()-t0)
    print(f'{label}: {best*1000:.1f} ms', flush=True)
    return r

cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(512, 288, cam)
leaf = 32
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
data = sc.send()

# one bounce to generate secondary rays
near = jax.jit(lambda: raycast_pallas(data, o, d, max_leaf_tris=leaf))()
hit = finalize_hit(data, o, d, near)
seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]), jnp.zeros(o.shape[0], jnp.int32), 0))
_, nd = scatter(seed, hit.normal, d, hit.roughness, True)
o2 = jnp.where(hit.did_hit[:,None], hit.point + hit.normal*1e-4, o)
d2 = jnp.where(hit.did_hit[:,None], nd, d)
o2, d2 = jax.block_until_ready((o2, d2))

timeit('primary raycast', jax.jit(lambda: raycast_pallas(data, o, d, max_leaf_tris=leaf).t))
timeit('bounce raycast unsorted', jax.jit(lambda: raycast_pallas(data, o2, d2, max_leaf_tris=leaf).t))
lo, hi = data.node_min[0], data.node_max[0]
@jax.jit
def sortkeys():
    k = ray_sort_keys(o2, d2, lo, hi)
    return jnp.argsort(k)
perm = timeit('argsort keys', sortkeys)
o2s, d2s = jax.block_until_ready((o2[perm], d2[perm]))
timeit('bounce raycast sorted', jax.jit(lambda: raycast_pallas(data, o2s, d2s, max_leaf_tris=leaf).t))

import numpy as _np
from opengl_raytracer_tpu.ops.morton import morton3d
U = _np.uint32
@jax.jit
def key_octant_major():
    extent = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o2 - lo) / extent * 512.0, 0, 511).astype(jnp.uint32)
    m = morton3d(q)
    octant = ((d2[:,0]<0).astype(jnp.uint32)<<U(2)) | ((d2[:,1]<0).astype(jnp.uint32)<<U(1)) | (d2[:,2]<0).astype(jnp.uint32)
    return jnp.argsort((octant << U(27)) | m)
perm2 = timeit('argsort octant-major', key_octant_major)
o2a, d2a = jax.block_until_ready((o2[perm2], d2[perm2]))
timeit('bounce sorted octant-major', jax.jit(lambda: raycast_pallas(data, o2a, d2a, max_leaf_tris=leaf).t))

@jax.jit
def key_dir6_major():
    extent = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((o2 - lo) / extent * 512.0, 0, 511).astype(jnp.uint32)
    m = morton3d(q)
    dq = jnp.clip(((d2 * 0.5 + 0.5) * 4.0), 0, 3).astype(jnp.uint32)  # 2 bits/axis
    dkey = (dq[:,0] << U(4)) | (dq[:,1] << U(2)) | dq[:,2]
    return jnp.argsort((dkey << U(26)) | (m >> U(1)))
perm3 = timeit('argsort dir6-major', key_dir6_major)
o2b, d2b = jax.block_until_ready((o2[perm3], d2[perm3]))
timeit('bounce sorted dir6-major', jax.jit(lambda: raycast_pallas(data, o2b, d2b, max_leaf_tris=leaf).t))
