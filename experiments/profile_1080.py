"""Break down the 1080p frame: raycast vs sort vs shading at 2M rays."""
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
    r = fn(); jax.block_until_ready(r)
    x = jax.tree_util.tree_leaves(r)[0]
    _ = float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
    best = 1e9
    for _i in range(reps):
        t0=time.time(); r = fn()
        x = jax.tree_util.tree_leaves(r)[0]
        _ = float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
        best=min(best,time.time()-t0)
    print(f'{label}: {best*1000:.1f} ms', flush=True)
    return r

leaf = 16
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(1920, 1080, cam)
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
data = sc.send()
lo, hi = data.node_min[0], data.node_max[0]

near = timeit('primary raycast 2M', jax.jit(lambda: raycast_pallas(data, o, d, max_leaf_tris=leaf)))
hit = finalize_hit(data, o, d, near)
seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]) % 1920, jnp.arange(o.shape[0]) // 1920, 0))
_, nd = scatter(seed, hit.normal, d, hit.roughness, True)
o2 = jax.block_until_ready(jnp.where(hit.did_hit[:,None], hit.point + hit.normal*1e-4, o))
d2 = jax.block_until_ready(jnp.where(hit.did_hit[:,None], nd, d))

perm = timeit('argsort 2M', jax.jit(lambda: jnp.argsort(ray_sort_keys(o2, d2, lo, hi))))
o2s, d2s = jax.block_until_ready((o2[perm], d2[perm]))
timeit('bounce raycast sorted 2M', jax.jit(lambda: raycast_pallas(data, o2s, d2s, max_leaf_tris=leaf)))
timeit('bounce raycast unsorted 2M', jax.jit(lambda: raycast_pallas(data, o2, d2, max_leaf_tris=leaf)))

def shade():
    h = finalize_hit(data, o2s, d2s, near)
    s2, ndir = scatter(seed, h.normal, d2s, h.roughness, True)
    return ndir
timeit('finalize+scatter 2M', jax.jit(shade))
def permute10():
    return tuple(a[perm] for a in (o2, d2, o2s, d2s)) + (seed[perm],)
timeit('permute 5 arrays 2M', jax.jit(permute10))
