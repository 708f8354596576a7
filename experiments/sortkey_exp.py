"""Sort-key design sweep at 2M bounce rays."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import morton3d
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

U = np.uint32
leaf = 16
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(1920, 1080, cam)
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
data = sc.send()
lo, hi = data.node_min[0], data.node_max[0]

near = raycast_pallas(data, o, d, max_leaf_tris=leaf)
hit = finalize_hit(data, o, d, near)
seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]) % 1920, jnp.arange(o.shape[0]) // 1920, 0))
_, nd = scatter(seed, hit.normal, d, hit.roughness, True)
o2 = jax.block_until_ready(jnp.where(hit.did_hit[:,None], hit.point + hit.normal*1e-4, o))
d2 = jax.block_until_ready(jnp.where(hit.did_hit[:,None], nd, d))

def timeit(label, fn, reps=3):
    r = fn(); jax.block_until_ready(r)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].astype(jnp.float32))
    best=1e9
    for _i in range(reps):
        t0=time.time(); r=fn(); _ = float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0].astype(jnp.float32)); best=min(best,time.time()-t0)
    print(f'{label}: {best*1000:.1f} ms', flush=True)

extent = jnp.maximum(hi - lo, 1e-6)
q9 = jnp.clip((o2 - lo) / extent * 512.0, 0, 511).astype(jnp.uint32)
m27 = morton3d(q9)
octant = ((d2[:,0]<0).astype(jnp.uint32)<<U(2)) | ((d2[:,1]<0).astype(jnp.uint32)<<U(1)) | (d2[:,2]<0).astype(jnp.uint32)
dq2 = jnp.clip((d2*0.5+0.5)*4.0, 0, 3).astype(jnp.uint32)   # 2 bits/axis
dir6 = (dq2[:,0]<<U(4)) | (dq2[:,1]<<U(2)) | dq2[:,2]
dq3 = jnp.clip((d2*0.5+0.5)*8.0, 0, 7).astype(jnp.uint32)   # 3 bits/axis
dir9 = (dq3[:,0]<<U(6)) | (dq3[:,1]<<U(3)) | dq3[:,2]

keys = {
  'octant-major+m27': (octant << U(27)) | m27,
  'dir6-major+m24':   (dir6 << U(24)) | (m27 >> U(3)),
  'dir9-major+m21':   (dir9 << U(21)) | (m27 >> U(6)),
  'm27-major+oct':    (m27 << U(3)) | octant,
  'm15-major+dir6':   ((m27 >> U(12)) << U(17)) | (dir6 << U(11)),
}
for name, k in keys.items():
    perm = jnp.argsort(k)
    o2s, d2s = jax.block_until_ready((o2[perm], d2[perm]))
    timeit(f'bounce sorted [{name}]', jax.jit(lambda o2s=o2s, d2s=d2s: raycast_pallas(data, o2s, d2s, max_leaf_tris=leaf)))

# leaf-size sweep with the winning key
best_key = (dir6 << U(24)) | (m27 >> U(3))
perm = jnp.argsort(best_key)
o2s, d2s = jax.block_until_ready((o2[perm], d2[perm]))
for lf in [32, 64]:
    scl = Scene(default_objects('stanford_minidragon'), max_leaf_tris=lf)
    dl = scl.send()
    timeit(f'bounce dir6-sorted leaf={lf}', jax.jit(lambda dl=dl, lf=lf: raycast_pallas(dl, o2s, d2s, max_leaf_tris=lf)))
