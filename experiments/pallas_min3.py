"""Run the real traversal kernel at small R on the real scene."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.intersect import raycast_brute
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=16, bvh_method='sah')
data = sc.send()
for R in [1024, 4096, 32768, 147456]:
    o, d = primary_rays(512, 288, cam)
    o, d = o[:R], d[:R]
    try:
        pl_ = jax.jit(lambda o=o, d=d: raycast_pallas(data, o, d, max_leaf_tris=16))()
        t = np.asarray(pl_.t)
        print(f'R={R}: OK, hits={(t<1e29).mean():.3f}')
    except Exception as e:
        print(f'R={R}: FAIL', str(e)[:150].replace(chr(10),' '))
