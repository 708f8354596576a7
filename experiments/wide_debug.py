import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.traversal import raycast_bvh
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=32, bvh_method='sah')
data = sc.send()
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(512, 288, cam)
nv = raycast_bvh(data, o[:4096], d[:4096], max_leaf_tris=32)
np_ = raycast_pallas(data, o[:4096], d[:4096], max_leaf_tris=32)
tv = np.asarray(nv.t); tp = np.asarray(np_.t)
bad = np.nonzero(np.abs(tv - tp) > 1e-3)[0]
print('bad rays:', len(bad), 'of 4096')
for i in bad[:8]:
    print(f'  ray {i}: xla t={tv[i]:.4f} tri={int(nv.tri[i])}  pallas t={tp[i]:.4f} tri={int(np_.tri[i])}')

