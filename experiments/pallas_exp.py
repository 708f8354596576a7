"""Validate + time the Pallas traversal kernel on TPU."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.traversal import raycast_packet
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays, run, W, H

cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(W, H, cam)
for method, leaf in [('sah', 16), ('sah', 32), ('mean', 32)]:
    sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf, bvh_method=method)
    data = sc.send()
    np_ = jax.jit(lambda: raycast_packet(data, o, d, max_leaf_tris=leaf))()
    pl_ = jax.jit(lambda: raycast_pallas(data, o, d, max_leaf_tris=leaf))()
    hv = np.asarray(np_.t) < 1e29; hp = np.asarray(pl_.t) < 1e29
    same = (hv == hp).mean()
    tdiff = np.abs(np.asarray(np_.t)[hv & hp] - np.asarray(pl_.t)[hv & hp]).max() if (hv & hp).any() else 0
    print(f'{method} leaf={leaf}: hit agree={same:.6f}, max t diff={tdiff:.2e}')
    run(f'pallas {method} leaf={leaf}', jax.jit(lambda data=data, leaf=leaf: (raycast_pallas(data, o, d, max_leaf_tris=leaf), 0)))
