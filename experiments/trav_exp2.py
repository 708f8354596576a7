"""Compare BVH methods & leaf sizes for packet traversal on TPU (primary rays)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.traversal import raycast_packet
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays, run, W, H

cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
o, d = primary_rays(W, H, cam)
objs = default_objects('stanford_minidragon')
for method in ['mean', 'sah']:
    for leaf in [16, 32]:
        sc = Scene(objs, max_leaf_tris=leaf, bvh_method=method)
        data = sc.send()
        run(f"{method} leaf={leaf} depth={sc.bvh.depth} nodes={sc.total_boxes}",
            jax.jit(lambda data=data, leaf=leaf: (raycast_packet(data, o, d, max_leaf_tris=leaf), 0)))
