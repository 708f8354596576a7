"""Chunk-size sweep at 1080p with the pallas path."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig

cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=32)
W, H = 1920, 1080
for chunk in [128*1024, 512*1024, W*H]:
    cfg = RenderConfig(width=W, height=H, bounces=4, traversal='pallas',
                       max_leaf_tris=32, ray_chunk=chunk)
    r = Renderer(sc, cfg)
    t0=time.time(); st = r.render(camera=cam, frames=1); _=float(jnp.sum(st.accum[:2,:2]))
    comp = time.time()-t0
    best=1e9
    for _ in range(2):
        t0=time.time(); st = r.step(st, cam); _=float(jnp.sum(st.accum[:2,:2])); best=min(best,time.time()-t0)
    print(f'chunk={chunk}: {best*1000:.0f} ms/frame (compile+1st {comp:.0f}s)', flush=True)
