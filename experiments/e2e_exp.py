"""End-to-end frame timing across traversal strategies on TPU."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig

cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
W = int(os.environ.get('W', 512)); H = int(os.environ.get('H', 288))
for trav, leaf in [('pallas', 32), ('pallas', 16), ('packet', 32)]:
    cfg = RenderConfig(width=W, height=H, bounces=4, traversal=trav, max_leaf_tris=leaf)
    sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
    r = Renderer(sc, cfg)
    t0=time.time(); st = r.render(camera=cam, frames=1); _=float(st.accum.sum())
    compile_s = time.time()-t0
    best = 1e9
    for _ in range(3):
        t0=time.time(); st = r.step(st, cam); _=float(jnp.sum(st.accum[:2,:2])); best=min(best, time.time()-t0)
    print(f'{trav} leaf={leaf} {W}x{H}: {best*1000:.0f} ms/frame (compile {compile_s:.0f}s) mean={float(st.accum.mean()):.5f}', flush=True)
