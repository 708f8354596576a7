"""Stress test at mediumdragon scale (~90-120k tris): VMEM fit + correctness."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.mesh import Mesh
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig

objs = default_objects('stanford_minidragon')
# add three more dragons -> ~112k tris total
objs += [
    Mesh([-5, -10, 12], [270, 0, -90], 'stanford_minidragon', [0.8, 0.6, 0.5], roughness=1, scale=0.18),
    Mesh([-5, -10, -12], [270, 0, -90], 'dragon', [0.5, 0.7, 0.9], roughness=1, scale=0.06),
    Mesh([5, -10, 0], [270, 0, 90], 'dragon', [0.9, 0.7, 0.4], roughness=1, scale=0.05),
]
sc = Scene(objs)
print(f'{sc.total_triangles:,} tris')
data = sc.send()
print(f'tri tiles {data.pl_tri_tiles.nbytes/1e6:.1f} MB, wide tiles {data.pw_tiles.nbytes/1e6:.1f} MB (ordered entries packed in free lanes)')

cfg = RenderConfig(width=512, height=288, bounces=4)
r = Renderer(sc, cfg)
cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
t0 = time.time()
st = r.render(camera=cam, frames=1)
_ = float(jnp.sum(st.accum[:2,:2]))
print(f'first frame ok in {time.time()-t0:.0f}s')
best = 1e9
for _ in range(2):
    t0=time.time(); st=r.step(st,cam); _=float(jnp.sum(st.accum[:2,:2])); best=min(best,time.time()-t0)
print(f'{best*1000:.0f} ms/frame at 512x288, mean={float(st.accum.mean()):.5f}')
