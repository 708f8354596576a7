"""Multi-chip rendering tests on the 8-device virtual CPU mesh: the sharded
(dp x sp) progressive step must reproduce single-chip sequential rendering
exactly, because sp parallelism partitions *frame numbers* and the per-pixel
RNG stream depends only on (x, y, frameNumber) (fragment.glsl:390)."""

import numpy as np
import jax
import pytest

from opengl_raytracer_tpu.models.rect import Rect
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.parallel.sharding import ShardedRenderer, make_mesh
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig
from opengl_raytracer_tpu.utils.image import rmse


def small_scene():
    return Scene([
        Rect([4, 4, 0.1], [0, 0, -2], [0, 0, 0], color=[0.8, 0.2, 0.2], roughness=1),
        Rect([4, 4, 0.1], [0, 2, 0], [90, 0, 0], color=[0, 0, 0],
             emission_color=[1, 1, 1], emission=1.0, roughness=1),
        Rect([4, 4, 0.1], [0, -2, 0], [90, 0, 0], color=[0.7, 0.7, 0.7], roughness=1),
    ])


CAM = make_camera([0.0, 0.0, 4.0], [180.0, 0.0])


@pytest.mark.parametrize("dp,sp", [(8, 1), (4, 2), (2, 4), (1, 1)])
def test_sharded_matches_sequential(dp, sp):
    if dp * sp > len(jax.devices()):
        pytest.skip("not enough devices")
    cfg = RenderConfig(width=16, height=16, bounces=2, traversal="bvh")
    scene = small_scene()

    mesh = make_mesh(dp * sp, dp=dp, sp=sp)
    sr = ShardedRenderer(scene, cfg, mesh)
    accum = sr.init_accum()
    frames = 0
    for _ in range(2):  # 2 steps = 2*sp frames
        accum, frames = sr.step(CAM, accum, frames)
    sharded_img = np.asarray(accum)

    r = Renderer(scene, cfg)
    state = r.render(camera=CAM, frames=frames)
    seq_img = r.image(state)

    assert frames == 2 * sp
    assert rmse(sharded_img, seq_img) < 1e-6


def test_mesh_factory_validation():
    with pytest.raises(ValueError):
        make_mesh(4, dp=3, sp=2)
