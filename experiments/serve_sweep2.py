"""Per-segment serve-rate sweep on the REAL 1080p frame.

Round-3 session 1 split the serve rate by segment (SERVE_PRIMARY /
SERVE_BOUNCE) but shipped the values from single-kernel-era sweeps
(nserve_sweep.py: N_SERVE=8 helped primaries, hurt bounces, frame mix
favored 5).  With per-segment kernels those trade-offs decouple: this
sweep times full renderer steps for serve combos to pick each segment's
rate independently.

Results (v5e, 1080p/4-bounce minidragon, steady-state best-of-6 steps):

  Sequential sweep (one combo per block): P5/B3 626.8, P8/B3 630.4,
  P8/B2 612.0, P5/B2 621.2 ms — suggests B2 wins ~15 ms.
  Interleaved A/B (alternating combos, same process):
      P5/B3: 613.1 / 612.6 / 611.9;  P8/B2: 614.5 / 614.2 / 612.2
  -> NO real difference; the sequential spread (and the 591 ms the same
  build measured in bench.py minutes earlier) is PROCESS/TUNNEL DRIFT of
  ~3%.  Serve rates stay SERVE_PRIMARY=5 / SERVE_BOUNCE=3.  Lesson:
  only interleaved same-process comparisons are trustworthy at <5%.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax.numpy as jnp

import opengl_raytracer_tpu.ops.subblock_traversal as sbt
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import (DEFAULT_CAM_DIR, DEFAULT_CAM_POS,
                                          default_objects)
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig

COMBOS = [(5, 3), (8, 2), (5, 3), (8, 2), (5, 3), (8, 2)]
N_STEPS = 6


def main():
    config = RenderConfig(width=1920, height=1080, bounces=4)
    scene = Scene(default_objects("stanford_minidragon"),
                  max_leaf_tris=config.max_leaf_tris)
    data = scene.send()
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)

    for sp, sb in COMBOS:
        sbt.SERVE_PRIMARY, sbt.SERVE_BOUNCE = sp, sb
        r = Renderer(data, config)
        state = r.init_state()
        state = r.step(state, cam)          # compile
        _ = float(jnp.sum(state.accum[:2, :2]))
        best = 1e9
        for _ in range(N_STEPS):
            t0 = time.perf_counter()
            state = r.step(state, cam)
            _ = float(jnp.sum(state.accum[:2, :2]))
            best = min(best, time.perf_counter() - t0)
        print(f"P{sp}/B{sb}: {best * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
