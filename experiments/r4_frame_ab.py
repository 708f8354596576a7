"""Round-4 frame-level A/Bs on hardware, interleaved in ONE process.

Process-to-process frame times drift ~3% (round-3 measurement), so all
variants are compiled up front and timed interleaved best-of-N:

  A. HEAD config (sort_every=1)                     — the baseline
  B. sort_every=2 (half the reorder sorts; bit-identical image)
  D. frames_per_step=4 (spp batching: 4 frames' rays in one fused step)
  E. sort_every=4 (one sort before bounce 1 only)

Usage: python experiments/r4_frame_ab.py [width height bounces]
Writes one line per variant: ms/frame (for D: ms/step and per-frame).

RESULT (TPU v5e, 2026-08-18, 1920x1080/4-bounce minidragon, best-of-5):

    A:head:        575.8 ms/frame (1.74 fps)
    B:sort_every2: 944.6 ms/frame (1.06 fps)
    D:spp4:       2243.0 ms/step = 560.8 ms/frame (1.78 fps, F=4)
    E:sort_every4: 1409.1 ms/frame (0.71 fps)

Sorting EVERY bounce is strongly optimal: skipping sorts saves ~14 ms
each but the one-sort-stale packets balloon kernel work by ~400 ms/frame
(B) to ~830 ms (E).  spp batching is ~2.6%/frame — the 2M-ray chunks
already saturate packet coherence, so batching only amortizes dispatch.
Variant C (PIPELINED early-pop kernel) was a raycast-level loss
(experiments/pipe_ab.py) and was deleted.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import (DEFAULT_CAM_DIR, DEFAULT_CAM_POS,
                                          default_objects)
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig


def sync(state):
    return float(jnp.sum(state.accum[:2, :2]))


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(os.environ.get("REPS", 5))

    scene = Scene(default_objects("stanford_minidragon"))
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)

    variants = {}

    def add(name, cfg):
        r = Renderer(scene, cfg)
        st = r.step(r.init_state(), cam)  # compile
        sync(st)
        variants[name] = (r, cfg.frames_per_step)
        print(f"compiled {name}", flush=True)

    which = set(os.environ.get("VARIANTS", "A,B,D,E").split(","))
    base = dict(width=w, height=h, bounces=bounces)
    if "A" in which:
        add("A:head", RenderConfig(**base))
    if "B" in which:
        add("B:sort_every2", RenderConfig(**base, sort_every=2))
    # Variant C (PIPELINED early-pop kernel) was measured a loss at the
    # raycast level (experiments/pipe_ab.py, 2026-08-18) and deleted.
    if "D" in which:
        add("D:spp4", RenderConfig(**base, frames_per_step=4))
    if "E" in which:
        add("E:sort_every4", RenderConfig(**base, sort_every=4))

    best = {k: 1e9 for k in variants}
    for rep in range(reps):
        for k, (r, F) in variants.items():
            st = r.init_state()
            st = r.step(st, cam)  # warm this executable's path
            sync(st)
            t0 = time.time()
            st = r.step(st, cam)
            sync(st)
            dt = time.time() - t0
            best[k] = min(best[k], dt)
    for k, (r, F) in variants.items():
        per_frame = best[k] / F
        print(f"{k}: {best[k]*1000:.1f} ms/step, {per_frame*1000:.1f} ms/frame "
              f"({1.0/per_frame:.2f} fps-equivalent, F={F})", flush=True)


if __name__ == "__main__":
    main()
