"""Round-4 frame-level A/Bs on hardware, interleaved in ONE process.

Process-to-process frame times drift ~3% (round-3 measurement), so all
variants are compiled up front and timed interleaved best-of-N:

  A. HEAD config (sort_every=1, PIPELINED off)      — the baseline
  B. sort_every=2 (half the reorder sorts; bit-identical image)
  C. PIPELINED=True (early-pop software-pipelined kernel body)
  D. frames_per_step=4 (spp batching: 4 frames' rays in one fused step)

Usage: python experiments/r4_frame_ab.py [width height bounces]
Writes one line per variant: ms/frame (for D: ms/step and per-frame).
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
import opengl_raytracer_tpu.ops.subblock_traversal as sb


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

    def add(name, cfg, pipelined=False):
        old = sb.PIPELINED
        sb.PIPELINED = pipelined
        try:
            r = Renderer(scene, cfg)
            st = r.step(r.init_state(), cam)  # compile
            sync(st)
        finally:
            sb.PIPELINED = old
        variants[name] = (r, pipelined, cfg.frames_per_step)
        print(f"compiled {name}", flush=True)

    base = dict(width=w, height=h, bounces=bounces)
    add("A:head", RenderConfig(**base))
    add("B:sort_every2", RenderConfig(**base, sort_every=2))
    add("C:pipelined", RenderConfig(**base), pipelined=True)
    add("D:spp4", RenderConfig(**base, frames_per_step=4))

    best = {k: 1e9 for k in variants}
    for rep in range(reps):
        for k, (r, pipe, F) in variants.items():
            old = sb.PIPELINED
            sb.PIPELINED = pipe  # cached executable; flag only matters at trace
            try:
                st = r.init_state()
                st = r.step(st, cam)  # warm this executable's path
                sync(st)
                t0 = time.time()
                st = r.step(st, cam)
                sync(st)
                dt = time.time() - t0
            finally:
                sb.PIPELINED = old
            best[k] = min(best[k], dt)
    for k, (r, pipe, F) in variants.items():
        per_frame = best[k] / F
        print(f"{k}: {best[k]*1000:.1f} ms/step, {per_frame*1000:.1f} ms/frame "
              f"({1.0/per_frame:.2f} fps-equivalent, F={F})", flush=True)


if __name__ == "__main__":
    main()
