"""Re-tune kernel serve rates on the 3-axis-SAH tree (round 4, late).

The serve rates (SERVE_PRIMARY=8, SERVE_BOUNCE=3) were tuned in round 3
on the largest-axis-SAH tree, where bounce packets lasted ~52 iterations
(serve demand ~1.24 claims/iteration).  The all-3-axes SAH sweep (landed
at the end of round 4) cut packet duration ~12% (47.9 iters), raising
serve demand to ~1.4 claims/iteration — so the old optimum may be stale:
a higher bounce serve rate buys fewer claim stalls, a lower one saves
~0.4 us/iteration of serve machinery (experiments/phase_cost.py).

Interleaved best-of-N frame-level A/B, one process (process-to-process
frame drift is ~3%).  Variants patch the module constants BEFORE the
renderer's first step call: the constants are read when _tile_step is
first jit-TRACED (the first r.step), not at Renderer construction, so
each variant MUST compile (step + sync) inside the same loop iteration
that patched them — do not defer the first step past the next re-patch.

Usage: python experiments/serve_retune.py [width height bounces]

RESULT (TPU v5e, 2026-08-19, 1920x1080/4-bounce minidragon, best-of-5,
same-process interleaved; absolute level ~5% above bench.py's 462.5 ms
run-to-run, but the within-process ranking is what matters):

    P8/B3 (head): 488.5 ms/frame (2.047 fps)
    P8/B2:        498.7 ms/frame (-2.0%)
    P8/B4:        509.7 ms/frame (-4.2%)

P8/B3 stays optimal on the new tree: the higher claim demand of shorter
packets (~1.4 claims/iteration) is still comfortably under 3 serves, so
B4 only adds ~0.4 us/iteration of serve machinery, and B2 starts to
starve the claim rate.
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


def sync(state):
    return float(jnp.sum(state.accum[:2, :2]))


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    bounces = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    reps = int(os.environ.get("REPS", 5))

    scene = Scene(default_objects("stanford_minidragon"))
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    # Pin the production kernel: under traversal='auto' a fallback (non-TPU,
    # empty p2 tables, oversized scene) would ignore SERVE_* entirely and the
    # sweep would silently rank identical programs.
    cfg = RenderConfig(width=w, height=h, bounces=bounces,
                       traversal="pallas2")

    grid = [(8, 3), (8, 2), (8, 4)]
    if os.environ.get("FULL"):
        grid += [(10, 3), (6, 3)]
    variants = {}
    for p, b in grid:
        sbt.SERVE_PRIMARY, sbt.SERVE_BOUNCE = p, b
        r = Renderer(scene, cfg)
        assert r.traversal == "pallas2", r.traversal
        # compile NOW, before the next loop iteration re-patches SERVE_*
        # (the constants are read at first-step trace time).
        st = r.step(r.init_state(), cam)
        sync(st)
        variants[f"P{p}/B{b}"] = r
        print(f"compiled P{p}/B{b}", flush=True)

    best = {k: 1e9 for k in variants}
    for rep in range(reps):
        for k, r in variants.items():
            st = r.step(r.init_state(), cam)  # warm this executable
            sync(st)
            t0 = time.time()
            st = r.step(st, cam)
            sync(st)
            best[k] = min(best[k], time.time() - t0)
    for k in variants:
        print(f"{k}: {best[k]*1000:.1f} ms/frame ({1.0/best[k]:.3f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
