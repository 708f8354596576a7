"""Frame-level A/B of APPROXIMATE reorder sorts (run on TPU) — CLOSED.

The reorder sort only needs PACKET coherence — any permutation yields a
bit-identical image (rays carry their own RNG state and original index),
and a packet is one 128-lane row of the (R/128, 128) view.  Two
approximate row-clustering schemes were implemented behind a sort_mode
knob and A/B'd at 1080p/4-bounce/minidragon:

  * "lane": per-lane sort along the sublane axis — row r then holds the
    128 rank-r-per-lane elements ~= global quantile r/16200 with a
    sampling spread of ~0.4% of ray mass.  Standalone cost is ~2x below
    the 1D global sort AND flat in operand count (psort_axis.py), and
    the permutation never crosses lanes so the exact pixel-order restore
    is per-lane too.
  * "lane2": the lane pass + an exact refinement sort within 16200-ray
    quantile windows (in-window packet quality ~= global sort; only
    window-boundary bleed remains), with a true global restore.

RESULT (TPU v5e, 2026-08-18, best-of-4, bit-identical images verified):

    A:global   566.4-570.3 ms/frame (1.76 fps)   <- HEAD
    L:lane    1634.6 ms/frame (0.61 fps)         -65%
    L2:lane2   617.5 ms/frame (1.62 fps)         -8%

CONCLUSIONS: (1) packet quality is EXTREMELY sensitive — a 0.4%-of-mass
quantile spread per packet balloons the kernel by ~1.1 s/frame, nearly
as bad as sorting every 4th bounce (r4_frame_ab.py); (2) even near-exact
window clustering loses: the lane pass (~7 ms in-frame) + windowed
refinement + global restore cost more than they save; (3) the exact
global sort is at its floor — a 2M x 12 bitonic network is ~12.5 ms of
pure VPU issue slots (231 passes x 26 ops) and XLA's in-frame sort
measures 13.7 ms, i.e. XLA is AT the bitonic issue bound, and
scatter-based sorts (radix/sample) have no efficient TPU lowering.
The sort_mode knob was removed after these measurements; this script
now only re-measures the HEAD baseline.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

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
    r = Renderer(scene, RenderConfig(width=w, height=h, bounces=bounces))
    st = r.step(r.init_state(), cam)
    sync(st)
    best = 1e9
    for _rep in range(reps):
        st = r.init_state()
        st = r.step(st, cam)
        sync(st)
        t0 = time.time()
        st = r.step(st, cam)
        sync(st)
        best = min(best, time.time() - t0)
    print(f"A:global: {best*1000:.1f} ms/frame ({1.0/best:.2f} fps)",
          flush=True)


if __name__ == "__main__":
    main()
