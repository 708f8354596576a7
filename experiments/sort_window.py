"""Windowed reorder sort: full-frame cost vs window size (run on TPU).

The multi-operand coherence sort is bitonic — O(n log^2 n) compare
passes — and costs 4 x 19.5 ms of the 813 ms round-2 frame.  Sorting
within fixed windows cuts the pass count (8K window: 91 vs 231 passes)
and keeps images bit-identical (rays never cross windows; the restoring
sort is windowed identically).  The open question is packet quality:
windows were coherent at the previous bounce, so the in-window sort
should keep 128-ray packets tight.  This measures the real 1080p/4-bounce
frame for window in (global, 64K, 16K, 8K, 4K).

CLOSED (round 5): windowed sorts measured frame-time NEUTRAL at every
window size on the round-3/4 HEAD (the sort is a shrinking share of the
frame and packet quality degrades exactly as fast as the pass count
drops), so the ``sort_window`` config knob was DELETED from
RenderConfig/trace in round 5.  This script is kept as the measurement
record; it no longer runs as-is (RenderConfig has no sort_window field).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig


def main():
    scene = Scene(default_objects('stanford_minidragon'))
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    base_img = None
    for win in (0, 65536, 16384, 8192, 4096):
        cfg = RenderConfig(width=1920, height=1080, bounces=4,
                           traversal="pallas2", sort_window=win)
        r = Renderer(scene, cfg)
        state = r.init_state()
        state = r.step(state, cam)          # compile + warm
        jax.block_until_ready(state.accum)
        _ = float(jnp.sum(state.accum[:2, :2]))
        best = 1e9
        for _i in range(3):
            t0 = time.time()
            state = r.step(state, cam)
            _ = float(jnp.sum(state.accum[:2, :2]))
            best = min(best, time.time() - t0)
        img = np.asarray(state.accum)
        tag = "global" if win == 0 else f"win {win//1024}K"
        if base_img is None:
            base_img = img
            print(f"{tag}: {best*1000:.1f} ms/frame", flush=True)
        else:
            # bit-identical is expected only per matching frame counts;
            # both rendered the same number of frames, so compare.
            err = float(np.sqrt(np.mean((img - base_img) ** 2)))
            print(f"{tag}: {best*1000:.1f} ms/frame  rmse {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
