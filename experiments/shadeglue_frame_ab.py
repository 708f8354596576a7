"""Frame-level A/B of the shade kernel's material-operand layout.

The op-level A/B (shadeglue_ab.py) said layout "r" (gather-native
(P,128,24) operand + in-VMEM transpose) beats "t" (XLA normalization
copy to (24,P,128)) by 0.62 ms/bounce.  But the in-frame trace
(trace_step.py) showed the change also shifted the reorder sorts'
operand annotations and their measured time (+1.46 ms/sort), making the
FRAME the only honest judge.  This harness compiles a full 1080p step
per layout in ONE process (process drift ~3%) and times them
interleaved best-of-N, patching ops.shade._ABC_LAYOUT before each
Renderer construction (constants are read when _tile_step first traces,
i.e. at the compile call inside the same loop iteration —
serve_retune.py's pattern).

Usage: python experiments/shadeglue_frame_ab.py [width height bounces]

RESULT (TPU v5e, 2026-08-19, 1920x1080/4-bounce minidragon, best-of-5,
all variants bit-identical images):

    t:    485.6 ms/frame   (the round-4 shipped path)
    r:    488.2 ms/frame   (+0.5%)
    colg: 485.5 ms/frame   (-0.02%)

    (This harness's absolute level sits above bench.py's 462 ms — three
    resident executables + per-rep re-init; only the deltas matter.)

    => FRAME-NEUTRAL.  The op-level -0.62 ms/bounce of layout "r"
       (shadeglue_ab.py) is eaten in-frame: the kernel re-reads the
       lane-padded gather output (+1.1 ms/bounce of HBM traffic) and the
       reorder sorts regress ~+1.4 ms each when the copy disappears
       (trace_step.py — XLA scheduling/annotation shift, operands lose
       their S(1) space).  colg exactly trades the copy for a slower
       strided gather.  CLOSED: the glue's ~30 ms/frame is a floor made
       of the gather (machine indexing floor, gather2_ab.py) plus
       whichever of {copy, padded kernel reads, strided gather} one
       picks — they cost the same.  shade.py keeps the round-4 "t"
       path; the variant machinery lives at the commit introducing this
       file and was removed right after (sort_window precedent).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops import shade
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
    cfg = RenderConfig(width=w, height=h, bounces=bounces)

    # The _ABC_LAYOUT machinery exists only at the commit that
    # introduced this file (it was removed right after the A/B closed
    # frame-neutral — sort_window precedent).  Setting an attribute
    # nothing reads would compile three IDENTICAL programs and report
    # noise as a ranking, so fail loudly at later HEADs.
    assert hasattr(shade, "_ABC_LAYOUT"), (
        "ops.shade no longer carries the layout knob; check out the "
        "commit introducing this experiment to reproduce the A/B "
        "(results recorded in the docstring)")

    layouts = os.environ.get("LAYOUTS", "t,r,colg").split(",")
    variants = {}
    ref_img = None
    for lay in layouts:
        shade._ABC_LAYOUT = lay
        r = Renderer(scene, cfg)
        assert r.traversal == "pallas2", r.traversal
        st = r.step(r.init_state(), cam)  # compile NOW, under this patch
        sync(st)
        img = jnp.asarray(r.image(st))
        if ref_img is None:
            ref_img = img
        else:
            derr = float(jnp.max(jnp.abs(img - ref_img)))
            print(f"{lay}: max|img - {layouts[0]}| = {derr:.2e}", flush=True)
        variants[lay] = r
        print(f"compiled {lay}", flush=True)

    best = {k: 1e9 for k in variants}
    for _ in range(reps):
        for k, r in variants.items():
            st = r.init_state()
            st = r.step(st, cam)
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
