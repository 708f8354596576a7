"""Device-time breakdown of one real Renderer step (1080p/4-bounce).

Traces two steady-state steps with jax.profiler and aggregates the
device-lane events from the Chrome-trace JSON by op name, so the split
(kernel segments vs sorts vs shading glue) reflects IN-FRAME cost —
standalone timeit harnesses overstate small ops by the ~32 ms axon
dispatch tunnel, which a trace does not.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import glob
import gzip
import json
import re
import time
from collections import defaultdict

import jax, jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.presets import (default_objects, DEFAULT_CAM_POS,
                                          DEFAULT_CAM_DIR)
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig

LOGDIR = "/tmp/oglrt-trace-r3"
N_TRACED = 2


def main():
    config = RenderConfig(width=1920, height=1080, bounces=4)
    scene = Scene(default_objects("stanford_minidragon"),
                  max_leaf_tris=config.max_leaf_tris)
    r = Renderer(scene, config)
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)

    state = r.init_state()
    for _ in range(2):
        state = r.step(state, cam)
    _ = float(jnp.sum(state.accum[:2, :2]))

    t0 = time.time()
    jax.profiler.start_trace(LOGDIR)
    for _ in range(N_TRACED):
        state = r.step(state, cam)
    _ = float(jnp.sum(state.accum[:2, :2]))
    jax.profiler.stop_trace()
    print(f"traced {N_TRACED} steps in {time.time()-t0:.2f}s wall",
          flush=True)

    paths = sorted(glob.glob(os.path.join(
        LOGDIR, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    assert paths, f"no trace under {LOGDIR}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device lanes: pids whose process name mentions TPU / device
    events = trace["traceEvents"]
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e["tid"])] = e["args"].get("name", "")

    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_name.get(e["pid"], "")
        tname = tid_name.get((e["pid"], e["tid"]), "")
        if not re.search(r"TPU|/device|XLA Ops", pname + " " + tname,
                         re.I):
            continue
        if re.search(r"steps?|launch|infeed|outfeed", tname, re.I):
            continue
        dur = e.get("dur", 0) / 1e3 / N_TRACED  # us -> ms, per step
        name = e.get("name", "?")
        by_name[name] += dur
        total += dur

    # long_name args (hlo op -> source) for the top events
    long_of = {}
    for e in events:
        if e.get("ph") == "X" and isinstance(e.get("args"), dict):
            ln = e["args"].get("long_name") or e["args"].get("hlo_op")
            if ln:
                long_of.setdefault(e.get("name", "?"), ln)

    print(f"\ndevice total: {total:.1f} ms/step; top ops:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        ln = long_of.get(name, "")
        print(f"  {ms:8.2f} ms  {name[:60]}  {ln[:160]}")

    # coarse buckets
    buckets = defaultdict(float)
    for name, ms in by_name.items():
        n = name.lower()
        if "traverse" in n or "custom-call" in n:
            buckets["kernel (pallas)"] += ms
        elif "sort" in n:
            buckets["sort"] += ms
        elif "gather" in n or "dynamic-slice" in n:
            buckets["gather/slice"] += ms
        elif "fusion" in n or "convert" in n or "copy" in n:
            buckets["fusion/elementwise"] += ms
        else:
            buckets["other"] += ms
    print("\nbuckets:")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
