"""Where do the mesh wrapper's +14 ms/step go? (dp_overhead.py part 2
follow-up)

Traces two steady-state ShardedRenderer steps on a (dp=1, sp=1) mesh —
same workload as trace_step.py's plain Renderer trace — and prints the
per-op device profile.  Diffing against trace_step.py's output
attributes the wrapper delta to concrete ops (GSPMD-inserted copies,
un-donated buffers, lost fusions, the band [::-1] reversal, the sp
psum's degenerate form...).

Usage: python experiments/dp_trace.py
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
from opengl_raytracer_tpu.parallel.sharding import ShardedRenderer, make_mesh
from opengl_raytracer_tpu.presets import (default_objects, DEFAULT_CAM_POS,
                                          DEFAULT_CAM_DIR)
from opengl_raytracer_tpu.utils.config import RenderConfig

LOGDIR = "/tmp/oglrt-trace-dp"
N_TRACED = 2


def main():
    config = RenderConfig(width=1920, height=1080, bounces=4)
    scene = Scene(default_objects("stanford_minidragon"),
                  max_leaf_tris=config.max_leaf_tris)
    mesh = make_mesh(1, dp=1, sp=1)
    r = ShardedRenderer(scene, config, mesh)
    assert r.traversal == "pallas2", r.traversal
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
        if not re.search(r"TPU|/device|XLA Ops", pname + " " + tname, re.I):
            continue
        if re.search(r"steps?|launch|infeed|outfeed", tname, re.I):
            continue
        dur = e.get("dur", 0) / 1e3 / N_TRACED
        by_name[e.get("name", "?")] += dur
        total += dur

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


if __name__ == "__main__":
    main()
