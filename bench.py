"""Benchmark harness: fps / Mrays/s on the BASELINE.json headline config.

Runs the reference's default scene (main.py:19-111, minidragon standing in
for the stripped mediumdragon unless OGLRT_BENCH_DRAGON points elsewhere)
at 1920x1080 with 4 bounces on whatever accelerator JAX finds, and prints
ONE JSON line:

    {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}

vs_baseline is measured against the BASELINE.json north-star of 30 fps at
1080p/4-bounce on one TPU v5e chip.  Extra detail (Mrays/s, timings) goes
to stderr.

Flake resilience: the tunneled axon TPU backend can HANG (not just error)
inside ``jax.devices()`` when the tunnel is wedged, so exception handling
alone cannot save the run.  The harness therefore runs the measurement in
a child process supervised by a parent that enforces a per-attempt timeout
(OGLRT_BENCH_TIMEOUT, default 1500 s), retries with backoff
(OGLRT_BENCH_ATTEMPTS x OGLRT_BENCH_BACKOFF, default 3 x 60 s), and on
terminal failure still prints the JSON line with an "error" field and
exits 0 — the driver always gets a parseable artifact.

Env knobs:
    OGLRT_BENCH_WIDTH/HEIGHT/BOUNCES/DRAGON/WARMUP/ITERS — workload
    OGLRT_BENCH_SPP       — frames_per_step batching (BASELINE config 5's
                            4-spp accumulation); reported as spp-batched
                            frames/s (steps/s x spp)
    OGLRT_BENCH_PNG       — also save the final accumulation
    OGLRT_BENCH_TIMEOUT/ATTEMPTS/BACKOFF — supervision policy
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _workload():
    return {
        "width": int(os.environ.get("OGLRT_BENCH_WIDTH", 1920)),
        "height": int(os.environ.get("OGLRT_BENCH_HEIGHT", 1080)),
        "bounces": int(os.environ.get("OGLRT_BENCH_BOUNCES", 4)),
        "dragon": os.environ.get("OGLRT_BENCH_DRAGON", "stanford_minidragon"),
        "spp": int(os.environ.get("OGLRT_BENCH_SPP", 1)),
    }


def _metric_name(w):
    spp = f", {w['spp']}-spp batched" if w["spp"] > 1 else ""
    return (f"fps at {w['width']}x{w['height']}/{w['bounces']}-bounce "
            f"on {w['dragon']}{spp}")


def run_bench():
    """The actual measurement (child process).  Prints the JSON line."""
    import jax

    # The image's sitecustomize registers the axon TPU plugin and sets
    # jax_platforms="axon,cpu" in jax.config, which OVERRIDES the
    # JAX_PLATFORMS env var — re-apply it so `JAX_PLATFORMS=cpu python
    # bench.py` really benches on CPU (and a wedged tunnel can't hang a
    # CPU run at jax.devices()).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and jax.config.jax_platforms != plat:
        jax.config.update("jax_platforms", plat)

    from opengl_raytracer_tpu.models.scene import Scene
    from opengl_raytracer_tpu.ops.camera import make_camera
    from opengl_raytracer_tpu.presets import (
        DEFAULT_CAM_DIR,
        DEFAULT_CAM_POS,
        default_objects,
    )
    from opengl_raytracer_tpu.renderer import Renderer
    from opengl_raytracer_tpu.utils.config import RenderConfig

    w = _workload()
    warmup = int(os.environ.get("OGLRT_BENCH_WARMUP", 2))
    iters = int(os.environ.get("OGLRT_BENCH_ITERS", 8))

    log(f"devices: {jax.devices()}")
    config = RenderConfig(width=w["width"], height=w["height"],
                          bounces=w["bounces"], frames_per_step=w["spp"])

    t0 = time.time()
    scene = Scene(default_objects(w["dragon"]),
                  max_leaf_tris=config.max_leaf_tris)
    log(f"scene: {scene.total_triangles:,} tris, {scene.total_boxes:,} BVH nodes, "
        f"built in {time.time() - t0:.2f}s")

    n_dev = len(jax.devices())
    if n_dev > 1 and w["height"] % n_dev == 0 and w["spp"] == 1:
        # Multi-chip: shard pixel rows across all devices (parallel/sharding.py).
        from opengl_raytracer_tpu.parallel.sharding import ShardedRenderer, make_mesh

        mesh = make_mesh(n_dev, dp=n_dev, sp=1)
        log(f"multi-chip: dp={n_dev} row-sharded rendering")
        renderer = ShardedRenderer(scene, config, mesh)
    else:
        renderer = Renderer(scene, config)
    camera = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)

    import jax.numpy as jnp

    def sync(state):
        # On the tunneled axon platform block_until_ready does not actually
        # wait for completion; a scalar host readback is the reliable fence.
        return float(jnp.sum(state.accum[:2, :2]))

    state = renderer.init_state()
    t0 = time.time()
    state = renderer.step(state, camera)
    sync(state)
    log(f"first step (compile+run): {time.time() - t0:.2f}s")

    for _ in range(warmup):
        state = renderer.step(state, camera)
    sync(state)

    t0 = time.time()
    for _ in range(iters):
        state = renderer.step(state, camera)
    sync(state)
    dt = (time.time() - t0) / iters

    # Each step converges frames_per_step (=spp) progressive frames, so the
    # headline number is spp-batched frames (pixel samples) per second.
    fps = w["spp"] / dt
    primary_rays = w["width"] * w["height"] * config.rays_per_pixel * w["spp"]
    mrays = primary_rays / dt / 1e6
    log(f"steady state: {dt * 1000:.1f} ms/step ({w['spp']} spp/step), "
        f"{fps:.2f} frames/s, {mrays:.1f} Mrays/s primary "
        f"(x{config.n_bounces} bounce segments max)")

    out_png = os.environ.get("OGLRT_BENCH_PNG")
    if out_png:
        from opengl_raytracer_tpu.utils.image import save_png
        save_png(out_png, renderer.image(state))
        log(f"wrote {out_png}")

    print(json.dumps({
        "metric": _metric_name(w),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))


def supervise():
    """Parent: run the measurement in a child with timeout + retries, and
    ALWAYS print one JSON line (with an "error" field on terminal failure)."""
    attempts = int(os.environ.get("OGLRT_BENCH_ATTEMPTS", 3))
    backoff = float(os.environ.get("OGLRT_BENCH_BACKOFF", 60))
    timeout = float(os.environ.get("OGLRT_BENCH_TIMEOUT", 1500))

    last_err = "unknown"
    for attempt in range(1, attempts + 1):
        log(f"bench attempt {attempt}/{attempts} (timeout {timeout:.0f}s)")
        env = dict(os.environ, OGLRT_BENCH_CHILD="1")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, timeout=timeout,
                cwd=os.path.dirname(os.path.abspath(__file__)) or None,
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt} timed out after {timeout:.0f}s"
            log(last_err)
        else:
            lines = [ln for ln in proc.stdout.decode().splitlines() if ln.strip()]
            if proc.returncode == 0 and lines:
                try:
                    parsed = json.loads(lines[-1])
                except json.JSONDecodeError:
                    last_err = f"attempt {attempt}: unparseable output {lines[-1]!r}"
                    log(last_err)
                else:
                    print(json.dumps(parsed))
                    return
            else:
                last_err = (f"attempt {attempt}: rc={proc.returncode}, "
                            f"stdout tail {lines[-1:] or '(empty)'}")
                log(last_err)
        if attempt < attempts:
            log(f"retrying in {backoff:.0f}s")
            time.sleep(backoff)

    w = _workload()
    print(json.dumps({
        "metric": _metric_name(w),
        "value": 0.0,
        "unit": "fps",
        "vs_baseline": 0.0,
        "error": f"backend unavailable after {attempts} attempts: {last_err}",
    }))


def main():
    if os.environ.get("OGLRT_BENCH_CHILD"):
        run_bench()
    else:
        supervise()


if __name__ == "__main__":
    main()
