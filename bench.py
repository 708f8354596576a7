"""Benchmark harness: fps / Mrays/s on the BASELINE.json headline config.

Runs the reference's default scene (main.py:19-111, minidragon standing in
for the stripped mediumdragon unless OGLRT_BENCH_DRAGON points elsewhere)
at 1920x1080 with 4 bounces on whatever accelerator JAX finds, and prints
ONE JSON line:

    {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}

vs_baseline is measured against the BASELINE.json north-star of 30 fps at
1080p/4-bounce on one TPU v5e chip.  Extra detail (Mrays/s, timings) goes
to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax

    from opengl_raytracer_tpu.models.scene import Scene
    from opengl_raytracer_tpu.ops.camera import make_camera
    from opengl_raytracer_tpu.presets import (
        DEFAULT_CAM_DIR,
        DEFAULT_CAM_POS,
        default_objects,
    )
    from opengl_raytracer_tpu.renderer import Renderer
    from opengl_raytracer_tpu.utils.config import RenderConfig

    width = int(os.environ.get("OGLRT_BENCH_WIDTH", 1920))
    height = int(os.environ.get("OGLRT_BENCH_HEIGHT", 1080))
    bounces = int(os.environ.get("OGLRT_BENCH_BOUNCES", 4))
    dragon = os.environ.get("OGLRT_BENCH_DRAGON", "stanford_minidragon")
    warmup = int(os.environ.get("OGLRT_BENCH_WARMUP", 2))
    iters = int(os.environ.get("OGLRT_BENCH_ITERS", 8))

    log(f"devices: {jax.devices()}")
    config = RenderConfig(width=width, height=height, bounces=bounces)

    t0 = time.time()
    scene = Scene(default_objects(dragon), max_leaf_tris=config.max_leaf_tris)
    log(f"scene: {scene.total_triangles:,} tris, {scene.total_boxes:,} BVH nodes, "
        f"built in {time.time() - t0:.2f}s")

    n_dev = len(jax.devices())
    if n_dev > 1 and height % n_dev == 0:
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

    fps = 1.0 / dt
    primary_rays = width * height * config.rays_per_pixel
    mrays = primary_rays * fps / 1e6
    log(f"steady state: {dt * 1000:.1f} ms/frame, {fps:.2f} fps, "
        f"{mrays:.1f} Mrays/s primary (x{config.n_bounces} bounce segments max)")

    out_png = os.environ.get("OGLRT_BENCH_PNG")
    if out_png:
        from opengl_raytracer_tpu.utils.image import save_png
        save_png(out_png, renderer.image(state))
        log(f"wrote {out_png}")

    print(json.dumps({
        "metric": f"fps at {width}x{height}/{bounces}-bounce on {dragon}",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
