"""Interleaved A/B: ranked serve picks vs the serial mask-and-rescan
chain (_SERVE_RANKED in ops/subblock_traversal.py).

The serve phase picks n_serve done rows per iteration.  The serial form
re-min-reduces after masking out each pick, so pick k+1's (64,1)-reduce
-> scalar round trip waits on pick k's (~0.4 us/slot at 64 rows,
experiments/phase_cost.py).  The ranked form precomputes each done
row's rank with one cumsum and turns the picks into n_serve INDEPENDENT
masked min-reduces whose scalar readbacks overlap.

Measures a primary batch (serve-heavy: ~4 claims/iteration) and a real
bounce-2 batch, interleaved in one process (cross-process numbers drift
~3%, experiments/serve_sweep2.py).

Results recorded after the run below.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

import opengl_raytracer_tpu.ops.subblock_traversal as sbt
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.presets import (DEFAULT_CAM_DIR, DEFAULT_CAM_POS,
                                          default_objects)
from trav_exp import primary_rays

W, H = 1920, 1080
REPS = 4


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o0, d0 = primary_rays(W, H, cam)
    R = o0.shape[0] // 128 * 128
    o0, d0 = o0[:R], d0[:R]
    lo, hi = data.node_min[0], data.node_max[0]
    px = jnp.arange(R, dtype=jnp.int32) % W
    py = jnp.arange(R, dtype=jnp.int32) // W
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    alive0 = jnp.ones((R,), bool)

    @jax.jit
    def advance(o, d, alive, seed):
        near = sbt.raycast_subblock(data, o, d, alive, big_pools=True)
        hit = finalize_hit(data, o, d, near)
        seed2, nd = scatter(seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o2 = jnp.where(was_hit[:, None],
                       hit.point + hit.normal * np.float32(1e-4), o)
        d2 = jnp.where(was_hit[:, None], nd, d)
        alive2 = was_hit & ~(hit.emission > 0.0)
        return o2, d2, alive2, jnp.where(was_hit, seed2, seed)

    @jax.jit
    def sortb(o, d, alive):
        key = ray_sort_keys(o, d, lo, hi, alive)
        s = jax.lax.sort((key, o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2], alive), num_keys=1)
        return (jnp.stack(s[1:4], -1), jnp.stack(s[4:7], -1), s[7])

    o, d, alive = o0, d0, alive0
    for seg in range(2):
        o, d, alive, seed = advance(o, d, alive, seed)
    ob, db, ab = sortb(o, d, alive)
    sync(ob)

    batches = {
        'primary': (o0, d0, alive0, sbt.SERVE_PRIMARY),
        'bounce2': (ob, db, ab, sbt.SERVE_BOUNCE),
    }
    fns = {}
    for ranked in (False, True):
        sbt._SERVE_RANKED = ranked
        for name, (_, _, _, serve) in batches.items():
            fns[(ranked, name)] = jax.jit(
                lambda o_, d_, a_, s_=serve, r_=ranked: sbt.raycast_subblock(
                    data, o_, d_, a_, big_pools=True, serve=s_)
            )
            # trace now so the flag value is baked per jit
            o_, d_, a_, _ = batches[name]
            sync(fns[(ranked, name)](o_, d_, a_).t)
    sbt._SERVE_RANKED = False

    for name in batches:
        o_, d_, a_, _ = batches[name]
        res = {False: [], True: []}
        for _ in range(REPS):
            for ranked in (False, True):
                t0 = time.perf_counter()
                near = fns[(ranked, name)](o_, d_, a_)
                sync(near.t)
                res[ranked].append((time.perf_counter() - t0) * 1e3)
        for ranked in (False, True):
            print(f"{name} ranked={ranked}: "
                  + " ".join(f"{t:.1f}" for t in res[ranked]) + " ms",
                  flush=True)
        a = fns[(False, name)](o_, d_, a_)
        b = fns[(True, name)](o_, d_, a_)
        dt = np.abs(np.asarray(a.t) - np.asarray(b.t))
        print(f"  max |dt| = {dt[np.isfinite(dt)].max():.3g}", flush=True)


if __name__ == "__main__":
    main()
