"""A/B: FMA slab form (b*inv - o*inv, hoisted o*inv) vs naive (b-o)*inv
in the sub-block kernel's expand phase.

The naive form is sub-then-mul — not an FMA pattern — so each of the 96
bound evaluations per expand costs two VPU issues; the hoisted form is
one fused multiply-subtract per bound plus 3 hoisted muls.  If expand is
issue-bound (phase_cost: 2029 ns/iter isolated) this should save
~0.3-0.5 us of the 8.05 us in-frame iteration.

Same-process interleaved best-of-5 on the 2M-ray sorted bounce proxy and
the primary cast (the _FMA_EXPAND module flag is read at trace time, so
both variants compile side by side).

Usage: python experiments/fma_ab.py

RESULT (TPU v5e, 2026-08-18, interleaved best-of-5):

    bounce/naive: 153.7 ms   bounce/fma: 153.0 ms   (-0.5%)
    primary/naive: 72.1 ms   primary/fma: 71.9 ms   (-0.3%)
    t agreement: 100.0000% on both segments (pop counts differ by
    single digits out of ~800k -- near-tie pruning flips with no hit
    impact)

Far below the issue-count model's ~5% hope: Mosaic evidently already
co-schedules the sub+mul pair, so fusing them frees little.  KEPT
(default on): a small consistent win, 100% hit parity, and the finite
clamped inverses remove the slab test's inf/NaN edge entirely.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np

import opengl_raytracer_tpu.ops.subblock_traversal as sbt
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.presets import (default_objects, DEFAULT_CAM_POS,
                                          DEFAULT_CAM_DIR)
from trav_exp import primary_rays


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def main():
    sc = Scene(default_objects("stanford_minidragon"))
    data = sc.send()
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(1920, 1080, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]
    alive = jnp.ones((R,), bool)

    # advance two bounces for a real bounce-ray distribution, then sort
    ob, db, ab = o, d, alive
    f_adv = jax.jit(lambda o_, d_, a_: sbt.raycast_subblock(
        data, o_, d_, a_, big_pools=True))
    import opengl_raytracer_tpu.ops.rng as rng
    px = jnp.arange(R, dtype=jnp.int32) % 1920
    py = jnp.arange(R, dtype=jnp.int32) // 1920
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    for _ in range(2):
        near = f_adv(ob, db, ab)
        hit = finalize_hit(data, ob, db, near)
        seed2, nd = scatter(seed, hit.normal, db, hit.roughness, True)
        wh = ab & hit.did_hit
        ob = jnp.where(wh[:, None], hit.point + hit.normal * 1e-4, ob)
        db = jnp.where(wh[:, None], nd, db)
        seed = jnp.where(wh, seed2, seed)
        ab = wh & ~(hit.emission > 0.0)
    key = ray_sort_keys(ob, db, data.node_min[0], data.node_max[0], ab)
    perm = jnp.argsort(key)
    ob, db, ab = ob[perm], db[perm], ab[perm]
    ob, db, ab = jax.block_until_ready((ob, db, ab))

    fns = {}
    results = {}
    for name, fma in (("naive", False), ("fma", True)):
        sbt._FMA_EXPAND = fma
        try:
            fns[f"bounce/{name}"] = (jax.jit(
                lambda o_, d_, a_: sbt.raycast_subblock(
                    data, o_, d_, a_, big_pools=True,
                    serve=sbt.SERVE_BOUNCE, debug_iters=True)),
                (ob, db, ab))
            fns[f"primary/{name}"] = (jax.jit(
                lambda o_, d_, a_: sbt.raycast_subblock(
                    data, o_, d_, a_, big_pools=True,
                    serve=sbt.SERVE_PRIMARY, debug_iters=True)),
                (o, d, alive))
            for k in (f"bounce/{name}", f"primary/{name}"):
                f, args = fns[k]
                r = f(*args)  # compile under this flag value
                sync(r[0].t)
                results[k] = r
        finally:
            sbt._FMA_EXPAND = True

    best = {k: 1e9 for k in fns}
    iters = {}
    for rep in range(5):
        for k, (f, args) in fns.items():
            t0 = time.time()
            r = f(*args)
            sync(r[0].t)
            best[k] = min(best[k], time.time() - t0)
            iters[k] = np.asarray(r[1])
    for k in fns:
        it = iters[k]
        print(f"{k}: {best[k]*1000:.1f} ms  iters={int(it[:,0].sum())} "
              f"node={int(it[:,1].sum())} oct={int(it[:,2].sum())}",
              flush=True)

    # hit parity between the two forms (slab rounding may flip near-tie
    # pruning; hits must agree everywhere that matters)
    for seg in ("bounce", "primary"):
        a, b = results[f"{seg}/naive"][0], results[f"{seg}/fma"][0]
        ta, tb = np.asarray(a.t), np.asarray(b.t)
        same = np.isclose(ta, tb, rtol=1e-6, atol=1e-6) | (
            (ta > 1e29) & (tb > 1e29))
        print(f"{seg}: t agreement {same.mean()*100:.4f}%", flush=True)


if __name__ == "__main__":
    main()
