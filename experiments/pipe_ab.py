"""A/B: early-pop (software-pipelined) kernel vs the plain body.

Interleaved same-process best-of timing (process-to-process frame times
drift ~3%; only interleaved A/Bs are valid under 5%).  Measures the
2M-ray sorted bounce proxy and the primary cast, both with big pools —
the same shapes the renderer's segments run.

RESULT (TPU v5e, 2026-08-18, after fixing the i1-vector-carry Mosaic
legalization failure by carrying the four masks as int32):

    bounce/plain: 153.4 ms  iters=13383 node=791270 oct=1158366
    primary/plain: 71.5 ms  iters=3006 node=153695 oct=96985
    bounce/pipe: 155.7 ms   (identical pop counts)
    primary/pipe: 71.6 ms   (identical pop counts)

The early-pop variant is a measured LOSS (-1.5% bounce, flat primary):
Mosaic already overlaps the scalar spine with the vector phases, so the
pipelined body's extra loop carries only cost registers.  The variant
was DELETED from ops/subblock_traversal.py after this run; the script is
kept as the measurement record and NO LONGER RUNS at HEAD (the
``pipelined=`` kwarg is gone).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.subblock_traversal import (SERVE_BOUNCE,
                                                         SERVE_PRIMARY,
                                                         raycast_subblock)
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
    f_adv = jax.jit(lambda o_, d_, a_: raycast_subblock(
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
    for name, pipe in (("plain", False), ("pipe", True)):
        fns[f"bounce/{name}"] = (jax.jit(lambda o_, d_, a_, p=pipe: raycast_subblock(
            data, o_, d_, a_, big_pools=True, serve=SERVE_BOUNCE,
            pipelined=p, debug_iters=True)), (ob, db, ab))
        fns[f"primary/{name}"] = (jax.jit(lambda o_, d_, a_, p=pipe: raycast_subblock(
            data, o_, d_, a_, big_pools=True, serve=SERVE_PRIMARY,
            pipelined=p, debug_iters=True)), (o, d, alive))

    # warm
    for k, (f, args) in fns.items():
        r = f(*args)
        sync(r[0].t)
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


if __name__ == "__main__":
    main()
