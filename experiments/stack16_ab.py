"""A/B: packed int16 stacks + gate-folded push one-hots vs i32 stacks.

The push phase (one-hot scatter of up to 8 candidates into the (64,128)
node and (64,256) leaf-octet stacks) is the widest kernel phase
(phase_cost: 3726 ns/iter isolated).  Two changes:

1. gate folding — ungated candidates get position sentinel -1, so each
   one-hot term is ONE full-width compare instead of compare + AND
   (applies to both dtypes);
2. int16 stacks — every stack value fits 16 bits (node indices < 2^14,
   leaf entries > -2^14-1, positions < 256); Mosaic packs 16-bit lanes
   (16,128) per vreg, halving the vreg count of the one-hot compare /
   subtract / select / add-tree and the stack load/stores.

Same-process interleaved best-of-5 on the 2M-ray sorted bounce proxy and
the primary cast (_STACK_I16 is read at trace time).

Usage: python experiments/stack16_ab.py

RESULT (TPU v5e, 2026-08-18): int16 stacks are CLOSED BY HARDWARE — the
v5e Mosaic target rejects packed 16-bit integer compares ("Target does
not support this comparison"), so the i16 one-hot compare cannot lower.
(bf16 lanes can't carry the values either: bf16 integers are exact only
to 256, node indices reach 2^14.)  Interpret-mode parity passes
(tests/test_subblock.py, 12/12 with _STACK_I16=True); the flag stays
for future TPU generations, default False.

The GATE-FOLD half of the change (position sentinel -1 instead of
compare + AND per one-hot term, dtype-independent) compiles and ships:
bounce proxy 151.4-152.0 ms vs 153.0-153.7 pre-fold (~1%, at the
cross-process measurement floor), hit parity 100%.
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
    for name, i16 in (("i32", False), ("i16", True)):
        sbt._STACK_I16 = i16
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
            sbt._STACK_I16 = True

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

    for seg in ("bounce", "primary"):
        a, b = results[f"{seg}/i32"][0], results[f"{seg}/i16"][0]
        ta, tb = np.asarray(a.t), np.asarray(b.t)
        np.testing.assert_array_equal(ta, tb)
        print(f"{seg}: t BIT-IDENTICAL", flush=True)


if __name__ == "__main__":
    main()
