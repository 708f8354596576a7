"""N_SERVE sweep: how many rows to serve/claim per kernel iteration.

With the DP-collapsed tables, primary-ray iterations sit near the
serve-rate floor (3779 iters vs the 16200-packet / N_SERVE=5 floor of
3240), so serving more rows per iteration looked like a primary-raycast
win.  It is — but serving is NOT free (each serve_one adds ~13 dynamic
row stores and SMEM ops to the spine), and bounce rays (not serve-bound
at ~9000 iters) pay that cost for nothing:

RESULT (TPU v5e, 2026-08-17, 2M rays, minidragon DP tables, pool 16384):
  N_SERVE= 5  primary:  78.6 ms (3779 it)   bounce: 126.3 ms (8991 it)
  N_SERVE= 6  primary:  79.2 ms (3402 it)   bounce: 129.6 ms (8954 it)
  N_SERVE= 8  primary:  75.2 ms (3006 it)   bounce: 131.3 ms (8934 it)
  N_SERVE=10  primary:  76.5 ms (2905 it)   bounce: 134.6 ms (8930 it)

Frame mix (1 primary + 4 bounce segments): N=5 -> 584 ms of raycast,
N=8 -> 600 ms.  KEEP N_SERVE=5; revisit only if bounce segments ever
become serve-bound (e.g. much denser tables or wider instances).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np

import opengl_raytracer_tpu.ops.subblock_traversal as sbt
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def bench(label, f, *args, reps=3):
    r = f(*args); sync(r[0].t)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = f(*args); sync(r[0].t)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms, iters {np.asarray(r[1])}", flush=True)


def main():
    sc = Scene(default_objects("stanford_minidragon"))
    data = sc.send()
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(1920, 1080, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]
    rng = np.random.default_rng(1)
    lo = np.asarray(data.node_min[0]); hi = np.asarray(data.node_max[0])
    ob = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
    db = rng.normal(size=(R, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db = jnp.asarray(db)
    key = ray_sort_keys(ob, db, data.node_min[0], data.node_max[0])
    perm = jnp.argsort(key)
    ob, db = ob[perm], db[perm]

    ref = None
    for ns in (5, 6, 8, 10):
        sbt.N_SERVE = ns
        f = jax.jit(lambda a, b: sbt.raycast_subblock(
            data, a, b, big_pools=True, debug_iters=True))
        r = f(ob[:65536], db[:65536])
        t = np.asarray(r[0].t)
        if ref is None:
            ref = t
        else:
            assert (np.abs(ref - t) <= 1e-4 * np.maximum(1, np.abs(ref))).all()
        bench(f"N_SERVE={ns:2d} primary", f, o, d)
        bench(f"N_SERVE={ns:2d} bounce ", f, ob, db)
    sbt.N_SERVE = 5


if __name__ == "__main__":
    main()
