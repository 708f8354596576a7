"""128-row kernel instance under the whole-batch pool (run on TPU).

Round 2 stopped at 64 rows because 128 exceeded the 16 MB scoped-VMEM
budget with the then-current window accounting; with big_pools the
windows live in general VMEM and scoped holds only stacks/scratch
(~2x 200 KB at 128 rows), so 128 rows may now fit — doubling the
spine amortization (8->64 rows measured 213->171.5 ms on the bounce
proxy).  N_SERVE scales with rows (serve demand ~rows/13).

RESULT (TPU v5e, 2026-08-17): FLAT — 64/96/128 rows measured
132.0 / 131.3 / 133.5 ms on the 2M-ray sorted bounce proxy with the
whole-batch pool.  The serial spine is fully amortized at 64 rows;
keep _SUB=64 (don't revisit).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

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
    r = f(*args); sync(r.t)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = f(*args); sync(r.t)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)
    return r


def main():
    sc = Scene(default_objects('stanford_minidragon'))
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

    ref_t = None
    for rows, n_serve in ((64, 5), (96, 8), (128, 10)):
        sbt._SUB = rows
        sbt._SCR = rows + 8
        sbt.N_SERVE = n_serve
        tag = f"rows {rows}"
        try:
            f = jax.jit(partial(
                lambda a, b: sbt.raycast_subblock(data, a, b,
                                                  big_pools=True)))
            nb = f(ob[:65536], db[:65536])
            tvals = np.asarray(nb.t)
            if ref_t is None:
                ref_t = tvals
            else:
                bad = np.abs(ref_t - tvals) > 1e-5 * np.maximum(
                    1, np.abs(ref_t))
                assert bad.sum() == 0, f"{tag} parity {bad.sum()}"
                print(f"{tag} parity ok", flush=True)
            bench(f"{tag} primary 2M", f, o, d)
            bench(f"{tag} bounce  2M", f, ob, db)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    sbt._SUB, sbt._SCR, sbt.N_SERVE = 64, 72, 5


if __name__ == "__main__":
    main()
