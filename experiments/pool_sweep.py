"""Pool-size sweep on minidragon tables (run on TPU, under jit).

Round-2 measured the end-of-pool drain tail at ~35% overhead (593
sub-iters/step vs the 440 ideal at 8 packets/row) and pool 1024 a further
-11% on the bounce proxy, but shipped POOL_BIG=640 because 768+ OOMed
scoped VMEM in the worst (eager) call context.  Production raycasts run
under jit, where the accounting is leaner — this measures how far the
pool can go there with real (minidragon ~3 MB) tables, to justify a
table-size-tiered pool.
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
    return best


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    tb = data.p2_node_rows.nbytes + data.p2_tri_rows.nbytes
    print(f"tables: {tb/1e6:.2f} MB "
          f"({data.p2_node_rows.shape[0]} node rows, "
          f"{data.p2_tri_rows.shape[0]} tri rows)", flush=True)
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
    for pool in (640, 768, 1024, 1280, 2048):
        sbt.POOL_BIG = pool
        sbt.POOL_BIG_TABLE_BYTES = 64 * 1024 * 1024  # force the tier
        try:
            f = jax.jit(partial(
                lambda a, b: sbt.raycast_subblock(data, a, b)))
            nb = f(ob[:65536], db[:65536])
            tvals = np.asarray(nb.t)
            if ref_t is None:
                ref_t = tvals
            else:
                bad = np.abs(ref_t - tvals) > 1e-5 * np.maximum(1, np.abs(ref_t))
                assert bad.sum() == 0, f"pool {pool} parity {bad.sum()}"
            bench(f"pool {pool} primary 2M", f, o, d)
            bench(f"pool {pool} bounce  2M", f, ob, db)
        except Exception as e:
            print(f"pool {pool}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    sbt.POOL_BIG = 640
    sbt.POOL_BIG_TABLE_BYTES = 4 * 1024 * 1024


if __name__ == "__main__":
    main()
