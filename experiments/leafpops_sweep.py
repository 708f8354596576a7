"""Round-3 kernel op-count sweep (run on the TPU): octet pops per
iteration (2 vs 3) x octet-stack lanes (256 vs 128).

Rationale: leaf-bound bounce packets drain the octet stack at
``leaf_pops``/iteration, so a third pop cuts iteration count ~1/3 for one
more leaf phase per iteration (dual pops were a clear round-2 win); the
push phase's one-hot writes scale with stack lanes, so a 128-lane octet
stack halves the (64, STACK_L) term of the push cost if the extra node-pop
throttling doesn't inflate iterations.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax, jax.numpy as jnp, numpy as np

import opengl_raytracer_tpu.ops.subblock_traversal as sbt
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.traversal import raycast_packet
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
    leaf = int(np.asarray(data.node_count).max())
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

    # compiled parity of leaf_pops=3 on a 64k subset
    n = 65536
    f_pkt = jax.jit(lambda a, b: raycast_packet(data, a, b, max_leaf_tris=leaf))
    ref = f_pkt(ob[:n], db[:n])
    t_ref = np.asarray(ref.t)

    results = {}
    for stack_l in (256, 128):
        sbt.STACK_L = stack_l
        for lp in (2, 3):
            tag = f"S{stack_l}/p{lp}"
            f = jax.jit(partial(
                lambda a, b, lp=lp: sbt.raycast_subblock(data, a, b,
                                                         leaf_pops=lp)))
            nb = f(ob[:n], db[:n])
            bad = np.abs(t_ref - np.asarray(nb.t)) > 1e-5 * np.maximum(
                1, np.abs(t_ref))
            print(f"{tag} parity mismatches {bad.sum()}/{n}", flush=True)
            assert bad.sum() == 0, tag
            tp = bench(f"{tag} primary 2M", f, o, d)
            tb = bench(f"{tag} bounce  2M", f, ob, db)
            results[tag] = (tp, tb)
    sbt.STACK_L = 256

    base = results["S256/p2"]
    for tag, (tp, tb) in results.items():
        print(f"{tag}: primary {tp/base[0]:.3f}x  bounce {tb/base[1]:.3f}x "
              f"(rel S256/p2)")


if __name__ == "__main__":
    main()
