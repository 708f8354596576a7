"""Hardware parity + timing for the sub-block kernel (run on the TPU).

Compares raycast_subblock (compiled, NOT interpret) against the XLA packet
traversal on the minidragon scene over primary and scrambled bounce-like
rays, then times 2M-ray raycasts for pallas vs pallas2.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.ops.traversal import raycast_packet
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
    leaf = int(np.asarray(data.node_count).max())
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(1920, 1080, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]

    # parity on a 64k subset (packet path is slow)
    n = 65536
    op, dp_ = o[:n], d[:n]
    f_pkt = jax.jit(lambda a, b: raycast_packet(data, a, b, max_leaf_tris=leaf))
    f_sb = jax.jit(lambda a, b: raycast_subblock(data, a, b))
    np_, nb = f_pkt(op, dp_), f_sb(op, dp_)
    t_ref, t_new = np.asarray(np_.t), np.asarray(nb.t)
    tri_ref, tri_new = np.asarray(np_.tri), np.asarray(nb.tri)
    bad_t = np.abs(t_ref - t_new) > 1e-5 * np.maximum(1, np.abs(t_ref))
    print(f"parity primaries: t mismatches {bad_t.sum()}/{n}, "
          f"tri mismatches {(tri_ref != tri_new)[~bad_t].sum()}", flush=True)
    assert bad_t.sum() == 0

    # scrambled (bounce-like) rays: random origins inside scene + dirs
    rng = np.random.default_rng(1)
    lo = np.asarray(data.node_min[0]); hi = np.asarray(data.node_max[0])
    ob = jnp.asarray(rng.uniform(lo, hi, (n, 3)).astype(np.float32))
    db = rng.normal(size=(n, 3)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db = jnp.asarray(db)
    key = ray_sort_keys(ob, db, data.node_min[0], data.node_max[0])
    perm = jnp.argsort(key)
    ob, db = ob[perm], db[perm]
    np_, nb = f_pkt(ob, db), f_sb(ob, db)
    t_ref, t_new = np.asarray(np_.t), np.asarray(nb.t)
    bad_t = np.abs(t_ref - t_new) > 1e-5 * np.maximum(1, np.abs(t_ref))
    print(f"parity bounce-like: t mismatches {bad_t.sum()}/{n}", flush=True)
    assert bad_t.sum() == 0

    # timing at 2M rays
    f1 = jax.jit(lambda a, b: raycast_pallas(data, a, b, max_leaf_tris=leaf))
    f2 = jax.jit(lambda a, b: raycast_subblock(data, a, b))
    bench("pallas  primary 2M", f1, o, d)
    bench("pallas2 primary 2M", f2, o, d)

    obig = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
    dbig = rng.normal(size=(R, 3)).astype(np.float32)
    dbig /= np.linalg.norm(dbig, axis=1, keepdims=True)
    dbig = jnp.asarray(dbig)
    key = ray_sort_keys(obig, dbig, data.node_min[0], data.node_max[0])
    perm = jnp.argsort(key)
    obig, dbig = jax.block_until_ready((obig[perm], dbig[perm]))
    bench("pallas  scrambled-sorted 2M", f1, obig, dbig)
    bench("pallas2 scrambled-sorted 2M", f2, obig, dbig)


if __name__ == "__main__":
    main()
