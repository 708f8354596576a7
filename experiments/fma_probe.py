"""FMA slab-phase probe (run on TPU).

The expand phase's slab times were rewritten from the 2-op form
``(bound - o) * inv`` to the FMA form ``bound * inv + (-o * inv)`` with
the three negated products hoisted per iteration: 48 of the phase's ~136
full-tile ops become single fused multiply-adds if Mosaic emits them as
such.  Rounding differs in the last ulp, which can flip a node visit only
for rays grazing a bbox plane — so parity vs the packet path is checked
at 1e-5 relative tolerance (the suite's standard), not ulp-exact.

Measures the standard 2M-ray primary and sorted-bounce proxies with
big_pools (the production jit context).

RESULT (TPU v5e, 2026-08-17): NEUTRAL and reverted — bounce 123.2 ms vs
123.6 committed, primary 75.9 vs ~75; parity 0 mismatches.  Mosaic
evidently already emits these chains at full rate (either it fuses the
sub+mul, or the expand phase is not ALU-issue-bound at the margin), so
the restructured form buys nothing and the clearer (bound - o) * inv
stays.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax, jax.numpy as jnp, numpy as np

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.ops.traversal import raycast_packet
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def bench(label, f, *args, reps=5):
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

    f_sb = jax.jit(partial(lambda a, b: raycast_subblock(data, a, b,
                                                         big_pools=True)))
    # parity on 64k primaries + 64k bounce-like vs the packet path
    n = 65536
    f_pkt = jax.jit(lambda a, b: raycast_packet(data, a, b, max_leaf_tris=leaf))
    for tag, (a, b) in (("primary", (o[:n], d[:n])),
                        ("bounce", (ob[:n], db[:n]))):
        rp, rs = f_pkt(a, b), f_sb(a, b)
        t_ref, t_new = np.asarray(rp.t), np.asarray(rs.t)
        bad = np.abs(t_ref - t_new) > 1e-5 * np.maximum(1, np.abs(t_ref))
        print(f"parity {tag}: t mismatches {bad.sum()}/{n}", flush=True)
        assert bad.sum() == 0, f"{tag}: {bad.sum()}"

    bench("fma primary 2M", f_sb, o, d)
    bench("fma bounce  2M", f_sb, ob, db)


if __name__ == "__main__":
    main()
