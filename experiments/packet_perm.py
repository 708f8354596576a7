"""Packet-granularity reordering vs full per-ray sort (run on TPU).

The multi-operand reorder sort costs ~19.5 ms x4/frame and is
comparison-bound (2-col == 14-col cost; windowed sorts neutral).  Rays
are traversed in fixed 128-ray packets, so ordering only matters at two
scales: which rays share a packet (within-128 grouping) and which packets
are adjacent (pool order barely matters — each row owns its packet).
This measures how much of the full sort's traversal win survives when we
only PERMUTE WHOLE PACKETS by a representative key (a 16K-element sort +
row-granularity gathers ~5 ms) without regrouping rays across packets —
on the REAL bounce-ray distribution (integrator advanced one segment from
primaries, reordered globally first so packets start screen-coherent like
production).

RESULT (TPU v5e, 2026-08-17): packet permutation is USELESS —
  full-ray sort   bounce: 141.4 ms
  packet-perm     bounce: 319.2 ms   (== unsorted 318.6)
  full 15-col sort cost:   27.6 ms
  packet-perm 15-col cost: 24.6 ms
Two lessons: (1) the entire traversal win comes from regrouping rays
WITHIN 128-ray packets (bounce-1 rays derived from screen-coherent
packets are already as packet-ordered as a packet permutation can make
them); (2) even row-granularity (P,128) gathers of 15 columns cost ~as
much as the full multi-operand bitonic sort — permutation-based sorts
(radix/bucket) cannot beat lax.sort on TPU because applying the
permutation IS the dominant cost.  The multi-operand sort stays.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax, jax.numpy as jnp, numpy as np

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def bench(label, f, *args, reps=3):
    r = f(*args); sync(r.t if hasattr(r, 't') else r[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = f(*args)
        sync(r.t if hasattr(r, 't') else r[0])
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
    lo, hi = data.node_min[0], data.node_max[0]

    f_ray = jax.jit(lambda a, b, act: raycast_subblock(
        data, a, b, act, big_pools=True))

    # Advance one real bounce from the primaries (production-like).
    @jax.jit
    def one_bounce(o, d):
        px = jnp.arange(R, dtype=jnp.int32) % 1920
        py = jnp.arange(R, dtype=jnp.int32) // 1920
        seed = rng.warmup(rng.seed_pixels(px, py, jnp.int32(0)), 3)
        near = raycast_subblock(data, o, d, None, big_pools=True)
        hit = finalize_hit(data, o, d, near)
        seed2, nd = scatter(seed, hit.normal, d, hit.roughness, True)
        alive = hit.did_hit & ~(hit.emission > 0.0)
        no = jnp.where(hit.did_hit[:, None],
                       hit.point + hit.normal * np.float32(1e-4), o)
        nd = jnp.where(hit.did_hit[:, None], nd, d)
        return no, nd, alive

    ob, db, alive = one_bounce(o, d)
    keys = ray_sort_keys(ob, db, lo, hi, alive)

    # (a) full per-ray sort
    perm = jnp.argsort(keys)
    oa, da, aa = ob[perm], db[perm], alive[perm]
    bench("full-ray sort   bounce", f_ray, oa, da, aa)

    # (b) packet permutation only: packets formed by the CURRENT (screen
    # block) order, sorted by their min key
    P = R // 128
    kmin = keys.reshape(P, 128).min(axis=1)
    pperm = jnp.argsort(kmin)
    def permute_rows(x):
        return x.reshape(P, 128, -1)[pperm].reshape(x.shape)
    op_ = permute_rows(ob)
    dp_ = permute_rows(db)
    ap_ = permute_rows(alive[:, None].astype(jnp.float32))[:, 0] > 0.5
    bench("packet-perm     bounce", f_ray, op_, dp_, ap_)

    # (c) unsorted (screen-block order straight from the bounce)
    bench("unsorted        bounce", f_ray, ob, db, alive)

    # cost of the machinery itself
    cols = [ob[:, 0], ob[:, 1], ob[:, 2], db[:, 0], db[:, 1], db[:, 2],
            alive.astype(jnp.float32)] + [ob[:, 0]] * 8
    @jax.jit
    def full_sort_cost(keys, *cols):
        outs = jax.lax.sort((keys,) + cols, num_keys=1)
        return outs[1], outs[0]
    @jax.jit
    def packet_perm_cost(keys, *cols):
        kmin = keys.reshape(P, 128).min(axis=1)
        pp = jnp.argsort(kmin)
        outs = tuple(c.reshape(P, 128)[pp].reshape(-1) for c in cols)
        return outs[0], keys
    bench("full 15-col sort cost", full_sort_cost, keys, *cols)
    bench("packet-perm 15-col cost", packet_perm_cost, keys, *cols)


if __name__ == "__main__":
    main()
