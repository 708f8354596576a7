"""Does difficulty-first packet ordering cut the end-of-pool drain?

The kernel's rows claim packets in pool order; a heavy packet claimed
LAST leaves 63 rows idling while one row grinds (measured sub-iters/step
~27% above the work ideal).  If heavy packets are claimed FIRST, the
light tail overlaps the stragglers.

Difficulty proxy (no oracle knowledge): the spread of the coherence sort
key within the packet — incoherent packets traverse bigger unions.

Variants on the same sorted bounce-like 2M rays:
  baseline   : packets in sort order (what the integrator does today)
  heavy-first: packets sorted by descending key spread, dealt round-robin
               across grid steps so every step gets an equal mix
  oracle     : packets sorted by descending MEASURED per-packet
               iteration need (upper bound for this lever)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.subblock_traversal import (
    raycast_subblock, POOL_BIG)
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from opengl_raytracer_tpu.ops.camera import make_camera
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
    # trim to an exact multiple of the big pool so the round-robin deal
    # aligns with the kernel's per-step pool slices (no pad packets)
    from opengl_raytracer_tpu.ops.subblock_traversal import POOL_BIG as _PB
    R = (R // (128 * _PB)) * (128 * _PB)
    o, d = o[:R], d[:R]

    # scrambled + re-sorted = the integrator's bounce-ray stand-in
    rng = np.random.default_rng(0)
    perm = rng.permutation(R)
    o, d = o[perm], d[perm]
    lo, hi = data.node_min[0], data.node_max[0]
    key = ray_sort_keys(o, d, lo, hi)
    order = jnp.argsort(key)
    o, d = jax.block_until_ready((o[order], d[order]))
    key_s = np.asarray(key)[np.asarray(order)]

    P = R // 128
    pool = POOL_BIG
    grid = P // pool

    f = jax.jit(lambda a, b: raycast_subblock(data, a, b))
    f_dbg = jax.jit(lambda a, b: raycast_subblock(data, a, b,
                                                  debug_iters=True))

    def run(label, pk_order):
        """pk_order: (P,) packet permutation (difficulty rank -> packet)."""
        r = np.arange(P)
        pos = (r % grid) * pool + r // grid   # deal ranks across steps
        g = np.zeros(P, np.int64)
        g[pos] = pk_order
        ridx = (g[:, None] * 128 + np.arange(128)[None]).reshape(-1)
        o2 = jnp.asarray(np.asarray(o)[ridx])
        d2 = jnp.asarray(np.asarray(d)[ridx])
        (near, iters) = f_dbg(o2, d2)
        it = np.asarray(iters)
        bench(label, f, o2, d2)
        print(f"    iters/step mean={it.mean():.0f} max={it.max()}",
              flush=True)
        return near

    # baseline
    base = run("baseline   ", np.arange(P, dtype=np.int64))

    # heavy-first by key spread
    kp = key_s[:P * 128].reshape(P, 128)
    spread = kp.max(1).astype(np.int64) - kp.min(1).astype(np.int64)
    run("heavy-first", np.argsort(-spread, kind="stable"))

    # oracle: measured per-packet iteration need = run each packet's rays
    # alone? too slow -- approximate with per-packet union size via the
    # CPU DFS on a sample? Instead use the spread oracle refined by alive
    # (all rays alive here) -- skip; spread is the deployable signal.


if __name__ == "__main__":
    main()
