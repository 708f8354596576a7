"""Interleaved A/B: dual node pops (node_pops=2) vs single, on the REAL
bounce-ray distribution.

Motivation (frame_breakdown, round 3): 1080p bounce segments are
NODE-POP-BOUND — 54 node pops vs 78/2 = 39 octet-pop demand per packet,
iterations ~52 track the node pops.  A second node pop halves the node
bound (27) at the cost of one extra expand + a 16-candidate push per
iteration; the modeled win is ~6% on bounce segments, rising to ~19% if
the leaf tables then re-chunk to 10-tri rows (octet demand 31).

Method: advance the integrator to bounce 2 (seg0+seg1), sort, then
alternate timed raycasts of the SAME sorted batch with node_pops=1 and 2
(tunnel drift makes sequential cross-process comparisons lie by ~3%,
experiments/serve_sweep2.py).

Result (2026-08-17, v5e, bounce-2 batch 1.95M alive, interleaved):

    node_pops=1: 154.2/153.3/156.6 ms  iters=13383  node=791k  oct=1158k
    node_pops=2: 176.1/175.8/176.3 ms  iters=12783  node=913k  oct=1461k

-> dual node pops LOSE 14%: expanding the 2nd-best stack entry before
the best's subtree has tightened bt DEGRADES t-pruning (node pops +15%,
octet pops +26%), so iterations only drop 4.5% while the iteration pays
a 2nd expand + 16-candidate push.  The node-bound analysis was right
about the bound and wrong about it being free to widen: pop width
trades directly against pruning quality.  Hits stay bit-identical.
NODE_POPS stays 1.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops.subblock_traversal import (SERVE_BOUNCE,
                                                         raycast_subblock)
from opengl_raytracer_tpu.presets import (DEFAULT_CAM_DIR, DEFAULT_CAM_POS,
                                          default_objects)
from trav_exp import primary_rays

W, H = 1920, 1080
REPS = 4


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]
    lo, hi = data.node_min[0], data.node_max[0]
    px = jnp.arange(R, dtype=jnp.int32) % W
    py = jnp.arange(R, dtype=jnp.int32) // W
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    alive = jnp.ones((R,), bool)

    fns = {np_: jax.jit(lambda o_, d_, a_, np__=np_: raycast_subblock(
        data, o_, d_, a_, big_pools=True, serve=SERVE_BOUNCE,
        node_pops=np__, debug_iters=True)) for np_ in (1, 2)}

    @jax.jit
    def advance(o, d, alive, seed):
        near = raycast_subblock(data, o, d, alive, big_pools=True)
        hit = finalize_hit(data, o, d, near)
        seed2, nd = scatter(seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o2 = jnp.where(was_hit[:, None],
                       hit.point + hit.normal * np.float32(1e-4), o)
        d2 = jnp.where(was_hit[:, None], nd, d)
        alive2 = was_hit & ~(hit.emission > 0.0)
        return o2, d2, alive2, jnp.where(was_hit, seed2, seed)

    @jax.jit
    def sortb(o, d, alive):
        key = ray_sort_keys(o, d, lo, hi, alive)
        s = jax.lax.sort((key, o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2], alive), num_keys=1)
        return (jnp.stack(s[1:4], -1), jnp.stack(s[4:7], -1), s[7])

    for seg in range(2):
        o, d, alive, seed = advance(o, d, alive, seed)
    o_s, d_s, a_s = sortb(o, d, alive)
    sync(o_s)
    print(f"bounce-2 batch: {int(jnp.sum(a_s))/1e6:.2f}M alive", flush=True)

    # warm both kernels, then interleave
    res = {1: [], 2: []}
    iters = {}
    for np_ in (1, 2):
        near, it = fns[np_](o_s, d_s, a_s)
        sync(near.t)
        iters[np_] = np.asarray(it)
    for _ in range(REPS):
        for np_ in (1, 2):
            t0 = time.perf_counter()
            near, it = fns[np_](o_s, d_s, a_s)
            sync(near.t)
            res[np_].append((time.perf_counter() - t0) * 1e3)
    for np_ in (1, 2):
        it = iters[np_]
        print(f"node_pops={np_}: "
              + " ".join(f"{t:.1f}" for t in res[np_])
              + f" ms | iters={int(it[:, 0].sum())}"
              f" node_pops={int(it[:, 1].sum())}"
              f" oct_pops={int(it[:, 2].sum())}", flush=True)
    # hit parity spot check
    a = fns[1](o_s, d_s, a_s)[0]
    b = fns[2](o_s, d_s, a_s)[0]
    dt = np.abs(np.asarray(a.t) - np.asarray(b.t))
    print(f"max |dt| = {dt[np.isfinite(dt)].max():.3g}", flush=True)


if __name__ == "__main__":
    main()
