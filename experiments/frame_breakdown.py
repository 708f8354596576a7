"""Where does the 1080p/4-bounce frame go? (round-2, post dual-octet)

Measures, on the REAL bounce-ray distribution (integrator advanced
segment by segment on the default minidragon scene):
  * per-segment pallas2 raycast time, its while-loop iteration counts
    (debug_iters), and the implied per-iteration cost
  * the non-traversal pieces at 2M rays: sort keys + multi-operand sort,
    finalize_hit, scatter, progressive-merge
  * (round 5) per-dp=8-strip alive counts — the load-imbalance input of
    the multi-chip scaling model (experiments/dp_overhead.py)

RESULT (round-5 HEAD, TPU v5e, 2026-08-19; standalone timings carry the
~30 ms dispatch tunnel — in-frame times are in trace_step.py):

    seg  live_pkts  sub-iters  node/pkt  oct/pkt  strip max/mean
    0      16200      2563        5.2      4.6       1.016
    1      15943      9266       29.7     46.4       1.035
    2      15224     11570       43.7     68.8       1.038
    3      14707     11489       45.3     70.8       1.043
    4      14191     11292       46.1     72.4       1.048

    Totals/frame: 46,180 sub-iterations (370.8 ms in-frame kernel time
    -> 8.03 us/iter, matching the round-4 8.05), 2.543M node pops =
    2.60G ray-box tests, 3.930M octet pops = 4.03G ray-triangle tests,
    9.76M ray-segments.  These feed the roofline arithmetic (STATUS.md)
    and the dp=8 imbalance bound (<= +4.8%, worst segment).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

W, H, BOUNCES = 1920, 1080, 4


def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[:4].astype(jnp.float32)))


def timeit(label, f, *args, reps=3):
    r = f(*args)
    sync(jax.tree_util.tree_leaves(r)[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = f(*args)
        sync(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)
    return r, best


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

    # segment-tuned serve rates (renderer.make_raycast_fn): primaries are
    # claim-rate-bound, bounce packets last ~52 iterations.  NODE_POPS=2
    # in the environment A/Bs the dual-node-pop kernel.
    from opengl_raytracer_tpu.ops.subblock_traversal import (SERVE_BOUNCE,
                                                             SERVE_PRIMARY)
    npops = int(os.environ.get('NODE_POPS', '1'))
    f_rc0 = jax.jit(lambda o_, d_, a_: raycast_subblock(
        data, o_, d_, a_, debug_iters=True, big_pools=True,
        serve=SERVE_PRIMARY, node_pops=npops))
    f_rcb = jax.jit(lambda o_, d_, a_: raycast_subblock(
        data, o_, d_, a_, debug_iters=True, big_pools=True,
        serve=SERVE_BOUNCE, node_pops=npops))

    def sort3(o, d, alive, seed):
        # the integrator's full 16-operand reorder sort (key + o3 + d3 +
        # ray_color3 + incoming3 + alive + seed + orig)
        key = ray_sort_keys(o, d, lo, hi, alive)
        dummy = o[:, 0]
        orig = jnp.arange(o.shape[0], dtype=jnp.int32)
        s = jax.lax.sort((key, o[:, 0], o[:, 1], o[:, 2],
                          d[:, 0], d[:, 1], d[:, 2],
                          dummy, dummy, dummy, dummy, dummy, dummy,
                          alive, seed, orig), num_keys=1)
        return (jnp.stack(s[1:4], -1), jnp.stack(s[4:7], -1), s[13])

    f_sort = jax.jit(sort3)

    for b in range(BOUNCES + 1):
        n_alive = int(jnp.sum(alive))
        (o_s, d_s, a_s), t_sort = timeit(f"seg{b} sort", f_sort, o, d,
                                         alive, seed)
        f_rc = f_rc0 if b == 0 else f_rcb
        (near, iters), t_rc = timeit(f"seg{b} raycast", f_rc, o_s, d_s, a_s)
        it = np.asarray(iters)
        total_iters = int(it[:, 0].sum())
        node_pops = int(it[:, 1].sum())
        oct_pops = int(it[:, 2].sum())
        ns_per_iter = t_rc * 1e9 / max(total_iters, 1)
        n_steps = it.shape[0]
        live_pkts = int(np.any(np.asarray(a_s).reshape(-1, 128), 1).sum())
        print(f"  seg{b}: alive={n_alive/1e6:.2f}M ({live_pkts} live pkts), "
              f"grid_steps={n_steps}, "
              f"mean sub-iters/step={total_iters/n_steps:.0f}, "
              f"per-sub-iter={ns_per_iter:.0f} ns, "
              f"pops/pkt node={node_pops/max(live_pkts,1):.1f} "
              f"oct={oct_pops/max(live_pkts,1):.1f}", flush=True)

        # advance (unsorted for simplicity; reuse the jitted kernel so no
        # second kernel binary is compiled)
        near_u, _ = f_rc(o, d, alive)
        hit, t_fh = timeit(f"seg{b} finalize_hit",
                           jax.jit(lambda nr: finalize_hit(data, o, d, nr)),
                           near_u)
        (s2, ndir), t_sc = timeit(
            f"seg{b} scatter",
            jax.jit(lambda sd, h: scatter(sd, h.normal, d, h.roughness, True)),
            seed, hit)
        was_hit = alive & hit.did_hit
        o = jnp.where(was_hit[:, None], hit.point + hit.normal * 1e-4, o)
        d = jnp.where(was_hit[:, None], ndir, d)
        seed = jnp.where(was_hit, s2, seed)
        alive = was_hit & ~(hit.emission > 0.0)
        o, d, alive = jax.block_until_ready((o, d, alive))

        # dp load-imbalance input (experiments/dp_overhead.py): each dp=8
        # shard renders a horizontal strip; per-strip alive counts bound
        # the slowest-shard factor for the NEXT segment's kernel.
        strips = np.asarray(alive).reshape(8, -1).sum(axis=1)
        if strips.sum():
            print(f"  seg{b}: next-seg dp=8 strip alive "
                  f"max/mean={strips.max() / max(strips.mean(), 1):.3f} "
                  f"({(strips / 1e3).round(1).tolist()}k)", flush=True)


if __name__ == "__main__":
    main()
