"""Where does the 1080p/4-bounce frame actually go? (round-2 re-measure)

Times, for pallas (round-1 1024-block kernel) and pallas2 (work-stealing
sub-block kernel):
  * a full renderer frame (2.07M pixels, 5 raycast segments)
  * each raycast segment in isolation on the REAL bounce-ray distribution
    (extracted by running the integrator bounce-by-bounce on the default
    minidragon scene), sorted the same way the integrator sorts
  * the non-traversal remainder (sort + shade + accumulation)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.renderer import Renderer
from opengl_raytracer_tpu.utils.config import RenderConfig
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR

W, H, BOUNCES = 1920, 1080, 4


def time_frame(traversal, scene):
    cfg = RenderConfig(width=W, height=H, bounces=BOUNCES,
                       traversal=traversal)
    r = Renderer(scene, cfg)
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    st = r.init_state()
    t0 = time.time()
    st = r.step(st, cam)
    jax.block_until_ready(st.accum)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        st = r.step(st, cam)
        jax.block_until_ready(st.accum)
        best = min(best, time.time() - t0)
    print(f"{traversal}: frame {best*1000:.0f} ms  (first step {compile_s:.1f} s)",
          flush=True)
    return best


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    print(f"tris={data.num_tris}", flush=True)
    for trav in ("pallas", "pallas2"):
        time_frame(trav, data)

    # segment-level: run the real integrator but time each raycast segment
    from opengl_raytracer_tpu.ops.integrator import scatter
    from opengl_raytracer_tpu.ops.intersect import finalize_hit
    from opengl_raytracer_tpu.ops.morton import ray_sort_keys
    from opengl_raytracer_tpu.ops import rng
    from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
    from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
    from trav_exp import primary_rays

    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    R = o.shape[0]
    lo, hi = data.node_min[0], data.node_max[0]
    px = jnp.arange(R, dtype=jnp.int32) % W
    py = jnp.arange(R, dtype=jnp.int32) // W
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    alive = jnp.ones((R,), bool)
    leaf = int(np.asarray(data.node_count).max())

    def seg(which, o, d, alive):
        key = ray_sort_keys(o, d, lo, hi, alive)
        perm = jnp.argsort(key)
        o_s, d_s, a_s = o[perm], d[perm], alive[perm]
        o_s, d_s, a_s = jax.block_until_ready((o_s, d_s, a_s))
        f1 = jax.jit(lambda o_, d_, a_: raycast_pallas(
            data, o_, d_, a_, max_leaf_tris=leaf))
        f2 = jax.jit(lambda o_, d_, a_: raycast_subblock(data, o_, d_, a_))
        out = {}
        for name, f in (("pallas", f1), ("pallas2", f2)):
            near = jax.block_until_ready(f(o_s, d_s, a_s))
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                near = jax.block_until_ready(f(o_s, d_s, a_s))
                best = min(best, time.time() - t0)
            out[name] = best
        n_alive = int(jnp.sum(alive))
        print(f"segment {which}: alive={n_alive/1e6:.2f}M  "
              f"pallas={out['pallas']*1000:.0f} ms  "
              f"pallas2={out['pallas2']*1000:.0f} ms", flush=True)
        # advance state with the pallas result (unsorted order)
        near_u = raycast_pallas(data, o, d, alive, max_leaf_tris=leaf)
        hit = finalize_hit(data, o, d, near_u)
        nonlocal_seed = seg.seed
        s2, ndir = scatter(nonlocal_seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o2 = jnp.where(was_hit[:, None], hit.point + hit.normal * 1e-4, o)
        d2 = jnp.where(was_hit[:, None], ndir, d)
        seg.seed = jnp.where(was_hit, s2, nonlocal_seed)
        alive2 = was_hit & ~(hit.emission > 0.0)
        return jax.block_until_ready((o2, d2, alive2))

    seg.seed = seed
    for b in range(BOUNCES + 1):
        o, d, alive = seg(b, o, d, alive)


if __name__ == "__main__":
    main()
