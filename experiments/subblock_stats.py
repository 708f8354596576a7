"""Duty-cycle stats for the sub-block kernel on real rays: sub-iterations
per grid step and the fraction popping a node / octets.  Decides whether
the next lever is dual-node pops, more rows, or iteration-count cuts."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock, POOL, _SUB
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

W, H = 1920, 1080


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

    f_dbg = jax.jit(lambda o_, d_, a_: raycast_subblock(
        data, o_, d_, a_, debug_iters=True))

    for b in range(3):
        key = ray_sort_keys(o, d, lo, hi, alive)
        perm = jnp.argsort(key)
        o_s, d_s, a_s = jax.block_until_ready((o[perm], d[perm], alive[perm]))

        near, raw = f_dbg(o_s, d_s, a_s)
        raw = np.asarray(raw).reshape(-1, _SUB, 128)
        it = raw[:, 0, 0]          # sub-iterations per grid step
        an = raw[:, :, 32]         # node pops per row
        al = raw[:, :, 64]         # octet pops per row
        tot = it.sum() * _SUB      # row sub-iterations
        print(f"seg{b}: steps={it.shape[0]}, sub-iters/step mean={it.mean():.0f} "
              f"p95={np.percentile(it,95):.0f} max={it.max()}", flush=True)
        print(f"  duty: node={an.sum()/tot:.2f}, octet={al.sum()/(2*tot):.2f} "
              f"(of dual capacity); pops/packet: node={an.sum()/ (it.shape[0]*POOL):.1f} "
              f"octet={al.sum()/(it.shape[0]*POOL):.1f}", flush=True)

        near_u = raycast_subblock(data, o, d, alive)
        hit = finalize_hit(data, o, d, near_u)
        s2, ndir = scatter(seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o = jnp.where(was_hit[:, None], hit.point + hit.normal * 1e-4, o)
        d = jnp.where(was_hit[:, None], ndir, d)
        seed = jnp.where(was_hit, s2, seed)
        alive = was_hit & ~(hit.emission > 0.0)
        o, d, alive = jax.block_until_ready((o, d, alive))


if __name__ == "__main__":
    main()
