"""Packet-size sensitivity of traversal-union costs on real bounce rays.

For P in {32, 64, 128, 256}: per-P-ray-packet union expands E and octet
pops L (numpy DFS over the sub-block 8-wide tree), reported per RAY.
Decides whether half-packets (2x64 per row) or bigger rows are worth it.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.bvh import build_bvh
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.intersect import BIG, finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.ops.wide2 import ORD0, EMPTY_PACKED
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

W, H = 1920, 1080
SAMPLE = 256  # sampled packets per size


def simulate_packet(o, d, rows, n_wide, tri_rows, remap, v0, e1, e2, face):
    """DFS one packet over the sub-block tables; returns (E, L)."""
    bt = np.full(o.shape[0], np.float32(BIG))
    inv = 1.0 / d
    octant = (int(d[:, 0].sum() < 0) << 2) | (int(d[:, 1].sum() < 0) << 1) | int(d[:, 2].sum() < 0)
    stack = [0]
    E = L = 0
    while stack:
        e = stack.pop()
        if e >= 0:
            E += 1
            row = rows[e]
            pushes = []
            packed = row[ORD0 + octant * 8:ORD0 + octant * 8 + 8].astype(np.int64)
            for pk in packed:
                pk = int(pk)
                ent = pk >> 3
                j = pk & 7
                if ent == EMPTY_PACKED:
                    continue
                b = j * 6
                t1 = (row[b:b + 3][None] - o) * inv
                t2 = (row[b + 3:b + 6][None] - o) * inv
                near = np.minimum(t1, t2).max(axis=1)
                far = np.maximum(t1, t2).min(axis=1)
                hit = (far >= near) & (far >= 0.0)
                te = np.where(hit, np.maximum(near, 0.0), -1.0)
                if (hit & (te <= bt)).any():
                    stack.append(ent)
        else:
            q = -e - 1
            L += 1
            ids = remap[q * 8:q * 8 + 8]
            tr = tri_rows[q].reshape(8, 16)
            live = np.any(tr[:, 9:12] != 0, axis=1)
            ids = ids[live]
            if len(ids) == 0:
                continue
            tv0, te1, te2, tf = v0[ids], e1[ids], e2[ids], face[ids]
            det = d @ tf.T
            with np.errstate(divide="ignore", invalid="ignore"):
                invd = 1.0 / det
                ro = o[:, None, :] - tv0[None]
                t = -np.einsum("rtc,tc->rt", ro, tf) * invd
                p = np.cross(ro, d[:, None, :])
                u = -np.einsum("rtc,tc->rt", p, te2) * invd
                vv = np.einsum("rtc,tc->rt", p, te1) * invd
                ok = ((np.abs(det) >= 1e-6) & (t > 1e-6) & (u >= 0) & (vv >= 0)
                      & (u + vv <= 1))
            t = np.where(ok, t, BIG)
            if t.size:
                bt = np.minimum(bt, t.min(axis=1))
    return E, L


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    rows = np.asarray(data.p2_node_rows)
    tri_rows = np.asarray(data.p2_tri_rows)
    remap = np.asarray(data.p2_remap)
    n_wide = rows.shape[0]
    v0 = np.asarray(data.v0); e1 = np.asarray(data.e1)
    e2 = np.asarray(data.e2); face = np.asarray(data.face)

    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]
    lo, hi = data.node_min[0], data.node_max[0]
    px = jnp.arange(R, dtype=jnp.int32) % W
    py = jnp.arange(R, dtype=jnp.int32) // W
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    alive = jnp.ones((R,), bool)

    # advance two bounces to get realistic bounce-2 rays
    for _ in range(2):
        near = raycast_subblock(data, o, d, alive)
        hit = finalize_hit(data, o, d, near)
        s2, nd = scatter(seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o = jnp.where(was_hit[:, None], hit.point + hit.normal * 1e-4, o)
        d = jnp.where(was_hit[:, None], nd, d)
        seed = jnp.where(was_hit, s2, seed)
        alive = was_hit & ~(hit.emission > 0.0)

    key = ray_sort_keys(o, d, lo, hi, alive)
    perm = np.asarray(jnp.argsort(key))
    o_s = np.asarray(o)[perm]; d_s = np.asarray(d)[perm]
    a_s = np.asarray(alive)[perm]
    n_alive = int(a_s.sum())
    o_s, d_s = o_s[:n_alive], d_s[:n_alive]
    print(f"bounce-2 rays: {n_alive/1e6:.2f}M alive (sorted)")

    rng_np = np.random.default_rng(0)
    for P in (32, 64, 128, 256):
        n_pk = n_alive // P
        picks = rng_np.choice(n_pk, min(SAMPLE, n_pk), replace=False)
        Es, Ls = [], []
        for pk in picks:
            s = pk * P
            E, L = simulate_packet(o_s[s:s + P], d_s[s:s + P],
                                   rows, n_wide, tri_rows, remap,
                                   v0, e1, e2, face)
            Es.append(E); Ls.append(L)
        Es, Ls = np.array(Es), np.array(Ls)
        print(f"P={P:4d}: expands/packet={Es.mean():6.1f} octets/packet={Ls.mean():6.1f}"
              f"  per-ray: E={Es.mean()/P:.3f} L={Ls.mean()/P:.3f}"
              f"  p95 E={np.percentile(Es,95):.0f} L={np.percentile(Ls,95):.0f}",
              flush=True)


if __name__ == "__main__":
    main()
