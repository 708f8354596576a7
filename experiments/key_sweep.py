"""Sort-key variants vs 128-ray-packet traversal-union costs (CPU DFS
over the sub-block tables, real bounce-2 rays).  The current key is
dir6(2b/axis)<<24 | morton>>3; cheaper unions here = direct traversal
savings in the kernel."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.intersect import finalize_hit
from opengl_raytracer_tpu.ops.morton import morton3d
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from packet_size_sweep import simulate_packet
from trav_exp import primary_rays

W, H = 1920, 1080
SAMPLE = 192
P = 128
_U = np.uint32


def keys_variant(name, o, d, lo, hi):
    extent = np.maximum(hi - lo, 1e-6)
    q = np.clip((o - lo) / extent * 512.0, 0, 511).astype(np.uint32)
    m = np.asarray(morton3d(jnp.asarray(q)))  # 27 bits
    sign3 = (((d[:, 0] < 0) << 2) | ((d[:, 1] < 0) << 1)
             | (d[:, 2] < 0)).astype(np.uint32)
    dq2 = np.clip((d * 0.5 + 0.5) * 4.0, 0, 3).astype(np.uint32)
    dir6 = (dq2[:, 0] << 4) | (dq2[:, 1] << 2) | dq2[:, 2]
    dq3 = np.clip((d * 0.5 + 0.5) * 8.0, 0, 7).astype(np.uint32)
    dir9 = (dq3[:, 0] << 6) | (dq3[:, 1] << 3) | dq3[:, 2]
    if name == "dir6|mort24 (current)":
        return (dir6 << _U(24)) | (m >> _U(3))
    if name == "sign3|mort27":
        return (sign3 << _U(27)) | m
    if name == "dir9|mort21":
        return (dir9 << _U(21)) | (m >> _U(6))
    if name == "mort24|dir6 (pos-major)":
        return ((m >> _U(3)) << _U(6)) | dir6
    if name == "sign3|mhi9|dir6|mlo14":
        mhi = m >> _U(18)            # 9 bits: 8^3 cells
        mlo = (m >> _U(4)) & _U(0x3FFF)
        return (sign3 << _U(29)) | (mhi << _U(20)) | (dir6 << _U(14)) | mlo
    if name == "dir6|mhi12|dirfine6|mlo8":
        mhi = m >> _U(15)            # 12 bits
        dq4 = np.clip((d * 0.5 + 0.5) * 16.0, 0, 15).astype(np.uint32)
        dfull = (dq4[:, 0] << 8) | (dq4[:, 1] << 4) | dq4[:, 2]
        return (dir6 << _U(26)) | (mhi << _U(14)) | ((dfull & _U(0x3F)) << _U(8)) | ((m >> _U(7)) & _U(0xFF))
    raise ValueError(name)


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    rows = np.asarray(data.p2_node_rows)
    tri_rows = np.asarray(data.p2_tri_rows)
    remap = np.asarray(data.p2_remap)
    v0 = np.asarray(data.v0); e1 = np.asarray(data.e1)
    e2 = np.asarray(data.e2); face = np.asarray(data.face)

    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]
    px = jnp.arange(R, dtype=jnp.int32) % W
    py = jnp.arange(R, dtype=jnp.int32) // W
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    alive = jnp.ones((R,), bool)
    for _ in range(2):
        near = raycast_subblock(data, o, d, alive)
        hit = finalize_hit(data, o, d, near)
        s2, nd = scatter(seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o = jnp.where(was_hit[:, None], hit.point + hit.normal * 1e-4, o)
        d = jnp.where(was_hit[:, None], nd, d)
        seed = jnp.where(was_hit, s2, seed)
        alive = was_hit & ~(hit.emission > 0.0)

    o_np = np.asarray(o); d_np = np.asarray(d); a_np = np.asarray(alive)
    o_np, d_np = o_np[a_np], d_np[a_np]
    lo = np.asarray(data.node_min[0]); hi = np.asarray(data.node_max[0])
    print(f"alive bounce-2 rays: {len(o_np)/1e6:.2f}M")

    rng_np = np.random.default_rng(0)
    for name in ("dir6|mort24 (current)", "sign3|mort27", "dir9|mort21",
                 "mort24|dir6 (pos-major)", "sign3|mhi9|dir6|mlo14",
                 "dir6|mhi12|dirfine6|mlo8"):
        k = keys_variant(name, o_np, d_np, lo, hi)
        order = np.argsort(k, kind="stable")
        o_s, d_s = o_np[order], d_np[order]
        n_pk = len(o_s) // P
        picks = rng_np.choice(n_pk, min(SAMPLE, n_pk), replace=False)
        Es, Ls = [], []
        for pk in picks:
            s = pk * P
            E, L = simulate_packet(o_s[s:s + P], d_s[s:s + P],
                                   rows, rows.shape[0], tri_rows, remap,
                                   v0, e1, e2, face)
            Es.append(E); Ls.append(L)
        Es, Ls = np.array(Es), np.array(Ls)
        print(f"{name:28s}: E={Es.mean():6.1f} L={Ls.mean():6.1f} "
              f"(p95 {np.percentile(Es,95):.0f}/{np.percentile(Ls,95):.0f})",
              flush=True)


if __name__ == "__main__":
    main()
