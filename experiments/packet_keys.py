"""Compare ray-coherence sort keys by the per-128-packet traversal unions
they produce on real bounce rays (leaf=8 wide BVH, minidragon 1080p).

Keys under test (per-packet mean E/L is the cost of the sub-block kernel):
  cur    : dir 2b/axis major | morton(origin) minor      (round-1 key)
  dir3   : dir 3b/axis major | morton(origin) minor
  oct_pos: octant major | morton(origin) 21b | dir fine
  morton6: 6-D morton interleave of origin(10b) and dir(5b) per axis
  pos    : morton(origin) only (position-major, the round-1 loser)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.intersect import BIG, finalize_hit
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays
from packet_stats import wide_children, simulate_packet
import packet_stats

W, H = 1920, 1080
SAMPLE = 384
LEAF = 8


def spread3(x):
    x = x.astype(np.uint64) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton3(q):
    return spread3(q[:, 0]) | (spread3(q[:, 1]) << 1) | (spread3(q[:, 2]) << 2)


def keys(name, o, d, lo, hi, alive):
    ext = np.maximum(hi - lo, 1e-6)
    qo = np.clip((o - lo) / ext * 1024.0, 0, 1023).astype(np.uint64)
    m30 = morton3(qo)
    if name == "cur":
        dq = np.clip((d * 0.5 + 0.5) * 4.0, 0, 3).astype(np.uint64)
        dir6 = (dq[:, 0] << 4) | (dq[:, 1] << 2) | dq[:, 2]
        k = (dir6 << 27) | (m30 >> 3)
    elif name == "dir3":
        dq = np.clip((d * 0.5 + 0.5) * 8.0, 0, 7).astype(np.uint64)
        dir9 = (dq[:, 0] << 6) | (dq[:, 1] << 3) | dq[:, 2]
        k = (dir9 << 27) | (m30 >> 3)
    elif name == "oct_pos":
        oct3 = (((d[:, 0] < 0) << 2) | ((d[:, 1] < 0) << 1)
                | (d[:, 2] < 0)).astype(np.uint64)
        dq = np.clip((d * 0.5 + 0.5) * 8.0, 0, 7).astype(np.uint64)
        dir9 = (dq[:, 0] << 6) | (dq[:, 1] << 3) | dq[:, 2]
        k = (oct3 << 33) | ((m30 >> 6) << 9) | dir9
    elif name == "morton6":
        # interleave per-axis: origin 10b + dir 5b -> 15b per axis
        dq = np.clip((d * 0.5 + 0.5) * 32.0, 0, 31).astype(np.uint64)
        k = np.uint64(0)
        k = np.zeros(len(o), np.uint64)
        for b in range(10):
            for a in range(3):
                k |= ((qo[:, a] >> (9 - b)) & 1) << (44 - (b * 3 + a))
        for b in range(5):
            for a in range(3):
                k |= ((dq[:, a] >> (4 - b)) & 1) << (14 - (b * 3 + a))
        # put top dir bits above origin (sign-ish): actually interleave
        # dir top bit with origin top bits:
    elif name == "pos":
        k = m30
    else:
        raise ValueError(name)
    return np.where(alive, k, np.uint64(2**63))


def main():
    sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=LEAF)
    data = sc.send()
    cmin, cmax, cent, ncount, nfirst = wide_children(sc.bvh)
    packet_stats.nfirst = nfirst
    v0 = np.asarray(data.v0); e1 = np.asarray(data.e1)
    e2 = np.asarray(data.e2); face = np.asarray(data.face)

    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    near = raycast_pallas(data, o, d, max_leaf_tris=LEAF)
    hit = finalize_hit(data, o, d, near)
    seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]) % W,
                                      jnp.arange(o.shape[0]) // W, 0))
    _, nd = scatter(seed, hit.normal, d, hit.roughness, True)
    o2 = np.asarray(jnp.where(hit.did_hit[:, None], hit.point + hit.normal * 1e-4, o))
    d2 = np.asarray(jnp.where(hit.did_hit[:, None], nd, d))
    alive = np.asarray(hit.did_hit)
    lo = np.asarray(data.node_min[0]); hi = np.asarray(data.node_max[0])
    print(f"alive bounce rays: {alive.mean()*100:.0f}%")

    for name in ["cur", "dir3", "oct_pos", "pos"]:
        k = keys(name, o2, d2, lo, hi, alive)
        perm = np.argsort(k, kind="stable")
        oo, dd = o2[perm], d2[perm]
        a_s = alive[perm]
        P = len(oo) // 128
        # sample only packets with at least one live ray
        live_pkts = np.nonzero(a_s.reshape(P, 128).any(axis=1))[0]
        sel = live_pkts[np.linspace(0, len(live_pkts) - 1, SAMPLE).astype(int)]
        Es, Ls = [], []
        for p in sel:
            E, L = simulate_packet(oo[p*128:(p+1)*128], dd[p*128:(p+1)*128],
                                   cmin, cmax, cent, ncount, v0, e1, e2, face)
            Es.append(E); Ls.append(L)
        Es = np.array(Es); Ls = np.array(Ls)
        mx = np.maximum(Es, Ls)
        # frame-cost proxy: sum over live packets of max(E,L)
        print(f"{name:8s}: E mean={Es.mean():6.1f}  L mean={Ls.mean():6.1f}  "
              f"maxEL mean={mx.mean():6.1f} p95={np.percentile(mx,95):5.0f}  "
              f"live_pkts={len(live_pkts)}")


if __name__ == "__main__":
    main()
