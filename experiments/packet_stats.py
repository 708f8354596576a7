"""Per-128-packet traversal statistics on the REAL scene + real bounce rays.

Simulates (in NumPy, on host) a per-packet DFS over the 8-wide BVH and
counts, per 128-ray packet: node expands E and leaf-octet pops L.  Also
aggregates the same counts for 1024-ray blocks (what the round-1 kernel
pays: union over 8 packets).  This decides whether the sub-block design
(8 independent packets per kernel instance, iterations ~ max(E, L) per
row) beats the current one (iterations ~ E_union + L_union/octets).

Usage: python experiments/packet_stats.py [leaf_sizes...]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.bvh import build_bvh
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.intersect import BIG, finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

W, H = 1920, 1080
SAMPLE_PACKETS = 512  # simulate this many packets (spread over the frame)


def wide_children(bvh):
    """Re-derive the 8-wide collapse (ops/wide_bvh.py rule): per wide node,
    list of (bmin, bmax, entry) with entry >=0 wide child, <0 leaf id."""
    N = bvh.num_nodes
    is_leaf = bvh.node_count > 0
    span = np.minimum(bvh.node_miss, N) - np.arange(N)

    children = []

    def make_wide(root):
        slots = [int(root)]
        while len(slots) < 8:
            best, best_size = -1, 0
            for k, b in enumerate(slots):
                if not is_leaf[b] and span[b] > best_size:
                    best, best_size = k, int(span[b])
            if best < 0:
                break
            b = slots.pop(best)
            left = b + 1
            right = int(bvh.node_miss[left])
            slots.extend([left, right])
        children.append(slots)
        return len(children) - 1

    wide_of = {}
    root = make_wide(0)
    q = [root]
    qi = 0
    while qi < len(q):
        w = q[qi]; qi += 1
        for b in children[w]:
            if not is_leaf[b]:
                cw = make_wide(b)
                wide_of[b] = cw
                q.append(cw)

    Wn = len(children)
    cmin = np.zeros((Wn, 8, 3), np.float32)
    cmax = np.zeros((Wn, 8, 3), np.float32)
    cent = np.full((Wn, 8), -(10**9), np.int64)  # sentinel empty
    for w, slots in enumerate(children):
        for j, b in enumerate(slots):
            cmin[w, j] = bvh.node_min[b]
            cmax[w, j] = bvh.node_max[b]
            cent[w, j] = -b - 1 if is_leaf[b] else wide_of[b]
    return cmin, cmax, cent, bvh.node_count, bvh.node_first


def simulate_packet(o, d, cmin, cmax, cent, ncount, v0, e1, e2, face, tpr=8):
    """DFS one 128-ray packet; returns (#expands, #octet-pops)."""
    inv = 1.0 / d
    bt = np.full(o.shape[0], np.float32(BIG))
    stack = [0]
    E = L = 0
    EMPTY = -(10**9)
    while stack:
        e = stack.pop()
        if e >= 0:
            E += 1
            # slab test: 8 children x 128 rays
            t1 = (cmin[e][:, None, :] - o[None]) * inv[None]
            t2 = (cmax[e][:, None, :] - o[None]) * inv[None]
            near = np.minimum(t1, t2).max(axis=2)
            far = np.maximum(t1, t2).min(axis=2)
            hit = (far >= near) & (far >= 0.0)
            te = np.where(hit, np.maximum(near, 0.0), -1.0)
            ok = hit & (te <= bt[None, :])
            anyj = ok.any(axis=1)
            # push near-first is irrelevant to counts if we just pop all;
            # approximate the ordered traversal: push far-first by child
            # centroid along dominant dir so near pops first
            key = ((cmin[e] + cmax[e]) * 0.5) @ np.sign(d.sum(axis=0))
            order = np.argsort(-key)
            for j in order:
                if anyj[j] and cent[e, j] != EMPTY:
                    stack.append(int(cent[e, j]))
        else:
            b = -e - 1  # binary leaf id
            first = nfirst[b]
            cnt = ncount[b]
            n_oct = -(-cnt // tpr)
            L += n_oct
            # intersect to tighten bt (all octets at once is fine for stats)
            tri_ids = np.arange(first, first + cnt)
            tv0, te1, te2, tf = v0[tri_ids], e1[tri_ids], e2[tri_ids], face[tri_ids]
            det = d @ tf.T  # (128, cnt)
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
            bt = np.minimum(bt, t.min(axis=1))
    return E, L


def run(leaf):
    global nfirst
    sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
    data = sc.send()
    bvh = sc.bvh
    cmin, cmax, cent, ncount, nfirst = wide_children(bvh)
    print(f"leaf={leaf}: {bvh.num_nodes} binary nodes, {len(cmin)} wide nodes")

    v0 = np.asarray(data.v0); e1 = np.asarray(data.e1)
    e2 = np.asarray(data.e2); face = np.asarray(data.face)

    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    near = raycast_pallas(data, o, d, max_leaf_tris=leaf)
    hit = finalize_hit(data, o, d, near)
    seed = rng.warmup(rng.seed_pixels(jnp.arange(o.shape[0]) % W,
                                      jnp.arange(o.shape[0]) // W, 0))
    _, nd = scatter(seed, hit.normal, d, hit.roughness, True)
    o2 = jnp.where(hit.did_hit[:, None], hit.point + hit.normal * 1e-4, o)
    d2 = jnp.where(hit.did_hit[:, None], nd, d)
    lo, hi = data.node_min[0], data.node_max[0]
    perm = jnp.argsort(ray_sort_keys(o2, d2, lo, hi))
    o2s = np.asarray(o2[perm]); d2s = np.asarray(d2[perm])
    on = np.asarray(o); dn = np.asarray(d)

    for (oo, dd, label) in [(on, dn, "primary"), (o2s, d2s, "bounce-sorted")]:
        P = oo.shape[0] // 128
        sel = np.linspace(0, P - 1, SAMPLE_PACKETS).astype(int)
        Es, Ls = [], []
        for p in sel:
            E, L = simulate_packet(oo[p * 128:(p + 1) * 128],
                                   dd[p * 128:(p + 1) * 128],
                                   cmin, cmax, cent, ncount, v0, e1, e2, face)
            Es.append(E); Ls.append(L)
        Es = np.array(Es); Ls = np.array(Ls)
        # 1024-block aggregation: consecutive groups of 8 sampled packets
        # approximate a block (they're not actually adjacent, so this is a
        # lower bound on the union; the real union is larger)
        g = SAMPLE_PACKETS // 8 * 8
        Eb = Es[:g].reshape(-1, 8); Lb = Ls[:g].reshape(-1, 8)
        print(f"  {label}: per-128  E mean={Es.mean():.0f} p95={np.percentile(Es,95):.0f} "
              f"L mean={Ls.mean():.0f} p95={np.percentile(Ls,95):.0f} "
              f"maxEL mean={np.maximum(Es,Ls).mean():.0f} "
              f"| per-row-iters(max over 8) mean={np.maximum(Eb,Lb).max(axis=1).mean():.0f}")


if __name__ == "__main__":
    for leaf in [int(x) for x in (sys.argv[1:] or [8, 16, 32])]:
        run(leaf)
