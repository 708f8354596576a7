"""Leaf-size sensitivity: E (wide-node expands) vs L (octet tests) per
128-ray packet as the sub-block tree's leaf size grows.

NEGATIVE RESULT (recorded): the CPU numbers below predicted leaf=16
paired-row leaves (one leaf pop feeding both octet slots) would cut
iterations ~16% [max(E, L/2): 70.6 -> 59.3], but the hardware kernel
REGRESSED ~16% (seg2 raycast 300 -> 336 ms, sub-iters/step 522 -> 607).
Cause: this simulator counts OCTETS, but the kernel pops LEAF ENTRIES —
and build_bvh(leaf=16, sah) leaves average only 10.8/16 tris (22% of
leaves fit in ONE octet), so the second leaf slot idles on underfull
leaves while leaf-entry drain halves (1 entry/iter vs 2 octet
entries/iter).  The leaf=8 dual-octet-pop kernel drains 2 REAL octets
every iteration regardless of leaf fill and stays the winner.  A
sibling-merge pass to force >=9-tri leaves would recover at most ~8%
by this model — not attempted.

The kernel's iteration count per packet is ~max(E, L/2) (dual octet
pops, node duty ~0.85 vs octet duty ~0.44 measured: expands dominate).
Fatter leaves trade internal nodes (fewer E) for leaf redundancy (more
L); this sweep finds the balance point on real bounce-2 rays.

CPU DFS over an 8-wide collapse of build_bvh(leaf_tris) — same collapse
rule as ops/wide2 (expand the internal slot with the largest subtree) —
with real Moller-Trumbore bt tightening for honest pruning.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.bvh import build_bvh
from opengl_raytracer_tpu.ops.camera import make_camera
from opengl_raytracer_tpu.ops.intersect import BIG, finalize_hit
from opengl_raytracer_tpu.ops.morton import ray_sort_keys
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import scatter
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR
from trav_exp import primary_rays

W, H = 1920, 1080
SAMPLE = 192
P = 128
WIDTH = 8


def collapse(bvh):
    """8-wide collapse: list of (slots, is_leaf_mask) per wide node, slot
    entries = binary node ids; wide child pointers resolved lazily."""
    N = bvh.num_nodes
    is_leaf = bvh.node_count > 0
    span = np.minimum(bvh.node_miss, N) - np.arange(N)
    nodes = []
    wide_of = {}

    def make_wide(root):
        slots = [int(root)]
        while len(slots) < WIDTH:
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
        idx = len(nodes)
        nodes.append(slots)
        wide_of[root] = idx
        return idx

    make_wide(0)
    todo = [0]
    while todo:
        w = todo.pop()
        for b in nodes[w]:
            if not is_leaf[b] and b not in wide_of:
                todo.append(make_wide(b))
    return nodes, wide_of, is_leaf


def simulate(o, d, bvh, nodes, wide_of, is_leaf, v0, e1, e2, face):
    bt = np.full(o.shape[0], np.float32(BIG))
    inv = 1.0 / d
    E = L = 0
    stack = [0]  # wide ids
    while stack:
        w = stack.pop()
        E += 1
        for b in nodes[w]:
            lo = bvh.node_min[b]
            hi = bvh.node_max[b]
            t1 = (lo[None] - o) * inv
            t2 = (hi[None] - o) * inv
            near = np.minimum(t1, t2).max(axis=1)
            far = np.maximum(t1, t2).min(axis=1)
            hit = (far >= near) & (far >= 0.0)
            te = np.where(hit, np.maximum(near, 0.0), -1.0)
            if not (hit & (te <= bt)).any():
                continue
            if is_leaf[b]:
                first = int(bvh.node_first[b])
                cnt = int(bvh.node_count[b])
                L += -(-cnt // 8)
                ids = bvh.perm[first:first + cnt]
                tv0, te1, te2, tf = v0[ids], e1[ids], e2[ids], face[ids]
                det = d @ tf.T
                r = o[:, None, :] - tv0[None]
                tnum = -np.einsum('rtk,tk->rt', r, tf)
                p = np.cross(r, d[:, None, :])
                un = -np.einsum('rtk,tk->rt', p, te2)
                vn = np.einsum('rtk,tk->rt', p, te1)
                with np.errstate(divide='ignore', invalid='ignore'):
                    invd = 1.0 / det
                    t = tnum * invd
                    u = un * invd
                    vv = vn * invd
                ok = ((np.abs(det) >= 1e-6) & (t > 1e-6) & (u >= 0)
                      & (vv >= 0) & (u + vv <= 1))
                t = np.where(ok, t, BIG).min(axis=1)
                bt = np.minimum(bt, t)
            else:
                stack.append(wide_of[b])
    return E, L


def main():
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
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

    lo = np.asarray(data.node_min[0]); hi = np.asarray(data.node_max[0])
    key = np.asarray(ray_sort_keys(o, d, jnp.asarray(lo), jnp.asarray(hi),
                                   alive))
    o_np = np.asarray(o); d_np = np.asarray(d); a_np = np.asarray(alive)
    order = np.argsort(key, kind="stable")
    keep = a_np[order]
    o_s, d_s = o_np[order][keep], d_np[order][keep]
    print(f"alive bounce-2 rays: {len(o_s)/1e6:.2f}M", flush=True)

    rng_np = np.random.default_rng(0)
    n_pk = len(o_s) // P
    picks = rng_np.choice(n_pk, min(SAMPLE, n_pk), replace=False)

    for leaf in (8, 12, 16, 24, 32):
        bvh = build_bvh(v0, v0 + e1, v0 + e2, leaf, method="sah")
        nodes, wide_of, is_leaf = collapse(bvh)
        Es, Ls = [], []
        for pk in picks:
            s = pk * P
            E, L = simulate(o_s[s:s + P], d_s[s:s + P], bvh, nodes,
                            wide_of, is_leaf, v0, e1, e2, face)
            Es.append(E); Ls.append(L)
        Es, Ls = np.array(Es), np.array(Ls)
        it2 = np.maximum(Es, Ls / 2)
        print(f"leaf={leaf:3d}: wide_nodes={len(nodes):5d} "
              f"E={Es.mean():6.1f} L={Ls.mean():6.1f} "
              f"max(E,L/2)={it2.mean():6.1f} "
              f"(p95 E={np.percentile(Es,95):.0f} L={np.percentile(Ls,95):.0f})",
              flush=True)


if __name__ == "__main__":
    main()
