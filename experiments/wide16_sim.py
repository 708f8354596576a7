"""Do 16-wide nodes (and 12-tri leaf rows) cut packet pop counts?

Bounce segments are NODE-POP-BOUND: 54 node pops vs 78/2 octet-pop demand
per packet (frame_breakdown.py), so leaf-side wins don't cut iterations.
A 16-wide collapse halves tree depth levels; this experiment predicts the
pop counts by SIMULATING the kernel's per-packet traversal (same pop /
expand / far-first push / strict-< leaf update semantics) over real
bounce-ray packets captured from the 1080p minidragon frame.

Run on TPU once to capture rays (writes /tmp/wide16_rays.npz), then the
simulation itself is pure numpy (re-runs load the capture).

MEASURED RESULTS (2026-08-17, minidragon 1080p bounce-2 packets).
Calibration: full-population sim (wide_vecsim.py) = 53.5 iters / 52.3
node / 73.6 oct pops per packet vs the real kernel's 54 / 78 — the
simulator is trustworthy.

Per-packet pops (fixed 512k-ray subset, exact totals — NOTE a random
subset dilutes coherence, all numbers shift up together; ratios hold):

  tree              iters   node    oct
  8-wide  c8  lp2   74.1    72.9    98.7   (production)
  16-wide c8  lp2   (sample run: node -27% but oct +29%, iters ~flat)
  16-wide c8  lp3   51.7    49.6   112.3   (-30% iters)
  16-wide c12 lp3   44.6    42.5    99.3   (-40% iters)
  16-wide c12 lp2   60.3    44.3   109.9

VERDICT: 16-wide LOSES end-to-end despite the iteration cuts.  Cost
model vs the measured phase split (F=2.4us spine/serve + V: expand 16,
push 29, leaf 30 ms per bounce segment): box tests = node_pops x width
RISES +16-36% (coarser culling), tri tests rise +14% (c8 lp3, octet
pops +14%) or +51% (c12 — bigger chunk bboxes get opened MORE, octet
count does NOT drop), and push cost scales with ncand=width.  Only the
F x iterations product shrinks (~12 ms/segment), which the fatter V
phases eat back: every variant models to -3%..+13% NET.  The 8-wide
sub-block kernel is at a genuine architectural optimum for the VPU:
total vector work = pops x per-pop width, and pop-width trades against
pruning quality in BOTH directions (dual node pops -14% round-3, 64-ray
packets +46% total work, 16-wide above).

Sort keys (same subset, wide_vecsim totals): every concatenation layout
(m12f6r8 current, m17f6r4, m15f6r6, m18f9) lands within 1% — earlier
per-packet-sample differences were noise.  A 6D position x direction
bit-interleave (p9,d5) is the only real mover at -4.6% iters, but needs
a 42-bit key => 2-operand sort (+1.3 ms x 4 sorts) eats half of it.
Keys are DONE as a direction.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

CAPTURE = "/tmp/wide16_rays.npz"
SAMPLE_PACKETS = 400
SEED = 0


def capture_rays():
    import jax, jax.numpy as jnp
    from opengl_raytracer_tpu.models.scene import Scene
    from opengl_raytracer_tpu.ops.camera import make_camera
    from opengl_raytracer_tpu.ops.integrator import scatter
    from opengl_raytracer_tpu.ops.intersect import finalize_hit
    from opengl_raytracer_tpu.ops.morton import ray_sort_keys
    from opengl_raytracer_tpu.ops import rng
    from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
    from opengl_raytracer_tpu.presets import (default_objects,
                                              DEFAULT_CAM_POS,
                                              DEFAULT_CAM_DIR)
    from trav_exp import primary_rays

    W, H = 1920, 1080
    sc = Scene(default_objects('stanford_minidragon'))
    data = sc.send()
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    R = o.shape[0] // 128 * 128
    o, d = o[:R], d[:R]
    px = jnp.arange(R, dtype=jnp.int32) % W
    py = jnp.arange(R, dtype=jnp.int32) // W
    seed = rng.warmup(rng.seed_pixels(px, py, 0), 3)
    alive = jnp.ones((R,), bool)
    f_rc = jax.jit(lambda o_, d_, a_: raycast_subblock(
        data, o_, d_, a_, big_pools=True))
    out = {}
    for b in range(3):
        if b > 0:
            key = np.asarray(ray_sort_keys(o, d, data.node_min[0],
                                           data.node_max[0], alive))
            perm = np.argsort(key, kind="stable")
            out[f"o{b}"] = np.asarray(o)[perm]
            out[f"d{b}"] = np.asarray(d)[perm]
            out[f"alive{b}"] = np.asarray(alive)[perm]
        near = f_rc(o, d, alive)
        hit = finalize_hit(data, o, d, near)
        s2, ndir = scatter(seed, hit.normal, d, hit.roughness, True)
        was_hit = alive & hit.did_hit
        o = jnp.where(was_hit[:, None], hit.point + hit.normal * 1e-4, o)
        d = jnp.where(was_hit[:, None], ndir, d)
        seed = jnp.where(was_hit, s2, seed)
        alive = was_hit & ~(hit.emission > 0.0)
    np.savez(CAPTURE, **out)
    print(f"captured -> {CAPTURE}")


def build_wide(scene_tris, width, leaf_chunk, method="sah"):
    """Collapse the binary BVH to ``width`` with ``leaf_chunk``-tri leaf
    groups; returns (children entries, bboxes, groups, octant orders).
    Mirrors wide2.build_subblock's DP collapse + re-chunking."""
    from opengl_raytracer_tpu.ops.bvh import build_bvh

    v0, v1, v2 = scene_tris
    bvh = build_bvh(v0, v1, v2, leaf_chunk, method=method)
    N = bvh.num_nodes
    is_leaf = bvh.node_count > 0
    tri_lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tri_hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    tri_cent = ((v0 + v1 + v2) / 3.0).astype(np.float32)

    INF = 1 << 30
    left_of = np.arange(N) + 1
    right_of = np.minimum(bvh.node_miss[np.minimum(left_of, N - 1)], N - 1)
    h = np.full((N, width + 1), INF, np.int64)
    order = []
    st = [0]
    while st:
        b = st.pop()
        if is_leaf[b]:
            h[b, 1] = 0
            continue
        order.append(b)
        st.append(int(left_of[b]))
        st.append(int(right_of[b]))
    split_of = np.zeros((N, width + 1), np.int64)
    for b in reversed(order):
        hl, hr = h[int(left_of[b])], h[int(right_of[b])]
        for s in range(2, width + 1):
            best, arg = INF, 0
            for s1 in range(1, s):
                c = hl[s1] + hr[s - s1]
                if c < best:
                    best, arg = c, s1
            h[b, s] = best
            split_of[b, s] = arg
        root_cost = 1 + int(h[b, 2:width + 1].min())
        if root_cost < h[b, 1]:
            h[b, 1] = root_cost
            split_of[b, 1] = 0

    def _leaf_ids(b):
        first = int(bvh.node_first[b])
        return bvh.perm[first:first + int(bvh.node_count[b])]

    def _split_chunks(ids, out):
        n = len(ids)
        if n <= leaf_chunk:
            out.append(ids)
            return
        k = -(-n // leaf_chunk)
        k1 = (k + 1) // 2
        m = min(k1 * leaf_chunk, n - 1)
        c = tri_cent[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        part = np.argsort(c[:, axis], kind="stable")
        _split_chunks(ids[part[:m]], out)
        _split_chunks(ids[part[m:]], out)

    def _rechunk(slots):
        lk = [k for k, s in enumerate(slots) if isinstance(s, np.ndarray)]
        if len(lk) < 2:
            return None
        all_ids = np.concatenate([slots[k] for k in lk])
        n_chunks = -(-len(all_ids) // leaf_chunk)
        if n_chunks >= len(lk):
            return None
        out = [s for k, s in enumerate(slots) if k not in lk]
        _split_chunks(all_ids, out)
        return out

    children = []
    wide_of = {}

    def make_wide(root):
        slots = []
        if is_leaf[root]:
            slots.append(_leaf_ids(root))
        else:
            vals = h[root, 2:width + 1]
            s_best = width - int(np.argmin(vals[::-1]))
            def frontier(b, s, out):
                if is_leaf[b]:
                    out.append(_leaf_ids(b))
                    return
                if s == 1:
                    out.append(int(b))
                    return
                s1 = int(split_of[b, s])
                frontier(int(left_of[b]), s1, out)
                frontier(int(right_of[b]), s - s1, out)
            frontier(int(left_of[root]), int(split_of[root, s_best]), slots)
            frontier(int(right_of[root]),
                     s_best - int(split_of[root, s_best]), slots)
        packed = _rechunk(slots)
        if packed is not None:
            slots = packed
        children.append(slots)
        return len(children) - 1

    root = make_wide(0)
    qi = 0
    queue = [root]
    while qi < len(queue):
        w = queue[qi]
        qi += 1
        for b in children[w]:
            if not isinstance(b, np.ndarray):
                cw = make_wide(b)
                wide_of[b] = cw
                queue.append(cw)

    groups = []
    W = len(children)
    cmin = np.full((W, width, 3), 1e30, np.float32)
    cmax = np.full((W, width, 3), -1e30, np.float32)
    entry = np.full((W, width), -(1 << 20), np.int64)
    EMPTY = -(1 << 20)
    for w, slots in enumerate(children):
        for j, b in enumerate(slots):
            if isinstance(b, np.ndarray):
                cmin[w, j] = tri_lo[b].min(axis=0)
                cmax[w, j] = tri_hi[b].max(axis=0)
                entry[w, j] = -len(groups) - 1
                groups.append(b)
            else:
                cmin[w, j] = bvh.node_min[b]
                cmax[w, j] = bvh.node_max[b]
                entry[w, j] = wide_of[b]

    # per-octant far-first orders (slot indices, far first)
    centroids = (cmin + cmax) * 0.5
    finite = cmin[..., 0] <= cmax[..., 0]
    orders = np.zeros((8, W, width), np.int64)
    for o in range(8):
        dsign = np.array([-1.0 if (o >> 2) & 1 else 1.0,
                          -1.0 if (o >> 1) & 1 else 1.0,
                          -1.0 if o & 1 else 1.0], np.float32)
        key = centroids @ dsign
        key = np.where(finite, key, np.inf)
        orders[o] = np.argsort(-key, axis=1, kind="stable")
    return children, entry, cmin, cmax, groups, orders, W


def simulate_packet(o, d, alive, entry, cmin, cmax, groups, orders,
                    tris, leaf_pops):
    """Kernel-faithful per-packet traversal; returns (iters, node_pops,
    oct_pops)."""
    EMPTY = -(1 << 20)
    v0, e1, e2, face = tris
    inv = 1.0 / d
    bt = np.where(alive, 1e30, -1e30).astype(np.float32)
    oct_id = ((int(d[:, 0].sum() < 0) << 2) | (int(d[:, 1].sum() < 0) << 1)
              | int(d[:, 2].sum() < 0))
    stack_n = [0]
    stack_l = []
    iters = n_pop = l_pop = 0
    EPS = np.float32(1e-6)
    while stack_n or stack_l:
        iters += 1
        # node pop + expand + push
        if stack_n:
            w = stack_n.pop()
            n_pop += 1
            mn, mx = cmin[w], cmax[w]  # (width, 3)
            t1 = (mn[None] - o[:, None]) * inv[:, None]   # (128, wd, 3)
            t2 = (mx[None] - o[:, None]) * inv[:, None]
            near = np.minimum(t1, t2).max(axis=2)
            far = np.maximum(t1, t2).min(axis=2)
            ok = (far >= near) & (far >= 0.0) & (near <= bt[:, None])
            bits = ok.any(axis=0)                          # (width,)
            for j in orders[oct_id, w]:                    # far first
                ent = entry[w, j]
                if ent == EMPTY or not bits[j]:
                    continue
                if ent >= 0:
                    stack_n.append(int(ent))
                else:
                    stack_l.append(int(-ent - 1))
        # leaf pops
        for _ in range(leaf_pops):
            if not stack_l:
                break
            q = stack_l.pop()
            l_pop += 1
            ids = groups[q]
            det = d @ face[ids].T                          # (128, k)
            r = o[:, None, :] - v0[ids][None]              # (128, k, 3)
            t = -np.einsum('rkx,kx->rk', r, face[ids]) / det
            p = np.cross(r, d[:, None, :])
            u = -np.einsum('rkx,kx->rk', p, e2[ids]) / det
            v = np.einsum('rkx,kx->rk', p, e1[ids]) / det
            valid = ((np.abs(det) >= EPS) & (t > EPS) & (u >= 0)
                     & (v >= 0) & (u + v <= 1.0))
            t = np.where(valid, t, 1e30).min(axis=1)
            bt = np.minimum(bt, t)
    return iters, n_pop, l_pop


def main():
    if not os.path.exists(CAPTURE):
        capture_rays()
    data = np.load(CAPTURE)

    from opengl_raytracer_tpu.models.scene import Scene
    from opengl_raytracer_tpu.presets import default_objects
    sc = Scene(default_objects('stanford_minidragon'))
    sd = sc.send()
    v0 = np.asarray(sd.v0)
    e1 = np.asarray(sd.e1)
    e2 = np.asarray(sd.e2)
    face = np.asarray(sd.face)
    v1 = v0 + e1
    v2 = v0 + e2
    tris = (v0, e1, e2, face)

    rng_ = np.random.default_rng(SEED)
    for seg in (2,):
        o_all = data[f"o{seg}"].reshape(-1, 128, 3)
        d_all = data[f"d{seg}"].reshape(-1, 128, 3)
        a_all = data[f"alive{seg}"].reshape(-1, 128)
        live = np.nonzero(a_all.any(axis=1))[0]
        pick = rng_.choice(live, min(SAMPLE_PACKETS, len(live)),
                           replace=False)
        for width, chunk, lp in ((8, 8, 2), (16, 8, 2), (16, 8, 3),
                                 (16, 12, 2), (12, 8, 2)):
            children, entry, cmin, cmax, groups, orders, W = build_wide(
                (v0, v1, v2), width, chunk)
            fill = np.mean([len(g) for g in groups])
            it = npp = lpp = 0
            for p in pick:
                i, n, l = simulate_packet(
                    o_all[p], d_all[p], a_all[p], entry, cmin, cmax,
                    groups, orders, tris, lp)
                it += i; npp += n; lpp += l
            k = len(pick)
            print(f"seg{seg} width={width:2d} chunk={chunk:2d} "
                  f"leaf_pops={lp}: wide_nodes={W}, octets={len(groups)} "
                  f"(fill {fill:.1f}/{chunk}), per-packet: iters "
                  f"{it/k:.1f}, node_pops {npp/k:.1f}, oct_pops {lpp/k:.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
