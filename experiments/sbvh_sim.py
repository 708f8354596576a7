"""Does an SBVH (spatial-split BVH, Stich et al. 2009) cut packet pops?

STATUS.md closed "scene-level" tree work by citing the pruning-oracle
bound (a perfect final-t oracle saves only 11.6% of iterations) — but
that bound only limits *t-pruning within the same tree*.  Spatial splits
change the tree itself: child boxes stop overlapping, so packets expand
fewer false-positive subtrees regardless of t.  This experiment builds a
binned SBVH in numpy (object SAH splits + spatial splits with AABB
clipping, gated on child-overlap area), collapses it with the SAME
8-wide DP + re-chunking as production (wide16_sim.build_wide), and
replays the captured 1080p bounce-2 packets through the kernel-faithful
pop simulator.

Usage:  python experiments/sbvh_sim.py  (pure numpy once the ray capture
exists; run wide16_sim.capture_rays() on TPU first).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

from wide16_sim import CAPTURE, SAMPLE_PACKETS, SEED, build_wide
from wide_vecsim import simulate_all

BINS = 16
ALPHA = 1e-5          # spatial splits allowed when overlap/root_area > ALPHA
MAX_DUP = 2.0         # reference-count growth cap (refs <= MAX_DUP * T)


def _sa(lo, hi):
    d = np.maximum(hi - lo, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def build_sbvh(v0, v1, v2, max_leaf, bins=BINS, alpha=ALPHA,
               spatial=True, axes="all"):
    """Binary SBVH over triangle references; returns
    (node_min, node_max, left_of, right_of, is_leaf, leaf_ids) where
    leaf_ids[b] is an ORIGINAL-triangle id array (duplicates across
    leaves allowed).  Spatial splits clip the reference AABB to each
    side (full polygon clipping is tighter; AABB clipping is the usual
    cheap variant and preserves correctness: clipped boxes still cover
    the triangle parts in each region)."""
    T = v0.shape[0]
    tri_lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float64)
    tri_hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float64)
    root_sa = _sa(tri_lo.min(0), tri_hi.max(0))
    max_refs = int(MAX_DUP * T)

    # reference pools (grow by appending)
    ref_tri = list(range(T))
    ref_lo = [tri_lo[i] for i in range(T)]
    ref_hi = [tri_hi[i] for i in range(T)]

    node_min, node_max = [], []
    node_children = []            # (l, r) or (-1, -1)
    leaf_ids = []                 # per node: np.ndarray or None
    stack = [(list(range(T)), None)]   # (ref index list, parent slot)

    while stack:
        refs, parent = stack.pop()
        me = len(node_children)
        lo = np.min([ref_lo[r] for r in refs], axis=0)
        hi = np.max([ref_hi[r] for r in refs], axis=0)
        node_min.append(lo)
        node_max.append(hi)
        if parent is not None:
            p, slot = parent
            a, b = node_children[p]
            node_children[p] = (me, b) if slot == 0 else (a, me)
        n = len(refs)
        if n <= max_leaf:
            node_children.append((-1, -1))
            leaf_ids.append(np.asarray(sorted({ref_tri[r] for r in refs}),
                                       np.int64))
            continue
        node_children.append((0, 0))
        leaf_ids.append(None)

        los = np.stack([ref_lo[r] for r in refs])
        his = np.stack([ref_hi[r] for r in refs])
        cent = (los + his) * 0.5

        # ---- binned object SAH over all 3 axes ----
        best = (np.inf, None)     # (cost, (kind, axis, payload))
        if axes == "all":
            ax_list = range(3)
        else:  # "largest": the native builder's single-axis rule
            ext3 = cent.max(0) - cent.min(0)
            ax_list = [int(np.argmax(ext3))]
        for ax in ax_list:
            cmin, cmax = cent[:, ax].min(), cent[:, ax].max()
            if cmax <= cmin:
                continue
            scale = bins / (cmax - cmin)
            bi = np.minimum(((cent[:, ax] - cmin) * scale).astype(int),
                            bins - 1)
            blo = np.full((bins, 3), np.inf)
            bhi = np.full((bins, 3), -np.inf)
            cnt = np.zeros(bins, np.int64)
            for k in range(bins):
                m = bi == k
                if m.any():
                    blo[k] = los[m].min(0)
                    bhi[k] = his[m].max(0)
                    cnt[k] = m.sum()
            # prefix/suffix sweeps
            plo = np.minimum.accumulate(blo, 0)
            phi = np.maximum.accumulate(bhi, 0)
            slo = np.minimum.accumulate(blo[::-1], 0)[::-1]
            shi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
            pc = np.cumsum(cnt)
            for k in range(bins - 1):
                nl, nr = pc[k], n - pc[k]
                if nl == 0 or nr == 0:
                    continue
                c = _sa(plo[k], phi[k]) * nl + _sa(slo[k + 1], shi[k + 1]) * nr
                if c < best[0]:
                    # overlap of the two child boxes (for the spatial gate)
                    olo = np.maximum(plo[k], slo[k + 1])
                    ohi = np.minimum(phi[k], shi[k + 1])
                    ov = _sa(olo, ohi) if (ohi > olo).all() else 0.0
                    best = (c, ("obj", ax, (bi <= k), ov))

        # ---- binned spatial split (same axis sweep over the NODE box) ----
        if (spatial and best[1] is not None and len(ref_tri) < max_refs
                and best[1][3] / root_sa > alpha):
            for ax in range(3):
                lo_a, hi_a = lo[ax], hi[ax]
                if hi_a <= lo_a:
                    continue
                scale = bins / (hi_a - lo_a)
                b0 = np.clip(((los[:, ax] - lo_a) * scale).astype(int),
                             0, bins - 1)
                b1 = np.clip(((his[:, ax] - lo_a) * scale).astype(int),
                             0, bins - 1)
                blo = np.full((bins, 3), np.inf)
                bhi = np.full((bins, 3), -np.inf)
                entry = np.zeros(bins, np.int64)
                exit_ = np.zeros(bins, np.int64)
                for r in range(n):
                    entry[b0[r]] += 1
                    exit_[b1[r]] += 1
                    for k in range(b0[r], b1[r] + 1):
                        # clip the reference box to bin k's slab
                        klo, khi = (lo_a + k / scale,
                                    lo_a + (k + 1) / scale)
                        clo = los[r].copy()
                        chi = his[r].copy()
                        clo[ax] = max(clo[ax], klo)
                        chi[ax] = min(chi[ax], khi)
                        blo[k] = np.minimum(blo[k], clo)
                        bhi[k] = np.maximum(bhi[k], chi)
                plo = np.minimum.accumulate(blo, 0)
                phi = np.maximum.accumulate(bhi, 0)
                slo = np.minimum.accumulate(blo[::-1], 0)[::-1]
                shi = np.maximum.accumulate(bhi[::-1], 0)[::-1]
                pent = np.cumsum(entry)
                sext = np.cumsum(exit_[::-1])[::-1]
                for k in range(bins - 1):
                    nl, nr = pent[k], sext[k + 1]
                    if nl == 0 or nr == 0:
                        continue
                    c = (_sa(plo[k], phi[k]) * nl
                         + _sa(slo[k + 1], shi[k + 1]) * nr)
                    if c < best[0]:
                        plane = lo_a + (k + 1) / scale
                        best = (c, ("spat", ax, plane, 0.0))

        if best[1] is None:
            # degenerate: even split by any order
            half = n // 2
            l_refs, r_refs = refs[:half], refs[half:]
        elif best[1][0] == "obj":
            _, ax, mask, _ = best[1]
            l_refs = [r for r, m in zip(refs, mask) if m]
            r_refs = [r for r, m in zip(refs, mask) if not m]
        else:
            _, ax, plane, _ = best[1]
            l_refs, r_refs = [], []
            for r in refs:
                if ref_hi[r][ax] <= plane:
                    l_refs.append(r)
                elif ref_lo[r][ax] >= plane:
                    r_refs.append(r)
                else:
                    # straddler: split the reference (clip AABB both sides)
                    lo_r, hi_r = ref_lo[r], ref_hi[r]
                    hl = hi_r.copy(); hl[ax] = plane
                    lr = lo_r.copy(); lr[ax] = plane
                    ref_lo[r] = lo_r; ref_hi[r] = hl
                    l_refs.append(r)
                    ref_tri.append(ref_tri[r])
                    ref_lo.append(lr); ref_hi.append(hi_r)
                    r_refs.append(len(ref_tri) - 1)
            if not l_refs or not r_refs:
                half = n // 2
                l_refs, r_refs = refs[:half], refs[half:]

        stack.append((r_refs, (me, 1)))
        stack.append((l_refs, (me, 0)))

    N = len(node_children)
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    left_of = np.array([c[0] for c in node_children], np.int64)
    right_of = np.array([c[1] for c in node_children], np.int64)
    is_leaf = left_of == -1
    dup = len(ref_tri) / T
    return (node_min, node_max, left_of, right_of, is_leaf, leaf_ids, dup)


def build_wide_from_binary(tree, scene_tris, width, leaf_chunk):
    """The production DP collapse + re-chunking (wide16_sim.build_wide's
    body) over an externally built binary tree."""
    node_min, node_max, left_of, right_of, is_leaf, leaf_ids, _ = tree
    v0, v1, v2 = scene_tris
    tri_lo = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tri_hi = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    tri_cent = ((v0 + v1 + v2) / 3.0).astype(np.float32)
    N = len(is_leaf)

    INF = 1 << 30
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
            bestc, arg = INF, 0
            for s1 in range(1, s):
                c = hl[s1] + hr[s - s1]
                if c < bestc:
                    bestc, arg = c, s1
            h[b, s] = bestc
            split_of[b, s] = arg
        root_cost = 1 + int(h[b, 2:width + 1].min())
        if root_cost < h[b, 1]:
            h[b, 1] = root_cost
            split_of[b, 1] = 0

    def _leaf_ids(b):
        return leaf_ids[b]

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
    for w, slots in enumerate(children):
        for j, b in enumerate(slots):
            if isinstance(b, np.ndarray):
                cmin[w, j] = tri_lo[b].min(axis=0)
                cmax[w, j] = tri_hi[b].max(axis=0)
                entry[w, j] = -len(groups) - 1
                groups.append(b)
            else:
                cmin[w, j] = node_min[b]
                cmax[w, j] = node_max[b]
                entry[w, j] = wide_of[b]

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
    return entry, cmin, cmax, groups, orders, W


def main():
    if not os.path.exists(CAPTURE):
        print("run wide16_sim.capture_rays() on TPU first"); return
    cap = np.load(CAPTURE)
    from opengl_raytracer_tpu.models.scene import Scene
    from opengl_raytracer_tpu.presets import default_objects

    sc = Scene(default_objects("stanford_minidragon"))
    sd = sc.send()
    v0 = np.asarray(sd.v0)
    e1 = np.asarray(sd.e1)
    e2 = np.asarray(sd.e2)
    face = np.asarray(sd.face)
    v1 = v0 + e1
    v2 = v0 + e2
    tris = (v0, e1, e2, face)
    scene_tris = (v0, v1, v2)

    b = 2
    o = cap[f"o{b}"].reshape(-1, 128, 3)
    d = cap[f"d{b}"].reshape(-1, 128, 3)
    alive = cap[f"alive{b}"].reshape(-1, 128)
    rng = np.random.default_rng(SEED)
    # fixed 4096-packet coherent subsample (contiguous span keeps the
    # sort's packet coherence intact)
    K = o.shape[0]
    n_s = min(4096, K)
    s0 = (K - n_s) // 2
    o, d, alive = o[s0:s0 + n_s], d[s0:s0 + n_s], alive[s0:s0 + n_s]

    import time
    variants = (("sah-obj-all-axes", False, "all"),
                ("sah-obj-largest-axis", False, "largest"),
                ("sbvh", True, "all"))
    which = os.environ.get("VARIANTS")
    if which:
        variants = [v for v in variants if v[0] in which.split(",")]
    for name, spatial, axes in variants:
        t0 = time.time()
        tree = build_sbvh(v0, v1, v2, max_leaf=8, spatial=spatial,
                          axes=axes)
        dup = tree[-1]
        t_build = time.time() - t0
        entry, cmin, cmax, groups, orders, W = build_wide_from_binary(
            tree, scene_tris, width=8, leaf_chunk=8)
        fill = np.mean([len(g) for g in groups])
        tot = simulate_all(o, d, alive, entry, cmin, cmax, groups, orders,
                           tris, leaf_pops=2, chunk_tris=8)
        P = tot["packets"]
        print(f"{name}: build {t_build:.1f}s dup {dup:.2f} wide={W} "
              f"octets={len(groups)} fill={fill:.1f} | "
              f"iters/pkt {tot['iters']/P:.1f} node {tot['node']/P:.1f} "
              f"oct {tot['oct']/P:.1f}", flush=True)

    # production baseline: the native binned-SAH tree through the same
    # collapse (wide16_sim.build_wide)
    children, entry, cmin, cmax, groups, orders, W = build_wide(
        scene_tris, width=8, leaf_chunk=8, method="sah")
    fill = np.mean([len(g) for g in groups])
    tot = simulate_all(o, d, alive, entry, cmin, cmax, groups, orders,
                       tris, leaf_pops=2, chunk_tris=8)
    P = tot["packets"]
    print(f"native-sah (production): wide={W} octets={len(groups)} "
          f"fill={fill:.1f} | iters/pkt {tot['iters']/P:.1f} "
          f"node {tot['node']/P:.1f} oct {tot['oct']/P:.1f}", flush=True)


if __name__ == "__main__":
    main()
