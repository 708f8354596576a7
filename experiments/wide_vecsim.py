"""Vectorized (all-packets-at-once) pop-count simulator.

wide16_sim.simulate_packet runs one packet per python loop — fine for
400-packet samples but per-packet difficulty varies enough that key/tree
comparisons at the few-percent level drown in sampling noise.  This
version simulates EVERY live packet simultaneously (stacks are (K, cap)
arrays, one vectorized kernel-iteration per outer step), so totals are
exact.  Calibration: full-population 8-wide counts must match the real
kernel's debug_iters (54 node / 78 oct pops per packet on 1080p bounce-2).
"""
import numpy as np


def simulate_all(o, d, alive, entry, cmin, cmax, groups, orders,
                 tris, leaf_pops, chunk_tris, cap_n=192, cap_l=384,
                 batch=4096):
    """o/d: (K,128,3); alive: (K,128).  Returns totals dict."""
    v0, e1, e2, face = tris
    width = entry.shape[1]
    EMPTY = -(1 << 20)
    EPS = np.float32(1e-6)
    # pad leaf groups to a dense (Q, chunk) index table (pad -> tri 0 with
    # validity mask)
    Q = len(groups)
    gidx = np.zeros((Q, chunk_tris), np.int64)
    gok = np.zeros((Q, chunk_tris), bool)
    for q, ids in enumerate(groups):
        gidx[q, :len(ids)] = ids
        gok[q, :len(ids)] = True

    tot = {"iters": 0, "node": 0, "oct": 0, "packets": 0, "ray_iters": 0}
    for s0 in range(0, o.shape[0], batch):
        ob = o[s0:s0 + batch]
        db = d[s0:s0 + batch]
        ab = alive[s0:s0 + batch]
        keep = ab.any(axis=1)
        ob, db, ab = ob[keep], db[keep], ab[keep]
        K = ob.shape[0]
        if K == 0:
            continue
        tot["packets"] += K
        inv = 1.0 / db
        bt = np.where(ab, np.float32(1e30), np.float32(-1e30))
        oct_id = ((db[:, :, 0].sum(1) < 0).astype(np.int64) << 2
                  | (db[:, :, 1].sum(1) < 0).astype(np.int64) << 1
                  | (db[:, :, 2].sum(1) < 0).astype(np.int64))
        stack_n = np.zeros((K, cap_n), np.int64)
        sp_n = np.ones(K, np.int64)  # root pushed
        stack_l = np.zeros((K, cap_l), np.int64)
        sp_l = np.zeros(K, np.int64)
        act_rows = np.arange(K)
        while True:
            live_p = (sp_n > 0) | (sp_l > 0)
            if not live_p.any():
                break
            idx = act_rows[live_p]
            tot["iters"] += len(idx)
            tot["ray_iters"] += len(idx)
            # --- node pop + expand + push (far-first) ---
            has_n = sp_n[idx] > 0
            ni = idx[has_n]
            if len(ni):
                tot["node"] += len(ni)
                sp_n[ni] -= 1
                w = stack_n[ni, sp_n[ni]]
                mn = cmin[w]  # (k, width, 3)
                mx = cmax[w]
                t1 = (mn[:, None] - ob[ni][:, :, None]) * inv[ni][:, :, None]
                t2 = (mx[:, None] - ob[ni][:, :, None]) * inv[ni][:, :, None]
                near = np.minimum(t1, t2).max(axis=3)   # (k, 128, width)
                far = np.maximum(t1, t2).min(axis=3)
                ok = (far >= near) & (far >= 0.0) & (near <= bt[ni][:, :, None])
                bits = ok.any(axis=1)                    # (k, width)
                ordw = orders[oct_id[ni], w]             # (k, width) far first
                ent = np.take_along_axis(entry[w], ordw, axis=1)
                hit = np.take_along_axis(bits, ordw, axis=1) & (ent != EMPTY)
                is_n = hit & (ent >= 0)
                is_l = hit & (ent < 0)
                # push in rank order: position = sp + exclusive prefix
                pos_n = sp_n[ni][:, None] + np.cumsum(is_n, axis=1) - is_n
                pos_l = sp_l[ni][:, None] + np.cumsum(is_l, axis=1) - is_l
                kk = np.arange(len(ni))[:, None].repeat(width, 1)
                stack_n[ni[kk[is_n]], pos_n[is_n]] = ent[is_n]
                stack_l[ni[kk[is_l]], pos_l[is_l]] = -ent[is_l] - 1
                sp_n[ni] += is_n.sum(axis=1)
                sp_l[ni] += is_l.sum(axis=1)
            # --- leaf pops ---
            for _ in range(leaf_pops):
                has_l = sp_l[idx] > 0
                li = idx[has_l]
                if not len(li):
                    break
                tot["oct"] += len(li)
                sp_l[li] -= 1
                q = stack_l[li, sp_l[li]]
                ids = gidx[q]                            # (k, C)
                okm = gok[q]
                det = np.einsum('krx,kcx->krc', db[li], face[ids])
                r = ob[li][:, :, None, :] - v0[ids][:, None, :, :]
                # r: (k, 128, C, 3)
                with np.errstate(divide='ignore', invalid='ignore'):
                    t = -np.einsum('krcx,kcx->krc', r, face[ids]) / det
                    p = np.cross(r, db[li][:, :, None, :])
                    u = -np.einsum('krcx,kcx->krc', p, e2[ids]) / det
                    v = np.einsum('krcx,kcx->krc', p, e1[ids]) / det
                valid = ((np.abs(det) >= EPS) & (t > EPS) & (u >= 0)
                         & (v >= 0) & (u + v <= 1.0) & okm[:, None, :])
                t = np.where(valid, t, 1e30).min(axis=2)
                bt[li] = np.minimum(bt[li], t)
    return tot
