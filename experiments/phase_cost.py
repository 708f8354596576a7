"""Isolated per-phase cost of the CURRENT sub-block kernel body.

Each variant runs ONE phase of subblock_traversal's body in a trivial
while loop with a loop-carried (8,128) accumulator so nothing is DCE'd;
table rows come from VMEM scratch preloaded per iteration with a cheap
counter-derived dynamic load (measured ~66 ns for 16 loads, subtracted
implicitly by comparing against the `loads` baseline).

Variants:
  loads      : 24 dynamic row loads only (the data feed)
  leaf1      : loads + ONE octet x 8-tri Moller-Trumbore + best update
  leaf2      : loads + TWO octets (the kernel's dual-octet leaf phase)
  expand     : loads + 8-child slab test + hit bitmask
  push       : loads + octant-order extraction + tree-combined stack adds
  push2      : push with PARALLEL-PREFIX rank positions ((8,8) lane-domain
               prefix sums instead of the serial per-rank (8,1) pos chain)

MEASURED OUTCOMES (TPU v5e): loads ~0 (prefetchable), pops 113,
expand 502, push 1370 (serial chain; push2 1120 isolated / ~360 in
context), leaf1 347, leaf2 579, all 1871, all2 1490, allserve 1464
(serve machinery pipelines to ~FREE), expand2 821 (pltpu.roll lane
OR-reduce is 60% SLOWER than 8 jnp.any reductions — rolls don't
pipeline; negative result), all3 1616.  Conclusions that shaped the
kernel: the serve/claim block costs nothing in context; the vector
phases are issue-bound and near their op-count floor; the only
iteration-cost lever left was amortizing the serial spine over more
rows (8 -> 64).
  expandbf (round 5, VERDICT r4 item 3): the expand phase with the
slab math in bfloat16 — the probe for a CONSERVATIVE reduced-precision
slab test (directed-rounding-widened boxes keep correctness by
construction; cost would be extra pops).  MEASURED: does not compile —
Mosaic on v5e rejects bf16 vector COMPARES (min/max/>=), the same
16-bit-compare capability hole that closed int16 stacks
(stack16_ab.py); a bisect shows bf16 *arithmetic* lowers fine, bf16
comparisons are what fail.  A slab test is nothing but compares, so
conservative-bf16 traversal is closed BY HARDWARE CAPABILITY on this
generation, not by assertion.  (Even if it compiled, the phases are
VPU-issue-bound and v5e has no 2x bf16 issue rate; the only win channel
— halved row loads — measures ~0 because loads prefetch for free.)
  leaf2_fakediv (round 4): leaf2 with the 16 per-triangle 1.0/det
divides replaced by a mul — a pure cost probe.  MEASURED at SUB=64:
leaf2 3818 vs fakediv 3846 ns/iter (expand 2028) — the divides are
FREE on v5e (Mosaic pipelines them like muls), so a division-free
rational Moller-Trumbore (deferred-divide t/u/v with det-space
compares) has NOTHING to win: direction closed without building it.
  pops       : loads + dual-stack one-hot pops + index arithmetic
  all        : loads + pops + expand + push + leaf2 (~ the real body
               minus serve machinery)
  allserve   : all2 + the serve/claim machinery (output copies, SMEM
               counter, 10 claim loads, flag tile, claim selects) — the
               full real body; allserve - all2 = serve cost in context
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODES = 1024
OCTETS = 4096
STACK_N = 128
STACK_L = 256
ORD0 = 48
EMPTY_PACKED = -(1 << 20)
import os as _os
_SUB, _LANE = int(_os.environ.get('SUB', 8)), 128
EPS = 1e-6


def _time_slope(f, args, label):
    import time as _t
    I1, I2 = 50_000, 250_000
    def bestof(iters, reps=5):
        a = [jnp.asarray(np.array([iters], np.int32))] + args
        best = 1e9
        for _ in range(reps):
            t0 = _t.time()
            r = f(*a)
            out0 = r[0] if isinstance(r, (tuple, list)) else r
            _ = float(jnp.sum(out0[:1, :1]))
            best = min(best, _t.time() - t0)
        return best
    t1 = bestof(I1)
    t2 = bestof(I2)
    ns = (t2 - t1) * 1e9 / (I2 - I1)
    print(f"{label}: {ns:.0f} ns/iter (t@{I1//1000}k={t1*1000:.1f} ms, "
          f"t@{I2//1000}k={t2*1000:.1f} ms)", flush=True)


def make_kernel(variant):
    do_pops = variant in ("pops", "all", "all2", "all3", "allserve")
    do_expand = variant in ("expand", "all", "all2", "push", "push2",
                            "allserve")
    do_expand2 = variant in ("expand2", "all3")
    do_expandbf = variant == "expandbf"
    do_push = variant == "push"
    do_push2 = variant in ("push2", "all2", "all3", "allserve")
    do_leaf1 = variant in ("leaf1",)
    do_leaf2 = variant in ("leaf2", "leaf2_fakediv",
                           "all", "all2", "all3", "allserve")
    # leaf2_fakediv: the dual-octet leaf phase with the 16 per-triangle
    # f32 divides (1.0/det) replaced by a same-shape mul — a pure COST
    # probe (wrong math) isolating what the divides cost per iteration.
    fake_div = variant == "leaf2_fakediv"
    do_serve = variant == "allserve"

    def kern(iters_ref, ox, node_rows, tri_rows, t_out,
             stack_n, stack_l, node_scr, tri_scr, tri_scr2,
             so_x, so_y, so_z, sd_x, sd_y, sd_z, si_x, si_y, si_z, st0,
             bt_scr, bsl_scr, bu_scr, bv_scr, flag_scr, out_big,
             cnt, pkt_ids):
        o_x = ox[:]
        o_y = o_x * 1.1
        o_z = o_x * 0.9
        d_x = o_x * 0.5 + 0.7
        d_y = o_x * 0.3 + 0.6
        d_z = o_x * 0.2 + 0.5
        inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z
        lane_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_N), 1)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_L), 1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
        cnt[0] = jnp.int32(0)
        for r in range(_SUB + 8):
            pkt_ids[r] = jnp.int32(r % 8)
        stack_n[:] = jnp.zeros((_SUB, STACK_N), jnp.int32)
        stack_l[:] = (jnp.zeros((_SUB, STACK_L), jnp.int32)
                      - lane_l % OCTETS - 1)
        ITERS_RT = iters_ref[0]

        def cond(c):
            return c[0] < ITERS_RT

        def body(c):
            it, bt, spn, spl = c

            if do_pops:
                act_n = (spn > 0) & (spl < STACK_L - 8)
                act_l = spl > 0
                act_l2 = spl > 1
                spn1 = spn - act_n.astype(jnp.int32)
                spl1 = spl - act_l.astype(jnp.int32) - act_l2.astype(jnp.int32)
                sn_t = stack_n[:]
                sl_t = stack_l[:]
                e_n = jnp.sum(jnp.where(lane_n == spn1, sn_t, 0), axis=1,
                              keepdims=True)
                e_l = jnp.sum(jnp.where(lane_l == (spl - 1), sl_t, 0), axis=1,
                              keepdims=True)
                e_l2 = jnp.sum(jnp.where(lane_l == (spl - 2), sl_t, 0), axis=1,
                               keepdims=True)
                idx_n = jnp.clip(jnp.where(act_n, e_n, 0), 0, NODES - 1)
                idx_l = jnp.clip(jnp.where(act_l, -e_l - 1, 0), 0, OCTETS - 1)
                idx_l2 = jnp.clip(jnp.where(act_l2, -e_l2 - 1, 0), 0,
                                  OCTETS - 1)
                # keep pointers bounded so the loop never exhausts
                spn = jnp.where(spn1 < 2, jnp.full_like(spn1, 64), spn1)
                spl = jnp.where(spl1 < 2, jnp.full_like(spl1, 64), spl1)
                bt = bt + (idx_n + idx_l + idx_l2).astype(jnp.float32) * 1e-30
            else:
                sn_t = stack_n[:]
                sl_t = stack_l[:]

            if do_serve:
                # faithful replica of the real kernel's serve/claim block
                done = ((it + sub_iota * 3) % 9 == 0)   # (8,1) synthetic
                r_star = jnp.min(jnp.where(done, sub_iota, _SUB))
                serving = r_star < _SUB
                dst = jnp.where(serving, r_star, _SUB)
                old = pkt_ids[dst]
                out_row = jnp.where(serving & (old >= 0), old, 64)
                out_big[out_row] = bt_scr[dst]
                out_big[jnp.minimum(out_row + 1, 71)] = bu_scr[dst]
                out_big[jnp.minimum(out_row + 2, 71)] = bv_scr[dst]
                out_big[jnp.minimum(out_row + 3, 71)] = bsl_scr[dst]
                nxt = cnt[0]
                got = serving & (nxt < 64)
                src_i = jnp.minimum(nxt, 63) % _SUB
                cnt[0] = jnp.where(nxt > 64, 0, nxt + got.astype(jnp.int32))
                pkt_ids[dst] = jnp.where(got, nxt, -1)
                so_x[dst] = ox[src_i]
                so_y[dst] = ox[src_i]
                so_z[dst] = ox[src_i]
                sd_x[dst] = ox[src_i]
                sd_y[dst] = ox[src_i]
                sd_z[dst] = ox[src_i]
                si_x[dst] = ox[src_i]
                si_y[dst] = ox[src_i]
                si_z[dst] = ox[src_i]
                st0[dst] = ox[src_i]

                @pl.when(got)
                def _():
                    flag_scr[dst] = jnp.ones((_LANE,), jnp.float32)

                @pl.when(jnp.logical_not(got))
                def _():
                    flag_scr[dst] = jnp.zeros((_LANE,), jnp.float32)

                served = done & (sub_iota == r_star)
                gm = flag_scr[0:_SUB, 0:1] > 0.5
                claimed = served & gm
                dried = served & ~gm
                bt = jnp.where(claimed, st0[0:_SUB],
                               jnp.where(dried, -1e30, bt_scr[0:_SUB]))
                # the 10 per-iteration ray-tile reads (kept live through
                # bt so the phases' o_x/d_x closure vars stay intact —
                # cost parity with the real kernel's re-reads)
                tiles = (so_x[0:_SUB] + so_y[0:_SUB] + so_z[0:_SUB]
                         + sd_x[0:_SUB] + sd_y[0:_SUB] + sd_z[0:_SUB]
                         + si_x[0:_SUB] + si_y[0:_SUB] + si_z[0:_SUB])
                bt = bt + tiles * 1e-30
                bt_scr[0:_SUB] = bt

            # ---- the 24 dynamic row loads (counter-derived indices) ----
            for r in range(_SUB):
                node_scr[r] = node_rows[(it * 7 + r * 331) % NODES]
                tri_scr[r] = tri_rows[(it * 11 + r * 733) % OCTETS]
                tri_scr2[r] = tri_rows[(it * 13 + r * 537) % OCTETS]
            nrow = node_scr[:]
            trow = tri_scr[:]

            if do_expand:
                bits = jnp.zeros((_SUB, 1), jnp.int32)
                for j in range(8):
                    b = j * 6
                    t1x = (nrow[:, b + 0:b + 1] - o_x) * inv_x
                    t1y = (nrow[:, b + 1:b + 2] - o_y) * inv_y
                    t1z = (nrow[:, b + 2:b + 3] - o_z) * inv_z
                    t2x = (nrow[:, b + 3:b + 4] - o_x) * inv_x
                    t2y = (nrow[:, b + 4:b + 5] - o_y) * inv_y
                    t2z = (nrow[:, b + 5:b + 6] - o_z) * inv_z
                    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                   jnp.minimum(t1y, t2y)),
                                       jnp.minimum(t1z, t2z))
                    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                  jnp.maximum(t1y, t2y)),
                                      jnp.maximum(t1z, t2z))
                    hit = (far >= near) & (far >= 0.0)
                    t_entry = jnp.where(hit, jnp.maximum(near, 0.0), -1.0)
                    ok = hit & (t_entry <= bt)
                    anyj = jnp.any(ok, axis=1, keepdims=True)
                    bits = bits | jnp.where(anyj, jnp.int32(1) << j, 0)
                bt = bt + bits.astype(jnp.float32) * 1e-30

            if do_push:
                octant = (it % 8) + jnp.zeros((_SUB, 1), jnp.int32)
                ordb = jnp.zeros((_SUB, 8), jnp.float32)
                for o in range(8):
                    ordb = ordb + jnp.where(
                        octant == o,
                        nrow[:, ORD0 + o * 8:ORD0 + o * 8 + 8], 0.0)
                pos_n = jnp.full((_SUB, 1), 3, jnp.int32)
                pos_l = jnp.full((_SUB, 1), 3, jnp.int32)
                ents, pns, plfs, posns, posls = [], [], [], [], []
                for i in range(8):
                    pk = ordb[:, i:i + 1].astype(jnp.int32)
                    ent = pk >> 3
                    sl = pk & 7
                    ok = (((bits >> sl) & 1) != 0) & (ent != EMPTY_PACKED)
                    pn = ok & (ent >= 0) & (pos_n < STACK_N)
                    plf = ok & (ent < 0) & (pos_l < STACK_L)
                    ents.append(ent); pns.append(pn); plfs.append(plf)
                    posns.append(pos_n); posls.append(pos_l)
                    pos_n = pos_n + pn.astype(jnp.int32)
                    pos_l = pos_l + plf.astype(jnp.int32)
                dn = [jnp.where((lane_n == posns[i]) & pns[i],
                                ents[i] - sn_t, 0) for i in range(8)]
                dl = [jnp.where((lane_l == posls[i]) & plfs[i],
                                ents[i] - sl_t, 0) for i in range(8)]
                while len(dn) > 1:
                    dn = [dn[k] + dn[k + 1] for k in range(0, len(dn), 2)]
                    dl = [dl[k] + dl[k + 1] for k in range(0, len(dl), 2)]
                stack_n[:] = sn_t + dn[0]
                stack_l[:] = sl_t + dl[0]

            if do_expand2:
                # one OR-reduce for all 8 children: per-child ok masks OR
                # into a per-lane bit accumulator, reduced once with 7
                # lane rolls, instead of 8 separate jnp.any reductions
                from jax.experimental.pallas import tpu as _pt
                acc = jnp.zeros((_SUB, _LANE), jnp.int32)
                for j in range(8):
                    b = j * 6
                    t1x = (nrow[:, b + 0:b + 1] - o_x) * inv_x
                    t1y = (nrow[:, b + 1:b + 2] - o_y) * inv_y
                    t1z = (nrow[:, b + 2:b + 3] - o_z) * inv_z
                    t2x = (nrow[:, b + 3:b + 4] - o_x) * inv_x
                    t2y = (nrow[:, b + 4:b + 5] - o_y) * inv_y
                    t2z = (nrow[:, b + 5:b + 6] - o_z) * inv_z
                    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                   jnp.minimum(t1y, t2y)),
                                       jnp.minimum(t1z, t2z))
                    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                  jnp.maximum(t1y, t2y)),
                                      jnp.maximum(t1z, t2z))
                    hit = (far >= near) & (far >= 0.0)
                    t_entry = jnp.where(hit, jnp.maximum(near, 0.0), -1.0)
                    ok = hit & (t_entry <= bt)
                    acc = acc | jnp.where(ok, jnp.int32(1) << j, 0)
                for k in (64, 32, 16, 8, 4, 2, 1):
                    acc = acc | _pt.roll(acc, k, 1)
                bits = acc[:, 0:1]
                bt = bt + bits.astype(jnp.float32) * 1e-30

            if do_expandbf:
                bits = jnp.zeros((_SUB, 1), jnp.int32)
                bf = jnp.bfloat16
                o_xb, o_yb, o_zb = o_x.astype(bf), o_y.astype(bf), o_z.astype(bf)
                i_xb, i_yb, i_zb = (inv_x.astype(bf), inv_y.astype(bf),
                                    inv_z.astype(bf))
                btb = bt.astype(bf)
                nrb = nrow.astype(bf)
                for j in range(8):
                    b = j * 6
                    t1x = (nrb[:, b + 0:b + 1] - o_xb) * i_xb
                    t1y = (nrb[:, b + 1:b + 2] - o_yb) * i_yb
                    t1z = (nrb[:, b + 2:b + 3] - o_zb) * i_zb
                    t2x = (nrb[:, b + 3:b + 4] - o_xb) * i_xb
                    t2y = (nrb[:, b + 4:b + 5] - o_yb) * i_yb
                    t2z = (nrb[:, b + 5:b + 6] - o_zb) * i_zb
                    near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                                   jnp.minimum(t1y, t2y)),
                                       jnp.minimum(t1z, t2z))
                    far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                                  jnp.maximum(t1y, t2y)),
                                      jnp.maximum(t1z, t2z))
                    hit = (far >= near) & (far >= bf(0.0))
                    t_entry = jnp.where(hit, jnp.maximum(near, bf(0.0)),
                                        bf(-1.0))
                    ok = hit & (t_entry <= btb)
                    anyj = jnp.any(ok, axis=1, keepdims=True)
                    bits = bits | jnp.where(anyj, jnp.int32(1) << j, 0)
                bt = bt + bits.astype(jnp.float32) * 1e-30

            if do_push2:
                octant = (it % 8) + jnp.zeros((_SUB, 1), jnp.int32)
                ordb = jnp.zeros((_SUB, 8), jnp.float32)
                for o in range(8):
                    ordb = ordb + jnp.where(
                        octant == o,
                        nrow[:, ORD0 + o * 8:ORD0 + o * 8 + 8], 0.0)
                spn1 = jnp.full((_SUB, 1), 3, jnp.int32)
                spl1 = jnp.full((_SUB, 1), 3, jnp.int32)
                pk8 = ordb.astype(jnp.int32)
                ent8 = pk8 >> 3
                sl8 = pk8 & 7
                ok8 = (((bits >> sl8) & 1) != 0) & (ent8 != EMPTY_PACKED)
                isn8 = (ok8 & (ent8 >= 0)).astype(jnp.int32)
                isl8 = (ok8 & (ent8 < 0)).astype(jnp.int32)

                def incl_prefix(x):
                    z = jnp.zeros_like(x)
                    for k in (1, 2, 4):
                        x = x + jnp.concatenate(
                            [z[:, :k], x[:, :-k]], axis=1)
                    return x

                in_n = incl_prefix(isn8)
                in_l = incl_prefix(isl8)
                pos_n8 = spn1 + (in_n - isn8)
                pos_l8 = spl1 + (in_l - isl8)
                pn8 = (isn8 > 0) & (pos_n8 < STACK_N)
                pl8 = (isl8 > 0) & (pos_l8 < STACK_L)
                dn = [jnp.where((lane_n == pos_n8[:, i:i + 1])
                                & pn8[:, i:i + 1],
                                ent8[:, i:i + 1] - sn_t, 0)
                      for i in range(8)]
                dl = [jnp.where((lane_l == pos_l8[:, i:i + 1])
                                & pl8[:, i:i + 1],
                                ent8[:, i:i + 1] - sl_t, 0)
                      for i in range(8)]
                while len(dn) > 1:
                    dn = [dn[k] + dn[k + 1] for k in range(0, len(dn), 2)]
                    dl = [dl[k] + dl[k + 1] for k in range(0, len(dl), 2)]
                stack_n[:] = sn_t + dn[0]
                stack_l[:] = sl_t + dl[0]
                bt = bt + (in_n[:, 7:8] + in_l[:, 7:8]).astype(
                    jnp.float32) * 1e-30

            if do_leaf1 or do_leaf2:
                octs = [(trow, jnp.int32(1))]
                if do_leaf2:
                    octs.append((tri_scr2[:], jnp.int32(2)))
                for trow_k, base in octs:
                    for j in range(8):
                        b = j * 16
                        v0x, v0y, v0z = (trow_k[:, b + 0:b + 1],
                                         trow_k[:, b + 1:b + 2],
                                         trow_k[:, b + 2:b + 3])
                        e1x, e1y, e1z = (trow_k[:, b + 3:b + 4],
                                         trow_k[:, b + 4:b + 5],
                                         trow_k[:, b + 5:b + 6])
                        e2x, e2y, e2z = (trow_k[:, b + 6:b + 7],
                                         trow_k[:, b + 7:b + 8],
                                         trow_k[:, b + 8:b + 9])
                        fx, fy, fz = (trow_k[:, b + 9:b + 10],
                                      trow_k[:, b + 10:b + 11],
                                      trow_k[:, b + 11:b + 12])
                        det = d_x * fx + d_y * fy + d_z * fz
                        inv_det = det * 1e-6 if fake_div else 1.0 / det
                        rx = o_x - v0x
                        ry = o_y - v0y
                        rz = o_z - v0z
                        t = -(rx * fx + ry * fy + rz * fz) * inv_det
                        px = ry * d_z - rz * d_y
                        py = rz * d_x - rx * d_z
                        pz = rx * d_y - ry * d_x
                        u = -(e2x * px + e2y * py + e2z * pz) * inv_det
                        vv = (e1x * px + e1y * py + e1z * pz) * inv_det
                        valid = ((jnp.abs(det) >= EPS) & (t > EPS)
                                 & (u >= 0.0) & (vv >= 0.0)
                                 & ((u + vv) <= 1.0))
                        better = valid & (t < bt)
                        bt = jnp.where(better, t, bt)
            return it + 1, bt, spn, spl

        _, bt, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), o_x * 0.0 + 100.0,
             jnp.full((_SUB, 1), 64, jnp.int32),
             jnp.full((_SUB, 1), 64, jnp.int32)))
        t_out[:] = bt
    return kern


def run(variant):
    rng = np.random.default_rng(0)
    node_rows = jnp.asarray(rng.uniform(-5, 5, (NODES, 128)).astype(np.float32))
    tri_rows = jnp.asarray(rng.uniform(-5, 5, (OCTETS, 128)).astype(np.float32))
    o = jnp.asarray(rng.uniform(-1, 1, (_SUB, _LANE)).astype(np.float32))

    whole = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        make_kernel(variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  whole((_SUB, _LANE)), whole((NODES, 128)),
                  whole((OCTETS, 128))],
        out_specs=whole((_SUB, _LANE)),
        out_shape=jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_SUB, STACK_N), jnp.int32),
                        pltpu.VMEM((_SUB, STACK_L), jnp.int32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32)]
                   + [pltpu.VMEM((_SUB + 8, _LANE), jnp.float32)] * 10
                   + [pltpu.VMEM((_SUB + 8, _LANE), jnp.float32)] * 5
                   + [pltpu.VMEM((max(72, _SUB + 8), _LANE), jnp.float32)]
                   + [pltpu.SMEM((1,), jnp.int32),
                      pltpu.SMEM((_SUB + 8,), jnp.int32)],
    )(*a))
    try:
        r = f(jnp.asarray(np.array([8], np.int32)), o, node_rows, tri_rows)
        _ = float(jnp.sum(r[:1, :1]))
    except Exception as e:
        print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    _time_slope(f, [o, node_rows, tri_rows], variant)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["loads", "pops", "expand", "push",
                               "leaf1", "leaf2", "all"]):
        run(v)
