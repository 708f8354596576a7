"""Work-stealing sub-block BVH traversal — the round-2 Pallas kernel.

Why: the round-1 kernel (ops/pallas_traversal.py) marries 1024 rays to one
node pointer, so every node it visits is the UNION of 8 packets' needs and
every opened leaf is tested against all 1024 rays.  Measured on real
bounce rays (experiments/packet_stats.py, minidragon 1080p): a 128-ray
packet needs ~50 node+octet pops on average while the 1024-block pays
~217 heavier iterations, and packets inside a block are ~1.4-2.5x
imbalanced.

This kernel runs SIXTY-FOUR INDEPENDENT 128-ray packets per instance —
one per sublane row — each with its own node pointer, its own dual
stacks (node stack + leaf-octet stack), and its own progress.  When a
row finishes its packet it *steals the next packet* from the grid step's
pool (a shared SMEM counter), so fast rows absorb the stragglers'
imbalance.  Row count is the spine-amortization knob: the iteration's
SERIAL spine (pops -> VMEM-round-trip scalar extraction -> dynamic row
loads) costs ~0.7us regardless of row count — measured as the gap
between the sum-of-phases cost and the in-situ per-iteration cost
(experiments/phase_cost.py; the serve machinery itself pipelines to
~free, all2 1490 vs allserve 1464 ns/iter) — while the dense vector
phases scale linearly, so wider instances amortize the spine over more
rays: 8 -> 16 -> 32 -> 64 rows measured 212.9 -> 200.9 -> 190.0 ->
171.5 ms on the 2M-ray sorted bounce proxy (128 rows exceeds the 16 MB
VMEM scoped budget).  N_SERVE rows are served per iteration — with one,
E~13 primary-ray packets are serve-rate-bound (_SUB/E serves demanded
per iteration).

Per iteration, all work is dense (16,128) vector math with BRANCH-FREE
claims (conditional per-row claim blocks measured ~5.5 us per firing —
fatal on short packets; instead ONE done row is served per iteration with
unconditional dynamic loads/stores routed to a dummy row when idle):

  1. pop one node entry and up to TWO octet entries per row (one-hot
     reads from VMEM stacks; the octet stack throttles node pops when
     nearly full).  Dual octet pops nearly halve the iteration count of
     leaf-bound bounce packets for ~25% more per-iteration work.
  2. pack (node, octet, octet2) per row into i32 words at lanes 0/64 of
     a VMEM tile, read scalars back (the Mosaic-safe computed-scalar
     path; verified on hardware by experiments/subblock_correct.py)
  3. serve the N_SERVE lowest done rows: copy each finished packet's
     results to the output rows (best t/slot/u/v live in VMEM scratch so
     rows are dynamically addressable), then claim the next pool packet
     (10 dynamic row loads of its rays); all stores target the dummy
     scratch row _SUB / output row POOL when there is nothing to serve.
     Claims stop at a DYNAMIC live-packet limit (dead-packet skipping):
     the caller passes, per grid step, the index one past the last packet
     containing a live ray, so the all-dead tail that the reorder sort
     parks behind the key sentinel is never claimed at all — without
     this, every dead packet burns a serve slot and an all-dead pool
     still costs pool/N_SERVE iterations (~45 ms at the whole-frame
     pool), which late bounce segments would pay almost in full
  4. 16 dynamic row loads: each row's wide-node row + octet row
  5. expand: 8 static-j child slab tests, child j's bounds broadcast
     from lanes [j*6, j*6+6) of each row's node record
  6. push: per-row octant selects the precomputed far-first order block
     (8 lanes); entries push into the stacks via one-hot vector writes
  7. leaf: 8 static-j Moller-Trumbore tests, triangle j broadcast from
     lanes [j*16, j*16+12) of each row's octet record; u/v of the winner
     are kept in-kernel so the host wrapper needs no recompute pass

Exact reference semantics preserved: slab entry clamp and -1 miss
(fragment.glsl:181-204), `tNear > closestT` pruning (fragment.glsl:261),
EPS rules and strict `<` nearest update (fragment.glsl:106-177, :275),
near-first child order via far-first LIFO pushes.  Dead rays enter with
best_t = -inf: they can neither open nodes nor accept hits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengl_raytracer_tpu.ops.intersect import BIG, EPS, Nearest
from opengl_raytracer_tpu.ops.wide2 import EMPTY_PACKED, ORD0

_SUB, _LANE = 64, 128
_SCR = 72           # scratch rows: 0-63 live, 64 dummy claim target
N_SERVE = 5         # default rows served per iteration: ceil(_SUB / ~13),
                    # the serve demand of E~13 primary-ray packets
SERVE_PRIMARY = 8   # serve rate for primary segments, which sit near the
                    # claim-rate floor (16200 pkts / N per iteration): 8
                    # measured 3006 iters / 75.2 ms vs 5's 3779 / 78.6 on
                    # the standalone 2M-ray primary cast
                    # (experiments/nserve_sweep.py).  Only primaries pay
                    # the extra serve slots — bounce segments keep 3.
SERVE_BOUNCE = 3    # serve rate for bounce segments: real bounce packets
                    # last ~52 iterations (1.24 claims/iteration), and
                    # each serve slot costs ~0.4 us/iteration in the
                    # 64-row kernel (experiments/phase_cost.py), so the
                    # default 5 pays ~0.8 us/iteration for nothing there
_SERVE_RANKED = False  # pick served rows by parallel rank instead of a
                       # serial mask-and-rescan chain (A/B flag, read at
                       # trace time; experiments/serverank_ab.py)
POOL = 512          # default packets per grid step (65536 rays): 8
                    # packets/row bounds the end-of-pool drain tail
                    # (straggler rows finishing while others idle).
POOL_BIG = 640      # used when a part's tables fit the extra VMEM ray
                    # windows: 10 packets/row cuts the end-of-pool drain
                    # fraction (measured sub-iters/step mean 593 vs the
                    # 440 work ideal at 8 packets/row; pool 1024 measured
                    # a further -11% on the bounce proxy).  Pool sizing is
                    # bounded by the 16 MB scoped-VMEM budget, and the
                    # accounting is CONTEXT-DEPENDENT: the pipeline
                    # double-buffers every grid-indexed window
                    # (~11 KB/packet across the 7 ins + 4 outs) and eager
                    # call sites co-schedule pad/copy ops into the same
                    # scope (1024 compiled under the renderer's jit but
                    # OOMed at 19.7 MB eager; 768 OOMed at 16.96 MB).
                    # 640 measures ~15.5 MB in the worst context.
POOL_BIG_TABLE_BYTES = 4 * 1024 * 1024
POOL_MAX = 16384    # pool cap under ``big_pools`` (jit-only).  Bigger
                    # pools shrink the end-of-pool drain tail: 2M-ray
                    # bounce proxy measured 166.7 (pool 640) -> 137.2
                    # (4096) -> 135.2 (8192) -> 132.0 ms (16384, whole
                    # batch; experiments/pool_sweep.py).  Whole-batch
                    # pools put the multi-MB windows (and in some fusion
                    # contexts the output arrays) into Mosaic's scoped
                    # VMEM, whose default 16 MB guard they exceed — the
                    # kernel raises the guard via CompilerParams
                    # (vmem_limit_bytes) toward the physical budget, and
                    # tests/test_tpu_vmem.py compiles the worst-case
                    # contexts against the real limit.  Eager call sites
                    # keep POOL/POOL_BIG (big_pools is an opt-in from
                    # always-jitted callers).
STACK_N = 128       # per-row node stack (lanes).  64 lanes would
                    # cover any legal depth, but measured 11%
                    # SLOWER: sub-128-lane tiles half-fill the
                    # native (8,128) vregs, so the one-hot ops
                    # don't get cheaper and layout handling adds
                    # cost (170.2 vs 153.9 ms bounce proxy)
STACK_L = 256       # per-row leaf-octet stack (lanes)
_INT_BIG = np.int32(2**31 - 1)


def _traverse_kernel(*refs, n_wide: int, n_oct: int, pool: int,
                     leaf_pops: int, n_serve: int, node_pops: int):
    (ox, oy, oz, dx, dy, dz, t0, live_lim,
     node_rows, tri_rows,
     t_out, slot_out, u_out, v_out, it_out,
     stack_n, stack_l, *rest) = refs
    node_scrs = list(rest[:node_pops])
    tri_scrs = list(rest[node_pops:node_pops + leaf_pops])
    (xfer,
     so_x, so_y, so_z, sd_x, sd_y, sd_z,
     si_x, si_y, si_z, st0, flag_scr,
     bt_scr, bsl_scr, bu_scr, bv_scr,
     cnt, pkt_ids) = rest[node_pops + leaf_pops:]
    # node stack lanes double with dual node pops (see _raycast_one_part)
    sn_lanes = stack_n.shape[-1]
    _sdt = stack_n.dtype                 # int16 when _STACK_I16 (packed)
    _s0 = _sdt.type(0)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, sn_lanes),
                                      1).astype(_sdt)
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_L),
                                      1).astype(_sdt)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)

    cnt[0] = jnp.int32(0)
    for r in range(_SCR):
        pkt_ids[r] = jnp.int32(-1)
    stack_n[:] = jnp.zeros((_SUB, sn_lanes), _sdt)
    stack_l[:] = jnp.zeros((_SUB, STACK_L), _sdt)
    # Claims stop at the live-packet limit (dead-packet skipping): packets
    # past the last live one in this grid step are never claimed, so their
    # output rows are never served — initialize t to the miss sentinel so
    # the host-side did_hit sanitizes slot/u/v for those rays.  The limit
    # is loop-invariant: read the scalar once, outside the while body.
    t_out[:] = jnp.full((pool + 8, _LANE), BIG, jnp.float32)
    lim = live_lim[0, 0]

    def cond(c):
        return jnp.max(c[2]) > 0

    def body(c):
        spn, spl, has, it, nn_pop, nl_pop = c          # has: i32 0/1

        # ---- 1. pops: ``node_pops`` nodes + up to ``leaf_pops`` octets ----
        # Leaf pops dominate bounce-ray traversal's POP count, but the
        # ITERATION count is node-bound on real 1080p bounce segments
        # (54 node pops vs 78/2 octet-pop demand per packet,
        # experiments/frame_breakdown.py) — dual NODE pops halve that
        # bound for one extra expand+push per iteration.  The leaf-stack
        # throttle reserves 8 slots per popped node.
        done = (spn <= 0) & (spl <= 0) & (has > 0)     # (8,1)
        room = spl < STACK_L - 8 * node_pops           # throttle node pops
        act_n = (spn > 0) & room
        act_ns = [act_n]
        if node_pops == 2:
            act_ns.append((spn > 1) & room)
        act_ls = [spl > k for k in range(leaf_pops)]
        spn1 = spn
        for a in act_ns:
            spn1 = spn1 - a.astype(jnp.int32)
        spl1 = spl
        for a in act_ls:
            spl1 = spl1 - a.astype(jnp.int32)
        sn_t = stack_n[:]
        sl_t = stack_l[:]
        sdt = sn_t.dtype
        # node k pops from lane spn - 1 - k (gated): lane spn - act_n is
        # spn - 1 when popping, a gated don't-care otherwise.  One-hot
        # selects run at the stack dtype; the single-lane sums extract to
        # i32 (a one-hot sum cannot overflow any integer dtype).
        sp_a = spn - act_ns[0].astype(jnp.int32)
        e_ns = [jnp.sum(jnp.where(lane_n == sp_a.astype(sdt), sn_t, _s0),
                        axis=1, keepdims=True, dtype=jnp.int32)]
        if node_pops == 2:
            # gate folded into the position: ungated rows get sentinel -1
            sp_b = jnp.where(act_ns[1], sp_a - 1, -1)
            e_ns.append(jnp.sum(
                jnp.where(lane_n == sp_b.astype(sdt), sn_t, _s0),
                axis=1, keepdims=True, dtype=jnp.int32))
        e_ls = [jnp.sum(jnp.where(lane_l == (spl - 1 - k).astype(sdt),
                                  sl_t, _s0),
                        axis=1, keepdims=True, dtype=jnp.int32)
                for k in range(leaf_pops)]
        idx_ns = [jnp.clip(jnp.where(act_ns[k], e_ns[k], 0), 0, n_wide - 1)
                  for k in range(node_pops)]
        idx_ls = [jnp.clip(jnp.where(act_ls[k], -e_ls[k] - 1, 0), 0,
                           n_oct - 1) for k in range(leaf_pops)]

        # ---- 2. scalar extraction via VMEM round-trip ----
        # lanes [0, 64): node<<16 | first octet; lanes [64, 128): the
        # remaining pops — the second node packs above the second octet
        # (or, with three octet pops, octets 2 and 3 pack hi<<16 | lo;
        # sound because per-part row counts are bounded well under 2^15
        # by the VMEM table budget) — one store still transfers every
        # index per row.
        word = idx_ns[0] * 65536 + idx_ls[0]
        if node_pops == 2:
            if leaf_pops != 2:
                raise ValueError("node_pops=2 requires leaf_pops=2")
            word2 = idx_ns[1] * 65536 + idx_ls[1]
        elif leaf_pops == 2:
            word2 = idx_ls[1]
        elif leaf_pops == 3:
            word2 = idx_ls[1] * 65536 + idx_ls[2]
        else:
            raise ValueError(f"leaf_pops must be 2 or 3, got {leaf_pops}")
        xfer[:] = jnp.concatenate(
            [word + jnp.zeros((_SUB, 64), jnp.int32),
             word2 + jnp.zeros((_SUB, 64), jnp.int32)], axis=1)

        # ---- 3. branch-free serve-N_SERVE claims ----
        # Branch-free: pl.when-gating the serve block measured SLOWER
        # (Mosaic branches stall the pipeline); idle iterations route every
        # store to dummy scratch row _SUB / dummy output row POOL instead.
        # The whole serve machinery measures ~FREE in context (phase_cost
        # all2 1490 vs allserve 1464 ns/iter): it pipelines fully behind
        # the vector phases, so serving N_SERVE rows costs nothing extra.
        def serve_one_at(r_star):
            serving = r_star < _SUB
            dst = jnp.where(serving, r_star, _SUB)         # dummy row _SUB
            old = pkt_ids[dst]
            out_row = jnp.where(serving & (old >= 0), old, pool)
            # finished packet's results -> output (dummy row when idle)
            t_out[out_row] = bt_scr[dst]
            slot_out[out_row] = bsl_scr[dst]
            u_out[out_row] = bu_scr[dst]
            v_out[out_row] = bv_scr[dst]
            # claim the next packet (or mark the row dry).  The dynamic
            # live-packet limit replaces the static pool bound: on sorted
            # bounce batches the dead rays (key-sentinel-sorted to the
            # tail) form whole dead packets that would otherwise each
            # burn a serve slot (the serve floor is pool/N_SERVE
            # iterations even for all-dead pools).
            nxt = cnt[0]
            got = serving & (nxt < lim)
            src = jnp.minimum(nxt, pool - 1)
            cnt[0] = nxt + got.astype(jnp.int32)
            pkt_ids[dst] = jnp.where(got, nxt, -1)
            so_x[dst] = ox[src]
            so_y[dst] = oy[src]
            so_z[dst] = oz[src]
            sd_x[dst] = dx[src]
            sd_y[dst] = dy[src]
            sd_z[dst] = dz[src]
            # inverses computed here instead of shipped as 3 more input
            # windows: grid-indexed inputs are DOUBLE-BUFFERED by the
            # pipeline, so each dropped array saves 2 window buffers
            # (3.1 MB at the 1024-packet pool -- the difference between
            # fitting and blowing the 16 MB scoped-VMEM budget).
            # Clamped to +-1e18 (finite-huge): the FMA slab form below
            # computes b*inv - o*inv, and an IEEE-inf inv would turn
            # same-sign b, o into inf - inf = NaN (a silent cull) for
            # axis-parallel rays; at <= 1e18 the products stay finite for
            # any sane scene extent and the slab semantics are unchanged
            # (parallel-outside -> near = +huge miss, parallel-inside ->
            # unconstrained).  The reference's (b - o) * inf form
            # (fragment.glsl:183-188) NaN-culls only the measure-zero
            # b == o case; the clamp handles even that correctly.
            si_x[dst] = jnp.clip(1.0 / dx[src], -1e18, 1e18)
            si_y[dst] = jnp.clip(1.0 / dy[src], -1e18, 1e18)
            si_z[dst] = jnp.clip(1.0 / dz[src], -1e18, 1e18)
            st0[dst] = t0[src]
            # the pool-dry flag crosses to the vector side through memory
            # (Mosaic has no dynamic-scalar lane broadcast)

            @pl.when(got)
            def _():
                flag_scr[dst] = jnp.ones((_LANE,), jnp.float32)

            @pl.when(jnp.logical_not(got))
            def _():
                flag_scr[dst] = jnp.zeros((_LANE,), jnp.float32)

            return r_star

        if _SERVE_RANKED:
            # The n_serve row picks are INDEPENDENT masked min-reduces
            # over precomputed ranks instead of a serial mask-and-rescan
            # chain: serve slot k takes the k-th done row.  The serial
            # form makes pick k+1's (64,1)-reduce -> scalar round trip
            # wait on pick k's; ranked picks overlap their latencies.
            done_i = done.astype(jnp.int32)
            rank = jnp.cumsum(done_i, axis=0) - done_i     # exclusive
            stars = []
            for k in range(n_serve):
                rs = jnp.min(jnp.where(done & (rank == k), sub_iota, _SUB))
                stars.append(rs)
            for rs in stars:
                serve_one_at(rs)
        else:
            avail = done
            stars = []
            for _ in range(n_serve):
                rs = serve_one_at(jnp.min(
                    jnp.where(avail, sub_iota, _SUB)))
                avail = avail & (sub_iota != rs)
                stars.append(rs)

        # ---- 4. dynamic row loads (idle rows load row 0 = the root the
        # freshly served row is about to expand) ----
        for r in range(_SUB):
            v = xfer[r, 0]
            node_scrs[0][r] = node_rows[v >> 16]
            tri_scrs[0][r] = tri_rows[v & 65535]
            w = xfer[r, 64]
            if node_pops == 2:
                node_scrs[1][r] = node_rows[w >> 16]
                tri_scrs[1][r] = tri_rows[w & 65535]
            elif leaf_pops == 2:
                tri_scrs[1][r] = tri_rows[w]
            else:
                tri_scrs[1][r] = tri_rows[w >> 16]
                tri_scrs[2][r] = tri_rows[w & 65535]

        # ---- vector-side claim effects ----
        served_m = jnp.zeros((_SUB, 1), jnp.bool_)
        for rs in stars:
            served_m = served_m | (sub_iota == rs)
        served = done & served_m
        gm = flag_scr[0:_SUB, 0:1] > 0.5               # stale rows masked below
        claimed = served & gm                          # row got fresh rays
        dried = served & ~gm                           # pool exhausted
        has = jnp.where(served, 0, has) + claimed.astype(jnp.int32)
        act_n_eff = act_n | claimed                    # fresh row expands root

        bt = jnp.where(claimed, st0[0:_SUB],
                       jnp.where(dried, -BIG, bt_scr[0:_SUB]))
        bsl = jnp.where(served, 0, bsl_scr[0:_SUB])
        bu = jnp.where(served, 0.0, bu_scr[0:_SUB])
        bv = jnp.where(served, 0.0, bv_scr[0:_SUB])

        o_x, o_y, o_z = so_x[0:_SUB], so_y[0:_SUB], so_z[0:_SUB]
        d_x, d_y, d_z = sd_x[0:_SUB], sd_y[0:_SUB], sd_z[0:_SUB]
        inv_x, inv_y, inv_z = si_x[0:_SUB], si_y[0:_SUB], si_z[0:_SUB]
        nrows = [s[:] for s in node_scrs]

        # per-row dominant octant (rows are sorted coherent; recomputed
        # each iteration because claims swap rays in — cheaper than loading
        # a precomputed octant input, which measured slower)
        octant = (
            ((jnp.sum(d_x, axis=1, keepdims=True) < 0.0).astype(jnp.int32) << 2)
            | ((jnp.sum(d_y, axis=1, keepdims=True) < 0.0).astype(jnp.int32) << 1)
            | (jnp.sum(d_z, axis=1, keepdims=True) < 0.0).astype(jnp.int32)
        )

        # ---- 5. expand: 8 children, slot j at lanes [j*6, j*6+6) ----
        # Slab form (_FMA_EXPAND): b*inv - o*inv with o*inv hoisted out
        # of the child loop — the naive (b - o)*inv is sub-then-mul,
        # which is NOT an FMA pattern, so each bound costs two VPU
        # issues; the hoisted form is one fused multiply-sub per bound
        # (96 ops -> 48 + 3 hoisted muls per expand).  Equal to the
        # reference's (boxMin - origin) * invDir (fragment.glsl:183-188)
        # up to one rounding: the slab entry/exit only GATE traversal
        # (hit t comes from the exact triangle test), and the wide-node
        # tree already orders visits differently from the reference's
        # binary BVH, so near-tie pruning flips are within the goldens'
        # isolated-outlier tolerance.  Requires the FINITE clamped
        # inverses from the serve phase (inf*b - inf*o would NaN for
        # same-sign bounds).  A/B: experiments/fma_ab.py.
        oi_x = o_x * inv_x
        oi_y = o_y * inv_y
        oi_z = o_z * inv_z

        def expand(nrow_k, gate):
            bit_terms = []
            for j in range(8):
                b = j * 6
                if _FMA_EXPAND:
                    t1x = nrow_k[:, b + 0:b + 1] * inv_x - oi_x
                    t1y = nrow_k[:, b + 1:b + 2] * inv_y - oi_y
                    t1z = nrow_k[:, b + 2:b + 3] * inv_z - oi_z
                    t2x = nrow_k[:, b + 3:b + 4] * inv_x - oi_x
                    t2y = nrow_k[:, b + 4:b + 5] * inv_y - oi_y
                    t2z = nrow_k[:, b + 5:b + 6] * inv_z - oi_z
                else:
                    t1x = (nrow_k[:, b + 0:b + 1] - o_x) * inv_x
                    t1y = (nrow_k[:, b + 1:b + 2] - o_y) * inv_y
                    t1z = (nrow_k[:, b + 2:b + 3] - o_z) * inv_z
                    t2x = (nrow_k[:, b + 3:b + 4] - o_x) * inv_x
                    t2y = (nrow_k[:, b + 4:b + 5] - o_y) * inv_y
                    t2z = (nrow_k[:, b + 5:b + 6] - o_z) * inv_z
                near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                              jnp.maximum(t1y, t2y)),
                                  jnp.maximum(t1z, t2z))
                hit = (far >= near) & (far >= 0.0)
                # fragment.glsl:261's prune is `max(near, 0) <= closestT`;
                # the clamp+select are redundant here: live rays always
                # carry bt > 0 (hits need t > EPS; init is BIG or an
                # earlier part's t) so near <= bt is equivalent, and dead
                # rays carry bt = -BIG which no finite near reaches
                # (|d| = 1 keeps the slab mins finite).
                ok = hit & (near <= bt)
                anyj = jnp.any(ok, axis=1, keepdims=True)
                bit_terms.append(jnp.where(anyj, jnp.int32(1) << j, 0))
            # disjoint bits: tree-OR instead of an 8-deep serial chain
            while len(bit_terms) > 1:
                bit_terms = [bit_terms[k] | bit_terms[k + 1]
                             for k in range(0, len(bit_terms), 2)]
            return jnp.where(gate, bit_terms[0], 0)

        bits_list = [expand(nrows[0], act_n_eff)]
        if node_pops == 2:
            bits_list.append(expand(nrows[1], act_ns[1]))

        # ---- 6. push: far-first order block for this row's octant ----
        # The naive form (8 sequential one-hot writes, each advancing the
        # stack pointer) serially chains 16 full-stack-tile selects and
        # measured 401 ns/iter — the largest phase.  The per-rank flag and
        # position math is LANE-PARALLEL (64,8) work: the serial-chain form
        # (~10 (64,1) ops per rank, an 8-deep dependency) measured ~3x over
        # the issue-slot model because every (64,1) op still costs a full
        # 8-vreg issue at 1/128 lane utilization.  Prefix positions come
        # from a log2-step shifted-add cumsum at static lane shifts.
        def ranks(nrow_k):
            ordb = jnp.zeros((_SUB, 8), jnp.float32)
            for o in range(8):
                ordb = ordb + jnp.where(
                    octant == o, nrow_k[:, ORD0 + o * 8:ORD0 + o * 8 + 8],
                    0.0)
            return ordb.astype(jnp.int32)              # (64,8) packed ranks

        # With dual pops, node 2's children go BELOW node 1's on the
        # stacks: node 1 was the stack top, so its children stay on top
        # and near-first pop order is preserved for the deepest subtree.
        halves = [(ranks(nrows[k]), bits_list[k])
                  for k in reversed(range(node_pops))]
        # int32 concats only: Mosaic cannot bitcast i1 vregs, so the bool
        # mask is computed AFTER the halves are joined
        pkc = jnp.concatenate([pk for pk, _ in halves], axis=1)
        bitc = jnp.concatenate(
            [bi + jnp.zeros((_SUB, 8), jnp.int32) for _, bi in halves],
            axis=1)                                    # (64, 8*node_pops)
        entb = pkc >> 3
        okb = (((bitc >> (pkc & 7)) & 1) != 0) & (entb != EMPTY_PACKED)
        ncand = 8 * node_pops
        isn = (okb & (entb >= 0)).astype(jnp.int32)
        isl = (okb & (entb < 0)).astype(jnp.int32)
        # inclusive prefix along the rank lanes (zero-fill shifts)
        cn, cl = isn, isl
        sh = 1
        while sh < ncand:
            z = jnp.zeros((_SUB, sh), jnp.int32)
            cn = cn + jnp.concatenate([z, cn[:, :ncand - sh]], axis=1)
            cl = cl + jnp.concatenate([z, cl[:, :ncand - sh]], axis=1)
            sh *= 2
        posn_b = spn1 + cn - isn                       # exclusive prefix
        posl_b = spl1 + cl - isl
        # Overflow gating matches the serial chain exactly: the prefix is
        # monotone, so once a rank's position reaches the cap every later
        # rank's does too — the pushed set and positions are identical.
        pnb = (isn > 0) & (posn_b < sn_lanes)
        plb = (isl > 0) & (posl_b < STACK_L)
        pos_n = spn1 + jnp.sum(pnb.astype(jnp.int32), axis=1, keepdims=True)
        pos_l = spl1 + jnp.sum(plb.astype(jnp.int32), axis=1, keepdims=True)

        # Positions are strictly increasing per row, so the one-hot masks
        # are disjoint: sum-combine is exact.  Each term is independent —
        # the adds reduce as a tree instead of a serial select chain.
        # The push gate is FOLDED into the position (ungated candidates
        # get sentinel -1, which no lane matches): one full-stack-width
        # compare per term instead of compare + AND.  The narrow (64,
        # ncand) gate/position math stays i32; only the stack-width
        # one-hots run at the stack dtype (int16 when _STACK_I16 — all
        # stack values fit: node indices < 2^14, leaf entries > -2^14-1,
        # positions < 256 — so packed 16-bit lanes halve the vreg count
        # of the widest phase).
        sdt = sn_t.dtype
        posn_m = jnp.where(pnb, posn_b, -1).astype(sdt)
        posl_m = jnp.where(plb, posl_b, -1).astype(sdt)
        entb_s = entb.astype(sdt)
        dn = [jnp.where(lane_n == posn_m[:, i:i + 1],
                        entb_s[:, i:i + 1] - sn_t, _s0)
              for i in range(ncand)]
        dl = [jnp.where(lane_l == posl_m[:, i:i + 1],
                        entb_s[:, i:i + 1] - sl_t, _s0)
              for i in range(ncand)]
        while len(dn) > 1:
            dn = [dn[k] + dn[k + 1] for k in range(0, len(dn), 2)]
            dl = [dl[k] + dl[k + 1] for k in range(0, len(dl), 2)]
        sn_t = sn_t + dn[0]
        sl_t = sl_t + dl[0]
        stack_n[:] = sn_t
        stack_l[:] = sl_t

        # ---- 7. leaf: ``leaf_pops`` octets x 8 triangles, slot j at lanes
        # [j*16, j*16+12) of each octet row ----
        for trow_k, idx_k, act_k in zip(
                (s[:] for s in tri_scrs), idx_ls, act_ls):
            slot_base = idx_k * 8
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
                inv_det = 1.0 / det
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
                         & (u >= 0.0) & (vv >= 0.0) & ((u + vv) <= 1.0)
                         & act_k)
                better = valid & (t < bt)              # strict <, glsl:275
                bt = jnp.where(better, t, bt)
                bsl = jnp.where(better, slot_base + j, bsl)
                bu = jnp.where(better, u, bu)
                bv = jnp.where(better, vv, bv)

        bt_scr[0:_SUB] = bt
        bsl_scr[0:_SUB] = bsl
        bu_scr[0:_SUB] = bu
        bv_scr[0:_SUB] = bv

        # diagnostic pop counters (exported via it_out lanes 1/2; the two
        # scalar adds are free next to the vector phases)
        for a in act_ns:
            nn_pop = nn_pop + jnp.sum(a.astype(jnp.int32))
        for a in act_ls:
            nl_pop = nl_pop + jnp.sum(a.astype(jnp.int32))
        return pos_n, pos_l, has, it + 1, nn_pop, nl_pop

    fin = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((_SUB, 1), jnp.int32), jnp.zeros((_SUB, 1), jnp.int32),
         jnp.ones((_SUB, 1), jnp.int32), jnp.int32(0),
         jnp.int32(0), jnp.int32(0)))
    # lane 0: iteration count; lane 1: total node pops; lane 2: total
    # octet pops (instance-wide diagnostics for debug_iters consumers)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    it_out[:] = jnp.where(lane == 1, fin[4],
                          jnp.where(lane == 2, fin[5], fin[3]))


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" or any(
        d.platform in ("tpu", "axon") for d in jax.devices()
    )


_FMA_EXPAND = True  # slab test as b*inv - o*inv (one FMA/bound) instead
                    # of (b - o)*inv (sub + mul); A/B flag, see expand()
_STACK_I16 = False  # per-row stacks in packed int16 lanes: every stack
                    # value fits (node indices < 2^14, leaf entries
                    # > -2^14-1, positions < 256) and 16-bit packing
                    # would halve the push one-hot storm's vreg count,
                    # but v5e Mosaic REJECTS packed 16-bit integer
                    # compares ("Target does not support this
                    # comparison", 2026-08-18) — CLOSED by hardware
                    # capability.  Interpret-mode parity holds; keep the
                    # flag for future TPU generations.
                    # (bf16 lanes can't carry the values: bf16 integers
                    # are exact only to 256, node indices reach 2^14.)

LEAF_POPS = 2       # octets drained per iteration (2 or 3); the kernel
                    # packs the 2nd+3rd octet indices into one i32, sound
                    # while per-part octet rows stay under 2^15 (the 8 MB
                    # table budget caps total rows at 16384)
NODE_POPS = 1       # wide nodes expanded per iteration (1 or 2); dual
                    # node pops double the node stack (the single-pop
                    # depth guard (d+2)*7+4 <= 128, ops/wide2.py, then
                    # bounds the dual-pop worst case (d+2)*14+4 <= 252)
# An early-pop software-pipelined kernel variant (run the next iteration's
# pops on the post-push register values so the xfer round trip overlaps the
# push phase) was A/B'd on hardware in round 4 and REMOVED: bounce proxy
# 155.7 ms vs 153.4 plain, primary equal (experiments/pipe_ab.py) — Mosaic
# already hides the scalar spine, so the extra carries only cost registers.


def raycast_subblock(scene, origin, direction, active=None,
                     interpret: bool | None = None,
                     debug_iters: bool = False,
                     leaf_pops: int | None = None,
                     big_pools: bool = False,
                     serve: int | None = None,
                     node_pops: int | None = None):
    """Nearest hit via the work-stealing sub-block kernel.

    Requires the sub-block tables on SceneData (p2_node_rows, p2_tri_rows,
    p2_remap + optional extra parts; built by Scene.send).  R must be a
    multiple of 128.  Multi-part scenes chain one kernel call per part,
    feeding each part the running best t so its traversal prunes against
    hits found in earlier parts.

    ``big_pools=True`` sizes the packet pool to the whole batch (capped at
    POOL_MAX), which minimizes the end-of-pool drain tail; it is ONLY safe
    under jit (see POOL_MAX) and is set by the renderer's raycast binding.

    ``origin``/``direction`` may be (R, 3) arrays or 3-tuples of (R,)
    columns (the integrator's SoA form — the kernel splits into per-axis
    (P, 128) windows anyway, so column inputs skip the (R, 3) round trip).
    """
    if not isinstance(origin, (tuple, list)):
        origin = tuple(origin[..., a] for a in range(3))
    if not isinstance(direction, (tuple, list)):
        direction = tuple(direction[..., a] for a in range(3))
    R = origin[0].shape[0]
    if R % _LANE:
        raise ValueError(f"ray count {R} must be a multiple of {_LANE}")
    if scene.p2_node_rows.shape[0] == 0:
        raise ValueError("scene has no sub-block tables (exceeded caps?)")
    if interpret is None:
        interpret = not _on_tpu()
    if leaf_pops is None:
        leaf_pops = LEAF_POPS
    if serve is None:
        serve = N_SERVE
    if node_pops is None:
        node_pops = NODE_POPS

    parts = [(scene.p2_node_rows, scene.p2_tri_rows, scene.p2_remap)]
    parts += [tuple(p) for p in scene.p2_extra]

    near = None
    iters_all = None
    slot_base = 0
    for node_rows, tri_rows, remap in parts:
        t_init = None if near is None else near.t
        pn, iters = _raycast_one_part(
            node_rows, tri_rows, remap, origin, direction, active,
            t_init, interpret, leaf_pops, big_pools, serve, node_pops)
        pn = pn._replace(slot=pn.slot + slot_base)
        slot_base += int(remap.shape[0])
        if near is None:
            near = pn
        else:
            better = pn.t < near.t  # strict <: ties keep the earlier part
            near = Nearest(
                t=jnp.where(better, pn.t, near.t),
                tri=jnp.where(better, pn.tri, near.tri),
                u=jnp.where(better, pn.u, near.u),
                v=jnp.where(better, pn.v, near.v),
                slot=jnp.where(better, pn.slot, near.slot),
            )
        iters_all = iters if iters_all is None else iters_all + iters
    if active is not None:
        near = near._replace(t=jnp.where(active, near.t, BIG))
    if debug_iters:
        return near, iters_all
    return near


def _raycast_one_part(node_rows, tri_rows, remap, origin, direction,
                      active, t_init, interpret, leaf_pops=2,
                      big_pools=False, serve=N_SERVE, node_pops=1):
    """One kernel launch over one part's tables; returns (Nearest, iters).

    ``t_init`` seeds the per-ray best t (BIG when None) so later parts
    prune against earlier parts' hits; the kernel only improves on strict
    ``<``, so an unimproved ray reports t == t_init and is discarded by
    the caller's strict combine.  ``origin``/``direction`` are 3-tuples
    of (R,) columns (normalized by raycast_subblock).
    """
    R = origin[0].shape[0]
    P = R // _LANE
    table_bytes = node_rows.nbytes + tri_rows.nbytes
    if big_pools and not interpret:
        # As much of the batch per pool as the scoped budget allows
        # (drain tail once per grid step; see POOL_MAX).
        pool = min(POOL_MAX, max(16, -(-P // 8) * 8))
    else:
        pool = POOL_BIG if table_bytes <= POOL_BIG_TABLE_BYTES else POOL
        # small ray counts (tests, small tiles) need no giant pool: shrink
        # to the padded packet count so interpret mode and tiny frames
        # stay fast
        pool = min(pool, max(16, -(-P // 8) * 8))
    outr = pool + 8
    pad_p = (-P) % pool
    Pp = P + pad_p

    def prep(x, fill=0.0):
        x = x.reshape(P, _LANE)
        if pad_p:
            x = jnp.concatenate(
                [x, jnp.full((pad_p, _LANE), fill, x.dtype)])
        return x

    ox, oy, oz = (prep(origin[i]) for i in range(3))
    # pad directions with 1s so the in-kernel 1/d stays finite on dead
    # pad packets
    dx, dy, dz = (prep(direction[i], 1.0) for i in range(3))

    t0 = jnp.full((R,), BIG, jnp.float32) if t_init is None else t_init
    if active is not None:
        t0 = jnp.where(active, t0, -BIG)
    t0 = prep(t0, -BIG)

    Wr = node_rows.shape[0]
    Qr = tri_rows.shape[0]
    grid = Pp // pool

    # Dead-packet skipping: per grid step, claims stop after the last
    # packet containing any live ray.  On reorder-sorted bounce batches the
    # dead rays hold the key sentinel and sit at the tail, so entire late
    # segments shrink to their live prefix; correctness never depends on
    # the sort (mid-pool dead packets below the limit are still claimed
    # and drain in one iteration each).  Without an active mask every
    # packet is live.
    if active is not None:
        pkt_live = jnp.any(active.reshape(P, _LANE), axis=1)
        if pad_p:
            pkt_live = jnp.concatenate(
                [pkt_live, jnp.zeros((pad_p,), bool)])
        pkt_live = pkt_live.reshape(grid, pool)
        rank = jnp.arange(pool, dtype=jnp.int32)[None, :]
        lim = jnp.max(jnp.where(pkt_live, rank + 1, 0), axis=1)
    else:
        lim = jnp.full((grid,), pool, jnp.int32)
    # 8 identical rows per grid step: Mosaic requires blocks of >= 8
    # sublanes unless the block spans the whole array (grid > 1 doesn't).
    live_lim = jnp.broadcast_to(lim[:, None, None], (grid, 8, _LANE))
    live_lim = live_lim.reshape(grid * 8, _LANE)

    blk = pl.BlockSpec((pool, _LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((outr, _LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    it_blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    if leaf_pops == 3 and Qr >= (1 << 15):
        # octets 2+3 pack as hi<<16 | lo in one i32; unreachable through
        # the 8 MB table budget (<= 16384 rows/part) but guard raw tables
        leaf_pops = 2
    if node_pops == 2 and Wr >= (1 << 15):
        # the 2nd node index packs as the hi half of word2 (same bound)
        node_pops = 1

    kern = partial(_traverse_kernel, n_wide=Wr, n_oct=Qr, pool=pool,
                   leaf_pops=leaf_pops, n_serve=serve,
                   node_pops=node_pops)
    f32 = jnp.float32
    t, slot, u, v, iters = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[blk] * 7
        + [pl.BlockSpec((8, _LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)]      # live_lim rows
        + [whole((Wr, _LANE)), whole((Qr, _LANE))],
        out_specs=[out_blk, out_blk, out_blk, out_blk, it_blk],
        out_shape=[
            jax.ShapeDtypeStruct((grid * outr, _LANE), f32),
            jax.ShapeDtypeStruct((grid * outr, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((grid * outr, _LANE), f32),
            jax.ShapeDtypeStruct((grid * outr, _LANE), f32),
            jax.ShapeDtypeStruct((grid * _SUB, _LANE), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SUB, STACK_N * node_pops),
                       jnp.int16 if _STACK_I16 else jnp.int32),
            pltpu.VMEM((_SUB, STACK_L),
                       jnp.int16 if _STACK_I16 else jnp.int32),
        ] + [pltpu.VMEM((_SUB, _LANE), f32)] * node_pops  # node_scr[k]
          + [pltpu.VMEM((_SUB, _LANE), f32)] * leaf_pops  # tri_scr[k]
          + [pltpu.VMEM((_SUB, _LANE), jnp.int32)]    # xfer
          + [pltpu.VMEM((_SCR, _LANE), f32)] * 11     # rays + t0 + flag
          + [pltpu.VMEM((_SCR, _LANE), f32),          # bt
             pltpu.VMEM((_SCR, _LANE), jnp.int32),    # bslot
             pltpu.VMEM((_SCR, _LANE), f32),          # bu
             pltpu.VMEM((_SCR, _LANE), f32)]          # bv
          + [pltpu.SMEM((1,), jnp.int32), pltpu.SMEM((_SCR,), jnp.int32)],
        # Raise Mosaic's scoped-VMEM guard (default 16 MB) toward the
        # physical budget: big pools put multi-MB in/out windows (and, in
        # some fusion contexts, the stacked output arrays) into scoped
        # space, which is a soft compiler guard — the hard limit is the
        # chip's real VMEM, and tests/test_tpu_vmem.py compiles the
        # worst-case contexts against it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, t0, live_lim,
      node_rows, tri_rows)

    def unpad(a):
        a = a.reshape(grid, outr, _LANE)[:, :pool]
        return a.reshape(Pp * _LANE)[:R]

    t = unpad(t)
    slot = unpad(slot)
    u = unpad(u)
    v = unpad(v)
    did_hit = (t < BIG) & (t > -BIG)
    slot = jnp.clip(slot, 0, remap.shape[0] - 1)
    # tri stays exact for consumers that want it, but finalize_hit
    # gathers by SLOT (sh_slot) so this remap gather dead-codes out of
    # the render loop (it costs 4x the 24-wide shading gather).
    tri = remap[slot]

    near = Nearest(
        t=jnp.where(did_hit, t, BIG),
        tri=tri,
        u=jnp.where(did_hit, u, 0.0),
        v=jnp.where(did_hit, v, 0.0),
        slot=slot,
    )
    # (grid, 3): per grid step [iterations, node pops, octet pops]
    return near, iters[::_SUB, 0:3]
