"""Round-2 feasibility: cost of the SUB-BLOCK traversal iteration.

Design under test (one kernel instance = 8 independent 128-ray packets,
one per sublane row, each with its own node pointer + dual stacks):

per iteration, for all 8 rows at once:
  1. pop a node entry and an octet entry per row (vector one-hot reads
     from VMEM stacks)
  2. extract 16 scalars (8 node indices + 8 octet indices) for the
     dynamic row loads                                   <- cost question
  3. 16 dynamic row loads into (8,128) scratch tiles     <- ~13 ns each
  4. expand phase: 8 static-j child AABB slabs, each (8,1) x (8,128)
  5. push phase: 8 ranks, per-row octant-ordered entries, one-hot
     vector writes into the VMEM stacks
  6. leaf phase: 8 static-j triangles, MT on (8,128), best_t update

Variants measure the scalar-extraction strategy and give a lower bound:
  extract_sum : masked-sum reduction per scalar (the round-1 pattern)
  extract_mem : store (8,1) to VMEM scratch, 8 static scalar reads
  no_extract  : loop-counter-derived indices (no vector->scalar at all)

The loop runs a FIXED iteration count on synthetic tables; pops clamp so
stacks never empty.  Reported: ns per iteration (= ns per 8 packet-steps).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODES = 1024      # wide-node rows
OCTETS = 4096     # triangle-octet rows
ITERS = 5000
STACK_N = 128
STACK_L = 256
ORD0 = 48         # lane of octant-order region: 48 + o*8 + rank
EMPTY_PACKED = -(1 << 20)

_SUB, _LANE = 8, 128



def _time_slope(f, args, label, compile_s=None):
    """Per-iteration cost as a slope between two iteration counts —
    cancels the ~32 ms axon tunnel fixed dispatch cost."""
    import time as _t
    I1, I2 = 50_000, 450_000
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
    extra = f", compile {compile_s:.0f}s" if compile_s is not None else ""
    print(f"{label}: {ns:.0f} ns/iter (t@{I1//1000}k={t1*1000:.1f} ms, "
          f"t@{I2//1000}k={t2*1000:.1f} ms{extra})", flush=True)


def make_kernel(variant):
    def kern(iters_ref, ox, oy, oz, dx, dy, dz,
             pw_rows, tri_rows,
             t_out, slot_out,
             stack_n, stack_l, node_scr, tri_scr, xfer):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z

        lane_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_N), 1)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_L), 1)
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)

        # Per-row octant (rays per row are coherent after the sort).
        octant = (
            ((jnp.sum(d_x, axis=1, keepdims=True) < 0.0).astype(jnp.int32) << 2)
            | ((jnp.sum(d_y, axis=1, keepdims=True) < 0.0).astype(jnp.int32) << 1)
            | (jnp.sum(d_z, axis=1, keepdims=True) < 0.0).astype(jnp.int32)
        )  # (8,1)

        stack_n[:] = jnp.zeros((_SUB, STACK_N), jnp.int32)
        stack_l[:] = jnp.zeros((_SUB, STACK_L), jnp.int32)

        ITERS_RT = iters_ref[0]

        def cond(c):
            return c[0] < ITERS_RT

        def body(c):
            it, bt, bslot, spn, spl = c

            # ---- pops (vector one-hot reads) ----
            act_n = spn > 0
            spn1 = jnp.maximum(spn - 1, 2)          # clamp: never drain (bench)
            e_n = jnp.sum(jnp.where(lane_n == spn1, stack_n[:], 0),
                          axis=1, keepdims=True)    # (8,1)
            act_l = spl > 0
            spl1 = jnp.maximum(spl - 1, 2)
            e_l = jnp.sum(jnp.where(lane_l == spl1, stack_l[:], 0),
                          axis=1, keepdims=True)

            idx_n_vec = jnp.where(act_n, e_n, 0) % NODES
            idx_l_vec = jnp.where(act_l, (-e_l - 1), 0) % OCTETS

            # ---- scalar extraction + 16 dynamic row loads ----
            if variant == "no_extract":
                for r in range(_SUB):
                    node_scr[r] = pw_rows[(it * 7 + r * 331) % NODES]
                    tri_scr[r] = tri_rows[(it * 11 + r * 733) % OCTETS]
            elif variant == "extract_sum":
                for r in range(_SUB):
                    i_n = jnp.sum(jnp.where(sub_iota == r, idx_n_vec, 0))
                    i_l = jnp.sum(jnp.where(sub_iota == r, idx_l_vec, 0))
                    node_scr[r] = pw_rows[i_n]
                    tri_scr[r] = tri_rows[i_l]
            elif variant == "extract_mem":
                # pack both indices into one i32, full-tile store, then 8
                # static-index scalar reads back from VMEM
                packed = idx_n_vec * 65536 + idx_l_vec
                xfer[:] = packed + jnp.zeros((_SUB, _LANE), jnp.int32)
                for r in range(_SUB):
                    v = xfer[r, 0]
                    node_scr[r] = pw_rows[v >> 16]
                    tri_scr[r] = tri_rows[v & 65535]

            nrow = node_scr[:]   # (8,128): row r = node of packet r
            trow = tri_scr[:]    # (8,128): row r = octet of packet r

            # ---- expand: 8 children, child j at lanes [j*6, j*6+6) ----
            bits = jnp.zeros((_SUB, 1), jnp.int32)
            for j in range(8):
                bminx = nrow[:, j * 6 + 0:j * 6 + 1]
                bminy = nrow[:, j * 6 + 1:j * 6 + 2]
                bminz = nrow[:, j * 6 + 2:j * 6 + 3]
                bmaxx = nrow[:, j * 6 + 3:j * 6 + 4]
                bmaxy = nrow[:, j * 6 + 4:j * 6 + 5]
                bmaxz = nrow[:, j * 6 + 5:j * 6 + 6]
                t1x = (bminx - o_x) * inv_x
                t2x = (bmaxx - o_x) * inv_x
                t1y = (bminy - o_y) * inv_y
                t2y = (bmaxy - o_y) * inv_y
                t1z = (bminz - o_z) * inv_z
                t2z = (bmaxz - o_z) * inv_z
                near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                              jnp.maximum(t1y, t2y)),
                                  jnp.maximum(t1z, t2z))
                hit = (far >= near) & (far >= 0.0)
                t_entry = jnp.where(hit, jnp.maximum(near, 0.0), -1.0)
                ok = hit & (t_entry <= bt)
                anyj = jnp.any(ok, axis=1, keepdims=True)  # (8,1)
                bits = bits | jnp.where(anyj, jnp.int32(1) << j, 0)
            bits = jnp.where(act_n, bits, 0)

            # ---- push: 8 ranks, octant-ordered packed entries ----
            new_spn, new_spl = spn1, spl1
            sn, sl = stack_n[:], stack_l[:]
            for i in range(8):
                ordv = jnp.zeros((_SUB, 1), jnp.float32)
                for o in range(8):
                    ordv = ordv + jnp.where(
                        octant == o,
                        nrow[:, ORD0 + o * 8 + i:ORD0 + o * 8 + i + 1], 0.0)
                pk = ordv.astype(jnp.int32)
                ent = pk >> 3
                j = pk & 7
                pushable = ((bits >> j) & 1) != 0
                pushable = pushable & (ent != EMPTY_PACKED)
                pn = pushable & (ent >= 0) & (new_spn < STACK_N)
                plf = pushable & (ent < 0) & (new_spl < STACK_L)
                sn = jnp.where((lane_n == new_spn) & pn, ent, sn)
                new_spn = new_spn + pn.astype(jnp.int32)
                sl = jnp.where((lane_l == new_spl) & plf, ent, sl)
                new_spl = new_spl + plf.astype(jnp.int32)
            stack_n[:] = sn
            stack_l[:] = sl

            # ---- leaf: 8 triangles, tri j at lanes [j*16, j*16+12) ----
            oct_vec = idx_l_vec  # (8,1) octet index -> slot base
            for j in range(8):
                b = j * 16
                v0x, v0y, v0z = (trow[:, b + 0:b + 1], trow[:, b + 1:b + 2],
                                 trow[:, b + 2:b + 3])
                e1x, e1y, e1z = (trow[:, b + 3:b + 4], trow[:, b + 4:b + 5],
                                 trow[:, b + 5:b + 6])
                e2x, e2y, e2z = (trow[:, b + 6:b + 7], trow[:, b + 7:b + 8],
                                 trow[:, b + 8:b + 9])
                fx, fy, fz = (trow[:, b + 9:b + 10], trow[:, b + 10:b + 11],
                              trow[:, b + 11:b + 12])
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
                valid = ((jnp.abs(det) >= 1e-6) & (t > 1e-6)
                         & (u >= 0.0) & (vv >= 0.0) & ((u + vv) <= 1.0)
                         & act_l)
                better = valid & (t < bt)
                bt = jnp.where(better, t, bt)
                bslot = jnp.where(better, oct_vec * 8 + j, bslot)

            return it + 1, bt, bslot, new_spn, new_spl

        bt0 = jnp.full((_SUB, _LANE), 1e30, jnp.float32)
        _, bt, bslot, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), bt0, jnp.zeros((_SUB, _LANE), jnp.int32),
             jnp.full((_SUB, 1), 64, jnp.int32),
             jnp.full((_SUB, 1), 64, jnp.int32)))
        t_out[:] = bt
        slot_out[:] = bslot.astype(jnp.float32)
    return kern


def run(variant):
    rng = np.random.default_rng(0)
    pw = rng.uniform(-5, 5, (NODES, 128)).astype(np.float32)
    # plant plausible packed order entries (exact-int floats)
    ents = rng.integers(-OCTETS, NODES, (NODES, 64)).astype(np.int64)
    pw[:, ORD0:ORD0 + 64] = (ents * 8 + rng.integers(0, 8, (NODES, 64))).astype(np.float32)
    tri = rng.uniform(-5, 5, (OCTETS, 128)).astype(np.float32)

    o = rng.uniform(-1, 1, (6, _SUB, _LANE)).astype(np.float32)
    args = [jnp.asarray(a) for a in o] + [jnp.asarray(pw), jnp.asarray(tri)]

    whole = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        make_kernel(variant),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [whole((_SUB, _LANE))] * 6 + [whole((NODES, 128)),
                                               whole((OCTETS, 128))],
        out_specs=[whole((_SUB, _LANE))] * 2,
        out_shape=[jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((_SUB, STACK_N), jnp.int32),
                        pltpu.VMEM((_SUB, STACK_L), jnp.int32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, _LANE), jnp.int32)],
    )(*a))
    r = f(jnp.asarray(np.array([8], np.int32)), *args)
    _ = float(jnp.sum(r[0][:1, :1]))
    _time_slope(f, args, variant)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["no_extract", "extract_sum", "extract_mem"]):
        run(v)
