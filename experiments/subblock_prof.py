"""Attribute the sub-block iteration's 7 us cost (subblock_exp.py) to
components, and probe the two primitives the redesign would lean on.

Stages (cumulative):
  s0: pops + extract_mem + 16 dynamic row loads
  s1: s0 + expand slab math (8 children via (8,1)-column broadcasts)
  s2: s1 + push phase (octant-order extraction + one-hot stack writes)
  s3: s2 + leaf MT phase  == full body (should reproduce ~7 us)

Probes:
  bcast: 48x ((8,1) static column slice) * (8,128) broadcast mults
  trans: 2x (8,8) transpose per iteration (for the old-layout redesign)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODES = 1024
OCTETS = 4096
ITERS = 5000
STACK_N = 128
STACK_L = 256
ORD0 = 48
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


def make_kernel(stage):
    def kern(iters_ref, ox, oy, oz, dx, dy, dz,
             pw_rows, tri_rows,
             t_out, slot_out,
             stack_n, stack_l, node_scr, tri_scr, xfer):
        o_x, o_y, o_z = ox[:], oy[:], oz[:]
        d_x, d_y, d_z = dx[:], dy[:], dz[:]
        inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z

        lane_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_N), 1)
        lane_l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, STACK_L), 1)

        octant = (
            ((jnp.sum(d_x, axis=1, keepdims=True) < 0.0).astype(jnp.int32) << 2)
            | ((jnp.sum(d_y, axis=1, keepdims=True) < 0.0).astype(jnp.int32) << 1)
            | (jnp.sum(d_z, axis=1, keepdims=True) < 0.0).astype(jnp.int32)
        )

        stack_n[:] = jnp.zeros((_SUB, STACK_N), jnp.int32)
        stack_l[:] = jnp.zeros((_SUB, STACK_L), jnp.int32)

        ITERS_RT = iters_ref[0]

        def cond(c):
            return c[0] < ITERS_RT

        def body(c):
            it, bt, bslot, spn, spl = c

            if stage == "bcast":
                nrow = node_scr[:]
                acc = bt * 0.0
                for j in range(8):
                    for ccc in range(6):
                        col = nrow[:, j * 6 + ccc:j * 6 + ccc + 1]
                        acc = acc + col * o_x
                return it + 1, bt + acc * 1e-30, bslot, spn, spl

            if stage == "trans":
                nrow = node_scr[:]
                m1 = nrow[:, 0:8]
                m2 = nrow[:, 8:16]
                t1 = m1.T
                t2 = m2.T
                return (it + 1, bt + (t1[:, 0:1] + t2[:, 0:1]) * 1e-30,
                        bslot, spn, spl)

            # ---- pops ----
            act_n = spn > 0
            spn1 = jnp.maximum(spn - 1, 2)
            e_n = jnp.sum(jnp.where(lane_n == spn1, stack_n[:], 0),
                          axis=1, keepdims=True)
            act_l = spl > 0
            spl1 = jnp.maximum(spl - 1, 2)
            e_l = jnp.sum(jnp.where(lane_l == spl1, stack_l[:], 0),
                          axis=1, keepdims=True)

            idx_n_vec = jnp.where(act_n, e_n, 0) % NODES
            idx_l_vec = jnp.where(act_l, (-e_l - 1), 0) % OCTETS

            packed0 = idx_n_vec * 65536 + idx_l_vec
            xfer[:] = packed0 + jnp.zeros((_SUB, _LANE), jnp.int32)
            for r in range(_SUB):
                v = xfer[r, 0]
                node_scr[r] = pw_rows[v >> 16]
                tri_scr[r] = tri_rows[v & 65535]

            nrow = node_scr[:]
            trow = tri_scr[:]

            if stage == "s0":
                bt = bt + (nrow[:, 0:1] + trow[:, 0:1]) * 1e-30
                return it + 1, bt, bslot, spn1, spl1

            # ---- expand ----
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
                anyj = jnp.any(ok, axis=1, keepdims=True)
                bits = bits | jnp.where(anyj, jnp.int32(1) << j, 0)
            bits = jnp.where(act_n, bits, 0)

            if stage == "s1":
                bt = bt + bits.astype(jnp.float32) * 1e-30
                return it + 1, bt, bslot, spn1, spl1

            # ---- push ----
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

            if stage == "s2":
                return it + 1, bt, bslot, new_spn, new_spl

            # ---- leaf ----
            oct_vec = idx_l_vec
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


def run(stage):
    rng = np.random.default_rng(0)
    pw = rng.uniform(-5, 5, (NODES, 128)).astype(np.float32)
    ents = rng.integers(-OCTETS, NODES, (NODES, 64)).astype(np.int64)
    pw[:, ORD0:ORD0 + 64] = (ents * 8 + rng.integers(0, 8, (NODES, 64))).astype(np.float32)
    tri = rng.uniform(-5, 5, (OCTETS, 128)).astype(np.float32)
    o = rng.uniform(-1, 1, (6, _SUB, _LANE)).astype(np.float32)
    args = [jnp.asarray(a) for a in o] + [jnp.asarray(pw), jnp.asarray(tri)]

    whole = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    f = jax.jit(lambda *a: pl.pallas_call(
        make_kernel(stage),
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
    try:
        r = f(jnp.asarray(np.array([8], np.int32)), *args)
        _ = float(jnp.sum(r[0][:1, :1]))
    except Exception as e:
        print(f"{stage}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    _time_slope(f, args, stage)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["s0", "s1", "s2", "s3", "bcast", "trans"]):
        run(v)
