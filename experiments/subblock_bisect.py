"""Bisect the ~6.5us fixed per-iteration cost seen in subblock_prof.py.

Variants (each adds ONE suspect to a trivial loop):
  empty      : full 5-tuple carry, body = it+1 only
  carry2     : (it, bt) carry only, trivial body (assemble_exp baseline)
  bcast1     : one (8,1) -> (8,128) lane-broadcast per iter
  pop1       : one masked-sum pop over (8,128) stack
  xferrw     : vector store to VMEM + 1 scalar read back
  loads8     : 8 dynamic row loads, counter-derived indices
  loads16    : 16 dynamic row loads, counter-derived indices
  sublane1   : (8,1) vector arithmetic ops only
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NODES = 1024
OCTETS = 4096
ITERS = 20000
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
    def kern(iters_ref, ox, pw_rows, tri_rows, t_out,
             stack_n, node_scr, tri_scr, xfer):
        o_x = ox[:]
        lane_n = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
        stack_n[:] = jnp.zeros((_SUB, _LANE), jnp.int32)

        ITERS_RT = iters_ref[0]

        def cond(c):
            return c[0] < ITERS_RT

        if variant == "carry2":
            def body2(c):
                it, bt = c
                return it + 1, bt + 1e-30
            _, bt = jax.lax.while_loop(
                cond, body2, (jnp.int32(0), o_x))
            t_out[:] = bt
            return

        def body(c):
            it, bt, bslot, spn, spl = c
            if variant == "empty":
                pass
            elif variant == "bcast1":
                col = bt[:, 3:4]
                bt = bt + col * 1e-30
            elif variant == "pop1":
                e_n = jnp.sum(jnp.where(lane_n == spn, stack_n[:], 0),
                              axis=1, keepdims=True)
                spn = jnp.maximum(spn - 1, 2) + (e_n & 0)
            elif variant == "xferrw":
                xfer[:] = jnp.zeros((_SUB, _LANE), jnp.int32) + it
                v = xfer[0, 0]
                bt = bt + jnp.float32(v) * 1e-30
            elif variant == "scal16":
                # 16 scalar reads from a freshly written VMEM tile: the
                # real kernel's per-row index extraction, isolated
                xfer[:] = jnp.zeros((_SUB, _LANE), jnp.int32) + it
                acc = jnp.int32(0)
                for r in range(_SUB):
                    acc = acc + xfer[r, 0] + xfer[r, 64]
                bt = bt + jnp.float32(acc) * 1e-30
            elif variant == "xfer16":
                # the real kernel's full address path: vector->VMEM store,
                # 16 scalar reads, 16 loads at those data-dependent rows
                xfer[:] = (jnp.zeros((_SUB, _LANE), jnp.int32) + it * 7
                           + lane_n)
                for r in range(_SUB):
                    node_scr[r] = pw_rows[xfer[r, 0] % NODES]
                    tri_scr[r] = tri_rows[xfer[r, 64] % OCTETS]
                bt = bt + (node_scr[:] + tri_scr[:]) * 1e-30
            elif variant == "xfer32":
                xfer[:] = (jnp.zeros((_SUB, _LANE), jnp.int32) + it * 7
                           + lane_n)
                for r in range(_SUB):
                    node_scr[r] = pw_rows[xfer[r, 0] % NODES]
                    tri_scr[r] = tri_rows[xfer[r, 64] % OCTETS]
                    node_scr[r] = pw_rows[xfer[r, 1] % NODES]
                    tri_scr[r] = tri_rows[xfer[r, 65] % OCTETS]
                bt = bt + (node_scr[:] + tri_scr[:]) * 1e-30
            elif variant == "loads8":
                for r in range(_SUB):
                    node_scr[r] = pw_rows[(it * 7 + r * 331) % NODES]
                bt = bt + node_scr[:] * 1e-30
            elif variant == "loads16":
                for r in range(_SUB):
                    node_scr[r] = pw_rows[(it * 7 + r * 331) % NODES]
                    tri_scr[r] = tri_rows[(it * 11 + r * 733) % OCTETS]
                bt = bt + (node_scr[:] + tri_scr[:]) * 1e-30
            elif variant == "sublane1":
                spn = jnp.maximum(spn - 1, 2)
                spl = jnp.minimum(spl + 1, 64)
            return it + 1, bt, bslot, spn, spl

        bt0 = o_x
        _, bt, _, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), bt0, jnp.zeros((_SUB, _LANE), jnp.int32),
             jnp.full((_SUB, 1), 64, jnp.int32),
             jnp.full((_SUB, 1), 64, jnp.int32)))
        t_out[:] = bt
    return kern


def run(variant):
    rng = np.random.default_rng(0)
    pw = jnp.asarray(rng.uniform(-5, 5, (NODES, 128)).astype(np.float32))
    tri = jnp.asarray(rng.uniform(-5, 5, (OCTETS, 128)).astype(np.float32))
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
        scratch_shapes=[pltpu.VMEM((_SUB, _LANE), jnp.int32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32),
                        pltpu.VMEM((_SUB, _LANE), jnp.int32)],
    )(*a))
    try:
        r = f(jnp.asarray(np.array([8], np.int32)), o, pw, tri)
        _ = float(jnp.sum(r[:1, :1]))
    except Exception as e:
        print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    _time_slope(f, [o, pw, tri], variant)


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["carry2", "empty", "sublane1", "bcast1", "pop1",
                               "xferrw", "loads8", "loads16"]):
        run(v)
