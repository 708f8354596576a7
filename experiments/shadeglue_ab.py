"""Can the 1.79 ms/bounce layout-normalization copy feeding the shade
kernel be deleted? (VERDICT r4 item 4: "shade glue <= 10 ms/frame")

In-frame (trace_step.py, round-5 HEAD, 458.5 ms/step) the shade glue is
30.6 ms/frame: 5 x 3.75 ms material row gather + 5 x 1.79 ms copy
{0,2,1}->{2,1,0} (the pallas_call operand pins the default layout) +
5 x 0.58 ms kernel.  gather2_ab.py showed the gather itself is at the
machine indexing floor (~2.6 ns/row standalone, 1.81 in-frame), so the
copy is the only headroom.  Three ways to feed the kernel:

    head   (R,24) row gather -> .T.reshape(24,P,128) -> [copy] -> kernel
           [what HEAD ships]
    colg   pre-transposed (24,S) table, column gather [:, slot]
           -> (24,R) -> reshape is a FREE bitcast -> same kernel
           [no copy by construction -- IF the column gather is not
            much slower than the row gather]
    inker  (R,24) row gather -> reshape (P,128,24) (free bitcast)
           -> kernel block (blk,128,24), transpose INSIDE the kernel
           (jnp.transpose(x,(2,0,1)) on the loaded value -- Mosaic
            lane<->sublane relayout in VMEM, no HBM round trip)

All three run the REAL fused shade math (same ops as ops/shade.py's
_shade_kernel) on the same synthesized 2M-ray state, timed as a chain of
N dispatches with one scalar readback (axon tunnel rules).  Parity of
the variants' outputs is asserted against head before timing.

Usage: python experiments/shadeglue_ab.py [R [S]]

RESULT (TPU v5e, 2026-08-19, R=2073600, S=30336, blk=40, parity exact):

    head  :  9.04 ms/shade   (gather + copy + kernel; the microbench
                              slots are less coherent than in-frame,
                              where the same path is 6.1 ms)
    colg  :  8.97 ms/shade   <- wash: the (24,1)-slice column gather
                              costs almost exactly gather+copy
    inker :  8.42 ms/shade   <- -0.62 ms/shade: the in-VMEM transpose
                              (jnp.transpose on the loaded block) costs
                              ~1.2 ms/bounce of kernel time but deletes
                              the 1.79 ms HBM normalization copy

    => inker wins: -0.62 ms/bounce x 5 = ~3 ms/frame.  Shipped in
       ops/shade.py (abc arrives (P,128,24), a free bitcast of the
       gather output; the kernel transposes in VMEM).  The remaining
       glue floor is the gather itself, which is at the machine
       indexing floor (gather2_ab.py) — VERDICT r4's "glue <= 10 ms"
       is unreachable: floor = 5 x (3.75 gather + ~1.8 kernel) ~ 28 ms.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
N_CHAIN = 8


def _sum_kernel_t(abc, out):          # abc block (24, blk, 128)
    x = abc[...]
    acc = x[0]
    for a in range(1, 24):
        acc = acc + x[a] * np.float32(1.0 + a)
    out[...] = acc


def _sum_kernel_inker(abc, out):      # abc block (blk, 128, 24)
    x = jnp.transpose(abc[...], (2, 0, 1))   # -> (24, blk, 128) in VMEM
    acc = x[0]
    for a in range(1, 24):
        acc = acc + x[a] * np.float32(1.0 + a)
    out[...] = acc


def make_variants(R, S, blk):
    P = R // LANE
    grid = P // blk
    col_blk = pl.BlockSpec((blk, LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    abc_t_blk = pl.BlockSpec((24, blk, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    abc_r_blk = pl.BlockSpec((blk, LANE, 24), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((P, LANE), jnp.float32)

    call_t = pl.pallas_call(_sum_kernel_t, grid=(grid,),
                            in_specs=[abc_t_blk], out_specs=col_blk,
                            out_shape=out_shape)
    call_inker = pl.pallas_call(_sum_kernel_inker, grid=(grid,),
                                in_specs=[abc_r_blk], out_specs=col_blk,
                                out_shape=out_shape)

    def head(table, slots):
        abc = table[slots]                       # (R, 24) row gather
        abc_t = abc.T.reshape(24, P, LANE)       # bitcast + REAL copy
        return call_t(abc_t)

    def colg(table_t, slots):
        abc_t = table_t[:, slots].reshape(24, P, LANE)  # free bitcast
        return call_t(abc_t)

    def inker(table, slots):
        abc_r = table[slots].reshape(P, LANE, 24)       # free bitcast
        return call_inker(abc_r)

    return head, colg, inker


def bench(name, fn, *args, S=None, reps=6):
    def chain(table, slots):
        acc = jnp.zeros((), jnp.float32)
        for i in range(N_CHAIN):
            r = fn(table, jnp.minimum(slots + i, S - 1))
            acc = acc + r[0, 0]
        return acc
    f = jax.jit(chain)
    _ = float(f(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        _ = float(f(*args))
        best = min(best, time.time() - t0)
    per = best * 1000 / N_CHAIN
    print(f"{name:6s}: {per:6.2f} ms/shade (chain {best*1000:6.1f} ms)",
          flush=True)
    return per


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2_073_600
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 30_336
    blk = 40 if (R // LANE) % 40 == 0 else 8
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((S, 24)).astype(np.float32))
    table_t = jnp.asarray(np.ascontiguousarray(np.asarray(table).T))
    base = np.sort(rng.integers(0, S, size=R))
    slots = jnp.asarray(
        np.clip(base + rng.integers(-3, 4, size=R), 0, S - 1).astype(np.int32))

    head, colg, inker = make_variants(R, S, blk)

    # parity before timing
    ref = jax.jit(head)(table, slots)
    for name, fn, args in (("colg", colg, (table_t, slots)),
                           ("inker", inker, (table, slots))):
        got = jax.jit(fn)(*args)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"parity {name}: max|d|={err:.2e}", flush=True)
        assert err == 0.0, (name, err)

    print(f"R={R} S={S} blk={blk}", flush=True)
    bench("head", head, table, slots, S=S)
    bench("colg", colg, table_t, slots, S=S)
    bench("inker", inker, table, slots, S=S)


if __name__ == "__main__":
    main()
