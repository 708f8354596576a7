"""psort direction (sort_scaling follow-up): per-lane (axis-0) lax.sort
as an approximate row-clustering reorder.

The reorder sort only needs PACKET coherence — any permutation yields a
bit-identical image (rays carry their own RNG state and original index),
and a packet is one 128-lane row of the (R/128, 128) view.  Sorting each
LANE independently along the sublane axis clusters rays by key quantile
at row granularity: row r holds the 128 rank-r-per-lane elements, i.e.
global quantile r/(R/128) +- a sampling spread of ~0.4% of ray mass
(sqrt(p(1-p)/16200) at the median).  Crucially the permutation never
crosses lanes, so the pixel-order RESTORE is per-lane too (axis-0 sort
keyed by orig index restores exactly), and the comparison network needs
no lane-crossing exchanges — the suspected source of XLA's ~75-pass cost
on 1D sorts (see sort_scaling.py).

This measures the raw cost: 12-operand axis-0 sort of (16200, 128) vs
the 1D global sort, plus the padded pow2 variant and a (2025, 1024)
wide-lane view.

RESULT (TPU v5e, 2026-08-18; ~20 ms dispatch floor in every number):
    1D global 2M x 12:            42.72 ms
    axis0 (16200, 128) x 12:      32.02 ms
    axis0 (2025, 1024) x 12:      29.96 ms
    axis0 (8100, 256) x 12:       32.79 ms
    axis0 pow2-padded (16384,128) 33.57 ms
    axis0 (16200, 128) x 2:       31.76 ms
    axis0 (16200, 128) x 6:       31.30 ms
Net of dispatch the per-lane sort is ~2x cheaper (12 vs 23 ms) and FLAT
in operand count (every pass is full-lane vector work).  But the frame
A/B (psort_frame_ab.py) CLOSED the direction: quantile-clustered packets
lose 570 -> 1634 ms/frame — the kernel needs exactly-sorted packets.
Windowed refinement costs back the saving (617 ms).  The exact global
sort is at the bitonic VPU issue floor (~12.5 ms theoretical, 13.7
in-frame), so no Pallas sort can beat it either.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
    best = 1e9
    for _i in range(reps):
        t0 = time.time()
        out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    R = 2073600  # 1080p; 16200 rows x 128 lanes
    key = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))
    pays = [jnp.asarray(rng.standard_normal(R, dtype=np.float32))
            for _ in range(11)]

    # 1D global (the current reorder sort)
    ops1d = (key,) + tuple(pays)
    f1d = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
    bench("1D global 2M x 12", f1d, *ops1d)

    # axis-0 per-lane sort, (16200, 128)
    def ax0(nrows, nlanes, label):
        ops = tuple(x.reshape(nrows, nlanes) for x in ops1d)
        f = jax.jit(lambda *o: jax.lax.sort(o, dimension=0, num_keys=1))
        bench(f"axis0 ({nrows}, {nlanes}) x 12", f, *ops)

    ax0(16200, 128, "16200x128")
    ax0(2025, 1024, "2025x1024")
    ax0(8100, 256, "8100x256")

    # axis-0 with pow2 padding (16384 rows): does XLA specialize pow2?
    def ax0_pad(*o):
        pads = [jnp.pad(x.reshape(16200, 128), ((0, 184), (0, 0)),
                        constant_values=np.uint32(0xFFFFFFFF)
                        if x.dtype == jnp.uint32 else 0)
                for x in o]
        s = jax.lax.sort(tuple(pads), dimension=0, num_keys=1)
        return tuple(x[:16200] for x in s)
    bench("axis0 pow2-padded (16384, 128) x 12",
          jax.jit(ax0_pad), *ops1d)

    # fewer operands at axis0 (marginal cost per column)
    for k in (2, 6):
        ops = tuple(x.reshape(16200, 128) for x in ops1d[:k])
        f = jax.jit(lambda *o: jax.lax.sort(o, dimension=0, num_keys=1))
        bench(f"axis0 (16200, 128) x {k}", f, *ops)


if __name__ == "__main__":
    main()
