"""A/B the per-bounce material gather+transpose (the shade glue's cost).

HEAD path (ops/shade.py): abc = sh_slot[slot] (an (R, 24) row gather —
TPU tiles pad the 24-wide minor dim to 128 lanes, so the write side is
~1 GB at 2M rays) followed by abc.T.reshape(24, P, 128) (reads the same
padded GB).  Measured ~3.75 + 1.8 ms per bounce (round-3 profile).

Candidate: 24 independent (R,) gathers from pre-transposed (24, S)
column tables — every output is dense (8 MB), no transpose, and the
random reads hit a 110 KB table.  Whether XLA lowers a 1D gather to
something vector-friendly on TPU decides the win; this measures it.

Also measures: a (R, 8) x3 split-row gather (three 8-wide tables pack
the 19 used fields; smaller lane padding), and the fused-transpose
variant (gather straight into (24, P, 128) via one reshaped take).

Usage: python experiments/gather_ab.py [R [S]]

RESULT (TPU v5e, 2026-08-18, R=2M uniform-random slots, S=27542):

    head: (R,24) row gather + transpose: 27.93 ms
    row gather only:                     27.70 ms
    24x (R,) column gathers (1D):       402.18 ms
    24x (P,128) column gathers (2D idx):402.30 ms
    take+T fused:                        31.49 ms

1D/per-column gathers are ~15x WORSE (XLA lowers them near-scalar on
TPU); the row gather is the right structure, and the in-frame cost
(~3.75 ms/bounce, round-3 trace) is far below this random-slot worst
case because the reorder sort makes slots coherent.  The transpose adds
~0.2 ms here.  CLOSED: keep the (R, 24) row gather + transpose.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


def bench(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    leaves = jax.tree_util.tree_leaves(out)
    print(f"{name}: {best * 1000:.2f} ms ({len(leaves)} outputs)", flush=True)
    return best


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * 1024 * 1024
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 27_542
    P = R // LANE
    rng = np.random.default_rng(0)
    sh = jnp.asarray(rng.standard_normal((S, 24), dtype=np.float32))
    sh_t = jnp.asarray(np.asarray(sh).T.copy())          # (24, S)
    slot = jnp.asarray(rng.integers(0, S, R, dtype=np.int32))

    @jax.jit
    def head(slot):
        abc = sh[slot]                    # (R, 24) row gather
        return abc.T.reshape(24, P, LANE)

    @jax.jit
    def head_nt(slot):                    # gather only (no transpose)
        return sh[slot]

    @jax.jit
    def cols24(slot):
        return tuple(sh_t[a][slot] for a in range(24))

    @jax.jit
    def cols24_2d(slot):                  # gather per-column, pre-shaped
        s2 = slot.reshape(P, LANE)
        return tuple(sh_t[a][s2] for a in range(24))

    @jax.jit
    def take_rows(slot):                  # take + reshape, let XLA fuse
        return jnp.take(sh, slot, axis=0).T.reshape(24, P, LANE)

    bench("head: (R,24) row gather + transpose", head, slot)
    bench("row gather only", head_nt, slot)
    bench("24x (R,) column gathers (1D)", cols24, slot)
    bench("24x (P,128) column gathers (2D idx)", cols24_2d, slot)
    bench("take+T fused", take_rows, slot)


if __name__ == "__main__":
    main()
