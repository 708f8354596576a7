"""Round-5 follow-up to gather_ab.py: is the material row gather
PADDING-bandwidth-bound, and can a packed-byte table kill the padding?

The (R, 24) f32 gather output is stored lane-padded 24 -> 128 on TPU
(sublane x lane tiling), so its HBM footprint at 2M rays is ~1 GB; the
transpose then re-reads that padded GB.  If the gather is bound by the
padded WRITE bandwidth (not per-row indexing), a (S, 96) uint8 table
(bytes of the same 24 f32, grouped [b0*24|b1*24|b2*24|b3*24]) gathers
into a (R, 96) u8 output = 256 MB (u8 tile lanes pad 96 -> 128), 4x
less traffic, and the f32 assembly + transpose can fold into the shade
kernel where layout is under our control.

Measures, with FRAME-REALISTIC coherent slots (sorted-ish: each run of
~64 rays shares a slot neighborhood, like post-reorder-sort bounce rays):

    g24_f32   (S,24) f32 row gather            [HEAD's gather]
    g24_t     ... + .T.reshape(24,P,128)       [HEAD's gather+transpose]
    g12_f32   (S,12) f32 row gather            [padding hypothesis probe:
                                                 equal time to g24 => padded]
    g96_u8    (S,96) u8 row gather             [dense-ish candidate]
    g48_u16   (S,48) u16 row gather            [fallback candidate]
    g128_u8   (S,128) u8 row gather            [exactly-128 dense candidate]

Usage: python experiments/gather2_ab.py [R [S]]

RESULT (TPU v5e, 2026-08-19, R=2073600, S=27542, coherent slots,
full output forced to materialize via optimization_barrier):

    g24_f32 :   5.39 ms   ~2.6 ns/row
    g24_t   :   5.43 ms   <- transpose FUSES INTO THE GATHER FOR FREE
    g12_f32 :   5.43 ms   <- same as 24-wide: row WIDTH is free
    g96_u8  :   5.12 ms   <- u8 packing saves only 5%
    g48_u16 :   5.27 ms
    g128_u8 :   5.13 ms

    => The gather is INDEXING-bound (~2.6 ns/row regardless of row
       width or dtype), NOT padding-bandwidth-bound: the packed-byte
       table hypothesis in this docstring's opening paragraph is DEAD.
       CAVEAT on g24_t == g24_f32: the optimization_barrier forces
       materialization but NOT a layout — XLA gives the barrier result
       the gather's {0,2,1} alias layout, so "the transpose is free"
       here is an artifact.  In-frame (trace_step.py, round 5) the
       pallas_call operand pins the default {2,1,0} layout and a real
       1.79 ms/bounce normalization copy exists; killing it requires
       the shade kernel to consume the gather's native layout (see
       experiments/shadeglue_ab.py).

    In-frame cross-check (trace_step.py at round-5 HEAD, 458.5 ms/step):
    the 5 material gathers run 3.75 ms each = 1.81 ns/row — BETTER than
    this standalone floor (sort coherence) — so the gather itself is at
    the machine's gather-indexing floor and only the copy is headroom.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

LANE = 128


N_CHAIN = 16


def bench(name, fn, *args, reps=8):
    """fn must chain N_CHAIN gathers inside ONE jit (the axon tunnel adds
    ~32 ms fixed per dispatched computation, and block_until_ready does
    not sync — a scalar readback per dispatch is the fence)."""
    _ = float(fn(*args))  # compile + run once
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        _ = float(fn(*args))
        best = min(best, time.time() - t0)
    per = (best * 1000) / N_CHAIN
    print(f"{name:9s}: {per:6.2f} ms/gather (chain {best*1000:6.1f} ms)",
          flush=True)
    return per


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 2_073_600
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 27_542
    P = R // LANE
    rng = np.random.default_rng(0)

    f32_24 = rng.standard_normal((S, 24)).astype(np.float32)
    # byte-grouped u8 view: (S,24,4) le bytes -> (S,4,24) -> (S,96)
    u8_96 = np.ascontiguousarray(
        f32_24.view(np.uint8).reshape(S, 24, 4).transpose(0, 2, 1)
    ).reshape(S, 96)
    u16_48 = np.ascontiguousarray(
        f32_24.view(np.uint16).reshape(S, 24, 2).transpose(0, 2, 1)
    ).reshape(S, 48)
    u8_128 = np.zeros((S, 128), np.uint8)
    u8_128[:, :96] = u8_96

    # coherent slots: sorted base + small jitter, like post-sort bounce rays
    base = np.sort(rng.integers(0, S, size=R))
    jit = rng.integers(-3, 4, size=R)
    slots = jnp.asarray(np.clip(base + jit, 0, S - 1).astype(np.int32))

    t24 = jnp.asarray(f32_24)
    t12 = jnp.asarray(f32_24[:, :12])
    tu8 = jnp.asarray(u8_96)
    tu16 = jnp.asarray(u16_48)
    tu8p = jnp.asarray(u8_128)

    def chain(table, post=None):
        """Sum of N_CHAIN gathers with shifted (still coherent) slots;
        one scalar out so the whole chain is one dispatch."""
        def f(s):
            acc = jnp.zeros((), jnp.float32)
            for i in range(N_CHAIN):
                g = table[jnp.minimum(s + i, S - 1)]
                if post is not None:
                    g = post(g)
                # force the FULL output to materialize (otherwise XLA
                # narrows the gather to the one consumed element)
                g = jax.lax.optimization_barrier(g)
                acc = acc + g.reshape(-1)[0].astype(jnp.float32)
            return acc
        return jax.jit(f)

    g24 = chain(t24)
    g24t = chain(t24, post=lambda g: g.T.reshape(24, P, LANE))
    g12 = chain(t12)
    gu8 = chain(tu8)
    gu16 = chain(tu16)
    gu8p = chain(tu8p)

    print(f"R={R} S={S} coherent slots", flush=True)
    bench("g24_f32", g24, slots)
    bench("g24_t", g24t, slots)
    bench("g12_f32", g12, slots)
    bench("g96_u8", gu8, slots)
    bench("g48_u16", gu16, slots)
    bench("g128_u8", gu8p, slots)


if __name__ == "__main__":
    main()
