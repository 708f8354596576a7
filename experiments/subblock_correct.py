"""HARDWARE correctness probes for the sub-block kernel's primitives.

1. xfer round-trip: store a computed (8,1) int vector to a VMEM scratch
   tile, read per-row scalars back at static indices, use them as dynamic
   load indices -> verify the loaded rows are the right ones.
2. dynamic-row STORE: write computed register rows to out_ref[k] at
   runtime-computed k -> verify placement.
Run on TPU (the axon device); interpret mode is NOT the check.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SUB, _LANE = 8, 128
N = 64


def kern(tab, out, xfer, scr):
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
    # computed per-row indices (data-dependent on input)
    base = jnp.sum(tab[0]).astype(jnp.int32)  # = 1 from data (row sums to 1)
    idx = (sub * 7 + base) % N                       # rows 1,8,15,...
    xfer[:] = idx + jnp.zeros((_SUB, _LANE), jnp.int32)
    for r in range(_SUB):
        v = xfer[r, 0]
        scr[r] = tab[v]
    loaded = scr[:]
    # dynamic-row stores: write row r's loaded data to out[idx2_r]
    idx2 = (sub * 3 + base) % _SUB                   # 1,4,7,2,5,0,3,6
    xfer[:] = idx2 + jnp.zeros((_SUB, _LANE), jnp.int32)
    out[:] = jnp.zeros((_SUB, _LANE), jnp.float32)
    for r in range(_SUB):
        k = xfer[r, 0]
        out[k] = loaded[r] + 1000.0 * r


def main():
    tab = (np.arange(N)[:, None] + np.zeros((1, _LANE))).astype(np.float32)
    tab[0, :] = 1.0 / _LANE  # sums to 1 -> base=1
    whole = lambda shape: pl.BlockSpec(shape, lambda: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    f = jax.jit(lambda t: pl.pallas_call(
        kern,
        in_specs=[whole((N, _LANE))],
        out_specs=whole((_SUB, _LANE)),
        out_shape=jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_SUB, _LANE), jnp.int32),
                        pltpu.VMEM((_SUB, _LANE), jnp.float32)],
    )(t))
    r = np.asarray(f(jnp.asarray(tab)))
    base = 1
    idx = (np.arange(8) * 7 + base) % N
    idx2 = (np.arange(8) * 3 + base) % 8
    expect = np.zeros((8, _LANE), np.float32)
    for rr in range(8):
        row = tab[idx[rr]] + 1000.0 * rr
        expect[idx2[rr]] = row
    ok = np.allclose(r, expect)
    print("xfer+dynload+dynstore correctness:", "OK" if ok else "FAIL")
    if not ok:
        bad = np.nonzero(~np.isclose(r, expect))[0]
        print("mismatch rows:", np.unique(bad), r[:, 0], expect[:, 0])


if __name__ == "__main__":
    main()
