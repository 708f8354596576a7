"""Feasibility micro-bench for round-2 sub-block traversal: cost of EIGHT
independent dynamic row loads assembled into an (8,8) tile per iteration,
vs one load."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2601
ITERS = 20000

def make(variant):
    def kern(tab_ref, out_ref, scratch):
        x = out_ref[:] * 0.0
        def cond(c): return c[0] < ITERS
        def body(c):
            i, x = c
            if variant == 'one_load':
                g = tab_ref[(i * 7) % N]
                x = x + g[0]
            elif variant == 'eight_loads_assemble':
                for r in range(8):
                    scratch[r] = tab_ref[(i * 7 + r * 331) % N]
                blk = scratch[:]           # (8, 8)
                x = x + jnp.sum(blk[:, 0:1])  # consume
            return i + 1, x
        _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
        out_ref[:] = x
    tab = jnp.ones((N, 8), jnp.float32)
    f = jax.jit(lambda: pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec((N, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 8), jnp.float32)],
    )(tab))
    r = f(); _ = float(r[0, 0])
    best = 1e9
    for _i in range(4):
        t0 = time.time(); r = f(); _ = float(r[0, 0]); best = min(best, time.time() - t0)
    print(f'{variant}: {best*1e9/ITERS:.0f} ns/iter (total {best*1000:.1f} ms)')

make('one_load')
make('eight_loads_assemble')
