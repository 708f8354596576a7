"""Micro-bench: per-iteration cost of dynamic VMEM row loads in a while loop."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2601
import sys as _sys
ITERS = int(os.environ.get('ITERS', 2000))

def make(variant):
    def kern(tab_ref, out_ref):
        x = out_ref[:] * 0.0
        def cond(c): return c[0] < ITERS
        def body(c):
            i, x = c
            idx = (i * 7) % N
            if variant == 'ref_scalar_row':
                g = tab_ref[idx]           # (8,)
                x = x + g[0]
            elif variant == 'ref_ds_row':
                g = tab_ref[pl.ds(idx, 1), :]   # (1,8)
                x = x + g[0, 0]
            elif variant == 'const_row':
                g = tab_ref[0]
                x = x + g[0] * (i % 2).astype(jnp.float32)
            elif variant == 'no_load':
                x = x + (i % 2).astype(jnp.float32)
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
    )(tab))
    r = f(); _ = float(r[0,0])
    best = 1e9
    for _i in range(4):
        t0=time.time(); r=f(); _=float(r[0,0]); best=min(best,time.time()-t0)
    print(f'{variant} ITERS={ITERS}: total {best*1000:.2f} ms, {best*1e9/ITERS:.0f} ns/iter')

for v in ['no_load', 'const_row', 'ref_scalar_row', 'ref_ds_row']:
    make(v)
