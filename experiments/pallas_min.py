"""Minimal pallas blocking test: does a (8,128)-blocked 1D grid stream?"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, tab_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + tab_ref[0, 0]

R = 1152  # rows
x = jnp.ones((R, 128), jnp.float32)
tab = jnp.ones((5000, 8), jnp.float32)
out = pl.pallas_call(
    kern,
    grid=(R // 8,),
    in_specs=[
        pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((5000, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
)(x, tab)
print('ok', float(out.sum()))
