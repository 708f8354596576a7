"""Grow minimal kernel toward the traversal kernel to find the VMEM trigger."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1152
N = 5075
T = 27544

def variant(label, kern, n_in=7, n_out=4):
    xs = [jnp.ones((R, 128), jnp.float32) for _ in range(n_in)]
    geom = jnp.ones((N, 8), jnp.float32)
    meta = jnp.ones((N, 4), jnp.int32)
    tri = jnp.ones((T, 16), jnp.float32)
    try:
        outs = pl.pallas_call(
            kern,
            grid=(R // 8,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)] * n_in
                     + [pl.BlockSpec((N, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((N, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((T, 16), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)] * n_out,
            out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.float32)] * n_out,
        )(*xs, geom, meta, tri)
        jax.block_until_ready(outs)
        print(label, 'OK', float(outs[0][0,0]))
    except Exception as e:
        print(label, 'FAIL:', str(e)[:200].replace(chr(10),' '))

def k_simple(*refs):
    ins = refs[:7]; geom, meta, tri = refs[7:10]; outs = refs[10:]
    for o in outs:
        o[:] = ins[0][:] + geom[0, 0] + tri[0, 0]
variant('simple 7in/4out + tables', k_simple)

def k_while(*refs):
    ins = refs[:7]; geom, meta, tri = refs[7:10]; outs = refs[10:]
    x = ins[0][:]
    def cond(c): return c[0] < 100
    def body(c):
        i, x = c
        g = geom[i, :]
        return i + 1, x + g[0]
    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    for o in outs:
        o[:] = x
variant('while + dyn geom row', k_while)

def k_while_tri(*refs):
    ins = refs[:7]; geom, meta, tri = refs[7:10]; outs = refs[10:]
    x = ins[0][:]
    def cond(c): return c[0] < 100
    def body(c):
        i, x = c
        g = geom[i, :]
        m = meta[i, :]
        def lb(l, a):
            tr = tri[m[1] + l, :]
            return a + tr[0]
        x = jax.lax.fori_loop(0, jnp.where(m[2] > 0, m[2], 0), lb, x)
        return i + 1, x + g[0]
    _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    for o in outs:
        o[:] = x
variant('while + fori tri loop', k_while_tri)
