import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(x_ref, out_ref):
    acc = x_ref[:] > 0.5
    any_child = jnp.any(acc, axis=1).astype(jnp.int32)  # (8,)
    vals = jnp.zeros((8, 128), jnp.int32)
    ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for j in range(8):
        vals = jnp.where(ids == j, any_child[j], vals)
    out_ref[:] = vals

x = np.zeros((8, 128), np.float32)
x[2, 5] = 1.0
x[5, 100] = 1.0   # rows 2 and 5 have a hit
out = pl.pallas_call(
    kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
)(jnp.asarray(x))
got = np.asarray(out)[:, 0]
print('expect [0 0 1 0 0 1 0 0], got', got)
