import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.presets import default_objects

sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=32, bvh_method='sah')
data = sc.send()
tri_tiles = data.pl_tri_tiles
G = tri_tiles.shape[0]

def kern(idx_ref, tiles_ref, out_ref):
    o_idx = idx_ref[0]
    tile = tiles_ref[o_idx // 8]
    k = o_idx % 8
    sel = tile[:, 0:16] * 0.0
    for kk in range(8):
        sel = sel + jnp.where(k == kk, tile[:, kk*16:(kk+1)*16], 0.0)
    ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[:] = jnp.where(ids < 16, jnp.pad(sel, ((0,0),(0,112))), 0.0)

def run(o_idx):
    out = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((G,8,128), lambda i:(0,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8,128), lambda i:(0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
    )(jnp.asarray([o_idx], jnp.int32), tri_tiles)
    return np.asarray(out)[:, :16]

host = np.asarray(tri_tiles)
bad = 0
for o_idx in [0, 1, 7, 8, 9, 100, 101, 555]:
    got = run(o_idx)
    g, k = o_idx // 8, o_idx % 8
    want = host[g][:, k*16:(k+1)*16]
    ok = np.array_equal(got, want)
    if not ok: bad += 1
    print(f'octet {o_idx} (g={g},k={k}): {"OK" if ok else "MISMATCH"}')
print('bad:', bad)
