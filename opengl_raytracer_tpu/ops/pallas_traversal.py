"""Pallas TPU kernel: BVH traversal with the scene resident in VMEM.

Why this kernel exists: the XLA-level traversals (ops/traversal.py) carry
per-ray state through a ``lax.while_loop`` and XLA materializes those
carries in HBM — tens of microseconds of memory traffic per traversal step,
the measured floor of the whole renderer on a v5e.  Here the carries are
kernel values (registers/VMEM) and the scene tables are VMEM-resident, so a
traversal step costs only its arithmetic.

Layout (built by Scene.send, driven by VMEM's (8, 128) tiling — a naive
``(T, 16)`` table would waste 8x its bytes on lane padding):

* ``pl_tri_rows  (T_rows, 128) f32`` — packed triangles, 8 per row, 16
  lanes each: [v0.xyz, e1.xyz, e2.xyz, face.xyz, pad x4].  BVH leaves are
  **aligned to row boundaries** (leaf start multiple of 8), so one leaf is
  a contiguous ``(leaf_rows, 128)`` sublane slice — a single dynamic load.
* ``pl_geom (N, 8) f32`` / ``pl_meta (N, 8) i32`` — per-node AABB and
  [miss, first_row, count]; one dynamic sublane load each per node visit.
* ``pl_remap (T_aligned,) i32`` — aligned slot -> permuted triangle id,
  applied OUTSIDE the kernel to the winning slot, so shading gathers keep
  using the permuted SoA arrays.

One grid step owns a block of 1024 coherent rays (an (8, 128) VPU tile per
coordinate; the renderer feeds 8x16-pixel packets).  The block shares a
single scalar node pointer through the DFS-preorder miss-link layout
(ops/bvh.py); the slab test and the unrolled leaf Möller–Trumbore loop
(exact reference forms, fragment.glsl:106-204) run dense on the full tile.
Per-ray pruning against the current best hit keeps results exact
(fragment.glsl:261-262); rays entering with ``best_t = -inf`` (dead) can
neither open nodes nor accept hits, and a fully dead block exits via the
root's miss link after one test.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengl_raytracer_tpu.ops.intersect import BIG, EPS, Nearest

BLOCK = 1024  # rays per grid step: an (8, 128) VPU tile
_SUB, _LANE = 8, 128
TRI_LANES = 16  # floats per packed triangle
TRIS_PER_ROW = _LANE // TRI_LANES  # 8


def _traverse_kernel(ox, oy, oz, dx, dy, dz, t0,
                     geom, meta, tri_rows,
                     t_out, tri_out, u_out, v_out,
                     *, n_nodes: int, leaf_rows: int, max_leaf: int):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z

    best_t = t0[:]
    zero = jnp.zeros_like(best_t)
    best_tri = jnp.zeros_like(best_t, dtype=jnp.int32)
    best_u = zero
    best_v = zero

    def cond(c):
        return c[0] < n_nodes

    def body(c):
        node, bt, btri, bu, bv = c

        g = geom[node]  # (8,) [min.xyz, max.xyz, 0, 0]
        t1x = (g[0] - o_x) * inv_x
        t2x = (g[3] - o_x) * inv_x
        t1y = (g[1] - o_y) * inv_y
        t2y = (g[4] - o_y) * inv_y
        t1z = (g[2] - o_z) * inv_z
        t2z = (g[5] - o_z) * inv_z
        near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                       jnp.minimum(t1y, t2y)),
                           jnp.minimum(t1z, t2z))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                      jnp.maximum(t1y, t2y)),
                          jnp.maximum(t1z, t2z))
        hit = (far >= near) & (far >= 0.0)
        t_entry = jnp.where(hit, jnp.maximum(near, 0.0), -1.0)
        ray_open = hit & (t_entry <= bt)  # fragment.glsl:261-262 pruning
        any_open = jnp.any(ray_open)

        m = meta[node]  # (8,) [miss, first_row, count, 0...]
        miss, first_row, count = m[0], m[1], m[2]
        is_leaf = count > 0
        do_leaf = any_open & is_leaf

        # One contiguous load covers the whole (row-aligned) leaf.
        block = tri_rows[pl.ds(first_row, leaf_rows), :]  # (leaf_rows, 128)

        for l in range(max_leaf):
            row = l // TRIS_PER_ROW
            base = (l % TRIS_PER_ROW) * TRI_LANES
            f_x, f_y, f_z = block[row, base + 9], block[row, base + 10], block[row, base + 11]
            det = d_x * f_x + d_y * f_y + d_z * f_z
            inv_det = 1.0 / det
            rx = o_x - block[row, base + 0]
            ry = o_y - block[row, base + 1]
            rz = o_z - block[row, base + 2]
            t = -(rx * f_x + ry * f_y + rz * f_z) * inv_det
            px = ry * d_z - rz * d_y
            py = rz * d_x - rx * d_z
            pz = rx * d_y - ry * d_x
            u = -(block[row, base + 6] * px + block[row, base + 7] * py
                  + block[row, base + 8] * pz) * inv_det
            v = (block[row, base + 3] * px + block[row, base + 4] * py
                 + block[row, base + 5] * pz) * inv_det
            valid = ((jnp.abs(det) >= EPS) & (t > EPS)
                     & (u >= 0.0) & (v >= 0.0) & ((u + v) <= 1.0))
            slot = first_row * TRIS_PER_ROW + l
            upd = do_leaf & (l < count) & valid & (t < bt)
            bt = jnp.where(upd, t, bt)
            btri = jnp.where(upd, slot, btri)
            bu = jnp.where(upd, u, bu)
            bv = jnp.where(upd, v, bv)

        node = jnp.where(any_open & ~is_leaf, node + 1, miss)
        return node, bt, btri, bu, bv

    _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t, best_tri, best_u, best_v)
    )
    t_out[:] = best_t
    tri_out[:] = best_tri
    u_out[:] = best_u
    v_out[:] = best_v


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" or any(
        d.platform in ("tpu", "axon") for d in jax.devices()
    )


def raycast_pallas(scene, origin, direction, active=None,
                   max_leaf_tris: int = 16, interpret: bool | None = None) -> Nearest:
    """Nearest hit via the VMEM-resident Pallas traversal kernel.

    Requires the aligned packed arrays on SceneData (pl_geom, pl_meta,
    pl_tri_rows, pl_remap; built by Scene.send).  R must be a multiple of
    128; blocks are padded to 1024 internally.
    """
    R = origin.shape[0]
    if R % _LANE:
        raise ValueError(f"ray count {R} must be a multiple of {_LANE}")
    if interpret is None:
        interpret = not _on_tpu()
    leaf_rows = -(-max_leaf_tris // TRIS_PER_ROW)

    pad = (-R) % BLOCK
    Rp = R + pad

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        return x.reshape(Rp // _LANE, _LANE)

    ox, oy, oz = (prep(origin[:, i]) for i in range(3))
    dx, dy, dz = (prep(direction[:, i]) for i in range(3))
    t0 = jnp.full((R,), BIG, jnp.float32)
    if active is not None:
        t0 = jnp.where(active, t0, -BIG)
    if pad:
        t0 = jnp.concatenate([t0, jnp.full((pad,), -BIG, jnp.float32)])
    t0 = t0.reshape(Rp // _LANE, _LANE)

    N = scene.pl_geom.shape[0]
    T_rows = scene.pl_tri_rows.shape[0]
    grid = Rp // BLOCK

    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((Rp // _LANE, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((Rp // _LANE, _LANE), jnp.int32),
        jax.ShapeDtypeStruct((Rp // _LANE, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((Rp // _LANE, _LANE), jnp.float32),
    ]

    t, slot, u, v = pl.pallas_call(
        partial(_traverse_kernel, n_nodes=N, leaf_rows=leaf_rows,
                max_leaf=max_leaf_tris),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [
            whole((N, 8)),
            whole((N, 8)),
            whole((T_rows, _LANE)),
        ],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, t0,
      scene.pl_geom, scene.pl_meta, scene.pl_tri_rows)

    near = Nearest(
        t=t.reshape(Rp)[:R],
        tri=scene.pl_remap[slot.reshape(Rp)[:R]],
        u=u.reshape(Rp)[:R],
        v=v.reshape(Rp)[:R],
    )
    if active is not None:
        near = near._replace(t=jnp.where(active, near.t, BIG))
    return near
