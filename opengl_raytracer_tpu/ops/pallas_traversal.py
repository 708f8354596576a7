"""Pallas TPU kernel: 8-wide BVH traversal with the scene resident in VMEM.

Why this kernel exists: the XLA-level traversals (ops/traversal.py) carry
per-ray state through a ``lax.while_loop`` and XLA materializes those
carries in HBM — tens of microseconds of memory traffic per step, the
measured floor of the whole renderer on a v5e.  In-kernel, the carries are
registers/VMEM and the scene tables are VMEM-resident — and since the
remaining cost is a fixed ~250 ns per loop iteration (control flow, scalar
loads, the any-reduction), the tree is collapsed to 8-ary so each iteration
covers 8 child AABB tests (ops/wide_bvh.py).

Layout (built by Scene.send; every choice is driven by VMEM's (8, 128)
tiling — arrays with a minor dimension under 128 pad to 128 lanes and waste
8x their bytes, and per-scalar extraction of components measures ~10 cycles
each):

* ``pw_tiles (W/8, 8, 128) f32`` — wide-node children records: node w,
  child j at tile ``w//8``, sublane j, lane group ``(w%8)*16``: lanes 0-5
  the child AABB, lanes 6-13 the per-octant far-first push entries packed
  as exact-integer floats (``entry*8 + slot``; see ops/wide_bvh.py).
  Children sit on *sublanes*, so one slab evaluation tests 8 children
  against a 128-ray row densely.  Empty slots hold finite swapped-bounds
  boxes which DO pass the canonicalizing slab test (their hit-mask bit is
  set); they are excluded solely by the EMPTY_PACKED sentinel gating the
  push.  Finite values only because +/-inf would turn into NaN through
  the arithmetic one-hot select.
* ``pl_tri_tiles (G, 8, 128) f32`` — triangle octets: slot
  ``s = g*64 + k*8 + j`` at tile g, sublane j, lanes ``[k*16, k*16+16)``
  as [v0, e1, e2, face, pad x4]; leaves are octet-aligned ranges.
  Triangles on sublanes -> leaf Möller–Trumbore runs as 8-triangle x
  128-ray tiles per ray row, no scalar extraction.
* ``pl_remap (slots,) i32`` — aligned slot -> permuted triangle id,
  applied OUTSIDE the kernel.

One grid step owns 1024 coherent rays (an (8, 128) tile per coordinate; the
renderer feeds 8x16-pixel packets and Morton/octant-sorted bounce rays) and
a depth-first stack of pre-encoded entries in SMEM scratch.  Per-ray
pruning against the running nearest hit matches the reference
(``tNear > closestT`` skip, fragment.glsl:261-262); the slab and triangle
tests are the exact reference forms (fragment.glsl:106-204).  The kernel
returns (best_t, best_slot); the winner's barycentrics are recomputed
outside with identical math (bit-identical results, half the carried
state).  Dead rays enter with ``best_t = -inf`` and cannot open nodes or
accept hits.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengl_raytracer_tpu.ops.intersect import BIG, EPS, Nearest, mt_single
from opengl_raytracer_tpu.ops.wide_bvh import EMPTY_PACKED, ORD_LANE0

BLOCK = 1024  # rays per grid step: an (8, 128) VPU tile
_SUB, _LANE = 8, 128
TRI_LANES = 16
TRIS_PER_ROW = _LANE // TRI_LANES  # 8
STACK_SIZE = 512

_INT_BIG = np.int32(2**31 - 1)


def _traverse_kernel(ox, oy, oz, dx, dy, dz, t0,
                     pw_tiles, tri_tiles,
                     t_out, slot_out,
                     stack,
                     *, leaf_octets: int):
    o_x, o_y, o_z = ox[:], oy[:], oz[:]
    d_x, d_y, d_z = dx[:], dy[:], dz[:]
    inv_x, inv_y, inv_z = 1.0 / d_x, 1.0 / d_y, 1.0 / d_z

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)

    def one_hot_group(tile, k):
        """Select lane group k of a (8, 128) tile -> (8, 16), branch-free."""
        sel = tile[:, 0:TRI_LANES] * 0.0
        for kk in range(TRIS_PER_ROW):
            sel = sel + jnp.where(
                k == kk, tile[:, kk * TRI_LANES:(kk + 1) * TRI_LANES], 0.0
            )
        return sel

    # Dominant direction octant of this (coherence-sorted) block picks the
    # precomputed far-first child push order — near-first traversal with no
    # per-iteration sorting.
    octant = (
        ((jnp.sum(d_x) < 0.0).astype(jnp.int32) << 2)
        | ((jnp.sum(d_y) < 0.0).astype(jnp.int32) << 1)
        | (jnp.sum(d_z) < 0.0).astype(jnp.int32)
    )

    stack[0] = jnp.int32(0)  # root wide node

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, bt, bslot = c
        sp = sp - 1
        e = stack[sp]
        is_node = e >= 0

        def expand(args):
            bt, bslot, sp = args
            w = e
            cb = one_hot_group(pw_tiles[w // 8], w % 8)  # (8, 16)
            bminx, bminy, bminz = cb[:, 0:1], cb[:, 1:2], cb[:, 2:3]
            bmaxx, bmaxy, bmaxz = cb[:, 3:4], cb[:, 4:5], cb[:, 5:6]

            acc = jnp.zeros((_SUB, _LANE), dtype=jnp.bool_)
            for p in range(_SUB):
                r_ox, r_oy, r_oz = (o_x[p:p + 1, :], o_y[p:p + 1, :],
                                    o_z[p:p + 1, :])
                r_ix, r_iy, r_iz = (inv_x[p:p + 1, :], inv_y[p:p + 1, :],
                                    inv_z[p:p + 1, :])
                t1x = (bminx - r_ox) * r_ix
                t2x = (bmaxx - r_ox) * r_ix
                t1y = (bminy - r_oy) * r_iy
                t2y = (bmaxy - r_oy) * r_iy
                t1z = (bminz - r_oz) * r_iz
                t2z = (bmaxz - r_oz) * r_iz
                near = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                far = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                              jnp.maximum(t1y, t2y)),
                                  jnp.maximum(t1z, t2z))
                hit = (far >= near) & (far >= 0.0)
                t_entry = jnp.where(hit, jnp.maximum(near, 0.0), -1.0)
                # fragment.glsl:261-262 pruning, per ray of this row
                acc = acc | (hit & (t_entry <= bt[p:p + 1, :]))

            # Fold the per-child any into one scalar bitmask (bit j = child
            # j hit): scalar extraction from a *computed* vector miscompiles
            # on Mosaic, whereas a full reduction to a scalar is reliable.
            child_any = jnp.any(acc, axis=1, keepdims=True)  # (8,1)
            bits = jnp.sum(
                jnp.where(child_any, jnp.int32(1) << sub_iota, 0)
            )  # scalar bitmask

            # Ordered push entries live in the tile's free lanes: one lane
            # per octant, ordered rank on the sublane (ops/wide_bvh.py).
            # Select this block's octant lane branch-free, then pull each
            # rank's packed value out with a masked-sum reduction (the
            # Mosaic-safe scalar extraction from computed vectors).
            ord_col = cb[:, ORD_LANE0:ORD_LANE0 + 1] * 0.0
            for oo in range(_SUB):
                ord_col = ord_col + jnp.where(
                    octant == oo, cb[:, ORD_LANE0 + oo:ORD_LANE0 + oo + 1], 0.0
                )

            for i in range(_SUB):
                packed = jnp.sum(
                    jnp.where(sub_iota == i, ord_col, 0.0)
                ).astype(jnp.int32)
                ent = packed >> 3  # arithmetic shift = floor div for negatives
                j = packed & 7
                push = ((bits >> j) & 1) != 0
                push = push & (ent != EMPTY_PACKED)
                # Overflow guard must gate the INCREMENT too, or sp desyncs
                # from the stored entries (collapse_wide asserts the worst-
                # case depth fits, so this never fires in practice).
                push = push & (sp < STACK_SIZE)

                @pl.when(push)
                def _():
                    stack[sp] = ent

                sp = sp + push.astype(jnp.int32)
            return bt, bslot, sp

        def leaf(args):
            bt, bslot, sp = args
            first_octet = -e - 1
            for oct_i in range(leaf_octets):
                o_idx = first_octet + oct_i
                sel = one_hot_group(tri_tiles[o_idx // TRIS_PER_ROW],
                                    o_idx % TRIS_PER_ROW)

                v0x, v0y, v0z = sel[:, 0:1], sel[:, 1:2], sel[:, 2:3]
                e1x, e1y, e1z = sel[:, 3:4], sel[:, 4:5], sel[:, 5:6]
                e2x, e2y, e2z = sel[:, 6:7], sel[:, 7:8], sel[:, 8:9]
                fx, fy, fz = sel[:, 9:10], sel[:, 10:11], sel[:, 11:12]

                slot_vec = (first_octet + oct_i) * TRIS_PER_ROW + sub_iota

                for p in range(_SUB):
                    # One ray row vs 8 triangles: (8,1)x(1,128) -> (8,128).
                    r_ox = o_x[p:p + 1, :]
                    r_oy = o_y[p:p + 1, :]
                    r_oz = o_z[p:p + 1, :]
                    r_dx = d_x[p:p + 1, :]
                    r_dy = d_y[p:p + 1, :]
                    r_dz = d_z[p:p + 1, :]

                    det = r_dx * fx + r_dy * fy + r_dz * fz
                    inv_det = 1.0 / det
                    rx = r_ox - v0x
                    ry = r_oy - v0y
                    rz = r_oz - v0z
                    t = -(rx * fx + ry * fy + rz * fz) * inv_det
                    px = ry * r_dz - rz * r_dy
                    py = rz * r_dx - rx * r_dz
                    pz = rx * r_dy - ry * r_dx
                    u = -(e2x * px + e2y * py + e2z * pz) * inv_det
                    vv = (e1x * px + e1y * py + e1z * pz) * inv_det
                    valid = ((jnp.abs(det) >= EPS) & (t > EPS)
                             & (u >= 0.0) & (vv >= 0.0) & ((u + vv) <= 1.0))
                    tcand = jnp.where(valid, t, BIG)
                    tmin = jnp.min(tcand, axis=0, keepdims=True)  # (1,128)
                    smin = jnp.min(
                        jnp.where(tcand == tmin, slot_vec, _INT_BIG),
                        axis=0, keepdims=True,
                    )
                    brow = bt[p:p + 1, :]
                    better = tmin < brow  # strict <, fragment.glsl:275
                    upd = (row_ids == p) & better
                    bt = jnp.where(upd, tmin, bt)
                    bslot = jnp.where(upd, smin, bslot)
            return bt, bslot, sp

        bt, bslot, sp = jax.lax.cond(is_node, expand, leaf,
                                     (bt, bslot, sp))
        return sp, bt, bslot

    _, best_t, best_slot = jax.lax.while_loop(
        cond, body,
        (jnp.int32(1), t0[:], jnp.zeros((_SUB, _LANE), jnp.int32)),
    )
    t_out[:] = best_t
    slot_out[:] = best_slot


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu" or any(
        d.platform in ("tpu", "axon") for d in jax.devices()
    )


def raycast_pallas(scene, origin, direction, active=None,
                   max_leaf_tris: int = 16, interpret: bool | None = None) -> Nearest:
    """Nearest hit via the VMEM-resident wide-BVH Pallas kernel.

    Requires the packed arrays on SceneData (pw_tiles, pw_entry,
    pl_tri_tiles, pl_remap; built by Scene.send).  R must be a multiple of
    128; blocks are padded to 1024 internally.
    """
    R = origin.shape[0]
    if R % _LANE:
        raise ValueError(f"ray count {R} must be a multiple of {_LANE}")
    if interpret is None:
        interpret = not _on_tpu()
    leaf_octets = -(-max_leaf_tris // TRIS_PER_ROW)

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

    WT = scene.pw_tiles.shape[0]
    G = scene.pl_tri_tiles.shape[0]
    grid = Rp // BLOCK

    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def whole(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((Rp // _LANE, _LANE), jnp.float32),
        jax.ShapeDtypeStruct((Rp // _LANE, _LANE), jnp.int32),
    ]

    t, slot = pl.pallas_call(
        partial(_traverse_kernel, leaf_octets=leaf_octets),
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [
            whole((WT, _SUB, _LANE)),
            whole((G, _SUB, _LANE)),
        ],
        out_specs=[ray_spec] * 2,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_SIZE,), jnp.int32)],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, t0,
      scene.pw_tiles, scene.pl_tri_tiles)

    t = t.reshape(Rp)[:R]
    slot = slot.reshape(Rp)[:R]
    tri = scene.pl_remap[slot]
    did_hit = t < BIG

    # Recompute the winner's barycentrics outside the kernel — same formula
    # and inputs as the in-kernel test, so bit-identical (halves the
    # kernel's loop-carried state).
    safe_tri = jnp.where(did_hit, tri, 0)
    _, _, u, v = mt_single(
        origin, direction,
        scene.v0[safe_tri], scene.e1[safe_tri],
        scene.e2[safe_tri], scene.face[safe_tri],
    )
    near = Nearest(
        t=t,
        tri=tri,
        u=jnp.where(did_hit, u, 0.0),
        v=jnp.where(did_hit, v, 0.0),
    )
    if active is not None:
        near = near._replace(t=jnp.where(active, near.t, BIG))
    return near
