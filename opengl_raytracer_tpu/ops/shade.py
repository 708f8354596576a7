"""Fused shade/scatter/update Pallas kernel — one pass per bounce.

The integrator's per-bounce glue (finalize_hit + scatter + the alive /
incoming / throughput / origin / direction / seed updates) is pure
elementwise math over per-ray columns plus row slices of the gathered
(R, 24) material array.  Expressed as XLA ops it decomposes into dozens
of separate kLoop fusions, each re-reading the big material array — the
row-major layout pads the 24-wide minor dim to 128 lanes (a 1 GB HBM
footprint at 2M rays), and XLA's fusion pass does not horizontally merge
the sibling consumers.  Measured on the 1080p/4-bounce frame this glue
cost ~70 ms AoS and ~160 ms as naive SoA columns (experiments/trace_step).

This kernel does the whole thing in ONE pass: materials arrive
TRANSPOSED as (24, P, 128) so each field is a dense (B, 128) tile, ray
state arrives as (P, 128) columns, and every output column is written
once.  Arithmetic cost is trivial (~80 VPU ops/ray); the pass is
HBM-bandwidth-bound at ~0.5 GB total — ~1-2 ms/bounce instead of 15-30.

Exact-parity invariants preserved (vs ops/integrator.py's JAX path,
which remains the reference implementation and the non-TPU fallback):

* identical operation order and guards for the barycentric normal
  (fragment.glsl:146-176), scatter (fragment.glsl:220-240, :320) and the
  bounce-state update (fragment.glsl:309-350);
* RNG draws happen OUTSIDE in XLA (rng.random_value) and the three
  xi values + advanced seed are inputs: the u32 -> f32 conversion's
  rounding is kept in one place, so seeds stay bit-exact across paths.

Float outputs agree with the JAX path to FMA-contraction rounding (XLA
fuses mul+add independently per compiled program, so a few-ulp drift is
inherent to ANY two compilations of the same formula); integer outputs
(seed, alive) are exact.  tests/test_shade.py asserts both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.intersect import BIG

_LANE = 128
_B = 64  # max packets (sublane rows) per grid step


def _pick_block(P: int) -> int:
    """Largest multiple of 8 that divides P, capped at _B — so the grid
    tiles P exactly and no per-bounce pad/unpad copies are emitted (at
    1080p, P=16200: _B=64 padded every operand to 16256, costing ~3 ms of
    pure pad work per frame; B=40 tiles it exactly).  Falls back to _B
    (with padding) when P has no such divisor."""
    for b in range(min(_B, P) & ~7, 0, -8):
        if P % b == 0:
            return b
    return _B


def _shade_kernel(abc, t_in, u_in, v_in,
                  o0, o1, o2, d0, d1, d2,
                  rc0, rc1, rc2, in0, in1, in2,
                  alive_in, seed_old, seed_new,
                  x0, x1, x2, params,
                  no0, no1, no2, nd0, nd1, nd2,
                  nrc0, nrc1, nrc2, nin0, nin1, nin2,
                  alive_out, seed_out):
    f32 = jnp.float32
    tiny = np.float32(1e-30)

    sky = (params[0, 0], params[0, 1], params[0, 2])
    em_scale = params[0, 3]
    lam = params[0, 4] > 0.5

    t = t_in[...]
    u = u_in[...]
    v = v_in[...]
    o3 = (o0[...], o1[...], o2[...])
    d3 = (d0[...], d1[...], d2[...])
    rc = (rc0[...], rc1[...], rc2[...])
    inc = (in0[...], in1[...], in2[...])
    alive = alive_in[...] > 0
    xi = (x0[...], x1[...], x2[...])

    did_hit = t < BIG
    point = tuple(o3[a] + d3[a] * t for a in range(3))

    # material rows (Scene.send packs: n0 n1 | emission roughness | n2 |
    # face | pad pad | color | emission_color | pad pad)
    n0 = (abc[0], abc[1], abc[2])
    n1 = (abc[3], abc[4], abc[5])
    emission = abc[6]
    rough = abc[7]
    n2 = (abc[8], abc[9], abc[10])
    face = (abc[11], abc[12], abc[13])
    color = (abc[16], abc[17], abc[18])
    e_col = (abc[19], abc[20], abc[21])

    # --- finalize_hit (fragment.glsl:146-176) ---
    w = 1.0 - u - v
    raw = tuple(n0[a] * w + n1[a] * u + n2[a] * v for a in range(3))
    raw_len = jnp.sqrt(raw[0] * raw[0] + raw[1] * raw[1] + raw[2] * raw[2])
    face_len = jnp.sqrt(
        face[0] * face[0] + face[1] * face[1] + face[2] * face[2])
    ok_len = raw_len > np.float32(1e-20)
    den_raw = jnp.maximum(raw_len, tiny)
    den_face = jnp.maximum(face_len, tiny)
    normal = tuple(
        jnp.where(ok_len, raw[a] / den_raw, face[a] / den_face)
        for a in range(3)
    )
    flip = (d3[0] * normal[0] + d3[1] * normal[1]
            + d3[2] * normal[2]) > 0.0
    normal = tuple(jnp.where(flip, -normal[a], normal[a]) for a in range(3))

    # --- scatter (fragment.glsl:220-240, :320) ---
    s = tuple(normal[a] + xi[a] for a in range(3))
    s_len = jnp.maximum(
        jnp.sqrt(s[0] * s[0] + s[1] * s[1] + s[2] * s[2]), tiny)
    dif_lam = tuple(s[a] / s_len for a in range(3))
    d_xn = xi[0] * normal[0] + xi[1] * normal[1] + xi[2] * normal[2]
    hflip = d_xn < 0.0
    xi_h = tuple(jnp.where(hflip, -xi[a], xi[a]) for a in range(3))
    h_len = jnp.maximum(
        jnp.sqrt(xi_h[0] * xi_h[0] + xi_h[1] * xi_h[1]
                 + xi_h[2] * xi_h[2]), tiny)
    dif_hemi = tuple(xi_h[a] / h_len for a in range(3))
    diffuse = tuple(jnp.where(lam, dif_lam[a], dif_hemi[a])
                    for a in range(3))
    d_dn = d3[0] * normal[0] + d3[1] * normal[1] + d3[2] * normal[2]
    spec = tuple(d3[a] - 2.0 * d_dn * normal[a] for a in range(3))
    dif_len = jnp.sqrt(diffuse[0] * diffuse[0] + diffuse[1] * diffuse[1]
                       + diffuse[2] * diffuse[2])
    g0 = tuple(
        jnp.where(dif_len > 0.0,
                  diffuse[a] / jnp.maximum(dif_len, tiny), f32(0.0))
        for a in range(3)
    )
    spec_len = jnp.sqrt(spec[0] * spec[0] + spec[1] * spec[1]
                        + spec[2] * spec[2])
    g1 = tuple(
        jnp.where(spec_len > 0.0,
                  spec[a] / jnp.maximum(spec_len, tiny), f32(0.0))
        for a in range(3)
    )
    tt = 1.0 - rough
    out = tuple(g0[a] * (1.0 - tt) + g1[a] * tt for a in range(3))
    o_len = jnp.maximum(
        jnp.sqrt(out[0] * out[0] + out[1] * out[1] + out[2] * out[2]),
        tiny)
    new_dir = tuple(out[a] / o_len for a in range(3))

    # --- bounce-state update (fragment.glsl:309-350) ---
    was_hit = alive & did_hit
    was_miss = alive & jnp.logical_not(did_hit)
    em = emission * em_scale
    zero = jnp.zeros_like(t)
    for a, ref in ((0, nin0), (1, nin1), (2, nin2)):
        ref[...] = (inc[a]
                    + jnp.where(was_hit, e_col[a] * em * rc[a], zero)
                    + jnp.where(was_miss, sky[a], zero))
    for a, ref in ((0, nrc0), (1, nrc1), (2, nrc2)):
        ref[...] = jnp.where(was_hit, rc[a] * color[a], rc[a])
    off = np.float32(1e-4)
    for a, ref in ((0, no0), (1, no1), (2, no2)):
        ref[...] = jnp.where(was_hit, point[a] + normal[a] * off, o3[a])
    for a, ref in ((0, nd0), (1, nd1), (2, nd2)):
        ref[...] = jnp.where(was_hit, new_dir[a], d3[a])
    seed_out[...] = jnp.where(was_hit, seed_new[...], seed_old[...])
    next_alive = was_hit & jnp.logical_not(emission > 0.0)
    alive_out[...] = next_alive.astype(jnp.int32)


def shade_update(scene, nearest, o3, d3, rc3, inc3, alive, seed,
                 sky_color, emission_scale, lambertian,
                 interpret: bool = False):
    """Fused finalize+scatter+update; bit-identical to the integrator's
    JAX path (see module docstring).  All vec3 state is SoA 3-tuples of
    (R,) columns; returns (o3', d3', rc3', inc3', alive', seed')."""
    R = o3[0].shape[0]
    assert R % _LANE == 0
    P = R // _LANE

    # RNG stays in XLA for conversion-rounding parity; three draws + the
    # advanced seed ship into the kernel (fragment.glsl:221's order).
    seed_new, x0 = rng.random_value(seed)
    seed_new, x1 = rng.random_value(seed_new)
    seed_new, x2 = rng.random_value(seed_new)

    slot = jnp.clip(nearest.slot, 0, scene.sh_slot.shape[0] - 1)
    abc = scene.sh_slot[slot]  # (R, 24) row gather
    abc_t = abc.T.reshape(24, P, _LANE)

    def cols(x):
        return x.reshape(P, _LANE)

    blk = _pick_block(P)
    pad_p = (-P) % blk
    Pp = P + pad_p

    def prep(x, dtype=None):
        x = cols(x if dtype is None else x.astype(dtype))
        if pad_p:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_p, _LANE), x.dtype)], axis=0)
        return x

    if pad_p:
        abc_t = jnp.concatenate(
            [abc_t, jnp.zeros((24, pad_p, _LANE), abc_t.dtype)], axis=1)

    params = jnp.zeros((8, _LANE), jnp.float32)
    params = params.at[0, 0].set(sky_color[0])
    params = params.at[0, 1].set(sky_color[1])
    params = params.at[0, 2].set(sky_color[2])
    params = params.at[0, 3].set(jnp.asarray(emission_scale, jnp.float32))
    params = params.at[0, 4].set(
        jnp.asarray(lambertian, bool).astype(jnp.float32))

    grid = Pp // blk
    col_blk = pl.BlockSpec((blk, _LANE), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    abc_blk = pl.BlockSpec((24, blk, _LANE), lambda i: (0, i, 0),
                           memory_space=pltpu.VMEM)
    par_blk = pl.BlockSpec((8, _LANE), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)

    f32 = jnp.float32
    out_shapes = ([jax.ShapeDtypeStruct((Pp, _LANE), f32)] * 12
                  + [jax.ShapeDtypeStruct((Pp, _LANE), jnp.int32),
                     jax.ShapeDtypeStruct((Pp, _LANE), jnp.uint32)])
    outs = pl.pallas_call(
        _shade_kernel,
        grid=(grid,),
        in_specs=[abc_blk] + [col_blk] * 21 + [par_blk],
        out_specs=[col_blk] * 14,
        out_shape=out_shapes,
        interpret=interpret,
    )(abc_t,
      prep(nearest.t), prep(nearest.u), prep(nearest.v),
      prep(o3[0]), prep(o3[1]), prep(o3[2]),
      prep(d3[0]), prep(d3[1]), prep(d3[2]),
      prep(rc3[0]), prep(rc3[1]), prep(rc3[2]),
      prep(inc3[0]), prep(inc3[1]), prep(inc3[2]),
      prep(alive, jnp.int32), prep(seed), prep(seed_new),
      prep(x0), prep(x1), prep(x2), params)

    def unpad(x):
        return x[:P].reshape(R)

    no = tuple(unpad(outs[a]) for a in range(3))
    nd = tuple(unpad(outs[3 + a]) for a in range(3))
    nrc = tuple(unpad(outs[6 + a]) for a in range(3))
    ninc = tuple(unpad(outs[9 + a]) for a in range(3))
    new_alive = unpad(outs[12]) != 0
    new_seed = unpad(outs[13])
    return no, nd, nrc, ninc, new_alive, new_seed
