"""Fused shade/scatter/update kernel (ops/shade.py) parity.

The Pallas kernel mirrors the integrator's JAX path op for op — same
operation order, same guards, RNG draws shared (ops/shade.py docstring).
Float outputs may differ by a few ulps (XLA contracts mul+add into FMA
independently per compiled program); integer outputs (seed, alive) are
exact.  Runs in interpret mode on the CPU backend.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from opengl_raytracer_tpu.models.rect import Rect
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.integrator import raytrace, scatter_soa
from opengl_raytracer_tpu.ops.intersect import finalize_hit_soa
from opengl_raytracer_tpu.ops.shade import shade_update
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock


def _scene():
    return Scene([
        Rect([0, -1, 0], [14, 0.4, 14], [0.7, 0.8, 0.6], roughness=0.9),
        Rect([0.5, 0.6, 1.0], [1.2, 1.8, 0.9], [0.9, 0.3, 0.2],
             roughness=0.4),
        Rect([-1.5, 0.2, -0.5], [0.8, 0.8, 0.8], [1, 1, 1],
             emission=2.5, roughness=1.0),
        Rect([1.8, 0.1, -1.2], [0.6, 1.1, 0.6], [0.2, 0.4, 0.9],
             roughness=0.0),
    ], max_leaf_tris=8)


def _rays(R, seed=7):
    g = np.random.default_rng(seed)
    o = jnp.asarray(g.uniform(-4, 4, (R, 3)), jnp.float32)
    d = g.normal(size=(R, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("R", [256, 1024])
def test_shade_update_matches_jax_path(R):
    data = _scene().send()
    o, d = _rays(R)
    o3 = tuple(o[:, a] for a in range(3))
    d3 = tuple(d[:, a] for a in range(3))
    g = np.random.default_rng(3)
    alive = jnp.asarray(g.uniform(size=R) < 0.8)
    seed = jnp.asarray(g.integers(0, 2**32, R, dtype=np.uint32))
    rc3 = tuple(jnp.asarray(g.uniform(0, 1, R), jnp.float32)
                for _ in range(3))
    inc3 = tuple(jnp.asarray(g.uniform(0, 1, R), jnp.float32)
                 for _ in range(3))
    sky = jnp.asarray([0.3, 0.4, 0.9], jnp.float32) * np.float32(0.8)
    em_scale = np.float32(2.0)

    near = raycast_subblock(data, o3, d3, alive, interpret=True)

    # --- reference: the integrator's JAX path, verbatim ---
    hit = finalize_hit_soa(data, o3, d3, near)
    seed_h, new_dir = scatter_soa(seed, hit.normal, d3, hit.roughness, True)
    was_hit = alive & hit.did_hit
    was_miss = alive & ~hit.did_hit
    em = hit.emission * em_scale
    r_inc = tuple(
        inc3[a]
        + jnp.where(was_hit, hit.emission_color[a] * em * rc3[a], 0.0)
        + jnp.where(was_miss, sky[a], 0.0)
        for a in range(3))
    r_rc = tuple(jnp.where(was_hit, rc3[a] * hit.color[a], rc3[a])
                 for a in range(3))
    r_o = tuple(
        jnp.where(was_hit, hit.point[a] + hit.normal[a] * np.float32(1e-4),
                  o3[a]) for a in range(3))
    r_d = tuple(jnp.where(was_hit, new_dir[a], d3[a]) for a in range(3))
    r_seed = jnp.where(was_hit, seed_h, seed)
    r_alive = was_hit & ~(hit.emission > 0.0)

    # --- fused kernel ---
    f_o, f_d, f_rc, f_inc, f_alive, f_seed = shade_update(
        data, near, o3, d3, rc3, inc3, alive, seed, sky, em_scale, True,
        interpret=True)

    for ref, fus in ((r_o, f_o), (r_d, f_d), (r_rc, f_rc), (r_inc, f_inc)):
        for a in range(3):
            np.testing.assert_allclose(np.asarray(ref[a]),
                                       np.asarray(fus[a]),
                                       rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r_seed), np.asarray(f_seed))
    np.testing.assert_array_equal(np.asarray(r_alive), np.asarray(f_alive))


def test_raytrace_fused_matches_unfused():
    """End-to-end: the full bounce loop with fused_shade on/off agrees
    (both hemisphere and lambertian modes).  FMA-contraction ulps can
    flip a grazing hit for rare rays, diverging that ray's whole path —
    require 99.5% of components tight and the rest finite."""
    data = _scene().send()
    R = 512
    o, d = _rays(R, seed=11)
    px = jnp.arange(R, dtype=jnp.int32) % 64
    py = jnp.arange(R, dtype=jnp.int32) // 64
    seed = rng.warmup(rng.seed_pixels(px, py, 5), 3)
    sky = jnp.asarray([0.3, 0.4, 0.9], jnp.float32)

    def rc_fn(o3, d3, active=None, primary=False):
        return raycast_subblock(data, o3, d3, active, interpret=True)

    for lam in (True, False):
        base, _ = raytrace(data, rc_fn, o, d, seed, sky, n_bounces=3,
                           lambertian=lam, reorder=True)
        fused, _ = raytrace(data, rc_fn, o, d, seed, sky, n_bounces=3,
                            lambertian=lam, reorder=True, fused_shade=True,
                            interpret_shade=True)
        for a in range(3):
            b, f = np.asarray(base[a]), np.asarray(fused[a])
            assert np.all(np.isfinite(f))
            err = np.abs(b - f) / np.maximum(1.0, np.abs(b))
            assert np.mean(err > 1e-4) < 0.005, (lam, a, np.max(err))
