"""Monte-Carlo path integrator: scatter model + bounce loop + sample loop.

Faithful vectorization of the shader's path logic:

* ``diffuse()`` (reference: fragment.glsl:220-232): in lambertian mode the
  scatter direction is ``normalize(normal + xi)`` with xi uniform in
  [-1,1]^3 (a cosine-weighted approximation); otherwise the random vector is
  sign-flipped into the hemisphere and normalized.
* ``lerp()`` (fragment.glsl:234-240) blends the normalized diffuse and
  mirror-reflection directions by ``1 - roughness`` and renormalizes:
  roughness 1 -> pure diffuse, 0 -> mirror.
``raycast_fn(origin, dir, alive, primary=...)`` receives the live-ray mask
so traversal can skip work for terminated paths, plus a static
``primary`` hint (bounce index 0) that lets backends pick segment-tuned
kernel variants (renderer.make_raycast_fn).

* the bounce loop (fragment.glsl:309-350) adds ``emission_color * emission *
  rayColor`` on every hit (doubled in lambertian mode, fragment.glsl:329-331),
  multiplies the throughput by the surface color, offsets the next origin by
  ``normal * 1e-4``, terminates on ANY emissive hit, and on miss adds the
  constant sky then stops.  The per-fragment ``break`` statements become an
  ``alive`` mask; dead rays contribute exactly their frozen light.
* ``trace()`` (fragment.glsl:352-366) averages ``rays_per_pixel`` fully
  independent restarts of the same primary ray, with the RNG state carried
  sequentially across samples exactly like the shader's single ``seed``.

The bounce loop is UNROLLED (the bounce count is a static config int):
dead rays carry an ``alive`` mask — the vector analog of the shader's
breaks — and contribute exactly their frozen light to every later bounce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opengl_raytracer_tpu.ops import rng
from opengl_raytracer_tpu.ops.intersect import finalize_hit


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _normalize_unguarded(v):
    """GLSL ``normalize``: plain division (near-zero input is the caller's
    problem, as in the shader); we clamp the denominator at a denormal-level
    tiny to keep NaNs out of the image."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, np.float32(1e-30))


def _normalize_guarded(v):
    """The ``lerp`` helper's explicit guard: zero vector stays zero
    (fragment.glsl:237-238)."""
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > 0.0, v / jnp.maximum(n, np.float32(1e-30)), jnp.zeros_like(v))


def scatter(seed, normal, ray_dir, roughness, lambertian):
    """Next bounce direction; returns (new_seed, direction).

    Draws exactly three RNG values (the shader draws them in ``diffuse``
    before any other decision, fragment.glsl:221), computes the mirror
    direction with ``reflect``, and blends per ``lerp``.

    ``lambertian`` is a TRACED bool scalar (the reference flips a uniform,
    main.py:353-360 / fragment.glsl:16, so toggling it must not recompile);
    both scatter formulas are computed and selected per-element.
    """
    seed, xi = rng.random_vec3(seed)

    lam = jnp.asarray(lambertian, bool)
    diffuse_lam = _normalize_unguarded(normal + xi)
    flip = _dot(xi, normal) < 0.0
    xi_h = jnp.where(flip, -xi, xi)
    diffuse_hemi = _normalize_unguarded(xi_h)
    diffuse_dir = jnp.where(lam, diffuse_lam, diffuse_hemi)

    # GLSL reflect(I, N) = I - 2*dot(N, I)*N (fragment.glsl:320).
    specular_dir = ray_dir - 2.0 * _dot(ray_dir, normal) * normal

    # lerp(diffuseDir, specularDir, roughness) (fragment.glsl:234-240).
    t = 1.0 - roughness[:, None]
    d0 = _normalize_guarded(diffuse_dir)
    d1 = _normalize_guarded(specular_dir)
    out = _normalize_unguarded(d0 * (1.0 - t) + d1 * t)
    return seed, out


def raytrace(scene, raycast_fn, origin0, dir0, seed0, sky_color, n_bounces: int,
             lambertian, reorder: bool = False, sort_window: int = 0):
    """One path per ray: returns (incoming_light (R,3), new_seed).

    The reference's per-pixel bounce loop (fragment.glsl:309-350) with the
    emissive-break and miss-break semantics expressed as an alive mask.

    With ``reorder=True``, rays are re-sorted by a Morton/octant coherence
    key (ops/morton.py) before every raycast so packet-style traversals see
    coherent blocks even on bounce rays; each ray carries its own RNG state
    and original index, so results are bit-identical to the unsorted order.

    ``sort_window`` > 0 sorts within independent windows of that many rays
    instead of globally: a bitonic sort is O(n log^2 n) compare-exchange
    passes, so an 8K window costs ~2.5x less than a 2M global sort, and
    rays never cross windows (each window was itself coherent at the
    previous bounce, so packet quality degrades only mildly).  The
    restoring sort is windowed identically — original indices stay inside
    their window — so images remain bit-identical to the unsorted order.
    """
    R = origin0.shape[0]
    if sort_window and (R % sort_window or R <= sort_window):
        sort_window = 0  # fall back to the global sort

    def _wsort(operands, num_keys=1):
        """lax.sort, optionally batched into sort_window-ray windows."""
        if not sort_window:
            return jax.lax.sort(operands, num_keys=num_keys)
        n_win = R // sort_window
        parts = jax.lax.sort(
            tuple(x.reshape(n_win, sort_window) for x in operands),
            dimension=1, num_keys=num_keys,
        )
        return tuple(x.reshape(R) for x in parts)
    # x2 emission in lambertian mode (fragment.glsl:329-331); traced select
    # so the L toggle is a uniform flip, not a recompile.
    emission_scale = jnp.where(jnp.asarray(lambertian, bool),
                               np.float32(2.0), np.float32(1.0))

    if reorder:
        from opengl_raytracer_tpu.ops.morton import ray_sort_keys

        scene_lo = scene.node_min[0]
        scene_hi = scene.node_max[0]

    def body(state, static_i=None):
        i, origin, direction, ray_color, incoming, alive, seed, orig = state

        if reorder:
            # Primary rays (i == 0) arrive screen-coherent; sorting only
            # pays off on bounce rays.  The reorder is a multi-operand
            # lax.sort carrying every per-ray column THROUGH the sort
            # network: measured ~5x cheaper on TPU than argsort followed
            # by random-index gathers (XLA gathers are near-scalar; the
            # bitonic network's data movement is dense vector work).
            def do_sort(args):
                origin, direction, ray_color, incoming, alive, seed, orig = args
                keys = ray_sort_keys(origin, direction, scene_lo, scene_hi, alive)
                # 12 operands, not 16: each bitonic payload column costs
                # ~1.3 ms per 2M-ray sort (experiments/sort_cost.py), so
                # two columns are folded away per axis.
                #  * ``incoming`` rides in the origin columns: light is only
                #    ever added at the DEATH event (an emissive hit or a
                #    miss both clear ``alive``, fragment.glsl:327-346), so
                #    live rays always carry incoming == 0, and dead rays
                #    never use their origin again (every later update is
                #    masked by ``alive``).
                #  * ``alive`` is re-derived from the sorted key: dead rays
                #    carry the reserved sentinel 0xFFFFFFFF and live keys
                #    are clamped below it (ops/morton.py).
                merged = jnp.where(alive[:, None], origin, incoming)
                sorted_ops = _wsort(
                    (keys,
                     merged[:, 0], merged[:, 1], merged[:, 2],
                     direction[:, 0], direction[:, 1], direction[:, 2],
                     ray_color[:, 0], ray_color[:, 1], ray_color[:, 2],
                     seed, orig),
                )
                (keys_s, m0, m1, m2, d0, d1, d2, c0, c1, c2,
                 seed_s, orig_s) = sorted_ops
                alive_s = keys_s != np.uint32(0xFFFFFFFF)
                merged_s = jnp.stack([m0, m1, m2], axis=-1)
                zeros = jnp.zeros_like(merged_s)
                # Dead lanes keep their (finite) incoming values in the
                # origin slots; the raycast masks them out and every
                # origin consumer is alive-gated, so the junk never flows.
                return (merged_s,
                        jnp.stack([d0, d1, d2], axis=-1),
                        jnp.stack([c0, c1, c2], axis=-1),
                        jnp.where(alive_s[:, None], zeros, merged_s),
                        alive_s, seed_s, orig_s)

            args = (origin, direction, ray_color, incoming, alive, seed,
                    orig)
            if static_i is None:
                args = jax.lax.cond(i > 0, do_sort, lambda a: a, args)
            elif static_i > 0:
                args = do_sort(args)
            (origin, direction, ray_color, incoming, alive, seed, orig) = args

        nearest = raycast_fn(origin, direction, alive,
                             primary=(static_i == 0))
        hit = finalize_hit(scene, origin, direction, nearest)

        seed_h, new_dir = scatter(seed, hit.normal, direction, hit.roughness,
                                  lambertian)

        was_hit = alive & hit.did_hit
        was_miss = alive & ~hit.did_hit

        emitted = hit.emission_color * (hit.emission * emission_scale)[:, None]
        incoming = (
            incoming
            + jnp.where(was_hit[:, None], emitted * ray_color, 0.0)
            + jnp.where(was_miss[:, None], sky_color[None, :], 0.0)
        )
        ray_color = jnp.where(was_hit[:, None], ray_color * hit.color, ray_color)
        origin = jnp.where(
            was_hit[:, None], hit.point + hit.normal * np.float32(1e-4), origin
        )
        direction = jnp.where(was_hit[:, None], new_dir, direction)
        seed = jnp.where(was_hit, seed_h, seed)
        # Terminate on emissive hit (fragment.glsl:338-340) or on miss.
        alive = was_hit & ~(hit.emission > 0.0)
        return i + 1, origin, direction, ray_color, incoming, alive, seed, orig

    state = (
        jnp.int32(0),
        origin0,
        dir0,
        jnp.ones((R, 3), jnp.float32),
        jnp.zeros((R, 3), jnp.float32),
        jnp.ones((R,), bool),
        seed0,
        jnp.arange(R, dtype=jnp.int32),
    )
    # The bounce count is STATIC (a python int from the config), so the
    # loop unrolls.  Measured equal to the lax.while_loop version at 1080p
    # (813 vs 817 ms/frame -- XLA's loop carries were already cheap), but
    # unrolling drops bounce 0's sort branch at trace time and keeps every
    # bounce index static for the profiler.  The reference's early exit on
    # all-paths-dead (fragment.glsl:313's loop bound with breaks) is
    # preserved semantically by the alive masks -- dead rays contribute
    # exactly their frozen incoming light.
    for _i in range(int(n_bounces)):
        state = body(state, static_i=_i)
    incoming, seed, orig = state[4], state[6], state[7]
    if reorder:
        # Restore pixel order: one more multi-operand sort keyed by the
        # original index (cheaper than argsort + gathers, see above).
        # Windowed sorts never move a ray across its window, so the
        # restore can be windowed too.
        _, i0, i1, i2, seed = _wsort(
            (orig, incoming[:, 0], incoming[:, 1], incoming[:, 2], seed),
        )
        incoming = jnp.stack([i0, i1, i2], axis=-1)
    return incoming, seed


def trace(scene, raycast_fn, origin0, dir0, seed0, sky_color, n_bounces: int,
          rays_per_pixel: int, lambertian, reorder: bool = False,
          sort_window: int = 0):
    """Average ``rays_per_pixel`` independent paths (fragment.glsl:352-366)."""
    run = partial(
        raytrace,
        scene,
        raycast_fn,
        origin0,
        dir0,
        sky_color=sky_color,
        n_bounces=n_bounces,
        lambertian=lambertian,
        reorder=reorder,
        sort_window=sort_window,
    )
    if rays_per_pixel == 1:
        color, seed = run(seed0=seed0)
        return color, seed

    def body(seed, _):
        color, seed = run(seed0=seed)
        return seed, color

    seed, colors = jax.lax.scan(body, seed0, None, length=rays_per_pixel)
    return colors.mean(axis=0), seed
