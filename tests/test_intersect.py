"""Intersector unit tests: analytic triangle/AABB cases plus consistency
between the matmul brute-force form, the per-ray gathered form, and the BVH
traversal."""

import numpy as np
import jax.numpy as jnp

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.models.trisoup import Triangles
from opengl_raytracer_tpu.ops.intersect import (
    mt_single,
    raycast_brute,
    slab_test,
)
from opengl_raytracer_tpu.ops.traversal import raycast_bvh, raycast_packet


def single_triangle(v0, v1, v2):
    v0, v1, v2 = (np.asarray(x, np.float32) for x in (v0, v1, v2))
    e1, e2 = v1 - v0, v2 - v0
    face = np.cross(e1, e2)
    return (jnp.asarray(x[None]) for x in (v0, e1, e2, face))


def test_hit_through_center():
    v0, e1, e2, face = single_triangle([0, 0, 5], [1, 0, 5], [0, 1, 5])
    o = jnp.asarray([[0.25, 0.25, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    valid, t, u, v = mt_single(o, d, v0, e1, e2, face)
    assert bool(valid[0])
    np.testing.assert_allclose(float(t[0]), 5.0, rtol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.25, atol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.25, atol=1e-6)


def test_miss_outside_barycentric():
    v0, e1, e2, face = single_triangle([0, 0, 5], [1, 0, 5], [0, 1, 5])
    o = jnp.asarray([[0.9, 0.9, 0.0]])  # u+v > 1
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    valid, *_ = mt_single(o, d, v0, e1, e2, face)
    assert not bool(valid[0])


def test_miss_behind():
    v0, e1, e2, face = single_triangle([0, 0, -5], [1, 0, -5], [0, 1, -5])
    o = jnp.asarray([[0.25, 0.25, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    valid, *_ = mt_single(o, d, v0, e1, e2, face)
    assert not bool(valid[0])


def test_parallel_ray_rejected():
    v0, e1, e2, face = single_triangle([0, 0, 5], [1, 0, 5], [0, 1, 5])
    o = jnp.asarray([[0.0, 0.0, 0.0]])
    d = jnp.asarray([[1.0, 0.0, 0.0]])  # parallel to the plane
    valid, *_ = mt_single(o, d, v0, e1, e2, face)
    assert not bool(valid[0])


def test_slab_inside_outside_behind():
    bmin = jnp.asarray([[-1.0, -1, -1]])
    bmax = jnp.asarray([[1.0, 1, 1]])
    inv_px = 1.0 / jnp.asarray([[1.0, 0.0, 0.0]])  # +x ray; IEEE inf on 0 axes
    # inside -> clamped to 0 (fragment.glsl:200-201)
    t = slab_test(jnp.asarray([[0.0, 0, 0]]), inv_px, bmin, bmax)
    assert float(t[0]) == 0.0
    # in front -> entry distance
    t = slab_test(jnp.asarray([[-3.0, 0, 0]]), inv_px, bmin, bmax)
    np.testing.assert_allclose(float(t[0]), 2.0, rtol=1e-5)
    # fully behind -> -1 (fragment.glsl:196-199)
    t = slab_test(jnp.asarray([[3.0, 0, 0]]), inv_px, bmin, bmax)
    assert float(t[0]) == -1.0
    # offset to the side, axis-parallel -> -1
    t = slab_test(jnp.asarray([[-3.0, 5.0, 0]]), inv_px, bmin, bmax)
    assert float(t[0]) == -1.0


def _random_scene(n=200, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-5, 5, size=(n, 1, 3))
    tri = (base + r.uniform(-1, 1, size=(n, 3, 3))).astype(np.float32)
    return Scene([Triangles(tri, color=(0.5, 0.5, 0.5), roughness=1.0)], max_leaf_tris=4)


def _random_rays(m=500, seed=1):
    r = np.random.default_rng(seed)
    o = r.uniform(-8, 8, size=(m, 3)).astype(np.float32)
    d = r.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_brute_matches_bvh():
    scene = _random_scene()
    data = scene.send()
    o, d = _random_rays()
    nb = raycast_brute(data, o, d)
    nv = raycast_bvh(data, o, d, max_leaf_tris=4)
    # same hit/miss classification
    hb = np.asarray(nb.t) < 1e29
    hv = np.asarray(nv.t) < 1e29
    np.testing.assert_array_equal(hb, hv)
    # same nearest distance (float assoc differs between the two forms)
    np.testing.assert_allclose(
        np.asarray(nb.t)[hb], np.asarray(nv.t)[hv], rtol=1e-4
    )
    # same triangle, allowing for epsilon-boundary flips
    agree = (np.asarray(nb.tri) == np.asarray(nv.tri)) | ~hb
    assert agree.mean() > 0.99


def test_packet_matches_bvh():
    scene = _random_scene()
    data = scene.send()
    o, d = _random_rays(512)  # 4 packets
    nv = raycast_bvh(data, o, d, max_leaf_tris=4)
    np_ = raycast_packet(data, o, d, max_leaf_tris=4)
    hv = np.asarray(nv.t) < 1e29
    hp = np.asarray(np_.t) < 1e29
    np.testing.assert_array_equal(hv, hp)
    np.testing.assert_allclose(np.asarray(nv.t)[hv], np.asarray(np_.t)[hp], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(nv.tri)[hv], np.asarray(np_.tri)[hp])


def test_packet_respects_active_mask():
    scene = _random_scene()
    data = scene.send()
    o, d = _random_rays(256)
    active = jnp.asarray((np.arange(256) % 3) != 0)
    n_masked = raycast_packet(data, o, d, active=active, max_leaf_tris=4)
    n_full = raycast_packet(data, o, d, max_leaf_tris=4)
    act = np.asarray(active)
    assert (np.asarray(n_masked.t)[~act] > 1e29).all()
    np.testing.assert_allclose(
        np.asarray(n_masked.t)[act], np.asarray(n_full.t)[act], rtol=1e-6
    )


def test_brute_matches_bruteforce_numpy():
    import oracle

    scene = _random_scene(50, seed=7)
    data = scene.send()
    osc = oracle.OracleScene(
        np.asarray(data.v0), np.asarray(data.v0 + data.e1),
        np.asarray(data.v0 + data.e2),
        np.asarray(data.n0), np.asarray(data.n1), np.asarray(data.n2),
        np.asarray(data.color), np.asarray(data.emission_color),
        np.asarray(data.emission), np.asarray(data.roughness),
    )
    o, d = _random_rays(100, seed=9)
    nb = raycast_brute(data, o, d)
    on, od = np.asarray(o), np.asarray(d)
    for i in range(on.shape[0]):
        hit = oracle.raycast(osc, on[i], od[i])
        if hit is None:
            assert float(nb.t[i]) > 1e29
        else:
            np.testing.assert_allclose(float(nb.t[i]), hit["t"], rtol=2e-4)
