"""Pallas traversal kernel tests (interpret mode on CPU): the VMEM-layout
kernel must agree exactly with the XLA per-ray traversal, including the
aligned-slot -> permuted-triangle remap and the active mask."""

import numpy as np
import jax.numpy as jnp
import pytest

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.models.trisoup import Triangles
from opengl_raytracer_tpu.ops.pallas_traversal import raycast_pallas
from opengl_raytracer_tpu.ops.traversal import raycast_bvh


def _scene(n=60, seed=0, leaf=16):
    r = np.random.default_rng(seed)
    base = r.uniform(-5, 5, size=(n, 1, 3))
    tri = (base + r.uniform(-1, 1, size=(n, 3, 3))).astype(np.float32)
    return Scene([Triangles(tri, color=(0.5, 0.5, 0.5), roughness=1.0)],
                 max_leaf_tris=leaf)


def _rays(m=256, seed=1):
    r = np.random.default_rng(seed)
    o = r.uniform(-8, 8, size=(m, 3)).astype(np.float32)
    d = r.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("leaf", [8, 16])
def test_pallas_matches_bvh(leaf):
    data = _scene(leaf=leaf).send()
    o, d = _rays()
    nv = raycast_bvh(data, o, d, max_leaf_tris=leaf)
    np_ = raycast_pallas(data, o, d, max_leaf_tris=leaf, interpret=True)
    hv = np.asarray(nv.t) < 1e29
    hp = np.asarray(np_.t) < 1e29
    np.testing.assert_array_equal(hv, hp)
    np.testing.assert_allclose(np.asarray(nv.t)[hv], np.asarray(np_.t)[hp],
                               rtol=1e-6)
    # remapped ids must point at the same (permuted-order) triangles
    np.testing.assert_array_equal(np.asarray(nv.tri)[hv], np.asarray(np_.tri)[hp])


def test_pallas_active_mask():
    data = _scene().send()
    o, d = _rays(128)
    active = jnp.asarray((np.arange(128) % 2) == 0)
    masked = raycast_pallas(data, o, d, active=active, max_leaf_tris=16,
                            interpret=True)
    full = raycast_pallas(data, o, d, max_leaf_tris=16, interpret=True)
    act = np.asarray(active)
    assert (np.asarray(masked.t)[~act] > 1e29).all()
    np.testing.assert_allclose(np.asarray(masked.t)[act],
                               np.asarray(full.t)[act], rtol=1e-6)


def test_pallas_ray_count_validation():
    data = _scene().send()
    o, d = _rays(100)  # not a multiple of 128
    with pytest.raises(ValueError):
        raycast_pallas(data, o, d, interpret=True)
