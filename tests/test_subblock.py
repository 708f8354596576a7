"""Sub-block (work-stealing) traversal: correctness vs the XLA packet
traversal and the brute-force sweep, in interpret mode on CPU.

The kernel under test is ops/subblock_traversal.py — the round-2 fast
path.  Hardware-vs-interpret parity is exercised separately on the TPU
(experiments/subblock_correct.py and the bench)."""

import numpy as np
import pytest

from opengl_raytracer_tpu.models.rect import Rect
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.models.trisoup import Triangles
from opengl_raytracer_tpu.ops.subblock_traversal import raycast_subblock
from opengl_raytracer_tpu.ops.traversal import raycast_packet
from opengl_raytracer_tpu.ops.wide2 import SubblockTables, validate_subblock

import jax.numpy as jnp


def random_scene(n_tris=257, seed=0):
    rng = np.random.default_rng(seed)
    tris = rng.uniform(-3, 3, (n_tris, 3, 3)).astype(np.float32)
    return Scene([Triangles(tris, color=(0.5, 0.5, 0.5), roughness=1.0)],
                 max_leaf_tris=16)


def random_rays(R, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_subblock_tables_valid():
    sc = random_scene()
    data = sc.send()
    assert data.p2_node_rows.shape[0] > 0
    tb = SubblockTables(
        np.asarray(data.p2_node_rows), np.asarray(data.p2_tri_rows),
        np.asarray(data.p2_remap), data.p2_node_rows.shape[0],
        data.p2_tri_rows.shape[0], 0,
    )
    validate_subblock(tb, sc.total_triangles)


@pytest.mark.parametrize("R", [128, 1024, 8192 + 256])
@pytest.mark.parametrize("node_pops", [1, 2])
def test_subblock_matches_packet(R, node_pops):
    """Nearest hits match the packet traversal exactly, including the
    non-multiple-of-POOL ray-count padding path, at both node-pop
    widths (dual pops reshuffle the pop/push schedule, never the hits)."""
    sc = random_scene()
    data = sc.send()
    o, d = random_rays(R)
    a = raycast_packet(data, o, d, max_leaf_tris=16)
    b = raycast_subblock(data, o, d, interpret=True, node_pops=node_pops)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t),
                               rtol=1e-6, atol=1e-6)
    hit = np.asarray(a.t) < 1e29
    assert (np.asarray(a.tri)[hit] == np.asarray(b.tri)[hit]).all()
    np.testing.assert_allclose(np.asarray(a.u)[hit], np.asarray(b.u)[hit],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.v)[hit], np.asarray(b.v)[hit],
                               atol=1e-5)


def test_subblock_respects_active_mask():
    """Dead rays must neither open nodes nor accept hits (best_t = -inf
    entry semantics), and come back with t = BIG."""
    sc = random_scene()
    data = sc.send()
    o, d = random_rays(512)
    rng = np.random.default_rng(7)
    act = jnp.asarray(rng.uniform(size=512) > 0.5)
    a = raycast_packet(data, o, d, act, max_leaf_tris=16)
    b = raycast_subblock(data, o, d, act, interpret=True)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t),
                               rtol=1e-6, atol=1e-6)
    dead = ~np.asarray(act)
    assert (np.asarray(b.t)[dead] >= 1e29).all()


def test_subblock_dead_packet_skip():
    """Whole-packet-dead tails are never claimed (the dynamic live-packet
    limit) and mid-pool dead packets are still claimed — both must return
    the same hits as a fully-active run on the live rays, and t = BIG with
    sanitized u/v/slot on the dead ones."""
    sc = random_scene()
    data = sc.send()
    o, d = random_rays(2048)
    full = raycast_subblock(data, o, d, interpret=True)

    # dead tail: last 10 of 16 packets fully dead (the reorder-sort shape)
    act_tail = jnp.asarray(np.arange(2048) < 6 * 128)
    # dead holes: packets 1, 3, 4 dead mid-pool (limit stays at the tail)
    hole = np.ones(2048, bool)
    for p in (1, 3, 4):
        hole[p * 128:(p + 1) * 128] = False
    act_hole = jnp.asarray(hole)

    for act in (act_tail, act_hole):
        r = raycast_subblock(data, o, d, act, interpret=True)
        live = np.asarray(act)
        np.testing.assert_allclose(np.asarray(r.t)[live],
                                   np.asarray(full.t)[live],
                                   rtol=1e-6, atol=1e-6)
        assert (np.asarray(r.t)[~live] >= 1e29).all()
        assert (np.asarray(r.u)[~live] == 0).all()
        assert (np.asarray(r.v)[~live] == 0).all()


def test_subblock_dead_packet_skip_multigrid(monkeypatch):
    """Per-grid-step live limits: with a small pool forcing several grid
    steps, each step's claim limit covers exactly its own live prefix."""
    import opengl_raytracer_tpu.ops.subblock_traversal as sbt

    monkeypatch.setattr(sbt, "POOL", 8)
    monkeypatch.setattr(sbt, "POOL_BIG", 8)
    sc = random_scene()
    data = sc.send()
    o, d = random_rays(4 * 8 * 128)       # 4 grid steps of 8 packets
    full = sbt.raycast_subblock(data, o, d, interpret=True)

    act = np.ones(o.shape[0], bool)
    act[5 * 128:8 * 128] = False          # step 0: live prefix of 5
    act[8 * 128:16 * 128] = False         # step 1: fully dead
    act[31 * 128:] = False                # step 3: live prefix of 7
    act_j = jnp.asarray(act)
    r = sbt.raycast_subblock(data, o, d, act_j, interpret=True)
    np.testing.assert_allclose(np.asarray(r.t)[act],
                               np.asarray(full.t)[act],
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(r.t)[~act] >= 1e29).all()


def test_subblock_renderer_image_matches_brute():
    """Full renderer with traversal='pallas2' (interpret on CPU) equals
    the brute-force image on a closed-box scene."""
    from opengl_raytracer_tpu.ops.camera import make_camera
    from opengl_raytracer_tpu.renderer import Renderer
    from opengl_raytracer_tpu.utils.config import RenderConfig
    from opengl_raytracer_tpu.utils.image import rmse

    objs = [
        Rect([4, 4, 0.1], [0, 0, -2], [0, 0, 0], color=[0.8, 0.2, 0.2],
             roughness=1),
        Rect([4, 4, 0.1], [0, -2, 0], [90, 0, 0], color=[0.2, 0.8, 0.2],
             roughness=1),
        Rect([1.5, 1.5, 0.1], [0, 1.9, 0], [90, 0, 0], color=[0, 0, 0],
             emission_color=[1, 1, 1], emission=1.5, roughness=1),
        Triangles([[[-1, -1, 0.5], [1, -1, 0.5], [0, 1, 0.5]]],
                  color=(0.3, 0.3, 0.9), roughness=0.0),
    ]
    cam = make_camera(np.array([0, 0, 4.0], np.float32), (180.0, 0.0))

    imgs = {}
    for traversal in ("brute", "pallas2"):
        cfg = RenderConfig(width=16, height=16, bounces=2, traversal=traversal)
        r = Renderer(Scene(objs), cfg)
        st = r.render(camera=cam, frames=2)
        imgs[traversal] = r.image(st)
    assert rmse(imgs["brute"], imgs["pallas2"]) < 1e-6


def test_subblock_multipart_matches_packet(monkeypatch):
    """Scenes partitioned into multiple sub-block parts (the VMEM-budget
    de-cliff path) must produce identical nearest hits: parts chain with
    cross-part best-t pruning and a strict-< host combine."""
    import opengl_raytracer_tpu.ops.wide2 as wide2

    orig = wide2.build_subblock_parts

    def tiny_budget(v0, v1, v2, tri16, method="sah", **kw):
        return orig(v0, v1, v2, tri16, method=method,
                    budget_bytes=64 * 1024)
    monkeypatch.setattr(wide2, "build_subblock_parts", tiny_budget)

    sc = random_scene(n_tris=1200)
    data = sc.send()
    assert len(data.p2_extra) >= 1, "scene should have split into parts"
    # every global triangle appears exactly once across parts' remaps
    seen = []
    for nr, tr, rm in [(data.p2_node_rows, data.p2_tri_rows, data.p2_remap)
                       ] + list(data.p2_extra):
        tr = np.asarray(tr).reshape(-1, 16)
        rm = np.asarray(rm)
        live = np.any(tr[:, 9:12] != 0, axis=1)  # face != 0
        seen.extend(rm[live].tolist())
    assert sorted(seen) == sorted(set(seen))
    assert len(seen) == 1200

    o, d = random_rays(1024)
    a = raycast_packet(data, o, d, max_leaf_tris=16)
    b = raycast_subblock(data, o, d, interpret=True)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t),
                               rtol=1e-6, atol=1e-6)
    hit = np.asarray(a.t) < 1e29
    assert (np.asarray(a.tri)[hit] == np.asarray(b.tri)[hit]).all()
