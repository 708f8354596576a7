"""Wide-BVH collapse invariants: full leaf coverage, no duplicates, stack
bound sanity, box correctness of child slots."""

import numpy as np
import pytest

from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.models.trisoup import Triangles
from opengl_raytracer_tpu.ops.bvh import build_bvh_numpy
from opengl_raytracer_tpu.ops.wide_bvh import (
    EMPTY_ENTRY,
    WIDTH,
    collapse_wide,
    validate_wide,
)


def random_tris(n, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-10, 10, size=(n, 1, 3))
    tri = (base + r.uniform(-0.5, 0.5, size=(n, 3, 3))).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def make_wide(n, leaf=16, seed=0):
    v0, v1, v2 = random_tris(n, seed)
    bvh = build_bvh_numpy(v0, v1, v2, max_leaf_tris=leaf)
    # octet starts: like Scene.send builds them
    leaf_ids = np.nonzero(bvh.node_count > 0)[0]
    counts = bvh.node_count[leaf_ids].astype(np.int64)
    aligned = -(-counts // 8) * 8
    offsets = np.concatenate(([0], np.cumsum(aligned)))
    first_octet = np.zeros(bvh.num_nodes, np.int32)
    first_octet[leaf_ids] = (offsets[:-1] // 8).astype(np.int32)
    return bvh, collapse_wide(bvh, first_octet)


@pytest.mark.parametrize("n", [1, 7, 64, 1000])
def test_leaf_coverage(n):
    bvh, wide = make_wide(n)
    validate_wide(wide, bvh)


def test_entries_and_bounds():
    bvh, wide = make_wide(500, leaf=8)
    W = wide.entry.shape[0]
    for w in range(W):
        tile, group = w // 8, (w % 8) * 16
        for j in range(WIDTH):
            e = int(wide.entry[w, j])
            lo = wide.tiles[tile, j, group:group + 3]
            hi = wide.tiles[tile, j, group + 3:group + 6]
            if e == int(EMPTY_ENTRY):
                # finite inverted box (see collapse_wide: inf would become
                # NaN through the kernel's arithmetic one-hot select)
                assert (lo > hi).all() and (lo >= 1e29).all()
            else:
                assert (lo <= hi).all()
                if e >= 0:
                    assert e < W


def test_max_stack_bound_holds():
    # Simulate worst-case DFS stack growth over the wide tree.
    bvh, wide = make_wide(2000, leaf=8, seed=3)
    best = 0
    stack = [0]
    depth = {0: 0}
    sp_max = [1]

    def walk():
        nonlocal best
        sim = [0]
        max_sp = 1
        while sim:
            e = sim.pop()
            if e < 0:
                continue
            for j in range(WIDTH):
                c = int(wide.entry[e, j])
                if c != int(EMPTY_ENTRY):
                    sim.append(c)
            max_sp = max(max_sp, len(sim))
        best = max_sp

    walk()
    assert best <= wide.max_stack


def test_scene_builds_wide_arrays():
    v0, v1, v2 = random_tris(300, seed=5)
    tri = np.stack([v0, v1, v2], axis=1)
    data = Scene([Triangles(tri, color=(1, 1, 1))]).send()
    assert data.pw_tiles.shape[1:] == (8, 128)
    assert data.pw_entry.shape[1] == 8
    assert data.pl_tri_tiles.shape[1:] == (8, 128)
