"""8-wide BVH: host-side collapse of the binary BVH for the Pallas kernel.

Why: the Pallas traversal pays a fixed per-iteration cost (~250 ns measured
on v5e: while-loop control, scalar loads, the cross-tile any-reduction)
that dwarfs the slab arithmetic.  An 8-ary node amortizes that fixed cost
over 8 child AABB tests per iteration — the children sit on VPU *sublanes*
(the same (8, 16)-in-(8, 128) one-hot-select layout as triangle octets), so
one iteration tests 8 children against all rays with dense vector math.

Collapse rule: from each binary node, repeatedly expand the internal child
whose subtree is largest until 8 slots are filled (or all slots are
leaves).  Each wide-node child is either another wide node or a binary
leaf (an octet-aligned triangle range, shared with the octet leaf tables).

Layout (device arrays built in Scene.send):

* ``pw_tiles (ceil(W/8), 8, 128) f32`` — per child j (sublane j) of wide
  node w (lane group ``(w%8)*16``): lanes 0-5 [bmin.xyz, bmax.xyz], lanes
  6-13 the per-octant far-first push entries packed as exact-integer
  floats (see ORD_LANE0 / PACK_LIMIT below).  Empty child slots get a
  FINITE box of swapped (+big, -big) bounds.  NOTE: the min/max slab form
  canonicalizes swapped bounds, so these boxes PASS the slab test (they
  behave as huge always-hit boxes) and set their bit in the kernel's hit
  bitmask — empty slots are excluded solely by the EMPTY_PACKED sentinel
  gating the push.  The values are finite only because +/-inf would turn
  into NaN through the kernel's arithmetic one-hot select (0 * inf).
* ``pw_entry (W, 8) i32`` — per-child stack entry in slot order (used by
  validation/tests; the kernel reads the ordered packed lanes instead):
  internal child -> its wide index (>= 0); leaf child ->
  ``-first_octet - 1`` (< 0); empty -> INT32_MIN.

Traversal contract (kernel side): stack starts holding entry 0 (the root
wide node); pop an entry, if >= 0 expand (test 8 children, push hit
entries), else decode and intersect the leaf's octets.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from opengl_raytracer_tpu.ops.bvh import BVH

WIDTH = 8
EMPTY_ENTRY = np.int32(-(2**31))


class WideBVH(NamedTuple):
    tiles: np.ndarray  # (ceil(W/8), 8, 128) f32; see lane layout below
    entry: np.ndarray  # (W, 8) i32 (slot order; kept for validation/tests)
    num_nodes: int
    max_depth: int  # of the wide tree
    max_stack: int  # safe stack bound: max_depth * (WIDTH - 1) + 2


# Lane layout of a node's 16-lane group within its (8, 128) tile, per child
# sublane j: lanes 0-2 bmin, 3-5 bmax, 6-13 the per-octant ordered push
# entries (see below), 14-15 pad.
ORD_LANE0 = 6

# Ordered push entries are stored as EXACT-INTEGER float32 values
# (entry * 8 + slot), NOT bitcasts: the kernel's one-hot lane-group select
# lowers to arithmetic blends where 0 * NaN/inf poisons the sum, and values
# below 2^24 are exact in f32.  |entry| must stay under 2^21.
PACK_LIMIT = 1 << 21
EMPTY_PACKED = -(1 << 20)  # decoded entry sentinel for empty slots


def encode_leaf(first_octet: int, count: int) -> int:
    # Only the octet start is needed: leaf padding slots are degenerate
    # (zero-face) triangles the intersector's epsilon test rejects, and a
    # fixed-octet over-read past a short leaf only tests neighboring REAL
    # triangles — harmless for a global nearest-hit query.
    del count
    return -first_octet - 1


def collapse_wide(bvh: BVH, leaf_first_octet: np.ndarray) -> WideBVH:
    """Collapse a binary BVH (ops/bvh.py layout) into the 8-wide layout.

    leaf_first_octet: per-binary-node octet start (only meaningful for
    leaves) — the octet-aligned slot table built by Scene.send.
    """
    N = bvh.num_nodes
    # Reconstruct binary children from the preorder + miss links:
    # internal node i has left = i + 1 and right = miss[left].
    is_leaf = bvh.node_count > 0

    # Subtree sizes (preorder: subtree of i spans [i, skip_i) where skip_i =
    # miss[i] clipped to N).
    span = np.minimum(bvh.node_miss, N) - np.arange(N)

    children: list[list[int]] = []  # wide-node -> list of binary node ids
    wide_of_binary: dict[int, int] = {}

    def make_wide(binary_root: int) -> int:
        """Allocate a wide node whose slots cover binary_root's subtree."""
        slots = [int(binary_root)]
        while len(slots) < WIDTH:
            # expand the internal slot with the largest subtree
            best, best_size = -1, 0
            for k, b in enumerate(slots):
                if not is_leaf[b] and span[b] > best_size:
                    best, best_size = k, int(span[b])
            if best < 0:
                break
            b = slots.pop(best)
            left = b + 1
            right = int(bvh.node_miss[left])
            slots.extend([left, right])
        idx = len(children)
        children.append(slots)
        return idx

    # BFS so wide indices are allocated root-first.
    root = make_wide(0)
    queue = [root]
    depth_of = {root: 0}
    max_depth = 0
    qi = 0
    while qi < len(queue):
        w = queue[qi]
        qi += 1
        for b in children[w]:
            if not is_leaf[b]:
                cw = make_wide(b)
                wide_of_binary[b] = cw
                depth_of[cw] = depth_of[w] + 1
                max_depth = max(max_depth, depth_of[cw])
                queue.append(cw)

    W = len(children)
    Wp = -(-W // 8) * 8
    tiles = np.zeros((Wp // 8, 8, 128), np.float32)
    # Empty slots: FINITE swapped-bounds boxes.  These DO pass the slab
    # test (min/max canonicalization makes them always-hit); empties are
    # excluded solely by the EMPTY_PACKED push sentinel.  Finite (not
    # +/-inf) because the kernel's one-hot lane-group select lowers to an
    # arithmetic blend on the VPU, and 0 * inf = NaN would poison the
    # selected group.
    _FAR = np.float32(1e30)
    for g in range(8):
        tiles[:, :, g * 16:g * 16 + 3] = _FAR
        tiles[:, :, g * 16 + 3:g * 16 + 6] = -_FAR
    entry = np.full((W, 8), EMPTY_ENTRY, np.int32)

    for w, slots in enumerate(children):
        tile, group = w // 8, (w % 8) * 16
        for j, b in enumerate(slots):
            tiles[tile, j, group:group + 3] = bvh.node_min[b]
            tiles[tile, j, group + 3:group + 6] = bvh.node_max[b]
            if is_leaf[b]:
                entry[w, j] = encode_leaf(
                    int(leaf_first_octet[b]), int(bvh.node_count[b])
                )
            else:
                entry[w, j] = wide_of_binary[b]

    # Per-octant far-first push order: a DFS stack pops last-pushed first,
    # so pushing children far-to-near along the ray's dominant direction
    # yields near-first traversal — best_t tightens early and prunes far
    # subtrees.  The renderer's coherence sort makes ray blocks octant-pure,
    # so the kernel picks one order per block with zero per-iteration cost.
    # The ordered (entry, slot) pairs are packed into the tiles' free lanes
    # (ORD_LANE0..+7, one lane per octant, one ordered rank per sublane) as
    # exact-integer floats — no extra arrays, no 128-lane padding waste.
    if W >= PACK_LIMIT // 8:
        raise ValueError(f"wide BVH too large to pack ordered entries ({W})")
    max_octet = int(leaf_first_octet.max()) if len(leaf_first_octet) else 0
    if max_octet >= -EMPTY_PACKED - 1:
        # encode_leaf(-EMPTY_PACKED - 1) would collide with the empty-slot
        # sentinel and the kernel would silently drop that leaf
        raise ValueError(f"leaf octet index {max_octet} collides with the "
                         f"empty-slot sentinel")
    max_stack = (max_depth + 2) * (WIDTH - 1) + 4
    if max_stack > 512:  # pallas_traversal.STACK_SIZE
        raise ValueError(
            f"wide BVH worst-case stack {max_stack} exceeds the kernel's "
            f"512-entry stack (pathologically deep tree)"
        )

    centroids = np.zeros((W, WIDTH, 3), np.float32)
    finite = np.zeros((W, WIDTH), bool)
    for w in range(W):
        tile, group = w // 8, (w % 8) * 16
        lo = tiles[tile, :, group:group + 3]
        hi = tiles[tile, :, group + 3:group + 6]
        centroids[w] = (lo + hi) * 0.5
        finite[w] = lo[:, 0] <= hi[:, 0]

    packed_empty = EMPTY_PACKED * 8
    for o in range(8):
        d = np.array([
            -1.0 if (o >> 2) & 1 else 1.0,
            -1.0 if (o >> 1) & 1 else 1.0,
            -1.0 if o & 1 else 1.0,
        ], np.float32)
        key = centroids @ d  # (W, 8)
        key = np.where(finite, key, np.inf)  # empty slots sorted first
        order = np.argsort(-key, axis=1, kind="stable")  # far first
        ent_o = np.take_along_axis(entry, order, axis=1).astype(np.int64)
        packed = np.where(
            ent_o == np.int64(EMPTY_ENTRY), packed_empty, ent_o * 8 + order
        )
        assert np.abs(packed).max() < (1 << 24)
        for w in range(W):
            tile, group = w // 8, (w % 8) * 16
            # ordered rank i on sublane i, octant o's lane
            tiles[tile, :, group + ORD_LANE0 + o] = packed[w].astype(np.float32)

    return WideBVH(
        tiles=tiles,
        entry=entry,
        num_nodes=W,
        max_depth=max_depth,
        max_stack=(max_depth + 2) * (WIDTH - 1) + 4,
    )


def validate_wide(wide: WideBVH, bvh: BVH) -> None:
    """Every binary leaf must be reachable exactly once via wide entries."""
    is_leaf = bvh.node_count > 0
    seen = []
    stack = [0]
    while stack:
        w = stack.pop()
        for e in wide.entry[w]:
            e = int(e)
            if e == int(EMPTY_ENTRY):
                continue
            if e >= 0:
                stack.append(e)
            else:
                seen.append(e)
    assert len(seen) == int(is_leaf.sum()), (len(seen), int(is_leaf.sum()))
    assert len(set(seen)) == len(seen), "duplicate leaf entries"
