"""Sub-block table density: DP collapse + leaf re-chunking (CPU analysis).

Round-3 measurement that motivated rewriting wide2.build_subblock's
collapse.  The greedy "expand the largest internal slot until 8 slots"
rule stalls once every slot is a leaf; binary leaves can't pair-merge
(siblings always sum over LEAF_TRIS=8 or they'd already be one leaf), so
wide nodes and octets both ran far below capacity on minidragon
(27,542 tris):

  collapse                 wide nodes   children/8   octets   fill/8
  greedy (round 2)             1,624        4.01      4,896    5.63
  greedy + pair-merge          1,610        3.98      4,799    5.74
  greedy + re-chunk            1,572        3.65      4,160    6.62
  DP + re-chunk (shipped)        841        5.52      3,808    7.24

The DP (h[b][s] = fewest wide nodes representing binary subtree b as s
parent slots, min-plus combined over children in post-order) nearly
halves the node count; re-chunking (pool a node's leaf triangles, order
along the longest axis, split into ceil(total/8) balanced chunks with
bboxes recomputed from member triangles) fills octets to 7.24/8.  Table
bytes drop 3.01 -> 2.38 MB.  Hardware effect (pool_sweep.py, 2M-ray
sorted bounce proxy, whole-batch pool): 132.0 -> 104.5 ms; 1080p
4-bounce frame 684.6 -> 567.8 ms with the lane-parallel push.

Run: python experiments/leaffill.py  (CPU; prints the shipped stats)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from opengl_raytracer_tpu.models.scene import Scene
    from opengl_raytracer_tpu.presets import default_objects
    from opengl_raytracer_tpu.ops.wide2 import ORD0, EMPTY_PACKED

    sc = Scene(default_objects("stanford_minidragon"))
    d = sc.send()
    rows = np.asarray(d.p2_node_rows)
    tri = np.asarray(d.p2_tri_rows)
    packed = rows[:, ORD0:ORD0 + 8].astype(np.int64)
    live_node = (packed != EMPTY_PACKED * 8).any(1)
    W = int(live_node.sum())
    occ = (packed[:W] != EMPTY_PACKED * 8).sum(1)
    fills = np.stack(
        [(np.abs(tri[:, j * 16 + 9:j * 16 + 12]).sum(axis=1) > 0)
         for j in range(8)], 1)
    pr = fills.sum(1)
    live_oct = pr > 0
    print(f"wide nodes: {W}  children/8: {occ.mean():.2f}")
    print(f"octets: {int(live_oct.sum())}  fill/8: {pr[live_oct].mean():.2f}")
    print(f"table bytes: {d.p2_node_rows.nbytes + d.p2_tri_rows.nbytes}")


if __name__ == "__main__":
    main()
