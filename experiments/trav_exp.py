"""Experiment harness: time raycast variants on minidragon primary rays."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from functools import partial
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import make_camera, pixel_uv, ray_dirs
from opengl_raytracer_tpu.ops.intersect import BIG, EPS, Nearest, slab_test
from opengl_raytracer_tpu.ops.traversal import raycast_packet
from opengl_raytracer_tpu.presets import default_objects, DEFAULT_CAM_POS, DEFAULT_CAM_DIR

W, H = 512, 288  # 147,456 rays = 1152 packets


def primary_rays(W, H, cam):
    px = jnp.arange(W * H, dtype=jnp.int32) % W
    py = jnp.arange(W * H, dtype=jnp.int32) // W
    # block order 8x16
    pxg = px.reshape(H, W); pyg = py.reshape(H, W)
    def blk(a):
        return a.reshape(H // 8, 8, W // 16, 16).transpose(0, 2, 1, 3).reshape(-1)
    px, py = blk(pxg), blk(pyg)
    u, v = pixel_uv(px, py, W, H)
    d = ray_dirs(cam, u, v, W, H)
    o = jnp.broadcast_to(cam.pos[None, :], d.shape)
    return o, d


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def raycast_packet_inline(scene, origin, direction, active=None,
                          max_leaf_tris=8, packet=128):
    """Single-phase: every iteration does slab + masked leaf MT."""
    R = origin.shape[0]
    P = R // packet
    N = scene.node_miss.shape[0]
    o = origin.reshape(P, packet, 3)
    d = direction.reshape(P, packet, 3)
    inv_d = 1.0 / d

    near = Nearest(
        t=jnp.full((P, packet), BIG, jnp.float32),
        tri=jnp.zeros((P, packet), jnp.int32),
        u=jnp.zeros((P, packet), jnp.float32),
        v=jnp.zeros((P, packet), jnp.float32),
    )
    node0 = jnp.zeros((P,), jnp.int32)

    def cond(s):
        return jnp.any(s[0] < N)

    def body(s):
        node, near, it = s
        moving = node < N
        ni = jnp.minimum(node, N - 1)
        tn = slab_test(o, inv_d, scene.node_min[ni][:, None, :],
                       scene.node_max[ni][:, None, :])
        ray_hit = (tn >= 0.0) & (tn <= near.t)
        any_hit = ray_hit.any(axis=1) & moving
        count = scene.node_count[ni]
        first = scene.node_first[ni]
        is_leaf = count > 0
        leaf_now = any_hit & is_leaf

        for l in range(max_leaf_tris):
            slot_ok = leaf_now & (l < count)
            tri = jnp.where(slot_ok, first + l, 0)
            v0 = scene.v0[tri][:, None, :]
            e1 = scene.e1[tri][:, None, :]
            e2 = scene.e2[tri][:, None, :]
            face = scene.face[tri][:, None, :]
            det = _dot(d, face)
            inv_det = 1.0 / det
            vro = o - v0
            t = -_dot(vro, face) * inv_det
            perp = jnp.cross(vro, d)
            uu = -_dot(e2, perp) * inv_det
            vv = _dot(e1, perp) * inv_det
            valid = ((jnp.abs(det) >= EPS) & (t > EPS) & (uu >= 0.0)
                     & (vv >= 0.0) & ((uu + vv) <= 1.0))
            upd = slot_ok[:, None] & valid & (t < near.t)
            near = Nearest(
                t=jnp.where(upd, t, near.t),
                tri=jnp.where(upd, jnp.broadcast_to(tri[:, None], t.shape), near.tri),
                u=jnp.where(upd, uu, near.u),
                v=jnp.where(upd, vv, near.v),
            )

        nxt = jnp.where(any_hit & ~is_leaf, node + 1, scene.node_miss[ni])
        node = jnp.where(moving, nxt, node)
        return node, near, it + 1

    node, near, iters = jax.lax.while_loop(cond, body, (node0, near, jnp.int32(0)))
    return near, iters


def run(tag, fn, reps=4):
    out = fn()
    jax.block_until_ready(out)
    t_arr = out[0].t if isinstance(out, tuple) else out.t
    _ = float(jnp.sum(t_arr == t_arr).astype(jnp.float32))
    best = 1e9
    s = 0.0
    for _i in range(reps):
        t0 = time.time()
        out = fn()
        t_arr = out[0].t if isinstance(out, tuple) else out.t
        s = float(jnp.sum(jnp.where(t_arr < 1e29, t_arr, 0.0)))
        best = min(best, time.time() - t0)
    it = int(out[1]) if isinstance(out, tuple) else -1
    print(f"{tag}: {best*1000:.1f} ms, iters={it}, checksum={s:.1f}", flush=True)
    return best


if __name__ == "__main__":
    cam = make_camera(DEFAULT_CAM_POS, DEFAULT_CAM_DIR)
    o, d = primary_rays(W, H, cam)
    for leaf in [8, 16, 32]:
        sc = Scene(default_objects('stanford_minidragon'), max_leaf_tris=leaf)
        data = sc.send()
        run(f"two-phase leaf={leaf}",
            jax.jit(lambda data=data, leaf=leaf: (raycast_packet(data, o, d, max_leaf_tris=leaf), 0)))
        run(f"inline    leaf={leaf}",
            jax.jit(lambda data=data, leaf=leaf: raycast_packet_inline(data, o, d, max_leaf_tris=leaf)))
