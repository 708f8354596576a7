"""Multi-chip rendering: SPMD over a jax.sharding.Mesh.

The reference is a single-process, single-GPU program (SURVEY.md section 2);
its only parallelism is the implicit SIMT fan-out of fragments.  The TPU
framework scales the same workload across chips with two mesh axes:

* ``dp`` (data/pixel parallel): the pixel grid and the accumulation buffer
  are sharded by image rows.  Scene arrays are small (a few MB) and
  replicated, so per-device rendering needs no communication at all.
* ``sp`` (sample/frame parallel): each device along ``sp`` renders a
  *different progressive frame number* (frame_count + sp_index) and the
  results are averaged with a ``psum`` over ICI.  Because the reference's
  per-pixel RNG stream is seeded by (x, y, frameNumber)
  (fragment.glsl:390), frame-parallelism preserves the exact per-frame
  sample streams — S chips converge the accumulation S frames per step with
  bit-identical samples to S sequential steps.

The step below is the framework's "training step" analog: it advances the
progressive accumulation state ``(accum, frame_count) -> accum'`` under
``shard_map`` and jits end-to-end, with all collectives riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opengl_raytracer_tpu.renderer import make_raycast_fn, render_pixels
from opengl_raytracer_tpu.utils.config import RenderConfig


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              sp: int | None = None, devices=None) -> Mesh:
    """Build a (dp, sp) device mesh. Defaults: sp = 2 when the device count
    is even and > 1, else 1; dp = remaining."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} "
                f"available on platform {devices[0].platform}"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if sp is None:
        sp = 2 if (dp is None and n % 2 == 0 and n > 1) else 1
    if dp is None:
        if n % sp:
            raise ValueError(f"sp={sp} does not divide device count {n}")
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp = {dp}*{sp} != {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def sharded_accum_step(scene, camera, accum, frame_count, sky_brightness,
                       jitter_amount, lambertian, *, config: RenderConfig,
                       traversal: str, mesh: Mesh):
    """One multi-chip progressive step: folds ``sp`` new frames into the
    row-sharded accumulation buffer.  accum: (H, W, 3) sharded on rows."""
    H, W = config.height, config.width
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    if H % dp:
        raise ValueError(f"dp={dp} must divide height {H}")

    local_h = H // dp
    if traversal == "packet" and (local_h * W) % 128:
        traversal = "bvh"  # packet path needs whole 128-ray packets
    raycast_fn = make_raycast_fn(scene, config, traversal)

    def local_step(scene, camera, accum_blk, frame_count, sky, jit_amt, lam):
        dp_idx = jax.lax.axis_index("dp")
        sp_idx = jax.lax.axis_index("sp")
        frame = frame_count + sp_idx

        # This device's rows (top-origin) -> GL pixel coords.
        row0 = dp_idx * local_h
        rows = row0 + jnp.arange(local_h, dtype=jnp.int32)
        py_rows = (H - 1) - rows  # GL py, descending
        px = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (local_h, W))
        py = jnp.broadcast_to(py_rows[:, None], (local_h, W))

        colors = render_pixels(
            scene, config, camera, frame, sky, jit_amt, lam,
            px.reshape(-1), py.reshape(-1), raycast_fn,
            reorder=traversal in ("packet", "pallas", "pallas2"),
        ).reshape(local_h, W, 3)

        summed = jax.lax.psum(colors, "sp")
        fc = frame_count.astype(jnp.float32)
        return (accum_blk * fc + summed) / (fc + sp)

    # check_vma=False: the traversal while_loop initializes its carries from
    # constants, which JAX's varying-axis tracking would otherwise reject.
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P("dp"), P(), P(), P(), P()),
        out_specs=P("dp"),
        check_vma=False,
    )
    return fn(scene, camera, accum, frame_count, sky_brightness,
              jitter_amount, lambertian)


class ShardedRenderer:
    """Progressive renderer over a device mesh.

    Each ``step`` advances the accumulation by ``sp`` frames; ``frames_per_step``
    reflects that in the host-side frame counter.
    """

    def __init__(self, scene, config: RenderConfig, mesh: Mesh):
        from opengl_raytracer_tpu.models.scene import Scene
        from opengl_raytracer_tpu.renderer import _BRUTE_MAX_TRIS

        scene_data = scene.send() if isinstance(scene, Scene) else scene
        from opengl_raytracer_tpu.renderer import resolve_leaf_bound

        config = resolve_leaf_bound(scene_data, config)
        self.config = config
        self.mesh = mesh
        if config.tile_size != 1:
            raise ValueError("multi-chip rendering uses tile_size=1 "
                             "(rows are sharded instead of tiled)")
        traversal = config.traversal
        if traversal == "auto":
            traversal = "brute" if scene_data.num_tris <= _BRUTE_MAX_TRIS else "packet"
        self.traversal = traversal
        self.frames_per_step = mesh.shape["sp"]

        repl = NamedSharding(mesh, P())
        self.scene = jax.device_put(scene_data, repl)
        self._accum_sharding = NamedSharding(mesh, P("dp"))
        self._step = jax.jit(
            partial(sharded_accum_step, config=config, traversal=traversal,
                    mesh=mesh),
            donate_argnums=(2,),
        )

    def init_accum(self):
        return jax.device_put(
            jnp.zeros((self.config.height, self.config.width, 3), jnp.float32),
            self._accum_sharding,
        )

    def step(self, camera, accum, frame_count: int,
             lambertian: bool | None = None):
        lam = self.config.lambertian if lambertian is None else lambertian
        accum = self._step(
            self.scene, camera, accum,
            jnp.int32(frame_count),
            jnp.float32(self.config.sky_brightness),
            jnp.float32(self.config.jitter_amount),
            jnp.asarray(lam, bool),
        )
        return accum, frame_count + self.frames_per_step
