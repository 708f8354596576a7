"""Checkpoint / resume for progressive renders.

The reference has no checkpointing; its closest analog is that the
accumulated frame + frame counter IS a resumable state in spirit
(SURVEY.md section 5).  Here that state is explicit and serializable:
``(accum, frame_count, tile cursor, camera pose)`` round-trips through a
single ``.npz``, so a long progressive render can stop and resume exactly
— the per-pixel RNG streams depend only on (x, y, frameNumber)
(fragment.glsl:390), so a resumed render is bit-identical to an
uninterrupted one.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opengl_raytracer_tpu.renderer import RenderState


def save_checkpoint(path: str, state: RenderState, cam_pos=None, cam_dir=None) -> None:
    np.savez_compressed(
        path,
        accum=np.asarray(state.accum),
        frame_count=state.frame_count,
        tile_x=state.tile_x,
        tile_y=state.tile_y,
        total_frames=state.total_frames,
        cam_pos=np.asarray(cam_pos) if cam_pos is not None else np.zeros(3),
        cam_dir=np.asarray(cam_dir) if cam_dir is not None else np.zeros(2),
        has_camera=cam_pos is not None,
    )


def load_checkpoint(path: str):
    """Returns (RenderState, cam_pos | None, cam_dir | None)."""
    z = np.load(path)
    state = RenderState(
        accum=jnp.asarray(z["accum"]),
        frame_count=int(z["frame_count"]),
        tile_x=int(z["tile_x"]),
        tile_y=int(z["tile_y"]),
        total_frames=int(z["total_frames"]),
    )
    if bool(z["has_camera"]):
        return state, z["cam_pos"], z["cam_dir"]
    return state, None, None
