"""TPU-native progressive Monte-Carlo path tracer (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of ``pirosow/openGL_raytracer``
(reference layout documented in SURVEY.md): OBJ loading, a Mesh/Rect/Scene
scene-graph with CPU world-space baking, median-split BVH acceleration, and a
per-pixel path-tracing kernel (angle-linear camera, Möller–Trumbore triangle
tests, slab AABB tests, diffuse/specular scatter, emissive lights, constant
sky, progressive accumulation, tile scheduling) — redesigned TPU-first as
jit-compiled vectorized kernels over flat ray tensors instead of divergent
per-fragment shader programs.

Public API mirrors the reference's surface (reference: main.py:16,
object.py:8, object.py:241, scene.py:9) while the execution model is pure
functional JAX.
"""

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: first 1080p compiles run 20-75 s
    through the remote compiler; caching them makes every later process
    start warm.  Off with OGLRT_NO_COMPILE_CACHE=1; dir override via
    OGLRT_COMPILE_CACHE_DIR or JAX_COMPILATION_CACHE_DIR."""
    if _os.environ.get("OGLRT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = (
            _os.environ.get("OGLRT_COMPILE_CACHE_DIR")
            or _os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _os.path.expanduser("~/.cache/oglrt_jax_cache")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that takes noticeable compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from opengl_raytracer_tpu.utils.config import RenderConfig
from opengl_raytracer_tpu.models.mesh import Mesh
from opengl_raytracer_tpu.models.rect import Rect
from opengl_raytracer_tpu.models.scene import Scene
from opengl_raytracer_tpu.ops.camera import Camera, camera_basis
from opengl_raytracer_tpu.renderer import Renderer, RenderState

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "Mesh",
    "Rect",
    "Scene",
    "Camera",
    "camera_basis",
    "Renderer",
    "RenderState",
]
