from opengl_raytracer_tpu.models.mesh import Mesh
from opengl_raytracer_tpu.models.rect import Rect
from opengl_raytracer_tpu.models.scene import Scene

__all__ = ["Mesh", "Rect", "Scene"]
