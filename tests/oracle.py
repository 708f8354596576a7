"""Scalar/NumPy oracle: a direct, independent transcription of the
reference shader's per-pixel math (fragment.glsl), used to cross-check the
vectorized JAX renderer.  Per-ray Python loops, per-triangle NumPy
vectorization — slow, only for tiny images.

This deliberately mirrors the GLSL control flow (early breaks, sequential
RNG, brute-force nearest-triangle search) rather than the JAX structure, so
it exercises different code paths than the production kernels.
"""

from __future__ import annotations

import math

import numpy as np

MASK = 0xFFFFFFFF
SKY = np.array([0.1, 0.6, 0.92], dtype=np.float32)


def rand(state: int) -> tuple[int, float]:
    """fragment.glsl:206-218 on Python ints (mod 2^32)."""
    state = (state * 747796405 + 2891336453) & MASK
    t = state >> (((state >> 28) + 4) & 31)
    result = ((t ^ state) * 277803737) & MASK
    result = ((result >> 22) ^ result) & MASK
    value = np.float32(result) / np.float32(4294967295.0) * np.float32(2) - np.float32(1)
    return state, float(value)


def seed_for(px: int, py: int, frame: int) -> int:
    return ((px * 1973) ^ (py * 9277) ^ (frame * 1664525)) & MASK


def normalize(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v * 0.0


class OracleScene:
    """Brute-force scene: (T,3) float32 arrays, original triangle order."""

    def __init__(self, v0, v1, v2, n0, n1, n2, color, emission_color, emission, roughness):
        self.v0, self.v1, self.v2 = v0, v1, v2
        self.n0, self.n1, self.n2 = n0, n1, n2
        self.color = color
        self.emission_color = emission_color
        self.emission = emission
        self.roughness = roughness
        self.e1 = v1 - v0
        self.e2 = v2 - v0
        self.face = np.cross(self.e1, self.e2)

    @classmethod
    def from_scene(cls, scene) -> "OracleScene":
        return cls(
            scene.v0, scene.v1, scene.v2,
            scene.n0, scene.n1, scene.n2,
            scene.color, scene.emission_color, scene.emission, scene.roughness,
        )


def raycast(sc: OracleScene, origin, direction):
    """Nearest hit over all triangles (vectorized over T), GLSL rules."""
    EPS = 1e-6
    det = sc.face @ direction
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        vro = origin[None, :] - sc.v0
        t = -np.sum(vro * sc.face, axis=1) * inv
        perp = np.cross(vro, direction[None, :])
        u = -np.sum(sc.e2 * perp, axis=1) * inv
        v = np.sum(sc.e1 * perp, axis=1) * inv
    ok = (np.abs(det) >= EPS) & (t > EPS) & (u >= 0) & (v >= 0) & (u + v <= 1)
    if not ok.any():
        return None
    ts = np.where(ok, t, np.inf)
    i = int(np.argmin(ts))
    w = 1.0 - u[i] - v[i]
    n = sc.n0[i] * w + sc.n1[i] * u[i] + sc.n2[i] * v[i]
    ln = np.linalg.norm(n)
    n = n / ln if ln > 1e-20 else normalize(sc.face[i])
    if np.dot(direction, n) > 0:
        n = -n
    return {
        "t": float(ts[i]),
        "point": origin + direction * ts[i],
        "normal": n,
        "color": sc.color[i],
        "emission": float(sc.emission[i]),
        "emission_color": sc.emission_color[i],
        "roughness": float(sc.roughness[i]),
    }


def raytrace(sc, origin, direction, seed, n_bounces, lambertian, sky_brightness):
    incoming = np.zeros(3, dtype=np.float64)
    ray_color = np.ones(3, dtype=np.float64)
    for _ in range(n_bounces):
        hit = raycast(sc, origin, direction)
        if hit is None:
            incoming += SKY * sky_brightness
            break
        seed, r0 = rand(seed)
        seed, r1 = rand(seed)
        seed, r2 = rand(seed)
        xi = np.array([r0, r1, r2])
        if lambertian:
            diffuse = normalize(hit["normal"] + xi)
        else:
            if np.dot(xi, hit["normal"]) < 0:
                xi = -xi
            diffuse = normalize(xi)
        specular = direction - 2 * np.dot(direction, hit["normal"]) * hit["normal"]
        t = 1.0 - hit["roughness"]
        new_dir = normalize(normalize(diffuse) * (1 - t) + normalize(specular) * t)

        emitted = hit["emission_color"] * hit["emission"]
        if lambertian:
            emitted = emitted * 2
        incoming += emitted * ray_color
        ray_color = ray_color * hit["color"]
        origin = hit["point"] + hit["normal"] * 1e-4
        direction = new_dir
        if hit["emission"] > 0:
            break
    return incoming, seed


def render(sc: OracleScene, width, height, cam_pos, cam_right, cam_up, cam_forward,
           bounces, rays_per_pixel=1, jitter=0.001, lambertian=True,
           sky_brightness=1.0, frame_number=0, aspect=None):
    """Render one frame, top row first.  `bounces` is the user-facing count;
    the loop runs bounces + 1 like the reference (main.py:186).  `aspect`
    is the DISPLAY aspect (reference main.py:137); None = width/height."""
    fov = math.radians(90.0)
    if aspect is None:
        aspect = width / height
    dir_start = np.array([-fov / 2 * aspect, -fov / 2])
    step = np.array([fov * aspect, fov])

    img = np.zeros((height, width, 3), dtype=np.float64)
    for py in range(height):
        for px in range(width):
            seed = seed_for(px, py, frame_number)
            for _ in range(3):
                seed, _ = rand(seed)
            u = (px + 0.5) / width
            v = (py + 0.5) / height
            d = (cam_right * (dir_start[0] + u * step[0])
                 + cam_up * (dir_start[1] + v * step[1]) + cam_forward)
            d = normalize(d)
            seed, j1 = rand(seed)
            seed, j2 = rand(seed)
            d = normalize(d + (cam_right * j1 + cam_up * j2) * jitter)

            color = np.zeros(3)
            for _ in range(rays_per_pixel):
                c, seed = raytrace(sc, cam_pos.copy(), d.copy(), seed,
                                   bounces + 1, lambertian, sky_brightness)
                color += c
            img[height - 1 - py, px] = color / rays_per_pixel
    return img.astype(np.float32)
