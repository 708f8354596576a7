"""Interactive-loop smoke test under SDL's dummy video driver: drives
App._main_interactive through a few frames and the quit path without a
display (reference loop semantics, main.py:273-430)."""

import os

import numpy as np
import pytest

pygame = pytest.importorskip("pygame")


def test_interactive_loop_runs_and_quits(monkeypatch, tmp_path):
    monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")

    from opengl_raytracer_tpu.app import App
    from opengl_raytracer_tpu.models.rect import Rect
    from opengl_raytracer_tpu.models.scene import Scene

    scene = Scene([
        Rect([4, 4, 0.1], [0, 0, -2], [0, 0, 0], color=[0.8, 0.2, 0.2],
             roughness=1),
        Rect([2, 2, 0.1], [0, 1.9, 0], [90, 0, 0], color=[0, 0, 0],
             emission_color=[1, 1, 1], emission=1.0, roughness=1),
    ])
    app = App(window_size=(16, 16), screen_size=(64, 64), bounces=1,
              scene=scene, headless=False, run=False)

    frames = {"n": 0}
    real_get = pygame.event.get

    def fake_get():
        frames["n"] += 1
        if frames["n"] == 2:
            # exercise a keydown branch (camera info print)
            return [pygame.event.Event(pygame.KEYDOWN, key=pygame.K_c)]
        if frames["n"] >= 4:
            return [pygame.event.Event(pygame.QUIT)]
        return real_get()

    monkeypatch.setattr(pygame.event, "get", fake_get)
    app._main_interactive()

    assert frames["n"] >= 4
    assert app.state.frame_count >= 3
    img = app.image()
    assert img.shape == (16, 16, 3) and np.isfinite(img).all()
