import os

import numpy as np

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.framework.app import App, AppState, Example, FpsCounter
from voidin_tpu.framework.recorder import Recorder
from voidin_tpu.passes.raster import RasterConfig

CFG = RasterConfig(
    width=128,
    height=64,
    tri_capacity=1 << 12,
    pair_capacity=1 << 13,
    tile_tri_capacity=64,
    interpret=True,
)


class _Demo(Example):
    name = "demo"

    def setup_scene(self, app):
        w = app.world
        w.lights.add_point_light([0, 3, 0], 15.0, [1, 1, 1])
        self.sphere = w.instances.add(
            np.asarray(mathx.from_translation([0, 0, -5])), vt.mesh.SPHERE_1_MESH, 0
        )
        w.instances.add(
            np.asarray(mathx.from_translation([0, -2, -5]) @ mathx.from_scale(20.0)),
            vt.mesh.HORIZONTAL_PLANE_MESH,
            0,
        )
        app.moving_ids.append(self.sphere)

    def update(self, app, state):
        self.updated = getattr(self, "updated", 0) + 1


def test_app_runs_frames():
    demo = _Demo()
    app = App(demo, camera=vt.Camera(position=[0, 1, 0]), config=CFG)
    img = app.step()
    assert img.shape == (64, 128, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert demo.updated == 1
    app.run(frames=2)
    assert demo.updated == 3
    assert app.state.frame_count == 3


def test_recorder_png_fallback(tmp_path):
    rec = Recorder(32, 16, fps=30)
    out = tmp_path / "seq"
    rec.start(str(out))
    for i in range(3):
        rec.push(np.full((16, 32, 3), i / 3, np.float32))
    rec.finish()
    files = sorted(os.listdir(out))
    assert len(files) == 3


def test_recorder_mp4_when_ffmpeg(tmp_path):
    rec = Recorder(32, 16, fps=30)
    if not rec.ffmpeg_available:
        import pytest

        pytest.skip("no ffmpeg")
    path = tmp_path / "clip.mp4"
    rec.start(str(path))
    for i in range(5):
        rec.push(np.zeros((16, 32, 3), np.float32))
    rec.finish()
    assert path.exists() and path.stat().st_size > 0


def test_fps_counter():
    f = FpsCounter()
    import time

    for _ in range(4):
        f.tick()
        time.sleep(0.005)
    assert f.tick() > 0


def test_presets_build():
    from voidin_tpu.framework import presets

    for i, fn in presets.PRESETS.items():
        p = fn(16 / 9)
        assert len(p.world.instances) > 0, i
        assert p.camera.aspect == 16 / 9
