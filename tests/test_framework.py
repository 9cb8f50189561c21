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


def test_app_resize_rerenders():
    """App.resize recreates the frame pipeline at the new resolution and
    invokes Example.resize (app.rs:360-377, lib.rs Example trait)."""

    class _Resizable(_Demo):
        def resize(self, app, width, height):
            self.resized_to = (width, height)

    demo = _Resizable()
    app = App(demo, camera=vt.Camera(position=[0, 1, 0]), config=CFG)
    assert app.step().shape == (64, 128, 3)
    app.resize(64, 32)
    assert demo.resized_to == (64, 32)
    assert app.state.camera.aspect == 2.0
    img = app.step()
    assert img.shape == (32, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_hot_reload_mid_run(tmp_path):
    """Editing a pass module mid-run re-traces the live frame pipeline
    (PipelineArena reload semantics, app/pipeline.rs:253-351), and a user
    post hook registered from a file hot-swaps its behavior."""
    import sys
    import time

    mod_path = tmp_path / "user_tint.py"
    mod_path.write_text("def tint(img):\n    return img\n")
    sys.path.insert(0, str(tmp_path))
    try:
        demo = _Demo()
        app = App(demo, camera=vt.Camera(position=[0, 1, 0]), config=CFG)

        import user_tint

        hook = app.pipelines.register(
            "tint", lambda: user_tint.tint, source=str(mod_path)
        )
        app.post_hooks.append(hook)
        img1 = np.asarray(app.step())

        # Edit the module on disk; the next step's poll() must reload it.
        time.sleep(0.01)
        mod_path.write_text("def tint(img):\n    return img * 0.0\n")
        os.utime(mod_path)
        img2 = np.asarray(app.step())
        assert np.all(img2 == 0.0) and not np.all(img1 == 0.0)

        # Touching a frame source re-traces the frame pipeline itself
        # (keep-last-good covered by test_pipeline_cache_reload_*).
        frame_entry = app.pipelines._entries["frame"]
        before = frame_entry.reload_count
        src = frame_entry.sources[0]
        os.utime(src)
        img3 = np.asarray(app.step())
        assert frame_entry.reload_count == before + 1
        assert np.isfinite(img3).all()
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("user_tint", None)


def test_camera_smooth_rig_converges():
    """Smooth rig: exponential convergence toward the target transform
    (dolly Smooth(1.0, 1.5), camera.rs:113-127) — monotone, no overshoot."""
    cam = vt.Camera(position=[0.0, 0.0, 0.0], yaw=0.0)
    cam.position = np.array([10.0, 0.0, 0.0], np.float32)
    cam.yaw = 90.0
    dists, yaws = [], []
    for _ in range(60):  # 1 s of fixed-timestep updates
        cam.update(1.0 / 60.0)
        dists.append(float(np.linalg.norm(cam.position - cam.final_position)))
        yaws.append(abs(cam.yaw - cam._smoothed_yaw))
    assert all(b < a for a, b in zip(dists, dists[1:]))  # monotone approach
    assert dists[0] < 10.0 and dists[-1] < 0.1  # converged after 1 s
    # rotation smoothness 1.5 > position smoothness 1.0: rotation lags.
    assert yaws[-1] / 90.0 > dists[-1] / 10.0
    assert dists[-1] == float(
        np.linalg.norm(cam.position - cam._smoothed_pos)
    )


def test_box_mesh_per_axis():
    """boxx.rs make_box_mesh: vertices at +/- dim/2 per axis, 24 verts,
    12 tris, outward normals (crates/pools/src/mesh/boxx.rs:5-117)."""
    m = vt.mesh.make_box_mesh(2.0, 4.0, 6.0)
    assert m.vertices.shape == (24, 3) and m.indices.shape == (36,)
    assert np.allclose(np.abs(m.vertices).max(axis=0), [1.0, 2.0, 3.0])
    assert np.allclose(np.abs(m.vertices).min(axis=0), [1.0, 2.0, 3.0])
    # each face's normal points away from the center
    for v, n in zip(m.vertices, m.normals):
        assert np.dot(v, n) > 0.0
    # tangents carry the reference's w = -1 handedness
    assert np.allclose(m.tangents[:, 3], -1.0)


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


def test_recorder_mjpeg_avi_without_ffmpeg(tmp_path):
    """Video paths produce an actual video with NO ffmpeg: the MJPEG-AVI
    writer (io/avi.py). Round-trips the container with an independent
    inline RIFF parse: header counts, idx1 entries, and a JPEG decode of
    an indexed frame must match what was pushed."""
    import struct

    from PIL import Image

    rec = Recorder(32, 16, fps=30)
    path = tmp_path / "clip.avi"  # .avi always selects the MJPEG writer
    rec.start(str(path))
    colors = [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0),
              (1.0, 1.0, 0.0)]
    for c in colors:
        rec.push(np.broadcast_to(np.asarray(c, np.float32), (16, 32, 3)))
    rec.finish()
    data = path.read_bytes()

    # container structure
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    n_frames = struct.unpack("<I", data[48:52])[0]  # avih dwTotalFrames
    assert n_frames == 4

    # find movi + idx1
    movi = data.index(b"movi")
    idx1 = data.index(b"idx1")
    n_idx = struct.unpack("<I", data[idx1 + 4:idx1 + 8])[0] // 16
    assert n_idx == 4

    # decode frame 2 via its index entry (offset counts from 'movi')
    e = idx1 + 8 + 2 * 16
    fourcc, flags, off, size = struct.unpack("<4sIII", data[e:e + 16])
    assert fourcc == b"00dc" and flags & 0x10
    chunk = movi + off
    assert data[chunk:chunk + 4] == b"00dc"
    jpg = data[chunk + 8:chunk + 8 + size]
    img = np.asarray(Image.open(__import__("io").BytesIO(jpg)))
    assert img.shape == (16, 32, 3)
    expect = np.asarray(colors[2]) * 255
    assert np.abs(img.reshape(-1, 3).mean(0) - expect).max() < 12  # JPEG loss


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


def test_terminal_viewer_ansi_frame():
    """The terminal viewer's half-block encoder: right cell grid, 24-bit
    SGR codes, top/bottom pixel split."""
    from voidin_tpu.framework.viewer import ansi_frame

    img = np.zeros((4, 6, 3), np.uint8)
    img[:2] = [255, 0, 0]   # top half red
    img[2:] = [0, 0, 255]   # bottom half blue
    s = ansi_frame(img, cols=3, rows=2)
    lines = s.split("\n")
    assert len(lines) == 2
    assert lines[0].count("▀") == 3
    # row 0 covers pixel rows 0-1: both red
    assert "\x1b[38;2;255;0;0m" in lines[0] and "48;2;255;0;0m" in lines[0]
    # row 1 covers pixel rows 2-3: both blue
    assert "38;2;0;0;255m" in lines[1]
    assert s.endswith("\x1b[0m")


def test_terminal_viewer_headless_frames():
    """run_terminal drives App.step() even without a tty (frames render to
    the provided stream; input is simply absent)."""
    import io

    from voidin_tpu.framework.app import App
    from voidin_tpu.framework.viewer import run_terminal
    from voidin_tpu.passes.raster import RasterConfig

    cfg = RasterConfig(width=96, height=64, tri_capacity=1 << 10,
                       pair_capacity=1 << 12, interpret=True)
    app = App(_Demo(), camera=vt.Camera(position=[0, 1, 4]), config=cfg)
    buf = io.StringIO()
    n = run_terminal(app, max_frames=2, fps_cap=1000.0, out=buf)
    assert n == 2
    s = buf.getvalue()
    assert "▀" in s and "fps" in s and "\x1b[38;2;" in s
