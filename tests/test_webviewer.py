"""Web viewer: serves frames over HTTP and drives the camera from posted
input events (browser analogue of the terminal viewer; winit+egui stand-in).
"""

import json
import threading
import urllib.request

import numpy as np

import voidin_tpu as vt
from voidin_tpu.core import mathx
from voidin_tpu.framework.app import App, Example
from voidin_tpu.framework.webviewer import run_web
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
    name = "webdemo"

    def setup_scene(self, app):
        w = app.world
        w.lights.add_point_light([0, 3, 0], 15.0, [1, 1, 1])
        w.instances.add(
            np.asarray(mathx.from_translation([0, 0, -5])),
            vt.mesh.SPHERE_1_MESH, 0,
        )


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.read()


def _post(url, obj, timeout=30):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.read()


def test_web_viewer_serves_frames_and_takes_input():
    app = App(_Demo(), camera=vt.Camera(position=[0, 1, 0]), config=CFG)
    pos0 = np.asarray(app.state.camera.position).copy()
    ready = threading.Event()
    result = {}

    def drive():
        result["frames"] = run_web(
            app, port=0, max_frames=200, fps_cap=1000.0, ready=ready
        )

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    assert ready.wait(60), "server never came up"
    base = f"http://127.0.0.1:{ready.port}"

    try:
        # page + stats + a PNG frame (first frame includes the compile)
        page = _get(base + "/")
        assert b"voidin-tpu viewer" in page
        png = _get(base + "/frame.png", timeout=180)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        stats = json.loads(_get(base + "/stats"))
        assert stats["frame"] >= 1 and len(stats["pos"]) == 3

        # hold W for a few frames -> the camera moved forward
        _post(base + "/input", {"type": "down", "key": "w"})
        f0 = json.loads(_get(base + "/stats"))["frame"]
        while json.loads(_get(base + "/stats"))["frame"] < f0 + 5:
            pass
        _post(base + "/input", {"type": "up", "key": "w"})
        _post(base + "/input", {"type": "look", "dx": 40, "dy": 0})
    finally:
        # esc quits the loop (and never leave the render thread running)
        _post(base + "/input", {"type": "down", "key": "escape"})
        t.join(120)
    assert not t.is_alive()
    assert result["frames"] >= f0 + 5

    pos1 = np.asarray(app.state.camera.position)
    assert np.linalg.norm(pos1 - pos0) > 1e-3, (pos0, pos1)
    assert abs(app.state.camera.yaw) > 1e-3  # drag-look landed
