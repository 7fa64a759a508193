"""Streaming visualization — the RViz-profile analog (reference
`rviz/mono_vo.rviz` displays Image/PointCloud2/Path/Odometry/TF).

Two surfaces, no external deps beyond matplotlib (optional):

  - `render_topdown(...)`: one-shot SVG/PNG snapshot of the trajectory
    (Path), the landmark cloud (PointCloud2), and the current pose axes
    (Odometry/TF), in the CV->viz convention the reference's RViz profile
    uses (x-z ground plane for a forward-driving camera).
  - `VizServer`: a background HTTP server streaming the same snapshot as a
    self-refreshing page — point a browser at it while the engine runs,
    like `ros2 launch ... rviz:=true` (launch/mono_vo.launch.py).

Both read the engine objects non-invasively (trajectory list + map state
host copies), so they work with MonoVO, DeviceMonoVO, and each lane of
BatchedDeviceMonoVO.
"""

from __future__ import annotations

import io
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _fig_topdown(trajectory, landmarks=None, title="mono_vo_tpu"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    if landmarks is not None and len(landmarks):
        lm = np.asarray(landmarks)
        ax.scatter(lm[:, 0], lm[:, 2], s=1.0, c="#9ab", alpha=0.5,
                   label=f"landmarks ({len(lm)})")
    if trajectory:
        pos = np.stack([T[:3, 3] for _, T in trajectory])
        ax.plot(pos[:, 0], pos[:, 2], "-", lw=1.5, c="#06c", label="path")
        T = trajectory[-1][1]
        o = T[:3, 3]
        fwd = T[:3, 2]   # camera z = forward
        ax.annotate("", xy=(o[0] + 1.2 * fwd[0], o[2] + 1.2 * fwd[2]),
                    xytext=(o[0], o[2]),
                    arrowprops=dict(arrowstyle="->", color="#c30", lw=2))
        ax.plot([o[0]], [o[2]], "o", c="#c30", ms=6, label="pose")
    ax.set_xlabel("x [map units]")
    ax.set_ylabel("z [map units]")
    ax.set_title(title)
    ax.axis("equal")
    ax.legend(loc="upper left", fontsize=8)
    fig.tight_layout()
    return fig


def render_topdown(trajectory, landmarks=None, path: str = "trajectory.png",
                   title: str = "mono_vo_tpu") -> str:
    """Write a top-down snapshot (format from the file extension)."""
    fig = _fig_topdown(trajectory, landmarks, title)
    fig.savefig(path, dpi=110)
    import matplotlib.pyplot as plt
    plt.close(fig)
    return path


def snapshot_png_bytes(trajectory, landmarks=None,
                       title: str = "mono_vo_tpu") -> bytes:
    fig = _fig_topdown(trajectory, landmarks, title)
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=100)
    import matplotlib.pyplot as plt
    plt.close(fig)
    return buf.getvalue()


_PAGE = b"""<!doctype html><title>mono_vo_tpu</title>
<body style="margin:0;background:#111;color:#eee;font-family:monospace">
<div style="padding:6px">mono_vo_tpu &mdash; live top-down view
(auto-refresh)</div>
<img id="v" src="/snapshot.png" style="max-width:100%">
<script>setInterval(()=>{document.getElementById('v').src=
'/snapshot.png?t='+Date.now()},1000)</script></body>"""


class VizServer:
    """Background HTTP server streaming the engine's live top-down view.

    Usage:
        viz = VizServer(lambda: (vo.trajectory, vo.landmarks()), port=8765)
        viz.start()
        ... feed frames ...
        viz.stop()
    """

    def __init__(self, state_fn, port: int = 8765):
        self._state_fn = state_fn
        self.port = port
        self._httpd = None
        self._thread = None

    def start(self) -> None:
        state_fn = self._state_fn

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/snapshot.png"):
                    try:
                        traj, lm = state_fn()
                        png = snapshot_png_bytes(traj, lm)
                    except Exception as e:  # engine mid-update: serve a 503
                        self.send_response(503)
                        self.end_headers()
                        self.wfile.write(str(e).encode())
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(png)
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd = None
            self._thread = None
