"""Skeleton sequence visualization.

Counterpart of the reference's ``plot_skeleton`` + ffmpeg conversion
(src/data/util.py:183-253): render each frame's joints + bones with
matplotlib and assemble a video (mp4 via ffmpeg when available, else an
animated GIF via PillowWriter, else a directory of PNGs).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

from stgcn_tpu.graph.skeleton import EDGES


def render_frame(ax, frame: np.ndarray) -> None:
    """Draw one (V, 2) skeleton onto a matplotlib axis (y-axis flipped to
    screen coordinates, missing joints at (0,0) skipped — reference
    behavior, util.py:230-245)."""
    x, y = frame[:, 0], frame[:, 1]
    ax.scatter(x, -y, s=40)
    for a, b in EDGES:
        if (x[a], y[a]) == (0, 0) or (x[b], y[b]) == (0, 0):
            continue
        ax.plot([x[a], x[b]], [-y[a], -y[b]], "g")
    ax.set_aspect("equal", adjustable="box")
    ax.axis("off")


def render_sequence_frames(seq: np.ndarray, out_dir: str,
                           figsize=(3, 8)) -> list[str]:
    """Write one PNG per frame; returns the file list."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, frame in enumerate(np.asarray(seq)):
        fig, ax = plt.subplots(1, figsize=figsize)
        render_frame(ax, frame)
        p = os.path.join(out_dir, f"{i}.png")
        fig.savefig(p, bbox_inches="tight")
        plt.close(fig)
        paths.append(p)
    return paths


def save_skeleton_video(seq: np.ndarray, out_path: str, fps: int = 30) -> str:
    """Render a (T, V, >=2) sequence to video.

    Prefers ffmpeg (like the reference's _convert_images_to_video,
    util.py:183-203); falls back to an animated GIF, then to a PNG
    directory.  Returns the path actually written.
    """
    seq = np.asarray(seq)[:, :, :2]
    if shutil.which("ffmpeg"):
        with tempfile.TemporaryDirectory() as tmp:
            render_sequence_frames(seq, tmp)
            cmd = ["ffmpeg", "-y", "-framerate", str(fps),
                   "-i", os.path.join(tmp, "%d.png"),
                   "-c:v", "libx264", "-pix_fmt", "yuv420p",
                   "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2", out_path]
            subprocess.run(cmd, check=True, capture_output=True)
        return out_path

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.animation as animation
        import matplotlib.pyplot as plt

        gif_path = os.path.splitext(out_path)[0] + ".gif"
        fig, ax = plt.subplots(1, figsize=(3, 8))

        def update(i):
            ax.clear()
            render_frame(ax, seq[i])

        ani = animation.FuncAnimation(fig, update, frames=len(seq))
        ani.save(gif_path, writer=animation.PillowWriter(fps=fps))
        plt.close(fig)
        return gif_path
    except Exception:  # noqa: BLE001 - last-resort PNG directory
        frame_dir = os.path.splitext(out_path)[0] + "_frames"
        render_sequence_frames(seq, frame_dir)
        return frame_dir
