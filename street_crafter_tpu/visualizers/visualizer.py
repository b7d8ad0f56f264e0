"""Render-output visualization: per-frame pngs + videos per stream.

Analog of visualizers/{base_visualizer,street_gaussian_visualizer}.py:
streams (rgb / bkgd / obj / acc / depth / diff / gt) are collected per frame
and written as pngs and one video per stream (summarize,
street_gaussian_visualizer.py:195-204). Multi-camera frames are concatenated
side by side (save_video_from_frames :152-193). mp4 when imageio-ffmpeg is
available, GIF fallback otherwise.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def depth_colormap(depth: np.ndarray, near: float | None = None,
                   far: float | None = None) -> np.ndarray:
    """Turbo-like depth visualization (img_utils.visualize_depth_numpy
    analog) without matplotlib: normalized inverse depth -> 3-channel ramp."""
    d = np.asarray(depth, np.float32)
    valid = d > 0
    if near is None:
        near = float(d[valid].min()) if valid.any() else 0.0
    if far is None:
        far = float(np.percentile(d[valid], 99.0)) if valid.any() else 1.0
    x = np.clip((d - near) / max(far - near, 1e-6), 0.0, 1.0)
    # simple blue->green->red ramp
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    img = np.stack([r, g, b], -1)
    img[~valid] = 0.0
    return to_uint8(img)


def save_image(path: str, img: np.ndarray) -> None:
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, to_uint8(img))


def save_video(path: str, frames: list[np.ndarray], fps: int = 10) -> str:
    """Write an mp4 when ffmpeg is available, else a GIF next to it."""
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames8 = [to_uint8(f) for f in frames]
    try:
        import imageio_ffmpeg  # noqa: F401
        imageio.mimsave(path, frames8, fps=fps)
        return path
    except ImportError:
        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(gif, frames8, duration=1.0 / fps)
        return gif


class Visualizer:
    """Collects named streams of frames, then writes pngs + videos.

    result dicts use the renderer's keys: rgb, acc, depth (+ optional
    gt/diff). Frames sharing (frame id) across cameras are concatenated
    horizontally like the reference (:152-193).
    """

    def __init__(self, out_dir: str, fps: int = 10, save_images: bool = True):
        self.out_dir = out_dir
        self.fps = fps
        self.save_images = save_images
        self._streams: dict[str, dict[int, dict[int, np.ndarray]]] = \
            defaultdict(lambda: defaultdict(dict))
        os.makedirs(out_dir, exist_ok=True)

    def add(self, name: str, frame: int, cam: int, img: np.ndarray) -> None:
        img = np.asarray(img)
        if img.ndim == 2:
            if name == "depth":
                img = depth_colormap(img)
            else:
                img = np.repeat(to_uint8(img)[..., None], 3, -1)
        self._streams[name][frame][cam] = to_uint8(img)
        if self.save_images:
            save_image(os.path.join(self.out_dir, name,
                                    f"{frame:06d}_{cam}.png"), img)

    def add_result(self, result: dict, frame: int, cam: int,
                   gt: np.ndarray | None = None) -> None:
        self.add("rgb", frame, cam, np.asarray(result["rgb"]))
        if "acc" in result:
            self.add("acc", frame, cam, np.asarray(result["acc"]))
        if "depth" in result:
            self.add("depth", frame, cam, np.asarray(result["depth"]))
        if gt is not None:
            self.add("gt", frame, cam, np.asarray(gt))
            diff = np.abs(np.asarray(result["rgb"]) - np.asarray(gt)).mean(-1)
            self.add("diff", frame, cam, np.repeat(
                to_uint8(diff)[..., None], 3, -1))

    def summarize(self) -> dict[str, str]:
        """Write one video per stream; returns stream -> video path."""
        out = {}
        for name, frames in self._streams.items():
            video_frames = []
            for frame in sorted(frames):
                cams = frames[frame]
                tiles = [cams[c] for c in sorted(cams)]
                h = min(t.shape[0] for t in tiles)
                tiles = [t[:h] for t in tiles]
                video_frames.append(np.concatenate(tiles, axis=1))
            if video_frames:
                out[name] = save_video(
                    os.path.join(self.out_dir, f"{name}.mp4"),
                    video_frames, fps=self.fps)
        return out
