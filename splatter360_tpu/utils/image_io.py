"""Image/video IO + layout helpers (SURVEY.md §2.8: src/misc/image_io.py,
src/visualization/layout.py hcat/vcat/add_border, color maps)."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def save_image(img, path) -> None:
    """img [H, W, 3] float in [0,1] or uint8."""
    import imageio.v2 as imageio

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = to_uint8(arr)
    imageio.imwrite(path, arr)


def load_image(path) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(path), dtype=np.float32) / 255.0


def save_video(frames, path, fps: int = 30) -> None:
    """frames: list/array of [H, W, 3] in [0,1]. Uses cv2's bundled encoder (this
    environment has no imageio-ffmpeg); falls back to a PNG frame directory."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    frames = [to_uint8(f) for f in frames]
    try:
        import cv2

        h, w = frames[0].shape[:2]
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
        if not writer.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        if path.stat().st_size > 0:
            return
        raise RuntimeError("cv2 wrote empty video")
    except Exception:
        frame_dir = path.with_suffix("")
        frame_dir.mkdir(parents=True, exist_ok=True)
        import imageio.v2 as imageio

        for i, f in enumerate(frames):
            imageio.imwrite(frame_dir / f"{i:04d}.png", f)


def hcat(*images, pad: int = 0):
    """Concatenate [H, W, C] images horizontally, padding heights."""
    images = [np.asarray(i) for i in images]
    h = max(i.shape[0] for i in images)
    out = []
    for i in images:
        if i.shape[0] < h:
            i = np.pad(i, ((0, h - i.shape[0]), (0, 0), (0, 0)),
                       constant_values=1.0)
        out.append(i)
        if pad:
            out.append(np.ones((h, pad, images[0].shape[-1]), i.dtype))
    if pad:
        out = out[:-1]
    return np.concatenate(out, axis=1)


def vcat(*images, pad: int = 0):
    images = [np.asarray(i) for i in images]
    w = max(i.shape[1] for i in images)
    out = []
    for i in images:
        if i.shape[1] < w:
            i = np.pad(i, ((0, 0), (0, w - i.shape[1]), (0, 0)),
                       constant_values=1.0)
        out.append(i)
        if pad:
            out.append(np.ones((pad, w, images[0].shape[-1]), i.dtype))
    if pad:
        out = out[:-1]
    return np.concatenate(out, axis=0)


def add_label(img, text: str, height: int = 18):
    """Add a white text banner above an [H, W, 3] image (reference
    src/visualization/layout.py add_label parity, PIL-based)."""
    from PIL import Image, ImageDraw

    arr = np.asarray(img)
    was_float = arr.dtype != np.uint8
    if was_float:
        arr = to_uint8(arr)
    banner = Image.new("RGB", (arr.shape[1], height), (255, 255, 255))
    draw = ImageDraw.Draw(banner)
    draw.text((4, 2), text, fill=(0, 0, 0))
    out = np.concatenate([np.asarray(banner), arr], axis=0)
    if was_float:
        out = out.astype(np.float32) / 255.0
    return out


def add_border(img, width: int = 2, value: float = 1.0):
    """Pad a constant border around an [H, W, C] image."""
    arr = np.asarray(img)
    return np.pad(
        arr, ((width, width), (width, width), (0, 0)), constant_values=value
    )


def apply_depth_colormap(depth, near=None, far=None):
    """Depth [H, W] -> turbo-ish colormap [H, W, 3] (visualization parity with the
    reference's viridis/inferno depth dumps)."""
    import matplotlib

    d = np.asarray(depth, np.float32)
    lo = np.percentile(d, 1) if near is None else near
    hi = np.percentile(d, 99) if far is None else far
    dn = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    cmap = matplotlib.colormaps["inferno"]
    return cmap(dn)[..., :3].astype(np.float32)
