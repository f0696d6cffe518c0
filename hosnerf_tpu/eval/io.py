"""Image/video artifact output + results.json writer.

ref: 1st_State-Conditional_Scene/utils/store_image.py,
2nd.../core/utils/image_util.py, src/model/interface.py:121-132
(`write_stats`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

import numpy as np


def to_8b_image(img01: np.ndarray) -> np.ndarray:
    return (255.0 * np.clip(img01, 0.0, 1.0)).astype(np.uint8)


def store_image(dirpath: str, rgbs: Sequence[np.ndarray],
                prefix: str = "image") -> List[str]:
    """Dump images as jpgs named image000.jpg... (ref: store_image.py:27-32)."""
    import cv2
    os.makedirs(dirpath, exist_ok=True)
    paths = []
    for i, rgb in enumerate(rgbs):
        p = os.path.join(dirpath, f"{prefix}{i:03d}.jpg")
        cv2.imwrite(p, cv2.cvtColor(to_8b_image(np.asarray(rgb)),
                                    cv2.COLOR_RGB2BGR))
        paths.append(p)
    return paths


def store_video(dirpath: str, rgbs: Sequence[np.ndarray],
                fps: int = 20) -> str:
    """mp4 at fps 20 (ref: store_image.py:35-39). Uses imageio-ffmpeg when
    available, else falls back to cv2's VideoWriter."""
    os.makedirs(dirpath, exist_ok=True)
    frames = [to_8b_image(np.asarray(r)) for r in rgbs]
    path = os.path.join(dirpath, "images.mp4")
    try:
        import imageio
        imageio.mimwrite(path, frames, fps=fps, quality=8)
    except Exception:
        import cv2
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                             (w, h))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    return path


def tile_images(images: Sequence[np.ndarray],
                imgs_per_row: int = 4) -> np.ndarray:
    """Tile uint8 images into a grid (ref: image_util.py `tile_images`)."""
    rows = []
    for i in range(0, len(images), imgs_per_row):
        row = list(images[i:i + imgs_per_row])
        while len(row) < imgs_per_row:
            row.append(np.zeros_like(row[0]))
        rows.append(np.concatenate(row, axis=1))
    return np.concatenate(rows, axis=0)


def write_stats(path: str, *stats: Dict) -> None:
    """results.json writer (ref: interface.py:121-132)."""
    with open(path, "w") as f:
        json.dump(list(stats), f, indent=2, default=float)
