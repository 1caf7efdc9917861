"""Host-side video decode (cv2) — done ONCE at full resolution.

Reference decodes AND spatially resizes the whole clip on the host for every
scale (src/datasets/generate_frames.py:7-55, called per-scale and even per
__getitem__ via generate_frames, video.py:52) — a significant host hot path.
Here the decode happens once; per-scale resizing is on-device (video.py).
"""

from __future__ import annotations

import os

import numpy as np


def video_to_frames(video_path: str, start_frame: int = 0,
                    max_frames: int = 13) -> np.ndarray:
    """Decode up to max_frames RGB frames from start_frame.
    Returns (T, H, W, 3) uint8. Mirrors the while_safety bail-out loop
    (generate_frames.py:27-41)."""
    import cv2

    assert os.path.exists(video_path)
    capture = cv2.VideoCapture(video_path)
    total_frames = int(capture.get(cv2.CAP_PROP_FRAME_COUNT))
    assert total_frames > start_frame >= 0, "Start-Frame out of range"

    trimmed = total_frames - start_frame
    end = max_frames if trimmed > max_frames else trimmed

    capture.set(1, start_frame)
    frames = []
    while_safety = 0
    while len(frames) < end:
        if while_safety > 500:
            break
        _, image = capture.read()
        if image is None:
            while_safety += 1
            continue
        while_safety = 0
        frames.append(cv2.cvtColor(image, cv2.COLOR_BGR2RGB))
    capture.release()
    return np.stack(frames)


def video_metadata(video_path: str):
    """(org_fps, height, width) without decoding (reference: video.py:28-31)."""
    import cv2

    capture = cv2.VideoCapture(video_path)
    if not capture.isOpened():
        # cv2 returns all-zero metadata for unopenable files; downstream
        # that becomes ar = 0/0 (ZeroDivisionError) or a silently-poisoned
        # org_fps=0 baked into args.txt — fail at the source instead
        capture.release()
        raise ValueError(f"cv2 cannot open video: {video_path} "
                         "(corrupt file or unsupported codec?)")
    fps = capture.get(cv2.CAP_PROP_FPS)
    h = capture.get(cv2.CAP_PROP_FRAME_HEIGHT)
    w = capture.get(cv2.CAP_PROP_FRAME_WIDTH)
    capture.release()
    if not (fps > 0 and h > 0 and w > 0):
        raise ValueError(f"cv2 reports degenerate metadata for "
                         f"{video_path}: fps={fps}, h={h}, w={w}")
    return fps, h, w
