"""Video loading + frame sampling.

TPU-native analog of reference src/transformers/video_utils.py
(``VideoMetadata`` :79, uniform/fps sampling :284/:305, decode backends
:340-630). Frame sampling is pure index math; decoding gates on whichever
backend is installed (opencv/pyav/torchvision) — absent backends raise with
the reference's skip-style message.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class VideoMetadata:
    """reference video_utils.py:79."""

    total_num_frames: int
    fps: Optional[float] = None
    duration: Optional[float] = None
    video_backend: Optional[str] = None


def get_uniform_frame_indices(total_num_frames: int, num_frames: Optional[int] = None) -> np.ndarray:
    """Evenly spaced frame indices (reference video_utils.py:284)."""
    if num_frames is not None:
        indices = np.arange(0, total_num_frames, total_num_frames / num_frames).astype(int)
    else:
        indices = np.arange(0, total_num_frames).astype(int)
    return indices


def default_sample_indices_fn(metadata: VideoMetadata, num_frames: Optional[int] = None,
                              fps: Optional[float] = None, **kwargs) -> np.ndarray:
    """num_frames- or fps-based sampling (reference video_utils.py:305)."""
    total = metadata.total_num_frames
    if fps is not None and num_frames is not None:
        raise ValueError("Pass `num_frames` or `fps`, not both")
    if fps is not None:
        if metadata.fps is None:
            raise ValueError("fps sampling requires metadata.fps")
        num_frames = int(total / metadata.fps * fps)
    if num_frames is not None:
        if num_frames > total:
            raise ValueError(f"Cannot sample {num_frames} frames from a {total}-frame video")
        return get_uniform_frame_indices(total, num_frames)
    return np.arange(total)


def load_video(path: str, num_frames: Optional[int] = None, fps: Optional[float] = None,
               backend: str = "opencv") -> tuple[np.ndarray, VideoMetadata]:
    """Decode frames [T, H, W, C] uint8 (reference video_utils.py:631).

    Backends gate on availability exactly like the reference's
    requires_backends pattern."""
    if backend == "opencv":
        try:
            import cv2
        except ImportError as exc:
            raise ImportError("load_video(backend='opencv') requires opencv-python") from exc
        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        video_fps = cap.get(cv2.CAP_PROP_FPS) or None
        metadata = VideoMetadata(total_num_frames=total, fps=video_fps,
                                 duration=total / video_fps if video_fps else None,
                                 video_backend="opencv")
        indices = set(default_sample_indices_fn(metadata, num_frames=num_frames, fps=fps).tolist())
        frames = []
        i = 0
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            if i in indices:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            i += 1
        cap.release()
        return np.stack(frames), metadata
    if backend == "pyav":
        try:
            import av
        except ImportError as exc:
            raise ImportError("load_video(backend='pyav') requires av") from exc
        container = av.open(path)
        stream = container.streams.video[0]
        total = stream.frames
        video_fps = float(stream.average_rate) if stream.average_rate else None
        metadata = VideoMetadata(total_num_frames=total, fps=video_fps,
                                 duration=total / video_fps if video_fps else None,
                                 video_backend="pyav")
        indices = set(default_sample_indices_fn(metadata, num_frames=num_frames, fps=fps).tolist())
        frames = [f.to_ndarray(format="rgb24") for i, f in enumerate(container.decode(video=0))
                  if i in indices]
        return np.stack(frames), metadata
    raise ValueError(f"Unknown video backend {backend!r} (opencv, pyav)")
