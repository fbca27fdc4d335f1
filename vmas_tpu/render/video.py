"""Video saving (reference utils.py:106-124 save_video, cv2-based).

Uses cv2/imageio when available and working, else writes an .npz of frames —
frames are never lost to a broken encoder (e.g. imageio without
imageio-ffmpeg raises at write time, not import time).
"""

from __future__ import annotations

import numpy as np


def save_video(name: str, frame_list, fps: int):
    frames = [np.asarray(f) for f in frame_list]
    try:
        import cv2

        video = cv2.VideoWriter(
            name + ".mp4", cv2.VideoWriter_fourcc(*"mp4v"), int(fps),
            (frames[0].shape[1], frames[0].shape[0]),
        )
        if not video.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        for img in frames:
            video.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        video.release()
        return name + ".mp4"
    except Exception:
        pass
    try:
        import imageio

        imageio.mimsave(name + ".mp4", frames, fps=int(fps))
        return name + ".mp4"
    except Exception:
        np.savez_compressed(name + "_frames.npz", frames=np.stack(frames))
        return name + "_frames.npz"
