"""Video saving (reference utils.py:106-124 save_video, cv2-based).

Uses imageio/cv2 when available, else writes an .npz of frames.
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
        for img in frames:
            video.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        video.release()
        return name + ".mp4"
    except ImportError:
        pass
    try:
        import imageio

        imageio.mimsave(name + ".mp4", frames, fps=int(fps))
        return name + ".mp4"
    except ImportError:
        np.savez_compressed(name + "_frames.npz", frames=np.stack(frames))
        return name + "_frames.npz"
