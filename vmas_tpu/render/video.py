"""Video saving (reference utils.py:106-124 save_video, cv2-based).

Uses cv2/imageio when available and working, else writes an .npz of frames —
frames are never lost to a broken encoder (e.g. imageio without
imageio-ffmpeg raises at write time, not import time).
"""

from __future__ import annotations

import numpy as np


def save_video(name: str, frame_list, fps: int):
    frames = [np.asarray(f) for f in frame_list]
    if not frames:
        raise ValueError("save_video: frame_list is empty")
    try:
        import cv2

        h, w = frames[0].shape[0], frames[0].shape[1]
        video = cv2.VideoWriter(
            name + ".mp4", cv2.VideoWriter_fourcc(*"mp4v"), int(fps), (w, h)
        )
        if not video.isOpened():
            raise RuntimeError("cv2.VideoWriter failed to open")
        try:
            for img in frames:
                # VideoWriter.write silently drops mismatched-size frames
                # (returns False, never raises) — e.g. a live window resized
                # mid-recording; fail loudly into the next backend instead
                if img.shape[0] != h or img.shape[1] != w:
                    raise RuntimeError(
                        f"frame size changed mid-video: {img.shape[:2]} vs ({h}, {w})"
                    )
                ok = video.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
                if ok is False:  # some builds return None on success
                    raise RuntimeError("cv2.VideoWriter.write failed")
        finally:
            video.release()
        return name + ".mp4"
    except Exception:
        pass
    try:
        import imageio

        imageio.mimsave(name + ".mp4", frames, fps=int(fps))
        return name + ".mp4"
    except Exception:
        # np.stack fails on ragged sizes (resized window mid-recording);
        # an object array keeps every frame
        if len({f.shape for f in frames}) == 1:
            arr = np.stack(frames)
        else:
            arr = np.empty(len(frames), dtype=object)
            for i, f in enumerate(frames):
                arr[i] = f
        np.savez_compressed(name + "_frames.npz", frames=arr)
        return name + "_frames.npz"
