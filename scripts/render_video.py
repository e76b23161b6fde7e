#!/usr/bin/env python
"""Stitch a directory of frames into video.mp4.

Parity: s-nerfpp/stage3_code/render_video.py (imageio mimsave at 30 fps,
crf 5). Usage: python scripts/render_video.py <frame_dir> [out.mp4]
Falls back to an .npy frame stack when no ffmpeg backend is available.
"""

import os
import sys

import numpy as np


def render_video(frame_dir: str, out_path: str = None, fps: int = 30):
  from PIL import Image
  names = sorted(n for n in os.listdir(frame_dir)
                 if n.lower().endswith((".png", ".jpg", ".jpeg")))
  if not names:
    raise FileNotFoundError(f"no frames under {frame_dir}")
  frames = np.stack([np.array(Image.open(os.path.join(frame_dir, n)))
                     for n in names])
  out_path = out_path or os.path.join(os.path.dirname(frame_dir.rstrip("/")),
                                      "video.mp4")
  try:
    import imageio
    imageio.mimsave(out_path, frames, fps=fps,
                    ffmpeg_params=["-crf", "5"])
  except Exception:  # noqa: BLE001 — no ffmpeg in minimal images
    out_path = os.path.splitext(out_path)[0] + ".npy"
    np.save(out_path, frames)
  print(f"wrote {out_path} ({len(frames)} frames)")
  return out_path


if __name__ == "__main__":
  render_video(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
