"""Deterministic stand-in textures for reference TestScenes.

The reference Data/ ships without its TEXTURES directory; scenes like
texture_test.json reference TEXTURES/default.bmp.  This generates a
deterministic checkerboard-with-gradient BMP so BOTH renderers (the patched
reference build and ours) consume identical texels — golden parity by
construction, regenerated on demand (never committed binary).
"""

import os

import numpy as np
from PIL import Image


def default_bmp(path: str, size: int = 64):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    y, x = np.mgrid[0:size, 0:size]
    checker = ((x // 8 + y // 8) % 2).astype(np.float32)
    r = checker * 255
    g = (x / size) * 255
    b = (y / size) * 255
    img = np.stack([r, g, b], -1).astype(np.uint8)
    Image.fromarray(img).save(path)
    return path


def ensure(data_dir: str = "/tmp/refdata"):
    p = os.path.join(data_dir, "TEXTURES", "default.bmp")
    if not os.path.exists(p):
        default_bmp(p)
    return data_dir


if __name__ == "__main__":
    import sys

    print(ensure(sys.argv[1] if len(sys.argv) > 1 else "/tmp/refdata"))
