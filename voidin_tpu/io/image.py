"""Image I/O: PNG screenshots (ScreenshotCtx equivalent) and loading."""

from __future__ import annotations

import numpy as np
from PIL import Image


def save_png(path: str, img) -> None:
    """Save an (H, W, 3|4) float [0,1] or uint8 image."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(np.nan_to_num(arr), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr).save(path)


def load_image(path: str) -> np.ndarray:
    """Load an image file as (H, W, C) uint8."""
    return np.asarray(Image.open(path).convert("RGBA"))
