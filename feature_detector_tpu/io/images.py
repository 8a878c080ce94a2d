"""Host-side image IO: PNG decode to grayscale u8 arrays, saving, drawing.

Replaces the reference's Visualizor2D::LoadImage / ImagePainter drawing layer
(SURVEY.md L0 table) with headless numpy/PIL equivalents; visual demos write
PNGs instead of opening windows.
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def load_gray(path: str) -> np.ndarray:
    """Load an image file as HxW uint8 grayscale (luminance conversion for RGB
    inputs, like Visualizor2D::LoadImage)."""
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot decode images")
    img = _PILImage.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.uint8)


def load_rgb(path: str) -> np.ndarray:
    """Load an image file as HxWx3 uint8 RGB."""
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot decode images")
    return np.asarray(_PILImage.open(path).convert("RGB"), dtype=np.uint8)


def save_image(path: str, array: np.ndarray) -> None:
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot encode images")
    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    _PILImage.fromarray(arr).save(path)


def to_rgb(gray: np.ndarray) -> np.ndarray:
    """u8 HxW -> u8 HxWx3 (ImagePainter::ConvertUint8ToRgb equivalent)."""
    return np.repeat(gray[..., None], 3, axis=-1).copy()


def draw_solid_circle(rgb: np.ndarray, x: int, y: int, radius: int, color) -> None:
    """Filled circle (ImagePainter::DrawSolidCircle equivalent)."""
    h, w = rgb.shape[:2]
    y0, y1 = max(0, y - radius), min(h, y + radius + 1)
    x0, x1 = max(0, x - radius), min(w, x + radius + 1)
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (yy - y) ** 2 + (xx - x) ** 2 <= radius * radius
    rgb[y0:y1, x0:x1][m] = color


def draw_line(rgb: np.ndarray, x1: float, y1: float, x2: float, y2: float, color) -> None:
    """Bresenham-style line (ImagePainter::DrawBressenhanLine equivalent)."""
    n = int(max(abs(x2 - x1), abs(y2 - y1), 1)) * 2 + 1
    xs = np.linspace(x1, x2, n).round().astype(int)
    ys = np.linspace(y1, y2, n).round().astype(int)
    h, w = rgb.shape[:2]
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    rgb[ys[keep], xs[keep]] = color


CYAN = (0, 255, 255)
RED = (255, 0, 0)
GREEN = (0, 255, 0)
YELLOW = (255, 255, 0)
