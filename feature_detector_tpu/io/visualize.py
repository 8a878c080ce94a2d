"""Interactive 2D visualization: the reference Visualizor2D contract.

The reference demos open named windows and block on a keypress
(``Visualizor2D::ShowImage(title, image)`` + ``Visualizor2D::WaitKey(0)``,
see /root/reference/test/test_feature_point_detector.cpp:104-111 and
test_feature_line_detector.cpp:122-126).  This module provides the same
surface on top of matplotlib when an interactive backend is available, and
degrades gracefully to a window *registry* (plus optional PNG dump) in
headless environments — so demo scripts written against ``show_image`` /
``wait_key`` run unchanged on a display-less TPU host.

No state leaks into the compute path: this is host-side IO only.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

# Title -> last image shown, in display order (dict preserves insertion).
_WINDOWS: Dict[str, np.ndarray] = {}
_INTERACTIVE: Optional[bool] = None  # resolved lazily


def _plt():
    import matplotlib.pyplot as plt

    return plt


def interactive_available() -> bool:
    """True when matplotlib can open real windows on this host.

    Headless hosts (no DISPLAY / Agg backend) return False; ``show_image``
    then records images in the registry instead of opening windows.
    """
    global _INTERACTIVE
    if _INTERACTIVE is not None:
        return _INTERACTIVE
    if os.environ.get("FD_NO_DISPLAY"):
        _INTERACTIVE = False
        return False
    try:
        import matplotlib

        backend = matplotlib.get_backend().lower()
        # Agg variants (agg, pdf, svg, ...) cannot open windows.
        _INTERACTIVE = not any(b in backend for b in ("agg", "pdf", "svg", "ps", "template"))
        if _INTERACTIVE and not (os.environ.get("DISPLAY") or os.name == "nt"):
            _INTERACTIVE = False
    except Exception:
        _INTERACTIVE = False
    return _INTERACTIVE


def show_image(title: str, image: np.ndarray, out_dir: Optional[str] = None) -> None:
    """Reference ``Visualizor2D::ShowImage``: display ``image`` in the named
    window (grayscale [H,W] or RGB [H,W,3] uint8).  Re-showing a title
    updates that window.  Headless: records the image in the registry and,
    when ``out_dir`` is given, writes ``<out_dir>/<slug(title)>.png``.
    """
    img = np.asarray(image)
    _WINDOWS[title] = img
    if out_dir is not None:
        from .images import save_image, to_rgb

        slug = "".join(c if c.isalnum() else "_" for c in title.strip().lower())
        save_image(os.path.join(out_dir, f"{slug}.png"),
                   img if img.ndim == 3 else to_rgb(img))
    if not interactive_available():
        return
    plt = _plt()
    fig = plt.figure(title)
    fig.clf()
    ax = fig.add_subplot(111)
    ax.imshow(img, cmap=None if img.ndim == 3 else "gray")
    ax.set_title(title)
    ax.axis("off")
    plt.show(block=False)
    plt.pause(0.001)


def wait_key(delay_ms: int = 0) -> int:
    """Reference ``Visualizor2D::WaitKey``: block until a key/button press.

    ``delay_ms == 0`` blocks indefinitely (reference semantics); positive
    values time out after that many milliseconds.  Returns 0 on a press,
    -1 on timeout or when running headless (no-op).
    """
    if not interactive_available():
        return -1
    plt = _plt()
    timeout = None if delay_ms == 0 else max(delay_ms, 1) / 1e3
    # waitforbuttonpress needs an open figure; nothing shown -> nothing to wait on.
    if not plt.get_fignums():
        return -1
    pressed = plt.figure(plt.get_fignums()[-1]).waitforbuttonpress(timeout=timeout)
    return -1 if pressed is None else 0


def windows() -> Dict[str, np.ndarray]:
    """The registry of images shown so far (title -> image), display order."""
    return dict(_WINDOWS)


def close_all() -> None:
    """Close every window and clear the registry."""
    _WINDOWS.clear()
    if interactive_available():
        _plt().close("all")
