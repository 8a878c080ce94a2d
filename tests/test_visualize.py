"""io.visualize: the reference Visualizor2D ShowImage/WaitKey contract
(test_feature_point_detector.cpp:104-111) on a headless host — registry
semantics, PNG tee, non-blocking wait_key."""

import os

import numpy as np

from feature_detector_tpu.io import visualize


def setup_function(_fn):
    os.environ["FD_NO_DISPLAY"] = "1"
    visualize._INTERACTIVE = None  # re-resolve under the forced-headless env
    visualize.close_all()


def test_headless_show_records_windows_in_order(tmp_path):
    gray = np.full((8, 12), 7, np.uint8)
    rgb = np.zeros((8, 12, 3), np.uint8)
    visualize.show_image("fast features", gray)
    visualize.show_image("lsd lines", rgb)
    wins = visualize.windows()
    assert list(wins) == ["fast features", "lsd lines"]
    assert wins["fast features"].shape == (8, 12)
    # re-show updates in place, does not duplicate
    visualize.show_image("fast features", rgb)
    assert list(visualize.windows()) == ["fast features", "lsd lines"]
    assert visualize.windows()["fast features"].ndim == 3


def test_headless_png_tee_and_waitkey_noop(tmp_path):
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    visualize.show_image("Harris detected features", img, out_dir=str(tmp_path))
    assert (tmp_path / "harris_detected_features.png").exists()
    # WaitKey(0) must not block headless; returns -1 like a timeout.
    assert visualize.wait_key(0) == -1
    assert visualize.wait_key(5) == -1
    visualize.close_all()
    assert visualize.windows() == {}


def test_demo_show_flag_headless(tmp_path, monkeypatch):
    # The demo's --show path: headless hosts just re-register the PNGs.
    from feature_detector_tpu.io.images import load_rgb, save_image

    save_image(str(tmp_path / "a.png"), np.zeros((4, 4, 3), np.uint8))
    visualize.show_image("a", load_rgb(str(tmp_path / "a.png")))
    assert "a" in visualize.windows()
