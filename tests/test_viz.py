"""Debug visualization streams (`show_track` overlays + loop `match_image`,
SURVEY.md §5.5)."""
import numpy as np

from plslam.eval import viz
from plslam.io.euroc import _read_png_gray


def test_track_overlay_and_match_image(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((120, 160)).astype(np.float32)
    uv = np.array([[20.0, 30.0], [80.0, 60.0], [150.0, 110.0]])
    out = viz.draw_tracks(img, uv, track_cnt=[1, 10, 30], vel=np.ones((3, 2)) * 0.5)
    assert out.shape == img.shape
    # dots brighten the feature locations above the dimmed background
    assert out[30, 20] > img[30, 20] * 0.6 + 0.1 or out[30, 20] > 0.5

    m = viz.draw_match_image(img, uv, img, uv + 2.0)
    assert m.shape == (120, 320)

    tv = viz.TrackVisualizer(str(tmp_path), every=2)
    p1 = tv.track_frame(img, uv, [1, 2, 3])
    p2 = tv.track_frame(img, uv, [1, 2, 3])  # skipped (every=2)
    p3 = tv.match_image(img, uv, img, uv, tag="0_5")
    assert p1 is not None and p2 is None and p3 is not None
    back = _read_png_gray(p1)
    assert back.shape == img.shape
