import numpy as np

from tracer.utils.image import write_png, read_png, tonemap


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    back = read_png(p)
    np.testing.assert_array_equal(img, back)


def test_tonemap_range():
    x = np.array([[[-1.0, 0.0, 0.5], [1.0, 2.0, 0.25]]], np.float32)
    y = tonemap(x)
    assert y.dtype == np.uint8
    assert y[0, 0, 0] == 0 and y[0, 1, 0] == 255 and y[0, 1, 1] == 255
