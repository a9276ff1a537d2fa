"""PPM tone-map/writer vs reference write_color (src/render.cpp:11-20)."""
import io

import numpy as np

from rtow_tpu.utils import ppm


def test_tonemap_matches_write_color():
    img = np.asarray([[[0.25, 0.0, 1.0]]])
    ints = ppm.tonemap(img)
    # sqrt(0.25)=0.5 -> int(128); 0 -> 0; sqrt(1)=1 clamped 0.999 -> 255
    np.testing.assert_array_equal(ints[0, 0], [128, 0, 255])


def test_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, size=(7, 5, 3))
    text = ppm.ppm_to_string(img)
    assert text.startswith("P3\n5 7\n255\n")
    back = ppm.read_ppm(io.StringIO(text))
    np.testing.assert_array_equal(back, ppm.tonemap(img))


def test_decode_inverts_tonemap_approximately():
    img = np.full((4, 4, 3), 0.3)
    back = ppm.decode_ppm(ppm.tonemap(img))
    np.testing.assert_allclose(back, 0.3, atol=0.01)
