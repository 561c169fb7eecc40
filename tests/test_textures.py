"""Texture factory tests, mirroring the reference's error semantics
(reference app/MobileRT/Texture.cpp:57-115) and non-RGB decode paths."""
import io
import logging

import numpy as np
import pytest

from mobileraytracer_tpu.loaders import textures

PIL = pytest.importorskip("PIL.Image")


def _png_bytes(mode, size=(4, 3), color=None):
    img = PIL.new(mode, size, color)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def test_create_from_bytes_rgb():
    # In-memory factory (Texture.cpp:57-83).
    arr = textures.create_texture_from_bytes(_png_bytes("RGB", color=(255, 0, 0)))
    assert arr.shape == (3, 4, 3)
    np.testing.assert_allclose(arr[0, 0], [1.0, 0.0, 0.0])


def test_grayscale_broadcasts():
    arr = textures.create_texture_from_bytes(_png_bytes("L", color=128))
    assert arr.shape == (3, 4, 3)
    assert np.allclose(arr, 128 / 255.0)


def test_rgba_drops_alpha():
    arr = textures.create_texture_from_bytes(
        _png_bytes("RGBA", color=(0, 255, 0, 10)))
    assert arr.shape == (3, 4, 3)
    np.testing.assert_allclose(arr[0, 0], [0.0, 1.0, 0.0])


def test_palette_expands():
    img = PIL.new("RGB", (4, 3), (0, 0, 255)).convert("P")
    buf = io.BytesIO()
    img.save(buf, "PNG")
    arr = textures.create_texture_from_bytes(buf.getvalue())
    np.testing.assert_allclose(arr[0, 0], [0.0, 0.0, 1.0])


def test_garbage_bytes_raise():
    # throw ::std::runtime_error{stbi_failure_reason()} (Texture.cpp:63-67).
    with pytest.raises(textures.TextureError):
        textures.create_texture_from_bytes(b"not an image at all")


def test_empty_bytes_raise():
    with pytest.raises(textures.TextureError):
        textures.create_texture_from_bytes(b"")


def test_missing_file_raises():
    with pytest.raises(textures.TextureError, match="no such file"):
        textures.create_texture("/nonexistent/tex.png")


def test_nonstrict_load_warns(tmp_path, caplog):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"corrupt")
    with caplog.at_level(logging.WARNING, logger="mobileraytracer_tpu"):
        out = textures.load_texture(str(bad), strict=False)
    assert out is None
    assert any("Error reading texture" in r.message for r in caplog.records)


def test_cache_decodes_once(tmp_path):
    p = tmp_path / "t.png"
    p.write_bytes(_png_bytes("RGB", color=(9, 9, 9)))

    class B:
        calls = 0
        def add_texture(self, img):
            B.calls += 1
            return 7
    cache = textures.TextureCache(str(tmp_path))
    b = B()
    assert cache.get_id(b, "t.png") == 7
    assert cache.get_id(b, "t.png") == 7
    assert B.calls == 1
    assert len(cache) == 1
