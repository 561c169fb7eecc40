"""Tests for the 8 pixel-sampler variants (samplers.py), mirroring the
behavioral contracts of reference app/Components/Samplers/*.cpp."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import samplers, scenes
from mobileraytracer_tpu.renderer import render_frame
from mobileraytracer_tpu.types import RenderConfig

KEY = jax.random.PRNGKey(7)


def draw(name, pixel_ids, sample_idx=0, domain=64):
    return np.asarray(samplers.pixel_jitter(
        name, KEY, jnp.asarray(pixel_ids, jnp.int32), sample_idx, domain))


def test_constant_is_center():
    # Constant.cpp:9-11 — fixed value, used for spp==1 center sampling.
    r = draw("constant", np.arange(10))
    assert np.all(r == 0.5)


def test_stratified_exact_lattice():
    # Stratified.cpp:10-19 — value = index/domainSize, two draws per pixel.
    r = draw("stratified", np.arange(4), domain=64)
    expect = np.arange(8, dtype=np.float32).reshape(4, 2) / 64.0
    np.testing.assert_allclose(r, expect)


def test_stratified_exhaustion_returns_one():
    # Draws past the per-pass budget return 1.0F (Stratified.cpp:12-15):
    # with 2 draws/pixel, pixels past domain/2 exhaust the pass.
    r = draw("stratified", np.asarray([40, 63]), domain=64)
    assert np.all(r == 1.0)


def test_haltonseq_matches_radical_inverse():
    # HaltonSeq.cpp:10-19 — haltonSequence(index, 2).
    r = draw("haltonseq", np.arange(3), domain=1024)
    # base-2 radical inverses of 0..5
    expect = np.asarray([[0.0, 0.5], [0.25, 0.75], [0.125, 0.625]], np.float32)
    np.testing.assert_allclose(r, expect)


def test_static_cursor_wraps_at_array_mask():
    # Sampler.hpp:58-63 — cursor & ArrayMask indexes the 2^20 array.
    table = samplers._static_array("mersenne")
    pid = np.asarray([0, samplers.ARRAY_SIZE // 2])  # draw 2^20 wraps to 0
    r = draw("static_mersenne", pid, domain=samplers.ARRAY_SIZE // 2)
    np.testing.assert_allclose(r[0], table[[0, 1]])
    np.testing.assert_allclose(r[1], table[[0, 1]])  # wrapped


def test_static_passes_advance_cursor():
    table = samplers._static_array("static_haltonseq".split("_")[1])
    r0 = draw("static_haltonseq", np.asarray([3]), sample_idx=0, domain=16)
    r1 = draw("static_haltonseq", np.asarray([3]), sample_idx=1, domain=16)
    np.testing.assert_allclose(r0[0], table[[6, 7]])
    np.testing.assert_allclose(r1[0], table[[38, 39]])  # +2*domain per pass


@pytest.mark.parametrize("name", samplers.SAMPLER_NAMES)
def test_all_variants_in_unit_range(name):
    r = draw(name, np.arange(256), sample_idx=2, domain=256)
    assert r.shape == (256, 2)
    assert np.all(r >= 0.0) and np.all(r <= 1.0)
    assert np.all(np.isfinite(r))


@pytest.mark.parametrize("name", ["pcg", "mersenne", "static_pcg",
                                  "static_mersenne", "static_haltonseq"])
def test_random_variants_are_uniform(name):
    # The true-RNG-backed variants promise only a high-quality uniform
    # stream (their reference counterparts seed from std::random_device).
    r = draw(name, np.arange(4096), domain=8192).ravel()
    assert abs(r.mean() - 0.5) < 0.02
    assert abs(r.var() - 1.0 / 12.0) < 0.01


def test_unknown_sampler_raises():
    with pytest.raises(ValueError):
        draw("nope", np.arange(2))


@pytest.mark.parametrize("name", samplers.SAMPLER_NAMES)
def test_render_frame_with_each_sampler(name):
    # End-to-end: each sampler drives the pixel jitter of a tiny frame.
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    cfg = RenderConfig(width=16, height=16, spp=2, shader=C.SHADER_NOSHADOWS,
                       accelerator=C.ACC_NAIVE, pixel_sampler=name)
    out = render_frame(scene, cam, cfg, KEY)
    img = np.asarray(out["image"])
    assert np.all(np.isfinite(img))
    assert img.max() > 0.0
