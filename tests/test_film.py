"""Film accumulation / quantization tests, including bit parity with the
reference's integer incrementalAvg (reference Utils.cpp:66-90)."""
import jax.numpy as jnp
import numpy as np

from mobileraytracer_tpu import film


def ref_incremental_avg(sample, avg, num_sample):
    """Literal uint transcription of the reference formula as oracle."""
    avg = np.uint32(avg)
    n = np.uint32(num_sample)
    last = [avg & 0xFF, (avg >> np.uint32(8)) & 0xFF, (avg >> np.uint32(16)) & 0xFF]
    samp = [np.uint32(sample[i] * 255) for i in range(3)]
    cur = [min(((n - 1) * last[i] + samp[i]) // n, np.uint32(255)) for i in range(3)]
    return np.int32(np.uint32(0xFF000000) | (cur[2] << np.uint32(16))
                    | (cur[1] << np.uint32(8)) | cur[0])


def test_int_parity_single_sample():
    rgb = jnp.asarray([[0.25, 0.5, 1.0]], jnp.float32)
    got = np.asarray(film.incremental_avg_int(jnp.zeros(1, jnp.int32), rgb, 1))
    want = ref_incremental_avg([0.25, 0.5, 1.0], 0, 1)
    assert got[0] == want


def test_int_parity_progressive_sequence():
    rng = np.random.default_rng(1)
    samples = rng.uniform(0, 1.5, size=(10, 3)).astype(np.float32)
    bitmap = jnp.zeros(1, jnp.int32)
    ref = np.int32(0)
    for i, s in enumerate(samples):
        bitmap = film.incremental_avg_int(bitmap, jnp.asarray(s)[None], i + 1)
        ref = ref_incremental_avg(s, ref, i + 1)
        assert int(np.asarray(bitmap)[0]) == int(ref), f"sample {i}"


def test_quantize_unpack_roundtrip():
    rgb = jnp.asarray([[0.0, 0.5, 1.0], [0.2, 0.9, 0.03]], jnp.float32)
    packed = film.quantize_abgr(rgb)
    back = np.asarray(film.unpack_abgr(packed))
    np.testing.assert_allclose(back, np.floor(np.asarray(rgb) * 255) / 255,
                               atol=1e-6)
    # Alpha byte is always 0xFF.
    assert ((np.asarray(packed).astype(np.uint32) >> 24) == 0xFF).all()


def test_float_incremental_mean():
    acc = jnp.zeros((1, 3))
    vals = [jnp.asarray([[1.0, 2.0, 3.0]]), jnp.asarray([[3.0, 4.0, 5.0]])]
    acc = film.incremental_avg_float(acc, vals[0], 1)
    acc = film.incremental_avg_float(acc, vals[1], 2)
    np.testing.assert_allclose(np.asarray(acc), [[2.0, 3.0, 4.0]], rtol=1e-6)


def test_is_uniform():
    assert bool(film.is_uniform(jnp.zeros((4, 4), jnp.int32)))
    assert not bool(film.is_uniform(jnp.arange(16, dtype=jnp.int32).reshape(4, 4)))
