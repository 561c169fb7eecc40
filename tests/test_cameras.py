"""Camera ray-generation tests, including fastArcTan numeric parity."""
import math

import jax.numpy as jnp
import numpy as np

from mobileraytracer_tpu.cameras import fast_arctan, generate_rays
from mobileraytracer_tpu.types import orthographic_camera, perspective_camera


def ref_fast_arctan(value: float) -> float:
    """Literal transcription of the reference formula for oracle purposes
    (reference Perspective.cpp:40-46)."""
    a = abs(value)
    return (math.pi / 4.0) * value - (value * (a - 1.0)) * (0.2447 + 0.0663 * a)


def test_fast_arctan_matches_reference_formula():
    xs = np.linspace(-2.0, 2.0, 101).astype(np.float32)
    got = np.asarray(fast_arctan(jnp.asarray(xs)))
    want = np.asarray([ref_fast_arctan(float(x)) for x in xs], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_fast_arctan_approximates_atan():
    xs = np.linspace(-1.0, 1.0, 201)
    got = np.asarray(fast_arctan(jnp.asarray(xs, jnp.float32)))
    assert np.abs(got - np.arctan(xs)).max() < 0.0016


def test_perspective_center_ray_is_direction():
    cam = perspective_camera((0, 0, -3.4), (0, 0, 1), (0, 1, 0), 45, 45)
    o, d = generate_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]),
                         jnp.zeros(1), jnp.zeros(1))
    np.testing.assert_allclose(np.asarray(o[0]), (0, 0, -3.4), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d[0]), (0, 0, 1), atol=1e-6)


def test_perspective_uv_sign_conventions():
    cam = perspective_camera((0, 0, -3.4), (0, 0, 1), (0, 1, 0), 45, 45)
    # right = cross(up, dir) = +x; u > 0.5 => +x; v < 0.5 => +y (up).
    u = jnp.asarray([0.9, 0.1, 0.5, 0.5])
    v = jnp.asarray([0.5, 0.5, 0.1, 0.9])
    _, d = generate_rays(cam, u, v, jnp.zeros(4), jnp.zeros(4))
    d = np.asarray(d)
    assert d[0, 0] > 0 and d[1, 0] < 0
    assert d[2, 1] > 0 and d[3, 1] < 0


def test_camera_basis_not_normalized():
    # The reference never normalizes right/up (Camera.cpp:14-18); with a
    # non-orthogonal up vector their length is sin(angle) != 1.
    cam = perspective_camera((0, 0, 0), (0, 0, 10), (1, 1, 0), 45, 45)
    assert abs(float(jnp.linalg.norm(cam.right)) - 1.0) > 1e-3


def test_orthographic_parallel_rays():
    cam = orthographic_camera((0, 1, -10), (0, 1, 7), (0, 1, 0), 10, 10)
    u = jnp.asarray([0.1, 0.9])
    v = jnp.asarray([0.2, 0.8])
    o, d = generate_rays(cam, u, v, jnp.zeros(2), jnp.zeros(2))
    d = np.asarray(d)
    np.testing.assert_allclose(d[0], d[1], atol=1e-7)
    o = np.asarray(o)
    assert np.linalg.norm(o[0] - o[1]) > 1.0  # origins spread on the plane


def test_orthographic_extents():
    # param_u is sizeH/2 (Orthographic.cpp:11-13): u=1 offsets by sizeH/4
    # relative to u=0.5... verify via direct formula (u-0.5)*sizeH/2.
    cam = orthographic_camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 10, 10)
    o, _ = generate_rays(cam, jnp.asarray([1.0]), jnp.asarray([0.5]),
                         jnp.zeros(1), jnp.zeros(1))
    # right = cross(up, dir) = (1, 0, 0); offset = (1-0.5)*5 = 2.5
    np.testing.assert_allclose(np.asarray(o[0]), (2.5, 0, 0), atol=1e-6)
