"""Geometry-kernel unit tests against analytic oracles, mirroring the
reference's C++ unit-test tier (reference app/Unit_Testing/TestTriangle.cpp,
TestPlane.cpp etc.)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu.builder import SceneBuilder
from mobileraytracer_tpu.ops import intersect


def _rays(*rows):
    o = jnp.asarray([r[0] for r in rows], jnp.float32)
    d = jnp.asarray([r[1] for r in rows], jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _no_prev(n):
    return jnp.zeros((n,), jnp.int32), jnp.full((n,), -1, jnp.int32)


class TestTriangle:
    def setup_method(self, _):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 0, 0))
        # Triangle in z=1 plane covering (0,0)-(1,0)-(0,1).
        b.add_triangle((0, 0, 1), (1, 0, 1), (0, 1, 1), m)
        self.scene = b.build()

    def test_hit_inside(self):
        o, d = _rays(((0.2, 0.2, 0.0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_TRIANGLE
        np.testing.assert_allclose(hit.t[0], 1.0, rtol=1e-6)
        np.testing.assert_allclose(hit.point[0], (0.2, 0.2, 1.0), atol=1e-6)

    def test_miss_outside_barycentric(self):
        o, d = _rays(((0.7, 0.7, 0.0), (0, 0, 1)),   # u+v > 1
                     ((-0.1, 0.2, 0.0), (0, 0, 1)),  # u < 0
                     ((0.2, -0.1, 0.0), (0, 0, 1)))  # v < 0
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(3))
        assert (np.asarray(hit.prim_kind) == C.PRIM_NONE).all()

    def test_miss_parallel(self):
        o, d = _rays(((0.2, 0.2, 0.0), (1, 0, 0)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_NONE

    def test_miss_behind(self):
        o, d = _rays(((0.2, 0.2, 2.0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_NONE

    def test_self_intersection_guard(self):
        o, d = _rays(((0.2, 0.2, 1.0), (0, 0, 1)))
        prev_kind = jnp.asarray([C.PRIM_TRIANGLE], jnp.int32)
        prev_id = jnp.asarray([0], jnp.int32)
        hit = intersect.intersect_scene_naive(self.scene, o, d, prev_kind, prev_id)
        assert hit.prim_kind[0] == C.PRIM_NONE

    def test_default_normal_orientation(self):
        # Builder default normal = normalize(cross(AC, AB))
        # (reference Triangle.cpp:328-339).
        o, d = _rays(((0.2, 0.2, 0.0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        np.testing.assert_allclose(hit.normal[0], (0, 0, -1), atol=1e-6)


class TestSphere:
    def setup_method(self, _):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 0, 0))
        b.add_sphere((0, 0, 5), 1.0, m)
        self.scene = b.build()

    def test_hit_front(self):
        o, d = _rays(((0, 0, 0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_SPHERE
        np.testing.assert_allclose(hit.t[0], 4.0, rtol=1e-5)
        np.testing.assert_allclose(hit.normal[0], (0, 0, -1), atol=1e-5)

    def test_inside_hits_far_shell(self):
        o, d = _rays(((0, 0, 5), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        # min root is negative, picked min/2a — the reference picks the
        # *smaller* root which is behind: distance < EpsilonLarge => miss.
        assert hit.prim_kind[0] == C.PRIM_NONE

    def test_miss(self):
        o, d = _rays(((0, 2, 0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_NONE

    def test_tangent_treated_as_hit_or_miss_consistently(self):
        # Discriminant == 0 passes the >= 0 test but must respect epsilon.
        o, d = _rays(((1.0, 0, 0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        # Tangent ray: the reference accepts disc >= 0; result is a grazing
        # hit at t=5 (or numerically a miss). Accept either, but no crash.
        assert hit.prim_kind[0] in (C.PRIM_NONE, C.PRIM_SPHERE)


class TestPlane:
    def setup_method(self, _):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 0, 0))
        b.add_plane((0, 0, 1), (0, 0, -1), m)
        self.scene = b.build()

    def test_two_sided(self):
        o, d = _rays(((0, 0, 0), (0, 0, 1)),
                     ((0, 0, 2), (0, 0, -1)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(2))
        assert (np.asarray(hit.prim_kind) == C.PRIM_PLANE).all()
        np.testing.assert_allclose(hit.t, (1.0, 1.0), rtol=1e-6)
        # Normal is the stored plane normal, never flipped
        # (reference Plane.cpp:62-69).
        np.testing.assert_allclose(np.asarray(hit.normal),
                                   [[0, 0, -1], [0, 0, -1]], atol=1e-6)

    def test_parallel_miss(self):
        o, d = _rays(((0, 0, 0), (1, 0, 0)))
        hit = intersect.intersect_scene_naive(self.scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_NONE


class TestClosestWins:
    def test_nearest_of_multiple(self):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 1, 1))
        b.add_plane((0, 0, 3), (0, 0, -1), m)
        b.add_sphere((0, 0, 5), 1.0, m)
        b.add_triangle((-1, -1, 2), (1, -1, 2), (0, 2, 2), m)
        scene = b.build()
        o, d = _rays(((0, 0, 0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_TRIANGLE
        np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-6)

    def test_area_light_closest(self):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 1, 1))
        b.add_plane((0, 0, 3), (0, 0, -1), m)
        b.add_area_light((-1, -1, 1), (1, -1, 1), (0, 2, 1), (0.9, 0.9, 0.9))
        scene = b.build()
        o, d = _rays(((0, 0, 0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(scene, o, d, *_no_prev(1))
        assert hit.prim_kind[0] == C.PRIM_LIGHT
        assert hit.mat_id[0] == -1
        np.testing.assert_allclose(hit.light_le[0], (0.9, 0.9, 0.9))


class TestShadow:
    def test_occluded(self):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 1, 1))
        b.add_sphere((0, 0, 2), 0.5, m)
        scene = b.build()
        o = jnp.zeros((2, 3), jnp.float32)
        d = jnp.asarray([[0, 0, 1], [0, 1, 0]], jnp.float32)
        dist = jnp.asarray([5.0, 5.0])
        blocked = intersect.occluded_naive(scene, o, d, dist, *_no_prev(2))
        assert bool(blocked[0]) and not bool(blocked[1])

    def test_beyond_distance_not_occluded(self):
        b = SceneBuilder()
        m = b.add_material(kd=(1, 1, 1))
        b.add_sphere((0, 0, 10), 0.5, m)
        scene = b.build()
        o = jnp.zeros((1, 3), jnp.float32)
        d = jnp.asarray([[0, 0, 1]], jnp.float32)
        blocked = intersect.occluded_naive(
            scene, o, d, jnp.asarray([5.0]), *_no_prev(1))
        assert not bool(blocked[0])


class TestChunkedScan:
    def test_many_triangles_closest(self):
        # More primitives than one chunk (512) to exercise the scan path.
        rng = np.random.default_rng(0)
        b = SceneBuilder()
        m = b.add_material(kd=(1, 1, 1))
        zs = rng.uniform(2.0, 100.0, size=700)
        for z in zs:
            b.add_triangle((-1, -1, z), (1, -1, z), (0, 2, z), m)
        scene = b.build()
        o, d = _rays(((0, 0, 0), (0, 0, 1)))
        hit = intersect.intersect_scene_naive(scene, o, d, *_no_prev(1))
        np.testing.assert_allclose(hit.t[0], zs.min(), rtol=1e-5)
        assert hit.prim_id[0] == int(np.argmin(zs))
