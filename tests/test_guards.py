"""Debug-guard tests (utils/guards.py): the analogues of the reference's
sanitizer builds, ctor-assert death tests, and checkSystemError layer."""
import dataclasses

import jax
import numpy as np
import pytest

from mobileraytracer_tpu import constants as C
from mobileraytracer_tpu import scenes
from mobileraytracer_tpu.types import RenderConfig
from mobileraytracer_tpu.utils import guards

KEY = jax.random.PRNGKey(0)


def _cfg(**kw):
    kw.setdefault("width", 16)
    kw.setdefault("height", 16)
    kw.setdefault("spp", 1)
    kw.setdefault("shader", C.SHADER_NOSHADOWS)
    kw.setdefault("accelerator", C.ACC_NAIVE)
    return RenderConfig(**kw)


def test_validate_accepts_builtin_scenes():
    for sid in range(4):
        scene, _ = scenes.load_builtin(sid, 1.0)
        guards.validate_scene(scene)


def test_validate_rejects_nan_vertex():
    # Death-test tier: invalid geometry must be rejected before tracing
    # (reference TestAABB.cpp:27-32, Ray ctor asserts Ray.hpp:13-72).
    scene, _ = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    pa = np.asarray(scene.triangles.point_a).copy()
    pa[0, 0] = np.nan
    bad = dataclasses.replace(
        scene, triangles=dataclasses.replace(scene.triangles, point_a=pa))
    with pytest.raises(guards.SceneError, match="point_a"):
        guards.validate_scene(bad)


def test_validate_rejects_nonpositive_radius():
    scene, _ = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    r2 = np.asarray(scene.spheres.sq_radius).copy()
    if not np.asarray(scene.spheres.valid).any():
        pytest.skip("no spheres")
    r2[np.argmax(np.asarray(scene.spheres.valid))] = 0.0
    bad = dataclasses.replace(
        scene, spheres=dataclasses.replace(scene.spheres, sq_radius=r2))
    with pytest.raises(guards.SceneError, match="sq_radius"):
        guards.validate_scene(bad)


@pytest.mark.slow
def test_checked_render_clean_scene_passes():
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    out = guards.checked_render(scene, cam, _cfg(), KEY)
    img = np.asarray(out["image"])
    assert np.isfinite(img).all() and img.max() > 0


@pytest.mark.slow
def test_checked_render_detects_nan_material():
    # A NaN smuggled into the material table must trip the float checks
    # inside the compiled program, not silently corrupt the film
    # (SURVEY §5.2: checkify as the ASan analogue).
    scene, cam = scenes.load_builtin(C.SCENE_CORNELL, 1.0)
    kd = np.asarray(scene.materials.kd).copy()
    kd[0] = np.nan
    bad = dataclasses.replace(
        scene, materials=dataclasses.replace(scene.materials, kd=kd))
    with pytest.raises(guards.RenderError, match="nan|div|inf"):
        guards.checked_render(bad, cam, _cfg(), KEY)


def test_oom_guard_translates_resource_exhausted():
    with pytest.raises(guards.LowDeviceMemoryError):
        with guards.device_oom_guard():
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating X")


def test_oom_guard_passes_other_errors():
    with pytest.raises(ValueError):
        with guards.device_oom_guard():
            raise ValueError("unrelated")
