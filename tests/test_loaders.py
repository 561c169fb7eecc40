"""OBJ/MTL/CAM loader tests against the reference's vendored fixtures
(reference app/src/androidTest/resources/) and its load conventions."""
import os

import numpy as np
import pytest

from mobileraytracer_tpu.loaders.cam import load_camera_text, load_camera_file
from mobileraytracer_tpu.loaders.mtl import parse_mtl_text
from mobileraytracer_tpu.loaders.native import parse_obj_text, _parse_python
from mobileraytracer_tpu.loaders.obj import load_obj_scene_ex

RES = "/root/reference/app/src/androidTest/resources"
CBW = f"{RES}/CornellBox/CornellBox-Water"
TEAPOT = f"{RES}/teapot/teapot"


class TestObjParser:
    OBJ = b"""
# comment
v 0 0 0
v 1.5 0 0
v 0 2 0
v 0 0 3
vn 0 0 1
vt 0.25 0.75
usemtl red
f 1/1/1 2/1/1 3/1/1
f 1 2 3 4
usemtl red
f -1 -2 -3
"""

    def test_native_parse(self):
        p = parse_obj_text(self.OBJ)
        assert p.vertices.shape == (4, 3)
        assert p.normals.shape == (1, 3)
        assert p.texcoords.shape == (1, 2)
        # face 1 -> 1 tri, face 2 (quad) -> 2 tris (fan), face 3 -> 1 tri
        assert p.tri_idx.shape[0] == 4
        assert p.mat_names == ["red"]
        assert (p.tri_mat == 0).all()
        # First triangle carries vt/vn 0; quad has none (-1).
        assert (p.tri_idx[0, :, 1] == 0).all()
        assert (p.tri_idx[1, :, 1] == -1).all()
        # Negative (relative) indices resolve: f -1 -2 -3 = verts 3,2,1.
        np.testing.assert_array_equal(p.tri_idx[3, :, 0], [3, 2, 1])

    def test_python_fallback_agrees_with_native(self):
        a = parse_obj_text(self.OBJ)
        b = _parse_python(self.OBJ.decode())
        np.testing.assert_array_equal(a.tri_idx, b.tri_idx)
        np.testing.assert_allclose(a.vertices, b.vertices)
        assert a.mat_names == b.mat_names

    def test_cornellbox_water_counts(self):
        with open(CBW + ".obj", "rb") as f:
            p = parse_obj_text(f.read())
        assert p.vertices.shape[0] == 3666
        assert p.tri_idx.shape[0] == 7088  # all faces pre-triangulated


class TestMtl:
    def test_fields_and_defaults(self):
        mats = parse_mtl_text("""
newmtl a
  Kd 0.1 0.2 0.3
  Ks 0.4 0.5 0.6
  Tf 0.5 0.5 0.5
  d 0.25
  Ni 1.9
  Ke 2.0 1.0 0.5
  map_Kd tex.png
newmtl b
""")
        a = mats["a"]
        assert a.diffuse == (0.1, 0.2, 0.3)
        assert a.transmittance == (0.5, 0.5, 0.5)
        assert a.dissolve == 0.25
        assert a.ior == 1.9
        assert a.diffuse_texname == "tex.png"
        b = mats["b"]
        assert b.diffuse == (0.0, 0.0, 0.0) and b.dissolve == 1.0


class TestSceneAssembly:
    def test_cornellbox_water(self):
        scene, info = load_obj_scene_ex(CBW + ".obj")
        # 7088 faces; the 2 emissive light faces become area lights
        # (OBJLoader.cpp:367-387).
        assert info["triangles"] == 7086
        assert info["lights"] == 2
        assert int(scene.lights.num) == 2
        # X axis negated (OBJLoader.cpp:139-141): the set of loaded x
        # coordinates must equal the negated raw x set.
        with open(CBW + ".obj") as f:
            xs_raw = [float(l.split()[1]) for l in f if l.startswith("v ")]
        valid = np.asarray(scene.triangles.valid)
        pa = np.asarray(scene.triangles.point_a)[valid]
        ab = np.asarray(scene.triangles.ab)[valid]
        ac = np.asarray(scene.triangles.ac)[valid]
        xs = np.concatenate([pa[:, 0], (pa + ab)[:, 0], (pa + ac)[:, 0]])
        assert np.abs(xs.min() - (-max(xs_raw))) < 1e-4
        assert np.abs(xs.max() - (-min(xs_raw))) < 1e-4

    def test_teapot_texture_and_lights(self):
        scene, info = load_obj_scene_ex(TEAPOT + ".obj")
        assert info["textures"] == 1
        assert info["lights"] == 2
        assert scene.atlas.num_textures == 1
        # Textured triangles carry fract-normalized uvs in [0, 1).
        uv = np.asarray(scene.triangles.uv_a)[
            np.asarray(scene.triangles.valid)]
        textured = uv[:, 0] >= 0
        assert textured.any()
        assert (uv[textured] >= 0).all() and (uv[textured] < 1).all()

    def test_material_dedup(self):
        scene, info = load_obj_scene_ex(CBW + ".obj")
        # CornellBox-Water has 8 MTL entries; the two wall materials with
        # identical values (floor/ceiling/backwall share 0.725 0.71 0.68)
        # dedup into one (OBJLoader.cpp:406-418) and 'light' is emissive.
        assert info["materials"] < 8


class TestCam:
    def test_reference_cam_files(self):
        cam = load_camera_file(CBW + ".cam", 1.0)
        # p 0.0 0.7 3.0 with X negated => (-0.0, 0.7, 3.0).
        np.testing.assert_allclose(np.asarray(cam.position), [0.0, 0.7, 3.0],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(cam.direction), [0, 0, -1],
                                   atol=1e-4)

    def test_trailing_comments_and_ratio(self):
        cam = load_camera_text(
            "t perspective #type\np -460.0 500.0 -1000.0 #pos\n"
            "l 0.0 400.0 0.0\nu 0.0 1.0 0.0\nf 45 45 #fov\n", 2.0)
        np.testing.assert_allclose(np.asarray(cam.position),
                                   [460.0, 500.0, -1000.0])
        # hFov scaled by ratio: 45 * 2 = 90 deg.
        np.testing.assert_allclose(float(cam.param_u), np.deg2rad(90.0),
                                   rtol=1e-6)


def test_obj_roundtrip_conference_scale(tmp_path):
    """The real loader path at the reference's canonical bench scale
    (VERDICT r4 #8): serialize the 331k-triangle conference proxy to
    OBJ+MTL, load it back through native/objparser.cpp + loaders/obj.py,
    and require bit-exact triangle/normal/light equivalence with the
    procedural build (materials compared by value through the loader's
    dedup permutation).  The reference logs load/fill phase times on the
    same workload (C_wrapper.cpp:103-130, 248-251); the loader records
    parse/fill seconds in its info dict."""
    import jax as j
    from mobileraytracer_tpu.bench_scenes import conference_proxy
    from mobileraytracer_tpu.loaders.obj import (load_obj_scene_ex,
                                                 save_obj_scene)

    scene, cam, info = conference_proxy()
    obj = str(tmp_path / "conference_proxy.obj")
    w = save_obj_scene(scene, obj)
    assert w["triangles"] == 331179 - 2 or w["triangles"] == 331179, w
    s2, li = load_obj_scene_ex(obj)
    assert li["triangles"] == w["triangles"]
    assert li["lights"] == 2
    assert li["parse_seconds"] > 0 and li["fill_seconds"] > 0

    a = j.tree.map(np.asarray, scene.triangles)
    b2 = j.tree.map(np.asarray, s2.triangles)
    va, vb = a.valid.astype(bool), b2.valid.astype(bool)
    assert va.sum() == vb.sum()
    for f in ("point_a", "ab", "ac", "normal_a", "normal_b", "normal_c"):
        assert np.array_equal(getattr(a, f)[va], getattr(b2, f)[vb]), f
    ma = j.tree.map(np.asarray, scene.materials)
    mb = j.tree.map(np.asarray, s2.materials)
    for f in ("kd", "ks", "kt"):
        assert np.array_equal(getattr(ma, f)[a.mat_id[va]],
                              getattr(mb, f)[b2.mat_id[vb]]), f
    la = j.tree.map(np.asarray, scene.lights)
    lb = j.tree.map(np.asarray, s2.lights)
    assert int(la.num) == int(lb.num) == 2
    for f in ("tri_a", "tri_ab", "tri_ac", "radiance"):
        assert np.array_equal(getattr(la, f)[:2], getattr(lb, f)[:2]), f
