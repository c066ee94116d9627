"""SceneBuilder packing/padding + unified-schema round trip
(ref: scene_api.js:52-319)."""

import numpy as np
import pytest

from ascii_renderer_tpu.scene import (MaterialIds, SceneBuilder, from_object)
from ascii_renderer_tpu.scene.demo import create_demo_scene


def test_default_materials_match_reference_table():
    sb = SceneBuilder()
    m = sb.get_material(MaterialIds.WHITE)
    np.testing.assert_allclose(m.albedo, (0.7295, 0.7355, 0.7290))
    assert not m.emissive and not m.reflective and m.roughness == 0.6
    light = sb.get_material(MaterialIds.LIGHT)
    assert light.emissive
    np.testing.assert_allclose(light.emission, (16.86, 10.76, 8.2))
    assert sb.get_material(MaterialIds.GLASS).reflective
    assert sb.get_material(MaterialIds.MIRROR).reflective


def test_undefined_material_id_coerces_to_zero():
    # The reference's scene.js passes undefined MaterialIds.LIGHT_RED etc.;
    # _u32(undefined) -> 0 -> LIGHT exists -> used (SURVEY quirk).
    sb = SceneBuilder()
    sb.add_quad(material_id=None)
    assert sb.to_unified()["geometry"]["quads"][0]["matId"] == 0


def test_unknown_but_valid_id_falls_back_to_white():
    sb = SceneBuilder()
    sb.add_sphere(material_id=42)  # not in table, nonzero
    assert sb.to_unified()["geometry"]["spheres"][0]["matId"] == MaterialIds.WHITE


def test_caps_silently_drop_overflow():
    sb = SceneBuilder(max_spheres=2)
    for i in range(5):
        sb.add_sphere([i, 0, 0], 1.0)
    assert len(sb.to_unified()["geometry"]["spheres"]) == 2


def test_bad_args_raise():
    sb = SceneBuilder()
    with pytest.raises(ValueError):
        sb.add_sphere([float("nan"), 0, 0], 1.0)
    with pytest.raises(ValueError):
        sb.set_camera_pose([0, 0, 0], yaw=float("inf"))


def test_u16_uv_clamping():
    sb = SceneBuilder()
    sb.add_triangle(uv_a=(-5, 70000), uv_b=(3.7, 2), uv_c=(0, 0))
    t = sb.to_unified()["geometry"]["tris"][0]
    assert t["uvA"] == [0, 0xFFFF]
    assert t["uvB"] == [3, 2]


def test_build_padding_and_counts():
    scene = create_demo_scene().build()
    assert int(scene.n_quad) == 11  # 6 room + 1 poster + 4 lights
    assert int(scene.n_sph) == 2
    assert scene.quad_a.shape[0] % 8 == 0 and scene.quad_a.shape[0] >= 11
    assert scene.sph_pos.shape[0] == 8
    # camera pose flows into the packed pytree
    np.testing.assert_allclose(np.asarray(scene.camera.pos), [0, 1.5, 6.0])
    # demo light quads carry material 0 (the reproduced undefined-id quirk)
    assert np.asarray(scene.quad_mat)[7:11].tolist() == [0, 0, 0, 0]


def test_unified_roundtrip():
    sb = create_demo_scene()
    obj = sb.to_unified()
    sb2 = from_object(obj)
    obj2 = sb2.to_unified()
    assert obj["geometry"] == obj2["geometry"]
    assert obj["lights"] == obj2["lights"]
    assert obj["camera"] == pytest.approx(obj2["camera"]) or obj["camera"] == obj2["camera"]
    # JSON-able
    import json
    json.dumps(obj)


def test_reset_keeps_materials():
    sb = SceneBuilder()
    sb.add_material(9, {"albedo": [0.1, 0.2, 0.3]})
    sb.add_sphere()
    sb.reset()
    assert sb.has_material(9)
    assert not sb.to_unified()["geometry"]["spheres"]
