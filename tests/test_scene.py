import numpy as np

from langevin_mcmc_tpu.scene.mesh import load_serialized, load_obj, compute_vertex_normals
from langevin_mcmc_tpu.scene.scenedata import BSDF_LAMBERTIAN, BSDF_PHONG, BSDF_ROUGH_DIELECTRIC


def test_load_serialized_torus():
    m = load_serialized('/root/reference/scenes/torus/data/meshes.serialized', 2)
    assert m.indices.shape == (16384, 3)
    assert np.isfinite(m.position).all()
    n = np.linalg.norm(m.normal[0], axis=1)
    assert np.allclose(n[n > 0], 1.0, atol=1e-4)


def test_load_obj_veachdoor():
    m = load_obj('/root/reference/scenes/veachdoor/data/teapot1.obj')
    assert len(m.indices) > 0
    assert np.isfinite(m.position).all()


def test_vertex_normals_flat_quad():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    n = compute_vertex_normals(v, idx)
    assert np.allclose(n, [[0, 0, 1]] * 4, atol=1e-6)


def test_parse_torus(torus_scene):
    scene, opts, name = torus_scene
    assert scene.num_tris == 23614
    assert scene.width == 1024 and scene.height == 768
    assert opts.mala and not opts.h2mc
    assert opts.spp == 245
    types = np.asarray(scene.mat_type)
    assert set(types.tolist()) == {BSDF_LAMBERTIAN, BSDF_PHONG, BSDF_ROUGH_DIELECTRIC}
    # env light present
    assert scene.env_light_id == 0
    assert scene.env_image.shape == (256, 512, 3)


def test_parse_veachdoor():
    from langevin_mcmc_tpu.scene.parse import parse_scene
    scene, opts, name = parse_scene('/root/reference/scenes/veachdoor/lmc.xml')
    assert scene.num_tris > 0
    assert scene.num_lights >= 1
    assert np.asarray(scene.light_ntri).max() > 0  # has an area light
