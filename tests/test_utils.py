import numpy as np
import jax.numpy as jnp

from langevin_mcmc_tpu.utils import vecmath as vm
from langevin_mcmc_tpu.utils.distribution import Distribution1D
from langevin_mcmc_tpu.utils import image_io


def test_coordinate_system_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(100, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    b0, b1 = vm.coordinate_system(jnp.asarray(n))
    b0, b1 = np.asarray(b0), np.asarray(b1)
    assert np.abs((b0 * n).sum(1)).max() < 1e-5
    assert np.abs((b1 * n).sum(1)).max() < 1e-5
    assert np.abs((b0 * b1).sum(1)).max() < 1e-4
    assert np.abs(np.linalg.norm(b0, axis=1) - 1).max() < 1e-5


def test_sphere_roundtrip():
    rng = np.random.default_rng(1)
    uv = rng.uniform(0.05, 0.95, size=(50, 2)).astype(np.float32)
    d, jac = vm.sample_sphere(jnp.asarray(uv))
    uv2, jac2 = vm.to_spherical_coord(d)
    assert np.allclose(np.asarray(uv2), uv, atol=1e-4)
    assert np.allclose(np.asarray(jac), np.asarray(jac2), rtol=1e-4)


def test_distribution_sample_discrete():
    w = np.array([1.0, 3.0, 0.0, 2.0], np.float32)
    d = Distribution1D(w)
    u = np.linspace(0.001, 0.999, 10000).astype(np.float32)
    idx, pmf = d.sample_discrete(jnp.asarray(u))
    idx = np.asarray(idx)
    freq = np.bincount(idx, minlength=4) / len(u)
    assert np.allclose(freq, w / w.sum(), atol=0.01)
    assert np.allclose(np.asarray(pmf), (w / w.sum())[idx], rtol=1e-5)


def test_exr_roundtrip(tmp_path):
    img = np.random.default_rng(2).random((33, 47, 3)).astype(np.float32)
    p = str(tmp_path / 'x.exr')
    image_io.write_exr(p, img)
    assert np.abs(image_io.read_exr(p) - img).max() == 0.0


def test_exr_reads_reference_assets():
    img = image_io.read_exr('/root/reference/scenes/torus/data/sunsky.exr')
    assert img.shape == (256, 512, 3)
    assert np.isfinite(img).all() and img.max() > 100  # sun is bright


def test_refract_matches_snell():
    # entering a denser medium straight on: direction flips
    wi = jnp.asarray([0.0, 0.0, 1.0])
    n = jnp.asarray([0.0, 0.0, 1.0])
    eta, inv_eta = 1.5, 1.0 / 1.5
    # cosThetaT from FresnelDielectricExt convention: entering -> negative
    wo = vm.refract(wi, n, jnp.asarray(-1.0), eta, inv_eta)
    assert np.allclose(np.asarray(wo), [0, 0, -1], atol=1e-6)
