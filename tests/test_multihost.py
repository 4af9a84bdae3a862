"""Multi-host driver on the virtual 8-device CPU mesh (single process).

Validates the mesh-sharded render path end-to-end: distributed bootstrap
reductions, chains sharded over all devices, replicated film psum."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langevin_mcmc_tpu.scene.parse import parse_scene
from langevin_mcmc_tpu.parallel import multihost


def test_global_sum_single_process():
    assert float(multihost.global_sum(np.float64(3.5))) == 3.5
    np.testing.assert_allclose(
        np.asarray(multihost.global_sum(np.array([1.0, 2.0]))),
        [1.0, 2.0])


@pytest.mark.slow
def test_render_mlt_multihost_virtual_mesh():
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=(32, 24))
    opts = opts.replace(max_depth=4, mala=True, num_chains=64,
                        num_init_samples=2048, direct_spp=4,
                        large_step_probability=0.3)
    assert len(jax.devices()) == 8, 'conftest should force 8 CPU devices'
    film, b = multihost.render_mlt_multihost(
        scene, opts, jax.random.PRNGKey(0), num_steps=8, chunk=512)
    f = np.asarray(film)
    assert np.isfinite(f).all()
    assert f.sum() > 0.0
    assert b > 0.0


@pytest.mark.slow
def test_bootstrap_multihost_matches_single(monkeypatch):
    """With one process the distributed bootstrap must agree with the
    plain one (same key path)."""
    from langevin_mcmc_tpu.integrators import mlt
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=(32, 24))
    opts = opts.replace(max_depth=4, mala=True, num_chains=32,
                        num_init_samples=1024)
    key = jax.random.PRNGKey(5)
    b1, ld1, _ = multihost.bootstrap_multihost(scene, opts, key, chunk=512)
    b2, ld2, _ = mlt.bootstrap(scene, opts, jax.random.fold_in(key, 0),
                               chunk=512)
    np.testing.assert_allclose(b1, float(b2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ld1.func),
                               np.asarray(ld2.func), rtol=1e-5)
