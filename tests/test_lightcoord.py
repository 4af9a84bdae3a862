"""Light-coordinate sampling (useLightCoordinateSampling): the (s,0)
technique's last BSDF sampling is reparameterized into the area light's
sample coordinates (reference path.cpp:1339-1373 generation,
path.cpp:1881-1952 replay, trianglemesh.cpp:255-291 GetSampleParam).

Uses tests/data/lcbox.xml — an enclosed diffuse box with a large ceiling
area light, so (s,0) direct light hits are common."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langevin_mcmc_tpu.scene.parse import parse_scene
from langevin_mcmc_tpu.path import trace, replay
from langevin_mcmc_tpu.path.records import to_subpath
from langevin_mcmc_tpu.ops import lights as lo

import os
LCBOX = os.path.join(os.path.dirname(__file__), 'data', 'lcbox.xml')


@pytest.fixture(scope='module')
def lcbox():
    scene, opts, _ = parse_scene(LCBOX)
    opts = opts.replace(max_depth=4, use_light_coordinate_sampling=True)
    return scene, opts


def test_get_sample_param_inverts_sample_tri(lcbox):
    scene, opts = lcbox
    B = 256
    lt = np.asarray(scene.tri_light)
    light_tris = np.where(lt >= 0)[0]
    assert len(light_tris) > 0
    tri = jnp.asarray(np.random.default_rng(0).choice(light_tris, B))
    u = jax.random.uniform(jax.random.PRNGKey(0), (B, 2),
                           minval=0.05, maxval=0.95)
    tm = jnp.zeros(B)
    pos, _ = lo._sample_tri(scene, tri, u, tm)
    u2 = lo.get_sample_param(scene, tri, pos, tm)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize('s', [3, 4])
def test_lc_zero_offset_replay_parity(lcbox, s):
    """Zero-offset perturb AND frozen replay reproduce the generated
    (s,0) ssScore exactly — the consistency the bidir reference breaks by a
    constant totalArea factor (see replay.py lc notes)."""
    scene, opts = lcbox
    B, D = 512, opts.max_depth
    tape = trace.draw_tape(jax.random.PRNGKey(3), (B,), D)
    rec, con, _, _ = trace.generate_path_bidir(scene, opts, tape,
                                               min_depth=-1, max_depth=-1)
    ls = np.asarray(con.ls_score[:, s - 2, 0])
    ss = np.asarray(con.ss_score[:, s - 2, 0])
    m = ls > 1e-8
    assert m.sum() >= 10, f'box scene should hit the light often: {m.sum()}'
    rec_t = to_subpath(rec, jnp.full((B,), s, jnp.int32),
                       jnp.zeros((B,), jnp.int32))
    noise = dict(time=jnp.zeros(B), cam_disc=jnp.zeros((B, D)),
                 lgt_disc=jnp.zeros((B, D)))
    _, res = replay.replay_path(scene, opts, rec_t, jnp.zeros((B, 2 * D)),
                                noise, mode='perturb')
    v = np.asarray(res['valid'])
    assert v[m].mean() > 0.99
    mm = m & v
    np.testing.assert_allclose(np.asarray(res['ss_score'])[mm], ss[mm],
                               rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res['ls_score'])[mm], ls[mm],
                               rtol=2e-4, atol=1e-9)
    _, resf = replay.replay_path(scene, opts, rec_t, jnp.zeros((B, 2 * D)),
                                 None, mode='frozen')
    mf = m & np.asarray(resf['valid'])
    np.testing.assert_allclose(np.asarray(resf['ss_score'])[mf], ss[mf],
                               rtol=2e-4, atol=1e-9)


@pytest.mark.slow
def test_lc_gradient_flows_through_light_coords(lcbox):
    """The frozen replay's gradient w.r.t. the reparameterized light
    coordinates is finite and non-zero (the whole point of the reparam:
    derivatives move the point ON the light)."""
    scene, opts = lcbox
    B, D = 192, opts.max_depth
    tape = trace.draw_tape(jax.random.PRNGKey(7), (B,), D)
    rec, con, _, _ = trace.generate_path_bidir(scene, opts, tape,
                                               min_depth=-1, max_depth=-1)
    ls = np.asarray(con.ls_score[:, 2, 0])   # slot (4,0)
    m = ls > 1e-8
    assert m.sum() >= 5
    rec_t = to_subpath(rec, jnp.full((B,), 4, jnp.int32),
                       jnp.zeros((B,), jnp.int32))
    g = np.asarray(replay.path_grad(scene, opts, rec_t))
    assert np.isfinite(g).all()
    # dims 4,5 = last cam vertex bsdf pair (s=4,t=0: screen(2) + 2 pairs)
    lc_dims = np.abs(g[m][:, 4:6]).sum(1)
    assert (lc_dims > 0).mean() > 0.5, 'gradients dead in light coords'
