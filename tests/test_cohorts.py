"""Depth cohorts (chain._perturb_with_cohorts): the cohorted small step
must reproduce the plain full-depth step's proposals exactly for every
lane whose subpath fits the short record."""

import numpy as np
import jax
import jax.numpy as jnp

from langevin_mcmc_tpu.scene.parse import parse_scene
from langevin_mcmc_tpu.integrators import mlt
from langevin_mcmc_tpu.mcmc import chain as chain_mod
from langevin_mcmc_tpu.path.records import (truncate_record, embed_record,
                                            get_path_pss)


def _setup():
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=(32, 24))
    opts = opts.replace(max_depth=4, mala=True, num_chains=64,
                        num_init_samples=2048)
    b, length_dist, banked = mlt.bootstrap(scene, opts,
                                           jax.random.PRNGKey(3), chunk=512)
    return scene, opts, banked.state


def test_truncate_embed_roundtrip():
    scene, opts, state = _setup()
    rec = state.rec
    short = truncate_record(rec, 2)
    assert short.max_depth == 2
    back = embed_record(short, rec)
    for name in ('cam_tri', 'lgt_tri', 'cam_bsdf_rnd', 'cam_rr',
                 'screen_pos', 'time', 'cam_depth'):
        np.testing.assert_array_equal(np.asarray(getattr(back, name)),
                                      np.asarray(getattr(rec, name)),
                                      err_msg=name)


def test_cohort_step_matches_plain():
    scene, opts, state = _setup()
    key = jax.random.PRNGKey(11)
    plain_opts = opts.replace(depth_cohorts=False)
    co_opts = opts.replace(depth_cohorts=True, cohort_depth=3,
                           cohort_full_fraction=0.75)
    prop_a, a_a = jax.jit(
        lambda k, st: chain_mod.small_step_mala(scene, plain_opts, k, st)
    )(key, state)
    prop_b, a_b = jax.jit(
        lambda k, st: chain_mod.small_step_mala(scene, co_opts, k, st)
    )(key, state)

    s = np.asarray(state.rec.cam_depth)
    t = np.asarray(state.rec.lgt_depth)
    fit = (s + t - 1) <= 3
    n_long = int((~fit).sum())
    # overflow only bites when > K_f lanes are long; keep the test honest
    K_f = max(int(64 * 0.75), 8)
    assert n_long <= K_f, f'{n_long} long lanes > budget {K_f}: retune test'

    ok_a = np.asarray(prop_a['ok'])
    ok_b = np.asarray(prop_b['ok'])
    np.testing.assert_array_equal(ok_a, ok_b)
    m = ok_a
    assert m.sum() >= 5
    # the two programs share the same offsets (same key): proposals agree
    np.testing.assert_allclose(np.asarray(prop_b['ss'])[m],
                               np.asarray(prop_a['ss'])[m],
                               rtol=2e-4, err_msg='ss')
    np.testing.assert_allclose(np.asarray(a_b)[m], np.asarray(a_a)[m],
                               rtol=3e-4, atol=1e-6, err_msg='accept')
    pss_a = np.asarray(get_path_pss(prop_a['rec'], 8))
    pss_b = np.asarray(get_path_pss(prop_b['rec'], 8))
    np.testing.assert_allclose(pss_b[m], pss_a[m], atol=2e-6,
                               err_msg='proposal pss')
