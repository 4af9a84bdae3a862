"""GenerateSubpath parity: a fixed-(s,t) walk on the same random tape must
reproduce the bidirectional generator's (s,t) slot exactly (path lengths
below the Russian-roulette threshold, so rrWeight == 1 on both sides —
reference path.cpp:1451-1659 vs 1237-1449)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langevin_mcmc_tpu.scene.parse import parse_scene
from langevin_mcmc_tpu.path import trace
from langevin_mcmc_tpu.path.records import get_path_pss, pss_dim


@pytest.fixture(scope='module')
def torus_small():
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=(64, 48))
    opts = opts.replace(max_depth=4)
    return scene, opts


@pytest.mark.parametrize('slot', [(2, 0), (3, 0), (4, 0), (2, 1), (3, 1),
                                  (2, 2), (3, 2), (2, 3), (1, 2), (1, 3)])
def test_subpath_matches_bidir_slot(torus_small, slot):
    scene, opts = torus_small
    s, t = slot
    B, D = 256, opts.max_depth
    tape = trace.draw_tape(jax.random.PRNGKey(7), (B,), D)
    rec_b, con, _, _ = trace.generate_path_bidir(
        scene, opts, tape, min_depth=-1, max_depth=-1)
    if s >= 2:
        ls_gen = np.asarray(con.ls_score[:, s - 2, t])
        ss_gen = np.asarray(con.ss_score[:, s - 2, t])
        ctr_gen = np.asarray(con.contrib[:, s - 2, t])
        scr_gen = np.asarray(con.screen_pos[:, s - 2, t])
    else:
        ls_gen = np.asarray(con.l_ls_score[:, t - 2])
        ss_gen = np.asarray(con.l_ss_score[:, t - 2])
        ctr_gen = np.asarray(con.l_contrib[:, t - 2])
        scr_gen = np.asarray(con.l_screen_pos[:, t - 2])
    mask = ls_gen > 1e-8
    if mask.sum() < 3:
        pytest.skip(f'too few ({mask.sum()}) bidir paths with slot {slot}')

    rec_s, res = trace.generate_subpath(
        scene, opts, tape, jnp.full(B, s, jnp.int32),
        jnp.full(B, t, jnp.int32))
    valid = np.asarray(res['valid'])
    # every bidir hit must be reproduced
    assert valid[mask].all(), f'{(~valid[mask]).sum()} lanes lost'
    m = mask
    np.testing.assert_allclose(np.asarray(res['ls'])[m], ls_gen[m],
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res['ss'])[m], ss_gen[m],
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res['contrib'])[m], ctr_gen[m],
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res['screen'])[m], scr_gen[m],
                               rtol=1e-5, atol=1e-9)
    # tags + PSS dimension
    assert (np.asarray(rec_s.cam_depth) == s).all()
    assert (np.asarray(rec_s.lgt_depth) == t).all()
    assert (np.asarray(pss_dim(rec_s)) == 2 * (s + t - 1)).all()


def test_subpath_mixed_lanes(torus_small):
    """Per-lane (s,t) heterogeneity: each lane reproduces its own slot."""
    scene, opts = torus_small
    B, D = 256, opts.max_depth
    tape = trace.draw_tape(jax.random.PRNGKey(11), (B,), D)
    rec_b, con, _, _ = trace.generate_path_bidir(
        scene, opts, tape, min_depth=-1, max_depth=-1)
    slots = [(2, 0), (3, 1), (2, 2)]
    s = jnp.asarray([slots[i % 3][0] for i in range(B)], jnp.int32)
    t = jnp.asarray([slots[i % 3][1] for i in range(B)], jnp.int32)
    _, res = trace.generate_subpath(scene, opts, tape, s, t)
    ls_gen = np.asarray(jnp.take_along_axis(
        jnp.take_along_axis(con.ls_score, (s - 2)[:, None, None], 1),
        t[:, None, None], 2))[:, 0, 0]
    m = ls_gen > 1e-8
    if m.sum() < 3:
        pytest.skip('too few')
    np.testing.assert_allclose(np.asarray(res['ls'])[m], ls_gen[m],
                               rtol=1e-5, atol=1e-9)
