"""Guards for the collapsed splat-bank invariant.

integrators.mlt.collapse_flat pre-sums every s >= 2 technique of a lane
into ONE splat point using the first cam slot's screen position — exact
only because generate_path_bidir broadcasts a single camera screen over
the whole cam contribution grid (trace.py `scr = broadcast_to(...)`).
This test pins that invariant so a future generator change writing
per-technique camera screens fails loudly instead of corrupting films
(ADVICE r2)."""

import numpy as np
import jax
import pytest

from langevin_mcmc_tpu.scene.parse import parse_scene
from langevin_mcmc_tpu.path import trace


@pytest.fixture(scope='module')
def torus_tiny():
    scene, opts, _ = parse_scene('/root/reference/scenes/torus/lmc.xml',
                                 film_wh=(32, 24))
    return scene, opts.replace(max_depth=3)


def test_cam_techniques_share_one_screen(torus_tiny):
    scene, opts = torus_tiny
    D = opts.max_depth
    B = 64
    tape = trace.draw_tape(jax.random.PRNGKey(3), (B,), D)
    rec, con, _, _ = trace.generate_path_bidir(scene, opts, tape,
                                               min_depth=3, max_depth=D)
    flat, s_tags, t_tags = con.flatten()
    scr = np.asarray(flat['screen_pos'])          # [B, NS, 2]
    s_tags = np.asarray(s_tags)
    cam = np.nonzero(s_tags >= 2)[0]
    ref = scr[:, cam[0], :]
    diff = np.abs(scr[:, cam, :] - ref[:, None, :]).max()
    assert diff == 0.0, (
        f'cam-technique screens diverge by {diff}: collapse_flat '
        f'(integrators/mlt.py) would mis-splat pre-summed banks')
