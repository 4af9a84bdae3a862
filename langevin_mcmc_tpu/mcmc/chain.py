"""Vectorized Markov-chain state and the combined mutation step.

The reference advances each chain sequentially on its own thread
(mlt.cpp:60-196); here ALL chains advance in lockstep as one wavefront:
every step evaluates the large-step path generation and the configured
small-step proposal for every lane and selects per-lane — the branchless
TPU equivalent of the per-chain virtual Mutation dispatch. Chains are
sharded over the device mesh by the parallel layer.

State mirrors MarkovState + Chain (mlt.h:30-39, mutation.h:28-43).
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm
from ..path import trace, replay
from ..path.records import (PathRecord, to_subpath, get_path_pss,
                            empty_record, pss_dim)
from . import gaussian as G

MutationKind = dict(ISO=0, MALA=1, H2MC=2)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields,
                                            meta_fields=[])


@_register
@dataclasses.dataclass(frozen=True)
class ChainState:
    """Per-chain persistent state, batch dims lead ([C])."""
    rec: PathRecord            # current subpath-tagged path
    valid: jnp.ndarray         # [C] bool (MarkovState::valid)
    contrib: jnp.ndarray       # [C,3] current spContrib.contrib
    screen_pos: jnp.ndarray    # [C,2]
    ls_score: jnp.ndarray      # [C]
    ss_score: jnp.ndarray      # [C]
    score_sum: jnp.ndarray     # [C] (large-step augmented space)
    # chain moments (mutation.h:28-43)
    v1: jnp.ndarray            # [C,Dm]
    v2: jnp.ndarray            # [C,Dm]
    g: jnp.ndarray             # [C,Dm]
    t: jnp.ndarray             # [C] int32
    buffered: jnp.ndarray      # [C] bool
    stepsize: jnp.ndarray      # [C]
    gaussian: G.Gaussian       # cached proposal gaussian of current state
    gaussian_init: jnp.ndarray  # [C] bool
    # large-step bookkeeping (mutation_large.h:16-17)
    last_score_sum: jnp.ndarray  # [C]
    last_score: jnp.ndarray      # [C]
    adjacent_reject: jnp.ndarray  # [C] int32


def init_chain_state(rec, contrib, screen_pos, ls, ss, score_sum, opts):
    C = ls.shape[0]
    Dm = 2 * rec.max_depth
    return ChainState(
        rec=rec, valid=jnp.zeros(C, bool), contrib=contrib,
        screen_pos=screen_pos, ls_score=ls, ss_score=ss,
        score_sum=score_sum,
        v1=jnp.zeros((C, Dm)), v2=jnp.zeros((C, Dm)), g=jnp.zeros((C, Dm)),
        t=jnp.zeros(C, jnp.int32), buffered=jnp.zeros(C, bool),
        stepsize=jnp.full(C, opts.mala_stepsize),
        gaussian=G.isotropic_gaussian((C,), Dm, opts.perturb_std_dev),
        gaussian_init=jnp.zeros(C, bool),
        last_score_sum=jnp.ones(C), last_score=jnp.ones(C),
        adjacent_reject=jnp.zeros(C, jnp.int32))


def _where_state(pred, a: ChainState, b: ChainState):
    """Select chain states per-lane."""
    def sel(x, y):
        if x.ndim == 0:
            return x
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)
    return jax.tree.map(sel, a, b)


# ---------------------------------------------------------------------------
# large step (mutation_large.h:31-128, non-multiplexed variant)
# ---------------------------------------------------------------------------

def large_step(scene, opts, key, state: ChainState):
    """Fresh bidirectional path; multiple-try pick among all (s,t) by
    contribution CDF; augmented-space acceptance. Returns
    (proposal-dict, a)."""
    C = state.ls_score.shape[0]
    D = opts.max_depth
    k_tape, k_pick = jax.random.split(key)
    tape = trace.draw_tape(k_tape, (C,), D)
    min_depth = max(opts.min_depth, 3)
    rec, con, lgt_alive, cam_alive = trace.generate_path_bidir(
        scene, opts, tape, min_depth=min_depth, max_depth=opts.max_depth)
    flat, s_tags, t_tags = con.flatten()
    ls = flat['ls_score']                      # [C, NS]
    score_sum = jnp.sum(ls, -1)
    # contribution-CDF pick (mutation_large.h:70-83)
    cdf = jnp.cumsum(ls, -1)
    u = jax.random.uniform(k_pick, (C,)) * score_sum
    pick = jnp.sum((cdf <= u[:, None]).astype(jnp.int32), -1)
    pick = jnp.clip(pick, 0, ls.shape[-1] - 1)
    take = lambda a: jnp.take_along_axis(a, pick[:, None], 1)[:, 0]
    take2 = lambda a: jnp.take_along_axis(a, pick[:, None, None], 1)[:, 0]
    s_sel = jnp.asarray(s_tags)[pick]
    t_sel = jnp.asarray(t_tags)[pick]
    prop_ls = take(ls)
    prop_ss = take(flat['ss_score'])
    prop_contrib = take2(flat['contrib'])
    prop_screen = take2(flat['screen_pos'])
    rec_tagged = to_subpath(rec, s_sel, t_sel)

    ok = score_sum > 0.0
    # augmented-space acceptance (mutation_large.h:104-116)
    prob_proposal = prop_ls / jnp.maximum(score_sum, 1e-20)
    prob_last = state.last_score / jnp.maximum(state.last_score_sum, 1e-20)
    a = jnp.clip((prop_ls * prob_last)
                 / jnp.maximum(state.ls_score * prob_proposal, 1e-20),
                 0.0, 1.0)
    a = jnp.where(state.valid, a, 1.0)
    a = jnp.where(ok, a, 0.0)
    # splats: every technique splats contrib * normalization / scoreSum
    # (mutation_large.h:119-123); returned for the caller to accumulate
    return dict(rec=rec_tagged, contrib=prop_contrib, screen=prop_screen,
                ls=prop_ls, ss=prop_ss, score_sum=score_sum,
                all_flat=flat, ok=ok), a


# ---------------------------------------------------------------------------
# small steps
# ---------------------------------------------------------------------------

def _perturb_noise(key, C, D, opts):
    k1, k2, k3 = jax.random.split(key, 3)
    sd = opts.discrete_std_dev
    return dict(time=jax.random.normal(k1, (C,)) * sd,
                cam_disc=jax.random.normal(k2, (C, D)) * sd,
                lgt_disc=jax.random.normal(k3, (C, D)) * sd)


def small_step_iso(scene, opts, key, state: ChainState):
    """Isotropic small step (mutation_small.h:16-56)."""
    C = state.ls_score.shape[0]
    D = opts.max_depth
    Dm = 2 * D
    k_off, k_noise = jax.random.split(key)
    offset = jax.random.normal(k_off, (C, Dm)) * opts.perturb_std_dev
    noise = _perturb_noise(k_noise, C, D, opts)
    new_rec, res = replay.replay_path(scene, opts, state.rec, offset, noise,
                                      mode='perturb')
    ok = res['valid'] & (res['ss_score'] > 0.0)
    a = jnp.clip(res['ss_score'] / jnp.maximum(state.ss_score, 1e-20),
                 0.0, 1.0)
    a = jnp.where(ok, a, 0.0)
    return dict(rec=new_rec, contrib=res['contrib'],
                screen=res['screen_pos'], ls=res['ls_score'],
                ss=res['ss_score'], ok=ok), a


def small_step_mala(scene, opts, key, state: ChainState, cache=None):
    """MALA small step (mutation_mala.h:35-278), gradient phase.

    Computes the gradient at current (when the cached Gaussian is stale) and
    at the proposal, EMA moments, preconditioner, asymmetric MH ratio.
    The global-cache query phase is handled by mcmc/cache.py (phase switch).
    """
    C = state.ls_score.shape[0]
    D = opts.max_depth
    Dm = 2 * D
    k_off, k_noise = jax.random.split(key)

    def moments(rec, v1_in, v2_in, ss_score, fresh):
        grad = replay.path_grad(scene, opts, rec)
        grad = jnp.where((ss_score > 1e-10)[..., None], grad, 0.0)
        # truncated drift (mutation_mala.h:113-115)
        norm = jnp.sqrt(jnp.sum(jnp.square(grad), -1, keepdims=True))
        grad = grad * (opts.mala_gn / jnp.maximum(opts.mala_gn, norm))
        first = ~jnp.any(v2_in > 1e-10, -1)
        f = first[..., None]
        v1 = jnp.where(f, grad, 0.9 * v1_in + 0.1 * grad)
        v2 = jnp.where(f, grad * grad, 0.999 * v2_in + 0.001 * grad * grad)
        M = jnp.clip(1.0 / (1e-3 + jnp.sqrt(jnp.maximum(v2, 0.0))),
                     opts.pcd_min, opts.pcd_max)
        return grad, v1, v2, M

    # current-state gaussian (when not cached from the last accept)
    g_cur, v1_cur, v2_cur, M_cur = moments(
        state.rec, state.v1, state.v2, state.ss_score, ~state.buffered)
    gauss_cur_new = G.mala_gaussian(v1_cur, v2_cur, state.stepsize,
                                    opts.mala_std_dev, M_cur,
                                    state.ss_score, opts)
    gauss_cur = _where_gauss(state.gaussian_init, state.gaussian,
                             gauss_cur_new)

    offset = G.gaussian_sample(k_off, gauss_cur)
    noise = _perturb_noise(k_noise, C, D, opts)
    new_rec, res = replay.replay_path(scene, opts, state.rec, offset, noise,
                                      mode='perturb')
    ok = res['valid'] & (res['ss_score'] > 0.0)

    g_prop, v1_prop, v2_prop, M_prop = moments(
        new_rec, v1_cur, v2_cur, res['ss_score'], jnp.zeros(C, bool))
    gauss_prop = G.mala_gaussian(v1_prop, v2_prop, state.stepsize,
                                 opts.mala_std_dev, M_prop,
                                 res['ss_score'], opts)
    py = G.gaussian_log_pdf(offset, gauss_cur)
    px = G.gaussian_log_pdf(-offset, gauss_prop)
    a = jnp.clip(jnp.exp(px - py) * res['ss_score']
                 / jnp.maximum(state.ss_score, 1e-20), 0.0, 1.0)
    a = jnp.where(ok, a, 0.0)
    return dict(rec=new_rec, contrib=res['contrib'], screen=res['screen_pos'],
                ls=res['ls_score'], ss=res['ss_score'], ok=ok,
                gauss_cur=gauss_cur, gauss_prop=gauss_prop,
                v1_cur=v1_cur, v2_cur=v2_cur, g_cur=g_cur,
                v1_prop=v1_prop, v2_prop=v2_prop, g_prop=g_prop), a


def small_step_h2mc(scene, opts, key, state: ChainState):
    """H2MC small step (mutation_h2mc.h:38-128): grad+Hessian at current and
    proposal, anisotropic Gaussian, full MH ratio."""
    C = state.ls_score.shape[0]
    D = opts.max_depth
    Dm = 2 * D
    k_off, k_noise = jax.random.split(key)

    def build_gauss(rec, ss_score):
        grad, hess = replay.path_grad_hessian(scene, opts, rec)
        m = (ss_score > 1e-15)[..., None]
        grad = jnp.where(m, grad, 0.0)
        hess = jnp.where(m[..., None], hess, 0.0)
        return G.h2mc_gaussian(grad, hess, opts.perturb_std_dev, ss_score)

    gauss_cur_new = build_gauss(state.rec, state.ss_score)
    gauss_cur = _where_gauss(state.gaussian_init, state.gaussian,
                             gauss_cur_new)
    offset = G.gaussian_sample(k_off, gauss_cur)
    noise = _perturb_noise(k_noise, C, D, opts)
    new_rec, res = replay.replay_path(scene, opts, state.rec, offset, noise,
                                      mode='perturb')
    ok = res['valid'] & (res['ss_score'] > 0.0)
    gauss_prop = build_gauss(new_rec, res['ss_score'])
    py = G.gaussian_log_pdf(offset, gauss_cur)
    px = G.gaussian_log_pdf(-offset, gauss_prop)
    a = jnp.clip(jnp.exp(px - py) * res['ss_score']
                 / jnp.maximum(state.ss_score, 1e-20), 0.0, 1.0)
    a = jnp.where(ok, a, 0.0)
    return dict(rec=new_rec, contrib=res['contrib'], screen=res['screen_pos'],
                ls=res['ls_score'], ss=res['ss_score'], ok=ok,
                gauss_cur=gauss_cur, gauss_prop=gauss_prop), a


def _where_gauss(pred, a: G.Gaussian, b: G.Gaussian):
    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)
    return jax.tree.map(sel, a, b)
