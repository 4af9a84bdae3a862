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
from . import cache as cache_mod

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
    # global-cache bookkeeping (mutation.h:28-43 Chain + mutation_mala.h)
    queried: jnp.ndarray         # [C] bool: last_pss holds a query point
    last_pss: jnp.ndarray        # [C,Dm] pss of the last successful query
    # snapshot of the last MALA-evaluated state, pushed into the global
    # cache when a later large step is accepted (mlt.cpp:120-127)
    cached_pss: jnp.ndarray      # [C,Dm]
    cached_s: jnp.ndarray        # [C] int32 camDepth
    cached_t: jnp.ndarray        # [C] int32 lightDepth
    cached_weight: jnp.ndarray   # [C] pathWeight = lsScore
    cached_rec: object = None    # PathRecord | None (when cache sampling on)


def init_chain_state(rec, contrib, screen_pos, ls, ss, score_sum, opts):
    C = ls.shape[0]
    Dm = 2 * rec.max_depth
    cached_rec = None
    if opts.sample_from_global_cache:
        cached_rec = jax.tree.map(jnp.zeros_like, rec)
    return ChainState(
        rec=rec, valid=jnp.zeros(C, bool), contrib=contrib,
        screen_pos=screen_pos, ls_score=ls, ss_score=ss,
        score_sum=score_sum,
        v1=jnp.zeros((C, Dm)), v2=jnp.zeros((C, Dm)), g=jnp.zeros((C, Dm)),
        t=jnp.zeros(C, jnp.int32), buffered=jnp.zeros(C, bool),
        stepsize=jnp.full(C, opts.mala_stepsize),
        gaussian=G.isotropic_gaussian((C,), Dm, opts.perturb_std_dev,
                                      dense=bool(opts.h2mc)),
        gaussian_init=jnp.zeros(C, bool),
        last_score_sum=jnp.ones(C), last_score=jnp.ones(C),
        adjacent_reject=jnp.zeros(C, jnp.int32),
        queried=jnp.zeros(C, bool), last_pss=jnp.zeros((C, Dm)),
        cached_pss=jnp.zeros((C, Dm)),
        cached_s=jnp.zeros(C, jnp.int32), cached_t=jnp.zeros(C, jnp.int32),
        cached_weight=jnp.zeros(C), cached_rec=cached_rec)


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
# multiplexed large step (mutation_large.h:45-59,87-103)
# ---------------------------------------------------------------------------

def _sample_length(length_dist, key, C):
    u = jax.random.uniform(key, (C,))
    length, _ = length_dist.sample_discrete(u)
    return length


def _sample_st_split(opts, key, length):
    """(s, t) split for multiplexed large steps (mutation_large.h:46-50):
    bidirectional draws lgtLength uniform in [0, length]; the uni mode
    restricts to {0, 1} (power-2 uni MIS paths)."""
    u = jax.random.uniform(key, length.shape)
    if getattr(opts, 'bidirectional', True):
        t = jnp.clip((u * (length + 1).astype(jnp.float32)).astype(jnp.int32),
                     0, length)
    else:
        t = jnp.clip((u * 2.0).astype(jnp.int32), 0,
                     jnp.minimum(length, 1))
    return length - t + 1, t


def large_step_multiplexed(scene, opts, key, state: ChainState, length_dist):
    """MMLT-style large step: sample a path length from lengthDist, a
    uniform (s,t) split, generate that single technique, accept with the
    technique-pmf ratio (mutation_large.h:45-59, 87-103)."""
    C = state.ls_score.shape[0]
    D = opts.max_depth
    k_len, k_split, k_tape = jax.random.split(key, 3)
    length = _sample_length(length_dist, k_len, C)
    s, t = _sample_st_split(opts, k_split, length)
    tape = trace.draw_tape(k_tape, (C,), D)
    rec, res = trace.generate_subpath(scene, opts, tape, s, t)
    ok = res['valid']

    cur_len = state.rec.cam_depth + state.rec.lgt_depth - 1
    if getattr(opts, 'bidirectional', True):
        inv_prop_pmf = (length + 1).astype(jnp.float32)
        inv_cur_pmf = (cur_len + 1).astype(jnp.float32)
    else:
        inv_prop_pmf = jnp.full((C,), 2.0)
        inv_cur_pmf = jnp.full((C,), 2.0)
    pmf_prop = length_dist.pmf(length)
    pmf_cur = length_dist.pmf(jnp.clip(cur_len, 0, length_dist.count - 1))
    a = jnp.clip(
        (inv_prop_pmf * res['ls'] / jnp.maximum(pmf_prop, 1e-20))
        / jnp.maximum(inv_cur_pmf * state.ls_score
                      / jnp.maximum(pmf_cur, 1e-20), 1e-20),
        0.0, 1.0)
    a = jnp.where(state.valid, a, 1.0)
    a = jnp.where(ok, a, 0.0)
    return dict(rec=rec, contrib=res['contrib'], screen=res['screen'],
                ls=res['ls'], ss=res['ss'],
                score_sum=res['ls'], ok=ok, length=length), a


def large_step_cache(scene, opts, key, state: ChainState, length_dist,
                     cache):
    """MALA global jump via the PSS cache (mutation_large_cache.h:22-134):
    with prob CACHE_PROB (when the row is full) re-seed from a stored
    high-contribution path jittered by N(0, CACHE_SIG) wrap-around,
    otherwise a multiplexed uniform large step; MIS-blend the cache KDE pdf
    with the uniform technique pdf in the acceptance ratio."""
    C = state.ls_score.shape[0]
    D = opts.max_depth
    Dm = 2 * D
    k_len, k_split, k_tape, k_pick, k_samp, k_off, k_noise = \
        jax.random.split(key, 7)
    length = _sample_length(length_dist, k_len, C)
    prop_dim = 2 * length
    ndim = cache.count.shape[0]
    prop_avail = ((prop_dim >= opts.pss_min_length)
                  & (prop_dim <= opts.pss_max_length)
                  & (cache.count[jnp.clip(prop_dim, 0, ndim - 1)]
                     >= cache.size))
    use_cache = prop_avail & (jax.random.uniform(k_pick, (C,))
                              <= opts.cache_prob)

    # --- uniform multiplexed branch ---
    s, t = _sample_st_split(opts, k_split, length)
    tape = trace.draw_tape(k_tape, (C,), D)
    rec_u, res_u = trace.generate_subpath(scene, opts, tape, s, t)

    # --- cache branch: stored path + wrapped Gaussian jitter ---
    _, pss_stored, _, rec_stored = cache_mod.sample_cache(
        cache, k_samp, prop_dim, opts)
    offset = jax.random.normal(k_off, (C, Dm)) * opts.cache_sig
    noise = _perturb_noise(k_noise, C, D, opts)
    rec_c, res_c = replay.replay_path(scene, opts, rec_stored, offset, noise,
                                      mode='perturb')

    sel = lambda c_val, u_val: jnp.where(
        use_cache.reshape(use_cache.shape + (1,) * (c_val.ndim - 1)),
        c_val, u_val)
    rec = jax.tree.map(sel, rec_c, rec_u)
    prop = dict(contrib=sel(res_c['contrib'], res_u['contrib']),
                screen=sel(res_c['screen_pos'], res_u['screen']),
                ls=sel(res_c['ls_score'], res_u['ls']),
                ss=sel(res_c['ss_score'], res_u['ss']))
    ok = jnp.where(use_cache, res_c['valid'] & (res_c['ss_score'] > 0.0),
                   res_u['valid'])

    # --- MIS acceptance (mutation_large_cache.h:92-123) ---
    cur_len = state.rec.cam_depth + state.rec.lgt_depth - 1
    cur_dim = 2 * cur_len
    cur_avail = ((cur_dim >= opts.pss_min_length)
                 & (cur_dim <= opts.pss_max_length)
                 & (cache.count[jnp.clip(cur_dim, 0, ndim - 1)]
                    >= cache.size))
    prop_pss = get_path_pss(rec, Dm)
    cur_pss = get_path_pss(state.rec, Dm)
    prop_jac = prop['ss'] / jnp.maximum(prop['ls'], 1e-20)
    cur_jac = state.ss_score / jnp.maximum(state.ls_score, 1e-20)
    prop_tech = 1.0 / (length + 1).astype(jnp.float32)
    cur_tech = 1.0 / jnp.maximum((cur_len + 1).astype(jnp.float32), 1.0)
    prop_uni = prop_tech * prop_jac
    cur_uni = cur_tech * cur_jac
    prop_kde = cache_mod.eval_pdf_cache(cache, prop_dim, prop_pss,
                                        rec.cam_depth, rec.lgt_depth, opts)
    cur_kde = cache_mod.eval_pdf_cache(cache, cur_dim, cur_pss,
                                       state.rec.cam_depth,
                                       state.rec.lgt_depth, opts)
    cp = opts.cache_prob
    prop_pdf = jnp.where(prop_avail, (1 - cp) * prop_uni + cp * prop_kde,
                         prop_uni)
    cur_pdf = jnp.where(cur_avail, (1 - cp) * cur_uni + cp * cur_kde,
                        cur_uni)
    pmf_prop = length_dist.pmf(length)
    pmf_cur = length_dist.pmf(jnp.clip(cur_len, 0, length_dist.count - 1))
    a = jnp.clip(
        (prop['ss'] * cur_pdf * pmf_cur)
        / jnp.maximum(state.ss_score * prop_pdf * pmf_prop, 1e-30),
        0.0, 1.0)
    a = jnp.where(state.valid, a, 1.0)
    a = jnp.where(ok, a, 0.0)
    return dict(rec=rec, contrib=prop['contrib'], screen=prop['screen'],
                ls=prop['ls'], ss=prop['ss'], score_sum=prop['ls'],
                ok=ok, length=length), a


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


def _perturb_and_grad(scene, opts, rec, offset, noise, grad_mask,
                      want_hess=False):
    """Perturb replay + proposal-side derivative.

    On static scenes the perturb walk collects the frozen-path bake as a
    byproduct (no extra gathers), so the gradient/Hessian program is
    gather-free (replay.replay_path bake docs). grad_mask [C] bool: lanes
    that consume the proposal derivative — when none do, the lax.cond
    skips it. want_hess: also return the dense Hessian (H2MC).

    (Depth cohorts lived here in r4 — parity-tested, measured 0.0% twice,
    deleted in r5 per VERDICT item 10; the trace showed the step was
    gather-bound, which cutting walk scan steps cannot touch.)

    Returns (new_rec, res, grad [C, Dm], hess [C, Dm, Dm] | None)."""
    C = rec.time.shape[0]
    D = rec.max_depth
    Dm = 2 * D
    static = not scene.has_motion

    def deriv(r, k, dm, b=None):
        if want_hess:
            return replay.path_grad_hessian(scene, opts, r, bake=b)
        return (replay.path_grad(scene, opts, r, bake=b), None)

    def zeros(k, dm):
        if want_hess:
            return (jnp.zeros((k, dm)), jnp.zeros((k, dm, dm)))
        return (jnp.zeros((k, dm)), None)

    if static:
        new_rec, res, bake = replay.replay_path(
            scene, opts, rec, offset, noise, mode='perturb',
            collect_bake=True)
        grad, hess = jax.lax.cond(
            jnp.any(grad_mask),
            lambda rb: deriv(rb[0], C, Dm, rb[1]),
            lambda rb: zeros(C, Dm), (new_rec, bake))
    else:
        new_rec, res = replay.replay_path(scene, opts, rec, offset,
                                          noise, mode='perturb')
        grad, hess = jax.lax.cond(
            jnp.any(grad_mask),
            lambda r: deriv(r, C, Dm),
            lambda r: zeros(C, Dm), new_rec)
    return new_rec, res, grad, hess


def small_step_mala(scene, opts, key, state: ChainState, cache=None,
                    use_iso=None, skip_lanes=None, cur_frac=None):
    """MALA small step (mutation_mala.h:35-278), both phases.

    use_iso: optional [C] bool — lanes flagged True propose from the
    isotropic N(0, perturbStdDev^2) kernel instead (the uniform-mixing
    fallback, mutation_mala.h:46-51). Merging the isotropic lanes into
    this step means ONE shared path replay per iteration instead of two;
    the asymmetric MH ratio degenerates to the symmetric ssScore ratio for
    those lanes automatically (identical Gaussians on both ends), and the
    caller keeps gating moment/snapshot commits on ~use_iso.

    skip_lanes: optional [C] bool — lanes whose small-step result the
    caller will discard (e.g. the large-step lanes of the fused MLT step);
    they are excluded from the sparse current-side gradient budget.

    Gradient phase (cache row for the lane's dim not full): gradient at
    current (when the cached Gaussian is stale) and at the proposal, EMA
    moments, preconditioner, asymmetric MH ratio. The reference evaluates
    the current-side derivative ONLY when !gaussianInitialized
    (mutation_mala.h:83-135) — in steady state nearly every lane has the
    Gaussian cached from its last MALA evaluation, so the current-side
    gradient here runs on a gathered sparse subset of cur_frac * C lanes
    (the lanes that just accepted a large/iso step or were reset). Lanes
    needing it beyond that budget (statistically negligible: the need set
    is bounded by last step's large+iso accepts) fall back to the
    isotropic N(0, malaStdDev^2) kernel for this one proposal; the MH
    ratio uses the actually-sampled kernel's pdf, so the chain stays
    correct.

    Cache phase (row full): the gradient is never computed; the moments are
    kNN-interpolated from the global cache (with last-query reuse within
    PSS_REUSE_DIST, mutation_mala.h:131-164). Documented deviation: on
    accept the reference restores the stale pre-cache prop_new scratch
    buffers into chain.v1/v2 (mlt.cpp:133-137) — here cache-phase lanes keep
    the queried moments, which is what the proposal Gaussian actually used.

    Lanes whose dim is outside [PSS_MIN_LENGTH, PSS_MAX_LENGTH] (or with no
    query match) propose from an isotropic N(0, malaStdDev^2).
    """
    C = state.ls_score.shape[0]
    D = opts.max_depth
    Dm = 2 * D
    k_off, k_noise = jax.random.split(key)

    dim = pss_dim(state.rec)                       # invariant under small step
    in_range = (dim >= opts.pss_min_length) & (dim <= opts.pss_max_length)
    if cache is not None:
        ready = cache.count[jnp.clip(dim, 0, cache.count.shape[0] - 1)] \
            >= cache.size
    else:
        ready = jnp.zeros(C, bool)
    grad_lane = in_range & ~ready
    cache_lane = in_range & ready

    def ema_moments(grad, v1_in, v2_in, ss_score):
        """Truncated-drift EMA + preconditioner (mutation_mala.h:113-127).
        Pure elementwise — full lane width is fine."""
        grad = jnp.where((ss_score > 1e-10)[..., None], grad, 0.0)
        norm = jnp.sqrt(jnp.sum(jnp.square(grad), -1, keepdims=True))
        grad = grad * (opts.mala_gn / jnp.maximum(opts.mala_gn, norm))
        first = ~jnp.any(v2_in > 1e-10, -1)
        f = first[..., None]
        v1 = jnp.where(f, grad, 0.9 * v1_in + 0.1 * grad)
        v2 = jnp.where(f, grad * grad, 0.999 * v2_in + 0.001 * grad * grad)
        M = jnp.clip(1.0 / (1e-3 + jnp.sqrt(jnp.maximum(v2, 0.0))),
                     opts.pcd_min, opts.pcd_max)
        return grad, v1, v2, M

    cur_need = grad_lane & ~state.gaussian_init
    if use_iso is not None:
        cur_need &= ~use_iso
    if skip_lanes is not None:
        cur_need &= ~skip_lanes

    static_scene = not scene.has_motion

    def _grad_with_bake(r):
        """Current-side grad: bake-prepass (one gather-ful frozen forward)
        + gather-free grad — cheaper than a gather-ful reverse pass."""
        b = replay.bake_frozen(scene, opts, r) if static_scene else None
        return replay.path_grad(scene, opts, r, bake=b)

    def sparse_cur_grad():
        """Current-side gradient only where actually consumed: grad-phase
        lanes without a cached Gaussian (and not iso/large this step)."""
        need = cur_need
        frac = opts.cur_grad_fraction if cur_frac is None else cur_frac
        Kc = min(C, max(int(C * frac), 8))
        if Kc >= C:
            grad = jax.lax.cond(
                jnp.any(need),
                _grad_with_bake,
                lambda r: jnp.zeros((C, Dm)), state.rec)
            return jnp.where(need[:, None], grad, 0.0), need
        order = jnp.argsort(jnp.where(need, 0, 1).astype(jnp.int32),
                            stable=True)
        sel = order[:Kc]
        rec_sel = jax.tree.map(lambda x: x[sel] if x.ndim >= 1 else x,
                               state.rec)
        grad_sel = jax.lax.cond(
            jnp.any(need),
            _grad_with_bake,
            lambda r: jnp.zeros((Kc, Dm)), rec_sel)
        grad = jnp.zeros((C, Dm)).at[sel].set(grad_sel, unique_indices=True)
        covered = (jnp.zeros(C, bool).at[sel].set(
            True, unique_indices=True)) & need
        return jnp.where(covered[:, None], grad, 0.0), covered

    def cache_gauss(pss_q, ss_score, v1_in, v2_in, queried, last_pss,
                    need_mask):
        """Query/reuse phase (mutation_mala.h:131-164). Returns
        (gauss, v1, v2, queried, last_pss).

        The kNN sweep runs on a gathered sparse subset of
        cache_query_fraction * C lanes — only lanes in need_mask that miss
        the PSS_REUSE_DIST test re-query (the reference's reuse semantics
        make steady-state re-query rates low: a MALA move is ~stepsize
        per dim vs the 0.1*sqrt(dim) reuse radius). Overflow lanes beyond
        the budget fall back to the isotropic kernel for this one proposal
        (the same actually-sampled-kernel accounting as the sparse
        current-side gradient budget — MH stays exact per lane)."""
        dmask = (jnp.arange(Dm)[None] < dim[:, None]).astype(jnp.float32)
        dist_sq = jnp.sum(jnp.square((pss_q - last_pss) * dmask), -1)
        reuse = queried & (dist_sq
                           < dim.astype(jnp.float32) * opts.pss_reuse_dist ** 2)
        need_q = need_mask & ~reuse
        frac = getattr(opts, 'cache_query_fraction', 0.25)
        Kq = min(C, max(int(C * frac), 8))
        if Kq >= C:
            found, qv1, qv2 = cache_mod.query_knn(cache, dim, pss_q, opts)
        else:
            order = jnp.argsort(jnp.where(need_q, 0, 1).astype(jnp.int32),
                                stable=True)
            sel = order[:Kq]
            f_s, v1_s, v2_s = cache_mod.query_knn(
                cache, dim[sel], pss_q[sel], opts)
            found = jnp.zeros(C, bool).at[sel].set(f_s,
                                                   unique_indices=True)
            qv1 = jnp.zeros((C, Dm)).at[sel].set(v1_s, unique_indices=True)
            qv2 = jnp.zeros((C, Dm)).at[sel].set(v2_s, unique_indices=True)
        found = found & need_q
        v1 = jnp.where(reuse[:, None], v1_in, qv1)
        v2 = jnp.where(reuse[:, None], v2_in, qv2)
        hit = reuse | found
        v1 = jnp.where(hit[:, None], v1, v1_in)
        v2 = jnp.where(hit[:, None], v2, v2_in)
        new_queried = queried | found
        new_last = jnp.where((found & ~reuse)[:, None], pss_q, last_pss)
        M = jnp.clip(1.0 / (1e-3 + jnp.sqrt(jnp.maximum(v2, 0.0))),
                     opts.pcd_min, opts.pcd_max)
        g_hit = G.mala_gaussian(v1, v2, state.stepsize, opts.mala_std_dev,
                                M, ss_score, opts)
        g_iso = _mala_iso(C, Dm, opts)
        return _where_gauss(hit, g_hit, g_iso), v1, v2, new_queried, new_last

    # ---- current state (when the Gaussian is not cached from last accept)
    # the reference only evaluates this side when !gaussianInitialized
    # (mutation_mala.h:83-135): the gradient runs on a sparse gathered
    # subset, the cache kNN query only when some lane is in cache phase
    # without a cached Gaussian
    pss_cur = get_path_pss(state.rec, Dm)
    g_cur, cur_covered = sparse_cur_grad()
    # lanes whose current-side Gaussian is REAL (evaluated now or cached):
    # grad-phase lanes beyond the sparse budget proposed from the isotropic
    # fallback — the caller must NOT commit that fallback as the chain's
    # cached Gaussian (it is "for this one proposal" only; ADVICE r2)
    cur_ok = ~(cur_need & ~cur_covered)
    _, v1_cur, v2_cur, M_cur = ema_moments(g_cur, state.v1, state.v2,
                                           state.ss_score)
    gauss_grad_cur = G.mala_gaussian(v1_cur, v2_cur, state.stepsize,
                                     opts.mala_std_dev, M_cur,
                                     state.ss_score, opts)
    if cache is not None:
        evald = ~state.gaussian_init           # current eval happened

        def cache_cur(_):
            return cache_gauss(pss_cur, state.ss_score, state.v1, state.v2,
                               state.queried, state.last_pss,
                               cache_lane & evald)

        def cache_cur_skip(_):
            return (_mala_iso(C, Dm, opts), state.v1, state.v2,
                    state.queried, state.last_pss)

        gauss_cache_cur, cv1, cv2, queried1, last_pss1 = jax.lax.cond(
            jnp.any(cache_lane & evald), cache_cur, cache_cur_skip, None)
        upd = (cache_lane & evald)[:, None]
        v1_now = jnp.where(upd, cv1, state.v1)
        v2_now = jnp.where(upd, cv2, state.v2)
        queried1 = jnp.where(cache_lane & evald, queried1, state.queried)
        last_pss1 = jnp.where(upd, last_pss1, state.last_pss)
        gauss_cur_new = _where_gauss(cache_lane, gauss_cache_cur,
                                     _where_gauss(cur_covered, gauss_grad_cur,
                                                  _mala_iso(C, Dm, opts)))
    else:
        v1_now, v2_now = state.v1, state.v2
        queried1, last_pss1 = state.queried, state.last_pss
        gauss_cur_new = _where_gauss(cur_covered, gauss_grad_cur,
                                     _mala_iso(C, Dm, opts))
    gauss_cur = _where_gauss(state.gaussian_init, state.gaussian,
                             gauss_cur_new)
    if use_iso is not None:
        iso_g = G.isotropic_gaussian((C,), Dm, opts.perturb_std_dev,
                                     dense=False)
        gauss_cur = _where_gauss(use_iso, iso_g, gauss_cur)

    offset = G.gaussian_sample(k_off, gauss_cur)
    noise = _perturb_noise(k_noise, C, D, opts)
    new_rec, res, g_raw, _ = _perturb_and_grad(scene, opts, state.rec, offset,
                                               noise, grad_lane)
    ok = res['valid'] & (res['ss_score'] > 0.0)

    # ---- proposal state
    pss_prop = get_path_pss(new_rec, Dm)
    g_prop, v1_prop, v2_prop, M_prop = ema_moments(g_raw, v1_now, v2_now,
                                                   res['ss_score'])
    gauss_grad_prop = G.mala_gaussian(v1_prop, v2_prop, state.stepsize,
                                      opts.mala_std_dev, M_prop,
                                      res['ss_score'], opts)
    if cache is not None:
        # the kNN sweep only runs when some lane is actually in cache
        # phase: unconditional evaluation cost ~110 ms/step of pure waste
        # during the entire grad phase (xref_step r5, cache.py rows)
        def cache_prop(_):
            return cache_gauss(pss_prop, res['ss_score'], v1_now, v2_now,
                               queried1, last_pss1, cache_lane & ok)

        def cache_prop_skip(_):
            return (_mala_iso(C, Dm, opts), v1_now, v2_now, queried1,
                    last_pss1)

        gauss_cache_prop, pv1, pv2, queried2, last_pss2 = jax.lax.cond(
            jnp.any(cache_lane), cache_prop, cache_prop_skip, None)
        upd = (cache_lane & ok)[:, None]
        v1_now = jnp.where(upd, pv1, v1_now)
        v2_now = jnp.where(upd, pv2, v2_now)
        queried2 = jnp.where(cache_lane & ok, queried2, queried1)
        last_pss2 = jnp.where(upd, last_pss2, last_pss1)
        gauss_prop = _where_gauss(cache_lane, gauss_cache_prop,
                                  _where_gauss(grad_lane, gauss_grad_prop,
                                               _mala_iso(C, Dm, opts)))
    else:
        queried2, last_pss2 = queried1, last_pss1
        gauss_prop = _where_gauss(in_range, gauss_grad_prop,
                                  _mala_iso(C, Dm, opts))
    if use_iso is not None:
        gauss_prop = _where_gauss(use_iso, iso_g, gauss_prop)

    py = G.gaussian_log_pdf(offset, gauss_cur)
    px = G.gaussian_log_pdf(-offset, gauss_prop)
    a = jnp.clip(jnp.exp(px - py) * res['ss_score']
                 / jnp.maximum(state.ss_score, 1e-20), 0.0, 1.0)
    a = jnp.where(ok, a, 0.0)

    # chain snapshot for later cache pushes (mutation_mala.h:89-92,184-187):
    # updated at each evaluation point; the proposal eval wins when it ran.
    # The current side only counts as an evaluation point where it actually
    # ran (sparse grad coverage / cache query), not merely where the cached
    # Gaussian was stale
    evald_cur = cur_covered | (cache_lane & ~state.gaussian_init)
    snap_sel = lambda p, c, o: jnp.where(
        ok.reshape(ok.shape + (1,) * (p.ndim - 1)), p,
        jnp.where(evald_cur.reshape(ok.shape + (1,) * (p.ndim - 1)), c, o))
    snap = dict(
        pss=snap_sel(pss_prop, pss_cur, state.cached_pss),
        s=snap_sel(new_rec.cam_depth, state.rec.cam_depth, state.cached_s),
        t=snap_sel(new_rec.lgt_depth, state.rec.lgt_depth, state.cached_t),
        weight=snap_sel(res['ls_score'], state.ls_score, state.cached_weight))
    if state.cached_rec is not None:
        snap['rec'] = jax.tree.map(
            lambda p, c, o: snap_sel(p, c, o),
            new_rec, state.rec, state.cached_rec)
    return dict(rec=new_rec, contrib=res['contrib'], screen=res['screen_pos'],
                ls=res['ls_score'], ss=res['ss_score'], ok=ok,
                gauss_cur=gauss_cur, gauss_prop=gauss_prop, cur_ok=cur_ok,
                v1_prop=v1_prop, v2_prop=v2_prop, g_prop=g_prop,
                v1_now=v1_now, v2_now=v2_now,
                grad_lane=grad_lane, cache_lane=cache_lane,
                queried=queried2, last_pss=last_pss2, snap=snap), a


def _mala_iso(C, Dm, opts):
    """IsotropicGaussian(dim, malaStdDev) (mutation_mala.h:160-163)."""
    return G.isotropic_gaussian((C,), Dm, opts.mala_std_dev, dense=False)


def small_step_h2mc(scene, opts, key, state: ChainState, use_iso=None,
                    skip_lanes=None, cur_frac=None):
    """H2MC small step (mutation_h2mc.h:38-128): grad+Hessian at current and
    proposal, anisotropic Gaussian, full MH ratio.

    use_iso: see small_step_mala — isotropic-kernel lanes share this step's
    single replay (mutation_h2mc.h:50-55 fallback).

    The current-side grad+Hessian (the expensive jacfwd-over-grad pass) runs
    only on a sparse gathered subset of cur_frac * C lanes — the reference
    evaluates it only when !gaussianInitialized (mutation_h2mc.h:57-100),
    which in steady state is the few lanes that just accepted a large/iso
    step. Overflow lanes fall back to the isotropic kernel for one proposal
    (see small_step_mala)."""
    C = state.ls_score.shape[0]
    D = opts.max_depth
    Dm = 2 * D
    k_off, k_noise = jax.random.split(key)

    def build_gauss(rec, ss_score):
        b = replay.bake_frozen(scene, opts, rec) \
            if not scene.has_motion else None
        grad, hess = replay.path_grad_hessian(scene, opts, rec, bake=b)
        m = (ss_score > 1e-15)[..., None]
        grad = jnp.where(m, grad, 0.0)
        hess = jnp.where(m[..., None], hess, 0.0)
        return G.h2mc_gaussian(grad, hess, opts.perturb_std_dev, ss_score)

    need = ~state.gaussian_init
    if use_iso is not None:
        need &= ~use_iso
    if skip_lanes is not None:
        need &= ~skip_lanes
    if cur_frac is None:
        cur_frac = opts.cur_grad_fraction
    Kc = min(C, max(int(C * cur_frac), 8))
    iso_default = G.isotropic_gaussian((C,), Dm, opts.perturb_std_dev)
    if Kc >= C:
        gauss_cur_new = jax.lax.cond(
            jnp.any(need),
            lambda: build_gauss(state.rec, state.ss_score),
            lambda: iso_default)
        covered = need
    else:
        order = jnp.argsort(jnp.where(need, 0, 1).astype(jnp.int32),
                            stable=True)
        sel = order[:Kc]
        rec_sel = jax.tree.map(lambda x: x[sel] if x.ndim >= 1 else x,
                               state.rec)
        ss_sel = state.ss_score[sel]
        gauss_sel = jax.lax.cond(
            jnp.any(need),
            lambda: build_gauss(rec_sel, ss_sel),
            lambda: G.isotropic_gaussian((Kc,), Dm, opts.perturb_std_dev))
        gauss_cur_new = jax.tree.map(
            lambda s, d: d.at[sel].set(s, unique_indices=True),
            gauss_sel, iso_default)
        covered = (jnp.zeros(C, bool).at[sel].set(
            True, unique_indices=True)) & need
    gauss_cur_new = _where_gauss(covered, gauss_cur_new, iso_default)
    # overflow lanes propose from the iso fallback for this one proposal
    # only — the caller must not commit it as the cached Gaussian
    cur_ok = ~(need & ~covered)
    gauss_cur = _where_gauss(state.gaussian_init, state.gaussian,
                             gauss_cur_new)
    if use_iso is not None:
        iso_g = G.isotropic_gaussian((C,), Dm, opts.perturb_std_dev)
        gauss_cur = _where_gauss(use_iso, iso_g, gauss_cur)
    offset = G.gaussian_sample(k_off, gauss_cur)
    noise = _perturb_noise(k_noise, C, D, opts)
    new_rec, res, g_p, h_p = _perturb_and_grad(
        scene, opts, state.rec, offset, noise, jnp.ones(C, bool),
        want_hess=True)
    ok = res['valid'] & (res['ss_score'] > 0.0)
    m = (res['ss_score'] > 1e-15)[..., None]
    gauss_prop = G.h2mc_gaussian(jnp.where(m, g_p, 0.0),
                                 jnp.where(m[..., None], h_p, 0.0),
                                 opts.perturb_std_dev, res['ss_score'])
    if use_iso is not None:
        gauss_prop = _where_gauss(use_iso, iso_g, gauss_prop)
    py = G.gaussian_log_pdf(offset, gauss_cur)
    px = G.gaussian_log_pdf(-offset, gauss_prop)
    a = jnp.clip(jnp.exp(px - py) * res['ss_score']
                 / jnp.maximum(state.ss_score, 1e-20), 0.0, 1.0)
    a = jnp.where(ok, a, 0.0)
    return dict(rec=new_rec, contrib=res['contrib'], screen=res['screen_pos'],
                ls=res['ls_score'], ss=res['ss_score'], ok=ok,
                gauss_cur=gauss_cur, gauss_prop=gauss_prop, cur_ok=cur_ok), a


def _where_gauss(pred, a: G.Gaussian, b: G.Gaussian):
    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)
    return jax.tree.map(sel, a, b)
