"""MLT driver: bootstrap, vectorized chain loop, film accumulation.

TPU-native re-design of MLT/MLTInit (reference src/mlt.cpp:20-214,
src/mlt.h:41-154):

  * bootstrap generates num_init_samples paths in wavefront chunks, computes
    the average brightness (the normalization), the path-length histogram
    (lengthDist), and equal-spaced-resamples chain seeds from the
    per-contribution CDF — re-generating the selected chunks from their tape
    keys (the stateless-key analogue of the reference's copyable-RNG
    checkpoint trick, mlt.h:74,128-135);
  * the chain loop advances ALL chains per jitted step: every step evaluates
    the large step and the configured small step for every lane and selects
    (branchless, the TPU equivalent of per-chain virtual dispatch);
  * each chain carries its current state's full splat bank (a large-step
    state re-splats every (s,t) technique of its path each iteration,
    weighted 1-a; a small-step state re-splats its single technique —
    mlt.cpp:103-112, mutation_large.h:119-123, mutation_small.h:46-50);
  * outlier chains reset from the (pre-filtered) seed bank after
    consecutive-reject thresholds (mlt.cpp:147-169, REMOVE_OUTLIERS).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from ..path import trace
from ..path.records import to_subpath, empty_contribs
from ..ops.film import splat
from ..mcmc import chain as chain_mod
from ..mcmc import gaussian as G
from ..mcmc import cache as cache_mod
from .pathtrace import render_direct


def num_slots(D):
    from ..path.records import num_flat_slots
    return num_flat_slots(D)


def bootstrap(scene, opts, key, chunk=4096):
    """MLTInit. Returns (b, length_pmf, seed ChainState).

    Two fused passes (VERDICT r3 item 10 — the per-chunk dispatch loop plus
    dynamic-width lane gathers cost 270 s+ on the tunneled TPU):
      1. a lax.scan over FUSE chunks per dispatch collects every sample's
         per-slot lsScore (the reference's bootstrap table, mlt.h:85-105);
      2. after the host-side equal-spaced resampling, ONE scan regenerates
         all chunks and fills each picked chain's record where its chunk
         comes by — static shapes, one compiled program, no per-chunk
         host round-trips."""
    D = opts.max_depth
    n = opts.num_init_samples
    nchunk = -(-n // chunk)
    min_depth = max(opts.min_depth, 3)
    FUSE = max(1, min(nchunk, 49152 // chunk))
    nchunk_p = -(-nchunk // FUSE) * FUSE

    def gen_one(k):
        tape = trace.draw_tape(k, (chunk,), D)
        rec, con, _, _ = trace.generate_path_bidir(
            scene, opts, tape, min_depth=min_depth, max_depth=opts.max_depth)
        flat, _, _ = con.flatten()
        return rec, flat

    @jax.jit
    def gen_ls(ks):
        def body(c, k):
            _, flat = gen_one(k)
            return c, flat['ls_score']
        _, ls = jax.lax.scan(body, 0, ks)
        return ls                                   # [FUSE, chunk, NS]

    # host-resident keys: slicing a device-resident array between
    # dispatches aborts the tunneled TPU backend (r4 bisection)
    keys = np.asarray(jax.random.split(key, nchunk_p))
    ls_parts = [np.asarray(gen_ls(keys[i:i + FUSE]))
                for i in range(0, nchunk_p, FUSE)]
    ls_all = np.concatenate(ls_parts).reshape(nchunk_p * chunk, -1)[:n]

    _, s_tags, t_tags = empty_contribs((1,), D).flatten()
    total = float(ls_all.sum())
    b = total / n                                    # avg brightness

    lengths = (s_tags + t_tags - 1).astype(np.int32)
    length_contrib = np.zeros(2 * D + 2, np.float64)
    np.add.at(length_contrib, lengths, ls_all.sum(0))

    # equal-spaced resampling over all (sample, slot) pairs (mlt.h:107-148),
    # outlier seeds (ls > threshold * b) skipped up-front so resets are safe
    flat_ls = ls_all.reshape(-1).astype(np.float64)
    if opts.remove_outliers:
        flat_ls = np.where(flat_ls > opts.outlier_ratio_threshold * b,
                           0.0, flat_ls)
    cdf = np.cumsum(flat_ls)
    num_chains = opts.num_chains
    interval = cdf[-1] / num_chains
    # equal-spaced jitter seeded from the USER key (the reference draws it
    # from its seeded RNG, mlt.h:107-148) so seedoffset changes the picks
    rng = np.random.default_rng(
        np.asarray(jax.random.key_data(jax.random.fold_in(key, 0x5eed))))
    pos = rng.uniform(0, interval) + interval * np.arange(num_chains)
    picks = np.minimum(np.searchsorted(cdf, pos), len(flat_ls) - 1)
    sample_idx = picks // ls_all.shape[1]
    slot_idx = picks % ls_all.shape[1]

    # regenerate every chunk in ONE scan; each picked chain's record is
    # filled when its chunk comes by (equal-width select, no dynamic
    # shapes). One extra generation pass over the pool — cheaper than the
    # old per-picked-chunk dispatches + per-count gather recompiles
    chunk_of_pick = sample_idx // chunk
    lane_of_pick = sample_idx % chunk
    from ..path.records import empty_record

    @jax.jit
    def regen_picks(ks, chunk_of_pick_d, lane_of_pick_d):
        def body(carry, xs):
            ci, k = xs
            rec_c, flat_c = gen_one(k)
            cand_rec = jax.tree.map(lambda a: a[lane_of_pick_d], rec_c)
            cand_flat = {k2: v[lane_of_pick_d]
                         for k2, v in flat_c.items()}
            sel = chunk_of_pick_d == ci
            rec_acc, flat_acc = carry
            pick = lambda a, b: jnp.where(
                sel.reshape(sel.shape + (1,) * (a.ndim - 1)), a, b)
            return (jax.tree.map(pick, cand_rec, rec_acc),
                    {k2: pick(cand_flat[k2], flat_acc[k2])
                     for k2 in flat_acc}), None

        C = chunk_of_pick_d.shape[0]
        flat0, _, _ = empty_contribs((C,), D).flatten()
        init = (empty_record((C,), D), dict(flat0))
        (rec, flat), _ = jax.lax.scan(
            body, init, (jnp.arange(ks.shape[0]), ks))
        return rec, flat

    rec, flat = regen_picks(keys[:nchunk], jnp.asarray(chunk_of_pick),
                            jnp.asarray(lane_of_pick))

    s_sel = jnp.asarray(s_tags[slot_idx])
    t_sel = jnp.asarray(t_tags[slot_idx])
    rec = to_subpath(rec, s_sel, t_sel)
    take = lambda a: jnp.take_along_axis(
        a, jnp.asarray(slot_idx)[:, None], 1)[:, 0]
    take2 = lambda a: jnp.take_along_axis(
        a, jnp.asarray(slot_idx)[:, None, None], 1)[:, 0]
    score_sum = jnp.sum(flat['ls_score'], -1)
    state = init_full_state(opts, rec, take2(flat['contrib']),
                            take2(flat['screen_pos']), take(flat['ls_score']),
                            take(flat['ss_score']), score_sum,
                            flat, b, from_large=True)
    from ..utils.distribution import Distribution1D
    length_dist = Distribution1D(
        length_contrib / max(length_contrib.sum(), 1e-30))
    return b, length_dist, state


def bank_slots(opts, D):
    """Width of the per-chain splat bank.

    Every s >= 2 technique of a generated path splats at the SAME pixel —
    the camera subpath's screen position (trace.py broadcasts one `screen`
    over the whole cam contribution grid) — so their weighted contributions
    pre-sum EXACTLY into one splat point; only the s == 1 connect-to-camera
    techniques carry their own projected pixels. A full plain-large bank
    (mutation_large.h:119-123) therefore collapses from ~D^2/2 points to
    1 + (D-1). Multiplexed/cache large steps propose a single technique
    (mutation_large_cache.h:125-129), so those modes use single-slot banks.
    """
    large_kind = ('cache' if (opts.sample_from_global_cache and opts.mala)
                  else 'mmlt' if opts.large_step_multiplexed else 'plain')
    if large_kind != 'plain':
        return 1
    from ..path.records import _slot_tables
    _, lgt_sel, _, _ = _slot_tables(D)
    return 1 + len(lgt_sel)


def collapse_flat(flat, s_tags, weight):
    """Collapse a flattened technique list into bank form (see bank_slots).

    flat: dict of [..., NS(, v)] technique arrays; s_tags: static per-slot
    camDepth labels; weight: [...] per-lane scalar applied to every
    technique. Returns (screen [..., NB, 2], contrib [..., NB, 3])."""
    s_tags = np.asarray(s_tags)
    cam_sel = jnp.asarray(np.nonzero(s_tags >= 2)[0])
    lgt_sel = jnp.asarray(np.nonzero(s_tags == 1)[0])
    nb = len(flat['ls_score'].shape) - 1
    ctr = (flat['contrib'] * (flat['ls_score'] > 1e-12)[..., None]
           * weight[..., None, None])
    cam_sum = jnp.take(ctr, cam_sel, nb).sum(nb)
    cam_scr = jnp.take(flat['screen_pos'], cam_sel[:1], nb)
    scr = jnp.concatenate(
        [cam_scr, jnp.take(flat['screen_pos'], lgt_sel, nb)], nb)
    bank = jnp.concatenate(
        [cam_sum[..., None, :], jnp.take(ctr, lgt_sel, nb)], nb)
    return scr, bank


def init_full_state(opts, rec, contrib, screen, ls, ss, score_sum, flat,
                    normalization, from_large):
    """ChainState with the splat bank filled.

    from_large: bank = all techniques weighted norm/scoreSum, collapsed
    (mutation_large.h:119-123, bank_slots); else single technique norm/ls.
    (The reference's MLTInit states carry an EMPTY toSplat and valid=false,
    so the seed bank never actually splats before its first accept replaces
    it — the fill here just keeps resets well-defined.)"""
    C = ls.shape[0]
    D = opts.max_depth
    NB = bank_slots(opts, D)
    base = chain_mod.init_chain_state(rec, contrib, screen, ls, ss,
                                      score_sum, opts)
    if from_large and NB > 1:
        from ..path.records import empty_contribs
        _, s_tags, _ = empty_contribs((1,), D).flatten()
        w = normalization / jnp.maximum(score_sum, 1e-12)
        bank_scr, bank_ctr = collapse_flat(flat, s_tags, w)
    else:
        w = (normalization / jnp.maximum(ls, 1e-12))[:, None]
        bank_scr = jnp.zeros((C, NB, 2)).at[:, 0].set(screen)
        bank_ctr = jnp.zeros((C, NB, 3)).at[:, 0].set(contrib * w)
    return BankedState(state=base, bank_screen=bank_scr, bank_contrib=bank_ctr)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BankedState:
    """ChainState + the current state's pre-weighted splat bank + the shared
    global PSS cache (None unless MALA — only MALA reads or fills it,
    mutation_mala.h:131-164, mlt.cpp:120-127)."""
    state: chain_mod.ChainState
    bank_screen: jnp.ndarray   # [C, NS, 2]
    bank_contrib: jnp.ndarray  # [C, NS, 3] (pre-weighted by normalization)
    cache: object = None       # mcmc.cache.GlobalCache | None


def attach_cache(banked: BankedState, opts):
    """Attach an empty global cache to a fresh BankedState (MALA runs)."""
    if not opts.mala:
        return banked
    rec_proto = None
    if opts.sample_from_global_cache:
        rec_proto = jax.tree.map(lambda a: a[0], banked.state.rec)
    cache = cache_mod.make_cache(opts, 2 * opts.max_depth, rec_proto)
    return dataclasses.replace(banked, cache=cache)


def make_mlt_step(scene, opts, normalization, ls_prob, sparse_large=True,
                  length_dist=None, film_shards=None, no_splat=False):
    """Build the per-iteration chain update (to be jitted by the caller).

    step(key, banked, film, init_banked) -> (banked, film).

    film_shards: when set to S, the film argument is [S, H, W, 3] per-shard
    partial films and every splat point lands in its lane's shard
    (lane // (C // S)) — with chains and the film shard axis co-sharded
    over a device mesh the per-step scatter stays device-local, and the
    caller reduces films.sum(0) ONCE at the end of the run instead of
    psumming a replicated [H, W, 3] film every step. None (default): plain
    [H, W, 3] film.

    sparse_large: only K = ceil(1.3 * C * ls_prob) chains run the (expensive)
    fresh-path generation per step; chains wanting a large step are gathered
    to the front, processed, and scattered back. Kernel choice stays
    independent of each chain's own state (forced-large for invalid chains
    matches the reference, mlt.cpp:97), so per-chain stationarity is
    unchanged; overflow beyond K (binomial tail) falls back to a small step
    that iteration.

    length_dist: Distribution1D over path lengths (bootstrap's lengthDist),
    required when opts.large_step_multiplexed or
    opts.sample_from_global_cache is on (mlt.cpp:72-74)."""
    small_kind = ('h2mc' if opts.h2mc else 'mala' if opts.mala else 'iso')
    # large-step kernel choice (mlt.cpp:72-74): cache-seeded jumps for
    # MALA+sampleFromGlobalCache, else multiplexed or plain
    large_kind = ('cache' if (opts.sample_from_global_cache and opts.mala)
                  else 'mmlt' if opts.large_step_multiplexed else 'plain')
    if large_kind != 'plain':
        assert length_dist is not None, \
            'multiplexed/cache large steps need the bootstrap lengthDist'
    C = opts.num_chains
    D = opts.max_depth
    NB = bank_slots(opts, D)
    K = min(C, max(int(C * min(ls_prob, 1.0) * 1.3) + 1, 8))
    if not (sparse_large and K < C):
        K = C
    from ..path.records import empty_contribs
    _, s_tags_static, _ = empty_contribs((1,), D).flatten()
    if film_shards:
        assert C % film_shards == 0, (C, film_shards)
        lane_shard = jnp.arange(C, dtype=jnp.int32) \
            // (C // film_shards)

    def run_large(k, st, cache):
        if large_kind == 'cache':
            return chain_mod.large_step_cache(scene, opts, k, st,
                                              length_dist, cache)
        if large_kind == 'mmlt':
            return chain_mod.large_step_multiplexed(scene, opts, k, st,
                                                    length_dist)
        return chain_mod.large_step(scene, opts, k, st)

    def step(key, banked, film, init_banked):
        state = banked.state
        cache = banked.cache
        keys = jax.random.split(key, 7)
        u_large = jax.random.uniform(keys[0], (C,))
        want_large = (~state.valid) | (u_large < ls_prob)

        # gather want-large lanes to the front (random tiebreak); the large
        # generation runs at width K and its results stay K-compact until
        # the accept logic needs full width
        if K < C:
            sort_key = jnp.where(want_large, 0.0, 2.0) \
                + jax.random.uniform(keys[6], (C,))
            sel = jnp.argsort(sort_key)[:K]
        else:
            sel = jnp.arange(C)
        state_k = jax.tree.map(lambda x: x[sel] if x.ndim >= 1 else x,
                               state)
        prop_lk, a_lk = run_large(keys[1], state_k, cache)
        did_large_k = want_large[sel]
        a_lk = jnp.where(did_large_k, a_lk, 0.0)

        def scat(x):
            full = jnp.zeros((C,) + x.shape[1:], x.dtype)
            return full.at[sel].set(x, unique_indices=True)

        is_large = jnp.zeros(C, bool).at[sel].set(did_large_k,
                                                   unique_indices=True)
        a_l = scat(a_lk)
        prop_l = {k: (jax.tree.map(scat, v) if k == 'rec' else scat(v))
                  for k, v in prop_lk.items() if k != 'all_flat'}

        # isotropic-mixing lanes share the advanced kernel's single replay
        # (use_iso merging, see chain.small_step_mala)
        u_mix = jax.random.uniform(keys[2], (C,))
        use_iso = u_mix < opts.uniform_mixing_probability
        if small_kind == 'mala':
            prop_adv, a_adv = chain_mod.small_step_mala(
                scene, opts, keys[4], state, cache=cache, use_iso=use_iso,
                skip_lanes=is_large)
        elif small_kind == 'h2mc':
            prop_adv, a_adv = chain_mod.small_step_h2mc(
                scene, opts, keys[4], state, use_iso=use_iso,
                skip_lanes=is_large)
        else:
            prop_adv, a_adv = chain_mod.small_step_iso(scene, opts, keys[4],
                                                       state)
            use_iso = jnp.ones(C, bool)

        a_small = a_adv
        a = jnp.where(is_large, a_l, a_small)

        # ---- splats ----
        # all of this step's splat points go through ONE merged scatter:
        # each separate XLA scatter costs ~3 ms fixed on this chip, and the
        # banks are collapsed to 1 + (D-1) points per lane (see bank_slots)
        small_screen = prop_adv['screen']
        small_contrib = prop_adv['contrib']
        small_ls = prop_adv['ls']
        small_ss = prop_adv['ss']
        w_cur = jnp.where(state.valid, 1.0 - a, 0.0)
        small_w = jnp.where((~is_large) & (a > 0.0),
                            a * normalization
                            / jnp.maximum(small_ls, 1e-12), 0.0)
        parts_scr = [banked.bank_screen.reshape(-1, 2), small_screen]
        parts_ctr = [
            (banked.bank_contrib * w_cur[:, None, None]).reshape(-1, 3),
            small_contrib * small_w[:, None]]
        if film_shards:
            sel_shard = (sel // (C // film_shards)).astype(jnp.int32)
            parts_shard = [jnp.repeat(lane_shard, NB), lane_shard]
        if large_kind == 'plain':
            # large proposal: all techniques (mutation_large.h:119-123),
            # collapsed, splatted at K-compact width
            lf = prop_lk['all_flat']
            inv_ss = 1.0 / jnp.maximum(prop_lk['score_sum'], 1e-12)
            lscr_k, lctr_k = collapse_flat(
                lf, s_tags_static,
                jnp.where(a_lk > 0.0, a_lk * normalization * inv_ss, 0.0))
            parts_scr.append(lscr_k.reshape(-1, 2))
            parts_ctr.append(lctr_k.reshape(-1, 3))
            if film_shards:
                parts_shard.append(
                    jnp.repeat(sel_shard, lscr_k.shape[1]))
            bscr_k, bctr_k = collapse_flat(lf, s_tags_static,
                                           normalization * inv_ss)
            lbank_scr = scat(bscr_k)
            lbank_ctr = scat(bctr_k)
        else:
            # multiplexed / cache-seeded: a single technique per lane
            w_lrg_k = jnp.where(a_lk > 0.0,
                                a_lk * normalization
                                / jnp.maximum(prop_lk['ls'], 1e-12), 0.0)
            parts_scr.append(prop_lk['screen'])
            parts_ctr.append(prop_lk['contrib'] * w_lrg_k[:, None])
            if film_shards:
                parts_shard.append(sel_shard)
            lbank_scr = scat(prop_lk['screen'][:, None, :])
            lbank_ctr = scat(
                (prop_lk['contrib']
                 * (normalization
                    / jnp.maximum(prop_lk['ls'], 1e-12))[:, None])[:, None, :])
        if not no_splat:
            # no_splat: profiling-only switch (profile_step.py) to isolate
            # the film-splat cost from the rest of the step
            film = splat(film, jnp.concatenate(parts_scr, 0),
                         jnp.concatenate(parts_ctr, 0),
                         shard_idx=(jnp.concatenate(parts_shard, 0)
                                    if film_shards else None))

        # ---- accept / reject ----
        u_acc = jax.random.uniform(keys[5], (C,))
        acc = (a > 0.0) & (u_acc <= a)

        prop_rec = chain_mod._where_state(is_large, prop_l['rec'],
                                          prop_adv['rec'])
        prop_contrib = jnp.where(is_large[:, None], prop_l['contrib'],
                                 small_contrib)
        prop_screen = jnp.where(is_large[:, None], prop_l['screen'],
                                small_screen)
        prop_ls = jnp.where(is_large, prop_l['ls'], small_ls)
        prop_ss = jnp.where(is_large, prop_l['ss'], small_ss)
        prop_score_sum = jnp.where(is_large, prop_l['score_sum'],
                                   state.score_sum)

        new_valid = state.valid | acc
        new_rec = chain_mod._where_state(acc, prop_rec, state.rec)
        new_contrib = jnp.where(acc[:, None], prop_contrib, state.contrib)
        new_screen = jnp.where(acc[:, None], prop_screen, state.screen_pos)
        new_ls = jnp.where(acc, prop_ls, state.ls_score)
        new_ss = jnp.where(acc, prop_ss, state.ss_score)
        new_score_sum = jnp.where(acc, prop_score_sum, state.score_sum)

        acc_large = acc & is_large
        acc_small = acc & ~is_large
        acc_small_adv = acc_small & ~use_iso

        # splat bank update
        new_bank_scr = jnp.where(
            acc_large[:, None, None], lbank_scr,
            jnp.where(acc_small[:, None, None],
                      jnp.zeros((C, NB, 2)).at[:, 0].set(small_screen),
                      banked.bank_screen))
        sbank = jnp.zeros((C, NB, 3)).at[:, 0].set(
            small_contrib * (normalization
                             / jnp.maximum(small_ls, 1e-12))[:, None])
        new_bank_ctr = jnp.where(acc_large[:, None, None], lbank_ctr,
                                 jnp.where(acc_small[:, None, None], sbank,
                                           banked.bank_contrib))

        new_last_score_sum = jnp.where(acc_large, prop_l['score_sum'],
                                       state.last_score_sum)
        new_last_score = jnp.where(acc_large, prop_l['ls'], state.last_score)

        if small_kind in ('mala', 'h2mc'):
            ran_adv = ~is_large & ~use_iso
            # only commit the current-side Gaussian where it was actually
            # evaluated (cur_ok): grad-phase lanes beyond the sparse budget
            # proposed from the one-shot iso fallback, which must NOT stick
            # as the cached kernel until the next accept (ADVICE r2)
            cur_ok = prop_adv['cur_ok']
            new_gauss = chain_mod._where_gauss(
                acc_small_adv, prop_adv['gauss_prop'],
                chain_mod._where_gauss(ran_adv & cur_ok,
                                       prop_adv['gauss_cur'],
                                       state.gaussian))
            # gaussianInitialized: set when the advanced kernel ran AND the
            # committed Gaussian is real (proposal side on accept, evaluated
            # current side on reject); cleared on large-step accept and
            # iso-accept (mutation_small.h:39, mlt.cpp:131)
            new_gauss_init = jnp.where(
                acc_large | (acc_small & use_iso), False,
                jnp.where(ran_adv, acc_small_adv | cur_ok,
                          state.gaussian_init))
        else:
            new_gauss = state.gaussian
            new_gauss_init = jnp.where(acc, False, state.gaussian_init)

        if small_kind == 'mala':
            ran_adv = ~is_large & ~use_iso
            # gradient-phase lanes: accept commits the proposal-side EMA
            # moments (mlt.cpp:133-137); cache-phase lanes: the queried
            # moments were committed in-place during Mutate
            grad_l = prop_adv['grad_lane']
            cache_l = prop_adv['cache_lane']
            # gradient-phase chain moments only commit on small-accept
            # (prop_new_*, mlt.cpp:133-137); the reference never writes the
            # current-side scratch back into chain.v1/v2 on reject
            new_v1 = jnp.where((acc_small_adv & grad_l)[:, None],
                               prop_adv['v1_prop'], state.v1)
            new_v1 = jnp.where((ran_adv & cache_l)[:, None],
                               prop_adv['v1_now'], new_v1)
            new_v2 = jnp.where((acc_small_adv & grad_l)[:, None],
                               prop_adv['v2_prop'], state.v2)
            new_v2 = jnp.where((ran_adv & cache_l)[:, None],
                               prop_adv['v2_now'], new_v2)
            new_g = jnp.where(acc_small_adv[:, None], prop_adv['g_prop'],
                              state.g)
            new_t = state.t + acc_small_adv.astype(jnp.int32)
            new_buffered = jnp.where(acc_large, False,
                                     jnp.where(acc_small_adv, True,
                                               state.buffered))
            new_queried = jnp.where(ran_adv, prop_adv['queried'],
                                    state.queried)
            new_last_pss = jnp.where(ran_adv[:, None], prop_adv['last_pss'],
                                     state.last_pss)
            snap = prop_adv['snap']
            snap_sel = lambda n, o: jnp.where(
                ran_adv.reshape(ran_adv.shape + (1,) * (n.ndim - 1)), n, o)
            new_cached_pss = snap_sel(snap['pss'], state.cached_pss)
            new_cached_s = snap_sel(snap['s'], state.cached_s)
            new_cached_t = snap_sel(snap['t'], state.cached_t)
            new_cached_w = snap_sel(snap['weight'], state.cached_weight)
            new_cached_rec = state.cached_rec
            if state.cached_rec is not None:
                new_cached_rec = jax.tree.map(snap_sel, snap['rec'],
                                              state.cached_rec)
            # cache fill: an accepted large step pushes the chain's buffered
            # snapshot into its dimension row (mlt.cpp:120-127)
            if cache is not None:
                push_mask = acc_large & state.buffered
                push_dim = 2 * (state.cached_s + state.cached_t - 1)
                cache = cache_mod.push_batch(
                    cache, push_dim, state.cached_pss, state.v1, state.v2,
                    state.cached_weight, push_mask, opts,
                    s_tag=state.cached_s, t_tag=state.cached_t,
                    rec=state.cached_rec)
        else:
            new_v1, new_v2, new_g = state.v1, state.v2, state.g
            new_t = state.t
            new_buffered = state.buffered
            new_queried, new_last_pss = state.queried, state.last_pss
            new_cached_pss, new_cached_s = state.cached_pss, state.cached_s
            new_cached_t, new_cached_w = state.cached_t, state.cached_weight
            new_cached_rec = state.cached_rec

        new_adj = jnp.where(acc, 0, state.adjacent_reject + 1)
        if opts.remove_outliers:
            strong = state.ls_score > opts.outlier_ratio_threshold * normalization
            reset = ((new_adj > opts.outlier_weak_reject_cnt)
                     | (strong & (new_adj > opts.outlier_strong_reject_cnt)))
        else:
            reset = jnp.zeros(C, bool)

        new_state = chain_mod.ChainState(
            rec=new_rec, valid=new_valid, contrib=new_contrib,
            screen_pos=new_screen, ls_score=new_ls, ss_score=new_ss,
            score_sum=new_score_sum, v1=new_v1, v2=new_v2, g=new_g,
            t=new_t, buffered=new_buffered, stepsize=state.stepsize,
            gaussian=new_gauss, gaussian_init=new_gauss_init,
            last_score_sum=new_last_score_sum, last_score=new_last_score,
            adjacent_reject=new_adj,
            queried=new_queried, last_pss=new_last_pss,
            cached_pss=new_cached_pss, cached_s=new_cached_s,
            cached_t=new_cached_t, cached_weight=new_cached_w,
            cached_rec=new_cached_rec)
        reset_chain = dataclasses.replace(
            init_banked.state,
            valid=jnp.zeros(C, bool),
            gaussian_init=jnp.zeros(C, bool),
            buffered=jnp.zeros(C, bool))
        new_state = chain_mod._where_state(reset, reset_chain, new_state)
        new_banked = BankedState(
            state=new_state,
            bank_screen=jnp.where(reset[:, None, None],
                                  init_banked.bank_screen, new_bank_scr),
            bank_contrib=jnp.where(reset[:, None, None],
                                   init_banked.bank_contrib, new_bank_ctr),
            cache=cache)
        return new_banked, film

    return step


def make_mlt_multi_step(scene, opts, normalization, ls_prob, n_inner,
                        length_dist=None, sparse_large=True,
                        film_shards=None, no_splat=False):
    """n_inner chain iterations fused into one jitted program via lax.scan.

    Host-side dispatch through the device tunnel costs ~25 ms per call on
    this platform — per-step dispatch would dwarf the on-device step. The
    reference has no analogue (its driver IS the hot loop, mlt.cpp:60);
    this is the TPU-shaped fix: step(key, banked, film, init_banked)
    advances all chains n_inner times on-device."""
    step = make_mlt_step(scene, opts, normalization, ls_prob,
                         sparse_large=sparse_large, length_dist=length_dist,
                         film_shards=film_shards, no_splat=no_splat)

    def multi(key, banked, film, init_banked):
        """Returns (banked, film, n_done): n_done is an ON-DEVICE iteration
        counter threaded through the scan, incremented by a data-dependent
        amount, so a host-side assert n_done == n_inner proves the scan body
        actually executed (benchmark self-validation — the BENCH_r02 sync
        artifact reported timings for work that never ran)."""
        keys = jax.random.split(key, n_inner)

        def body(carry, k):
            banked, film, n = carry
            banked, film = step(k, banked, film, init_banked)
            # +1 gated on the UPDATED chain state being finite: the
            # increment data-depends on the step's output, so XLA cannot
            # compute n_done without executing the body (and n_done doubles
            # as a NaN check)
            n = n + jnp.isfinite(
                jnp.sum(banked.state.ss_score)).astype(jnp.int32)
            return (banked, film, n), ()

        (banked, film, n_done), _ = jax.lax.scan(
            body, (banked, film, jnp.int32(0)), keys)
        return banked, film, n_done

    return multi


def render_mlt(scene, opts, key, spp=None, num_steps=None, progress=False,
               chunk=4096, intermediate_path=None, n_inner=16):
    """Full MCMC render. Returns (film [H, W, 3], normalization b).

    intermediate_path: base path for periodic merged-film snapshots every
    reportIntervalSpp spp (mlt.cpp:171-193 'intermediate.exr'); None
    disables even when opts.report_interval_spp > 0.

    n_inner: chain iterations per device dispatch (see
    make_mlt_multi_step)."""
    spp = opts.spp if spp is None else spp
    k_boot, k_direct, k_loop = jax.random.split(key, 3)
    b, length_dist, banked = bootstrap(scene, opts, k_boot, chunk=chunk)
    normalization = b
    C = opts.num_chains
    npix = scene.width * scene.height
    total_samples = spp * npix
    if num_steps is None:
        num_steps = max(total_samples // C, 1)

    direct = render_direct(scene, opts, k_direct, chunk=chunk) \
        if opts.direct_spp > 0 else jnp.zeros((scene.height, scene.width, 3))

    film = jnp.zeros((scene.height, scene.width, 3))
    # two-phase large-step probability: after LS_RATIO of the run the prob
    # scales by largeStepProbScale (mlt.cpp:94-96; disabled for H2MC)
    ls_prob1 = opts.large_step_probability
    scale = 1.0 if opts.h2mc else opts.large_step_prob_scale
    ls_prob2 = min(ls_prob1 * scale, 1.0)
    report_every = 0
    if intermediate_path is not None and opts.report_interval_spp > 0:
        report_every = max(int(opts.report_interval_spp * npix / C), 1)
        n_inner = min(n_inner, report_every)
    n_inner = max(min(n_inner, num_steps), 1)
    num_steps = -(-num_steps // n_inner) * n_inner  # round up to a multiple
    n_outer = num_steps // n_inner

    step1 = jax.jit(make_mlt_multi_step(scene, opts, normalization, ls_prob1,
                                        n_inner, length_dist=length_dist))
    step2 = step1 if ls_prob2 == ls_prob1 else \
        jax.jit(make_mlt_multi_step(scene, opts, normalization, ls_prob2,
                                    n_inner, length_dist=length_dist))
    phase_switch = int(n_outer * opts.ls_ratio)
    init_banked = banked
    banked = attach_cache(banked, opts)
    # host keys (see bootstrap: device-array slices abort the tunnel)
    keys = np.asarray(jax.random.split(k_loop, n_outer))
    for i in range(n_outer):
        step = step1 if i <= phase_switch else step2
        banked, film, _ = step(keys[i], banked, film, init_banked)
        if progress and (i % max(n_outer // 10, 1) == 0):
            print(f'mlt step {i * n_inner}/{num_steps}', flush=True)
        done = (i + 1) * n_inner
        if report_every and done % report_every == 0 and done < num_steps:
            from ..utils import image_io
            spp_so_far = done * C / npix
            snap = direct + film / spp_so_far
            image_io.write_image(f'{intermediate_path}.exr',
                                 np.asarray(snap))
            image_io.write_image(f'{intermediate_path}.png',
                                 np.asarray(snap))

    effective_spp = num_steps * C / npix
    indirect = film / effective_spp
    return direct + indirect, b
