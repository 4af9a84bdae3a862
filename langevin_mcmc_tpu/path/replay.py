"""Path replay: perturbation re-trace and frozen differentiable replay.

Two modes of the same driver, mirroring the reference's split between
PerturbPathBidir (concrete re-trace with Embree + occlusion,
src/path.cpp:1953-2159) and the chad-compiled symbolic replay
(RegisterPathFuncBidir, src/path.cpp:3419-3909) whose grad/Hessian the
mutations consume:

  * mode='perturb': real scene intersection (topology may change), occlusion
    tests on, per-vertex discrete values jittered by N(0, discreteStdDev)
    mod 1, stored rrWeights multiplied in. Returns the single (s,t)
    contribution plus the updated PathRecord.
  * mode='frozen': intersects the *frozen* per-vertex triangles
    (IntersectTriangleMesh semantics), no occlusion, discrete values fixed —
    a pure differentiable function of the PSS offset; jax.grad /
    jax.jacfwd(jax.grad) of its log-luminance replace the reference's
    EmitGrad2 / EmitGradHessian generated kernels (src/chad.cpp:333-880).
    Texture lookups use stop_gradient(st), matching the reference's
    bake-texture-values-at-serialization-time semantics
    (e.g. lambertian.cpp:10-13).

The control flow is data-dependent in the reference (loop bounds = per-path
(s,t)); here every lane runs the padded max_depth loops with masks, and the
terminal connection of each kind is evaluated at every step gated by
(step == s-2) etc. — the XLA-friendly equivalent of one compiled kernel per
(camDepth, lightDepth) pair.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm
from ..ops import bsdf as bsdf_ops
from ..ops import lights as light_ops
from ..ops.intersect import (compute_hit_geometry, make_intersect_fns,
                             intersect_frozen_triangle, tri_vertices_at_time,
                             tri_normals_at_time, gather_tri_row,
                             frozen_from_row, hit_attrs_from_row)
from ..scene.camera import sample_primary
from .records import apply_pss_offset
from . import trace as tr

MIS = vm.mis
INF = jnp.inf


def _frozen_env_sample_direction(scene, lprim, rnd, time, pack=None):
    """SampleDirection with the pixel frozen to lprim (the AD replay variant,
    envlight.cpp:289-319): CDF inversion uses the stored cdf entries of the
    frozen (col,row); only the within-pixel offsets differentiate.

    pack: optional bake_env_pixel pack — every per-lane constant (cdf
    entries, texels, row weights) comes from it instead of scene-table
    gathers (the replay hot path; same AD semantics, the constants are
    constants either way)."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    if pack is not None:
        row, col = pack['row'], pack['col']
        cdf_row0, cdf_row1 = pack['cdf_row0'], pack['cdf_row1']
        cdf_col0, cdf_col1 = pack['cdf_col0'], pack['cdf_col1']
        v00, v10 = pack['v00'], pack['v10']
        v01, v11 = pack['v01'], pack['v11']
        rw0, rw1 = pack['rw0'], pack['rw1']
    else:
        lp = jnp.maximum(lprim, 0)
        row = lp // w
        col = lp % w
        cdf_row0 = scene.env_cdf_rows[row]
        cdf_row1 = scene.env_cdf_rows[row + 1]
        cdf_col0 = scene.env_cdf_cols[row, col]
        cdf_col1 = scene.env_cdf_cols[row, col + 1]
        v00 = light_ops._env_rep_at(scene, col, row)
        v10 = light_ops._env_rep_at(scene, col + 1, row)
        v01 = light_ops._env_rep_at(scene, col, row + 1)
        v11 = light_ops._env_rep_at(scene, col + 1, row + 1)
        rw0 = scene.env_row_weights[jnp.clip(row, 0, h - 1)]
        rw1 = scene.env_row_weights[jnp.clip(row + 1, 0, h - 1)]
    u0 = (rnd[..., 0] - cdf_col0) / jnp.where(cdf_col1 > cdf_col0,
                                              cdf_col1 - cdf_col0, 1.0)
    u1 = (rnd[..., 1] - cdf_row0) / jnp.where(cdf_row1 > cdf_row0,
                                              cdf_row1 - cdf_row0, 1.0)
    tent = jnp.stack([vm.tent(u0), vm.tent(u1)], -1)
    pl = jnp.stack([col.astype(jnp.float32), row.astype(jnp.float32)], -1) + tent
    phi = (pl[..., 0] + 0.5) * scene.env_pixel_size[0]
    theta = (pl[..., 1] + 0.5) * scene.env_pixel_size[1]
    sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
    sin_theta, cos_theta = jnp.sin(theta), jnp.cos(theta)
    d_light = jnp.stack([sin_phi * sin_theta, cos_theta, -cos_phi * sin_theta], -1)
    from ..scene import transforms as T
    rot, _ = T.interpolate_rigid(scene.env_to_world_t, scene.env_to_world_q,
                                 jnp.asarray(time))
    d_world = T.rigid_xform_vector(rot, d_light)
    dx1 = tent[..., 0:1]; dx2 = 1.0 - dx1
    dy1 = tent[..., 1:2]; dy2 = 1.0 - dy1
    value1 = v00 * dx2 * dy2 + v10 * dx1 * dy2
    value2 = v01 * dx2 * dy1 + v11 * dx1 * dy1
    value = value1 + value2
    pdf = ((vm.luminance(value1) * rw0 + vm.luminance(value2) * rw1)
           * scene.env_normalization
           / jnp.maximum(jnp.abs(sin_theta), 1e-7))
    return d_world, value, pdf


def _replay_emit(scene, rec, time, frozen, pack=None):
    """Light::Emit replay with the frozen light instance.

    pack: optional bake_light pack for the record's (light, lprim) — all
    per-lane constants come from it (no scene-table gathers)."""
    light_id = jnp.maximum(rec.lgt_light_id, 0)
    ltype = pack['ltype'] if pack is not None \
        else scene.light_type[light_id]
    # frozen mode overrides the env branch below, so skip its full CDF
    # inversion inside emit (gather waste in the differentiated program)
    out = light_ops.emit(scene, light_id, rec.lgt_lprim,
                         rec.lgt_rnd_pos, rec.lgt_rnd_dir, time,
                         pack=pack, skip_env=frozen)
    if frozen and scene.env_light_id >= 0:
        # env branch with frozen pixel
        d_s, em_e, dpdf_e = _frozen_env_sample_direction(
            scene, rec.lgt_lprim, rec.lgt_rnd_dir, time,
            pack=None if pack is None else pack.get('env'))
        d_e = -d_s
        offset = vm.sample_concentric_disc(rec.lgt_rnd_pos)
        b0, b1 = vm.coordinate_system(d_e)
        perp = offset[..., 0:1] * b0 + offset[..., 1:2] * b1
        org_e = scene.bsphere_center + (perp - d_e) * scene.bsphere_radius
        position_pdf = vm.INV_PI / jnp.square(scene.bsphere_radius)
        is_env = (ltype == light_ops.LIGHT_ENV)
        out = dict(out)
        out['org'] = jnp.where(is_env[..., None], org_e, out['org'])
        out['dir'] = jnp.where(is_env[..., None], d_e, out['dir'])
        out['emission'] = jnp.where(is_env[..., None], em_e, out['emission'])
        out['emission_pdf'] = jnp.where(is_env, dpdf_e * position_pdf,
                                        out['emission_pdf'])
        out['direct_pdf'] = jnp.where(is_env, dpdf_e, out['direct_pdf'])
    return out


def _replay_nee(scene, rec, c_idx, state, time, frozen, occluded_fn, opts,
                mask=None, occ_in=None, pack=None):
    """DirectLighting replay at camera vertex c with the frozen light inst.

    mask: optional [..] bool — lanes outside it shoot dead shadow rays.
    occ_in: optional precomputed occlusion for this terminal's shadow ray
    (the caller batched all terminal rays into one dispatch).
    pack: optional bake_light pack for the terminal NEE (light, lprim)."""
    batch = rec.time.shape
    take = lambda a: jnp.take_along_axis(a, c_idx[..., None], -1)[..., 0]
    take2 = lambda a: jnp.take_along_axis(
        a, c_idx[..., None, None].repeat(2, -1), -2)[..., 0, :]
    light_id = jnp.maximum(take(rec.cam_nee_light), 0)
    lprim = take(rec.cam_nee_lprim)
    nee_rnd = take2(rec.cam_nee_rnd)
    light_pick_prob = pack['pick_prob'] if pack is not None \
        else light_ops.pick_light_prob(scene, light_id)

    if frozen:
        out = light_ops.sample_direct(scene, light_id, lprim, nee_rnd,
                                      state.pos, time, pack=pack,
                                      skip_env=True)
        valid = out['valid']
        occ_ok = jnp.ones(batch, bool)
        # env NEE with the frozen pixel — only when the scene actually has
        # an env map: with the no-env placeholder tables this branch's
        # degenerate math poisons the reverse pass (0 * inf = NaN through
        # the masking where)
        if scene.env_light_id >= 0:
            is_env = (pack['ltype'] if pack is not None
                      else scene.light_type[light_id]) == light_ops.LIGHT_ENV
            d_w, value, pdf = _frozen_env_sample_direction(
                scene, lprim, nee_rnd, time,
                pack=None if pack is None else pack.get('env'))
            safe_pdf = vm.clamp_abs(pdf)
            position_pdf = vm.INV_PI / jnp.square(scene.bsphere_radius)
            out = dict(out)
            out['dir_to_light'] = jnp.where(is_env[..., None], d_w,
                                            out['dir_to_light'])
            out['contrib'] = jnp.where(is_env[..., None],
                                       value / safe_pdf[..., None],
                                       out['contrib'])
            out['direct_pdf'] = jnp.where(is_env, pdf, out['direct_pdf'])
            out['emission_pdf'] = jnp.where(is_env, pdf * position_pdf,
                                            out['emission_pdf'])
            out['dist'] = jnp.where(is_env, jnp.inf, out['dist'])
            valid = out['valid'] | is_env
    else:
        out = light_ops.sample_direct(scene, light_id, lprim, nee_rnd,
                                      state.pos, time, pack=pack)
        valid = out['valid']
        if occ_in is not None:
            occ_ok = ~occ_in
        else:
            occ_max = jnp.where(jnp.isinf(out['dist']), jnp.full(batch, INF),
                                (1.0 - vm.SHADOW_EPS) * out['dist'])
            if mask is not None:
                occ_max = jnp.where(mask, occ_max, 0.0)
            occ = occluded_fn(state.pos, out['dir_to_light'], time,
                              jnp.full(batch, vm.ISECT_EPS), occ_max)
            occ_ok = ~occ

    b_contrib, cos_to_light, bsdf_pdf, bsdf_rev_pdf = bsdf_ops.evaluate(
        state.mat, state.wi, state.shading_n, out['dir_to_light'])
    valid &= jnp.max(jnp.abs(b_contrib), -1) > 0.0
    factor = tr.shading_normal_correction(
        state.wi, state.shading_n, state.geom_n, out['dir_to_light'], False)
    valid &= (factor > 0.0) & occ_ok
    b_contrib = b_contrib * factor[..., None]
    contrib = (state.throughput * b_contrib * out['contrib']
               / jnp.maximum(light_pick_prob, 1e-12)[..., None])
    delta = light_ops.is_delta(scene, light_id)
    safe_dpdf = vm.clamp_abs(out['direct_pdf'])
    w_light = jnp.where(delta, 0.0,
                        MIS(bsdf_pdf / (light_pick_prob * safe_dpdf)))
    safe_cal = vm.clamp_abs(out['cos_at_light'])
    w_camera = (MIS(out['emission_pdf'] * cos_to_light / (safe_dpdf * safe_cal))
                * (state.acc_prev + state.acc_this * MIS(bsdf_rev_pdf)))
    mis_w = 1.0 / (w_light + 1.0 + w_camera)
    contrib = contrib * mis_w[..., None]
    score = vm.luminance(contrib)
    valid &= score > 0.0
    return contrib, score, score * state.ss_jacobian, mis_w, valid


def replay_path(scene, opts, rec, offset, noise, mode='perturb', bake=None,
                collect_bake=False):
    """Replay the record's (s,t) subpath with PSS offsets applied.

    lax.scan over depth steps; terminal connections of each kind are
    evaluated every step gated by (step == s-2) / (step == t-2) — the
    XLA-friendly equivalent of the reference's per-(s,t) compiled kernels.

    rec: PathRecord tagged by to_subpath (cam_depth/lgt_depth set).
    offset: [..., 2*max_depth] PSS offset.
    noise: dict with 'time', 'cam_disc' [...,D], 'lgt_disc' [...,D] gaussian
      jitters (perturb mode only; pass None when frozen).

    bake / collect_bake — the TPU analogue of the reference's Serialize()
    (path.cpp:2497-2587): every per-lane scene-table constant the replay
    consumes (packed tri rows, material params with textures resolved,
    light/env packs), pre-gathered OUTSIDE the differentiated program.
    TPU gathers move ~an element per cycle; the traced 65536-lane frozen
    gradient spent 168 of 191 ms in them (xref_grad r5), so the grad path
    must not gather. collect_bake=True returns a third output holding the
    bake for THIS replay's output record; bake=<that> consumes it in
    frozen mode (gather-free differentiable replay). Static scenes only
    (the caller gates on scene.has_motion); primal values are identical
    either way, and every baked quantity is a constant w.r.t. the offset
    in frozen mode by the reference's own AD semantics (baked texture
    values: lambertian.cpp:10-13; frozen env neighborhood:
    envlight.cpp:83-120; frozen triangle: trianglemesh.cpp:367-475).

    Returns (new_rec, result) or (new_rec, result, bake_out); result =
    dict(contrib, ls_score, ss_score, screen_pos, mis_weight, valid).
    """
    frozen = mode == 'frozen'
    D = rec.max_depth
    batch = rec.time.shape
    rec = apply_pss_offset(rec, offset)
    if not frozen:
        rec = dataclasses.replace(
            rec,
            time=vm.modulo(rec.time + noise['time'], 1.0),
            cam_bsdf_disc=vm.modulo(rec.cam_bsdf_disc + noise['cam_disc'], 1.0),
            lgt_bsdf_disc=vm.modulo(rec.lgt_bsdf_disc + noise['lgt_disc'], 1.0))
    time = rec.time
    s = rec.cam_depth
    t = rec.lgt_depth
    intersect_fn, occluded_fn = make_intersect_fns(scene)
    spc = tr.screen_pixel_count(scene)

    static_geom = not scene.has_motion
    use_bake = bake is not None
    assert not (use_bake and collect_bake), 'bake in XOR bake out'
    assert not use_bake or frozen, 'bake consumption is frozen-mode only'
    if (use_bake or collect_bake) and not static_geom:
        raise ValueError('path bake requires a static scene')
    c_idx = jnp.clip(s - 2, 0, D - 1).astype(jnp.int32)
    take_c = lambda a: jnp.take_along_axis(a, c_idx[..., None], -1)[..., 0]
    if use_bake:
        emit_pack = bake['emit']
        nee_pack = bake['nee']
    elif collect_bake:
        emit_pack = light_ops.bake_light(scene, rec.lgt_light_id,
                                         rec.lgt_lprim)
        nee_pack = light_ops.bake_light(scene, take_c(rec.cam_nee_light),
                                        take_c(rec.cam_nee_lprim))
    else:
        emit_pack = nee_pack = None

    from ..ops.intersect import gather_tri_row_raw, row_dict_from_raw

    def surf_from_frozen(tri, org, d, row_raw=None):
        """Returns (pos, sn, gn, st, hit, mat_id, row_raw): one packed row
        gather on static scenes (or a bake slice) instead of 4 separate
        per-step gathers."""
        if static_geom:
            raw = gather_tri_row_raw(scene, tri) if row_raw is None \
                else row_raw
            row = row_dict_from_raw(raw)
            pos, sn, gn, st, t_hit = frozen_from_row(row, org, d)
            return pos, sn, gn, st, jnp.ones(batch, bool), row['mat_id'], raw
        tp = tri_vertices_at_time(scene, tri, time)
        tn = tri_normals_at_time(scene, tri, time)
        tst = scene.tri_st[tri]
        pos, sn, gn, st, t_hit = intersect_frozen_triangle(tp, tn, tst, org, d)
        return (pos, sn, gn, st, jnp.ones(batch, bool),
                scene.tri_mat[tri], None)

    def hit_geom(tri, org, d, t_hit, u_hit, v_hit):
        """Post-intersect attributes + mat id (+ raw packed row), shared
        packed row gather."""
        if static_geom:
            raw = gather_tri_row_raw(scene, tri)
            row = row_dict_from_raw(raw)
            pos, sn, gn, st = hit_attrs_from_row(row, org, d, t_hit, u_hit,
                                                 v_hit)
            return pos, sn, gn, st, row['mat_id'], raw
        pos, sn, gn, st = compute_hit_geometry(scene, tri, org, d, t_hit,
                                               u_hit, v_hit, time)
        return pos, sn, gn, st, scene.tri_mat[tri], None

    def mat_at(mat_id, st):
        st_tex = jax.lax.stop_gradient(st) if frozen else st
        return bsdf_ops.gather_mat_params(scene, mat_id, st_tex)

    def zero_state():
        """Placeholder last-light-state for lanes without a light subpath.

        Must be geometrically NON-degenerate (unit normals, off-origin
        position): its connect_vertex results are masked out, but a
        degenerate state would push inf partials (normalize(0), 1/cos^4)
        through the masked branch and nan the reverse pass."""
        z = jnp.zeros(batch)
        z3 = jnp.zeros(batch + (3,))
        up = jnp.zeros(batch + (3,)).at[..., 2].set(1.0)
        return tr.SurfState(
            pos=jnp.broadcast_to(scene.bsphere_center, batch + (3,)) + up,
            shading_n=up, geom_n=up, st=jnp.zeros(batch + (2,)),
            wi=up, mat=bsdf_ops.gather_mat_params(
                scene, jnp.zeros(batch, jnp.int32), jnp.zeros(batch + (2,))),
            tri=jnp.zeros(batch, jnp.int32), acc_prev=z, acc_this=z,
            throughput=z3, ss_jacobian=z, last_bsdf_pdf=z)

    def sel_state(pred, a, b):
        def f(x, y):
            p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
            return jnp.where(p, x, y)
        return jax.tree.map(f, a, b)

    # ---------------- light subpath ----------------
    has_lgt = t >= 2
    if emit_pack is not None:
        light_pick_prob = emit_pack['pick_prob']
        delta_light = emit_pack['is_delta']
        finite_light = emit_pack['is_finite']
    else:
        light_pick_prob = light_ops.pick_light_prob(
            scene, jnp.maximum(rec.lgt_light_id, 0))
        delta_light = light_ops.is_delta(scene,
                                         jnp.maximum(rec.lgt_light_id, 0))
        finite_light = light_ops.is_finite(scene,
                                           jnp.maximum(rec.lgt_light_id, 0))
    em = _replay_emit(scene, rec, time, frozen, pack=emit_pack)
    emission_pdf = em['emission_pdf'] * light_pick_prob
    direct_pdf = em['direct_pdf'] * light_pick_prob
    throughput0 = em['emission'] / jnp.maximum(light_pick_prob, 1e-12)[..., None]
    safe_epdf = vm.clamp_abs(emission_pdf)
    acc_prev0 = MIS(direct_pdf / safe_epdf)
    acc_this0 = jnp.where(delta_light, 0.0, MIS(em['cos_at_light'] / safe_epdf))

    lgt_xs = dict(
        tri=jnp.moveaxis(rec.lgt_tri, -1, 0),
        bsdf_rnd=jnp.moveaxis(rec.lgt_bsdf_rnd, -2, 0),
        bsdf_disc=jnp.moveaxis(rec.lgt_bsdf_disc, -1, 0),
        use_abs=jnp.moveaxis(rec.lgt_use_abs, -1, 0),
        rr=jnp.moveaxis(rec.lgt_rr, -1, 0))

    # ---------------- camera subpath setup ----------------
    has_cam = s >= 2
    org0, d0, mn0, mx0 = sample_primary(scene.camera, rec.screen_pos, time)
    _, cam_center_dir_v = tr.camera_center_dir(scene.camera, time)
    cpdf = tr.camera_pdf_w(scene, cam_center_dir_v, d0)
    has_env = scene.env_light_id >= 0

    # light-coordinate replay lanes (PerturbPathBidir, path.cpp:2113-2145):
    # (s,0) subpaths whose stored last vertex sits on an area light replace
    # the second-to-last BSDF sampling with a sample of the frozen light
    # triangle at the perturbed randoms. Gated s >= 4 to mirror the
    # generation-side camDepth > 1 reparam (path.cpp:1339) — the reference
    # replays s == 3 through light coords it never generated.
    lc_enabled = bool(opts.use_light_coordinate_sampling)
    if lc_enabled:
        D_ = rec.max_depth
        last_idx = jnp.clip(s - 2, 0, D_ - 1)
        tri_last = jnp.take_along_axis(rec.cam_tri, last_idx[..., None],
                                       -1)[..., 0]
        lc_lane = ((t == 0) & (s >= 4) & (tri_last >= 0)
                   & (scene.tri_light[jnp.maximum(tri_last, 0)] >= 0))
        tri_last_safe = jnp.maximum(tri_last, 0)

    cam_xs = dict(
        tri=jnp.moveaxis(rec.cam_tri, -1, 0),
        bsdf_rnd=jnp.moveaxis(rec.cam_bsdf_rnd, -2, 0),
        bsdf_disc=jnp.moveaxis(rec.cam_bsdf_disc, -1, 0),
        use_abs=jnp.moveaxis(rec.cam_use_abs, -1, 0),
        rr=jnp.moveaxis(rec.cam_rr, -1, 0))

    if use_bake:
        nbatch = len(batch)
        mv_in = lambda a: jnp.moveaxis(a, nbatch, 0)
        lgt_xs['row'] = mv_in(bake['lgt_row'])
        lgt_xs['mat'] = jax.tree.map(mv_in, bake['lgt_mat'])
        cam_xs['row'] = mv_in(bake['cam_row'])
        cam_xs['mat'] = jax.tree.map(mv_in, bake['cam_mat'])

    # ---------------- merged light+camera walk ----------------
    # Both subpaths advance in lockstep through ONE lax.scan whose body
    # issues a SINGLE chunk-walk intersect on the concatenated [2C] ray
    # batch per depth step — halving the per-step kernel dispatches (each
    # carries a ~1-2 ms fixed cost) vs the old separate scans, and giving
    # the kernel a bigger, better-sorted wavefront. The subpaths are
    # independent until the terminals, so lockstepping them changes
    # nothing semantically.
    can_batch_rays = (not frozen) and len(batch) == 1

    def walk_body(carry, xs):
        lgt_c, cam_c = carry
        l, lv, cv = xs
        c = l  # same step index on both sides

        (lorg, ld, lgt_ok, lacc_prev, lacc_this, lthroughput, lss_jac,
         last_state) = lgt_c
        (org, d, cam_ok, acc_prev, acc_this, throughput, ss_jac,
         min_t, max_t, term_state, term_org, term_d, term_hit) = cam_c

        l_active = has_lgt & (l < t - 1)
        active = has_cam & (c < s - 1)
        is_last = active & (c == s - 2)

        # --- intersections ---
        if frozen:
            l_tri = jnp.maximum(lv['tri'], 0)
            lpos, lsn, lgn, lst, l_hit, l_mat_id, l_raw = surf_from_frozen(
                l_tri, lorg, ld, row_raw=lv.get('row'))
            new_lgt_tri = lv['tri']

            env_case = is_last & (t == 0) & (rec.env_lprim >= 0)
            tri = jnp.maximum(cv['tri'], 0)
            pos, sn, gn, st, hit, mat_id, c_raw = surf_from_frozen(
                tri, org, d, row_raw=cv.get('row'))
            hit = hit & ~env_case
            new_cam_tri = cv['tri']
        else:
            # inactive lanes get a dead ray (max_t < min_t): the chunk-walk
            # kernel skips them, making padded depth steps nearly free
            l_max = jnp.where(l_active, INF, 0.0)
            c_max = jnp.where(active, max_t, 0.0)
            if can_batch_rays:
                org2 = jnp.concatenate([lorg, org], 0)
                d2 = jnp.concatenate([ld, d], 0)
                t2 = jnp.concatenate([time, time], 0)
                mn2 = jnp.concatenate(
                    [jnp.full(batch, vm.ISECT_EPS), min_t], 0)
                mx2 = jnp.concatenate([l_max, c_max], 0)
                hit2, tid2, th2, uh2, vh2 = intersect_fn(org2, d2, t2,
                                                         mn2, mx2)
                C_ = batch[0]
                l_hit, hit = hit2[:C_], hit2[C_:]
                l_tid, tid = tid2[:C_], tid2[C_:]
                l_th, t_hit = th2[:C_], th2[C_:]
                l_uh, u_hit = uh2[:C_], uh2[C_:]
                l_vh, v_hit = vh2[:C_], vh2[C_:]
            else:
                l_hit, l_tid, l_th, l_uh, l_vh = intersect_fn(
                    lorg, ld, time, jnp.full(batch, vm.ISECT_EPS), l_max)
                hit, tid, t_hit, u_hit, v_hit = intersect_fn(
                    org, d, time, min_t, c_max)
            l_tri = l_tid
            lpos, lsn, lgn, lst, l_mat_id, l_raw = hit_geom(
                l_tid, lorg, ld, l_th, l_uh, l_vh)
            new_lgt_tri = jnp.where(l_active & l_hit, l_tid, lv['tri'])
            tri = tid
            pos, sn, gn, st, mat_id, c_raw = hit_geom(tid, org, d, t_hit,
                                                      u_hit, v_hit)
            new_cam_tri = jnp.where(active & hit, tid, cv['tri'])

        # --- light-side step ---
        lgt_ok = lgt_ok & jnp.where(l_active, l_hit, True)
        l_mat = lv['mat'] if use_bake else mat_at(l_mat_id, lst)
        l_state = tr.SurfState(pos=lpos, shading_n=lsn, geom_n=lgn, st=lst,
                               wi=-ld, mat=l_mat, tri=l_tri,
                               acc_prev=lacc_prev, acc_this=lacc_this,
                               throughput=lthroughput, ss_jacobian=lss_jac,
                               last_bsdf_pdf=jnp.zeros(batch))
        include_dist = jnp.where(l == 0, finite_light, jnp.ones(batch, bool))
        l_state = tr.convert_mis(l_state, lorg, ld, include_dist)

        l_is_last = l_active & (l == t - 2)
        # terminal connections are evaluated ONCE after the scan on the
        # selected last state (the reference evaluates them once per path
        # too — the old per-step evaluation was pure padding waste)
        last_state = sel_state(l_is_last, l_state, last_state)

        l_cont = l_active & ~l_is_last
        # safe randoms at non-extending steps (see the camera-side note)
        lgt_rnd_in = jnp.where(l_cont[..., None], lv['bsdf_rnd'], 0.5)
        l_new_d, l_new_state, l_b_contrib, _, l_b_ok, _, _ = \
            tr.bsdf_sampling(scene, opts, l_state, lgt_rnd_in,
                             lv['bsdf_disc'], l, adjoint=True, perturb=True,
                             use_abs_in=lv['use_abs'])
        lgt_ok = lgt_ok & jnp.where(l_cont, l_b_ok, True)
        l_rr_w = lv['rr']
        lthroughput = jnp.where(l_cont[..., None],
                                l_new_state.throughput * l_rr_w[..., None],
                                lthroughput)
        lacc_prev = jnp.where(l_cont, l_new_state.acc_prev, lacc_prev)
        lacc_this = jnp.where(l_cont, l_new_state.acc_this, lacc_this)
        lss_jac = jnp.where(l_cont, l_new_state.ss_jacobian, lss_jac)
        lorg = jnp.where(l_cont[..., None], l_state.pos, lorg)
        ld = jnp.where(l_cont[..., None], l_new_d, ld)
        new_lgt_c = (lorg, ld, lgt_ok, lacc_prev, lacc_this, lthroughput,
                     lss_jac, last_state)

        # --- camera-side step ---
        v = cv
        mat = cv['mat'] if use_bake else mat_at(mat_id, st)
        state = tr.SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                             mat=mat, tri=tri, acc_prev=acc_prev,
                             acc_this=acc_this, throughput=throughput,
                             ss_jacobian=ss_jac,
                             last_bsdf_pdf=jnp.zeros(batch))
        st_mis = tr.convert_mis(state, org, d, jnp.ones(batch, bool))
        state = dataclasses.replace(
            state,
            acc_prev=jnp.where(hit, st_mis.acc_prev, state.acc_prev),
            acc_this=jnp.where(hit, st_mis.acc_this, state.acc_this))
        cam_ok = cam_ok & jnp.where(active & ~is_last, hit, True)

        # terminal evaluation happens ONCE after the scan; here we only
        # capture the last vertex's interaction
        term_state = sel_state(is_last, state, term_state)
        term_org = jnp.where(is_last[..., None], org, term_org)
        term_d = jnp.where(is_last[..., None], d, term_d)
        term_hit = jnp.where(is_last, hit, term_hit)

        # continue
        cont = active & ~is_last
        # every discarded branch must see SAFE random numbers: zeros at
        # padding steps (and light-coordinate randoms at the lc vertex)
        # are not valid sphere params, and sqrt/atan2-at-degeneracy
        # partials in an unselected branch turn into 0*inf = NaN through
        # jnp.where in the reverse pass
        bsdf_rnd_in = jnp.where(cont[..., None], v['bsdf_rnd'], 0.5)
        if lc_enabled:
            lc_now = lc_lane & cont & (c == s - 3)
            bsdf_rnd_in = jnp.where(lc_now[..., None], 0.5, bsdf_rnd_in)
            lc_rnd_in = jnp.where(lc_now[..., None], v['bsdf_rnd'], 0.5)
        new_d, new_state, b_contrib, use_abs, b_ok, _, _ = tr.bsdf_sampling(
            scene, opts, state, bsdf_rnd_in, v['bsdf_disc'], c,
            adjoint=False, perturb=True, use_abs_in=v['use_abs'])
        thr_next = new_state.throughput
        accp_next = new_state.acc_prev
        acct_next = new_state.acc_this
        ssj_next = new_state.ss_jacobian
        if lc_enabled:
            # LightCoordinateSampling (path.cpp:1881-1952): sample the
            # frozen light triangle at the perturbed randoms instead of
            # BSDF-sampling a direction
            pos_l, n_l = light_ops._sample_tri(scene, tri_last_safe,
                                               lc_rnd_in, time)
            to_l = pos_l - state.pos
            d2_lc = jnp.maximum(vm.length_squared(to_l), 1e-12)
            dist_lc = jnp.sqrt(d2_lc)
            dir_lc = to_l / dist_lc[..., None]
            lc_valid = jnp.ones(batch, bool)
            if not frozen:
                occ = occluded_fn(state.pos, dir_lc, time,
                                  jnp.full(batch, vm.ISECT_EPS),
                                  jnp.where(lc_now,
                                            (1.0 - vm.SHADOW_EPS) * dist_lc,
                                            0.0))
                lc_valid &= ~occ
            f_lc, cos_lc, pdf_lc, rev_pdf_lc = bsdf_ops.evaluate(
                state.mat, state.wi, state.shading_n, dir_lc)
            lc_valid &= jnp.max(jnp.abs(f_lc), -1) > 0.0
            safe_pdf = vm.clamp_abs(pdf_lc)
            contrib_lc = f_lc / safe_pdf[..., None]
            acct_lc = jnp.minimum(
                MIS(cos_lc / safe_pdf)
                * (state.acc_this * MIS(rev_pdf_lc) + state.acc_prev),
                tr.ACC_MAX)
            accp_lc = jnp.minimum(MIS(1.0 / safe_pdf), tr.ACC_MAX)
            # bsdfPdf / shapePdf — matches the generation-side
            # lcJacobian / SamplePdf() so the zero-offset replay reproduces
            # the generated ssScore exactly (the uni pairing,
            # path.cpp:1721-1722; the bidir replay at path.cpp:1925 omits
            # the shapePdf division and disagrees with its generator by a
            # constant totalArea factor)
            ssf_lc = (jnp.abs(vm.dot(dir_lc, n_l)) / d2_lc * pdf_lc
                      / light_ops.sample_tri_pdf(scene, tri_last_safe))
            new_d = jnp.where(lc_now[..., None], dir_lc, new_d)
            b_ok = jnp.where(lc_now, lc_valid, b_ok)
            thr_next = jnp.where(lc_now[..., None],
                                 state.throughput * contrib_lc, thr_next)
            accp_next = jnp.where(lc_now, accp_lc, accp_next)
            acct_next = jnp.where(lc_now, acct_lc, acct_next)
            ssj_next = jnp.where(lc_now, state.ss_jacobian * ssf_lc,
                                 ssj_next)
        cam_ok = cam_ok & jnp.where(cont, b_ok, True)
        rr_w = v['rr']
        throughput = jnp.where(cont[..., None],
                               thr_next * rr_w[..., None],
                               throughput)
        acc_prev = jnp.where(cont, accp_next, acc_prev)
        acc_this = jnp.where(cont, acct_next, acc_this)
        ss_jac = jnp.where(cont, ssj_next, ss_jac)
        org = jnp.where(cont[..., None], state.pos, org)
        d = jnp.where(cont[..., None], new_d, d)
        min_t = jnp.full(batch, vm.ISECT_EPS)
        max_t = jnp.full(batch, INF)
        new_cam_c = (org, d, cam_ok, acc_prev, acc_this, throughput, ss_jac,
                     min_t, max_t, term_state, term_org, term_d, term_hit)
        ys = (new_lgt_tri, new_cam_tri)
        if collect_bake:
            ys = ys + ((l_raw, l_mat, c_raw, mat),)
        return (new_lgt_c, new_cam_c), ys

    lgt_init = (em['org'], em['dir'], jnp.ones(batch, bool),
                acc_prev0, acc_this0, throughput0, jnp.ones(batch),
                zero_state())
    cam_init = (org0, d0, jnp.ones(batch, bool), MIS(spc / cpdf),
                jnp.zeros(batch), jnp.ones(batch + (3,)), jnp.ones(batch),
                mn0, mx0, zero_state(), jnp.zeros(batch + (3,)),
                jnp.zeros(batch + (3,)).at[..., 2].set(1.0),
                jnp.zeros(batch, bool))
    # NOTE: jax.checkpoint(walk_body) for the frozen-grad reverse pass was
    # measured SLOWER on the v5e (89.6 ms vs 78.0 ms per 16k-lane grad):
    # the reverse pass is compute-bound, not activation-bandwidth-bound,
    # so rematerialization just pays an extra forward.
    # unroll: the r4 trace of one 64k-lane frozen grad showed 45,825
    # device events — only 175 ms of the 305 ms call was fusion compute;
    # ~95 ms was the while-loop's residual bookkeeping (6,512
    # dynamic-update-slices stacking per-step residuals for the reverse
    # pass) plus tens of thousands of launches at the tunnel's ~16 us
    # fixed per-kernel cost. The trip count is the STATIC max_depth, so
    # unrolling lets XLA fuse across depth steps and delete the stacking
    # entirely (LMC_WALK_UNROLL=1 to disable if compile time bites).
    # Backend-aware default: full unroll on TPU only — on the CPU backend
    # (tests, multichip dryrun) the unrolled module multiplies compile
    # time for no wall-clock value (MULTICHIP_r04 rc=124 died compiling).
    import os as _os
    _unroll = int(_os.environ.get('LMC_WALK_UNROLL', '0')) or \
        (D if jax.default_backend() == 'tpu' else 1)
    (lgt_fin, cam_fin), scan_ys = jax.lax.scan(
        walk_body, (lgt_init, cam_init), (jnp.arange(D), lgt_xs, cam_xs),
        unroll=_unroll)
    if collect_bake:
        new_lgt_tri, new_cam_tri, collected = scan_ys
    else:
        new_lgt_tri, new_cam_tri = scan_ys
    (_, _, lgt_ok, _, _, _, _, last_lgt_state) = lgt_fin
    (_, _, cam_ok, _, _, _, _, _, _, term_state, term_org, term_d,
     term_hit) = cam_fin
    if not frozen:
        rec = dataclasses.replace(
            rec, lgt_tri=jnp.moveaxis(new_lgt_tri, 0, -1),
            cam_tri=jnp.moveaxis(new_cam_tri, 0, -1))

    # ---------------- terminals, evaluated once ----------------
    out0 = dict(contrib=jnp.zeros(batch + (3,)), ls=jnp.zeros(batch),
                ss=jnp.zeros(batch), mis=jnp.zeros(batch),
                valid=jnp.zeros(batch, bool))
    out = out0
    term_hit = term_hit & has_cam
    if frozen:
        env_case = has_cam & (t == 0) & (rec.env_lprim >= 0)
    else:
        env_case = has_cam & (t == 0) & (~term_hit) & has_env
    hit_light_id = jnp.where(term_hit,
                             scene.tri_light[jnp.maximum(term_state.tri, 0)],
                             -1)
    if use_bake:
        hit_pack = bake['hit']
    elif collect_bake:
        hl = jnp.maximum(hit_light_id, 0)
        hit_pack = dict(emission=scene.light_emission[hl],
                        inv_area=scene.light_inv_area[hl],
                        pick_prob=light_ops.pick_light_prob(scene, hl))
        if scene.env_light_id >= 0:
            hit_pack['env'] = light_ops.bake_env_dir(scene, term_d, time)
    else:
        hit_pack = None

    cc_mask = (s == 1) & has_lgt
    nee_mask = has_cam & (t == 1) & term_hit
    cv_mask = has_cam & (t >= 2) & term_hit

    # --- ONE batched occlusion for the cc/NEE/connect-vertex terminals:
    # the masks are exclusive by (s, t), so each lane contributes exactly
    # one ray and one occluded_fn dispatch covers all three terminals
    # (each dispatch costs ~1-2 ms fixed on the chunk-walk kernel). The
    # per-terminal ray setup below duplicates arithmetic the terminal
    # evaluators redo — XLA CSE merges the copies.
    occ_term = None
    if not frozen:
        cam_org_v, _ = tr.camera_center_dir(scene.camera, time)
        to_cam = cam_org_v - last_lgt_state.pos
        d_cc = jnp.sqrt(jnp.maximum(vm.length_squared(to_cam), 1e-12))
        dir_cc = to_cam / d_cc[..., None]

        take = lambda a: jnp.take_along_axis(a, c_idx[..., None], -1)[..., 0]
        take2 = lambda a: jnp.take_along_axis(
            a, c_idx[..., None, None].repeat(2, -1), -2)[..., 0, :]
        nee_out = light_ops.sample_direct(
            scene, jnp.maximum(take(rec.cam_nee_light), 0),
            take(rec.cam_nee_lprim), take2(rec.cam_nee_rnd),
            term_state.pos, time, pack=nee_pack)
        nee_max = jnp.where(jnp.isinf(nee_out['dist']),
                            jnp.full(batch, INF),
                            (1.0 - vm.SHADOW_EPS) * nee_out['dist'])

        to_l = last_lgt_state.pos - term_state.pos
        d_cv = jnp.sqrt(jnp.maximum(vm.length_squared(to_l), 1e-12))
        dir_cv = to_l / d_cv[..., None]

        occ_org = jnp.where(cc_mask[..., None], last_lgt_state.pos,
                            term_state.pos)
        occ_dir = jnp.where(cc_mask[..., None], dir_cc,
                            jnp.where(nee_mask[..., None],
                                      nee_out['dir_to_light'], dir_cv))
        occ_max = jnp.where(
            cc_mask, (1.0 - vm.SHADOW_EPS) * d_cc,
            jnp.where(nee_mask, nee_max,
                      jnp.where(cv_mask, (1.0 - vm.SHADOW_EPS) * d_cv,
                                0.0)))
        occ_term = occluded_fn(occ_org, occ_dir, time,
                               jnp.full(batch, vm.ISECT_EPS), occ_max)

    # --- terminal s == 1: ConnectToCamera on the last light state ---
    cc_screen, cc_contrib, cc_ls, cc_ss, cc_mis, cc_ok = \
        tr.connect_to_camera(scene, opts, occluded_fn, time, last_lgt_state,
                             spc, do_occlusion=not frozen, mask=cc_mask,
                             occ_in=occ_term)
    cc_sel = cc_mask & lgt_ok & cc_ok
    cc_out = dict(
        contrib=jnp.where(cc_sel[..., None], cc_contrib, 0.0),
        ls=jnp.where(cc_sel, cc_ls, 0.0),
        ss=jnp.where(cc_sel, cc_ss, 0.0),
        mis=jnp.where(cc_sel, cc_mis, 0.0),
        screen=jnp.where(cc_sel[..., None], cc_screen, 0.0),
        valid=cc_sel)

    # --- terminal t == 0: HandleHitLight ---
    is_hit_light = has_cam & (t == 0) & (
        (term_hit & (hit_light_id >= 0)) | env_case)
    h_contrib, h_ls, h_ss, h_mis, h_ok = tr.handle_hit_light(
        scene, s == 2, term_hit & ~env_case, hit_light_id, term_state.tri,
        rec.env_lprim, term_org, term_d, time, term_state, rec.screen_pos,
        pack=hit_pack)
    sel = is_hit_light & cam_ok & lgt_ok & h_ok
    out = _acc_out(out, sel, h_contrib, h_ls, h_ss, h_mis, None)

    # --- terminal t == 1: NEE ---
    n_contrib, n_ls, n_ss, n_mis, n_ok = _replay_nee(
        scene, rec, c_idx, term_state, time, frozen, occluded_fn, opts,
        mask=nee_mask, occ_in=occ_term, pack=nee_pack)
    sel = nee_mask & cam_ok & n_ok
    out = _acc_out(out, sel, n_contrib, n_ls, n_ss, n_mis, None)

    # --- terminal t >= 2: ConnectVertex with last light vertex ---
    v_contrib, v_ls, v_ss, v_mis, v_ok = tr.connect_vertex(
        scene, opts, occluded_fn, time, last_lgt_state, term_state,
        do_occlusion=not frozen, mask=cv_mask, occ_in=occ_term)
    sel = cv_mask & cam_ok & lgt_ok & v_ok
    out = _acc_out(out, sel, v_contrib, v_ls, v_ss, v_mis, None)

    # merge camera-terminal and light-terminal (s==1) outputs
    contrib = jnp.where(cc_out['valid'][..., None], cc_out['contrib'],
                        out['contrib'])
    ls = jnp.where(cc_out['valid'], cc_out['ls'], out['ls'])
    ss = jnp.where(cc_out['valid'], cc_out['ss'], out['ss'])
    mis = jnp.where(cc_out['valid'], cc_out['mis'], out['mis'])
    screen = jnp.where(cc_out['valid'][..., None], cc_out['screen'],
                       rec.screen_pos)
    valid = (out['valid'] | cc_out['valid']) \
        & jnp.where(has_cam, cam_ok, True) \
        & jnp.where(has_lgt, lgt_ok, True)
    result = dict(contrib=contrib, ls_score=ls, ss_score=ss,
                  mis_weight=mis, screen_pos=screen, valid=valid)
    if collect_bake:
        l_raws, l_mats, c_raws, c_mats = collected
        nb = len(batch)
        mv_out = lambda a: jnp.moveaxis(a, 0, nb)
        bake_out = dict(
            emit=emit_pack, nee=nee_pack, hit=hit_pack,
            lgt_row=mv_out(l_raws), cam_row=mv_out(c_raws),
            lgt_mat=jax.tree.map(mv_out, l_mats),
            cam_mat=jax.tree.map(mv_out, c_mats))
        return rec, result, bake_out
    return rec, result


def _acc_out(out, sel, contrib, ls, ss, mis, screen):
    return dict(
        contrib=jnp.where(sel[..., None], contrib, out['contrib']),
        ls=jnp.where(sel, ls, out['ls']),
        ss=jnp.where(sel, ss, out['ss']),
        mis=jnp.where(sel, mis, out['mis']),
        valid=out['valid'] | sel)


# ---------------------------------------------------------------------------
# derivatives of the frozen replay (the "compiled derivative kernel")
# ---------------------------------------------------------------------------

def bake_frozen(scene, opts, rec):
    """Frozen-path data for a record batch (Serialize, path.cpp:2497-2587):
    one gather-ful frozen forward walk that collects every per-vertex /
    per-lane scene constant; path_grad/path_grad_hessian with this bake
    contain NO scene-table gathers. For proposal records the bake comes
    free from the perturb replay (collect_bake=True) — use this prepass
    only for records with no preceding replay (current-side gradients)."""
    Dm = 2 * rec.max_depth
    zeros = jnp.zeros(rec.time.shape + (Dm,))
    _, _, bake = replay_path(scene, opts, rec, zeros, None, mode='frozen',
                             collect_bake=True)
    return bake


def log_luminance_fn(scene, opts, rec, bake=None):
    """f(offset) = log(luminance(contrib)) of the frozen replay.

    Returns a scalar-output function of a [2*max_depth] offset vector
    (per-lane; vmap for batches). Mirrors RegisterPathFuncBidir's output
    (path.cpp:3898-3899: logLumValue = log(Luminance(contrib))).

    bake: optional frozen-path data (see replay_path) — the gather-free
    hot path; without it the replay gathers from scene tables."""

    def f(offset):
        _, res = replay_path(scene, opts, rec, offset, None, mode='frozen',
                             bake=bake)
        return jnp.log(jnp.maximum(vm.luminance(res['contrib']), 1e-30))

    return f


def path_grad(scene, opts, rec, max_dim=None, bake=None):
    """Gradient of log-luminance wrt the PSS (EmitGrad2 replacement).

    rec is a batch of subpath-tagged records. Returns [..., 2*D] grads with
    the reference's non-finite-to-zero guard (mutation_mala.h:108-110).
    bake: optional frozen-path data batch (gather-free grad program)."""
    D = rec.max_depth
    max_dim = 2 * D if max_dim is None else max_dim

    def per_lane(r, b):
        g = jax.grad(log_luminance_fn(scene, opts, r, bake=b))(
            jnp.zeros(max_dim))
        return g

    g = _vmap_lanes(per_lane, rec, bake)
    finite = jnp.all(jnp.isfinite(g), -1, keepdims=True)
    return jnp.where(finite, g, 0.0)


def path_grad_hessian(scene, opts, rec, max_dim=None, bake=None):
    """Gradient + dense Hessian (EmitGradHessian / forward-over-reverse
    replacement, chad.cpp:333-544). Returns ([...,2D], [...,2D,2D])."""
    D = rec.max_depth
    max_dim = 2 * D if max_dim is None else max_dim

    def per_lane(r, b):
        f = log_luminance_fn(scene, opts, r, bake=b)
        g = jax.grad(f)
        return g(jnp.zeros(max_dim)), jax.jacfwd(g)(jnp.zeros(max_dim))

    g, h = _vmap_lanes(per_lane, rec, bake)
    finite = (jnp.all(jnp.isfinite(g), -1)
              & jnp.all(jnp.isfinite(h), (-1, -2)))[..., None]
    g = jnp.where(finite, g, 0.0)
    h = jnp.where(finite[..., None], h, 0.0)
    return g, h


def _vmap_lanes(fn, rec, bake=None):
    """vmap fn(rec_lane, bake_lane) over all leading batch dims."""
    nbatch = rec.time.ndim
    f = fn
    for _ in range(nbatch):
        f = jax.vmap(f)
    if bake is None:
        return f(rec, None)
    return f(rec, bake)
