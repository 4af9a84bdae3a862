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
                             tri_normals_at_time)
from ..scene.camera import sample_primary
from .records import apply_pss_offset
from . import trace as tr

MIS = vm.mis
INF = jnp.inf


def _frozen_env_sample_direction(scene, lprim, rnd, time):
    """SampleDirection with the pixel frozen to lprim (the AD replay variant,
    envlight.cpp:289-319): CDF inversion uses the stored cdf entries of the
    frozen (col,row); only the within-pixel offsets differentiate."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    lp = jnp.maximum(lprim, 0)
    row = lp // w
    col = lp % w
    cdf_row0 = scene.env_cdf_rows[row]
    cdf_row1 = scene.env_cdf_rows[row + 1]
    cdf_col0 = scene.env_cdf_cols[row, col]
    cdf_col1 = scene.env_cdf_cols[row, col + 1]
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
    v00 = light_ops._env_rep_at(scene, col, row)
    v10 = light_ops._env_rep_at(scene, col + 1, row)
    v01 = light_ops._env_rep_at(scene, col, row + 1)
    v11 = light_ops._env_rep_at(scene, col + 1, row + 1)
    value1 = v00 * dx2 * dy2 + v10 * dx1 * dy2
    value2 = v01 * dx2 * dy1 + v11 * dx1 * dy1
    value = value1 + value2
    rw0 = scene.env_row_weights[jnp.clip(row, 0, h - 1)]
    rw1 = scene.env_row_weights[jnp.clip(row + 1, 0, h - 1)]
    pdf = ((vm.luminance(value1) * rw0 + vm.luminance(value2) * rw1)
           * scene.env_normalization
           / jnp.maximum(jnp.abs(sin_theta), 1e-7))
    return d_world, value, pdf


def _replay_emit(scene, rec, time, frozen):
    """Light::Emit replay with the frozen light instance."""
    light_id = jnp.maximum(rec.lgt_light_id, 0)
    ltype = scene.light_type[light_id]
    out = light_ops.emit(scene, light_id, rec.lgt_lprim,
                         rec.lgt_rnd_pos, rec.lgt_rnd_dir, time)
    if frozen:
        # env branch with frozen pixel
        d_s, em_e, dpdf_e = _frozen_env_sample_direction(
            scene, rec.lgt_lprim, rec.lgt_rnd_dir, time)
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


def _replay_nee(scene, rec, c_idx, state, time, frozen, occluded_fn, opts):
    """DirectLighting replay at camera vertex c with the frozen light inst."""
    batch = rec.time.shape
    take = lambda a: jnp.take_along_axis(a, c_idx[..., None], -1)[..., 0]
    take2 = lambda a: jnp.take_along_axis(
        a, c_idx[..., None, None].repeat(2, -1), -2)[..., 0, :]
    light_id = jnp.maximum(take(rec.cam_nee_light), 0)
    lprim = take(rec.cam_nee_lprim)
    nee_rnd = take2(rec.cam_nee_rnd)
    light_pick_prob = light_ops.pick_light_prob(scene, light_id)

    if frozen:
        # env NEE with frozen pixel: build 'out' dict manually
        out = light_ops.sample_direct(scene, light_id, lprim, nee_rnd,
                                      state.pos, time)
        is_env = scene.light_type[light_id] == light_ops.LIGHT_ENV
        d_w, value, pdf = _frozen_env_sample_direction(scene, lprim, nee_rnd, time)
        safe_pdf = vm.clamp_abs(pdf)
        position_pdf = vm.INV_PI / jnp.square(scene.bsphere_radius)
        out = dict(out)
        out['dir_to_light'] = jnp.where(is_env[..., None], d_w,
                                        out['dir_to_light'])
        out['contrib'] = jnp.where(is_env[..., None], value / safe_pdf[..., None],
                                   out['contrib'])
        out['direct_pdf'] = jnp.where(is_env, pdf, out['direct_pdf'])
        out['emission_pdf'] = jnp.where(is_env, pdf * position_pdf,
                                        out['emission_pdf'])
        out['dist'] = jnp.where(is_env, jnp.inf, out['dist'])
        valid = out['valid'] | is_env
        occ_ok = jnp.ones(batch, bool)
    else:
        out = light_ops.sample_direct(scene, light_id, lprim, nee_rnd,
                                      state.pos, time)
        valid = out['valid']
        occ = occluded_fn(state.pos, out['dir_to_light'], time,
                          jnp.full(batch, vm.ISECT_EPS),
                          jnp.where(jnp.isinf(out['dist']),
                                    jnp.full(batch, INF),
                                    (1.0 - vm.SHADOW_EPS) * out['dist']))
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


def replay_path(scene, opts, rec, offset, noise, mode='perturb'):
    """Replay the record's (s,t) subpath with PSS offsets applied.

    rec: PathRecord tagged by to_subpath (cam_depth/lgt_depth set).
    offset: [..., 2*max_depth] PSS offset (already in offset space).
    noise: dict with 'time', 'cam_disc' [...,D], 'lgt_disc' [...,D] gaussian
      jitters (ignored in frozen mode).
    Returns (new_rec, dict(contrib, ls_score, ss_score, screen_pos,
    mis_weight, valid)).
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

    def surf_from_frozen(tri, org, d):
        tp = tri_vertices_at_time(scene, tri, time)
        tn = tri_normals_at_time(scene, tri, time)
        tst = scene.tri_st[tri]
        pos, sn, gn, st, t_hit = intersect_frozen_triangle(tp, tn, tst, org, d)
        return pos, sn, gn, st, jnp.ones(batch, bool)

    def mat_at(tri, st):
        st_tex = jax.lax.stop_gradient(st) if frozen else st
        return bsdf_ops.gather_mat_params(scene, scene.tri_mat[tri], st_tex)

    ok = jnp.ones(batch, bool)
    out_contrib = jnp.zeros(batch + (3,))
    out_ls = jnp.zeros(batch)
    out_ss = jnp.zeros(batch)
    out_mis = jnp.zeros(batch)
    out_screen = rec.screen_pos
    out_valid = jnp.zeros(batch, bool)

    # ---------------- light subpath ----------------
    has_lgt = t >= 2
    light_pick_prob = light_ops.pick_light_prob(
        scene, jnp.maximum(rec.lgt_light_id, 0))
    em = _replay_emit(scene, rec, time, frozen)
    emission_pdf = em['emission_pdf'] * light_pick_prob
    direct_pdf = em['direct_pdf'] * light_pick_prob
    throughput = em['emission'] / jnp.maximum(light_pick_prob, 1e-12)[..., None]
    delta_light = light_ops.is_delta(scene, jnp.maximum(rec.lgt_light_id, 0))
    finite_light = light_ops.is_finite(scene, jnp.maximum(rec.lgt_light_id, 0))
    safe_epdf = vm.clamp_abs(emission_pdf)
    acc_prev = MIS(direct_pdf / safe_epdf)
    acc_this = jnp.where(delta_light, 0.0, MIS(em['cos_at_light'] / safe_epdf))
    org, d = em['org'], em['dir']
    ss_jac = jnp.ones(batch)
    # lgt_ok stays True for lanes without a light subpath (t < 2): failures
    # are only recorded on active steps
    lgt_ok = jnp.ones(batch, bool)
    last_lgt_state = None

    for l in range(D):
        active = has_lgt & (l < t - 1)
        if frozen:
            tri = jnp.maximum(rec.lgt_tri[..., l], 0)
            pos, sn, gn, st, hit = surf_from_frozen(tri, org, d)
        else:
            hit, tid, t_hit, u_hit, v_hit = intersect_fn(
                org, d, time, jnp.full(batch, vm.ISECT_EPS),
                jnp.full(batch, INF))
            tri = tid
            pos, sn, gn, st = compute_hit_geometry(scene, tid, org, d, t_hit,
                                                   u_hit, v_hit, time)
            rec = dataclasses.replace(
                rec, lgt_tri=rec.lgt_tri.at[..., l].set(
                    jnp.where(active & hit, tid, rec.lgt_tri[..., l])))
        lgt_ok = lgt_ok & jnp.where(active, hit, True)
        mat = mat_at(tri, st)
        state = tr.SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                             mat=mat, tri=tri, acc_prev=acc_prev,
                             acc_this=acc_this, throughput=throughput,
                             ss_jacobian=ss_jac, last_bsdf_pdf=jnp.zeros(batch))
        include_dist = finite_light if l == 0 else jnp.ones(batch, bool)
        state = tr.convert_mis(state, org, d, include_dist)

        is_last = active & (l == t - 2)
        # terminal for s == 1: ConnectToCamera
        cc_screen, cc_contrib, cc_ls, cc_ss, cc_mis, cc_ok = tr.connect_to_camera(
            scene, opts, occluded_fn, time, state, spc,
            do_occlusion=not frozen)
        sel = is_last & (s == 1) & lgt_ok & cc_ok
        out_contrib = jnp.where(sel[..., None], cc_contrib, out_contrib)
        out_ls = jnp.where(sel, cc_ls, out_ls)
        out_ss = jnp.where(sel, cc_ss, out_ss)
        out_mis = jnp.where(sel, cc_mis, out_mis)
        out_screen = jnp.where(sel[..., None], cc_screen, out_screen)
        out_valid = out_valid | sel

        # save last light state for ConnectVertex
        if last_lgt_state is None:
            last_lgt_state = state
        else:
            w = is_last[..., None]
            last_lgt_state = tr.SurfState(
                pos=jnp.where(w, state.pos, last_lgt_state.pos),
                shading_n=jnp.where(w, state.shading_n, last_lgt_state.shading_n),
                geom_n=jnp.where(w, state.geom_n, last_lgt_state.geom_n),
                st=jnp.where(w, state.st, last_lgt_state.st),
                wi=jnp.where(w, state.wi, last_lgt_state.wi),
                mat=jax.tree.map(
                    lambda a, b: jnp.where(
                        is_last.reshape(is_last.shape + (1,) * (a.ndim - is_last.ndim)),
                        a, b), state.mat, last_lgt_state.mat),
                tri=jnp.where(is_last, state.tri, last_lgt_state.tri),
                acc_prev=jnp.where(is_last, state.acc_prev, last_lgt_state.acc_prev),
                acc_this=jnp.where(is_last, state.acc_this, last_lgt_state.acc_this),
                throughput=jnp.where(w, state.throughput, last_lgt_state.throughput),
                ss_jacobian=jnp.where(is_last, state.ss_jacobian,
                                      last_lgt_state.ss_jacobian),
                last_bsdf_pdf=last_lgt_state.last_bsdf_pdf)
        if l == 0:
            # overwrite the init copy so masks are correct when t-2 == 0
            pass

        # continue: BSDF sampling (perturb semantics) for non-terminal steps
        cont = active & ~is_last
        new_d, new_state, b_contrib, use_abs, b_ok, _, _ = tr.bsdf_sampling(
            scene, opts, state, rec.lgt_bsdf_rnd[..., l, :],
            rec.lgt_bsdf_disc[..., l], l, adjoint=True, perturb=True,
            use_abs_in=rec.lgt_use_abs[..., l])
        lgt_ok = lgt_ok & jnp.where(cont, b_ok, True)
        rr_w = rec.lgt_rr[..., l]
        throughput = jnp.where(cont[..., None],
                               new_state.throughput * rr_w[..., None],
                               throughput)
        acc_prev = jnp.where(cont, new_state.acc_prev, acc_prev)
        acc_this = jnp.where(cont, new_state.acc_this, acc_this)
        ss_jac = jnp.where(cont, new_state.ss_jacobian, ss_jac)
        org = jnp.where(cont[..., None], state.pos, org)
        d = jnp.where(cont[..., None], new_d, d)

    # fix the l==0 terminal copy: when t == 2, last state is the first state
    # (handled above because the initial copy IS step 0's state).

    # ---------------- camera subpath ----------------
    has_cam = s >= 2
    org2, d2, mn, mx = sample_primary(scene.camera, rec.screen_pos, time)
    _, cam_center_dir_v = tr.camera_center_dir(scene.camera, time)
    cpdf = tr.camera_pdf_w(scene, cam_center_dir_v, d2)
    acc_prev = MIS(spc / cpdf)
    acc_this = jnp.zeros(batch)
    throughput = jnp.ones(batch + (3,))
    ss_jac = jnp.ones(batch)
    cam_ok = jnp.ones(batch, bool)
    org, d = org2, d2
    min_t, max_t = mn, mx

    has_env = scene.env_light_id >= 0
    for c in range(D):
        active = has_cam & (c < s - 1)
        is_last = active & (c == s - 2)
        if frozen:
            # frozen structure: the terminal env-vs-surface choice is frozen
            env_case = is_last & (t == 0) & (rec.env_lprim >= 0)
            tri = jnp.maximum(rec.cam_tri[..., c], 0)
            pos, sn, gn, st, hit = surf_from_frozen(tri, org, d)
            hit = hit & ~env_case
        else:
            hit, tid, t_hit, u_hit, v_hit = intersect_fn(org, d, time, min_t, max_t)
            tri = tid
            pos, sn, gn, st = compute_hit_geometry(scene, tid, org, d, t_hit,
                                                   u_hit, v_hit, time)
            rec = dataclasses.replace(
                rec, cam_tri=rec.cam_tri.at[..., c].set(
                    jnp.where(active & hit, tid, rec.cam_tri[..., c])))
        mat = mat_at(tri, st)
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
        # non-terminal steps must hit
        cam_ok = cam_ok & jnp.where(active & ~is_last, hit, True)

        # --- terminal t == 0: HandleHitLight ---
        # perturb: the re-traced ray decides surface-vs-env (reference
        # PerturbPathBidir re-runs GetHitLight); frozen: structure is frozen
        if not frozen:
            env_case = is_last & (t == 0) & (~hit) & has_env
        hit_light_id = jnp.where(hit, scene.tri_light[tri], -1)
        is_hit_light = is_last & (t == 0) & (
            (hit & (hit_light_id >= 0)) | env_case)
        h_contrib, h_ls, h_ss, h_mis, h_ok = tr.handle_hit_light(
            scene, c, hit & ~env_case, hit_light_id, tri, rec.env_lprim,
            org, d, time, state, rec.screen_pos)
        # c>0 check is per-lane here: mis=1 when c==0 handled by trace helper
        # only for static c; redo per-lane:
        sel = is_hit_light & cam_ok & lgt_ok & h_ok
        out_contrib = jnp.where(sel[..., None], h_contrib, out_contrib)
        out_ls = jnp.where(sel, h_ls, out_ls)
        out_ss = jnp.where(sel, h_ss, out_ss)
        out_mis = jnp.where(sel, h_mis, out_mis)
        out_valid = out_valid | sel

        # --- terminal t == 1: NEE ---
        c_idx = jnp.full(batch, c, jnp.int32)
        n_contrib, n_ls, n_ss, n_mis, n_ok = _replay_nee(
            scene, rec, c_idx, state, time, frozen, occluded_fn, opts)
        sel = is_last & (t == 1) & hit & cam_ok & n_ok
        out_contrib = jnp.where(sel[..., None], n_contrib, out_contrib)
        out_ls = jnp.where(sel, n_ls, out_ls)
        out_ss = jnp.where(sel, n_ss, out_ss)
        out_mis = jnp.where(sel, n_mis, out_mis)
        out_valid = out_valid | sel

        # --- terminal t >= 2: ConnectVertex with last light vertex ---
        v_contrib, v_ls, v_ss, v_mis, v_ok = tr.connect_vertex(
            scene, opts, occluded_fn, time, last_lgt_state, state,
            do_occlusion=not frozen)
        sel = is_last & (t >= 2) & hit & cam_ok & lgt_ok & v_ok
        out_contrib = jnp.where(sel[..., None], v_contrib, out_contrib)
        out_ls = jnp.where(sel, v_ls, out_ls)
        out_ss = jnp.where(sel, v_ss, out_ss)
        out_mis = jnp.where(sel, v_mis, out_mis)
        out_valid = out_valid | sel

        # continue
        cont = active & ~is_last
        new_d, new_state, b_contrib, use_abs, b_ok, _, _ = tr.bsdf_sampling(
            scene, opts, state, rec.cam_bsdf_rnd[..., c, :],
            rec.cam_bsdf_disc[..., c], c, adjoint=False, perturb=True,
            use_abs_in=rec.cam_use_abs[..., c])
        cam_ok = cam_ok & jnp.where(cont, b_ok, True)
        rr_w = rec.cam_rr[..., c]
        throughput = jnp.where(cont[..., None],
                               new_state.throughput * rr_w[..., None],
                               throughput)
        acc_prev = jnp.where(cont, new_state.acc_prev, acc_prev)
        acc_this = jnp.where(cont, new_state.acc_this, acc_this)
        ss_jac = jnp.where(cont, new_state.ss_jacobian, ss_jac)
        org = jnp.where(cont[..., None], state.pos, org)
        d = jnp.where(cont[..., None], new_d, d)
        min_t = jnp.full(batch, vm.ISECT_EPS)
        max_t = jnp.full(batch, INF)

    result = dict(contrib=out_contrib, ls_score=out_ls, ss_score=out_ss,
                  mis_weight=out_mis, screen_pos=out_screen,
                  valid=out_valid & jnp.where(has_cam, cam_ok, True)
                  & jnp.where(has_lgt, lgt_ok, True))
    return rec, result


# ---------------------------------------------------------------------------
# derivatives of the frozen replay (the "compiled derivative kernel")
# ---------------------------------------------------------------------------

def log_luminance_fn(scene, opts, rec):
    """f(offset) = log(luminance(contrib)) of the frozen replay.

    Returns a scalar-output function of a [2*max_depth] offset vector
    (per-lane; vmap for batches). Mirrors RegisterPathFuncBidir's output
    (path.cpp:3898-3899: logLumValue = log(Luminance(contrib)))."""

    def f(offset):
        _, res = replay_path(scene, opts, rec, offset, None, mode='frozen')
        return jnp.log(jnp.maximum(vm.luminance(res['contrib']), 1e-30))

    return f


def path_grad(scene, opts, rec, max_dim=None):
    """Gradient of log-luminance wrt the PSS (EmitGrad2 replacement).

    rec is a batch of subpath-tagged records. Returns [..., 2*D] grads with
    the reference's non-finite-to-zero guard (mutation_mala.h:108-110)."""
    D = rec.max_depth
    max_dim = 2 * D if max_dim is None else max_dim

    def per_lane(r):
        g = jax.grad(log_luminance_fn(scene, opts, r))(jnp.zeros(max_dim))
        return g

    g = _vmap_lanes(per_lane, rec)
    finite = jnp.all(jnp.isfinite(g), -1, keepdims=True)
    return jnp.where(finite, g, 0.0)


def path_grad_hessian(scene, opts, rec, max_dim=None):
    """Gradient + dense Hessian (EmitGradHessian / forward-over-reverse
    replacement, chad.cpp:333-544). Returns ([...,2D], [...,2D,2D])."""
    D = rec.max_depth
    max_dim = 2 * D if max_dim is None else max_dim

    def per_lane(r):
        f = log_luminance_fn(scene, opts, r)
        g = jax.grad(f)
        return g(jnp.zeros(max_dim)), jax.jacfwd(g)(jnp.zeros(max_dim))

    g, h = _vmap_lanes(per_lane, rec)
    finite = (jnp.all(jnp.isfinite(g), -1)
              & jnp.all(jnp.isfinite(h), (-1, -2)))[..., None]
    g = jnp.where(finite, g, 0.0)
    h = jnp.where(finite[..., None], h, 0.0)
    return g, h


def _vmap_lanes(fn, rec):
    """vmap fn over all leading batch dims of the record."""
    nbatch = rec.time.ndim
    f = fn
    for _ in range(nbatch):
        f = jax.vmap(f)
    return f(rec)
