"""Wavefront bidirectional path generation.

TPU-native re-design of GeneratePathBidir / GeneratePath (reference
src/path.cpp:406-1449): a whole wavefront of paths advances together through
unrolled depth steps with per-lane alive masks; random decisions come from a
pre-drawn uniform "tape" so the exact same function works for bootstrap
sampling, plain-MC rendering and MCMC large steps.

Deviation from the reference (documented): the reference computes a
`lensScore` per contribution for its (unused) lens-perturbation machinery —
no consumer outside path.cpp exists (grep: mutations use only
lsScore/ssScore), so it is pinned to 0 here.

MIS bookkeeping follows the recursive accMISWPrev/accMISWThis scheme
(path.cpp:529-540 BidirPathState, 620-631 ConvertMIS, 893-897 update).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm
from ..ops import bsdf as bsdf_ops
from ..ops import lights as light_ops
from ..ops.intersect import (compute_hit_geometry, make_intersect_fns,
                             hit_attrs_full)
from ..scene.camera import sample_primary, project_point, camera_center_dir
from .records import PathRecord, Contribs, empty_record, empty_contribs

MIS = vm.mis
INF = jnp.inf


# ---------------------------------------------------------------------------
# random tape
# ---------------------------------------------------------------------------

class Tape:
    """Index map into a [..., tape_size(D)] uniform tape."""

    def __init__(self, u, D):
        self.u = u
        self.D = D

    @staticmethod
    def size(D):
        return 9 + 12 * D

    def _get(self, i):
        return self.u[..., i]

    def _get2(self, i):
        return self.u[..., i:i + 2]

    @property
    def time(self):
        return self._get(0)

    @property
    def light_pick(self):
        return self._get(1)

    @property
    def light_disc(self):
        return self._get(2)

    @property
    def light_pos(self):
        return self._get2(3)

    @property
    def light_dir(self):
        return self._get2(5)

    @property
    def screen(self):
        return self._get2(7)

    def lgt_vertex(self, i):
        b = 9 + 4 * i
        return dict(disc=self._get(b), bsdf=self._get2(b + 1),
                    rr=self._get(b + 3))

    def cam_vertex(self, i):
        b = 9 + 4 * self.D + 8 * i
        return dict(disc=self._get(b), nee_pick=self._get(b + 1),
                    nee_disc=self._get(b + 2), nee_rnd=self._get2(b + 3),
                    bsdf=self._get2(b + 5), rr=self._get(b + 7))


def draw_tape(key, batch_shape, D):
    return Tape(jax.random.uniform(key, batch_shape + (Tape.size(D),)), D)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def shading_normal_correction(wi, shading_n, geom_n, wo, adjoint):
    """Light-leak guard + adjoint shading-normal factor
    (reference path.cpp:34-54)."""
    cos_wi = vm.dot(shading_n, wi)
    cos_wo = vm.dot(shading_n, wo)
    wi_geo = vm.dot(geom_n, wi)
    wo_geo = vm.dot(geom_n, wo)
    leak = (wi_geo * cos_wi <= 0.0) | (wo_geo * cos_wo <= 0.0)
    if adjoint:
        safe = jnp.where((wi_geo * cos_wo) == 0.0, 1.0, wi_geo * cos_wo)
        factor = jnp.abs((wo_geo * cos_wi) / safe)
    else:
        factor = jnp.ones_like(cos_wi)
    return jnp.where(leak, 0.0, factor)


def screen_pixel_count(scene):
    return float(scene.width * scene.height)


def camera_pdf_w(scene, cam_dir_center, d):
    """imageToSolidAngleFactor for a primary direction d
    (EmitFromCamera, path.cpp:554-574)."""
    cos_at_cam = vm.dot(cam_dir_center, d)
    dist = scene.camera.dist / cos_at_cam
    return jnp.square(dist) / cos_at_cam


def russian_roulette_prob(depth, contrib):
    """rrProb = depth >= 3 ? min(maxCoeff(contrib), 0.95) : 1
    (path.cpp:388-404). depth may be a traced scalar (scan loop index)."""
    rr = jnp.minimum(jnp.max(contrib, -1), 0.95)
    return jnp.where(jnp.asarray(depth) >= 3, rr,
                     jnp.ones(contrib.shape[:-1]))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SurfState:
    """Per-wavefront surface interaction (BidirPathState, path.cpp:529-540)."""
    pos: jnp.ndarray
    shading_n: jnp.ndarray
    geom_n: jnp.ndarray
    st: jnp.ndarray
    wi: jnp.ndarray
    mat: object            # MatParams
    tri: jnp.ndarray
    acc_prev: jnp.ndarray
    acc_this: jnp.ndarray
    throughput: jnp.ndarray
    ss_jacobian: jnp.ndarray
    last_bsdf_pdf: jnp.ndarray


ACC_MAX = 1e30  # keep the power-2 MIS accumulators finite in f32; beyond
                # this the MIS weight underflows to 0 anyway


def convert_mis(state, ray_org, ray_dir, include_dist):
    """ConvertMIS (path.cpp:620-631)."""
    dist_sq = vm.distance_squared(ray_org, state.pos)
    acc_prev = jnp.where(include_dist, state.acc_prev * MIS(dist_sq),
                         state.acc_prev)
    inv_cos = 1.0 / jnp.maximum(MIS(jnp.abs(vm.dot(ray_dir, state.shading_n))), 1e-12)
    return dataclasses.replace(
        state, acc_prev=jnp.minimum(acc_prev * inv_cos, ACC_MAX),
        acc_this=jnp.minimum(state.acc_this * inv_cos, ACC_MAX))


def bsdf_sampling(scene, opts, state, bsdf_rnd, bsdf_disc, depth, adjoint,
                  perturb=False, use_abs_in=None):
    """BSDFSampling<adjoint, perturb> (path.cpp:747-900).

    Returns (new_dir, new_state, contrib, use_abs, valid, sample_info)
    where sample_info carries (bsdf_rnd_canonical,) — in absolute-param
    mode the recorded random numbers become the spherical coords of the
    sampled direction.
    """
    rough = bsdf_ops.roughness(state.mat)
    use_abs = rough > opts.roughness_threshold
    if perturb:
        assert use_abs_in is not None
        use_abs = use_abs_in

    # path A: pdf-proportional sampling
    wo_s, contrib_s, cos_wo_s, pdf_s, rev_pdf_s, valid_s = bsdf_ops.sample(
        state.mat, state.wi, state.shading_n, bsdf_rnd, bsdf_disc, adjoint)
    sph_s, jac_sph = vm.to_spherical_coord(wo_s)
    # absolute-param bookkeeping (path.cpp:790-798)
    rnd_abs = jnp.where(use_abs[..., None], sph_s, bsdf_rnd)
    lc_jac_s = jnp.where(use_abs, 1.0 / jnp.maximum(jac_sph, 1e-12), pdf_s)
    ss_fac_s = jnp.where(use_abs, jac_sph * pdf_s, 1.0)

    if perturb:
        # path B: absolute spherical-coordinate replay (path.cpp:799-828)
        wo_a, jac_a = vm.sample_sphere(bsdf_rnd)
        c_a, cw_a, p_a, rp_a = bsdf_ops.evaluate(
            state.mat, state.wi, state.shading_n, wo_a, adjoint)
        valid_a = (jnp.max(jnp.abs(c_a), -1) > 0.0) & (p_a > 0.0)
        c_a = c_a / jnp.maximum(p_a, 1e-12)[..., None]
        wo = jnp.where(use_abs[..., None], wo_a, wo_s)
        contrib = jnp.where(use_abs[..., None], c_a, contrib_s)
        cos_wo = jnp.where(use_abs, cw_a, cos_wo_s)
        pdf = jnp.where(use_abs, p_a, pdf_s)
        rev_pdf = jnp.where(use_abs, rp_a, rev_pdf_s)
        valid = jnp.where(use_abs, valid_a, valid_s)
        lc_jac = jnp.where(use_abs, 1.0 / jnp.maximum(jac_a, 1e-12), pdf_s)
        ss_fac = jnp.where(use_abs, jac_a * p_a, 1.0)
        rnd_canonical = bsdf_rnd
    else:
        wo, contrib, cos_wo, pdf, rev_pdf, valid = (
            wo_s, contrib_s, cos_wo_s, pdf_s, rev_pdf_s, valid_s)
        lc_jac, ss_fac = lc_jac_s, ss_fac_s
        rnd_canonical = rnd_abs

    factor = shading_normal_correction(state.wi, state.shading_n,
                                       state.geom_n, wo, adjoint)
    valid &= factor > 0.0
    contrib = contrib * factor[..., None]

    new_state = dataclasses.replace(
        state,
        acc_this=jnp.minimum(MIS(cos_wo / vm.clamp_abs(pdf))
                             * (state.acc_this * MIS(rev_pdf) + state.acc_prev),
                             ACC_MAX),
        acc_prev=jnp.minimum(MIS(1.0 / vm.clamp_abs(pdf)), ACC_MAX),
        throughput=state.throughput * contrib,
        ss_jacobian=state.ss_jacobian * ss_fac,
        last_bsdf_pdf=pdf)
    return wo, new_state, contrib, use_abs, valid, rnd_canonical, lc_jac


# ---------------------------------------------------------------------------
# contribution emitters
# ---------------------------------------------------------------------------

def handle_hit_light(scene, first_vertex, hit_surface, hit_light_id,
                     hit_lprim, env_lprim, ray_org, ray_dir, time, state,
                     screen_pos, bidir_mis=True, last_bsdf_pdf=None,
                     pack=None):
    """HandleHitLight (path.cpp:902-967).

    first_vertex: bool mask — directly visible light (camDepth == 0) gets
    MIS weight 1 (path.cpp:928). Returns (contrib, ls, ss, mis_w, valid).

    bidir_mis=False: the uni-directional power-2 balance against the last
    BSDF sampling pdf (path.cpp:937-943) — used by GenerateSubpath when
    <dpt> bidirectional=false; requires last_bsdf_pdf.

    pack: optional dict(emission, inv_area, pick_prob, env=bake_env_dir
    pack) of pre-gathered per-lane constants (replay hot path)."""
    is_env = ~hit_surface
    # area emission (arealight.cpp:60-78)
    em_a, dpdf_a, epdf_a = light_ops.area_emission(
        scene, jnp.maximum(hit_light_id, 0), hit_lprim, ray_dir,
        state.shading_n, time, pack=pack)
    # env emission
    _, em_e, dpdf_e, epdf_e = light_ops.env_emission(
        scene, ray_dir, time,
        pack=None if pack is None else pack.get('env'))
    emission = jnp.where(is_env[..., None], em_e, em_a)
    direct_pdf = jnp.where(is_env, dpdf_e, dpdf_a)
    emission_pdf = jnp.where(is_env, epdf_e, epdf_a)
    valid = jnp.sum(emission, -1) > 0.0

    contrib = state.throughput * emission
    if pack is not None:
        light_pick_prob = jnp.where(
            is_env,
            light_ops.pick_light_prob(
                scene, jnp.int32(max(scene.env_light_id, 0))),
            pack['pick_prob'])
    else:
        light_pick_prob = light_ops.pick_light_prob(
            scene, jnp.where(is_env,
                             jnp.int32(max(scene.env_light_id, 0)),
                             jnp.maximum(hit_light_id, 0)))
    direct_pdf = direct_pdf * light_pick_prob
    emission_pdf = emission_pdf * light_pick_prob
    if bidir_mis:
        w_camera = (MIS(direct_pdf) * state.acc_prev
                    + MIS(emission_pdf) * state.acc_this)
        mis_w = 1.0 / (1.0 + w_camera)
    else:
        # power-2 balance vs the BSDF sampling pdf of the incoming ray
        # (path.cpp:937-943); area->solid-angle conversion for surface hits
        assert last_bsdf_pdf is not None
        dist_sq = vm.distance_squared(ray_org, state.pos)
        cos_theta = -vm.dot(ray_dir, state.shading_n)
        dpdf_sa = jnp.where(hit_surface,
                            direct_pdf * dist_sq / vm.clamp_abs(cos_theta),
                            direct_pdf)
        mis_w = 1.0 / (1.0 + jnp.square(dpdf_sa
                                        / vm.clamp_abs(last_bsdf_pdf)))
    mis_w = jnp.where(first_vertex, 1.0, mis_w)
    contrib = contrib * mis_w[..., None]
    score = vm.luminance(contrib)
    valid &= score > 0.0
    return contrib, score, score * state.ss_jacobian, mis_w, valid


def direct_lighting(scene, opts, occluded_fn, state, time, light_id, lprim,
                    nee_rnd, light_pick_prob, do_occlusion=True,
                    bidir_mis=True):
    """DirectLighting NEE with bidir MIS (path.cpp:969-1089); with
    bidir_mis=False the uni power-2 balance vs the BSDF pdf
    (path.cpp:1068-1070).

    Returns (contrib, score, ss_score, mis_w, valid, lprim_id) — lprim_id is
    the light primitive actually used (env lights pick their pixel inside
    SampleDirect; the record freezes that pixel for the AD replay, matching
    EnvLight::Serialize, envlight.cpp:83-119)."""
    out = light_ops.sample_direct(scene, light_id, lprim, nee_rnd,
                                  state.pos, time)
    valid = out['valid']
    if do_occlusion:
        occ = occluded_fn(state.pos, out['dir_to_light'], time,
                          jnp.full_like(time, vm.ISECT_EPS),
                          jnp.where(jnp.isinf(out['dist']), jnp.full_like(time, INF),
                                    (1.0 - vm.SHADOW_EPS) * out['dist']))
        valid &= ~occ
    b_contrib, cos_to_light, bsdf_pdf, bsdf_rev_pdf = bsdf_ops.evaluate(
        state.mat, state.wi, state.shading_n, out['dir_to_light'])
    valid &= jnp.max(jnp.abs(b_contrib), -1) > 0.0
    factor = shading_normal_correction(state.wi, state.shading_n, state.geom_n,
                                       out['dir_to_light'], False)
    valid &= factor > 0.0
    b_contrib = b_contrib * factor[..., None]

    contrib = (state.throughput * b_contrib * out['contrib']
               / jnp.maximum(light_pick_prob, 1e-12)[..., None])
    delta = light_ops.is_delta(scene, light_id)
    safe_dpdf = vm.clamp_abs(out['direct_pdf'])
    if bidir_mis:
        w_light = jnp.where(delta, 0.0,
                            MIS(bsdf_pdf / (light_pick_prob * safe_dpdf)))
        safe_cal = vm.clamp_abs(out['cos_at_light'])
        w_camera = (MIS(out['emission_pdf'] * cos_to_light
                        / (safe_dpdf * safe_cal))
                    * (state.acc_prev + state.acc_this * MIS(bsdf_rev_pdf)))
        mis_w = 1.0 / (w_light + 1.0 + w_camera)
    else:
        mis_w = jnp.where(
            delta, 1.0,
            1.0 / (1.0 + jnp.square(bsdf_pdf / vm.clamp_abs(
                out['direct_pdf'] * light_pick_prob))))
    contrib = contrib * mis_w[..., None]
    score = vm.luminance(contrib)
    valid &= score > 0.0
    return contrib, score, score * state.ss_jacobian, mis_w, valid, out['lprim_id']


def connect_vertex(scene, opts, occluded_fn, time, lgt_state, cam_state,
                   do_occlusion=True, mask=None, occ_in=None):
    """ConnectVertex (path.cpp:1091-1235). Returns (contrib, ls, ss, mis, valid).

    mask: optional [..] bool — lanes outside it shoot dead occlusion rays
    (max_t=0), which the chunk-walk kernel skips for free.

    occ_in: optional precomputed [..] occlusion result for this terminal's
    ray — the caller batched several terminals' rays into ONE occluded_fn
    dispatch (see replay.replay_path); no ray is shot here."""
    to_light = lgt_state.pos - cam_state.pos
    dist_sq = jnp.maximum(vm.length_squared(to_light), 1e-12)
    dist = jnp.sqrt(dist_sq)
    dir_tl = to_light / dist[..., None]
    valid = jnp.ones(dist.shape, bool)
    if occ_in is not None:
        valid &= ~occ_in
    elif do_occlusion:
        occ_max = (1.0 - vm.SHADOW_EPS) * dist
        if mask is not None:
            occ_max = jnp.where(mask, occ_max, 0.0)
        occ = occluded_fn(cam_state.pos, dir_tl, time,
                          jnp.full_like(time, vm.ISECT_EPS), occ_max)
        valid &= ~occ

    cam_f, cos_cam, cam_pdf, cam_rev_pdf = bsdf_ops.evaluate(
        cam_state.mat, cam_state.wi, cam_state.shading_n, dir_tl)
    valid &= jnp.max(jnp.abs(cam_f), -1) > 0.0
    cam_factor = shading_normal_correction(
        cam_state.wi, cam_state.shading_n, cam_state.geom_n, dir_tl, False)
    valid &= cam_factor > 0.0
    cam_f = cam_f * cam_factor[..., None]

    lgt_f, cos_lgt, lgt_pdf, lgt_rev_pdf = bsdf_ops.evaluate(
        lgt_state.mat, lgt_state.wi, lgt_state.shading_n, -dir_tl, adjoint=True)
    valid &= jnp.max(jnp.abs(lgt_f), -1) > 0.0
    lgt_factor = shading_normal_correction(
        lgt_state.wi, lgt_state.shading_n, lgt_state.geom_n, -dir_tl, True)
    valid &= lgt_factor > 0.0
    lgt_f = lgt_f * lgt_factor[..., None]

    geom = 1.0 / dist_sq
    cam_dir_pdf_a = cam_pdf * cos_lgt * geom
    lgt_dir_pdf_a = lgt_pdf * cos_cam * geom
    w_light = MIS(cam_dir_pdf_a) * (lgt_state.acc_prev
                                    + lgt_state.acc_this * MIS(lgt_rev_pdf))
    w_camera = MIS(lgt_dir_pdf_a) * (cam_state.acc_prev
                                     + cam_state.acc_this * MIS(cam_rev_pdf))
    mis_w = 1.0 / (w_light + 1.0 + w_camera)
    contrib = (lgt_state.throughput * cam_state.throughput * cam_f * lgt_f
               * geom[..., None] * mis_w[..., None])
    score = vm.luminance(contrib)
    valid &= score > 0.0
    ss = score * lgt_state.ss_jacobian * cam_state.ss_jacobian
    return contrib, score, ss, mis_w, valid


def connect_to_camera(scene, opts, occluded_fn, time, state, screen_pc,
                      do_occlusion=True, mask=None, occ_in=None):
    """ConnectToCamera (path.cpp:633-745).
    Returns (screen_pos, contrib, ls, ss, mis, valid).

    mask: optional [..] bool — lanes outside it shoot dead occlusion rays.
    occ_in: optional precomputed occlusion (see connect_vertex)."""
    cam_org, cam_dir = camera_center_dir(scene.camera, time)
    to_cam = cam_org - state.pos
    valid = -vm.dot(cam_dir, to_cam) > 0.0
    screen_pos, proj_ok = project_point(scene.camera, state.pos, time)
    valid &= proj_ok
    dist_sq = jnp.maximum(vm.length_squared(to_cam), 1e-12)
    dist = jnp.sqrt(dist_sq)
    dir_tc = to_cam / dist[..., None]
    if occ_in is not None:
        valid &= ~occ_in
    elif do_occlusion:
        occ_max = (1.0 - vm.SHADOW_EPS) * dist
        if mask is not None:
            occ_max = jnp.where(mask, occ_max, 0.0)
        occ = occluded_fn(state.pos, dir_tc, time,
                          jnp.full_like(time, vm.ISECT_EPS), occ_max)
        valid &= ~occ
    b_contrib, cos_to_cam, bsdf_pdf, bsdf_rev_pdf = bsdf_ops.evaluate(
        state.mat, state.wi, state.shading_n, dir_tc, adjoint=True)
    valid &= jnp.max(jnp.abs(b_contrib), -1) > 0.0
    factor = shading_normal_correction(state.wi, state.shading_n, state.geom_n,
                                       dir_tc, True)
    valid &= factor > 0.0
    b_contrib = b_contrib * factor[..., None]

    cos_at_cam = -vm.dot(cam_dir, dir_tc)
    ipcd = scene.camera.dist / cos_at_cam
    image_to_solid_angle = jnp.square(ipcd) / cos_at_cam
    image_to_surface = image_to_solid_angle * jnp.abs(cos_to_cam) / dist_sq
    cam_pdf = image_to_surface
    w_light = MIS(cam_pdf / screen_pc) * (state.acc_prev
                                          + state.acc_this * MIS(bsdf_rev_pdf))
    mis_w = 1.0 / (w_light + 1.0)
    # surfaceToImageFactor = cosToCamera / imageToSURFACE (path.cpp:728-729)
    # — dividing by imageToSolidAngle instead overcounts light tracing by
    # distSq/cos (caught by the MC-vs-MCMC agreement test on lcbox)
    surface_to_image = cos_to_cam / vm.clamp_abs(image_to_surface)
    safe_sti = vm.clamp_abs(surface_to_image)
    contrib = (mis_w[..., None] * b_contrib / (screen_pc * safe_sti[..., None])
               * state.throughput)
    score = vm.luminance(contrib)
    valid &= score > 0.0
    return screen_pos, contrib, score, score * state.ss_jacobian, mis_w, valid


# ---------------------------------------------------------------------------
# bidirectional generation (GeneratePathBidir, path.cpp:1237-1449)
# ---------------------------------------------------------------------------

def _gen_unroll(D):
    """Generation-walk scan unroll (LMC_GEN_UNROLL; default 1 = rolled).

    The replay walk unrolls fully on TPU (replay.py) — generation keeps
    the rolled scan by default because it compiles inside many more
    programs (bootstrap, MC render, large step) and its share of the MCMC
    step is small; the env knob exists for measurement."""
    import os
    v = int(os.environ.get('LMC_GEN_UNROLL', '1'))
    return max(1, min(v, D))


def generate_path_bidir(scene, opts, tape: Tape, pixel=None,
                        min_depth=None, max_depth=None):
    """Generate a wavefront of bidirectional paths from a uniform tape.

    lax.scan over depth steps (the body compiles once, not max_depth times);
    per-step record fields and (s,t) contribution slots come out as stacked
    scan outputs and are assembled afterwards.

    pixel: optional [...,2] int32 pixel coords to restrict screen sampling
    (Vector2i screenPosi semantics, path.cpp:420-424); None = whole image.

    Returns (PathRecord, Contribs, lgt_alive[...,D], cam_alive[...,D]).
    """
    D = opts.max_depth
    min_depth = opts.min_depth if min_depth is None else min_depth
    max_depth = opts.max_depth if max_depth is None else max_depth
    md = 0 if min_depth == -1 else min_depth
    mx = D + 2 if max_depth == -1 else max_depth
    batch = tape.u.shape[:-1]
    intersect_fn, occluded_fn = make_intersect_fns(scene)
    spc = screen_pixel_count(scene)

    time = tape.time
    rec = empty_record(batch, D)
    rec = dataclasses.replace(rec, time=time)

    # stacked per-vertex tape inputs [D, ..., k]
    lgt_tape = jax.tree.map(lambda *a: jnp.stack(a),
                            *[tape.lgt_vertex(i) for i in range(D)])
    cam_tape = jax.tree.map(lambda *a: jnp.stack(a),
                            *[tape.cam_vertex(i) for i in range(D)])

    # ---- light subpath ----
    light_id, light_pick_prob = light_ops.pick_light(scene, tape.light_pick)
    lgt_lprim = light_ops.sample_discrete(scene, light_id, tape.light_disc)
    em = light_ops.emit(scene, light_id, lgt_lprim, tape.light_pos,
                        tape.light_dir, time)
    emission_pdf = em['emission_pdf'] * light_pick_prob
    direct_pdf = em['direct_pdf'] * light_pick_prob
    throughput0 = em['emission'] / jnp.maximum(light_pick_prob, 1e-12)[..., None]
    delta_light = light_ops.is_delta(scene, light_id)
    finite_light = light_ops.is_finite(scene, light_id)
    safe_epdf = vm.clamp_abs(emission_pdf)
    acc_prev0 = MIS(direct_pdf / safe_epdf)
    acc_this0 = jnp.where(delta_light, 0.0,
                          MIS(em['cos_at_light'] / safe_epdf))
    rec = dataclasses.replace(
        rec, lgt_light_id=light_id, lgt_lprim=em['lprim_id'],
        lgt_rnd_pos=tape.light_pos, lgt_rnd_dir=tape.light_dir)

    def lgt_body(carry, xs):
        l, vdata = xs
        org, d, alive, acc_prev, acc_this, throughput, ss_jac = carry
        hit, tid, t_hit, u_hit, v_hit = intersect_fn(
            org, d, time, jnp.full(batch, vm.ISECT_EPS), jnp.full(batch, INF))
        exists = alive & hit
        pos, sn, gn, st, _mat_id, _light_id = hit_attrs_full(
            scene, tid, org, d, t_hit, u_hit, v_hit, time)
        mat = bsdf_ops.gather_mat_params(scene, _mat_id, st)
        state = SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                          mat=mat, tri=jnp.where(exists, tid, -1),
                          acc_prev=acc_prev, acc_this=acc_this,
                          throughput=throughput, ss_jacobian=ss_jac,
                          last_bsdf_pdf=jnp.zeros(batch))
        include_dist = jnp.where(l == 0, finite_light,
                                 jnp.ones(batch, bool))
        state = convert_mis(state, org, d, include_dist)

        # ConnectToCamera -> slot (1, 2+l); the reference emits it only up
        # to lgtDepth+2 == maxDepth (loop break order, path.cpp:1277-1291)
        cc_screen, cc_contrib, cc_ls, cc_ss, cc_mis, cc_ok = connect_to_camera(
            scene, opts, occluded_fn, time, state, spc)
        cc_ok &= exists & (l + 2 >= md) & (l + 2 <= mx)

        stop = l + 2 >= mx
        new_d, new_state, b_contrib, use_abs, b_ok, rnd_canon, _ = bsdf_sampling(
            scene, opts, state, vdata['bsdf'], vdata['disc'], l, adjoint=True)
        rr_prob = russian_roulette_prob(l, b_contrib)
        rr_ok = vdata['rr'] <= rr_prob
        rr_weight = 1.0 / jnp.maximum(rr_prob, 1e-12)
        alive_next = exists & b_ok & rr_ok & ~stop

        ys = dict(
            exists=exists, tri=jnp.where(exists, tid, -1),
            disc=vdata['disc'], rnd_canon=rnd_canon, use_abs=use_abs,
            rr_weight=jnp.where(rr_ok, rr_weight, 1.0),
            cc_screen=jnp.where(cc_ok[..., None], cc_screen, 0.0),
            cc_contrib=jnp.where(cc_ok[..., None], cc_contrib, 0.0),
            cc_ls=jnp.where(cc_ok, cc_ls, 0.0),
            cc_ss=jnp.where(cc_ok, cc_ss, 0.0),
            cc_mis=jnp.where(cc_ok, cc_mis, 0.0),
            # state snapshot for ConnectVertex (per-l light states)
            pos=state.pos, sn=state.shading_n, gn=state.geom_n, st=state.st,
            wi=state.wi, acc_prev=state.acc_prev, acc_this=state.acc_this,
            throughput=state.throughput, ss_jac=state.ss_jacobian,
            mat=state.mat)
        new_carry = (state.pos, new_d, alive_next,
                     new_state.acc_prev, new_state.acc_this,
                     new_state.throughput * rr_weight[..., None],
                     new_state.ss_jacobian)
        return new_carry, ys

    lgt_init = (em['org'], em['dir'], emission_pdf > 0.0,
                acc_prev0, acc_this0, throughput0, jnp.ones(batch))
    _, lgt_ys = jax.lax.scan(lgt_body, lgt_init,
                             (jnp.arange(D), lgt_tape),
                             unroll=_gen_unroll(D))
    lgt_alive = jnp.moveaxis(lgt_ys['exists'], 0, -1)   # [..., D]

    rec = dataclasses.replace(
        rec,
        lgt_tri=jnp.moveaxis(lgt_ys['tri'], 0, -1),
        lgt_bsdf_rnd=jnp.moveaxis(lgt_ys['rnd_canon'], 0, -2),
        lgt_bsdf_disc=jnp.moveaxis(lgt_ys['disc'], 0, -1),
        lgt_use_abs=jnp.moveaxis(lgt_ys['use_abs'], 0, -1),
        lgt_rr=jnp.moveaxis(lgt_ys['rr_weight'], 0, -1))

    # ---- camera subpath ----
    if pixel is None:
        screen = tape.screen
    else:
        screen = (pixel.astype(jnp.float32) + tape.screen) \
            / jnp.asarray([scene.width, scene.height], jnp.float32)
    rec = dataclasses.replace(rec, screen_pos=screen)
    org0, d0, mn0, mx0 = sample_primary(scene.camera, screen, time)
    _, cam_center_dir_v = camera_center_dir(scene.camera, time)
    cam_pdf_w0 = camera_pdf_w(scene, cam_center_dir_v, d0)
    has_env = scene.env_light_id >= 0

    def cam_body(carry, xs):
        c, vdata = xs
        (org, d, alive, acc_prev, acc_this, throughput, ss_jac, lc_jac_prev,
         min_t, max_t) = carry
        hit, tid, t_hit, u_hit, v_hit = intersect_fn(org, d, time, min_t, max_t)
        pos, sn, gn, st, _mat_id, _light_id = hit_attrs_full(
            scene, tid, org, d, t_hit, u_hit, v_hit, time)
        mat = bsdf_ops.gather_mat_params(scene, _mat_id, st)
        state = SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                          mat=mat, tri=tid, acc_prev=acc_prev,
                          acc_this=acc_this, throughput=throughput,
                          ss_jacobian=ss_jac, last_bsdf_pdf=jnp.zeros(batch))
        state_mis = convert_mis(state, org, d, jnp.ones(batch, bool))
        state = dataclasses.replace(
            state,
            acc_prev=jnp.where(hit, state_mis.acc_prev, state.acc_prev),
            acc_this=jnp.where(hit, state_mis.acc_this, state.acc_this))

        hit_light_id = jnp.where(hit, _light_id, -1)
        is_env_hit = (~hit) & alive & has_env
        hit_light = alive & ((hit & (hit_light_id >= 0)) | is_env_hit)
        exists = alive & hit

        # HandleHitLight -> slot (2+c, 0); terminates the path
        h_contrib, h_ls, h_ss, h_mis, h_ok = handle_hit_light(
            scene, c == 0, hit, hit_light_id, tid,
            jnp.full(batch, -1, jnp.int32), org, d, time, state, screen)
        h_ok &= hit_light & (c + 1 >= md)
        # light-coordinate reparam of the previous vertex's bsdfRndParam
        # (HandleHitLight caller, path.cpp:1339-1373): the (s,0) technique's
        # stored randoms become the area light's sample params, ssJacobian
        # corrected for the change of sampling measure
        if opts.use_light_coordinate_sampling:
            lc_ok = h_ok & hit & (hit_light_id >= 0) & (c > 1)
            lc_param = light_ops.get_sample_param(scene, tid, pos, time)
            dir_to_prev = pos - org
            d2 = jnp.maximum(vm.length_squared(dir_to_prev), 1e-12)
            dir_to_prev = dir_to_prev / jnp.sqrt(d2)[..., None]
            # lcJacobian / SamplePdf() — the uni pairing (path.cpp:449-459),
            # which is the convention consistent with the replay's
            # bsdfPdf / shapePdf across the absolute-param cases; the bidir
            # generation's `* SamplePdf()` (path.cpp:1359) disagrees with
            # its own replay by a constant totalArea factor
            lc_factor = (jnp.abs(vm.dot(dir_to_prev, sn) / d2)
                         * lc_jac_prev
                         / light_ops.sample_tri_pdf(scene, tid))
            h_ss = jnp.where(lc_ok, h_ss * lc_factor, h_ss)
        else:
            lc_ok = jnp.zeros(batch, bool)
            lc_param = jnp.zeros(batch + (2,))
        env_pix, _, _, _ = light_ops.env_emission(scene, d, time)
        env_rec = jnp.where(is_env_hit & h_ok, env_pix, -1)
        alive = alive & ~(hit_light & (c + 1 >= md))
        cam_alive_now = exists & alive
        stop = c + 1 >= mx
        alive = alive & hit & ~stop

        # NEE -> slot (2+c, 1)
        nee_light, nee_prob = light_ops.pick_light(scene, vdata['nee_pick'])
        nee_lprim0 = light_ops.sample_discrete(scene, nee_light,
                                               vdata['nee_disc'])
        n_contrib, n_ls, n_ss, n_mis, n_ok, n_lprim = direct_lighting(
            scene, opts, occluded_fn, state, time, nee_light, nee_lprim0,
            vdata['nee_rnd'], nee_prob)
        n_ok &= alive & (c + 2 >= md)

        # vertex connections -> slots (2+c, 2+l): all D light vertices in
        # ONE flattened connect_vertex call. The old inner lax.scan issued
        # D sequential occlusion kernel dispatches per camera step (D*D per
        # generation, each with a ~1-2 ms fixed cost that does not shrink
        # with lane count) — the dominant cost of the sparse large step.
        nb = len(batch)
        lgt_state_all = SurfState(
            pos=lgt_ys['pos'], shading_n=lgt_ys['sn'],
            geom_n=lgt_ys['gn'], st=lgt_ys['st'],
            wi=lgt_ys['wi'], mat=lgt_ys['mat'],
            tri=jnp.zeros((D,) + batch, jnp.int32),
            acc_prev=lgt_ys['acc_prev'],
            acc_this=lgt_ys['acc_this'],
            throughput=lgt_ys['throughput'],
            ss_jacobian=lgt_ys['ss_jac'],
            last_bsdf_pdf=jnp.zeros((D,) + batch))
        l_idx = jnp.arange(D).reshape((D,) + (1,) * nb)
        length = c + l_idx + 3
        pre_ok = (alive[None] & lgt_ys['exists']
                  & (length <= mx) & (length >= md))

        def fl(x):
            return x.reshape((-1,) + x.shape[1 + nb:])

        def unfl(x):
            return x.reshape((D,) + batch + x.shape[1:])

        lgt_flat = jax.tree.map(fl, lgt_state_all)
        cam_flat = jax.tree.map(
            lambda x: fl(jnp.broadcast_to(x[None], (D,) + x.shape)), state)
        time_flat = fl(jnp.broadcast_to(time[None], (D,) + time.shape))
        v_contrib, v_ls, v_ss, v_mis, v_ok = connect_vertex(
            scene, opts, occluded_fn, time_flat, lgt_flat, cam_flat,
            mask=fl(pre_ok))
        v_ok = unfl(v_ok) & pre_ok
        conn_ys = dict(
            contrib=jnp.where(v_ok[..., None], unfl(v_contrib), 0.0),
            ls=jnp.where(v_ok, unfl(v_ls), 0.0),
            ss=jnp.where(v_ok, unfl(v_ss), 0.0),
            mis=jnp.where(v_ok, unfl(v_mis), 0.0))

        new_d, new_state, b_contrib, use_abs, b_ok, rnd_canon, lc_jac = \
            bsdf_sampling(scene, opts, state, vdata['bsdf'], vdata['disc'],
                          c, adjoint=False)
        rr_prob = russian_roulette_prob(c, b_contrib)
        rr_ok = vdata['rr'] <= rr_prob
        rr_weight = 1.0 / jnp.maximum(rr_prob, 1e-12)
        alive_next = alive & b_ok & rr_ok

        ys = dict(
            exists=exists, tri=jnp.where(exists, tid, -1),
            disc=vdata['disc'], rnd_canon=rnd_canon, use_abs=use_abs,
            rr_weight=jnp.where(rr_ok, rr_weight, 1.0),
            nee_light=nee_light, nee_lprim=n_lprim,
            nee_rnd=vdata['nee_rnd'],
            env_rec=env_rec, cam_alive=cam_alive_now,
            lc_ok=lc_ok, lc_param=lc_param,
            h_contrib=jnp.where(h_ok[..., None], h_contrib, 0.0),
            h_ls=jnp.where(h_ok, h_ls, 0.0),
            h_ss=jnp.where(h_ok, h_ss, 0.0),
            h_mis=jnp.where(h_ok, h_mis, 0.0),
            n_contrib=jnp.where(n_ok[..., None], n_contrib, 0.0),
            n_ls=jnp.where(n_ok, n_ls, 0.0),
            n_ss=jnp.where(n_ok, n_ss, 0.0),
            n_mis=jnp.where(n_ok, n_mis, 0.0),
            conn=conn_ys)
        new_carry = (state.pos, new_d, alive_next,
                     new_state.acc_prev, new_state.acc_this,
                     new_state.throughput * rr_weight[..., None],
                     new_state.ss_jacobian, lc_jac,
                     jnp.full(batch, vm.ISECT_EPS), jnp.full(batch, INF))
        return new_carry, ys

    cam_init = (org0, d0, jnp.ones(batch, bool), MIS(spc / cam_pdf_w0),
                jnp.zeros(batch), jnp.ones(batch + (3,)), jnp.ones(batch),
                jnp.ones(batch), mn0, mx0)
    _, cam_ys = jax.lax.scan(cam_body, cam_init,
                             (jnp.arange(D), cam_tape),
                             unroll=_gen_unroll(D))

    cam_alive = jnp.moveaxis(cam_ys['cam_alive'], 0, -1)
    env_stack = cam_ys['env_rec']                     # [D, ...]
    env_any = jnp.any(env_stack >= 0, 0)
    env_lprim = jnp.where(env_any, jnp.max(env_stack, 0), -1)

    cam_bsdf_rnd = jnp.moveaxis(cam_ys['rnd_canon'], 0, -2)
    if opts.use_light_coordinate_sampling:
        # scatter the light-coordinate reparam of step c into vertex c-1
        lc_ok = jnp.moveaxis(cam_ys['lc_ok'], 0, -1)      # [..., D]
        lc_param = jnp.moveaxis(cam_ys['lc_param'], 0, -2)  # [..., D, 2]
        shift_ok = jnp.concatenate(
            [lc_ok[..., 1:], jnp.zeros(batch + (1,), bool)], -1)
        shift_param = jnp.concatenate(
            [lc_param[..., 1:, :], jnp.zeros(batch + (1, 2))], -2)
        cam_bsdf_rnd = jnp.where(shift_ok[..., None], shift_param,
                                 cam_bsdf_rnd)
    rec = dataclasses.replace(
        rec,
        cam_tri=jnp.moveaxis(cam_ys['tri'], 0, -1),
        cam_bsdf_rnd=cam_bsdf_rnd,
        cam_bsdf_disc=jnp.moveaxis(cam_ys['disc'], 0, -1),
        cam_use_abs=jnp.moveaxis(cam_ys['use_abs'], 0, -1),
        cam_rr=jnp.moveaxis(cam_ys['rr_weight'], 0, -1),
        cam_nee_light=jnp.moveaxis(cam_ys['nee_light'], 0, -1),
        cam_nee_lprim=jnp.moveaxis(cam_ys['nee_lprim'], 0, -1),
        cam_nee_rnd=jnp.moveaxis(cam_ys['nee_rnd'], 0, -2),
        env_lprim=env_lprim)

    # ---- assemble the contribution grid [..., D, D+2(, k)] ----
    def grid(h, n, conn, vec=None):
        # h/n: [D, *batch(,v)]; conn: [D_c, D_l, *batch(,v)]
        if vec is not None:
            hm = jnp.moveaxis(h, 0, -2)                     # [*b, D, v]
            nm = jnp.moveaxis(n, 0, -2)
            cm = jnp.moveaxis(jnp.moveaxis(conn, 1, -2), 0, -3)
            return jnp.concatenate([hm[..., None, :], nm[..., None, :], cm],
                                   axis=-2)
        hm = jnp.moveaxis(h, 0, -1)                         # [*b, D]
        nm = jnp.moveaxis(n, 0, -1)
        cm = jnp.moveaxis(jnp.moveaxis(conn, 1, -1), 0, -2)
        return jnp.concatenate([hm[..., None], nm[..., None], cm], axis=-1)

    # screen positions: slots 0..D+1 of camera rows use `screen`.
    # INVARIANT relied on by integrators.mlt.collapse_flat: every s >= 2
    # technique of a lane shares this ONE broadcast camera screen position,
    # so their weighted contributions pre-sum exactly into a single splat
    # point (asserted by tests/test_mlt_bank.py); writing per-technique
    # camera screens here would silently corrupt the collapsed film banks
    scr = jnp.broadcast_to(screen[..., None, None, :],
                           batch + (D, D + 2, 2))
    con = Contribs(
        screen_pos=scr,
        contrib=grid(cam_ys['h_contrib'], cam_ys['n_contrib'],
                     cam_ys['conn']['contrib'], vec=3),
        ls_score=grid(cam_ys['h_ls'], cam_ys['n_ls'], cam_ys['conn']['ls']),
        ss_score=grid(cam_ys['h_ss'], cam_ys['n_ss'], cam_ys['conn']['ss']),
        lens_score=jnp.zeros(batch + (D, D + 2)),
        mis_weight=grid(cam_ys['h_mis'], cam_ys['n_mis'],
                        cam_ys['conn']['mis']),
        l_screen_pos=jnp.moveaxis(lgt_ys['cc_screen'], 0, -2),
        l_contrib=jnp.moveaxis(lgt_ys['cc_contrib'], 0, -2),
        l_ls_score=jnp.moveaxis(lgt_ys['cc_ls'], 0, -1),
        l_ss_score=jnp.moveaxis(lgt_ys['cc_ss'], 0, -1),
        l_lens_score=jnp.zeros(batch + (D,)),
        l_mis_weight=jnp.moveaxis(lgt_ys['cc_mis'], 0, -1))
    return rec, con, lgt_alive, cam_alive


# ---------------------------------------------------------------------------
# fixed-(s,t) generation (GenerateSubpath, path.cpp:1451-1659)
# ---------------------------------------------------------------------------

def generate_subpath(scene, opts, tape: Tape, s, t, pixel=None):
    """Generate a wavefront of fixed-technique paths: lane i walks exactly
    camLength=s[i] camera vertices and lgtLength=t[i] light vertices and
    emits the single (s,t) connection (multiplexed-MMLT large steps,
    GenerateSubpath, path.cpp:1451-1659). Differences from
    generate_path_bidir: no Russian roulette (rrWeight=1, path.cpp:1524,
    1645), no min/max-depth filtering, one contribution per lane.

    s, t: [...] int32 with s >= 1, t >= 0, s + t - 1 <= max_depth.
    Returns (PathRecord tagged with (s,t), dict(screen, contrib, ls, ss,
    mis, valid)).

    Only bidirectional MIS is implemented (bidirMIS=true); the reference's
    uni-directional multiplexed mode (lgtLength in {0,1} with power-2 MIS)
    is not wired up.
    """
    D = opts.max_depth
    batch = tape.u.shape[:-1]
    intersect_fn, occluded_fn = make_intersect_fns(scene)
    spc = screen_pixel_count(scene)
    s = jnp.asarray(s, jnp.int32)
    t = jnp.asarray(t, jnp.int32)

    time = tape.time
    rec = empty_record(batch, D)
    rec = dataclasses.replace(rec, time=time)

    lgt_tape = jax.tree.map(lambda *a: jnp.stack(a),
                            *[tape.lgt_vertex(i) for i in range(D)])
    cam_tape = jax.tree.map(lambda *a: jnp.stack(a),
                            *[tape.cam_vertex(i) for i in range(D)])

    out = dict(screen=jnp.zeros(batch + (2,)), contrib=jnp.zeros(batch + (3,)),
               ls=jnp.zeros(batch), ss=jnp.zeros(batch),
               mis=jnp.zeros(batch), valid=jnp.zeros(batch, bool))

    # ---- light subpath (t >= 2 lanes walk t-1 vertices) ----
    has_lgt = t >= 2
    light_id, light_pick_prob = light_ops.pick_light(scene, tape.light_pick)
    lgt_lprim = light_ops.sample_discrete(scene, light_id, tape.light_disc)
    em = light_ops.emit(scene, light_id, lgt_lprim, tape.light_pos,
                        tape.light_dir, time)
    emission_pdf = em['emission_pdf'] * light_pick_prob
    direct_pdf = em['direct_pdf'] * light_pick_prob
    throughput0 = em['emission'] / jnp.maximum(light_pick_prob, 1e-12)[..., None]
    delta_light = light_ops.is_delta(scene, light_id)
    finite_light = light_ops.is_finite(scene, light_id)
    safe_epdf = vm.clamp_abs(emission_pdf)
    acc_prev0 = MIS(direct_pdf / safe_epdf)
    acc_this0 = jnp.where(delta_light, 0.0,
                          MIS(em['cos_at_light'] / safe_epdf))
    rec = dataclasses.replace(
        rec, lgt_light_id=light_id, lgt_lprim=em['lprim_id'],
        lgt_rnd_pos=tape.light_pos, lgt_rnd_dir=tape.light_dir)

    def lgt_body(carry, xs):
        l, vdata = xs
        org, d, alive, acc_prev, acc_this, throughput, ss_jac = carry
        hit, tid, t_hit, u_hit, v_hit = intersect_fn(
            org, d, time, jnp.full(batch, vm.ISECT_EPS), jnp.full(batch, INF))
        exists = alive & hit
        pos, sn, gn, st, _mat_id, _light_id = hit_attrs_full(
            scene, tid, org, d, t_hit, u_hit, v_hit, time)
        mat = bsdf_ops.gather_mat_params(scene, _mat_id, st)
        state = SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                          mat=mat, tri=jnp.where(exists, tid, -1),
                          acc_prev=acc_prev, acc_this=acc_this,
                          throughput=throughput, ss_jacobian=ss_jac,
                          last_bsdf_pdf=jnp.zeros(batch))
        include_dist = jnp.where(l == 0, finite_light,
                                 jnp.ones(batch, bool))
        state = convert_mis(state, org, d, include_dist)

        terminal = exists & (l == t - 2)
        # ConnectToCamera only for s == 1 lanes at their terminal vertex
        cc_screen, cc_contrib, cc_ls, cc_ss, cc_mis, cc_ok = connect_to_camera(
            scene, opts, occluded_fn, time, state, spc)
        cc_ok &= terminal & (s == 1)

        # extend only while l < t-2 (path.cpp:1495-1507)
        new_d, new_state, b_contrib, use_abs, b_ok, rnd_canon, _ = bsdf_sampling(
            scene, opts, state, vdata['bsdf'], vdata['disc'], l, adjoint=True)
        extend = exists & (l < t - 2)
        alive_next = extend & b_ok

        ys = dict(
            exists=exists, tri=jnp.where(exists, tid, -1),
            disc=vdata['disc'],
            rnd_canon=jnp.where(extend[..., None], rnd_canon, 0.0),
            use_abs=use_abs & extend,
            cc_screen=jnp.where(cc_ok[..., None], cc_screen, 0.0),
            cc_contrib=jnp.where(cc_ok[..., None], cc_contrib, 0.0),
            cc_ls=jnp.where(cc_ok, cc_ls, 0.0),
            cc_ss=jnp.where(cc_ok, cc_ss, 0.0),
            cc_mis=jnp.where(cc_ok, cc_mis, 0.0),
            cc_ok=cc_ok,
            pos=state.pos, sn=state.shading_n, gn=state.geom_n, st=state.st,
            wi=state.wi, acc_prev=state.acc_prev, acc_this=state.acc_this,
            throughput=state.throughput, ss_jac=state.ss_jacobian,
            mat=state.mat)
        new_carry = (state.pos, new_d, alive_next,
                     new_state.acc_prev, new_state.acc_this,
                     new_state.throughput, new_state.ss_jacobian)
        return new_carry, ys

    lgt_init = (em['org'], em['dir'], has_lgt & (emission_pdf > 0.0),
                acc_prev0, acc_this0, throughput0, jnp.ones(batch))
    _, lgt_ys = jax.lax.scan(lgt_body, lgt_init,
                             (jnp.arange(D), lgt_tape),
                             unroll=_gen_unroll(D))

    rec = dataclasses.replace(
        rec,
        lgt_tri=jnp.moveaxis(lgt_ys['tri'], 0, -1),
        lgt_bsdf_rnd=jnp.moveaxis(lgt_ys['rnd_canon'], 0, -2),
        lgt_bsdf_disc=jnp.moveaxis(lgt_ys['disc'], 0, -1),
        lgt_use_abs=jnp.moveaxis(lgt_ys['use_abs'], 0, -1))

    # s == 1 lanes: result is the connect-to-camera at light vertex t-2
    t_idx = jnp.clip(t - 2, 0, D - 1)
    gather_l = lambda a: jnp.take_along_axis(
        a, t_idx.reshape((1,) + batch + (1,) * (a.ndim - 1 - len(batch))), 0
    )[0]
    cc = {k: gather_l(lgt_ys[k]) for k in
          ('cc_screen', 'cc_contrib', 'cc_ls', 'cc_ss', 'cc_mis', 'cc_ok')}
    s1 = (s == 1) & cc['cc_ok']
    out = dict(
        screen=jnp.where(s1[..., None], cc['cc_screen'], out['screen']),
        contrib=jnp.where(s1[..., None], cc['cc_contrib'], out['contrib']),
        ls=jnp.where(s1, cc['cc_ls'], out['ls']),
        ss=jnp.where(s1, cc['cc_ss'], out['ss']),
        mis=jnp.where(s1, cc['cc_mis'], out['mis']),
        valid=out['valid'] | s1)

    # terminal light state for ConnectVertex (t >= 2, s >= 2 lanes)
    lterm = {k: gather_l(lgt_ys[k]) for k in
             ('exists', 'pos', 'sn', 'gn', 'st', 'wi', 'acc_prev', 'acc_this',
              'throughput', 'ss_jac')}
    lterm_mat = jax.tree.map(gather_l, lgt_ys['mat'])
    lgt_term_state = SurfState(
        pos=lterm['pos'], shading_n=lterm['sn'], geom_n=lterm['gn'],
        st=lterm['st'], wi=lterm['wi'], mat=lterm_mat,
        tri=jnp.zeros(batch, jnp.int32), acc_prev=lterm['acc_prev'],
        acc_this=lterm['acc_this'], throughput=lterm['throughput'],
        ss_jacobian=lterm['ss_jac'], last_bsdf_pdf=jnp.zeros(batch))

    # ---- camera subpath (s >= 2 lanes walk s-1 vertices) ----
    if pixel is None:
        screen = tape.screen
    else:
        screen = (pixel.astype(jnp.float32) + tape.screen) \
            / jnp.asarray([scene.width, scene.height], jnp.float32)
    rec = dataclasses.replace(rec, screen_pos=screen)
    org0, d0, mn0, mx0 = sample_primary(scene.camera, screen, time)
    _, cam_center_dir_v = camera_center_dir(scene.camera, time)
    cam_pdf_w0 = camera_pdf_w(scene, cam_center_dir_v, d0)
    has_env = scene.env_light_id >= 0

    bidir_mis = bool(getattr(opts, 'bidirectional', True))

    def cam_body(carry, xs):
        c, vdata = xs
        (org, d, alive, acc_prev, acc_this, throughput, ss_jac, lc_jac_prev,
         last_pdf, min_t, max_t, res) = carry
        hit, tid, t_hit, u_hit, v_hit = intersect_fn(org, d, time, min_t, max_t)
        pos, sn, gn, st, _mat_id, _light_id = hit_attrs_full(
            scene, tid, org, d, t_hit, u_hit, v_hit, time)
        mat = bsdf_ops.gather_mat_params(scene, _mat_id, st)
        state = SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                          mat=mat, tri=tid, acc_prev=acc_prev,
                          acc_this=acc_this, throughput=throughput,
                          ss_jacobian=ss_jac, last_bsdf_pdf=last_pdf)
        if bidir_mis:
            state_mis = convert_mis(state, org, d, jnp.ones(batch, bool))
            state = dataclasses.replace(
                state,
                acc_prev=jnp.where(hit, state_mis.acc_prev, state.acc_prev),
                acc_this=jnp.where(hit, state_mis.acc_this, state.acc_this))

        terminal = alive & (c == s - 2)

        # t == 0: HandleHitLight at the terminal vertex (path.cpp:1549-1588)
        hit_light_id = jnp.where(hit, _light_id, -1)
        is_env_hit = (~hit) & terminal & has_env
        hit_light = (hit & (hit_light_id >= 0)) | is_env_hit
        h_contrib, h_ls, h_ss, h_mis, h_ok = handle_hit_light(
            scene, c == 0, hit, hit_light_id, tid,
            jnp.full(batch, -1, jnp.int32), org, d, time, state, screen,
            bidir_mis=bidir_mis, last_bsdf_pdf=last_pdf)
        h_ok &= terminal & (t == 0) & hit_light
        # light-coordinate reparam (path.cpp:1553-1572; the reference applies
        # it unconditionally in GenerateSubpath — here gated on the option so
        # the generation map always matches the replay map)
        if opts.use_light_coordinate_sampling:
            lc_ok = h_ok & hit & (hit_light_id >= 0) & (c > 1)
            lc_param = light_ops.get_sample_param(scene, tid, pos, time)
            dir_to_prev = pos - org
            d2 = jnp.maximum(vm.length_squared(dir_to_prev), 1e-12)
            dir_to_prev = dir_to_prev / jnp.sqrt(d2)[..., None]
            # lcJacobian / SamplePdf() — the uni pairing (path.cpp:449-459),
            # which is the convention consistent with the replay's
            # bsdfPdf / shapePdf across the absolute-param cases; the bidir
            # generation's `* SamplePdf()` (path.cpp:1359) disagrees with
            # its own replay by a constant totalArea factor
            lc_factor = (jnp.abs(vm.dot(dir_to_prev, sn) / d2)
                         * lc_jac_prev
                         / light_ops.sample_tri_pdf(scene, tid))
            h_ss = jnp.where(lc_ok, h_ss * lc_factor, h_ss)
        else:
            lc_ok = jnp.zeros(batch, bool)
            lc_param = jnp.zeros(batch + (2,))
        env_pix, _, _, _ = light_ops.env_emission(scene, d, time)
        env_rec = jnp.where(is_env_hit & h_ok, env_pix, -1)

        exists = alive & hit

        # t == 1: NEE at the terminal vertex (path.cpp:1604-1618)
        nee_light, nee_prob = light_ops.pick_light(scene, vdata['nee_pick'])
        nee_lprim0 = light_ops.sample_discrete(scene, nee_light,
                                               vdata['nee_disc'])
        n_contrib, n_ls, n_ss, n_mis, n_ok, n_lprim = direct_lighting(
            scene, opts, occluded_fn, state, time, nee_light, nee_lprim0,
            vdata['nee_rnd'], nee_prob, bidir_mis=bidir_mis)
        n_ok &= exists & terminal & (t == 1)

        # t >= 2: ConnectVertex to the light terminal (path.cpp:1619-1633)
        v_contrib, v_ls, v_ss, v_mis, v_ok = connect_vertex(
            scene, opts, occluded_fn, time, lgt_term_state, state)
        v_ok &= exists & terminal & (t >= 2) & lterm['exists']

        res = dict(
            screen=jnp.where((h_ok | n_ok | v_ok)[..., None], screen,
                             res['screen']),
            contrib=jnp.where(h_ok[..., None], h_contrib,
                              jnp.where(n_ok[..., None], n_contrib,
                                        jnp.where(v_ok[..., None], v_contrib,
                                                  res['contrib']))),
            ls=jnp.where(h_ok, h_ls, jnp.where(n_ok, n_ls,
                         jnp.where(v_ok, v_ls, res['ls']))),
            ss=jnp.where(h_ok, h_ss, jnp.where(n_ok, n_ss,
                         jnp.where(v_ok, v_ss, res['ss']))),
            mis=jnp.where(h_ok, h_mis, jnp.where(n_ok, n_mis,
                          jnp.where(v_ok, v_mis, res['mis']))),
            valid=res['valid'] | h_ok | n_ok | v_ok,
            env=jnp.where(env_rec >= 0, env_rec, res['env']))

        # extend only while c < s-2
        new_d, new_state, b_contrib, use_abs, b_ok, rnd_canon, lc_jac = \
            bsdf_sampling(scene, opts, state, vdata['bsdf'], vdata['disc'],
                          c, adjoint=False)
        extend = exists & (c < s - 2)
        alive_next = extend & b_ok

        ys = dict(
            exists=exists, tri=jnp.where(exists, tid, -1),
            disc=vdata['disc'],
            rnd_canon=jnp.where(extend[..., None], rnd_canon, 0.0),
            use_abs=use_abs & extend,
            lc_ok=lc_ok, lc_param=lc_param,
            nee_light=nee_light, nee_lprim=n_lprim,
            nee_rnd=vdata['nee_rnd'])
        new_carry = (state.pos, new_d, alive_next,
                     new_state.acc_prev, new_state.acc_this,
                     new_state.throughput, new_state.ss_jacobian, lc_jac,
                     new_state.last_bsdf_pdf,
                     jnp.full(batch, vm.ISECT_EPS), jnp.full(batch, INF),
                     res)
        return new_carry, ys

    res0 = dict(screen=out['screen'], contrib=out['contrib'], ls=out['ls'],
                ss=out['ss'], mis=out['mis'], valid=out['valid'],
                env=jnp.full(batch, -1, jnp.int32))
    cam_init = (org0, d0, (s >= 2), MIS(spc / cam_pdf_w0),
                jnp.zeros(batch), jnp.ones(batch + (3,)), jnp.ones(batch),
                jnp.ones(batch), jnp.zeros(batch), mn0, mx0, res0)
    carry, cam_ys = jax.lax.scan(cam_body, cam_init,
                                 (jnp.arange(D), cam_tape))
    res = carry[-1]

    cam_bsdf_rnd = jnp.moveaxis(cam_ys['rnd_canon'], 0, -2)
    if opts.use_light_coordinate_sampling:
        lc_ok_s = jnp.moveaxis(cam_ys['lc_ok'], 0, -1)
        lc_param_s = jnp.moveaxis(cam_ys['lc_param'], 0, -2)
        shift_ok = jnp.concatenate(
            [lc_ok_s[..., 1:], jnp.zeros(batch + (1,), bool)], -1)
        shift_param = jnp.concatenate(
            [lc_param_s[..., 1:, :], jnp.zeros(batch + (1, 2))], -2)
        cam_bsdf_rnd = jnp.where(shift_ok[..., None], shift_param,
                                 cam_bsdf_rnd)
    rec = dataclasses.replace(
        rec,
        cam_tri=jnp.moveaxis(cam_ys['tri'], 0, -1),
        cam_bsdf_rnd=cam_bsdf_rnd,
        cam_bsdf_disc=jnp.moveaxis(cam_ys['disc'], 0, -1),
        cam_use_abs=jnp.moveaxis(cam_ys['use_abs'], 0, -1),
        cam_nee_light=jnp.moveaxis(cam_ys['nee_light'], 0, -1),
        cam_nee_lprim=jnp.moveaxis(cam_ys['nee_lprim'], 0, -1),
        cam_nee_rnd=jnp.moveaxis(cam_ys['nee_rnd'], 0, -2),
        env_lprim=res['env'])

    from .records import to_subpath
    rec = to_subpath(rec, s, t)
    return rec, dict(screen=res['screen'], contrib=res['contrib'],
                     ls=res['ls'], ss=res['ss'], mis=res['mis'],
                     valid=res['valid'] & (res['ls'] > 0.0))


# ---------------------------------------------------------------------------
# unidirectional generation (GeneratePath, path.cpp:406-527)
# ---------------------------------------------------------------------------

def generate_path_uni(scene, opts, tape: Tape, pixel=None,
                      min_depth=None, max_depth=None):
    """Unidirectional path tracing with NEE and power-2 MIS
    (GeneratePath, path.cpp:406-527; used by the direct-lighting pass and
    the non-bidirectional "mc" integrator).

    Returns (PathRecord, Contribs) — only slots (2+c, 0) and (2+c, 1) fill.
    """
    D = opts.max_depth
    min_depth = opts.min_depth if min_depth is None else min_depth
    max_depth = opts.max_depth if max_depth is None else max_depth
    batch = tape.u.shape[:-1]
    intersect_fn, occluded_fn = make_intersect_fns(scene)

    time = tape.time
    rec = empty_record(batch, D)
    con = empty_contribs(batch, D)
    rec = dataclasses.replace(rec, time=time)

    if pixel is None:
        screen = tape.screen
    else:
        screen = (pixel.astype(jnp.float32) + tape.screen) \
            / jnp.asarray([scene.width, scene.height], jnp.float32)
    rec = dataclasses.replace(rec, screen_pos=screen)
    org, d, min_t, max_t = sample_primary(scene.camera, screen, time)
    throughput = jnp.ones(batch + (3,))
    last_bsdf_pdf = jnp.ones(batch)
    ss_jac = jnp.ones(batch)
    alive = jnp.ones(batch, bool)

    steps = D if max_depth == -1 else min(D, max_depth)
    for c in range(steps):
        hit, tid, t_hit, u_hit, v_hit = intersect_fn(org, d, time, min_t, max_t)
        pos, sn, gn, st, _mat_id, _light_id = hit_attrs_full(
            scene, tid, org, d, t_hit, u_hit, v_hit, time)
        mat = bsdf_ops.gather_mat_params(scene, _mat_id, st)
        vdata = tape.cam_vertex(c)

        hit_light_id = jnp.where(hit, _light_id, -1)
        has_env = scene.env_light_id >= 0
        is_env_hit = (~hit) & alive & has_env
        hit_light = alive & ((hit & (hit_light_id >= 0)) | is_env_hit)

        exists = alive & hit
        rec = dataclasses.replace(
            rec,
            cam_tri=rec.cam_tri.at[..., c].set(jnp.where(exists, tid, -1)),
            cam_bsdf_disc=rec.cam_bsdf_disc.at[..., c].set(vdata['disc']))

        # HandleHitLight, uni-MIS variant (path.cpp:121-182)
        if c + 1 >= min_depth or min_depth == -1:
            is_env = ~hit
            em_a, dpdf_a, epdf_a = light_ops.area_emission(
                scene, jnp.maximum(hit_light_id, 0), tid, d, sn, time)
            env_pix, em_e, dpdf_e, epdf_e = light_ops.env_emission(scene, d, time)
            emission = jnp.where(is_env[..., None], em_e, em_a)
            direct_pdf = jnp.where(is_env, dpdf_e, dpdf_a)
            h_ok = (jnp.sum(emission, -1) > 0.0) & hit_light
            # convert area pdf to solid angle (path.cpp:149-153)
            dist_sq = vm.distance_squared(org, pos)
            cos_theta = -vm.dot(d, sn)
            safe_cos = vm.clamp_abs(cos_theta)
            direct_pdf = jnp.where(is_env, direct_pdf,
                                   direct_pdf * dist_sq / safe_cos)
            contrib = throughput * emission
            lpp = light_ops.pick_light_prob(
                scene, jnp.where(is_env, jnp.int32(max(scene.env_light_id, 0)),
                                 jnp.maximum(hit_light_id, 0)))
            mis_w = jnp.where(c > 0,
                              vm.mis_weight_power2(last_bsdf_pdf,
                                                   direct_pdf * lpp),
                              1.0)
            contrib = contrib * mis_w[..., None]
            score = vm.luminance(contrib)
            h_ok &= score > 0.0
            rec = dataclasses.replace(
                rec, env_lprim=jnp.where(is_env_hit & h_ok, env_pix,
                                         rec.env_lprim))
            con = dataclasses.replace(
                con,
                screen_pos=con.screen_pos.at[..., c, 0, :].set(
                    jnp.where(h_ok[..., None], screen, 0.0)),
                contrib=con.contrib.at[..., c, 0, :].set(
                    jnp.where(h_ok[..., None], contrib, 0.0)),
                ls_score=con.ls_score.at[..., c, 0].set(jnp.where(h_ok, score, 0.0)),
                ss_score=con.ss_score.at[..., c, 0].set(
                    jnp.where(h_ok, score * ss_jac, 0.0)),
                mis_weight=con.mis_weight.at[..., c, 0].set(
                    jnp.where(h_ok, mis_w, 0.0)))
            alive = alive & ~hit_light

        alive = alive & hit
        if (max_depth != -1) and (c + 1 >= max_depth):
            break

        state = SurfState(pos=pos, shading_n=sn, geom_n=gn, st=st, wi=-d,
                          mat=mat, tri=tid, acc_prev=jnp.zeros(batch),
                          acc_this=jnp.zeros(batch), throughput=throughput,
                          ss_jacobian=ss_jac, last_bsdf_pdf=last_bsdf_pdf)

        # NEE with uni MIS (path.cpp:195-294)
        if c + 2 >= min_depth or min_depth == -1:
            nee_light, nee_prob = light_ops.pick_light(scene, vdata['nee_pick'])
            nee_lprim = light_ops.sample_discrete(scene, nee_light,
                                                  vdata['nee_disc'])
            rec = dataclasses.replace(
                rec,
                cam_nee_light=rec.cam_nee_light.at[..., c].set(nee_light),
                cam_nee_lprim=rec.cam_nee_lprim.at[..., c].set(nee_lprim),
                cam_nee_rnd=rec.cam_nee_rnd.at[..., c, :].set(vdata['nee_rnd']))
            out = light_ops.sample_direct(scene, nee_light, nee_lprim,
                                          vdata['nee_rnd'], pos, time)
            n_ok = out['valid'] & alive
            occ = occluded_fn(pos, out['dir_to_light'], time,
                              jnp.full(batch, vm.ISECT_EPS),
                              jnp.where(jnp.isinf(out['dist']),
                                        jnp.full(batch, INF),
                                        (1.0 - vm.SHADOW_EPS) * out['dist']))
            n_ok &= ~occ
            b_contrib, cos_wo, bsdf_pdf, _ = bsdf_ops.evaluate(
                mat, -d, sn, out['dir_to_light'])
            n_ok &= jnp.max(jnp.abs(b_contrib), -1) > 0.0
            n_contrib = (throughput * b_contrib * out['contrib']
                         / jnp.maximum(nee_prob, 1e-12)[..., None])
            delta = light_ops.is_delta(scene, nee_light)
            n_mis = jnp.where(delta, 1.0,
                              vm.mis_weight_power2(out['direct_pdf'] * nee_prob,
                                                   bsdf_pdf))
            n_contrib = jnp.where(delta[..., None], n_contrib,
                                  n_contrib * n_mis[..., None])
            n_score = vm.luminance(n_contrib)
            n_ok &= n_score > 0.0
            con = dataclasses.replace(
                con,
                screen_pos=con.screen_pos.at[..., c, 1, :].set(
                    jnp.where(n_ok[..., None], screen, 0.0)),
                contrib=con.contrib.at[..., c, 1, :].set(
                    jnp.where(n_ok[..., None], n_contrib, 0.0)),
                ls_score=con.ls_score.at[..., c, 1].set(jnp.where(n_ok, n_score, 0.0)),
                ss_score=con.ss_score.at[..., c, 1].set(
                    jnp.where(n_ok, n_score * ss_jac, 0.0)),
                mis_weight=con.mis_weight.at[..., c, 1].set(
                    jnp.where(n_ok, n_mis, 0.0)))

        new_d, new_state, b_contrib, use_abs, b_ok, rnd_canon, _ = bsdf_sampling(
            scene, opts, state, vdata['bsdf'], vdata['disc'], c, adjoint=False)
        rr_prob = russian_roulette_prob(c, b_contrib)
        rr_ok = vdata['rr'] <= rr_prob
        rr_weight = 1.0 / jnp.maximum(rr_prob, 1e-12)
        rec = dataclasses.replace(
            rec,
            cam_bsdf_rnd=rec.cam_bsdf_rnd.at[..., c, :].set(rnd_canon),
            cam_use_abs=rec.cam_use_abs.at[..., c].set(use_abs),
            cam_rr=rec.cam_rr.at[..., c].set(jnp.where(rr_ok, rr_weight, 1.0)))
        alive = alive & b_ok & rr_ok
        throughput = new_state.throughput * rr_weight[..., None]
        ss_jac = new_state.ss_jacobian
        last_bsdf_pdf = new_state.last_bsdf_pdf
        org, d = pos, new_d
        min_t = jnp.full(batch, vm.ISECT_EPS)
        max_t = jnp.full(batch, INF)

    return rec, con
