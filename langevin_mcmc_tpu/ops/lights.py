"""Lights: point, mesh-area, lat-long environment — batched, differentiable.

One implementation per light with masked type dispatch, replacing the
reference's Light virtual interface + serialized-tag AD dispatch
(reference src/light.h:14-99, src/light.cpp). Math mirrors:
  pointlight.cpp, arealight.cpp, envlight.cpp.

Conventions (same as reference):
  * direct_pdf is the pdf of SampleDirect in its native measure
    (solid angle for env; area for mesh lights before conversion).
  * emission_pdf is the pdf of emitting the (position, direction) pair.
  * env light: world dir d maps to the lat-long image via
    (atan2(x, -z), acos(y)) in *light* space (envlight.cpp:203-206).
"""

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm
from ..scene import transforms as T
from ..scene.scenedata import LIGHT_AREA, LIGHT_ENV, LIGHT_POINT


def pick_light(scene, u):
    """Sample a light by CDF (reference scene.cpp:151-154).
    Returns (light_id, prob)."""
    idx = jnp.clip(jnp.searchsorted(scene.light_cdf, u, side='right') - 1,
                   0, scene.num_lights - 1)
    prob = scene.light_weight[idx] / scene.light_weight_sum
    return idx.astype(jnp.int32), prob


def pick_light_prob(scene, light_id):
    """reference scene.cpp:156-158."""
    return scene.light_weight[light_id] / scene.light_weight_sum


def is_delta(scene, light_id):
    return scene.light_type[light_id] == LIGHT_POINT


def is_finite(scene, light_id):
    return scene.light_type[light_id] != LIGHT_ENV


def sample_discrete(scene, light_id, u):
    """Light::SampleDiscrete — for area lights picks the triangle by the
    per-light area CDF (arealight.cpp:24-26 -> trianglemesh.cpp:308-310).
    Returns lprim_id: for area lights a *global* triangle index; for env
    lights unused here (the pixel is picked inside sample_direct)."""
    k = jnp.clip(_searchsorted_rows(scene.light_tri_cdf, light_id, u),
                 0, jnp.maximum(scene.light_ntri[light_id] - 1, 0))
    return scene.light_tri[light_id, k]


def _batched_searchsorted(cdf, u):
    """searchsorted along the last axis for batched cdf rows [..., K]."""
    return jnp.sum((cdf <= u[..., None]).astype(jnp.int32), axis=-1)


def _searchsorted_rows(cdf2d, row, u):
    """Last index i with cdf2d[row, i] <= u (== _batched_searchsorted - 1)
    WITHOUT gathering whole rows: TPU gathers move ~an element per cycle,
    so materializing [lanes, K] cdf rows costs lanes*K cycles (33M elements
    = ~35 ms at the 65536-chain config) while ceil(log2 K) bisection steps
    of one scalar gather each cost ~lanes*log2(K)."""
    import numpy as np
    K = cdf2d.shape[-1]
    lo = jnp.full_like(row, -1)      # invariant: cdf[lo] <= u (virtual -inf)
    hi = jnp.full_like(row, K)       # invariant: cdf[hi] > u (virtual +inf)
    for _ in range(int(np.ceil(np.log2(K + 1)))):
        active = hi - lo > 1
        mid = (lo + hi) // 2
        cm = cdf2d[row, jnp.clip(mid, 0, K - 1)]
        go = cm <= u
        lo = jnp.where(active & go, mid, lo)
        hi = jnp.where(active & ~go, mid, hi)
    return lo


def _env_uv_to_index_rows(cdf2d, row, u):
    """_env_uv_to_index over per-lane rows of a [H, K] cdf table, gather-
    free (see _searchsorted_rows). Returns (index, u')."""
    K = cdf2d.shape[-1]
    idx = jnp.clip(_searchsorted_rows(cdf2d, row, u), 0, K - 2)
    lo = cdf2d[row, idx]
    hi = cdf2d[row, idx + 1]
    up = (u - lo) / jnp.where(hi > lo, hi - lo, 1.0)
    return idx, up


def _sample_tri(scene, tri_id, u, time):
    """Uniform point on triangle (trianglemesh.cpp:312-327).
    Returns (pos, normal)."""
    from .intersect import tri_vertices_at_time, tri_normals_at_time
    tp = tri_vertices_at_time(scene, tri_id, time)
    tn = tri_normals_at_time(scene, tri_id, time)
    a = jnp.sqrt(jnp.maximum((1.0 + vm.AD_EPS) - u[..., 0], 0.0))
    b1 = 1.0 - a
    b2 = a * u[..., 1]
    p0 = tp[..., 0, :]
    e1 = tp[..., 1, :] - p0
    e2 = tp[..., 2, :] - p0
    pos = p0 + e1 * b1[..., None] + e2 * b2[..., None]
    w = 1.0 - b1 - b2
    normal = vm.normalize(w[..., None] * tn[..., 0, :]
                          + b1[..., None] * tn[..., 1, :]
                          + b2[..., None] * tn[..., 2, :])
    return pos, normal


def get_sample_param(scene, tri_id, pos, time):
    """Inverse of _sample_tri's sqrt warp: the (u0,u1) that would sample
    `pos` on triangle tri_id (GetSampleParam, trianglemesh.cpp:255-291 via
    Barycentric, trianglemesh.cpp:239-254)."""
    from .intersect import tri_vertices_at_time
    tp = tri_vertices_at_time(scene, tri_id, time)
    p0 = tp[..., 0, :]
    e1 = tp[..., 1, :] - p0
    e2 = tp[..., 2, :] - p0
    e0 = pos - p0
    d11 = vm.dot(e1, e1)
    d12 = vm.dot(e1, e2)
    d22 = vm.dot(e2, e2)
    d01 = vm.dot(e0, e1)
    d02 = vm.dot(e0, e2)
    inv_denom = 1.0 / vm.clamp_abs(d11 * d22 - d12 * d12)
    b1 = (d22 * d01 - d12 * d02) * inv_denom
    b2 = (d11 * d02 - d12 * d01) * inv_denom
    a = 1.0 - b1
    u0 = (1.0 + vm.AD_EPS) - a * a
    u1 = b2 / vm.clamp_abs(a)
    return jnp.stack([u0, u1], -1)


def sample_tri_pdf(scene, tri_id):
    """SamplePdf of the area-light mesh owning tri_id: 1/totalArea
    (trianglemesh.h:53-55)."""
    light = jnp.maximum(scene.tri_light[tri_id], 0)
    return scene.light_inv_area[light]


# ---------------------------------------------------------------------------
# replay light packs — pre-gathered per-lane light constants
#
# Replay (perturb AND frozen) keeps the light-sampling STRUCTURE of the
# stored path: light_id and the area-light primitive come from the record,
# never re-picked. Every per-lane scene-table gather these evaluations need
# is therefore a per-proposal constant, gathered ONCE here and consumed by
# the pack-aware code paths below — the TPU equivalent of the reference's
# Serialize(): each light serializes exactly the constants its AD twin
# needs (arealight.cpp:6, envlight.cpp:83-120). TPU gathers move ~an
# element per cycle, so the repeated in-replay gathers these packs replace
# dominated the traced replay cost (xref_grad r5).
# ---------------------------------------------------------------------------

def _sample_tri_from_row(row, u):
    """_sample_tri from a pre-gathered packed tri row (static scenes)."""
    a = jnp.sqrt(jnp.maximum((1.0 + vm.AD_EPS) - u[..., 0], 0.0))
    b1 = 1.0 - a
    b2 = a * u[..., 1]
    pos = (row['p0'] + row['e1'] * b1[..., None]
           + row['e2'] * b2[..., None])
    w = 1.0 - b1 - b2
    tn = row['tn']
    normal = vm.normalize(w[..., None] * tn[..., 0, :]
                          + b1[..., None] * tn[..., 1, :]
                          + b2[..., None] * tn[..., 2, :])
    return pos, normal


def bake_env_pixel(scene, lprim):
    """Per-lane env-pixel constants at a FROZEN pixel id: the local cdf
    entries, row weights and 2x2 texel neighborhood (EnvLight::Serialize,
    envlight.cpp:83-120)."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    # lprim may be an area-light TRIANGLE id on non-env lanes (the pack is
    # built for every lane and masked by type at use) — clamp to the image
    lp = jnp.clip(lprim, 0, h * w - 1)
    row = lp // w
    col = lp % w
    return dict(
        row=row, col=col,
        cdf_row0=scene.env_cdf_rows[row],
        cdf_row1=scene.env_cdf_rows[row + 1],
        cdf_col0=scene.env_cdf_cols[row, col],
        cdf_col1=scene.env_cdf_cols[row, col + 1],
        **_env_bilinear_pack(scene, col, row))


def bake_light(scene, light_id, lprim_id):
    """Pre-gather every per-lane constant emit/sample_direct need for a
    known (light, primitive): the light row, the area-light triangle row,
    and the frozen env-pixel pack. Static scenes only (the caller gates on
    scene.has_motion)."""
    from .intersect import gather_tri_row
    lid = jnp.maximum(light_id, 0)
    pack = dict(
        ltype=scene.light_type[lid],
        pos=scene.light_pos[lid],
        emission=scene.light_emission[lid],
        inv_area=scene.light_inv_area[lid],
        pick_prob=pick_light_prob(scene, lid),
        is_delta=scene.light_type[lid] == LIGHT_POINT,
        is_finite=scene.light_type[lid] != LIGHT_ENV,
        # lprim may be an env PIXEL id on env lanes — clamp to the tri table
        tri=gather_tri_row(
            scene, jnp.clip(lprim_id, 0, scene.num_tris - 1)))
    if scene.env_light_id >= 0:
        pack['env'] = bake_env_pixel(scene, lprim_id)
    return pack


# ---------------------------------------------------------------------------
# env map helpers
# ---------------------------------------------------------------------------

def _env_uv_to_index(cdf, u):
    """CDF inversion uToIndex (envlight.cpp:129-134): returns (index, u')."""
    idx = jnp.clip(_batched_searchsorted(cdf, u) - 1, 0, cdf.shape[-1] - 2)
    lo = jnp.take_along_axis(cdf, idx[..., None], -1)[..., 0]
    hi = jnp.take_along_axis(cdf, idx[..., None] + 1, -1)[..., 0]
    up = (u - lo) / jnp.where(hi > lo, hi - lo, 1.0)
    return idx, up


def _env_rep_at(scene, col, row):
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    return scene.env_image[jnp.mod(row, h), jnp.mod(col, w)]


def _env_bilinear_pack(scene, col, row):
    """One gather of the packed 2x2 neighborhood + clip-indexed row
    weights: dict(v00, v10, v01, v11, rw0, rw1) — replaces 4 texel + 2
    row-weight gathers per lookup (TPU gather cost is ~per-index)."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    nb = scene.env_neigh[jnp.mod(row, h), jnp.mod(col, w)]
    rw = scene.env_rw2[jnp.clip(row + 1, 0, h + 1)]
    return dict(v00=nb[..., 0:3], v10=nb[..., 3:6], v01=nb[..., 6:9],
                v11=nb[..., 9:12], rw0=rw[..., 0], rw1=rw[..., 1])


def env_sample_direction(scene, rnd, time):
    """SampleDirection (envlight.cpp:121-170). Returns
    (lprim_id, dir_world, value, pdf)."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    u0, u1 = rnd[..., 0], rnd[..., 1]
    row, u1p = _env_uv_to_index(jnp.broadcast_to(scene.env_cdf_rows,
                                                 u1.shape + scene.env_cdf_rows.shape),
                                u1)
    col, u0p = _env_uv_to_index_rows(scene.env_cdf_cols, row, u0)
    lprim = row * w + col

    tent = jnp.stack([vm.tent(u0p), vm.tent(u1p)], -1)
    pl = jnp.stack([col.astype(jnp.float32), row.astype(jnp.float32)], -1) + tent
    phi = (pl[..., 0] + 0.5) * scene.env_pixel_size[0]
    theta = (pl[..., 1] + 0.5) * scene.env_pixel_size[1]
    sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)
    sin_theta, cos_theta = jnp.sin(theta), jnp.cos(theta)
    d_light = jnp.stack([sin_phi * sin_theta, cos_theta, -cos_phi * sin_theta], -1)
    rot, _ = T.interpolate_rigid(scene.env_to_world_t, scene.env_to_world_q,
                                 jnp.asarray(time))
    d_world = T.rigid_xform_vector(rot, d_light)

    dx1 = tent[..., 0:1]
    dx2 = 1.0 - dx1
    dy1 = tent[..., 1:2]
    dy2 = 1.0 - dy1
    p = _env_bilinear_pack(scene, col, row)
    value1 = p['v00'] * dx2 * dy2 + p['v10'] * dx1 * dy2
    value2 = p['v01'] * dx2 * dy1 + p['v11'] * dx1 * dy1
    value = value1 + value2
    pdf = ((vm.luminance(value1) * p['rw0'] + vm.luminance(value2) * p['rw1'])
           * scene.env_normalization
           / jnp.maximum(jnp.abs(sin_theta), 1e-7))
    return lprim, d_world, value, pdf


def env_emission(scene, dir_world, time, pack=None):
    """Emission lookup for rays escaping to the envmap
    (envlight.cpp:195-226). Returns (lprim_id, emission, direct_pdf,
    emission_pdf).

    pack: optional bake_env_dir pack — the 2x2 texel neighborhood and row
    weights come from it instead of per-lane image gathers. The discrete
    (col, row) pick stays frozen at the pack's values while the bilinear
    weights remain differentiable in dir_world — exactly the reference's
    serialize-the-neighborhood AD semantics (envlight.cpp:83-120)."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    rot, _ = T.interpolate_rigid(scene.env_to_light_t, scene.env_to_light_q,
                                 jnp.asarray(time))
    d = T.rigid_xform_vector(rot, dir_world)
    uvx = jnp.arctan2(d[..., 0], -d[..., 2]) * vm.INV_TWO_PI * w - 0.5
    uvy = jnp.arccos(jnp.clip(d[..., 1], -1.0 + 1e-7, 1.0 - 1e-7)) * vm.INV_PI * h - 0.5
    col = jnp.floor(uvx).astype(jnp.int32)
    row = jnp.floor(uvy).astype(jnp.int32)
    lprim = jnp.mod(row, h) * w + jnp.mod(col, w)
    dx1 = (uvx - col)[..., None]
    dx2 = 1.0 - dx1
    dy1 = (uvy - row)[..., None]
    dy2 = 1.0 - dy1
    if pack is not None:
        v00, v10 = pack['v00'], pack['v10']
        v01, v11 = pack['v01'], pack['v11']
        rw0, rw1 = pack['rw0'], pack['rw1']
    else:
        p = _env_bilinear_pack(scene, col, row)
        v00, v10, v01, v11 = p['v00'], p['v10'], p['v01'], p['v11']
        rw0, rw1 = p['rw0'], p['rw1']
    value1 = v00 * dx2 * dy2 + v10 * dx1 * dy2
    value2 = v01 * dx2 * dy1 + v11 * dx1 * dy1
    emission = value1 + value2
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - jnp.square(d[..., 1]), 1e-6))
    direct_pdf = ((vm.luminance(value1) * rw0 + vm.luminance(value2) * rw1)
                  * scene.env_normalization
                  / jnp.maximum(jnp.abs(sin_theta), 1e-7))
    position_pdf = vm.INV_PI / jnp.square(scene.bsphere_radius)
    return lprim, emission, direct_pdf, direct_pdf * position_pdf


def bake_env_dir(scene, dir_world, time):
    """Pre-gather env_emission's per-lane constants (texel neighborhood +
    row weights) at the pixel a direction maps to — the bake pass runs this
    at the primal (offset-0) direction, so the pack equals what the frozen
    replay's env_emission(pack=...) needs."""
    h, w = scene.env_image.shape[0], scene.env_image.shape[1]
    rot, _ = T.interpolate_rigid(scene.env_to_light_t, scene.env_to_light_q,
                                 jnp.asarray(time))
    d = T.rigid_xform_vector(rot, dir_world)
    uvx = jnp.arctan2(d[..., 0], -d[..., 2]) * vm.INV_TWO_PI * w - 0.5
    uvy = jnp.arccos(jnp.clip(d[..., 1], -1.0 + 1e-7, 1.0 - 1e-7)) * vm.INV_PI * h - 0.5
    col = jnp.floor(uvx).astype(jnp.int32)
    row = jnp.floor(uvy).astype(jnp.int32)
    return _env_bilinear_pack(scene, col, row)


# ---------------------------------------------------------------------------
# unified light interface (batched, masked dispatch over light type)
# ---------------------------------------------------------------------------

def sample_direct(scene, light_id, lprim_id, rnd, pos, time, pack=None,
                  skip_env=False):
    """Light::SampleDirect. lprim_id: pre-picked primitive (area tri) —
    pass -1 to let env pick its pixel from rnd.

    pack: optional bake_light pack — per-lane constants come from it
    instead of scene-table gathers (replay hot path).
    skip_env: zero the env branch (the frozen replay overrides it with the
    frozen-pixel variant, so evaluating the full CDF inversion here would
    be pure gather waste).

    Returns dict with dir_to_light, dist, contrib, cos_at_light,
    direct_pdf, emission_pdf, lprim_id, valid.
    """
    if pack is not None:
        ltype = pack['ltype']
        lpos = pack['pos']
        lemission = pack['emission']
        linv_area = pack['inv_area']
    else:
        ltype = scene.light_type[light_id]
        lpos = scene.light_pos[light_id]
        lemission = scene.light_emission[light_id]
        linv_area = scene.light_inv_area[light_id]

    # --- point (pointlight.cpp:37-55) ---
    to_l = lpos - pos
    dist_sq_p = jnp.maximum(vm.length_squared(to_l), 1e-12)
    dist_p = jnp.sqrt(dist_sq_p)
    dir_p = to_l / dist_p[..., None]
    contrib_p = lemission / dist_sq_p[..., None]
    direct_pdf_p = dist_sq_p
    emission_pdf_p = jnp.full_like(dist_p, vm.INV_FOUR_PI)
    cos_p = jnp.ones_like(dist_p)
    valid_p = jnp.ones_like(dist_p, bool)

    # --- area (arealight.cpp:28-57) ---
    tri = jnp.maximum(lprim_id, 0)
    if pack is not None:
        pos_l, n_l = _sample_tri_from_row(pack['tri'], rnd)
    else:
        pos_l, n_l = _sample_tri(scene, tri, rnd, time)
    shape_pdf = linv_area
    to_a = pos_l - pos
    dist_sq_a = jnp.maximum(vm.length_squared(to_a), 1e-12)
    dist_a = jnp.sqrt(dist_sq_a)
    dir_a = to_a / dist_a[..., None]
    cos_a = -vm.dot(dir_a, n_l)
    valid_a = cos_a > vm.COS_EPS
    safe_cos_a = jnp.maximum(cos_a, vm.COS_EPS)
    # max-guard: shape_pdf is 0 for non-area lights in this masked branch
    contrib_a = (safe_cos_a / jnp.maximum(dist_sq_a * shape_pdf, 1e-12))[..., None] \
        * lemission
    direct_pdf_a = shape_pdf * dist_sq_a / safe_cos_a
    emission_pdf_a = shape_pdf * safe_cos_a * vm.INV_PI

    # --- env (envlight.cpp:172-193) ---
    if skip_env:
        z = jnp.zeros_like(dist_p)
        lprim_e = jnp.zeros_like(jnp.asarray(light_id))
        dir_e = jnp.zeros(dist_p.shape + (3,))
        value_e = jnp.zeros(dist_p.shape + (3,))
        pdf_e = z
    else:
        lprim_e, dir_e, value_e, pdf_e = env_sample_direction(scene, rnd,
                                                              time)
    dist_e = jnp.full_like(dist_p, jnp.inf)
    # sign-preserving clamp: the tent reconstruction can give matched
    # negative (value, pdf) pairs (envlight.cpp:160-169)
    safe_pdf_e = vm.clamp_abs(pdf_e)
    contrib_e = value_e / safe_pdf_e[..., None]
    cos_e = jnp.ones_like(dist_p)
    position_pdf = vm.INV_PI / jnp.square(scene.bsphere_radius)
    emission_pdf_e = pdf_e * position_pdf
    valid_e = pdf_e > 0.0

    is_pt = ltype == LIGHT_POINT
    is_ar = ltype == LIGHT_AREA

    def sel(a, b, c):
        pt, ar = is_pt, is_ar
        if a.ndim > ltype.ndim:
            pt, ar = pt[..., None], ar[..., None]
        return jnp.where(pt, a, jnp.where(ar, b, c))

    return dict(
        dir_to_light=sel(dir_p, dir_a, dir_e),
        dist=sel(dist_p, dist_a, dist_e),
        contrib=sel(contrib_p, contrib_a, contrib_e),
        cos_at_light=sel(cos_p, cos_a, cos_e),
        direct_pdf=sel(direct_pdf_p, direct_pdf_a, pdf_e),
        emission_pdf=sel(emission_pdf_p, emission_pdf_a, emission_pdf_e),
        lprim_id=jnp.where(is_pt, 0, jnp.where(is_ar, tri, lprim_e)),
        valid=sel(valid_p, valid_a, valid_e),
    )


def area_emission(scene, light_id, tri_id, dir_in, normal_on_light, time,
                  pack=None):
    """AreaLight::Emission at a hit point (arealight.cpp:60-78).
    Returns (emission, direct_pdf, emission_pdf).

    pack: optional dict(emission, inv_area) of pre-gathered constants."""
    if pack is not None:
        lem, linv = pack['emission'], pack['inv_area']
    else:
        lem = scene.light_emission[light_id]
        linv = scene.light_inv_area[light_id]
    cos_at = -vm.dot(normal_on_light, dir_in)
    ok = cos_at > 0.0
    em = jnp.where(ok[..., None], lem, 0.0)
    direct_pdf = jnp.where(ok, linv, 0.0)
    emission_pdf = jnp.where(ok, cos_at * linv * vm.INV_PI, 0.0)
    return em, direct_pdf, emission_pdf


def emit(scene, light_id, lprim_id, rnd_pos, rnd_dir, time, pack=None,
         skip_env=False):
    """Light::Emit — emission ray for the light subpath.

    pack / skip_env: see sample_direct (replay hot path).

    Returns dict with org, dir, emission, cos_at_light, emission_pdf,
    direct_pdf, lprim_id. For area lights lprim_id must be the pre-picked
    global triangle id (MMLT keeps it in PSS via uDiscrete)."""
    if pack is not None:
        ltype = pack['ltype']
        lpos = pack['pos']
        lemission = pack['emission']
        linv_area = pack['inv_area']
    else:
        ltype = scene.light_type[light_id]
        lpos = scene.light_pos[light_id]
        lemission = scene.light_emission[light_id]
        linv_area = scene.light_inv_area[light_id]

    # --- point (pointlight.cpp:57-72) ---
    d_p, _ = vm.sample_sphere(rnd_dir)
    org_p = jnp.broadcast_to(lpos, d_p.shape)
    em_p = jnp.broadcast_to(lemission, d_p.shape)
    cos_p = jnp.ones(d_p.shape[:-1])
    epdf_p = jnp.full(d_p.shape[:-1], vm.INV_FOUR_PI)
    dpdf_p = jnp.ones(d_p.shape[:-1])

    # --- area (arealight.cpp:80-104) ---
    tri = jnp.maximum(lprim_id, 0)
    if pack is not None:
        pos_a, n_a = _sample_tri_from_row(pack['tri'], rnd_pos)
    else:
        pos_a, n_a = _sample_tri(scene, tri, rnd_pos, time)
    shape_pdf = linv_area
    local = vm.sample_cos_hemisphere(rnd_dir)
    d_a = vm.local_to_world(local, n_a)
    em_a = lemission * (vm.PI / jnp.maximum(shape_pdf, 1e-12))[..., None]
    cos_a = local[..., 2]
    epdf_a = cos_a * vm.INV_PI * shape_pdf
    dpdf_a = jnp.broadcast_to(shape_pdf, cos_a.shape)

    # --- env (envlight.cpp:228-248) ---
    if skip_env:
        z1 = jnp.zeros(d_p.shape[:-1])
        lprim_e = jnp.zeros_like(jnp.asarray(light_id))
        d_sample = jnp.zeros(d_p.shape)
        em_e = jnp.zeros(d_p.shape)
        dpdf_e = z1
    else:
        lprim_e, d_sample, em_e, dpdf_e = env_sample_direction(scene,
                                                               rnd_dir, time)
    d_e = -d_sample
    offset = vm.sample_concentric_disc(rnd_pos)
    b0, b1 = vm.coordinate_system(d_e)
    perp = offset[..., 0:1] * b0 + offset[..., 1:2] * b1
    org_e = scene.bsphere_center + (perp - d_e) * scene.bsphere_radius
    cos_e = jnp.ones(d_e.shape[:-1])
    position_pdf = vm.INV_PI / jnp.square(scene.bsphere_radius)
    epdf_e = dpdf_e * position_pdf

    is_pt = ltype == LIGHT_POINT
    is_ar = ltype == LIGHT_AREA

    def sel(a, b, c):
        pt, ar = is_pt, is_ar
        if a.ndim > ltype.ndim:
            pt, ar = pt[..., None], ar[..., None]
        return jnp.where(pt, a, jnp.where(ar, b, c))

    return dict(
        org=sel(org_p, pos_a, org_e),
        dir=sel(d_p, d_a, d_e),
        emission=sel(em_p, em_a, em_e),
        cos_at_light=sel(cos_p, cos_a, cos_e),
        emission_pdf=sel(epdf_p, epdf_a, epdf_e),
        direct_pdf=sel(dpdf_p, dpdf_a, dpdf_e),
        lprim_id=jnp.where(is_pt, 0, jnp.where(is_ar, tri, lprim_e)),
    )
