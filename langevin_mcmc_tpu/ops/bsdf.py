"""BSDFs: Lambertian, Phong, rough dielectric (Beckmann microfacet).

One pure-JAX implementation per material, written once and used for BOTH
concrete sampling and the differentiable replay — the reference needs two
copies of everything (a Float version and a chad-expression AD twin, e.g.
src/lambertian.cpp:15-151) plus a serialized type-tag dispatch
(src/bsdf.cpp:13-171). Here dispatch is a masked evaluation of all three
materials + select, which is the vector-unit-friendly TPU equivalent of the
reference's BeginIf chains and costs little at 3 materials.

Every function takes a `MatParams` gathered per-lane from the scene material
tables (with textures already evaluated), so the same code serves wavefront
tracing and frozen-path replay.

All math cites the reference implementation it mirrors:
  lambertian.cpp, phong.cpp, roughdielectric.cpp, microfacet.h.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm
from ..scene.scenedata import (BSDF_LAMBERTIAN, BSDF_PHONG,
                               BSDF_ROUGH_DIELECTRIC)
from ..scene.textures import eval_texture


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatParams:
    """Per-lane material parameters with textures resolved."""
    mat_type: jnp.ndarray   # [...] int32
    twosided: jnp.ndarray   # [...] bool
    kd: jnp.ndarray         # [...,3] diffuse / transmittance (Kt)
    ks: jnp.ndarray         # [...,3] specular
    exponent: jnp.ndarray   # [...]
    ks_weight: jnp.ndarray  # [...]
    eta: jnp.ndarray        # [...]
    inv_eta: jnp.ndarray    # [...]
    alpha: jnp.ndarray      # [...]


_MAT_CACHE = {}


def _mat_table(scene):
    """Pack every per-material scalar into one contiguous [M, 18] row —
    TPU gathers move ~an element per cycle, so one row gather replaces ten
    separate gathers per lane. Layout: type(0) twosided(1) kd(2:5) ks(5:8)
    exponent(8) ks_weight(9) eta(10) inv_eta(11) alpha(12) kd_tex(13)
    ks_tex(14) expo_tex(15) alpha_tex(16) pad(17)."""
    import numpy as np
    key = id(scene.mat_kd)
    if key in _MAT_CACHE:
        return _MAT_CACHE[key]
    M = np.asarray(scene.mat_kd).shape[0]
    t = np.zeros((M, 18), np.float32)
    t[:, 0] = np.asarray(scene.mat_type)
    t[:, 1] = np.asarray(scene.mat_twosided)
    t[:, 2:5] = np.asarray(scene.mat_kd)
    t[:, 5:8] = np.asarray(scene.mat_ks)
    t[:, 8] = np.asarray(scene.mat_exponent)
    t[:, 9] = np.asarray(scene.mat_ks_weight)
    t[:, 10] = np.asarray(scene.mat_eta)
    t[:, 11] = np.asarray(scene.mat_inv_eta)
    t[:, 12] = np.asarray(scene.mat_alpha)
    t[:, 13] = np.asarray(scene.mat_kd_tex)
    t[:, 14] = np.asarray(scene.mat_ks_tex)
    t[:, 15] = np.asarray(scene.mat_exponent_tex)
    t[:, 16] = np.asarray(scene.mat_alpha_tex)
    if len(_MAT_CACHE) > 4:
        _MAT_CACHE.clear()
    _MAT_CACHE[key] = t
    return t


def gather_mat_params(scene, mat_id, st):
    """Gather + texture-evaluate material params for each lane
    (one packed row gather + texture lookups).

    Each texture slot is gated STATICALLY on whether any material in the
    scene actually binds a texture there: a bilinear eval is 4 atlas
    gathers of ~230 us each at 65536 lanes (TPU gathers move ~an element
    per cycle), and evaluating all four slots unconditionally made
    textures the single largest cost of the traced MCMC step
    (profiles/PROFILE_r05.md) when e.g. the torus scene textures only one
    material's kd."""
    import numpy as np
    tex = scene.textures
    table = _mat_table(scene)
    row = jnp.asarray(table)[mat_id]
    any_tex = (np.asarray(table)[:, 13:17] >= 0).any(0)  # static, host-side
    kd_tex = row[..., 13].astype(jnp.int32)
    ks_tex = row[..., 14].astype(jnp.int32)
    expo_tex = row[..., 15].astype(jnp.int32)
    alpha_tex = row[..., 16].astype(jnp.int32)
    kd = row[..., 2:5]
    if any_tex[0]:
        kd = kd * eval_texture(tex, kd_tex, st)
    ks = row[..., 5:8]
    if any_tex[1]:
        ks = ks * eval_texture(tex, ks_tex, st)
    expo = row[..., 8]
    if any_tex[2]:
        expo = jnp.where(expo_tex >= 0,
                         eval_texture(tex, expo_tex, st)[..., 0], expo)
    alpha = row[..., 12]
    if any_tex[3]:
        alpha = jnp.where(alpha_tex >= 0,
                          eval_texture(tex, alpha_tex, st)[..., 0], alpha)
    return MatParams(
        mat_type=row[..., 0].astype(jnp.int32),
        twosided=row[..., 1] > 0.5,
        kd=kd, ks=ks, exponent=expo,
        ks_weight=row[..., 9],
        eta=row[..., 10], inv_eta=row[..., 11],
        alpha=alpha)


def roughness(mp: MatParams):
    """BSDF::Roughness: lambertian/phong -> 1.0, roughdielectric -> alpha
    (lambertian.h:37-39, phong.cpp:155-157, roughdielectric.h:61-63)."""
    return jnp.where(mp.mat_type == BSDF_ROUGH_DIELECTRIC, mp.alpha, 1.0)


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _flip_normal(mp, wi, normal):
    """Two-sided handling: flip normal to wi's side when twoSided.
    Returns (normal_, cos_wi_after)."""
    cos_wi = vm.dot(wi, normal)
    flip = mp.twosided & (cos_wi < 0.0)
    normal_ = jnp.where(flip[..., None], -normal, normal)
    cos_wi = jnp.where(flip, -cos_wi, cos_wi)
    return normal_, cos_wi


def beckmann_d(local_h, alpha):
    """Beckmann NDF (reference microfacet.h:6-18)."""
    cos2 = jnp.square(local_h[..., 2])
    safe_cos2 = jnp.maximum(cos2, 1e-12)
    expo = (jnp.square(local_h[..., 0]) + jnp.square(local_h[..., 1])) \
        / jnp.maximum(jnp.square(alpha), 1e-12) / safe_cos2
    return jnp.exp(-expo) / (vm.PI * jnp.square(alpha) * jnp.square(safe_cos2))


def beckmann_g1(alpha, cos_theta):
    """Beckmann shadowing-masking, rational fit (microfacet.h:20-38).
    The +1e-6 inside sqrt matches the reference's AD variant
    (microfacet.h:41) and keeps the gradient finite at cos == 1."""
    safe_cos = vm.clamp_abs(cos_theta)
    tan_theta = jnp.sqrt(jnp.abs(1.0 + 1e-6 - jnp.square(cos_theta))) / safe_cos
    a = 1.0 / jnp.maximum(alpha * tan_theta, 1e-12)
    a_sqr = jnp.square(a)
    g = (3.535 * a + 2.181 * a_sqr) / (1.0 + 2.276 * a + 2.577 * a_sqr)
    g = jnp.where(a >= 1.6, 1.0, g)
    return jnp.where(tan_theta <= 0.0, 1.0, g)


def beckmann_g(alpha, cos_wi, cos_wo):
    return beckmann_g1(alpha, cos_wi) * beckmann_g1(alpha, cos_wo)


def fresnel_dielectric_ext(cos_i, eta, inv_eta):
    """Fresnel for dielectrics; returns (F, cos_theta_t)
    (reference microfacet.h:72-93). cos_theta_t carries the sign convention:
    negative when entering (cos_i > 0)."""
    scale = jnp.where(cos_i > 0.0, inv_eta, eta)
    cos_t_sqr = 1.0 - (1.0 - jnp.square(cos_i)) * jnp.square(scale)
    tir = cos_t_sqr <= 0.0
    cos_ia = jnp.abs(cos_i)
    cos_t = jnp.sqrt(jnp.maximum(cos_t_sqr, 1e-12))
    rs = (cos_ia - eta * cos_t) / (cos_ia + eta * cos_t)
    rp = (eta * cos_ia - cos_t) / (eta * cos_ia + cos_t)
    f = 0.5 * (jnp.square(rs) + jnp.square(rp))
    f = jnp.where(tir, 1.0, f)
    cos_theta_t = jnp.where(tir, 0.0, jnp.where(cos_i > 0.0, -cos_t, cos_t))
    return f, cos_theta_t


def sample_micronormal(u, alpha):
    """Beckmann half-vector sampling (reference microfacet.h:166-185).
    Returns (local_h, pdf_w)."""
    phi_m = vm.TWO_PI * u[..., 1]
    alpha_sqr = jnp.square(alpha)
    tan2 = alpha_sqr * (-jnp.log(jnp.maximum(1.0 - u[..., 0], 1e-6)))
    cos_m = 1.0 / jnp.sqrt(1.0 + tan2)
    cos2_m = jnp.square(cos_m)
    pdf = (1.0 - u[..., 0]) / jnp.maximum(vm.PI * alpha_sqr * cos_m * cos2_m,
                                          1e-12)
    sin_m = jnp.sqrt(jnp.maximum(1.0 - cos2_m, vm.AD_EPS))
    local_h = jnp.stack([sin_m * jnp.cos(phi_m), sin_m * jnp.sin(phi_m), cos_m], -1)
    return local_h, pdf


# ---------------------------------------------------------------------------
# evaluate: f(wi -> wo) * |cos wo| with pdfs. Shapes [...,3]/[...].
# ---------------------------------------------------------------------------

def _eval_lambertian(mp, wi, normal, wo):
    """reference lambertian.cpp:15-40 (twoSided flip by sign of cosWi)."""
    normal_, cos_wi = _flip_normal(mp, wi, normal)
    cos_wo = vm.dot(normal_, wo)
    ok = (cos_wi >= vm.COS_EPS) & (cos_wo >= vm.COS_EPS)
    fwd = cos_wo * vm.INV_PI
    rev = cos_wi * vm.INV_PI
    contrib = fwd[..., None] * mp.kd
    zero = jnp.zeros_like(contrib)
    return (jnp.where(ok[..., None], contrib, zero),
            cos_wo, jnp.where(ok, fwd, 0.0), jnp.where(ok, rev, 0.0))


def _eval_phong(mp, wi, normal, wo):
    """reference phong.cpp:22-65."""
    normal_, cos_wi = _flip_normal(mp, wi, normal)
    cos_wo = vm.dot(normal_, wo)
    ok = (cos_wi > vm.COS_EPS) & (cos_wo > vm.COS_EPS)
    alpha = jnp.maximum(vm.dot(vm.reflect(wi, normal_), wo), 1e-12)
    expo = mp.exponent
    weight = jnp.power(alpha, expo) * vm.INV_TWO_PI
    spec_ok = (mp.ks_weight > 0.0) & (weight > 1e-10)
    contrib = jnp.where(spec_ok[..., None],
                        mp.ks * ((expo + 2.0) * weight)[..., None], 0.0)
    pdf = jnp.where(spec_ok, mp.ks_weight * (expo + 1.0) * weight, 0.0)
    rev_pdf = pdf
    diff = mp.ks_weight < 1.0
    pdf += jnp.where(diff, (1.0 - mp.ks_weight) * cos_wo * vm.INV_PI, 0.0)
    rev_pdf += jnp.where(diff, (1.0 - mp.ks_weight) * cos_wi * vm.INV_PI, 0.0)
    contrib += jnp.where(diff[..., None], mp.kd * vm.INV_PI, 0.0)
    contrib = contrib * cos_wo[..., None]
    small = jnp.max(contrib, -1) < 1e-10
    contrib = jnp.where((ok & ~small)[..., None], contrib, 0.0)
    pdf = jnp.where(ok, pdf, 0.0)
    rev_pdf = jnp.where(ok, rev_pdf, 0.0)
    return contrib, cos_wo, pdf, rev_pdf


def _eval_rough_dielectric(mp, wi, normal, wo, adjoint):
    """reference roughdielectric.cpp:22-122."""
    cos_wi = vm.dot(wi, normal)
    cos_wo = vm.dot(wo, normal)
    ok = (jnp.abs(cos_wi) >= vm.COS_EPS) & (jnp.abs(cos_wo) >= vm.COS_EPS)
    reflect = cos_wi * cos_wo > 0.0
    eta_ = jnp.where(cos_wi > 0.0, mp.eta, mp.inv_eta)
    rev_eta = jnp.where(cos_wo > 0.0, mp.eta, mp.inv_eta)
    h = jnp.where(reflect[..., None], wi + wo, wi + wo * eta_[..., None])
    h = vm.normalize(h)
    h = jnp.where(vm.dot(h, normal)[..., None] < 0.0, -h, h)

    cos_h_wi = vm.dot(wi, h)
    cos_h_wo = vm.dot(wo, h)
    ok &= (jnp.abs(cos_h_wi) >= vm.COS_EPS) & (jnp.abs(cos_h_wo) >= vm.COS_EPS)
    ok &= (cos_h_wi * cos_wi > 0.0) & (cos_h_wo * cos_wo > 0.0)

    b0, b1 = vm.coordinate_system(normal)
    local_h = jnp.stack([vm.dot(b0, h), vm.dot(b1, h), vm.dot(normal, h)], -1)
    alp = mp.alpha
    d = beckmann_d(local_h, alp)
    ok &= d > 0.0

    rev_cos_h_wi = cos_h_wo
    rev_cos_h_wo = cos_h_wi
    f, _ = fresnel_dielectric_ext(cos_h_wi, mp.eta, mp.inv_eta)
    a_cos_wi = jnp.abs(cos_wi)
    a_cos_wo = jnp.abs(cos_wo)
    g = beckmann_g(alp, a_cos_wi, a_cos_wo)
    # sqrt has an infinite slope at 0: clamp so masked-out lanes with
    # grazing/degenerate cosines cannot poison the reverse pass
    scaled_alpha = alp * (1.2 - 0.2 * jnp.sqrt(jnp.maximum(a_cos_wi, 1e-6)))
    prob = local_h[..., 2] * beckmann_d(local_h, scaled_alpha)
    ok &= prob >= 1e-12
    rev_scaled_alpha = alp * (1.2 - 0.2 * jnp.sqrt(jnp.maximum(a_cos_wo, 1e-6)))
    rev_prob = local_h[..., 2] * beckmann_d(local_h, rev_scaled_alpha)

    safe_cos_wi = vm.clamp_abs(cos_wi)
    # reflection branch
    scalar_r = jnp.abs(f * d * g / (4.0 * safe_cos_wi))
    contrib_r = mp.ks * scalar_r[..., None]
    pdf_r = jnp.abs(prob * f / (4.0 * vm.clamp_abs(cos_h_wo)))
    rev_pdf_r = jnp.abs(rev_prob * f
                        / (4.0 * vm.clamp_abs(rev_cos_h_wo)))
    # refraction branch
    sqrt_denom = cos_h_wi + eta_ * cos_h_wo
    rev_sqrt_denom = rev_cos_h_wi + rev_eta * rev_cos_h_wo
    factor = jnp.where(adjoint, 1.0, jnp.square(1.0 / eta_))
    safe_sq = jnp.where(sqrt_denom == 0.0, 1.0, jnp.square(sqrt_denom))
    scalar_t = jnp.abs(factor * ((1.0 - f) * d * g * jnp.square(eta_)
                                 * cos_h_wi * cos_h_wo)
                       / (safe_cos_wi * safe_sq))
    contrib_t = mp.kd * scalar_t[..., None]
    pdf_t = jnp.abs(prob * (1.0 - f) * (jnp.square(eta_) * cos_h_wo) / safe_sq)
    safe_rsq = jnp.where(rev_sqrt_denom == 0.0, 1.0, jnp.square(rev_sqrt_denom))
    rev_pdf_t = jnp.abs(rev_prob * (1.0 - f)
                        * (jnp.square(rev_eta) * rev_cos_h_wo) / safe_rsq)

    contrib = jnp.where(reflect[..., None], contrib_r, contrib_t)
    pdf = jnp.where(reflect, pdf_r, pdf_t)
    rev_pdf = jnp.where(reflect, rev_pdf_r, rev_pdf_t)
    contrib = jnp.where(ok[..., None], contrib, 0.0)
    return (contrib, cos_wo, jnp.where(ok, pdf, 0.0), jnp.where(ok, rev_pdf, 0.0))


def evaluate(mp: MatParams, wi, normal, wo, adjoint=False):
    """Dispatching evaluate: returns (contrib, cos_wo, pdf, rev_pdf).

    contrib already includes |cos wo| (reference convention)."""
    cl, cwl, pl, rl = _eval_lambertian(mp, wi, normal, wo)
    cp, cwp, pp, rp = _eval_phong(mp, wi, normal, wo)
    cr, cwr, pr, rr = _eval_rough_dielectric(mp, wi, normal, wo, adjoint)
    t = mp.mat_type

    def sel(a, b, c):
        return jnp.where((t == BSDF_LAMBERTIAN)[..., None] if a.ndim > t.ndim
                         else (t == BSDF_LAMBERTIAN), a,
                         jnp.where((t == BSDF_PHONG)[..., None] if a.ndim > t.ndim
                                   else (t == BSDF_PHONG), b, c))

    return (sel(cl, cp, cr), sel(cwl, cwp, cwr), sel(pl, pp, pr),
            sel(rl, rp, rr))


# ---------------------------------------------------------------------------
# sample: (wo, contrib=f/pdf incl cos, cos_wo, pdf, rev_pdf, valid)
# ---------------------------------------------------------------------------

def _sample_lambertian(mp, wi, normal, u, u_disc):
    """reference lambertian.cpp:59-93."""
    cos_wi_raw = vm.dot(wi, normal)
    valid = jnp.abs(cos_wi_raw) >= vm.COS_EPS
    neg = cos_wi_raw < 0.0
    valid &= (~neg) | mp.twosided
    normal_ = jnp.where((mp.twosided & neg)[..., None], -normal, normal)
    cos_wi = jnp.abs(cos_wi_raw)
    local = vm.sample_cos_hemisphere(u)
    wo = vm.local_to_world(local, normal_)
    cos_wo = local[..., 2]
    pdf = cos_wo * vm.INV_PI
    valid &= cos_wo >= vm.COS_EPS
    rev_pdf = cos_wi * vm.INV_PI
    contrib = mp.kd
    return wo, contrib, cos_wo, pdf, rev_pdf, valid


def _sample_phong(mp, wi, normal, u, u_disc):
    """reference phong.cpp:67-153. Note rndParam[0] doubles as the lobe
    selector and (rescaled) the phi coordinate."""
    cos_wi_raw = vm.dot(wi, normal)
    valid = jnp.abs(cos_wi_raw) >= vm.COS_EPS
    neg = cos_wi_raw < 0.0
    valid &= (~neg) | mp.twosided
    normal_ = jnp.where((mp.twosided & neg)[..., None], -normal, normal)
    cos_wi = jnp.abs(cos_wi_raw)

    expo = mp.exponent
    r = vm.reflect(wi, normal_)
    u0 = u[..., 0]
    spec = u0 <= mp.ks_weight
    g = jnp.where(spec, expo, 1.0)
    n_axis = jnp.where(spec[..., None], r, normal_)
    rnd0 = jnp.where(spec,
                     u0 / (mp.ks_weight + 1e-10),
                     (u0 - mp.ks_weight) / (1.0 - mp.ks_weight + 1e-10))
    power = 1.0 / (g + 1.0)
    cos_alpha = jnp.power(jnp.maximum(u[..., 1], 1e-10), power)
    sin_alpha = jnp.sqrt(jnp.maximum(1.0 - jnp.square(cos_alpha), 0.0))
    phi = vm.TWO_PI * rnd0
    local_dir = jnp.stack([sin_alpha * jnp.cos(phi), sin_alpha * jnp.sin(phi),
                           cos_alpha], -1)
    wo = vm.local_to_world(local_dir, n_axis)
    cos_wo = vm.dot(normal_, wo)
    valid &= cos_wo >= vm.COS_EPS

    alpha_spec = jnp.maximum(vm.dot(r, wo), 1e-12)
    weight = jnp.power(alpha_spec, expo) * vm.INV_TWO_PI
    spec_ok = (mp.ks_weight > 0.0) & (weight > 1e-10)
    contrib = jnp.where(spec_ok[..., None],
                        mp.ks * ((expo + 2.0) * weight)[..., None], 0.0)
    pdf = jnp.where(spec_ok, mp.ks_weight * (expo + 1.0) * weight, 0.0)
    rev_pdf = pdf
    diff = mp.ks_weight < 1.0
    contrib += jnp.where(diff[..., None], mp.kd * vm.INV_PI, 0.0)
    pdf += jnp.where(diff, (1.0 - mp.ks_weight) * cos_wo * vm.INV_PI, 0.0)
    rev_pdf += jnp.where(diff, (1.0 - mp.ks_weight) * cos_wi * vm.INV_PI, 0.0)
    contrib = contrib * cos_wo[..., None]
    valid &= pdf >= 1e-10
    contrib = contrib / jnp.maximum(pdf, 1e-10)[..., None]
    return wo, contrib, cos_wo, pdf, rev_pdf, valid


def _sample_rough_dielectric(mp, wi, normal, u, u_disc, adjoint):
    """reference roughdielectric.cpp:146-302 (#if-0 branch excluded)."""
    cos_wi = vm.dot(wi, normal)
    valid = jnp.abs(cos_wi) >= vm.COS_EPS
    alp = mp.alpha
    scaled_alp = alp * (1.2 - 0.2 * jnp.sqrt(jnp.maximum(jnp.abs(cos_wi), 1e-6)))
    local_h, m_pdf = sample_micronormal(u, scaled_alp)
    h = vm.local_to_world(local_h, normal)
    cos_h_wi = vm.dot(wi, h)
    valid &= jnp.abs(cos_h_wi) >= vm.COS_EPS
    f, cos_theta_t = fresnel_dielectric_ext(cos_h_wi, mp.eta, mp.inv_eta)
    do_reflect = u_disc <= f

    # --- reflection branch ---
    wo_r = vm.reflect(wi, h)
    ok_r = (f > 0.0) & (vm.dot(normal, wo_r) * vm.dot(normal, wi) > 0.0)
    cos_h_wo_r = vm.dot(wo_r, h)
    pdf_r = jnp.abs(m_pdf * f / (4.0 * vm.clamp_abs(cos_h_wo_r)))
    cos_wo_r = vm.dot(wo_r, normal)
    ok_r &= jnp.abs(cos_wo_r) >= vm.COS_EPS
    rev_scaled_r = alp * (1.2 - 0.2 * jnp.sqrt(jnp.maximum(jnp.abs(cos_wo_r), 1e-6)))
    rev_d_r = beckmann_d(local_h, rev_scaled_r)
    rev_pdf_r = jnp.abs(f * rev_d_r * local_h[..., 2]
                        / (4.0 * vm.clamp_abs(cos_h_wi)))
    refl_r = mp.ks

    # --- refraction branch ---
    wo_t = vm.refract(wi, h, cos_theta_t, mp.eta, mp.inv_eta)
    ok_t = (f < 1.0) & (cos_theta_t != 0.0) \
        & (vm.dot(normal, wo_t) * vm.dot(normal, wi) < 0.0)
    eta_ = jnp.where(cos_wi > 0.0, mp.eta, mp.inv_eta)
    factor = jnp.where(adjoint, 1.0, jnp.square(1.0 / eta_))
    refl_t = mp.kd * factor[..., None]
    cos_h_wo_t = vm.dot(wo_t, h)
    sqrt_denom = cos_h_wi + eta_ * cos_h_wo_t
    safe_sq = jnp.where(sqrt_denom == 0.0, 1.0, jnp.square(sqrt_denom))
    dwh_dwo = (jnp.square(eta_) * cos_h_wo_t) / safe_sq
    pdf_t = jnp.abs(m_pdf * (1.0 - f) * jnp.abs(dwh_dwo))
    cos_wo_t = vm.dot(wo_t, normal)
    ok_t &= jnp.abs(cos_wo_t) >= vm.COS_EPS
    rev_eta = jnp.where(cos_wo_t > 0.0, mp.eta, mp.inv_eta)
    rev_sqrt_denom = cos_h_wo_t + rev_eta * cos_h_wi
    safe_rsq = jnp.where(rev_sqrt_denom == 0.0, 1.0, jnp.square(rev_sqrt_denom))
    rev_dwh_dwo = (jnp.square(rev_eta) * cos_h_wi) / safe_rsq
    rev_scaled_t = alp * (1.2 - 0.2 * jnp.sqrt(jnp.maximum(jnp.abs(cos_wo_t), 1e-6)))
    rev_d_t = beckmann_d(local_h, rev_scaled_t)
    rev_pdf_t = jnp.abs((1.0 - f) * rev_d_t * local_h[..., 2] * rev_dwh_dwo)

    wo = jnp.where(do_reflect[..., None], wo_r, wo_t)
    refl = jnp.where(do_reflect[..., None], refl_r, refl_t)
    pdf = jnp.where(do_reflect, pdf_r, pdf_t)
    rev_pdf = jnp.where(do_reflect, rev_pdf_r, rev_pdf_t)
    cos_wo = jnp.where(do_reflect, cos_wo_r, cos_wo_t)
    cos_h_wo = jnp.where(do_reflect, cos_h_wo_r, cos_h_wo_t)
    valid &= jnp.where(do_reflect, ok_r, ok_t)
    valid &= jnp.abs(cos_h_wo) >= vm.COS_EPS
    valid &= pdf >= 1e-12
    valid &= (cos_h_wi * cos_wi > 0.0) & (cos_h_wo * cos_wo > 0.0)

    d = beckmann_d(local_h, alp)
    g = beckmann_g(alp, jnp.abs(cos_wi), jnp.abs(cos_wo))
    numerator = d * g * cos_h_wi
    denominator = m_pdf * jnp.abs(cos_wi)
    contrib = refl * jnp.abs(numerator
                             / vm.clamp_abs(denominator))[..., None]
    return wo, contrib, cos_wo, pdf, rev_pdf, valid


def sample(mp: MatParams, wi, normal, u, u_disc, adjoint=False):
    """Dispatching sample (reference BSDF::Sample / SampleAdjoint).

    Returns (wo, contrib = f/pdf incl cos, cos_wo, pdf, rev_pdf, valid)."""
    sl = _sample_lambertian(mp, wi, normal, u, u_disc)
    sp = _sample_phong(mp, wi, normal, u, u_disc)
    sr = _sample_rough_dielectric(mp, wi, normal, u, u_disc, adjoint)
    t = mp.mat_type

    def sel(a, b, c):
        tl = (t == BSDF_LAMBERTIAN)
        tp = (t == BSDF_PHONG)
        if a.ndim > t.ndim:
            tl, tp = tl[..., None], tp[..., None]
        return jnp.where(tl, a, jnp.where(tp, b, c))

    return tuple(sel(a, b, c) for a, b, c in zip(sl, sp, sr))
