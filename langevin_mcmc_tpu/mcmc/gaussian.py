"""Proposal Gaussians: isotropic, MALA-diagonal, H2MC-dense — batched.

Replaces reference src/gaussian.{h,cpp}, src/mala.cpp, src/h2mc.cpp with
fixed-dim padded arrays: every chain carries a max_dim-sized Gaussian; the
active dimension is a per-lane integer and padded dims are given identical
deterministic parameters on both sides of the Metropolis ratio, so their
log-pdf contributions cancel exactly (offsets in padded dims are ignored by
the PSS mapping).
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..utils import vecmath as vm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gaussian:
    """Batched proposal Gaussian (reference src/gaussian.h:9-19).

    Diagonal form uses cov_l_d/inv_cov_d; dense form cov_l/inv_cov.
    is_diagonal is a per-lane bool (both forms are stored; padded cheaply)."""
    mean: jnp.ndarray       # [..., dim]
    cov_l_d: jnp.ndarray    # [..., dim] diagonal sqrt-cov
    inv_cov_d: jnp.ndarray  # [..., dim]
    cov_l: jnp.ndarray      # [..., dim, dim] dense Cholesky-like factor
    inv_cov: jnp.ndarray    # [..., dim, dim]
    log_det: jnp.ndarray    # [...] log|invCov|
    is_diagonal: jnp.ndarray  # [...] bool


def isotropic_gaussian(batch_shape, dim, sigma, dense=True):
    """IsotropicGaussian (gaussian.cpp:4-22): diag(sigma).

    dense=False emits [*, 1, 1] placeholder dense factors: the MALA path
    never uses a dense Gaussian, and carrying [C, Dm, Dm] identity padding
    through the chain-state scan costs ~130 MB of HBM traffic per merge at
    16k chains. gaussian_log_pdf/gaussian_sample detect the placeholder
    statically by shape. Mixed Gaussians must agree on the flavor.

    sigma is cast to a strong float32: a weak-typed sigma propagates
    weak_type into ChainState.gaussian and forces a silent second XLA
    compile of the whole MLT step on the first state round-trip (a ~320 s
    stall on the tunneled TPU)."""
    ddim = dim if dense else 1
    eye = jnp.broadcast_to(jnp.eye(ddim), batch_shape + (ddim, ddim))
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32),
                             batch_shape)[..., None]
    inv_sq = 1.0 / jnp.square(sigma)
    return Gaussian(
        mean=jnp.zeros(batch_shape + (dim,)),
        cov_l_d=jnp.broadcast_to(sigma, batch_shape + (dim,)),
        inv_cov_d=jnp.broadcast_to(inv_sq, batch_shape + (dim,)),
        cov_l=eye * sigma[..., None],
        inv_cov=eye * inv_sq[..., None],
        log_det=jnp.log(inv_sq[..., 0]) * dim,
        is_diagonal=jnp.zeros(batch_shape, bool) if dense
        else jnp.ones(batch_shape, bool))


def gaussian_log_pdf(offset, g: Gaussian):
    """GaussianLogPdf (gaussian.cpp:24-36); padded dims contribute equally on
    both sides of the MH ratio by construction."""
    d = offset - g.mean
    dim = offset.shape[-1]
    log_pdf = dim * (-0.9189385332046727) + 0.5 * g.log_det
    quad_diag = jnp.sum(d * g.inv_cov_d * d, -1)
    if g.inv_cov.shape[-1] != dim:      # diagonal-only placeholder
        return log_pdf - 0.5 * quad_diag
    quad_dense = jnp.einsum('...i,...ij,...j->...', d, g.inv_cov, d)
    quad = jnp.where(g.is_diagonal, quad_diag, quad_dense)
    return log_pdf - 0.5 * quad


def gaussian_sample(key, g: Gaussian):
    """GenerateSample (gaussian.cpp:38-55): x = covL z + mean."""
    z = jax.random.normal(key, g.mean.shape)
    x_diag = g.cov_l_d * z + g.mean
    if g.cov_l.shape[-1] != g.mean.shape[-1]:   # diagonal-only placeholder
        return x_diag
    x_dense = jnp.einsum('...ij,...j->...i', g.cov_l, z) + g.mean
    return jnp.where(g.is_diagonal[..., None], x_diag, x_dense)


def mala_gaussian(v1, v2, ss, shk, M, sc, opts):
    """MALA preconditioned drift proposal (reference mala.cpp:7-52).

    v1/v2: [..., dim] moment EMAs; ss: stepsize [...] or scalar; shk: shrink
    prior sigma; M: diagonal preconditioner [..., dim]; sc: current ssScore
    [...] (zero-score lanes fall back to isotropic shk).
    """
    dim = v1.shape[-1]
    shrk = 1.0 / (shk * shk)
    cov_t = jnp.square(jnp.asarray(ss))[..., None] * (M + 1.0)
    inv_cov = 1.0 / jnp.maximum(cov_t, 1e-12) + shrk
    cov = 1.0 / inv_cov
    mean = jnp.clip(v1, opts.mtm_min, opts.mtm_max) * cov / 2.0
    log_det = jnp.sum(jnp.log(inv_cov), -1)

    # zero-score fallback (mala.cpp:21-35)
    zero = jnp.asarray(sc) <= 1e-10
    inv_cov = jnp.where(zero[..., None], shrk, inv_cov)
    cov_l_d = jnp.where(zero[..., None], shk, jnp.sqrt(cov))
    mean = jnp.where(zero[..., None], 0.0, mean)
    log_det = jnp.where(zero, dim * jnp.log(jnp.asarray(shrk)), log_det)

    batch = v1.shape[:-1]
    eye = jnp.broadcast_to(jnp.eye(1), batch + (1, 1))
    return Gaussian(
        mean=mean, cov_l_d=cov_l_d, inv_cov_d=inv_cov,
        cov_l=eye, inv_cov=eye, log_det=log_det,
        is_diagonal=jnp.ones(batch, bool))


def h2mc_gaussian(grad, hess, sigma, sc, L=vm.PI / 2.0):
    """H2MC anisotropic Gaussian from grad + Hessian of log-luminance
    (reference h2mc.cpp:3-142 incl. the H2MCParam factors h2mc.h:9-23).

    grad [..., dim], hess [..., dim, dim], sigma scalar, sc ssScore [...].
    Falls back to isotropic when sc ~ 0 or ||H|| < 0.5/sigmaMax^2
    (h2mc.cpp:85-92).
    """
    import numpy as np
    dim = grad.shape[-1]
    batch = grad.shape[:-1]
    pos_scale = 0.25 * (np.exp(L) - np.exp(-L)) ** 2
    pos_offset = 0.5 * (np.exp(L) + np.exp(-L) - 1.0)
    neg_scale = np.sin(L) ** 2
    neg_offset = -(np.cos(L) - 1.0)

    inv_sigma_sq = 1.0 / (sigma * sigma)
    eigval, eigvec = jnp.linalg.eigh(hess)
    abs_ev = jnp.abs(eigval)
    nonzero = abs_ev > 1e-10
    eigen_buff = jnp.where(nonzero, 1.0 / jnp.maximum(abs_ev, 1e-10), 0.0)
    offset_buff = eigen_buff * jnp.einsum('...ji,...j->...i', eigvec, grad)

    s2 = jnp.where(nonzero,
                   jnp.where(eigval > 0.0, pos_scale, neg_scale),
                   L * L)
    o = jnp.where(nonzero,
                  offset_buff * jnp.where(eigval > 0.0, pos_offset, neg_offset),
                  0.5 * offset_buff * L * L)
    eigen_buff = eigen_buff * s2
    eigen_buff = jnp.where(eigen_buff > 1e-10,
                           1.0 / jnp.maximum(eigen_buff, 1e-12), 0.0)
    post = eigen_buff + inv_sigma_sq

    inv_cov = jnp.einsum('...ik,...k,...jk->...ij', eigvec, post, eigvec)
    mean = jnp.einsum('...ik,...k->...i', eigvec,
                      (eigen_buff / post) * o)
    cov_l = eigvec * jax.lax.rsqrt(jnp.maximum(post, 1e-20))[..., None, :]
    log_det = jnp.sum(jnp.log(jnp.maximum(post, 1e-30)), -1)

    # isotropic fallback (h2mc.cpp:85-92)
    hess_norm = jnp.sqrt(jnp.sum(jnp.square(hess), (-1, -2)))
    fallback = (jnp.asarray(sc) <= 1e-15) | (hess_norm < 0.5 * inv_sigma_sq)
    iso = isotropic_gaussian(batch, dim, sigma)
    fb = fallback[..., None]
    fbm = fallback[..., None, None]
    return Gaussian(
        mean=jnp.where(fb, iso.mean, mean),
        cov_l_d=iso.cov_l_d,
        inv_cov_d=iso.inv_cov_d,
        cov_l=jnp.where(fbm, iso.cov_l, cov_l),
        inv_cov=jnp.where(fbm, iso.inv_cov, inv_cov),
        log_det=jnp.where(fallback, iso.log_det, log_det),
        is_diagonal=jnp.zeros(batch, bool))
