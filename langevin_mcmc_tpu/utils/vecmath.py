"""Vector math on trailing-axis-3 JAX arrays.

Single implementation serves both the concrete sampling path and the
differentiable replay (the reference keeps two copies of everything: a
``Float`` version and an ``ADFloat`` chad-expression twin, e.g.
reference src/utils.h, src/sampling.h — with jax.grad one suffices).

All functions broadcast over leading batch axes; vectors live on the last
axis. Default dtype is float32 (reference builds with -DSINGLE_PRECISION,
src/Tupfile:17).
"""

import jax
import jax.numpy as jnp

# Constants (reference src/commondef.h:52-83)
PI = 3.14159265358979323846
INV_PI = 1.0 / PI
TWO_PI = 2.0 * PI
INV_TWO_PI = 1.0 / TWO_PI
FOUR_PI = 4.0 * PI
INV_FOUR_PI = 1.0 / FOUR_PI
PI_OVER_TWO = 0.5 * PI
PI_OVER_FOUR = 0.25 * PI

ISECT_EPS = 5e-4      # c_IsectEpsilon (commondef.h:53)
SHADOW_EPS = 5e-4     # c_ShadowEpsilon (commondef.h:54)
COS_EPS = 1e-4        # c_CosEpsilon (commondef.h:60)
AD_EPS = 1e-6         # chad ADEpsilon used in sqrt guards
INF = jnp.inf


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def length_squared(v):
    return jnp.sum(v * v, axis=-1)


def length(v):
    return jnp.sqrt(jnp.maximum(length_squared(v), 1e-30))


def normalize(v):
    # rsqrt(max(.)) keeps gradients finite at v == 0 (the max clamp kills the
    # derivative instead of producing inf*0 = nan in untaken where-branches)
    ls = length_squared(v)
    return v * jax.lax.rsqrt(jnp.maximum(ls, 1e-18))[..., None]


def cross(a, b):
    return jnp.cross(a, b)


def distance_squared(a, b):
    return length_squared(a - b)


def luminance(rgb):
    """Reference src/utils.h Luminance: 0.212671 R + 0.715160 G + 0.072169 B."""
    return (0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1]
            + 0.072169 * rgb[..., 2])


def modulo(a, b):
    """Positive modulo, matches reference src/utils.h Modulo (wraps into [0,b))."""
    r = jnp.mod(a, b)
    return jnp.where(r < 0, r + b, r)


def tent(u):
    """Tent deformation of a uniform in [0,1) to [-1, 1]
    (reference src/utils.h:261-267). sqrt clamped away from 0 for grad."""
    return jnp.where(
        u < 0.5,
        1.0 - jnp.sqrt(jnp.maximum(2.0 * u, 1e-12)),
        jnp.sqrt(jnp.maximum(2.0 * (u - 0.5), 1e-12)) - 1.0,
    )


def coordinate_system(n):
    """Build an orthonormal basis (b0, b1) around unit normal n.

    Matches reference src/utils.h:222-232 (Duff et al. branchless frame with
    a guard at n.z == -1), expressed as a jnp.where select.
    """
    x, y, z = n[..., 0], n[..., 1], n[..., 2]
    degenerate = z < (-1.0 + 1e-6)
    a = 1.0 / jnp.where(degenerate, 1.0, 1.0 + z)
    b = -x * y * a
    b0 = jnp.stack([1.0 - x * x * a, b, -x], -1)
    b1 = jnp.stack([b, 1.0 - y * y * a, -y], -1)
    deg = degenerate[..., None]
    b0 = jnp.where(deg, jnp.array([0.0, -1.0, 0.0], n.dtype), b0)
    b1 = jnp.where(deg, jnp.array([-1.0, 0.0, 0.0], n.dtype), b1)
    return b0, b1


def reflect(wi, n):
    """Mirror reflection of wi about n (both pointing away from surface).

    Matches reference src/utils.h Reflect: 2*dot(wi,n)*n - wi.
    """
    return 2.0 * dot(wi, n)[..., None] * n - wi


def refract(wi, n, cos_theta_t, eta, inv_eta):
    """Refraction matching reference src/utils.h:203-210:
    eta_ = cosThetaT < 0 ? invEta : eta;
    n*(dot(wi,n)*eta_ + cosThetaT) - wi*eta_."""
    scale = jnp.where(cos_theta_t < 0.0, inv_eta, eta)
    return n * (dot(wi, n) * scale + cos_theta_t)[..., None] - wi * scale[..., None]


def sample_sphere(coord):
    """Uniform-ish spherical parameterization (reference src/sampling.h:6-16).

    Returns (dir, jacobian); jacobian = |sin(phi)| * 2*pi*pi.
    coord[...,0] is theta/2pi, coord[...,1] is phi/pi.
    """
    scaled_theta = TWO_PI * coord[..., 0]
    scaled_phi = PI * coord[..., 1]
    sin_phi = jnp.sin(scaled_phi)
    cos_phi = jnp.cos(scaled_phi)
    d = jnp.stack([sin_phi * jnp.cos(scaled_theta),
                   sin_phi * jnp.sin(scaled_theta),
                   cos_phi], -1)
    jacobian = jnp.abs(sin_phi) * TWO_PI * PI
    return d, jacobian


def patan2(y, x):
    """atan2 wrapped to [0, 2pi), with atan2(0,0)=0 (src/sampling.h:24-34).
    Origin remapped to (1,0) pre-atan2 so the gradient stays finite there."""
    origin = (y == 0.0) & (x == 0.0)
    x = jnp.where(origin, 1.0, x)
    r = jnp.arctan2(y, x)
    r = jnp.where(r < 0.0, r + TWO_PI, r)
    return jnp.where(origin, 0.0, r)


def to_spherical_coord(d):
    """Inverse of sample_sphere (src/sampling.h:36-43). Returns (uv, jacobian)."""
    theta = patan2(d[..., 1], d[..., 0]) * INV_TWO_PI
    phi = jnp.arccos(jnp.clip(d[..., 2], -1.0 + 1e-7, 1.0 - 1e-7))
    jacobian = jnp.abs(jnp.sin(phi)) * TWO_PI * PI
    return jnp.stack([theta, phi * INV_PI], -1), jacobian


def sample_cos_hemisphere(u):
    """Cosine-weighted local hemisphere direction (src/sampling.h:103-110)."""
    phi = TWO_PI * u[..., 0]
    tmp = jnp.sqrt(jnp.maximum(1.0 - u[..., 1], AD_EPS))
    z = jnp.sqrt(jnp.maximum(u[..., 1], AD_EPS))
    return jnp.stack([jnp.cos(phi) * tmp, jnp.sin(phi) * tmp, z], -1)


def sample_concentric_disc(u):
    """Concentric disc mapping (src/sampling.h:50-70)."""
    r1 = 2.0 * u[..., 0] - 1.0
    r2 = 2.0 * u[..., 1] - 1.0
    r1_sq_gt = jnp.square(r1) > jnp.square(r2)
    r = jnp.where(r1_sq_gt, r1, r2)
    safe_r1 = jnp.where(r1 == 0.0, 1.0, r1)
    safe_r2 = jnp.where(r2 == 0.0, 1.0, r2)
    phi = jnp.where(r1_sq_gt,
                    PI_OVER_FOUR * (r2 / safe_r1),
                    PI_OVER_TWO - (r1 / safe_r2) * PI_OVER_FOUR)
    zero = (r1 == 0.0) | (r2 == 0.0)
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], -1)


def local_to_world(local_dir, n):
    """Map a local-frame direction (z = n) to world space."""
    b0, b1 = coordinate_system(n)
    return (local_dir[..., 0:1] * b0 + local_dir[..., 1:2] * b1
            + local_dir[..., 2:3] * n)


def xform_point(m, p):
    """Apply a 4x4 homogeneous transform to points [..., 3]."""
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)
    out = jnp.einsum('ij,...j->...i', m, ph)
    return out[..., :3] / out[..., 3:4]


def xform_vector(m, v):
    return jnp.einsum('ij,...j->...i', m[:3, :3], v)


def xform_normal(m_inv, n):
    """Transform a normal by the inverse-transpose: n' = (M^-1)^T n."""
    return jnp.einsum('ji,...j->...i', m_inv[:3, :3], n)


def is_finite(x):
    return jnp.all(jnp.isfinite(x))


def mis_weight_power2(pdf_a, pdf_b):
    """Power-2 MIS weight of technique A vs B (reference src/path.cpp:23-27)."""
    ratio_sq = jnp.square(pdf_b / pdf_a)
    return 1.0 / (1.0 + ratio_sq)


def mis(pdf):
    """Power heuristic transform: MIS(p) = p^2 (reference src/path.cpp:29-32).

    |p| capped at 1e18 so the square (and its partial 2p) stays finite in
    f32 — distances to the x1000-inflated bounding sphere reach ~1e5-1e12
    and their squared-squared values would otherwise overflow; the MIS
    weight is fully saturated long before the cap matters."""
    return jnp.square(jnp.clip(pdf, -1e18, 1e18))


def clamp_abs(x, eps=1e-12):
    """Clamp |x| >= eps preserving sign; keeps 1/x and its derivative finite
    in f32 (1/eps^2 must stay below 3.4e38)."""
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def safe_div(a, b, eps=0.0):
    """a/b with b==0 mapped to 0 (used to keep masked lanes finite)."""
    safe_b = jnp.where(b == 0.0, 1.0, b)
    return jnp.where(b == 0.0, eps, a / safe_b)


def lerp(t, a, b):
    return (1.0 - t) * a + t * b
