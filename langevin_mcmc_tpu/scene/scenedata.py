"""Device-resident scene: SoA arrays over all triangles / materials / lights.

The reference keeps a pointer-rich object graph (Shape*/BSDF*/Light* with
virtual dispatch, reference src/scene.h) and a per-path "serialize to flat
buffer" step for its codegen autodiff. TPU-native design: the whole scene
IS the flat buffer — one struct-of-arrays pytree in HBM, indexed by integer
ids inside jit, so any wavefront of paths can gather what it needs without
host round-trips, and the same arrays serve sampling and autodiff.
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera
from .textures import TexturePack
from ..options import Options

# material type tags (reference src/bsdf.h:6 BSDFType)
BSDF_LAMBERTIAN = 0
BSDF_PHONG = 1
BSDF_ROUGH_DIELECTRIC = 2

# light type tags (reference src/light.h:7 LightType)
LIGHT_POINT = 0
LIGHT_AREA = 1
LIGHT_ENV = 2


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    meta = [f.name for f in dataclasses.fields(cls)
            if f.metadata.get('static', False)]
    data = [f for f in fields if f not in meta]
    return jax.tree_util.register_dataclass(cls, data_fields=data,
                                            meta_fields=meta)


def static_field(**kw):
    return dataclasses.field(metadata={'static': True}, **kw)


@_register
@dataclasses.dataclass(frozen=True)
class SceneData:
    # --- geometry: every triangle of every shape, concatenated ---
    tri_p: jnp.ndarray        # [2, T, 3, 3] vertex positions (2 keyframes)
    tri_n: jnp.ndarray        # [2, T, 3, 3] vertex shading normals
    tri_st: jnp.ndarray       # [T, 3, 2] texture coords
    tri_mat: jnp.ndarray      # [T] int32 material index
    tri_shape: jnp.ndarray    # [T] int32 shape index
    tri_light: jnp.ndarray    # [T] int32 area-light index, -1 if none

    # --- materials ---
    mat_type: jnp.ndarray     # [M] int32
    mat_twosided: jnp.ndarray  # [M] bool
    mat_kd: jnp.ndarray       # [M,3]  (Kt for roughdielectric)
    mat_kd_tex: jnp.ndarray   # [M] int32 texture id or -1
    mat_ks: jnp.ndarray       # [M,3]
    mat_ks_tex: jnp.ndarray   # [M] int32
    mat_exponent: jnp.ndarray   # [M]
    mat_exponent_tex: jnp.ndarray  # [M] int32
    mat_ks_weight: jnp.ndarray  # [M] (phong lobe pick prob, phong.cpp:159-169)
    mat_eta: jnp.ndarray      # [M]
    mat_inv_eta: jnp.ndarray  # [M]
    mat_alpha: jnp.ndarray    # [M]
    mat_alpha_tex: jnp.ndarray  # [M] int32

    # --- lights ---
    light_type: jnp.ndarray     # [L] int32
    light_weight: jnp.ndarray   # [L] sampling weights
    light_cdf: jnp.ndarray      # [L+1] pick CDF (PiecewiseConstant1D)
    light_pos: jnp.ndarray      # [L,3] point-light position
    light_emission: jnp.ndarray  # [L,3] point intensity / area radiance
    # area lights: padded per-light triangle table
    light_tri: jnp.ndarray      # [L, Amax] global tri ids (padded w/ 0)
    light_tri_cdf: jnp.ndarray  # [L, Amax+1] area CDF
    light_tri_pmf: jnp.ndarray  # [L, Amax] discrete pick pmf
    light_ntri: jnp.ndarray     # [L] int32 triangle counts
    light_inv_area: jnp.ndarray  # [L] 1/totalArea

    # --- environment light (at most one; env_exists static) ---
    env_image: jnp.ndarray      # [He, We, 3]
    env_neigh: jnp.ndarray      # [He, We, 12] packed 2x2 texel neighborhood
    env_rw2: jnp.ndarray        # [He+2, 2] (rw0, rw1) indexed by row+1
    env_cdf_rows: jnp.ndarray   # [He+1]
    env_cdf_cols: jnp.ndarray   # [He, We+1]
    env_row_weights: jnp.ndarray  # [He]
    env_normalization: jnp.ndarray  # []
    env_pixel_size: jnp.ndarray     # [2]
    env_to_world_t: jnp.ndarray  # [2,3]
    env_to_world_q: jnp.ndarray  # [2,4]
    env_to_light_t: jnp.ndarray  # [2,3]
    env_to_light_q: jnp.ndarray  # [2,4]

    # --- scene bounding sphere (radius x1000, reference scene.cpp:39-40) ---
    bsphere_center: jnp.ndarray  # [3]
    bsphere_radius: jnp.ndarray  # []

    camera: Camera
    textures: TexturePack

    # --- BVH (filled by ops.bvh.attach_bvh; zeros => brute force) ---
    bvh_nodes: jnp.ndarray       # [N, 8] flattened nodes (see ops/bvh.py)
    bvh_prim_ids: jnp.ndarray    # [T] leaf-order triangle permutation

    # --- MXU intersection tables (ops/intersect.py build_matmul_tables) ---
    isect_B: jnp.ndarray         # [3, 3T] per-triangle inverse frames
    isect_C: jnp.ndarray         # [3T]
    isect_ok: jnp.ndarray        # [T] non-degenerate mask

    # --- static metadata ---
    env_light_id: int = static_field(default=-1)
    num_tris: int = static_field(default=0)
    num_lights: int = static_field(default=0)
    width: int = static_field(default=0)
    height: int = static_field(default=0)
    has_motion: bool = static_field(default=False)
    use_bvh: bool = static_field(default=False)

    @property
    def light_weight_sum(self):
        return jnp.sum(self.light_weight)


jax.tree_util.register_dataclass(
    Camera,
    data_fields=['sample_to_cam', 'cam_to_sample', 'c2w_trans', 'c2w_quat',
                 'w2c_trans', 'w2c_quat'],
    meta_fields=['near_clip', 'far_clip', 'dist', 'width', 'height'])

jax.tree_util.register_dataclass(
    TexturePack,
    data_fields=['data', 'neigh', 'size', 'gamma', 'uvscale'],
    # offset is host-side layout metadata (np or None), never traced
    meta_fields=['offset'])


def build_env_sample_info(img):
    """Row/col CDF tables for envmap importance sampling
    (reference src/envlight.cpp:24-71)."""
    img = np.asarray(img, np.float64)
    h, w = img.shape[:2]
    lum = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
           + 0.072169 * img[..., 2])
    col_sum = lum.sum(1)                              # [h]
    cdf_cols = np.zeros((h, w + 1))
    np.cumsum(lum, 1, out=cdf_cols[:, 1:])
    safe = np.where(col_sum > 0, col_sum, 1.0)
    cdf_cols /= safe[:, None]
    cdf_cols[:, -1] = 1.0
    row_weights = np.sin((np.arange(h) + 0.5) * np.pi / h)
    weighted = col_sum * row_weights
    row_sum = weighted.sum()
    cdf_rows = np.zeros(h + 1)
    np.cumsum(weighted, out=cdf_rows[1:])
    cdf_rows /= row_sum
    cdf_rows[-1] = 1.0
    normalization = 1.0 / (row_sum * (2.0 * np.pi / w) * (np.pi / h))
    pixel_size = np.array([2.0 * np.pi / w, np.pi / h])
    return (cdf_rows.astype(np.float32), cdf_cols.astype(np.float32),
            row_weights.astype(np.float32), np.float32(normalization),
            pixel_size.astype(np.float32))


def _env_neighborhoods(img):
    """[H, W, 12] of (v00, v10, v01, v11) with periodic wrap — env bilinear
    lookups become ONE per-lane gather (TPU gather cost is ~per-index; see
    textures._pack_neighborhoods)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    xr = (np.arange(w) + 1) % w
    yr = (np.arange(h) + 1) % h
    return np.concatenate([img, img[:, xr], img[yr], img[yr][:, xr]], -1)


def _env_rw_pairs(row_w):
    """[H+2, 2] of (rw[clip(row)], rw[clip(row+1)]) indexed by row+1 —
    reproduces env_emission's CLIP (not wrap) row-weight indexing for
    row in [-1, H]."""
    row_w = np.asarray(row_w, np.float32)
    h = row_w.shape[0]
    rows = np.arange(-1, h + 1)
    rw0 = row_w[np.clip(rows, 0, h - 1)]
    rw1 = row_w[np.clip(rows + 1, 0, h - 1)]
    return np.stack([rw0, rw1], -1)
