"""Textures as device arrays.

Replaces the reference's OIIO TextureSystem (reference src/bitmaptexture.h,
src/texturesystem.cpp): all bitmap textures are padded into one
[Ntex, Hmax, Wmax, 3] atlas so a single gather-based bilinear lookup serves
every material, fully vectorized and differentiable. 8-bit sources get the
same post-interpolation gamma-2.2 decode (bitmaptexture.h:92-97).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..utils import image_io


@dataclasses.dataclass(frozen=True)
class TexturePack:
    """Device-side atlas of all bitmap textures in a scene."""
    data: jnp.ndarray      # [N, Hmax, Wmax, 3] raw values (pre-gamma)
    size: jnp.ndarray      # [N, 2] (h, w) int32
    gamma: jnp.ndarray     # [N]
    uvscale: jnp.ndarray   # [N, 2]

    @property
    def count(self):
        return self.data.shape[0]


class TextureBuilder:
    """Host-side accumulation of scene textures into a TexturePack."""

    def __init__(self):
        self.images = []
        self.gammas = []
        self.uvscales = []
        self.avgs = []
        self._cache = {}

    def add_bitmap(self, filename, uvscale=(1.0, 1.0)):
        key = (str(filename), tuple(uvscale))
        if key in self._cache:
            return self._cache[key]
        p = str(filename)
        is_ldr = not p.lower().endswith(('.exr', '.hdr', '.pfm'))
        # store raw (no gamma); decode applied after bilinear interpolation,
        # matching reference bitmaptexture.h Eval
        raw = image_io.read_image(p, gamma_decode=False)
        gamma = 2.2 if is_ldr else 1.0
        tid = len(self.images)
        self.images.append(raw)
        self.gammas.append(gamma)
        self.uvscales.append(tuple(uvscale))
        self.avgs.append(np.mean(raw.reshape(-1, 3) ** gamma, 0))
        self._cache[key] = tid
        return tid

    def avg(self, tid):
        return self.avgs[tid]

    def build(self):
        if not self.images:
            # single dummy texture so shapes stay static
            self.images = [np.zeros((1, 1, 3), np.float32)]
            self.gammas = [1.0]
            self.uvscales = [(1.0, 1.0)]
        hmax = max(im.shape[0] for im in self.images)
        wmax = max(im.shape[1] for im in self.images)
        data = np.zeros((len(self.images), hmax, wmax, 3), np.float32)
        size = np.zeros((len(self.images), 2), np.int32)
        for i, im in enumerate(self.images):
            data[i, :im.shape[0], :im.shape[1]] = im
            size[i] = im.shape[:2]
        return TexturePack(
            data=jnp.asarray(data),
            size=jnp.asarray(size),
            gamma=jnp.asarray(np.asarray(self.gammas, np.float32)),
            uvscale=jnp.asarray(np.asarray(self.uvscales, np.float32)))


def eval_texture(pack: TexturePack, tex_id, st):
    """Bilinear periodic lookup; tex_id [...] int32, st [...,2] -> [...,3].

    tex_id < 0 returns 1.0 (caller multiplies by the constant value).
    OIIO-equivalent: texel centers at (i+0.5), finest mip, periodic wrap,
    then pow(gamma) on the interpolated value (bitmaptexture.h:73-98).
    """
    tid = jnp.maximum(tex_id, 0)
    h = pack.size[tid, 0].astype(jnp.float32)
    w = pack.size[tid, 1].astype(jnp.float32)
    uv = pack.uvscale[tid]
    s = st[..., 0] * uv[..., 0]
    t = st[..., 1] * uv[..., 1]
    x = s * w - 0.5
    y = t * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    wi = pack.size[tid, 1]
    hi = pack.size[tid, 0]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0i + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0i + 1, hi)
    d = pack.data
    v00 = d[tid, y0i, x0i]
    v10 = d[tid, y0i, x1i]
    v01 = d[tid, y1i, x0i]
    v11 = d[tid, y1i, x1i]
    val = (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
           + v01 * (1 - fx) * fy + v11 * fx * fy)
    g = pack.gamma[tid][..., None]
    val = jnp.power(jnp.maximum(val, 0.0), g)
    return jnp.where((tex_id < 0)[..., None], 1.0, val)
