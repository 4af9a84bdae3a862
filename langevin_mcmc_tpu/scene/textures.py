"""Textures as device arrays.

Replaces the reference's OIIO TextureSystem (reference src/bitmaptexture.h,
src/texturesystem.cpp): all bitmap textures are padded into one
[Ntex, Hmax, Wmax, 3] atlas so a single gather-based bilinear lookup serves
every material, fully vectorized and differentiable. 8-bit sources get the
same post-interpolation gamma-2.2 decode (bitmaptexture.h:92-97).
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..utils import image_io


@dataclasses.dataclass(frozen=True)
class TexturePack:
    """Device-side atlas of all bitmap textures in a scene.

    `neigh` pre-packs every texel's 2x2 bilinear neighborhood (with each
    texture's OWN periodic wrap baked in) into one 12-float row: TPU
    gather cost is ~per-INDEX (slice width is nearly free up to tens of
    elements — r5 trace: a 1-u32 gather cost the same ~0.25 ms/65536
    lanes as a 3-f32 one), so one neighborhood-row gather replaces the
    four per-corner gathers exactly, at 4x texel memory."""
    data: jnp.ndarray      # [N, Hmax, Wmax, 3] raw values (pre-gamma)
    neigh: jnp.ndarray     # [N, Hmax, Wmax, 12] (v00, v10, v01, v11), or
                           # [T, 12] flat rows when `offset` is not None
    size: jnp.ndarray      # [N, 2] (h, w) int32
    gamma: jnp.ndarray     # [N]
    uvscale: jnp.ndarray   # [N, 2]
    # Flat layout (big atlases): row t of texture i lives at
    # offset[i] + y*w_i + x. The padded [N, Hmax, Wmax, 12] layout wastes
    # up to ~4x memory on mixed-size texture sets, and a closed-over
    # atlas is embedded as a CONSTANT in every lowered program — the
    # veachdoor padded neigh (282 MB) overflows the remote-compile
    # relay's request cap (HTTP 413). None = padded layout (kept for
    # small atlases so existing compiled programs stay cache-valid).
    offset: tuple = None   # tuple of per-texture int row starts, or None

    @property
    def count(self):
        return self.data.shape[0]


def _pack_neighborhoods(data, size):
    """[N, H, W, 12] of (v00, v10, v01, v11) with per-texture wrap."""
    import numpy as np
    data = np.asarray(data)
    N, H, W, _ = data.shape
    out = np.zeros((N, H, W, 12), np.float32)
    for i in range(N):
        h, w = int(size[i][0]), int(size[i][1])
        im = data[i, :h, :w]
        xr = (np.arange(w) + 1) % w
        yr = (np.arange(h) + 1) % h
        out[i, :h, :w, 0:3] = im
        out[i, :h, :w, 3:6] = im[:, xr]
        out[i, :h, :w, 6:9] = im[yr]
        out[i, :h, :w, 9:12] = im[yr][:, xr]
    return out


# Padded neighborhood atlases above this size switch to the flat [T, 12]
# layout (no inter-texture padding; see TexturePack.offset). Threshold
# keeps small scenes (torus: one dummy texture) on the padded layout so
# their already-compiled programs stay persistent-cache-valid.
FLAT_ATLAS_BYTES = int(os.environ.get('LMC_TEX_FLAT_BYTES',
                                      str(32 * 1024 * 1024)))


def _flatten_neigh(neigh_padded, size):
    """[N, Hmax, Wmax, 12] -> ([T, 12], offsets tuple)."""
    import numpy as np
    rows = []
    offs = []
    t = 0
    for i in range(neigh_padded.shape[0]):
        h, w = int(size[i][0]), int(size[i][1])
        offs.append(t)
        rows.append(neigh_padded[i, :h, :w].reshape(h * w, 12))
        t += h * w
    return np.concatenate(rows, 0), tuple(offs)


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
        neigh = _pack_neighborhoods(data, size)
        offset = None
        if neigh.nbytes > FLAT_ATLAS_BYTES:
            neigh, offset = _flatten_neigh(neigh, size)
        return TexturePack(
            data=jnp.asarray(data),
            neigh=jnp.asarray(neigh),
            size=jnp.asarray(size),
            gamma=jnp.asarray(np.asarray(self.gammas, np.float32)),
            uvscale=jnp.asarray(np.asarray(self.uvscales, np.float32)),
            offset=offset)


_META_CACHE = {}


def _tex_meta(pack):
    """[N, 8] packed (h, w, gamma, us, vs): one row gather per lookup
    instead of five separate per-lane gathers (TPU gathers are ~an element
    per cycle)."""
    import numpy as np
    key = id(pack.data)
    if key in _META_CACHE:
        return _META_CACHE[key]
    size = np.asarray(pack.size)
    m = np.zeros((size.shape[0], 8), np.float32)
    m[:, 0:2] = size
    m[:, 2] = np.asarray(pack.gamma)
    m[:, 3:5] = np.asarray(pack.uvscale)
    if pack.offset is not None:
        # flat-layout row starts; f32 holds them exactly up to 2^24 rows
        # (the flat veachdoor atlas is 1.8M rows)
        m[:, 5] = np.asarray(pack.offset, np.float32)
    if len(_META_CACHE) > 4:
        _META_CACHE.clear()
    _META_CACHE[key] = m
    return m


def eval_texture(pack: TexturePack, tex_id, st):
    """Bilinear periodic lookup; tex_id [...] int32, st [...,2] -> [...,3].

    tex_id < 0 returns 1.0 (caller multiplies by the constant value).
    OIIO-equivalent: texel centers at (i+0.5), finest mip, periodic wrap,
    then pow(gamma) on the interpolated value (bitmaptexture.h:73-98).
    No minification filtering, matching the reference: its OIIO call
    passes zero derivatives (bitmaptexture.h:79-87), so the reference
    always samples the finest level bilinearly too.
    """
    tid = jnp.maximum(tex_id, 0)
    meta_np = _tex_meta(pack)
    if meta_np.shape[0] == 1:
        # single-texture scene: no per-lane meta gather
        meta = jnp.broadcast_to(jnp.asarray(meta_np)[0],
                                tid.shape + (8,))
    else:
        meta = jnp.asarray(meta_np)[tid]
    h = meta[..., 0]
    w = meta[..., 1]
    s = st[..., 0] * meta[..., 3]
    t = st[..., 1] * meta[..., 4]
    x = s * w - 0.5
    y = t * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    wi = jnp.maximum(w.astype(jnp.int32), 1)
    hi = jnp.maximum(h.astype(jnp.int32), 1)
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    # ONE gather of the pre-packed 2x2 neighborhood row (see TexturePack)
    if pack.offset is not None:
        nb = pack.neigh[meta[..., 5].astype(jnp.int32) + y0i * wi + x0i]
    else:
        nb = pack.neigh[tid, y0i, x0i]
    v00 = nb[..., 0:3]
    v10 = nb[..., 3:6]
    v01 = nb[..., 6:9]
    v11 = nb[..., 9:12]
    val = (v00 * (1 - fx) * (1 - fy) + v10 * fx * (1 - fy)
           + v01 * (1 - fx) * fy + v11 * fx * fy)
    g = meta[..., 2][..., None]
    val = jnp.power(jnp.maximum(val, 0.0), g)
    return jnp.where((tex_id < 0)[..., None], 1.0, val)
