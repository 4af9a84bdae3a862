"""Fixed-shape path records: the TPU-native Path / SubpathContrib / PSS.

The reference stores a path as std::vectors of SurfaceVertex plus a
serialize-to-flat-buffer step for its compiled derivative kernels
(reference src/path.h:27-67, Serialize at src/path.cpp:2497-2586). Here a
path IS a fixed-shape pytree of arrays padded to max_depth — it batches,
shards, and feeds jax.grad directly; (camDepth, lightDepth) become per-lane
integers instead of C++ control flow.

PSS layout parity (GetPathPss, src/path.cpp:2588-2632), dim = 2*pathLength:
  t >= 2 :  [lgt rndPos(2), lgt rndDir(2), lgt bsdfRnd x (t-2)] ++ cam part
  s >= 2 :  cam part = [screenPos(2), cam bsdfRnd x (s-2),
                        directLightRnd(2) if t == 1]
  s == 1 :  pss is the light part only (no screenPos).
Time is excluded from the PSS (GetDimension, path.h:108-115).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import vecmath as vm


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields,
                                            meta_fields=[])


@_register
@dataclasses.dataclass(frozen=True)
class PathRecord:
    """One (batched) light path. D = max_depth padding. Batch dims lead."""
    time: jnp.ndarray          # [...]
    # light emission vertex (path.h:41-45 LightVertex)
    lgt_light_id: jnp.ndarray  # [...] int32
    lgt_lprim: jnp.ndarray     # [...] int32 (global tri id / env pixel)
    lgt_rnd_pos: jnp.ndarray   # [...,2]
    lgt_rnd_dir: jnp.ndarray   # [...,2]
    # camera vertex
    screen_pos: jnp.ndarray    # [...,2]
    # camera-subpath surface vertices (path.h:31-39 SurfaceVertex) [...,D]
    cam_tri: jnp.ndarray       # int32, -1 = no hit (env)
    cam_bsdf_rnd: jnp.ndarray  # [...,D,2]
    cam_bsdf_disc: jnp.ndarray  # [...,D]
    cam_use_abs: jnp.ndarray   # [...,D] bool
    cam_rr: jnp.ndarray        # [...,D] rrWeight
    cam_nee_light: jnp.ndarray  # [...,D] int32 directLightInst
    cam_nee_lprim: jnp.ndarray  # [...,D] int32
    cam_nee_rnd: jnp.ndarray   # [...,D,2]
    # light-subpath surface vertices [...,D]
    lgt_tri: jnp.ndarray
    lgt_bsdf_rnd: jnp.ndarray  # [...,D,2]
    lgt_bsdf_disc: jnp.ndarray  # [...,D]
    lgt_use_abs: jnp.ndarray   # [...,D] bool
    lgt_rr: jnp.ndarray        # [...,D]
    # terminal env hit (path.h:53-54 envLightInst)
    env_lprim: jnp.ndarray     # [...] int32, -1 if none
    # subpath tags (path.h:58-61); -1 when not a subpath
    cam_depth: jnp.ndarray     # [...] int32 (s)
    lgt_depth: jnp.ndarray     # [...] int32 (t)

    @property
    def max_depth(self):
        return self.cam_tri.shape[-1]


def empty_record(batch_shape, max_depth):
    D = max_depth
    f = lambda *s: jnp.zeros(batch_shape + tuple(s), jnp.float32)
    i = lambda *s: jnp.full(batch_shape + tuple(s), -1, jnp.int32)
    b = lambda *s: jnp.zeros(batch_shape + tuple(s), bool)
    return PathRecord(
        time=f(), lgt_light_id=i(), lgt_lprim=i(),
        lgt_rnd_pos=f(2), lgt_rnd_dir=f(2), screen_pos=f(2),
        cam_tri=i(D), cam_bsdf_rnd=f(D, 2), cam_bsdf_disc=f(D),
        cam_use_abs=b(D), cam_rr=jnp.ones(batch_shape + (D,), jnp.float32),
        cam_nee_light=i(D), cam_nee_lprim=i(D), cam_nee_rnd=f(D, 2),
        lgt_tri=i(D), lgt_bsdf_rnd=f(D, 2), lgt_bsdf_disc=f(D),
        lgt_use_abs=b(D), lgt_rr=jnp.ones(batch_shape + (D,), jnp.float32),
        env_lprim=i(), cam_depth=i(), lgt_depth=i())


@_register
@dataclasses.dataclass(frozen=True)
class Contribs:
    """Dense (s,t)-indexed contribution grid for one generated path.

    cam-side slots [..., D, D+2]: index [c, k] is the contribution found at
    camera loop depth c with k = 0 -> (c+2, 0) hit-light, k = 1 -> (c+2, 1)
    NEE, k = 2+l -> (c+2, 2+l) vertex connection to light vertex l.
    lgt-side slots [..., D]: index [l] is (1, 2+l) connect-to-camera.
    (SubpathContrib fields per reference src/path.h:12-21.)
    """
    screen_pos: jnp.ndarray   # [...,D,D+2,2] / cam slots
    contrib: jnp.ndarray      # [...,D,D+2,3]
    ls_score: jnp.ndarray     # [...,D,D+2]
    ss_score: jnp.ndarray
    lens_score: jnp.ndarray
    mis_weight: jnp.ndarray
    l_screen_pos: jnp.ndarray  # [...,D,2] / lgt slots
    l_contrib: jnp.ndarray     # [...,D,3]
    l_ls_score: jnp.ndarray    # [...,D]
    l_ss_score: jnp.ndarray
    l_lens_score: jnp.ndarray
    l_mis_weight: jnp.ndarray

    @property
    def max_depth(self):
        return self.l_ls_score.shape[-1]

    def flatten(self):
        """Flatten to per-slot lists with (s, t) labels.

        Only the structurally reachable slots are kept: a contribution at
        (s, t) requires pathLength = s + t - 1 <= max_depth (the generation
        guards at reference src/path.cpp:476,1289,1410), which rules out
        half the dense [D, D+2] grid — compacting here halves every splat
        bank and film scatter downstream.

        Returns dict of [..., NSLOT] arrays + static (s_tags, t_tags)."""
        D = self.max_depth
        batch = self.ls_score.shape[:-2]
        cam_sel, lgt_sel, s_tags, t_tags = _slot_tables(D)

        def flat(cam, lgt, vec=0):
            cshape = batch + (D * (D + 2),) + ((vec,) if vec else ())
            nb = len(batch)
            return jnp.concatenate(
                [jnp.take(cam.reshape(cshape), cam_sel, axis=nb),
                 jnp.take(lgt, lgt_sel, axis=nb)], axis=nb)

        return dict(
            screen_pos=flat(self.screen_pos, self.l_screen_pos, 2),
            contrib=flat(self.contrib, self.l_contrib, 3),
            ls_score=flat(self.ls_score, self.l_ls_score),
            ss_score=flat(self.ss_score, self.l_ss_score),
            lens_score=flat(self.lens_score, self.l_lens_score),
            mis_weight=flat(self.mis_weight, self.l_mis_weight),
        ), s_tags, t_tags


def _slot_tables(D):
    """Static flatten tables: reachable cam/lgt slot indices + (s,t) tags."""
    c_idx, k_idx = np.meshgrid(np.arange(D), np.arange(D + 2), indexing='ij')
    s_cam = (c_idx + 2).reshape(-1)
    t_cam = np.where(k_idx == 0, 0,
                     np.where(k_idx == 1, 1, k_idx)).reshape(-1)
    cam_ok = (s_cam + t_cam - 1) <= D
    cam_sel = np.nonzero(cam_ok)[0].astype(np.int32)
    t_lgt = np.arange(D) + 2
    lgt_ok = (1 + t_lgt - 1) <= D
    lgt_sel = np.nonzero(lgt_ok)[0].astype(np.int32)
    s_tags = np.concatenate([s_cam[cam_sel], np.ones(len(lgt_sel), np.int64)])
    t_tags = np.concatenate([t_cam[cam_sel], t_lgt[lgt_sel]])
    return cam_sel, lgt_sel, s_tags.astype(np.int32), t_tags.astype(np.int32)


def num_flat_slots(D):
    """Length of Contribs.flatten()'s slot axis."""
    cam_sel, lgt_sel, _, _ = _slot_tables(D)
    return len(cam_sel) + len(lgt_sel)


def empty_contribs(batch_shape, max_depth):
    D = max_depth
    f = lambda *s: jnp.zeros(batch_shape + tuple(s), jnp.float32)
    return Contribs(
        screen_pos=f(D, D + 2, 2), contrib=f(D, D + 2, 3),
        ls_score=f(D, D + 2), ss_score=f(D, D + 2),
        lens_score=f(D, D + 2), mis_weight=f(D, D + 2),
        l_screen_pos=f(D, 2), l_contrib=f(D, 3), l_ls_score=f(D),
        l_ss_score=f(D), l_lens_score=f(D), l_mis_weight=f(D))


# ---------------------------------------------------------------------------
# PSS <-> record mapping (GetPathPss / Perturb layout)
# ---------------------------------------------------------------------------

def pss_dim(record):
    """GetDimension (path.h:108-115): 2 * pathLength, pathLength=s+t-1."""
    return 2 * (record.cam_depth + record.lgt_depth - 1)


def _slot_layout(record):
    """Per-lane PSS slot offsets. Returns dict of integer offsets (arrays)."""
    s = record.cam_depth
    t = record.lgt_depth
    has_lgt = t >= 2
    lgt_len = jnp.maximum(t - 2, 0)          # lgt bsdfRnd pairs
    cam_base = jnp.where(has_lgt, 4 + 2 * lgt_len, 0)
    has_screen = s >= 2
    cam_len = jnp.maximum(s - 2, 0)          # cam bsdfRnd pairs
    nee_off = cam_base + 2 + 2 * cam_len     # only when t == 1
    return dict(has_lgt=has_lgt, lgt_len=lgt_len, cam_base=cam_base,
                has_screen=has_screen, cam_len=cam_len, nee_off=nee_off,
                has_nee=(t == 1), s=s, t=t)


def get_path_pss(record, max_dim):
    """Record -> padded PSS vector [..., max_dim] (src/path.cpp:2588-2632)."""
    D = record.max_depth
    lay = _slot_layout(record)
    batch = record.time.shape
    pss = jnp.zeros(batch + (max_dim,), jnp.float32)

    def put(pss, offset, value, valid):
        # offset [...], value [...], valid [...]. Where the write mask is
        # False the input survives, so no gather of the old value is needed
        # (the old take_along_axis here cost ~60 ms/step at 65536 lanes —
        # xref_step r5: records.py put gathers were 6% of the MCMC step)
        off = jnp.clip(offset, 0, max_dim - 1)
        mask = valid[..., None] & (jnp.arange(max_dim) == off[..., None])
        return jnp.where(mask, value[..., None], pss)

    # light side
    for k in range(2):
        pss = put(pss, jnp.full(batch, k, jnp.int32), record.lgt_rnd_pos[..., k], lay['has_lgt'])
        pss = put(pss, jnp.full(batch, 2 + k, jnp.int32), record.lgt_rnd_dir[..., k], lay['has_lgt'])
    for i in range(D):
        valid = lay['has_lgt'] & (i < lay['lgt_len'])
        for k in range(2):
            pss = put(pss, jnp.full(batch, 4 + 2 * i + k, jnp.int32),
                      record.lgt_bsdf_rnd[..., i, k], valid)
    # camera side
    for k in range(2):
        pss = put(pss, lay['cam_base'] + k, record.screen_pos[..., k], lay['has_screen'])
    for i in range(D):
        valid = lay['has_screen'] & (i < lay['cam_len'])
        for k in range(2):
            pss = put(pss, lay['cam_base'] + 2 + 2 * i + k,
                      record.cam_bsdf_rnd[..., i, k], valid)
    # NEE rnd when t == 1 lives at the last camera vertex s-2
    nee_idx = jnp.clip(lay['s'] - 2, 0, D - 1)
    nee_rnd = jnp.take_along_axis(
        record.cam_nee_rnd, nee_idx[..., None, None].repeat(2, -1), -2)[..., 0, :]
    for k in range(2):
        pss = put(pss, lay['nee_off'] + k, nee_rnd[..., k],
                  lay['has_nee'] & lay['has_screen'])
    return pss


def apply_pss_offset(record, offset):
    """Perturb the record's PSS by `offset` (modulo 1), per the layout above
    (PerturbPathBidir, src/path.cpp:1953-2033 Perturb calls). offset is
    [..., max_dim]; slots beyond the path's dim are ignored."""
    D = record.max_depth
    lay = _slot_layout(record)

    # one-hot contraction instead of per-slot take_along_axis: the ~38
    # tiny gather kernels here cost ~20 ms/step at 65536 lanes (kernel
    # overhead, not bytes — xref_step r5); the whole slot map becomes ONE
    # fused [.., n_gets, max_dim] multiply-reduce over the offset vector
    max_dim = offset.shape[-1]
    batch = record.time.shape
    full = lambda v: jnp.full(batch, v, jnp.int32)

    idxs, valids = [], []

    def get(off_idx, valid):
        idxs.append(jnp.broadcast_to(jnp.clip(off_idx, 0, max_dim - 1),
                                     batch))
        valids.append(jnp.broadcast_to(valid, batch))
        return len(idxs) - 1

    # registration order defines the slot ids consumed below
    g_lp0 = get(full(0), lay['has_lgt'])
    g_lp1 = get(full(1), lay['has_lgt'])
    g_ld0 = get(full(2), lay['has_lgt'])
    g_ld1 = get(full(3), lay['has_lgt'])
    g_lb = [[get(full(4 + 2 * i + k),
                 lay['has_lgt'] & (i < lay['lgt_len'])) for k in range(2)]
            for i in range(D)]
    g_sc0 = get(lay['cam_base'], lay['has_screen'])
    g_sc1 = get(lay['cam_base'] + 1, lay['has_screen'])
    g_cb = [[get(lay['cam_base'] + 2 + 2 * i + k,
                 lay['has_screen'] & (i < lay['cam_len'])) for k in range(2)]
            for i in range(D)]
    nee_valid = lay['has_nee'] & lay['has_screen']
    g_ne0 = get(lay['nee_off'], nee_valid)
    g_ne1 = get(lay['nee_off'] + 1, nee_valid)

    idx_all = jnp.stack(idxs, -1)                       # [.., G]
    val_all = jnp.stack(valids, -1)
    onehot = (idx_all[..., None] == jnp.arange(max_dim)).astype(offset.dtype)
    vals = jnp.einsum('...gd,...d->...g', onehot, offset)
    vals = jnp.where(val_all, vals, 0.0)
    v = lambda g: vals[..., g]

    new_lgt_pos = vm.modulo(
        record.lgt_rnd_pos + jnp.stack([v(g_lp0), v(g_lp1)], -1), 1.0)
    new_lgt_dir = vm.modulo(
        record.lgt_rnd_dir + jnp.stack([v(g_ld0), v(g_ld1)], -1), 1.0)
    lgt_off = jnp.stack(
        [jnp.stack([v(g_lb[i][0]), v(g_lb[i][1])], -1) for i in range(D)],
        -2)
    new_lgt_bsdf = vm.modulo(record.lgt_bsdf_rnd + lgt_off, 1.0)

    new_screen = vm.modulo(
        record.screen_pos + jnp.stack([v(g_sc0), v(g_sc1)], -1), 1.0)
    cam_off = jnp.stack(
        [jnp.stack([v(g_cb[i][0]), v(g_cb[i][1])], -1) for i in range(D)],
        -2)
    new_cam_bsdf = vm.modulo(record.cam_bsdf_rnd + cam_off, 1.0)

    nee_idx = jnp.clip(lay['s'] - 2, 0, D - 1)
    nee_off_vals = jnp.stack([v(g_ne0), v(g_ne1)], -1)
    sel = (jnp.arange(D) == nee_idx[..., None])[..., None]
    new_nee = vm.modulo(record.cam_nee_rnd + jnp.where(sel, nee_off_vals[..., None, :], 0.0), 1.0)

    return dataclasses.replace(
        record, lgt_rnd_pos=new_lgt_pos, lgt_rnd_dir=new_lgt_dir,
        lgt_bsdf_rnd=new_lgt_bsdf, screen_pos=new_screen,
        cam_bsdf_rnd=new_cam_bsdf, cam_nee_rnd=new_nee)


# record fields padded to max_depth, by position of the depth axis
_DEPTH_LAST = ('cam_tri', 'cam_bsdf_disc', 'cam_use_abs', 'cam_rr',
               'cam_nee_light', 'cam_nee_lprim',
               'lgt_tri', 'lgt_bsdf_disc', 'lgt_use_abs', 'lgt_rr')
_DEPTH_PEN = ('cam_bsdf_rnd', 'cam_nee_rnd', 'lgt_bsdf_rnd')


def to_subpath(record, s, t):
    """ToSubpath (path.cpp:1660-1669): tag the record with its chosen (s,t);
    env hit cleared when t != 0."""
    return dataclasses.replace(
        record, cam_depth=jnp.asarray(s, jnp.int32),
        lgt_depth=jnp.asarray(t, jnp.int32),
        env_lprim=jnp.where(t != 0, -1, record.env_lprim))
