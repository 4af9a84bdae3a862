"""Perspective camera with two-keyframe motion.

TPU-side twin of reference src/camera.cpp: precomputes sampleToCam /
camToSample on host; ray generation and point projection are batched,
differentiable jnp functions of screen position and shutter time.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from . import transforms as T
from ..utils import vecmath as vm


@dataclasses.dataclass(frozen=True)
class Camera:
    sample_to_cam: jnp.ndarray    # [4,4]
    cam_to_sample: jnp.ndarray    # [4,4]
    c2w_trans: jnp.ndarray        # [2,3]
    c2w_quat: jnp.ndarray         # [2,4]
    w2c_trans: jnp.ndarray        # [2,3]
    w2c_quat: jnp.ndarray         # [2,4]
    near_clip: float
    far_clip: float
    dist: float                   # W / (2 tan(fov/2)), camera.cpp:27
    width: int
    height: int


def make_camera(to_world: T.AnimatedTransform, fov, width, height,
                near_clip=1e-2, far_clip=1000.0):
    aspect = width / height
    cam_to_sample = (T.scale([-0.5, -0.5 * aspect, 1.0])
                     @ T.translate([-1.0, -1.0 / aspect, 0.0])
                     @ T.perspective(fov, near_clip, far_clip))
    sample_to_cam = np.linalg.inv(cam_to_sample)
    dist = width / (2.0 * np.tan((fov / 2.0) * np.pi / 180.0))
    w2c = to_world.inverse()
    ct, cq = to_world.as_arrays()
    wt, wq = w2c.as_arrays()
    return Camera(
        sample_to_cam=jnp.asarray(sample_to_cam, jnp.float32),
        cam_to_sample=jnp.asarray(cam_to_sample, jnp.float32),
        c2w_trans=ct, c2w_quat=cq, w2c_trans=wt, w2c_quat=wq,
        near_clip=float(near_clip), far_clip=float(far_clip),
        dist=float(dist), width=int(width), height=int(height))


def sample_primary(cam: Camera, screen_pos, time):
    """Primary ray for screen position in [0,1)^2 at shutter `time`.

    Matches reference src/camera.cpp:38-51. Returns (org, dir, min_t, max_t).
    """
    sp = jnp.asarray(screen_pos)
    zeros = jnp.zeros_like(sp[..., :1])
    p_cam = vm.xform_point(cam.sample_to_cam,
                           jnp.concatenate([sp, zeros], -1))
    d_cam = vm.normalize(p_cam)
    inv_z = 1.0 / d_cam[..., 2]
    rot, tr = T.interpolate_rigid(cam.c2w_trans, cam.c2w_quat, jnp.asarray(time))
    org = jnp.broadcast_to(tr, d_cam.shape)
    d = T.rigid_xform_vector(rot, d_cam)
    return org, d, cam.near_clip * inv_z, cam.far_clip * inv_z


def camera_center_dir(cam: Camera, time):
    """org + viewing direction of the central ray (screenPos=(.5,.5))."""
    sp = jnp.stack([jnp.asarray(time) * 0 + 0.5, jnp.asarray(time) * 0 + 0.5], -1)
    org, d, _, _ = sample_primary(cam, sp, time)
    return org, d


def project_point(cam: Camera, p, time):
    """World point -> screen [0,1)^2 (reference src/camera.cpp:67-84).

    Returns (screen_pos, valid)."""
    rot, tr = T.interpolate_rigid(cam.w2c_trans, cam.w2c_quat, jnp.asarray(time))
    cam_p = T.rigid_xform_point(rot, tr, p)
    valid = (cam_p[..., 2] >= cam.near_clip) & (cam_p[..., 2] <= cam.far_clip)
    raster = vm.xform_point(cam.cam_to_sample, cam_p)
    valid &= ((raster[..., 0] >= 0.0) & (raster[..., 0] <= 1.0)
              & (raster[..., 1] >= 0.0) & (raster[..., 1] <= 1.0))
    return raster[..., :2], valid
