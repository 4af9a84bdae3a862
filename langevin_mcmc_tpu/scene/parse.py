"""Mitsuba-0.5-style scene XML parser -> SceneData device arrays.

Python xml.etree counterpart of reference src/parsescene.cpp (which uses the
vendored pugixml). Supports the same node set: perspective sensor + hdrfilm,
serialized/obj shapes, diffuse/phong/roughdielectric/twosided BSDFs,
point/envmap/area emitters, bitmap/constant textures, and the <dpt> options
block (parsescene.cpp:535-590).
"""

import os
import re
import xml.etree.ElementTree as ET

import jax.numpy as jnp
import numpy as np

from . import transforms as T
from .camera import make_camera
from .mesh import load_obj, load_serialized
from .scenedata import (BSDF_LAMBERTIAN, BSDF_PHONG, BSDF_ROUGH_DIELECTRIC,
                        LIGHT_AREA, LIGHT_ENV, LIGHT_POINT, SceneData,
                        build_env_sample_info, _env_neighborhoods,
                        _env_rw_pairs)
from .textures import TextureBuilder
from ..options import Options
from ..utils import image_io


def _parse_vec3(value):
    parts = [p for p in re.split(r'[, ]+', value.strip()) if p]
    if len(parts) == 1:
        v = float(parts[0])
        return np.array([v, v, v], np.float64)
    return np.array([float(p) for p in parts[:3]], np.float64)


def _parse_transform(node):
    """Accumulate child transforms left-multiplied (parsescene.cpp:88-145)."""
    m = np.eye(4)
    for child in node:
        tag = child.tag.lower()
        if tag == 'scale':
            if child.get('value') is not None:
                s = float(child.get('value'))
                m = T.scale([s, s, s]) @ m
            else:
                m = T.scale([float(child.get('x', 1.0)),
                             float(child.get('y', 1.0)),
                             float(child.get('z', 1.0))]) @ m
        elif tag == 'translate':
            m = T.translate([float(child.get('x', 0.0)),
                             float(child.get('y', 0.0)),
                             float(child.get('z', 0.0))]) @ m
        elif tag == 'rotate':
            axis = [float(child.get('x', 0.0)), float(child.get('y', 0.0)),
                    float(child.get('z', 0.0))]
            m = T.rotate(float(child.get('angle', 0.0)), axis) @ m
        elif tag == 'lookat':
            m = T.look_at(_parse_vec3(child.get('origin')),
                          _parse_vec3(child.get('target')),
                          _parse_vec3(child.get('up'))) @ m
        elif tag == 'matrix':
            vals = [float(x) for x in re.split(r'[, ]+', child.get('value').strip()) if x]
            m = np.array(vals).reshape(4, 4) @ m
    return m


class _BSDFSpec:
    """Host-side material description before table assembly."""

    def __init__(self):
        self.type = BSDF_LAMBERTIAN
        self.twosided = False
        self.kd = np.array([0.5, 0.5, 0.5])
        self.kd_tex = -1
        self.ks = np.array([0.2, 0.2, 0.2])
        self.ks_tex = -1
        self.exponent = 30.0
        self.exponent_tex = -1
        self.ks_weight = 0.0
        self.eta = 1.5046 / 1.000277
        self.alpha = 0.1
        self.alpha_tex = -1


def _lum(v):
    return 0.212671 * v[0] + 0.715160 * v[1] + 0.072169 * v[2]


def _parse_map(node, tex_builder, tex_map, scene_dir):
    """Parse an rgb/float/spectrum/texture/ref child into (value, tex_id, avg).

    For bitmap textures value is (1,1,1) and tex_id >= 0; avg is the
    gamma-decoded mean (used for the phong KsWeight, phong.cpp:159-169)."""
    tag = node.tag
    if tag == 'texture':
        tid, avg = _parse_texture(node, tex_builder, scene_dir)
        return np.ones(3), tid, avg
    if tag == 'ref':
        tid, avg = tex_map[node.get('id')]
        return np.ones(3), tid, avg
    v = _parse_vec3(node.get('value'))
    return v, -1, v


def _parse_texture(node, tex_builder, scene_dir):
    filename = None
    uvscale = 1.0
    for child in node:
        name = child.get('name')
        if name == 'filename':
            filename = os.path.join(scene_dir, child.get('value'))
        elif name == 'uvscale':
            uvscale = float(child.get('value'))
    tid = tex_builder.add_bitmap(filename, (uvscale, uvscale))
    return tid, tex_builder.avg(tid)


def _parse_bsdf(node, tex_builder, tex_map, scene_dir, twosided=False):
    btype = node.get('type')
    spec = _BSDFSpec()
    spec.twosided = twosided
    if btype == 'twosided':
        for child in node:
            if child.tag == 'bsdf':
                return _parse_bsdf(child, tex_builder, tex_map, scene_dir, True)
        raise ValueError('twosided without nested bsdf')
    if btype == 'diffuse':
        spec.type = BSDF_LAMBERTIAN
        for child in node:
            if child.get('name') == 'reflectance' or child.tag in ('texture', 'ref'):
                spec.kd, spec.kd_tex, _ = _parse_map(child, tex_builder, tex_map, scene_dir)
    elif btype == 'phong':
        spec.type = BSDF_PHONG
        kd_avg = np.array([0.5, 0.5, 0.5])
        ks_avg = np.array([0.2, 0.2, 0.2])
        for child in node:
            name = child.get('name')
            if name == 'diffuseReflectance':
                spec.kd, spec.kd_tex, kd_avg = _parse_map(child, tex_builder, tex_map, scene_dir)
            elif name == 'specularReflectance':
                spec.ks, spec.ks_tex, ks_avg = _parse_map(child, tex_builder, tex_map, scene_dir)
            elif name == 'exponent':
                v, spec.exponent_tex, _ = _parse_map(child, tex_builder, tex_map, scene_dir)
                spec.exponent = float(v[0])
        # KsWeight from average luminances (phong.cpp:159-169); texture maps
        # contribute their decoded mean
        kd_l = _lum(kd_avg * (spec.kd if spec.kd_tex < 0 else 1.0)) \
            if spec.kd_tex >= 0 else _lum(spec.kd)
        ks_l = _lum(ks_avg) if spec.ks_tex >= 0 else _lum(spec.ks)
        s = kd_l + ks_l
        spec.ks_weight = ks_l / s if s > 0 else 0.0
    elif btype == 'roughdielectric':
        spec.type = BSDF_ROUGH_DIELECTRIC
        int_ior, ext_ior = 1.5046, 1.000277
        spec.kd = np.ones(3)  # Kt
        spec.ks = np.ones(3)
        for child in node:
            name = child.get('name')
            if name == 'intIOR':
                int_ior = float(child.get('value'))
            elif name == 'extIOR':
                ext_ior = float(child.get('value'))
            elif name == 'alpha':
                v, spec.alpha_tex, _ = _parse_map(child, tex_builder, tex_map, scene_dir)
                spec.alpha = float(v[0])
            elif name == 'specularReflectance':
                spec.ks, spec.ks_tex, _ = _parse_map(child, tex_builder, tex_map, scene_dir)
            elif name == 'specularTransmittance':
                spec.kd, spec.kd_tex, _ = _parse_map(child, tex_builder, tex_map, scene_dir)
        spec.eta = int_ior / ext_ior
    else:
        raise ValueError(f'unknown bsdf type {btype}')
    return spec


def _parse_shape_transforms(node):
    tw0 = tw1 = np.eye(4)
    is_moving = False
    for child in node:
        if child.get('name') == 'toWorld':
            if child.tag == 'transform':
                tw0 = tw1 = _parse_transform(child)
            elif child.tag == 'animation':
                ms = [_parse_transform(g) for g in child if g.tag == 'transform']
                tw0, tw1 = ms[0], ms[1]
                is_moving = True
    return tw0, tw1, is_moving


def _parse_options(node):
    opts = Options()
    keymap = {
        'integrator': ('integrator', str), 'spp': ('spp', int),
        'bidirectional': ('bidirectional', None),
        'numinitsamples': ('num_init_samples', int),
        'largestepprob': ('large_step_probability', float),
        'largestepscale': ('large_step_prob_scale', float),
        'mindepth': ('min_depth', int), 'maxdepth': ('max_depth', int),
        'directspp': ('direct_spp', int),
        'perturbstddev': ('perturb_std_dev', float),
        'roughnessthreshold': ('roughness_threshold', float),
        'uniformmixprob': ('uniform_mixing_probability', float),
        'numchains': ('num_chains', int), 'seedoffset': ('seed_offset', int),
        'reportintervalspp': ('report_interval_spp', int),
        'uselightcoordinatesampling': ('use_light_coordinate_sampling', None),
        'largestepmultiplexed': ('large_step_multiplexed', None),
        'h2mc': ('h2mc', None), 'mala': ('mala', None),
        'mala-stepsize': ('mala_stepsize', float),
        'mala-gn': ('mala_gn', float),
        'samplecache': ('sample_from_global_cache', None),
    }
    kw = {}
    for child in node:
        name = child.get('name')
        if name not in keymap:
            continue
        field, conv = keymap[name]
        val = child.get('value')
        kw[field] = (val == 'true') if conv is None else conv(val)
    return opts.replace(**kw)


def parse_scene(filename, options_override=None, film_wh=None):
    """Parse a scene XML file. Returns (SceneData, Options, output_name).

    film_wh: optional (width, height) override for fast low-res tests."""
    scene_dir = os.path.dirname(os.path.abspath(filename))
    root = ET.parse(filename).getroot()

    options = Options()
    camera = None
    output_name = 'image'
    tex_builder = TextureBuilder()
    tex_map = {}
    bsdf_map = {}

    meshes = []          # list of TriMeshData
    mesh_mats = []       # material index per mesh
    mesh_lights = []     # area light index per mesh (-1)
    mat_specs = []
    lights = []          # dicts
    env = None

    def add_mat(spec):
        mat_specs.append(spec)
        return len(mat_specs) - 1

    for child in root:
        tag = child.tag
        if tag == 'dpt':
            options = _parse_options(child)
        elif tag == 'sensor':
            fov = 45.0
            near_clip, far_clip = 1e-2, 1000.0
            to_world = T.AnimatedTransform(np.eye(4))
            width = height = 512
            for c in child:
                name = c.get('name')
                if name == 'nearClip':
                    near_clip = float(c.get('value'))
                elif name == 'farClip':
                    far_clip = float(c.get('value'))
                elif name == 'fov':
                    fov = float(c.get('value'))
                elif name == 'toWorld':
                    if c.tag == 'transform':
                        m = _parse_transform(c)
                        to_world = T.AnimatedTransform(m)
                    elif c.tag == 'animation':
                        ms = [_parse_transform(g) for g in c if g.tag == 'transform']
                        to_world = T.AnimatedTransform(ms[0], ms[1])
                elif c.tag == 'film':
                    for g in c:
                        gname = g.get('name')
                        if gname == 'width':
                            width = int(g.get('value'))
                        elif gname == 'height':
                            height = int(g.get('value'))
                        elif gname == 'filename':
                            output_name = g.get('value')
            if film_wh is not None:
                width, height = film_wh
            camera = make_camera(to_world, fov, width, height, near_clip, far_clip)
        elif tag == 'bsdf':
            spec = _parse_bsdf(child, tex_builder, tex_map, scene_dir)
            bsdf_map[child.get('id')] = add_mat(spec)
        elif tag == 'texture':
            tex_map[child.get('id')] = _parse_texture(child, tex_builder, scene_dir)
        elif tag == 'emitter':
            etype = child.get('type')
            if etype == 'point':
                pos = np.zeros(3)
                intensity = np.ones(3)
                for c in child:
                    name = c.get('name')
                    if name == 'position':
                        pos = np.array([float(c.get('x', 0.0)),
                                        float(c.get('y', 0.0)),
                                        float(c.get('z', 0.0))])
                    elif name == 'intensity':
                        intensity = _parse_vec3(c.get('value'))
                lights.append(dict(type=LIGHT_POINT, pos=pos,
                                   emission=intensity, weight=1.0))
            elif etype == 'envmap':
                env_file = None
                to_world = T.AnimatedTransform(np.eye(4))
                for c in child:
                    name = c.get('name')
                    if name == 'filename':
                        env_file = os.path.join(scene_dir, c.get('value'))
                    elif name == 'toWorld':
                        if c.tag == 'transform':
                            to_world = T.AnimatedTransform(_parse_transform(c))
                        elif c.tag == 'animation':
                            ms = [_parse_transform(g) for g in c if g.tag == 'transform']
                            to_world = T.AnimatedTransform(ms[0], ms[1])
                img = image_io.read_image(env_file)
                env = dict(image=img, to_world=to_world, weight=1.0)
                lights.append(dict(type=LIGHT_ENV, pos=np.zeros(3),
                                   emission=np.zeros(3), weight=1.0))
                env['light_id'] = len(lights) - 1
            else:
                raise ValueError(f'unsupported emitter {etype}')
        elif tag == 'shape':
            stype = child.get('type')
            mat_id = None
            for c in child:
                if c.tag == 'bsdf':
                    mat_id = add_mat(_parse_bsdf(c, tex_builder, tex_map, scene_dir))
                    break
                if c.tag == 'ref':
                    mat_id = bsdf_map[c.get('id')]
                    break
            if mat_id is None:
                mat_id = add_mat(_BSDFSpec())  # default gray diffuse
            tw0, tw1, is_moving = _parse_shape_transforms(child)
            fname = None
            shape_index = 0
            flip_normals = face_normals = False
            for c in child:
                name = c.get('name')
                if name == 'filename':
                    fname = os.path.join(scene_dir, c.get('value'))
                elif name == 'shapeIndex':
                    shape_index = int(c.get('value'))
                elif name == 'flipNormals':
                    flip_normals = c.get('value') == 'true'
                elif name == 'faceNormals':
                    face_normals = c.get('value') == 'true'
            if stype == 'serialized':
                mesh = load_serialized(fname, shape_index, tw0, tw1, is_moving,
                                       flip_normals, face_normals)
            elif stype == 'obj':
                mesh = load_obj(fname, tw0, tw1, is_moving,
                                flip_normals, face_normals)
            else:
                raise ValueError(f'unsupported shape {stype}')
            area_light_id = -1
            for c in child:
                if c.tag == 'emitter':
                    radiance = np.ones(3)
                    for g in c:
                        if g.get('name') == 'radiance':
                            radiance = _parse_vec3(g.get('value'))
                    lights.append(dict(type=LIGHT_AREA, pos=np.zeros(3),
                                       emission=radiance, weight=1.0,
                                       shape=len(meshes)))
                    area_light_id = len(lights) - 1
            meshes.append(mesh)
            mesh_mats.append(mat_id)
            mesh_lights.append(area_light_id)

    if options_override:
        options = options.replace(**options_override)

    scene = assemble_scene(camera, meshes, mesh_mats, mesh_lights, mat_specs,
                           lights, env, tex_builder)
    return scene, options, output_name


def assemble_scene(camera, meshes, mesh_mats, mesh_lights, mat_specs, lights,
                   env, tex_builder):
    """Flatten parsed host data into the SceneData SoA pytree."""
    f32 = np.float32

    # --- triangles ---
    tri_p, tri_n, tri_st, tri_mat, tri_shape, tri_light = [], [], [], [], [], []
    has_motion = False
    mesh_tri_offset = []
    for si, mesh in enumerate(meshes):
        idx = mesh.indices
        ntri = idx.shape[0]
        mesh_tri_offset.append(sum(len(m.indices) for m in meshes[:si]))
        tri_p.append(mesh.position[:, idx])          # [2, t, 3, 3]
        tri_n.append(mesh.normal[:, idx])
        tri_st.append(mesh.st[idx])                  # [t, 3, 2]
        tri_mat.append(np.full(ntri, mesh_mats[si], np.int32))
        tri_shape.append(np.full(ntri, si, np.int32))
        tri_light.append(np.full(ntri, mesh_lights[si], np.int32))
        has_motion |= mesh.is_moving
    tri_p = np.concatenate(tri_p, axis=1).astype(f32)
    tri_n = np.concatenate(tri_n, axis=1).astype(f32)
    tri_st = np.concatenate(tri_st, axis=0).astype(f32)
    tri_mat = np.concatenate(tri_mat)
    tri_shape = np.concatenate(tri_shape)
    tri_light = np.concatenate(tri_light)
    num_tris = tri_p.shape[1]

    # --- materials ---
    M = len(mat_specs)
    mt = np.array([s.type for s in mat_specs], np.int32)
    m2s = np.array([s.twosided for s in mat_specs], bool)
    kd = np.stack([s.kd for s in mat_specs]).astype(f32)
    kdt = np.array([s.kd_tex for s in mat_specs], np.int32)
    ks = np.stack([s.ks for s in mat_specs]).astype(f32)
    kst = np.array([s.ks_tex for s in mat_specs], np.int32)
    expo = np.array([s.exponent for s in mat_specs], f32)
    expot = np.array([s.exponent_tex for s in mat_specs], np.int32)
    ksw = np.array([s.ks_weight for s in mat_specs], f32)
    eta = np.array([s.eta for s in mat_specs], f32)
    alpha = np.array([s.alpha for s in mat_specs], f32)
    alphat = np.array([s.alpha_tex for s in mat_specs], np.int32)

    # --- lights ---
    L = max(len(lights), 1)
    ltype = np.zeros(L, np.int32)
    lweight = np.zeros(L, f32)
    lpos = np.zeros((L, 3), f32)
    lemission = np.zeros((L, 3), f32)
    amax = 1
    for li, lt in enumerate(lights):
        ltype[li] = lt['type']
        lweight[li] = lt['weight']
        lpos[li] = lt['pos']
        lemission[li] = lt['emission']
        if lt['type'] == LIGHT_AREA:
            amax = max(amax, len(meshes[lt['shape']].indices))
    light_tri = np.zeros((L, amax), np.int32)
    light_tri_cdf = np.zeros((L, amax + 1), f32)
    light_tri_pmf = np.zeros((L, amax), f32)
    light_ntri = np.zeros(L, np.int32)
    light_inv_area = np.zeros(L, f32)
    for li, lt in enumerate(lights):
        if lt['type'] != LIGHT_AREA:
            continue
        mesh = meshes[lt['shape']]
        idx = mesh.indices
        p = mesh.position[0]
        e1 = p[idx[:, 1]] - p[idx[:, 0]]
        e2 = p[idx[:, 2]] - p[idx[:, 0]]
        areas = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
        total = areas.sum()
        n = len(areas)
        cdf = np.zeros(n + 1)
        np.cumsum(areas / n, out=cdf[1:])
        func_int = cdf[-1]
        cdf = cdf / func_int if func_int > 0 else np.arange(n + 1) / n
        light_tri[li, :n] = mesh_tri_offset[lt['shape']] + np.arange(n)
        light_tri_cdf[li, :n + 1] = cdf
        light_tri_cdf[li, n + 1:] = 1.0
        light_tri_pmf[li, :n] = areas / max(total, 1e-30)
        light_ntri[li] = n
        light_inv_area[li] = 1.0 / max(total, 1e-30)

    wsum = lweight.sum()
    n = L
    lcdf = np.zeros(n + 1, f32)
    np.cumsum(lweight / n, out=lcdf[1:])
    fi = lcdf[-1]
    lcdf = lcdf / fi if fi > 0 else (np.arange(n + 1) / n).astype(f32)

    # --- env light ---
    env_light_id = -1
    if env is not None:
        env_light_id = env['light_id']
        img = env['image'].astype(f32)
        cdf_rows, cdf_cols, row_w, norm, pix = build_env_sample_info(img)
        tw = env['to_world']
        tl = tw.inverse()
        ewt, ewq = tw.as_arrays()
        elt, elq = tl.as_arrays()
    else:
        img = np.zeros((1, 2, 3), f32)
        cdf_rows = np.array([0, 1], f32)
        cdf_cols = np.array([[0, 0.5, 1]], f32)
        row_w = np.ones(1, f32)
        norm = np.float32(1.0)
        pix = np.array([2 * np.pi / 2, np.pi], f32)
        at = T.AnimatedTransform(np.eye(4))
        ewt, ewq = at.as_arrays()
        elt, elq = at.as_arrays()

    # --- bounding sphere (scene.cpp:34-40: radius inflated x1000) ---
    pmin = tri_p.reshape(-1, 3).min(0)
    pmax = tri_p.reshape(-1, 3).max(0)
    center = 0.5 * (pmin + pmax)
    radius = float(np.linalg.norm(pmax - center)) * 1000.0

    from ..ops.intersect import build_matmul_tables
    isect_B, isect_C, isect_ok = build_matmul_tables(tri_p[0])

    return SceneData(
        tri_p=jnp.asarray(tri_p), tri_n=jnp.asarray(tri_n),
        tri_st=jnp.asarray(tri_st), tri_mat=jnp.asarray(tri_mat),
        tri_shape=jnp.asarray(tri_shape), tri_light=jnp.asarray(tri_light),
        mat_type=jnp.asarray(mt), mat_twosided=jnp.asarray(m2s),
        mat_kd=jnp.asarray(kd), mat_kd_tex=jnp.asarray(kdt),
        mat_ks=jnp.asarray(ks), mat_ks_tex=jnp.asarray(kst),
        mat_exponent=jnp.asarray(expo), mat_exponent_tex=jnp.asarray(expot),
        mat_ks_weight=jnp.asarray(ksw),
        mat_eta=jnp.asarray(eta), mat_inv_eta=jnp.asarray(1.0 / eta),
        mat_alpha=jnp.asarray(alpha), mat_alpha_tex=jnp.asarray(alphat),
        light_type=jnp.asarray(ltype), light_weight=jnp.asarray(lweight),
        light_cdf=jnp.asarray(lcdf),
        light_pos=jnp.asarray(lpos), light_emission=jnp.asarray(lemission),
        light_tri=jnp.asarray(light_tri),
        light_tri_cdf=jnp.asarray(light_tri_cdf),
        light_tri_pmf=jnp.asarray(light_tri_pmf),
        light_ntri=jnp.asarray(light_ntri),
        light_inv_area=jnp.asarray(light_inv_area),
        env_image=jnp.asarray(img),
        env_neigh=jnp.asarray(_env_neighborhoods(img)),
        env_rw2=jnp.asarray(_env_rw_pairs(row_w)),
        env_cdf_rows=jnp.asarray(cdf_rows),
        env_cdf_cols=jnp.asarray(cdf_cols), env_row_weights=jnp.asarray(row_w),
        env_normalization=jnp.asarray(norm), env_pixel_size=jnp.asarray(pix),
        env_to_world_t=ewt, env_to_world_q=ewq,
        env_to_light_t=elt, env_to_light_q=elq,
        bsphere_center=jnp.asarray(center.astype(f32)),
        bsphere_radius=jnp.asarray(np.float32(radius)),
        camera=camera, textures=tex_builder.build(),
        bvh_nodes=jnp.zeros((1, 8), jnp.float32),
        bvh_prim_ids=jnp.arange(num_tris, dtype=jnp.int32),
        isect_B=isect_B, isect_C=isect_C, isect_ok=isect_ok,
        env_light_id=env_light_id, num_tris=int(num_tris),
        num_lights=len(lights), width=camera.width, height=camera.height,
        has_motion=has_motion, use_bvh=False)
