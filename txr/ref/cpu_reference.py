"""Golden CPU oracle: float64 NumPy re-implementation of the render math.

The reference repo has no tests (SURVEY §4); its verification was visual.
TXR's substitute is this renderer: a *deliberately independent* per-pixel
scalar implementation of the same math the GLSL kernel computes
(/root/reference/assets/shaders/rt.frag), written loop-by-loop like the
shader rather than batched like the JAX path.  Forward renders from
txr.render must be allclose to this oracle (BASELINE configs 1-3).

Shared semantic decisions (where the GLSL is undefined or GPU-specific),
identical in both implementations by design:
  * texture LOD: ray-footprint mip selection (t·pixel_angle/cosθ texel
    footprint → trilinear over a 2×2-box-filtered pyramid), replacing the
    reference's fwidth→textureLod (rt.frag:319-340); REPEAT wrap; formulas
    mirror txr/render/texture.py exactly.  cfg.texture_lod=False → level 0.
  * degenerate quadric directions (|p2| < 1e-6): miss (the reference's
    ``t > tmin`` comparison at rt.frag:544 is a bug on a measure-zero set)
  * missed reflected ray in getReflectedColor: black (GLSL reads an
    uninitialised ``type`` there)
  * refraction steps are bounded by iterations + extra_refraction_steps

Everything here is float64 and pure NumPy — no JAX imports — so it is an
arms-length check on the f32 TPU kernels.
"""

from __future__ import annotations

import numpy as np

MAX_DIST = 1.0e6
PI = 3.14159265358979

T_SPHERE, T_PLANE, T_SURFACE, T_BOX, T_TORUS, T_RING, T_LIGHT = range(7)


# -- small math ------------------------------------------------------------

def _nrm(v):
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _quat_conj(q):
    return np.array([-q[0], -q[1], -q[2], q[3]])


def _quat_inv(q):
    return _quat_conj(q) / np.dot(q, q)


def _quat_mult(a, b):
    x1, y1, z1, w1 = a
    x2, y2, z2, w2 = b
    return np.array(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ]
    )


def _rot(q, v):
    qv = np.array([v[0], v[1], v[2], 0.0])
    return _quat_mult(_quat_mult(q, qv), _quat_conj(q))[:3]


def _reflect(i, n):
    return i - 2.0 * np.dot(n, i) * n


def _refract(i, n, eta):
    cosi = np.dot(n, i)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    if k < 0:
        return np.zeros(3)
    return eta * i - (eta * cosi + np.sqrt(k)) * n


# -- scene snapshot --------------------------------------------------------

class OracleScene:
    """Plain-numpy float64 copy of a txr Scene + TextureSet."""

    def __init__(self, scene, textures, cfg):
        g = lambda x: np.asarray(x, np.float64)
        self.cam_pos = g(scene.camera.pos)
        self.cam_quat = g(scene.camera.quat)
        self.ambient = g(scene.ambient_color)
        self.shadow_ambient = g(scene.shadow_ambient)
        self.bg = g(scene.bg_color)

        def mats(m, i):
            return dict(
                color=g(m.color[i]), absorb=g(m.absorb[i]),
                diffuse=float(m.diffuse[i]), reflect=float(m.reflect[i]),
                refract=float(m.refract[i]), specular=float(m.specular[i]),
                kd=float(m.kd[i]), ks=float(m.ks[i]),
            )

        self.spheres = [
            dict(pos=g(scene.spheres.pos[i]), radius=float(scene.spheres.radius[i]),
                 quat=g(scene.spheres.quat[i]), tex=int(scene.spheres.texture[i]),
                 hollow=bool(scene.spheres.hollow[i]), mat=mats(scene.spheres.mat, i))
            for i in range(scene.spheres.radius.shape[0])
        ]
        self.planes = [
            dict(pos=g(scene.planes.pos[i]), normal=g(scene.planes.normal[i]),
                 mat=mats(scene.planes.mat, i))
            for i in range(scene.planes.pos.shape[0])
        ]
        self.surfaces = [
            dict(pos=g(scene.surfaces.pos[i]), quat=g(scene.surfaces.quat[i]),
                 coef=g(scene.surfaces.coef[i]), v_min=g(scene.surfaces.v_min[i]),
                 v_max=g(scene.surfaces.v_max[i]), mat=mats(scene.surfaces.mat, i))
            for i in range(scene.surfaces.coef.shape[0])
        ]
        self.boxes = [
            dict(pos=g(scene.boxes.pos[i]), quat=g(scene.boxes.quat[i]),
                 form=g(scene.boxes.form[i]), tex=int(scene.boxes.texture[i]),
                 mat=mats(scene.boxes.mat, i))
            for i in range(scene.boxes.pos.shape[0])
        ]
        self.toruses = [
            dict(pos=g(scene.toruses.pos[i]), quat=g(scene.toruses.quat[i]),
                 form=g(scene.toruses.form[i]), mat=mats(scene.toruses.mat, i))
            for i in range(scene.toruses.pos.shape[0])
        ]
        self.rings = [
            dict(pos=g(scene.rings.pos[i]), quat=g(scene.rings.quat[i]),
                 r1=float(scene.rings.r1[i]), r2=float(scene.rings.r2[i]),
                 tex=int(scene.rings.texture[i]), mat=mats(scene.rings.mat, i))
            for i in range(scene.rings.pos.shape[0])
        ]
        self.lights_point = [
            dict(pos=g(scene.lights_point.pos[i]), radius=float(scene.lights_point.radius[i]),
                 color=g(scene.lights_point.color[i]),
                 intensity=float(scene.lights_point.intensity[i]),
                 linear_k=float(scene.lights_point.linear_k[i]),
                 quadratic_k=float(scene.lights_point.quadratic_k[i]))
            for i in range(scene.lights_point.pos.shape[0])
        ]
        self.lights_direct = [
            dict(direction=g(scene.lights_direct.direction[i]),
                 color=g(scene.lights_direct.color[i]),
                 intensity=float(scene.lights_direct.intensity[i]))
            for i in range(scene.lights_direct.direction.shape[0])
        ]

        # RGBA8 storage policy mirror (texture.quantize_u8): texels are
        # stored u8 on the device — the reference's GL internal format —
        # so the oracle quantises level 0 and every mip level identically.
        q8 = _quantize_u8
        self.tex_sphere = [q8(np.asarray(t, np.float64)) for t in textures.sphere]
        self.tex_ring = None if textures.ring is None else q8(np.asarray(textures.ring, np.float64))
        self.tex_box = None if textures.box is None else q8(np.asarray(textures.box, np.float64))
        self.cubemap = None if textures.cubemap is None else q8(np.asarray(textures.cubemap, np.float64))
        self.cfg = cfg
        # mip pyramids + sample cone angle (texture.py LOD policy mirror)
        if cfg.texture_lod:
            self.mips_sphere = [_build_mips(t) for t in self.tex_sphere]
            self.mips_ring = None if self.tex_ring is None else _build_mips(self.tex_ring)
            self.mips_box = None if self.tex_box is None else _build_mips(self.tex_box)
            self.pix_angle = 1.0 / (cfg.height * cfg.supersample)
        else:
            self.pix_angle = None


# -- texture sampling ------------------------------------------------------

def _bilinear(tex, u, v, wrap="repeat"):
    H, W = tex.shape[0], tex.shape[1]
    x = u * W - 0.5
    y = v * H - 0.5
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    fx, fy = x - x0, y - y0

    def wx(i):
        return i % W if wrap == "repeat" else min(max(i, 0), W - 1)

    def wy(i):
        return i % H if wrap == "repeat" else min(max(i, 0), H - 1)

    c00 = tex[wy(y0), wx(x0)]
    c01 = tex[wy(y0), wx(x0 + 1)]
    c10 = tex[wy(y0 + 1), wx(x0)]
    c11 = tex[wy(y0 + 1), wx(x0 + 1)]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


_MIP_MIN_SIZE = 4      # texture.py MIP_MIN_SIZE
_LOD_COS_MIN = 0.125   # texture.py LOD_COS_MIN


def _quantize_u8(x):
    """RGBA8 storage (texture.quantize_u8 mirror): round-half-even like
    jnp.round/np.round."""
    return np.round(np.clip(x, 0.0, 1.0) * 255.0) / 255.0


def _build_mips(tex):
    """2×2 box-filtered pyramid, same stopping rule as build_mip_atlas;
    every level RGBA8-quantised with the INTEGER-exact downsample
    (a+b+c+d+2)>>2 (texture.mip_down_u8 mirror) — float means tie at
    k+0.5 for a quarter of quads and f32/f64 would break ties
    differently.  Callers pass level 0 already quantised."""
    levels = [tex]
    while True:
        t = levels[-1]
        H, W = t.shape[0], t.shape[1]
        if H % 2 or W % 2 or H // 2 < _MIP_MIN_SIZE or W // 2 < _MIP_MIN_SIZE:
            break
        r = t.reshape(H // 2, 2, W // 2, 2, t.shape[-1])
        si = (np.round(r[:, 0, :, 0] * 255.0).astype(np.int64)
              + np.round(r[:, 0, :, 1] * 255.0).astype(np.int64)
              + np.round(r[:, 1, :, 0] * 255.0).astype(np.int64)
              + np.round(r[:, 1, :, 1] * 255.0).astype(np.int64))
        levels.append(((si + 2) >> 2).astype(t.dtype) / 255.0)
    return levels


def _trilinear(levels, u, v, lod):
    # lod clamps to L-1-eps, not L-1: the device's one-gather block sampler
    # always reads a real (l0, l0+1) mip pair (texture.BLOCK_LOD_EPS).
    L = len(levels)
    lod = min(max(float(lod), 0.0), max(float(L - 1) - 1.0 / 1024.0, 0.0))
    l0 = int(np.floor(lod))
    l1 = min(l0 + 1, L - 1)
    f = lod - l0
    return _bilinear(levels[l0], u, v) * (1.0 - f) + _bilinear(levels[l1], u, v) * f


def _footprint_world(t, cos_in, pix_angle):
    return t * pix_angle / max(cos_in, _LOD_COS_MIN)


def _lod_from_texels(texels):
    return np.log2(max(texels, 1.0))


def _lod_sphere(fw, radius, shape0):
    H, W = shape0
    tpw = max(W / (2.0 * PI), H / PI) / max(radius, 1e-6)
    return _lod_from_texels(fw * tpw)


def _lod_box(fw, shape0):
    H, W = shape0
    return _lod_from_texels(fw * (0.5 * max(H, W)))


def _lod_ring(fw, r1_sq, r2_sq, shape0):
    H, W = shape0
    rm = np.sqrt(max(0.5 * (r1_sq + r2_sq), 1e-12))
    tpw = max(W * 2.0 * rm / max(r2_sq - r1_sq, 1e-12), H / (PI * rm))
    return _lod_from_texels(fw * tpw)


def _cubemap_sample(cm, d):
    x, y, z = d
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face, ma = (0, ax) if x >= 0 else (1, ax)
        sc = -z if x >= 0 else z
        tc = -y
    elif ay >= az:
        face, ma = (2, ay) if y >= 0 else (3, ay)
        sc = x
        tc = z if y >= 0 else -z
    else:
        face, ma = (4, az) if z >= 0 else (5, az)
        sc = x if z >= 0 else -x
        tc = -y
    ma = max(ma, 1e-20)
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return _bilinear(cm[face], u, v, wrap="clamp")[:3]


# -- intersectors (scalar, straight off rt.frag) ---------------------------

def _i_sphere(ro, rd, pos, radius, hollow, tmin):
    oc = ro - pos
    b = np.dot(oc, rd)
    c = np.dot(oc, oc) - radius * radius
    h = b * b - c
    if h < 0:
        return None
    hs = np.sqrt(h)
    t = -b - hs
    if hollow and t < 0:
        t = -b + hs
    return t if 0 < t < tmin else None


def _i_plane(ro, rd, n, p, tmin, one_side):
    denom = np.clip(np.dot(n, rd), -1.0, 1.0)
    if one_side:
        if not denom < -1e-6:
            return None
    else:
        if not abs(denom) > 1e-6:
            return None
    t = np.dot(p - ro, n) / denom
    return t if 0 < t < tmin else None


def _i_ring(ro, rd, ring, tmin):
    rd = _rot(ring["quat"], rd)
    ro = _rot(ring["quat"], ro - ring["pos"])
    if rd[2] == 0:
        return None
    t = -ro[2] / rd[2]
    x = ro[0] + rd[0] * t
    y = ro[1] + rd[1] * t
    p = x * x + y * y
    if 0 < t < tmin and ring["r1"] < p < ring["r2"]:
        return t
    return None


def _ring_uv(ro, rd, t, ring):
    rd = _rot(ring["quat"], rd)
    ro = _rot(ring["quat"], ro - ring["pos"])
    x = ro[0] + rd[0] * t
    y = ro[1] + rd[1] * t
    p = x * x + y * y
    cosv = x / max(np.sqrt(p), 1e-20)
    return ((p - ring["r1"]) / (ring["r2"] - ring["r1"]), cosv)


def _i_box(ro, rd, box, tmin):
    rdd = _rot(box["quat"], rd)
    roo = _rot(box["quat"], ro - box["pos"])
    # same semantics as txr.geometry.intersect._safe_recip (incl. -0.0 -> +big)
    mag = np.maximum(np.abs(rdd), 1e-30)
    m = np.where(rdd >= 0, 1.0, -1.0) / mag
    n = m * roo
    k = np.abs(m) * box["form"]
    t1 = -n - k
    t2 = -n + k
    tN = t1.max()
    tF = t2.min()
    if tN > tF or tF < 0:
        return None
    return tN if tN < tmin else None


def _box_normal(ro, rd, box):
    rdd = _rot(box["quat"], rd)
    roo = _rot(box["quat"], ro - box["pos"])
    # same semantics as txr.geometry.intersect._safe_recip (incl. -0.0 -> +big)
    mag = np.maximum(np.abs(rdd), 1e-30)
    m = np.where(rdd >= 0, 1.0, -1.0) / mag
    n = m * roo
    k = np.abs(m) * box["form"]
    t1 = -n - k
    step1 = (t1 >= t1[[1, 2, 0]]).astype(np.float64)
    step2 = (t1 >= t1[[2, 0, 1]]).astype(np.float64)
    nor = -np.sign(rdd) * step1 * step2
    return _rot(_quat_inv(box["quat"]), nor)


def _i_surface(ro, rd, s, tmin):
    oro, ord_ = ro, rd
    ro = _rot(s["quat"], ro - s["pos"])
    rd = _rot(s["quat"], rd)
    a, b, c, d, e, f = s["coef"]
    d1, d2, d3 = rd
    o1, o2, o3 = ro
    p1 = 2 * a * d1 * o1 + 2 * b * d2 * o2 + 2 * c * d3 * o3 + d * d3 + d2 * e
    p2 = a * d1 * d1 + b * d2 * d2 + c * d3 * d3
    p3 = a * o1 * o1 + b * o2 * o2 + c * o3 * o3 + d * o3 + e * o2 + f
    if abs(p2) < 1e-6:
        return None  # shared decision: degenerate direction = miss
    disc = p1 * p1 - 4 * p2 * p3
    if disc < 0:
        return None
    p4 = np.sqrt(disc)
    t1 = (-p1 - p4) / (2 * p2)
    t2 = (-p1 + p4) / (2 * p2)
    eps = 1e-4
    tn, tf = np.inf, np.inf
    if t1 > eps and t1 < tn:
        tn, tf = t1, t2
    if t2 > eps and t2 < tn:
        tn, tf = t2, t1

    def between(t):
        pt = ord_ * t + oro
        return np.all(pt > s["v_min"]) and np.all(pt < s["v_max"])

    if not (np.isfinite(tn) and between(tn)):
        if tf < eps or not np.isfinite(tf) or not between(tf):
            return None
        tn = tf
    return tn if tn < tmin else None


def _surface_normal(ro, rd, t, s):
    ro = _rot(s["quat"], ro - s["pos"])
    rd = _rot(s["quat"], rd)
    tm = rd * t + ro
    a, b, c, d, e, f = s["coef"]
    n = np.array([2 * a * tm[0], 2 * b * tm[1] + e, 2 * c * tm[2] + d])
    return _nrm(_rot(_quat_inv(s["quat"]), n))


def _i_torus(ro, rd, torus, tmin):
    ro = _rot(torus["quat"], ro - torus["pos"])
    rd = _rot(torus["quat"], rd)
    R, r = torus["form"]
    # Durand-Kerner on the quartic, complex128 (same iteration as the
    # device path / rt.frag:462-487, higher precision)
    A = np.dot(rd, rd)
    B = 2.0 * np.dot(ro, rd)
    C = np.dot(ro, ro) + R * R - r * r
    a2 = rd[0] ** 2 + rd[1] ** 2
    b2 = 2.0 * (ro[0] * rd[0] + ro[1] * rd[1])
    c2 = ro[0] ** 2 + ro[1] ** 2
    c4 = np.array(
        [A * A, 2 * A * B, B * B + 2 * A * C - 4 * R * R * a2,
         2 * B * C - 4 * R * R * b2, C * C - 4 * R * R * c2]
    )

    def feval(z):
        return (((c4[0] * z + c4[1]) * z + c4[2]) * z + c4[3]) * z + c4[4]

    roots = [1.0 + 0j, 0.4 + 0.9j, (0.4 + 0.9j) ** 2, (0.4 + 0.9j) ** 3]
    for _ in range(60):
        err = 0.0
        for i in range(4):
            others = [roots[j] for j in range(4) if j != i]
            denom = np.prod([roots[i] - o for o in others])
            if denom == 0:
                denom = 1e-30
            delta = feval(roots[i]) / denom
            roots[i] = roots[i] - delta
            err = max(err, abs(delta.real), abs(delta.imag))
        if err < 1e-3:
            break
    def fpeval(z):
        return ((4 * c4[0] * z + 3 * c4[1]) * z + 2 * c4[2]) * z + c4[3]

    best = 1e4
    for z in roots:
        # complex Newton polish pre-acceptance: tightens DK roots so the
        # |imag| acceptance is exact (the device path reaches the same
        # decision through Ferrari's discriminant — torus.py module doc)
        for _ in range(3):
            fp = fpeval(z)
            if abs(fp) ** 2 < 1e-30:
                break
            z = z - feval(z) / fp
        if abs(z.imag) <= 1e-3 and z.real >= 0:
            best = min(best, z.real)
    # two real Newton polishes on the winner, same as the device path
    if 0 < best < 100:
        for _ in range(2):
            fp = fpeval(best).real
            if abs(fp) > 1e-6:
                best = best - feval(best).real / fp
        return best if best < tmin else None
    return None


def _torus_normal(ro, rd, t, torus):
    ro = _rot(torus["quat"], ro - torus["pos"])
    rd = _rot(torus["quat"], rd)
    p = ro + rd * t
    R, r = torus["form"]
    n = p * (np.dot(p, p) - r * r - R * R * np.array([1.0, 1.0, -1.0]))
    return _nrm(_rot(_quat_inv(torus["quat"]), n))


# -- scene queries ---------------------------------------------------------

def _calc_inter(S: OracleScene, ro, rd):
    tmin, num, typ = MAX_DIST, -1, -1
    for i, p in enumerate(S.planes):
        t = _i_plane(ro, rd, p["normal"], p["pos"], tmin, S.cfg.plane_oneside)
        if t is not None:
            tmin, num, typ = t, i, T_PLANE
    for i, s in enumerate(S.spheres):
        t = _i_sphere(ro, rd, s["pos"], s["radius"], s["hollow"], tmin)
        if t is not None:
            tmin, num, typ = t, i, T_SPHERE
    for i, s in enumerate(S.surfaces):
        t = _i_surface(ro, rd, s, tmin)
        if t is not None:
            tmin, num, typ = t, i, T_SURFACE
    for i, b in enumerate(S.boxes):
        t = _i_box(ro, rd, b, tmin)
        if t is not None:
            tmin, num, typ = t, i, T_BOX
    for i, to in enumerate(S.toruses):
        t = _i_torus(ro, rd, to, tmin)
        if t is not None:
            tmin, num, typ = t, i, T_TORUS
    for i, r in enumerate(S.rings):
        t = _i_ring(ro, rd, r, tmin)
        if t is not None:
            tmin, num, typ = t, i, T_RING
    for i, l in enumerate(S.lights_point):
        t = _i_sphere(ro, rd, l["pos"], l["radius"], False, tmin)
        if t is not None:
            tmin, num, typ = t, i, T_LIGHT
    return tmin, num, typ


def _in_shadow(S: OracleScene, ro, rd, dist):
    shadow = 0.0
    for s in S.spheres:
        if _i_sphere(ro, rd, s["pos"], s["radius"], False, dist) is not None:
            shadow = 1.0
    for s in S.surfaces:
        if _i_surface(ro, rd, s, dist) is not None:
            shadow = 1.0
    for b in S.boxes:
        if _i_box(ro, rd, b, dist) is not None:
            shadow = 1.0
    for to in S.toruses:
        if _i_torus(ro, rd, to, dist) is not None:
            shadow = 1.0
    for r in S.rings:
        t = _i_ring(ro, rd, r, dist)
        if t is not None:
            if r["tex"] > 0 and S.tex_ring is not None:
                u, v = _ring_uv(ro, rd, t, r)
                shadow += _bilinear(S.tex_ring, u, v)[3]
            else:
                shadow = 1.0
    if not S.cfg.plane_oneside:
        for p in S.planes:
            if _i_plane(ro, rd, p["normal"], p["pos"], dist, False) is not None:
                shadow = 1.0
    return min(shadow, 1.0)


def _calc_shade(S: OracleScene, pt, rd, mat, normal, do_shadow):
    pixel = S.ambient * mat["color"]
    diffuse = np.zeros(3)
    specular = np.zeros(3)

    def shade2(light_dir, light_color, intensity, dist, dist_div):
        nonlocal diffuse, specular
        ld = _nrm(light_dir)
        dp = np.clip(np.dot(normal, ld), 0.0, 1.0)
        lc = light_color * dp
        if S.cfg.shadow_enabled and do_shadow:
            sh = 1.0 - _in_shadow(S, pt, ld, dist)
            lc = lc * np.maximum(sh, S.shadow_ambient)
        diffuse += lc * mat["color"] * mat["diffuse"] * intensity / dist_div
        if mat["specular"] > 0:
            refl = _reflect(ld, normal)
            sdp = np.clip(np.dot(rd, refl), 0.0, 1.0)
            specular += lc * max(sdp, 1e-12) ** mat["specular"] * intensity / dist_div

    for l in S.lights_point:
        light_dir = l["pos"] - pt
        dist = np.linalg.norm(light_dir)
        dist_div = 1.0 + l["linear_k"] * dist + l["quadratic_k"] * dist * dist
        shade2(light_dir, l["color"], l["intensity"], dist, dist_div)
    for l in S.lights_direct:
        shade2(-l["direction"], l["color"], l["intensity"], MAX_DIST, 1.0)
    return pixel + diffuse * mat["kd"] + specular * mat["ks"]


def _fresnel_schlick(n, rd, reflection):
    ndotv = np.clip(np.dot(n, -rd), 0.0, 1.0)
    return reflection + (1.0 - reflection) * (1.0 - ndotv) ** 5


def _fresnel_reflect_amount(n1, n2, rd, n, refl, do_fresnel):
    if not do_fresnel:
        return refl
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    cos_x = -np.dot(rd, n)
    if n1 > n2:
        ratio = n1 / n2
        sin_t2 = ratio * ratio * (1.0 - cos_x * cos_x)
        if sin_t2 > 1.0:
            return 1.0
        cos_x = np.sqrt(1.0 - sin_t2)
    x = 1.0 - cos_x
    ret = r0 + (1.0 - r0) * x ** 5
    return refl + (1.0 - refl) * ret


def _hit_info(S: OracleScene, ro, rd, pt, t, num, typ):
    alpha = 1.0

    def fw_of(normal):
        if S.pix_angle is None:
            return None
        return _footprint_world(t, abs(float(np.dot(rd, normal))), S.pix_angle)

    if typ == T_SPHERE:
        s = S.spheres[num]
        mat = dict(s["mat"])
        normal = _nrm(pt - s["pos"])
        if s["tex"] > 0 and s["tex"] <= len(S.tex_sphere):
            sn = _rot(s["quat"], normal)
            u = 0.5 + np.arctan2(sn[2], sn[0]) / (2 * PI)
            v = 0.5 - np.arcsin(np.clip(sn[1], -1, 1)) / PI
            fw = fw_of(normal)
            tex0 = S.tex_sphere[s["tex"] - 1]
            if fw is None:
                c = _bilinear(tex0, u, v)
            else:
                lod = _lod_sphere(fw, s["radius"], tex0.shape[:2])
                c = _trilinear(S.mips_sphere[s["tex"] - 1], u, v, lod)
            mat["color"] = c[:3]
            alpha = c[3]
    elif typ == T_PLANE:
        p = S.planes[num]
        mat = dict(p["mat"])
        normal = _nrm(p["normal"])
    elif typ == T_SURFACE:
        s = S.surfaces[num]
        mat = dict(s["mat"])
        normal = _surface_normal(ro, rd, t, s)
    elif typ == T_BOX:
        b = S.boxes[num]
        mat = dict(b["mat"])
        normal = _box_normal(ro, rd, b)
        if b["tex"] > 0 and S.tex_box is not None:
            pos = _rot(b["quat"], b["pos"])
            p = _rot(b["quat"], pt)
            nn = _rot(b["quat"], normal)
            fw = fw_of(normal)
            if fw is None:
                fetch = lambda u, v: _bilinear(S.tex_box, u, v)
            else:
                lod = _lod_box(fw, S.tex_box.shape[:2])
                fetch = lambda u, v: _trilinear(S.mips_box, u, v, lod)
            c = (
                abs(nn[0]) * fetch(0.5 * (p[2] - pos[2]) - 0.5, 0.5 * (p[1] - pos[1]) - 0.5)
                + abs(nn[1]) * fetch(0.5 * (p[2] - pos[2]) - 0.5, 0.5 * (p[0] - pos[0]) - 0.5)
                + abs(nn[2]) * fetch(0.5 * (p[0] - pos[0]) - 0.5, 0.5 * (p[1] - pos[1]) - 0.5)
            )
            mat["color"] = c[:3]
    elif typ == T_TORUS:
        to = S.toruses[num]
        mat = dict(to["mat"])
        normal = _torus_normal(ro, rd, t, to)
    elif typ == T_RING:
        r = S.rings[num]
        mat = dict(r["mat"])
        normal = _rot(_quat_inv(r["quat"]), np.array([0.0, 0.0, -1.0]))
        if r["tex"] > 0 and S.tex_ring is not None:
            u, v = _ring_uv(ro, rd, t, r)
            fw = fw_of(normal)
            if fw is None:
                c = _bilinear(S.tex_ring, u, v)
            else:
                lod = _lod_ring(fw, r["r1"], r["r2"], S.tex_ring.shape[:2])
                c = _trilinear(S.mips_ring, u, v, lod)
            mat["color"] = c[:3]
            alpha = c[3]
    else:
        raise AssertionError(typ)
    bias = (9e-3 * np.linalg.norm(pt - ro) + 35.0) / 35e3
    return mat, normal, bias, alpha


def _reflected_color(S: OracleScene, ro, rd):
    t, num, typ = _calc_inter(S, ro, rd)
    if typ == T_LIGHT:
        return S.lights_point[num]["color"].copy()
    if t < MAX_DIST:
        pt = ro + rd * t
        mat, n, bias, _ = _hit_info(S, ro, rd, pt, t, num, typ)
        ro2 = pt + n * bias if np.dot(rd, n) < 0 else pt - n * bias
        return _calc_shade(S, ro2, rd, mat, n, True)
    return np.zeros(3)


def _trace_pixel(S: OracleScene, ro, rd):
    cfg = S.cfg
    mask = np.ones(3)
    color = np.zeros(3)
    absorb_distance = 0.0
    i = 0
    steps = 0
    while i < cfg.iterations and steps < cfg.max_steps:
        steps += 1
        tm, num, typ = _calc_inter(S, ro, rd)
        if tm >= MAX_DIST:
            if S.cubemap is not None:
                color += _cubemap_sample(S.cubemap, rd) * mask
            else:
                color += S.bg * mask
            break
        pt = ro + rd * tm
        if typ == T_LIGHT:
            color += S.lights_point[num]["color"] * mask
            break
        mat, n, bias, alpha = _hit_info(S, ro, rd, pt, tm, num, typ)
        outside = np.dot(rd, n) < 0
        if not outside:
            n = -n
        if cfg.total_internal_reflection and mat["refract"] > 0:
            rm = _fresnel_reflect_amount(
                1.0 if outside else mat["refract"],
                mat["refract"] if outside else 1.0,
                rd, n, mat["reflect"], cfg.do_fresnel,
            )
        else:
            rm = _fresnel_schlick(n, rd, mat["reflect"])
        refr_m = 1.0 - rm

        if mat["refract"] > 0:
            if outside and mat["reflect"] > 0 and cfg.refractive_glossy:
                color += _reflected_color(S, pt + n * bias, _reflect(rd, n)) * rm * mask
                mask = mask * refr_m
            elif not outside:
                absorb_distance += tm
                mask = mask * np.exp(-mat["absorb"] * absorb_distance)
            if cfg.total_internal_reflection and rm >= 1.0:
                break
            ro = pt - n * bias
            rd = _refract(rd, n, 1.0 / mat["refract"] if outside else mat["refract"])
            if not cfg.reflect_reduce_iteration:
                i += 1
        elif mat["reflect"] > 0:
            ro = pt + n * bias
            color += _calc_shade(S, ro, rd, mat, n, True) * refr_m * mask
            rd = _reflect(rd, n)
            mask = mask * rm
            i += 1
        else:
            color += _calc_shade(S, pt + n * bias, rd, mat, n, True) * mask * alpha
            if alpha < 1.0:
                ro = pt - n * bias
                mask = mask * (1.0 - alpha)
                i += 1
            else:
                break
    return color


def render_oracle(scene, textures, cfg, pixels=None):
    """Render with the float64 oracle → [H, W, 3] float64 (row 0 = top).
    Slow (pure python per pixel) — use small images in tests.

    ``pixels``: optional list of (row, col) — render ONLY those pixels
    (incl. their supersamples) and return [len(pixels), 3].  The
    finite-difference gradient tests evaluate single interior pixels, so
    this cuts their oracle cost by the full image area."""
    S = OracleScene(scene, textures, cfg)
    ss = cfg.supersample
    H, W = cfg.height, cfg.width

    def sample(row, col):
        gl_y = H - (row + 0.5) / ss
        gl_x = (col + 0.5) / ss
        d = np.array([
            (gl_x - W / 2.0) / H,
            (gl_y - H / 2.0) / H,
            1.0,
        ])
        rd = _nrm(_rot(S.cam_quat, d))
        return _trace_pixel(S, S.cam_pos.copy(), rd)

    if pixels is not None:
        out = np.zeros((len(pixels), 3))
        for k, (prow, pcol) in enumerate(pixels):
            acc = np.zeros(3)
            for sy in range(ss):
                for sx in range(ss):
                    acc += sample(prow * ss + sy, pcol * ss + sx)
            out[k] = acc / (ss * ss)
        return out

    img = np.zeros((H * ss, W * ss, 3))
    for row in range(H * ss):
        for col in range(W * ss):
            img[row, col] = sample(row, col)
    if ss > 1:
        img = img.reshape(H, ss, W, ss, 3).mean(axis=(1, 3))
    return img
