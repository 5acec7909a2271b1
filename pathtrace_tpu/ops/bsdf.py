"""Branchless masked BSDF lanes.

The reference dispatches materials through ``Box<dyn Material>`` virtual calls
(material.rs:5-65). On TPU every ray in a wave evaluates **all** material lanes
(Lambertian, Oren–Nayar, Emissive, GGX Mirror) with plain vector math and the
result is selected by ``mat_kind`` via ``jnp.where`` — no divergence, full VPU
occupancy. Formulas mirror the reference term-for-term:

* Lambertian: material.rs:67-123
* Oren–Nayar: material.rs:165-296
* Emissive: material.rs:125-163 (zero BSDF, pdf 1)
* Mirror (GGX metal/dielectric): mirror.rs:5-320 — VNDF sampling (Heitz
  construction, mirror.rs:17-60), Schlick Fresnel with metallic-lerped F0
  (mirror.rs:126-132), numerically-stable Smith G1/height-correlated G2
  (mirror.rs:136-175), stochastic reflect/refract with probability = Fresnel.x
  (mirror.rs:219-232), Walter BTDF jacobian (mirror.rs:90-124), and the
  non-finite → zero-BSDF guards (mirror.rs:258-265, 292-300) as masks.

Conventions: ``i`` is the unit vector *toward* the viewer (``-ray.direction``),
``o`` the outgoing sample, ``normal`` the face-forwarded shading normal,
``eta`` the IOR ratio carried on the ray (camera.rs:6, rendering.rs:20-25).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import materials as mat
from ..models.scene import Scene
from ..utils import vec

_PI = jnp.pi

# Material tables larger than this fall back to plain gathers.
_ONEHOT_MAX = 4096


class MatParams(NamedTuple):
    """Per-ray material parameters, resolved once per bounce."""

    kind: jnp.ndarray       # (N,) int32
    color: jnp.ndarray      # (N, 3)
    emission: jnp.ndarray   # (N, 3)
    roughness: jnp.ndarray  # (N,)
    metallic: jnp.ndarray   # (N,)
    ior: jnp.ndarray        # (N,)


def mat_of(scene: Scene, mid) -> MatParams:
    """Resolve material ids to parameter rows.

    TPU gathers of (N,) vectors from small tables measured ~2 ms each at
    production wave sizes; a one-hot (N,M)@(M,12) matmul fetches every column
    in one MXU pass instead. Falls back to gathers for huge tables.
    """
    m_rows = scene.mat_kind.shape[0]
    if m_rows <= _ONEHOT_MAX and jax.default_backend() != "cpu":
        dtype = scene.mat_color.dtype
        table = jnp.concatenate(
            [
                scene.mat_kind[:, None].astype(dtype),
                scene.mat_color,
                scene.mat_emission,
                scene.mat_roughness[:, None],
                scene.mat_metallic[:, None],
                scene.mat_ior[:, None],
            ],
            axis=1,
        )  # (M, 12)
        onehot = (mid[:, None] == jnp.arange(m_rows, dtype=mid.dtype)[None, :])
        row = jnp.dot(
            onehot.astype(dtype), table,
            preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST,
        )
        return MatParams(
            kind=row[:, 0].astype(jnp.int32),
            color=row[:, 1:4],
            emission=row[:, 4:7],
            roughness=row[:, 7],
            metallic=row[:, 8],
            ior=row[:, 9],
        )
    return MatParams(
        kind=scene.mat_kind[mid],
        color=scene.mat_color[mid],
        emission=scene.mat_emission[mid],
        roughness=scene.mat_roughness[mid],
        metallic=scene.mat_metallic[mid],
        ior=scene.mat_ior[mid],
    )


def _gather_mat(scene: Scene, mid):
    m = mat_of(scene, mid)
    return dict(
        kind=m.kind, color=m.color, emission=m.emission,
        roughness=m.roughness, metallic=m.metallic, ior=m.ior,
    )


def emitted_params(m: MatParams):
    """Emission of resolved materials; the ``emit()`` probe (material.rs:160-163)."""
    return jnp.where((m.kind == mat.KIND_EMISSIVE)[:, None], m.emission, 0.0)


def is_emissive_params(m: MatParams):
    return (m.kind == mat.KIND_EMISSIVE) & (vec.length(m.emission) > 0.0)


def emitted(scene: Scene, mid):
    return emitted_params(mat_of(scene, mid))


def is_emissive(scene: Scene, mid):
    return is_emissive_params(mat_of(scene, mid))


# ---------------------------------------------------------------------------
# Shared GGX helpers (mirror.rs:66-175)
# ---------------------------------------------------------------------------

def _ggx_d(alpha2, n_dot_h):
    # Algebraically nh²(α²-1)+1 (mirror.rs:69), but computed as
    # α²c² + (1-c)(1+c): the reference's f64 form cancels catastrophically in
    # f32 when nh→1 and α is small (denominator ~α² ≪ f32 eps around 1).
    c = jnp.minimum(jnp.abs(n_dot_h), 1.0)
    denom = alpha2 * c * c + (1.0 - c) * (1.0 + c)
    return alpha2 / (_PI * denom * denom)


def _smith_g1(alpha2, cos_theta):
    """G1 = 2c / (c + sqrt(α² + (1-α²)c²)); 0 for c ≤ 0 (mirror.rs:136-149)."""
    term = jnp.sqrt(alpha2 + (1.0 - alpha2) * cos_theta * cos_theta)
    g = 2.0 * cos_theta / (cos_theta + term)
    return jnp.where(cos_theta > 0.0, g, 0.0)


def _smith_g2(alpha2, cos_i, cos_o):
    """Height-correlated G2 via λ (mirror.rs:153-175); 0 if either cos ≤ 0."""
    def lam(c):
        num = jnp.sqrt(alpha2 + (1.0 - alpha2) * c * c)
        return (num - c) / (2.0 * c)

    g = 1.0 / (1.0 + lam(cos_i) + lam(cos_o))
    return jnp.where((cos_i > 0.0) & (cos_o > 0.0), g, 0.0)


def _fresnel(color, metallic, ior, cos_theta):
    """Schlick with F0 lerped between dielectric-from-IOR and tint
    (mirror.rs:126-132). Returns (N,3)."""
    f0d = ((1.0 - ior) / (1.0 + ior)) ** 2
    f0 = f0d[:, None] * (1.0 - metallic)[:, None] + color * metallic[:, None]
    return f0 + (1.0 - f0) * ((1.0 - cos_theta) ** 5)[:, None]


def sample_ggx_vndf(view, normal, roughness, r1, r2):
    """Heitz VNDF half-vector sample in the reference's exact construction
    (mirror.rs:17-60), including its tangent-frame convention."""
    alpha = roughness * roughness
    tangent, bitangent = vec.tangent_frame(normal)
    v_local = jnp.stack(
        [vec.dot(view, tangent), vec.dot(view, bitangent), vec.dot(view, normal)],
        axis=-1,
    )
    vh = vec.normalize(
        jnp.stack([alpha * v_local[..., 0], alpha * v_local[..., 1], v_local[..., 2]], axis=-1)
    )
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-38))
    t1 = jnp.where(
        (lensq > 0.0)[..., None],
        jnp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1),
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = vec.cross(vh, t1)

    r = jnp.sqrt(r1)
    phi = 2.0 * _PI * r2
    t1c = r * jnp.cos(phi)
    t2c = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    t2c = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1c * t1c, 0.0)) + s * t2c

    nh = (
        t1 * t1c[..., None]
        + t2 * t2c[..., None]
        + vh * jnp.sqrt(jnp.maximum(1.0 - t1c * t1c - t2c * t2c, 0.0))[..., None]
    )
    ne = vec.normalize(
        jnp.stack(
            [alpha * nh[..., 0], alpha * nh[..., 1], jnp.maximum(nh[..., 2], 0.0)], axis=-1
        )
    )
    return vec.normalize(
        tangent * ne[..., 0:1] + bitangent * ne[..., 1:2] + normal * ne[..., 2:3]
    )


# ---------------------------------------------------------------------------
# Evaluation: bsdf_pdf (NEE / MIS weight queries)
# ---------------------------------------------------------------------------

def _eval_lambert(color, o, normal):
    brdf = jnp.broadcast_to(color / _PI, color.shape)
    pdf = jnp.maximum(vec.dot(o, normal), 0.0) / _PI
    return brdf, pdf


def _eval_oren_nayar(color, roughness, i, o, normal):
    sigma2 = roughness * roughness
    a = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33)
    b = 0.45 * sigma2 / (sigma2 + 0.09)

    cos_i = jnp.maximum(vec.dot(i, normal), 0.0)
    cos_o = jnp.maximum(vec.dot(o, normal), 0.0)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))

    tangent, bitangent = vec.tangent_frame(normal)
    phi_i = jnp.arctan2(vec.dot(i, bitangent), vec.dot(i, tangent))
    phi_o = jnp.arctan2(vec.dot(o, bitangent), vec.dot(o, tangent))
    cos_phi_diff = jnp.maximum(jnp.cos(phi_i - phi_o), 0.0)

    # α = max angle, β = min angle via the cos comparison (material.rs:240-256)
    i_steeper = cos_i > cos_o  # θi < θo
    tan_beta = jnp.where(
        i_steeper,
        jnp.where(cos_i > 1e-6, sin_i / jnp.maximum(cos_i, 1e-6), 0.0),
        jnp.where(cos_o > 1e-6, sin_o / jnp.maximum(cos_o, 1e-6), 0.0),
    )
    sin_alpha = jnp.where(i_steeper, sin_o, sin_i)

    term = a + b * cos_phi_diff * sin_alpha * tan_beta
    brdf = color * (term / _PI)[:, None]
    pdf = cos_o / _PI
    return brdf, pdf


def _eval_mirror(m, i, o, normal, eta):
    alpha = m["roughness"] * m["roughness"]
    alpha2 = alpha * alpha

    i_dot_n = vec.dot(i, normal)
    o_dot_n = vec.dot(o, normal)
    is_reflection = i_dot_n * o_dot_n > 0.0

    # BRDF branch (mirror.rs:62-88)
    h_r = vec.normalize(i + o)
    n_h_r = vec.dot(normal, h_r)
    d_r = _ggx_d(alpha2, n_h_r)
    i_n_r = jnp.maximum(i_dot_n, 0.0)
    o_n_r = jnp.maximum(o_dot_n, 0.0)
    g_r = _smith_g2(alpha2, i_n_r, o_n_r)
    cos_f = jnp.maximum(vec.dot(i, h_r), 0.0)
    f_r = _fresnel(m["color"], m["metallic"], m["ior"], cos_f)
    brdf = f_r * (d_r * g_r / (4.0 * i_n_r * o_n_r))[:, None]
    i_h_r = jnp.abs(vec.dot(i, h_r))
    pdf_r = d_r * jnp.abs(n_h_r) / (4.0 * i_h_r)

    # BTDF branch (mirror.rs:90-124)
    h_t = -vec.normalize(i * eta[:, None] + o)
    n_h_t = vec.dot(normal, h_t)
    d_t = _ggx_d(alpha2, n_h_t)
    i_n_t = jnp.abs(i_dot_n)
    o_n_t = jnp.abs(o_dot_n)
    g_t = _smith_g2(alpha2, i_n_t, o_n_t)
    i_h_t = vec.dot(i, h_t)
    o_h_t = vec.dot(o, h_t)
    denom_t = eta * i_h_t + o_h_t
    f_t = _fresnel(m["color"], m["metallic"], m["ior"], jnp.abs(i_h_t))
    btdf = (1.0 - f_t) * (
        d_t * g_t * jnp.abs(i_h_t) * jnp.abs(o_h_t) / (i_n_t * o_n_t * denom_t * denom_t)
    )[:, None]
    jac_t = jnp.abs(o_h_t) / (denom_t * denom_t)
    pdf_t = d_t * jnp.abs(n_h_t) * jac_t

    bsdf = jnp.where(is_reflection[:, None], brdf, btdf)
    pdf = jnp.where(is_reflection, pdf_r, pdf_t)

    # Metal blocks transmission entirely (mirror.rs:187-189)
    metal_block = (m["metallic"] > 0.99) & ~is_reflection
    bsdf = jnp.where(metal_block[:, None], 0.0, bsdf)
    pdf = jnp.where(metal_block, 1.0, pdf)
    return bsdf, pdf


def _pbr_weights(m, f_avg):
    """Specular/diffuse technique weights of the PBR blend
    (material.rs:344-348): specular by mean Fresnel, diffuse by what Fresnel
    lets through on the non-metallic fraction."""
    sw = f_avg
    dw = (1.0 - f_avg) * (1.0 - m["metallic"])
    return sw, dw


def _eval_pbr(m, i, o, normal):
    """PBRMaterial::bsdf_pdf (material.rs:311-355): specular GGX reflection
    (delegating to the Mirror BRDF branch, mirror.rs:62-88) plus Oren–Nayar
    diffuse scaled by the kd energy-conservation factor, with the pdf a
    Fresnel-weighted blend of the two techniques' pdfs."""
    alpha = m["roughness"] * m["roughness"]
    alpha2 = alpha * alpha

    # Specular: Mirror's reflection-only eval (mirror.rs:62-88).
    h = vec.normalize(i + o)
    n_h = vec.dot(normal, h)
    d_ggx = _ggx_d(alpha2, n_h)
    cos_i = jnp.maximum(vec.dot(i, normal), 0.0)
    cos_o = jnp.maximum(vec.dot(o, normal), 0.0)
    g2 = _smith_g2(alpha2, cos_i, cos_o)
    cos_f = jnp.maximum(vec.dot(i, h), 0.0)
    f = _fresnel(m["color"], m["metallic"], m["ior"], cos_f)
    spec_brdf = f * (d_ggx * g2 / (4.0 * cos_i * cos_o))[:, None]
    spec_pdf = d_ggx * jnp.abs(n_h) / (4.0 * jnp.abs(vec.dot(i, h)))

    # Diffuse: Oren–Nayar × kd (material.rs:332-341); metals don't diffuse.
    diff_raw, diff_pdf = _eval_oren_nayar(m["color"], m["roughness"], i, o, normal)
    kd = (1.0 - f) * (1.0 - m["metallic"])[:, None]
    diff_brdf = jnp.where((m["metallic"] < 1.0)[:, None], diff_raw * kd, 0.0)

    brdf = spec_brdf + diff_brdf
    f_avg = jnp.mean(f, axis=-1)
    sw, dw = _pbr_weights(m, f_avg)
    tw = sw + dw
    pdf = jnp.where(
        tw > 1e-6, (sw * spec_pdf + dw * diff_pdf) / jnp.maximum(tw, 1e-6), spec_pdf
    )
    # Below-horizon queries (o·n <= 0, impossible for an opaque blend) can
    # produce 0/0 above; zero them like the Mirror lane's guards.
    bad = (cos_o <= 0.0) | ~jnp.all(jnp.isfinite(brdf), axis=-1) | ~jnp.isfinite(pdf)
    brdf = jnp.where(bad[:, None], 0.0, brdf)
    pdf = jnp.where(bad, 1.0, pdf)
    return brdf, pdf


def _sample_pbr(m, i, normal, r1, r2, u_coin, d_diff):
    """PBRMaterial sampling (material.rs:358-388): a coin weighted by the
    approximate Fresnel from the *incoming* angle picks specular vs diffuse,
    then the default-impl semantics evaluate the blended bsdf_pdf at the
    sampled direction (material.rs:29-40, cos clamped >= 0).

    Upstream the specular branch delegates to ``Mirror::sample_direction``,
    which is an explicit dummy returning the normal (mirror.rs:307-315) —
    the material is dead code. This lane substitutes the evidently intended
    GGX VNDF reflection sample; the diffuse branch reuses the shared
    cosine-hemisphere sample ``d_diff`` (material.rs:267-295).
    """
    cos_i = jnp.maximum(vec.dot(i, normal), 0.0)
    f0s = jnp.where(
        m["metallic"] > 0.5, jnp.mean(m["color"], axis=-1), 0.04
    )
    f_approx = f0s + (1.0 - f0s) * (1.0 - cos_i) ** 5
    sw, dw = _pbr_weights(m, f_approx)
    tw = sw + dw
    p_spec = jnp.where(tw > 1e-6, sw / jnp.maximum(tw, 1e-6), 1.0)
    use_spec = u_coin < p_spec

    h = sample_ggx_vndf(i, normal, m["roughness"], r1, r2)
    o_spec = vec.normalize(2.0 * vec.dot(i, h)[:, None] * h - i)

    o = jnp.where(use_spec[:, None], o_spec, d_diff)
    bsdf, pdf = _eval_pbr(m, i, o, normal)
    cos = jnp.maximum(vec.dot(o, normal), 0.0)

    bad = (
        ~jnp.all(jnp.isfinite(bsdf), axis=-1)
        | ~jnp.isfinite(pdf)
        | (pdf <= 0.0)
    )
    o = jnp.where(bad[:, None], normal, o)
    bsdf = jnp.where(bad[:, None], 0.0, bsdf)
    pdf = jnp.where(bad, 1.0, pdf)
    cos = jnp.where(bad, 0.0, cos)
    return o, bsdf, pdf, cos


def eval_bsdf(scene: Scene, mid, i, eta, o, normal, params: MatParams | None = None):
    """``Material::bsdf_pdf`` for a wave: returns ``(bsdf (N,3), pdf (N,))``.

    ``eta`` is the per-ray IOR ratio the *incoming* ray carries — note the
    reference evaluates NEE with the eta set at the previous vertex
    (rendering.rs:72 runs before :83 overwrites it), replicated by the caller.

    Pass ``params`` (from :func:`mat_of`) to reuse an already-resolved
    material row instead of re-resolving ``mid``.
    """
    m = _gather_mat(scene, mid) if params is None else dict(
        kind=params.kind, color=params.color, emission=params.emission,
        roughness=params.roughness, metallic=params.metallic, ior=params.ior,
    )
    kind = m["kind"]

    # Static lane gates: lanes absent from the scene's material table skip
    # their math entirely (their kind selector can never be true).
    use_on = getattr(scene, "has_oren_nayar", True)
    use_mir = getattr(scene, "has_mirror", True)

    lam_bsdf, lam_pdf = _eval_lambert(m["color"], o, normal)
    on_bsdf, on_pdf = (
        _eval_oren_nayar(m["color"], m["roughness"], i, o, normal)
        if use_on else (lam_bsdf, lam_pdf)
    )
    mir_bsdf, mir_pdf = (
        _eval_mirror(m, i, o, normal, eta) if use_mir else (lam_bsdf, lam_pdf)
    )

    bsdf = jnp.where(
        (kind == mat.KIND_LAMBERT)[:, None],
        lam_bsdf,
        jnp.where(
            (kind == mat.KIND_OREN_NAYAR)[:, None],
            on_bsdf,
            jnp.where((kind == mat.KIND_MIRROR)[:, None], mir_bsdf, 0.0),
        ),
    )
    pdf = jnp.where(
        kind == mat.KIND_LAMBERT,
        lam_pdf,
        jnp.where(
            kind == mat.KIND_OREN_NAYAR,
            on_pdf,
            jnp.where(kind == mat.KIND_MIRROR, mir_pdf, 1.0),
        ),
    )
    if scene.has_pbr:  # static: scenes without the lane skip its math
        pbr_bsdf, pbr_pdf = _eval_pbr(m, i, o, normal)
        is_pbr = kind == mat.KIND_PBR
        bsdf = jnp.where(is_pbr[:, None], pbr_bsdf, bsdf)
        pdf = jnp.where(is_pbr, pbr_pdf, pdf)
    return bsdf, pdf


# ---------------------------------------------------------------------------
# Sampling: bsdf_pdf_sample
# ---------------------------------------------------------------------------

def _sample_mirror(m, i, normal, eta, r1, r2, u_coin):
    """mirror.rs:200-305, vectorized with both branches computed and selected."""
    alpha = m["roughness"] * m["roughness"]
    alpha2 = alpha * alpha
    i_dot_n = vec.dot(i, normal)

    h = sample_ggx_vndf(i, normal, m["roughness"], r1, r2)
    i_h = vec.dot(i, h)
    fail = i_h <= 0.0  # mirror.rs:215-217

    fresnel = _fresnel(m["color"], m["metallic"], m["ior"], i_h)
    # sin²θi = (1-i_h)(1+i_h): stable near normal incidence in f32.
    sin2_i = (1.0 - i_h) * (1.0 + i_h)
    cos2_t = 1.0 - (eta * eta) * sin2_i
    total_reflection = cos2_t < 0.0

    force_reflect = total_reflection | (m["metallic"] > 0.99)
    rr_f = jnp.where(force_reflect, 1.0, fresnel[:, 0])
    fresnel = jnp.where(force_reflect[:, None], 1.0, fresnel)
    is_reflect = u_coin < rr_f

    n_h = vec.dot(normal, h)
    d = _ggx_d(alpha2, n_h)

    # Reflect branch (mirror.rs:241-268)
    o_r = vec.normalize(2.0 * i_h[:, None] * h - i)
    o_n_r = jnp.maximum(vec.dot(normal, o_r), 0.0)
    i_n_r = jnp.maximum(i_dot_n, 0.0)
    g_r = _smith_g2(alpha2, i_n_r, o_n_r)
    brdf = fresnel * (d * g_r / (4.0 * i_n_r * o_n_r * rr_f))[:, None]
    pdf_vndf_r = _smith_g1(alpha2, i_n_r) * d * jnp.maximum(i_h, 0.0) / i_n_r
    pdf_r = pdf_vndf_r / (4.0 * jnp.abs(i_h))

    # Refract branch (mirror.rs:269-304)
    cos_t = jnp.sqrt(jnp.maximum(cos2_t, 0.0))
    o_t = vec.normalize(h * (eta * i_h - cos_t)[:, None] - i * eta[:, None])
    o_h_t = vec.dot(o_t, h)
    o_n_t = jnp.abs(vec.dot(normal, o_t))
    i_n_t = jnp.abs(i_dot_n)
    denom_t = eta * i_h + o_h_t
    g_t = _smith_g2(alpha2, i_n_t, o_n_t)
    btdf = (1.0 - fresnel) * (
        d * g_t * jnp.abs(i_h) * jnp.abs(o_h_t)
        / (i_n_t * o_n_t * denom_t * denom_t * (1.0 - rr_f))
    )[:, None]
    jac = jnp.abs(o_h_t) / (denom_t * denom_t)
    pdf_vndf_t = _smith_g1(alpha2, i_n_t) * d * jnp.maximum(i_h, 0.0) / i_n_t
    pdf_t = pdf_vndf_t * jac

    o = jnp.where(is_reflect[:, None], o_r, o_t)
    bsdf = jnp.where(is_reflect[:, None], brdf, btdf)
    pdf = jnp.where(is_reflect, pdf_r, pdf_t)
    cos = jnp.where(is_reflect, o_n_r, o_n_t)

    # Non-finite / non-positive-pdf guard → zero-contribution sample
    # (mirror.rs:258-265, 292-300) plus the i_h ≤ 0 early-out.
    bad = (
        fail
        | ~jnp.all(jnp.isfinite(bsdf), axis=-1)
        | ~jnp.isfinite(pdf)
        | (pdf <= 0.0)
    )
    o = jnp.where(bad[:, None], normal, o)
    bsdf = jnp.where(bad[:, None], 0.0, bsdf)
    pdf = jnp.where(bad, 1.0, pdf)
    cos = jnp.where(bad, 0.0, cos)
    return o, bsdf, pdf, cos


def sample_bsdf(scene: Scene, mid, i, eta, normal, r1, r2, u_coin,
                params: MatParams | None = None):
    """``Material::bsdf_pdf_sample`` for a wave: returns
    ``(direction (N,3), bsdf (N,3), pdf (N,), cos_theta (N,))``.

    Diffuse lanes use the default-impl semantics (sample_direction then
    evaluate, cos clamped ≥ 0 — material.rs:29-40); the Mirror lane overrides
    with VNDF + stochastic reflect/refract exactly like mirror.rs:200-305.
    """
    m = _gather_mat(scene, mid) if params is None else dict(
        kind=params.kind, color=params.color, emission=params.emission,
        roughness=params.roughness, metallic=params.metallic, ior=params.ior,
    )
    kind = m["kind"]

    use_on = getattr(scene, "has_oren_nayar", True)
    use_mir = getattr(scene, "has_mirror", True)

    # Diffuse lanes share the cosine-weighted sample (material.rs:93-122, 267-295).
    d_diff = vec.cosine_hemisphere_direction(normal, r1, r2)
    lam_bsdf, lam_pdf = _eval_lambert(m["color"], d_diff, normal)
    on_bsdf, on_pdf = (
        _eval_oren_nayar(m["color"], m["roughness"], i, d_diff, normal)
        if use_on else (lam_bsdf, lam_pdf)
    )
    cos_diff = jnp.maximum(vec.dot(d_diff, normal), 0.0)

    mir_o, mir_bsdf, mir_pdf, mir_cos = (
        _sample_mirror(m, i, normal, eta, r1, r2, u_coin)
        if use_mir else (d_diff, lam_bsdf, lam_pdf, cos_diff)
    )

    is_mirror = kind == mat.KIND_MIRROR
    is_on = kind == mat.KIND_OREN_NAYAR
    is_emis = kind == mat.KIND_EMISSIVE

    o = jnp.where(is_mirror[:, None], mir_o, d_diff)
    bsdf = jnp.where(
        is_mirror[:, None], mir_bsdf, jnp.where(is_on[:, None], on_bsdf, lam_bsdf)
    )
    pdf = jnp.where(is_mirror, mir_pdf, jnp.where(is_on, on_pdf, lam_pdf))
    cos = jnp.where(is_mirror, mir_cos, cos_diff)

    if scene.has_pbr:  # static: scenes without the lane skip its math
        pbr_o, pbr_bsdf, pbr_pdf, pbr_cos = _sample_pbr(
            m, i, normal, r1, r2, u_coin, d_diff
        )
        is_pbr = kind == mat.KIND_PBR
        o = jnp.where(is_pbr[:, None], pbr_o, o)
        bsdf = jnp.where(is_pbr[:, None], pbr_bsdf, bsdf)
        pdf = jnp.where(is_pbr, pbr_pdf, pdf)
        cos = jnp.where(is_pbr, pbr_cos, cos)

    # Emissive is terminal: dummy direction, zero BSDF (material.rs:139-158).
    o = jnp.where(is_emis[:, None], normal, o)
    bsdf = jnp.where(is_emis[:, None], 0.0, bsdf)
    pdf = jnp.where(is_emis, 1.0, pdf)
    cos = jnp.where(is_emis, 0.0, cos)
    return o, bsdf, pdf, cos


def eta_ratio(scene: Scene, mid, front_face, params: MatParams | None = None):
    """IOR ratio for a ray leaving a vertex: air→medium on front faces,
    medium→air on back faces (rendering.rs:20-25)."""
    ior = scene.mat_ior[mid] if params is None else params.ior
    return jnp.where(front_face, 1.0 / ior, ior)
