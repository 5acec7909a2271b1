"""Fused bounce megakernel: one Pallas kernel from pending ray to next ray.

Round-2 profiling (docs/PERFORMANCE.md) put the pool iteration at ~319 µs of
which only ~180 µs were the intersection kernels — the rest was NEE light
sampling, BSDF eval/sample, material resolve, MIS weights, Russian roulette
and the XLA elementwise wiring between them, all paying HBM round-trips for
every (S,)-shaped intermediate. This kernel executes the reference's entire
per-vertex body (``rendering.rs:34-135``: closest hit → emissive/MIS term →
NEE light sample + shadow test → BSDF sample → RR → next ray) for a 1024-lane
ray tile without leaving VMEM:

  1. closest hit over one right-sized sphere tile + one small triangle tile
     (same math/epsilons as ops/pallas_intersect.py, shape.rs:53-89/161-198),
     with the winner's FULL material row resolved by the exact bf16×3 MXU
     one-hot contraction — the (S,M)@(M,12) XLA material fetch disappears;
  2. the emissive terminal rules incl. the MIS bsdf-side weight with its
     missing-1/num_lights quirk (rendering.rs:42-49, 113-121);
  3. NEE: uniform light pick, triangle sqrt-warp / sphere-cone surface
     sampling (shape.rs:91-145, 200-241), a fused shadow any-hit sweep over
     both primitive classes, BSDF evaluation toward the light and the
     balance-heuristic weight (rendering.rs:55-81);
  4. BSDF sampling — Lambert cosine lane and the full GGX Mirror lane (VNDF
     half-vector, Fresnel coin, both reflect/refract branches,
     mirror.rs:200-305) — plus the RR schedule (rendering.rs:91-102) and the
     state updates for surviving paths.

Scope (static gates): scenes with ≤64 triangles, ≤512 spheres and ≤64 lights
— the headline bench + Cornell class. Oren–Nayar and PBR materials ride
statically-gated extra lanes (``has_on``/``has_pbr``, set from the scene's
material-presence flags so scenes without them pay nothing — the ON lane's
atan2 pair measured ~30% of the shading glue when run for nothing). Larger
scenes keep the composed per-op path in pool.py (identical estimator).

Layout: rays on the 128-wide lane axis as everywhere else; 3-vectors are
(x, y, z) tuples of (1, R) rows so every op is a rank-2 VPU broadcast.
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import materials as mat
from ..models.scene import Scene

_INF = float("inf")
_PI = 3.14159265358979323846

RAY_TILE = 1024
# Measured negative result (round 3): 4096-lane tiles halve the megakernel in
# a standalone single-kernel probe (66.8 vs 128.2 us at 16k rays) but are
# reproducibly ~16% SLOWER per pool iteration end to end (323 vs 279 us,
# identical checksums) — the standalone win does not survive composition with
# the surrounding XLA program. 1024 stays the default; PT_FUSED_RAY_TILE
# overrides at trace time for profiling.

# Fused-path scene limits (single right-sized primitive tiles, no cluster
# traversal): beyond these the per-op path with the hierarchical kernels wins.
MAX_TRIS = 64
MAX_SPHERES = 512
MAX_LIGHTS = 64

# Sphere-table columns.
_SC_CX, _SC_CY, _SC_CZ, _SC_K, _SC_INVR = 0, 1, 2, 3, 4
_SC_KIND = 5
_SC_COL = 6     # 6:9 color
_SC_EMI = 9     # 9:12 emission
_SC_ROUGH, _SC_METAL, _SC_IOR = 12, 13, 14
_SPH_COLS = 15

# Triangle-table columns.
_TC_V0, _TC_E1, _TC_E2, _TC_N = 0, 3, 6, 9
_TC_KIND = 12
_TC_COL = 13
_TC_EMI = 16
_TC_ROUGH, _TC_METAL, _TC_IOR = 19, 20, 21
_TRI_COLS = 22

# Light-table columns (scene.light_geom layout + prim id appended).
_LC_ISTRI = 0
_LC_P = 1       # 1:4 v0 / center
_LC_RAD = 4     # sphere radius (shares the e1.x slot)
_LC_E1 = 4      # 4:7 tri e1
_LC_E2 = 7      # 7:10 tri e2
_LC_N = 10      # 10:13 tri normal
_LC_AREA = 13
_LC_EMI = 14    # 14:17 emission
_LC_PRIM = 17
_LGT_COLS = 18


def _cdiv(a, b):
    return (a + b - 1) // b


def _round8(n):
    return max(8, ((n + 7) // 8) * 8)


def _pad_rows(a, rows, fill=0.0):
    pad = rows - a.shape[0]
    if pad == 0:
        return a
    return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=fill)


# ---------------------------------------------------------------------------
# Column-vector helpers: a 3-vector is an (x, y, z) tuple of (1, R) rows.
# ---------------------------------------------------------------------------

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _where3(c, a, b):
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


def _normalize3(a):
    """vec.normalize semantics bit-for-bit: components DIVIDED by the length
    (not multiplied by its reciprocal — that costs an extra rounding and can
    flip downstream discrete decisions vs the composed path); zero vectors
    pass through unchanged."""
    ln = jnp.sqrt(_dot3(a, a))
    safe = jnp.where(ln > 0.0, ln, 1.0)
    return (
        jnp.where(ln > 0.0, a[0] / safe, a[0]),
        jnp.where(ln > 0.0, a[1] / safe, a[1]),
        jnp.where(ln > 0.0, a[2] / safe, a[2]),
    )


def _finite(x):
    return (x == x) & (jnp.abs(x) < _INF)


def _finite3(a):
    return _finite(a[0]) & _finite(a[1]) & _finite(a[2])


def _forz3(a):
    """vec.finite_or_zero per component."""
    return (
        jnp.where(_finite(a[0]), a[0], 0.0),
        jnp.where(_finite(a[1]), a[1], 0.0),
        jnp.where(_finite(a[2]), a[2], 0.0),
    )


def _luminance3(a):
    return 0.2126 * a[0] + 0.7152 * a[1] + 0.0722 * a[2]


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def _tangent_frame(n):
    """Reference tangent-frame convention: up = +Y unless |n.y| > 0.999, then
    +X (math.rs:116-124, material.rs:112-119, mirror.rs:21-27)."""
    ny_big = jnp.abs(n[1]) > 0.999
    one = jnp.ones_like(n[0])
    zero = jnp.zeros_like(n[0])
    up = (jnp.where(ny_big, one, zero), jnp.where(ny_big, zero, one), zero)
    tangent = _normalize3(_cross3(up, n))
    bitangent = _cross3(n, tangent)
    return tangent, bitangent


def _select_rows(mask_f, cols):
    """Exact MXU one-hot row select: ``mask_f`` (P, R) one-hot float, ``cols``
    a list of (P, 1) columns → list of (1, R) selected values. bf16×3 split
    keeps the contraction exact in f32 (see pallas_intersect._select_winner)."""
    cat = jnp.concatenate(cols, axis=1)                      # (P, k)

    def dot(a):
        return jax.lax.dot_general(
            a, mask_f, (((0,), (0,)), ((), ())),
            preferred_element_type=mask_f.dtype,
        )

    b0 = cat.astype(jnp.bfloat16).astype(cat.dtype)
    r1 = cat - b0
    b1 = r1.astype(jnp.bfloat16).astype(cat.dtype)
    b2 = r1 - b1
    sel = dot(b0) + dot(b1) + dot(b2)                        # (k, R)
    return [sel[i : i + 1, :] for i in range(len(cols))]


# ---------------------------------------------------------------------------
# BSDF lanes in column layout (ports of ops/bsdf.py, mirror.rs formulas)
# ---------------------------------------------------------------------------

def _ggx_d(alpha2, n_dot_h):
    c = jnp.minimum(jnp.abs(n_dot_h), 1.0)
    denom = alpha2 * c * c + (1.0 - c) * (1.0 + c)
    return alpha2 / (_PI * denom * denom)


def _smith_g1(alpha2, cos_theta):
    term = jnp.sqrt(alpha2 + (1.0 - alpha2) * cos_theta * cos_theta)
    g = 2.0 * cos_theta / (cos_theta + term)
    return jnp.where(cos_theta > 0.0, g, 0.0)


def _smith_g2(alpha2, cos_i, cos_o):
    def lam(c):
        num = jnp.sqrt(alpha2 + (1.0 - alpha2) * c * c)
        return (num - c) / (2.0 * c)

    g = 1.0 / (1.0 + lam(cos_i) + lam(cos_o))
    return jnp.where((cos_i > 0.0) & (cos_o > 0.0), g, 0.0)


def _fresnel3(color, metallic, ior, cos_theta):
    f0d = ((1.0 - ior) / (1.0 + ior)) ** 2
    p5 = _pow5(1.0 - cos_theta)
    out = []
    for ch in range(3):
        f0 = f0d * (1.0 - metallic) + color[ch] * metallic
        out.append(f0 + (1.0 - f0) * p5)
    return tuple(out)


def _eval_lambert(color, o, normal):
    inv_pi = 1.0 / _PI
    brdf = _scale3(color, inv_pi)
    pdf = jnp.maximum(_dot3(o, normal), 0.0) * inv_pi
    return brdf, pdf


def _eval_mirror(color, rough, metal, ior, i, o, normal, eta):
    """Mirror::bsdf_pdf (mirror.rs:179-198 routing, :62-124 branches)."""
    alpha = rough * rough
    alpha2 = alpha * alpha

    i_dot_n = _dot3(i, normal)
    o_dot_n = _dot3(o, normal)
    is_reflection = i_dot_n * o_dot_n > 0.0

    # BRDF branch
    h_r = _normalize3(_add3(i, o))
    n_h_r = _dot3(normal, h_r)
    d_r = _ggx_d(alpha2, n_h_r)
    i_n_r = jnp.maximum(i_dot_n, 0.0)
    o_n_r = jnp.maximum(o_dot_n, 0.0)
    g_r = _smith_g2(alpha2, i_n_r, o_n_r)
    cos_f = jnp.maximum(_dot3(i, h_r), 0.0)
    f_r = _fresnel3(color, metal, ior, cos_f)
    spec = d_r * g_r / (4.0 * i_n_r * o_n_r)
    brdf = _scale3(f_r, spec)
    i_h_r = jnp.abs(_dot3(i, h_r))
    pdf_r = d_r * jnp.abs(n_h_r) / (4.0 * i_h_r)

    # BTDF branch
    h_t = _neg3(_normalize3(_add3(_scale3(i, eta), o)))
    n_h_t = _dot3(normal, h_t)
    d_t = _ggx_d(alpha2, n_h_t)
    i_n_t = jnp.abs(i_dot_n)
    o_n_t = jnp.abs(o_dot_n)
    g_t = _smith_g2(alpha2, i_n_t, o_n_t)
    i_h_t = _dot3(i, h_t)
    o_h_t = _dot3(o, h_t)
    denom_t = eta * i_h_t + o_h_t
    f_t = _fresnel3(color, metal, ior, jnp.abs(i_h_t))
    tt = d_t * g_t * jnp.abs(i_h_t) * jnp.abs(o_h_t) / (
        i_n_t * o_n_t * denom_t * denom_t
    )
    btdf = ((1.0 - f_t[0]) * tt, (1.0 - f_t[1]) * tt, (1.0 - f_t[2]) * tt)
    jac_t = jnp.abs(o_h_t) / (denom_t * denom_t)
    pdf_t = d_t * jnp.abs(n_h_t) * jac_t

    bsdf = _where3(is_reflection, brdf, btdf)
    pdf = jnp.where(is_reflection, pdf_r, pdf_t)

    metal_block = (metal > 0.99) & ~is_reflection
    bsdf = _where3(metal_block, (0.0 * pdf,) * 3, bsdf)
    pdf = jnp.where(metal_block, 1.0, pdf)
    return bsdf, pdf


def _sample_vndf(view, normal, rough, r1, r2):
    """Heitz VNDF half-vector sample (mirror.rs:17-60)."""
    alpha = rough * rough
    tangent, bitangent = _tangent_frame(normal)
    vl = (_dot3(view, tangent), _dot3(view, bitangent), _dot3(view, normal))
    vh = _normalize3((alpha * vl[0], alpha * vl[1], vl[2]))
    lensq = vh[0] * vh[0] + vh[1] * vh[1]
    inv = 1.0 / jnp.sqrt(jnp.maximum(lensq, 1e-38))
    has = lensq > 0.0
    t1 = (
        jnp.where(has, -vh[1] * inv, 1.0),
        jnp.where(has, vh[0] * inv, 0.0),
        jnp.zeros_like(inv),
    )
    t2 = _cross3(vh, t1)

    r = jnp.sqrt(r1)
    phi = 2.0 * _PI * r2
    t1c = r * jnp.cos(phi)
    t2c = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[2])
    t2c = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1c * t1c, 0.0)) + s * t2c

    z = jnp.sqrt(jnp.maximum(1.0 - t1c * t1c - t2c * t2c, 0.0))
    nh = _add3(_add3(_scale3(t1, t1c), _scale3(t2, t2c)), _scale3(vh, z))
    ne = _normalize3((alpha * nh[0], alpha * nh[1], jnp.maximum(nh[2], 0.0)))
    return _normalize3(
        _add3(
            _add3(_scale3(tangent, ne[0]), _scale3(bitangent, ne[1])),
            _scale3(normal, ne[2]),
        )
    )


def _cosine_hemisphere(normal, r1, r2):
    phi = 2.0 * _PI * r1
    cos_theta = jnp.sqrt(r2)
    sin_theta = jnp.sqrt(1.0 - cos_theta * cos_theta)
    x = sin_theta * jnp.cos(phi)
    y = sin_theta * jnp.sin(phi)
    tangent, bitangent = _tangent_frame(normal)
    return _normalize3(
        _add3(
            _add3(_scale3(tangent, x), _scale3(bitangent, y)),
            _scale3(normal, cos_theta),
        )
    )


def _sample_mirror(color, rough, metal, ior, i, normal, eta, r1, r2, u_coin):
    """Mirror::bsdf_pdf_sample (mirror.rs:200-305), both branches computed."""
    alpha = rough * rough
    alpha2 = alpha * alpha
    i_dot_n = _dot3(i, normal)

    h = _sample_vndf(i, normal, rough, r1, r2)
    i_h = _dot3(i, h)
    fail = i_h <= 0.0

    fres = _fresnel3(color, metal, ior, i_h)
    sin2_i = (1.0 - i_h) * (1.0 + i_h)
    cos2_t = 1.0 - (eta * eta) * sin2_i
    total_reflection = cos2_t < 0.0

    force_reflect = total_reflection | (metal > 0.99)
    rr_f = jnp.where(force_reflect, 1.0, fres[0])
    fres = _where3(force_reflect, (jnp.ones_like(rr_f),) * 3, fres)
    is_reflect = u_coin < rr_f

    n_h = _dot3(normal, h)
    d = _ggx_d(alpha2, n_h)

    # Reflect branch
    o_r = _normalize3(_sub3(_scale3(h, 2.0 * i_h), i))
    o_n_r = jnp.maximum(_dot3(normal, o_r), 0.0)
    i_n_r = jnp.maximum(i_dot_n, 0.0)
    g_r = _smith_g2(alpha2, i_n_r, o_n_r)
    spec = d * g_r / (4.0 * i_n_r * o_n_r * rr_f)
    brdf = _scale3(fres, spec)
    pdf_vndf_r = _smith_g1(alpha2, i_n_r) * d * jnp.maximum(i_h, 0.0) / i_n_r
    pdf_r = pdf_vndf_r / (4.0 * jnp.abs(i_h))

    # Refract branch
    cos_t = jnp.sqrt(jnp.maximum(cos2_t, 0.0))
    o_t = _normalize3(_sub3(_scale3(h, eta * i_h - cos_t), _scale3(i, eta)))
    o_h_t = _dot3(o_t, h)
    o_n_t = jnp.abs(_dot3(normal, o_t))
    i_n_t = jnp.abs(i_dot_n)
    denom_t = eta * i_h + o_h_t
    g_t = _smith_g2(alpha2, i_n_t, o_n_t)
    tt = d * g_t * jnp.abs(i_h) * jnp.abs(o_h_t) / (
        i_n_t * o_n_t * denom_t * denom_t * (1.0 - rr_f)
    )
    btdf = ((1.0 - fres[0]) * tt, (1.0 - fres[1]) * tt, (1.0 - fres[2]) * tt)
    jac = jnp.abs(o_h_t) / (denom_t * denom_t)
    pdf_vndf_t = _smith_g1(alpha2, i_n_t) * d * jnp.maximum(i_h, 0.0) / i_n_t
    pdf_t = pdf_vndf_t * jac

    o = _where3(is_reflect, o_r, o_t)
    bsdf = _where3(is_reflect, brdf, btdf)
    pdf = jnp.where(is_reflect, pdf_r, pdf_t)
    cos = jnp.where(is_reflect, o_n_r, o_n_t)

    bad = fail | ~_finite3(bsdf) | ~_finite(pdf) | (pdf <= 0.0)
    o = _where3(bad, normal, o)
    bsdf = _where3(bad, (0.0 * pdf,) * 3, bsdf)
    pdf = jnp.where(bad, 1.0, pdf)
    cos = jnp.where(bad, 0.0, cos)
    return o, bsdf, pdf, cos


def _eval_oren_nayar3(color, rough, i, o, normal):
    """OrenNayar::bsdf_pdf (material.rs:222-264), column form — op-for-op
    ops/bsdf.py._eval_oren_nayar so fused and composed paths agree exactly."""
    sigma2 = rough * rough
    a = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33)
    b = 0.45 * sigma2 / (sigma2 + 0.09)

    cos_i = jnp.maximum(_dot3(i, normal), 0.0)
    cos_o = jnp.maximum(_dot3(o, normal), 0.0)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - cos_i * cos_i, 0.0))
    sin_o = jnp.sqrt(jnp.maximum(1.0 - cos_o * cos_o, 0.0))

    tangent, bitangent = _tangent_frame(normal)
    phi_i = jnp.arctan2(_dot3(i, bitangent), _dot3(i, tangent))
    phi_o = jnp.arctan2(_dot3(o, bitangent), _dot3(o, tangent))
    cos_phi_diff = jnp.maximum(jnp.cos(phi_i - phi_o), 0.0)

    # α = max angle, β = min angle via the cos comparison (material.rs:240-256)
    i_steeper = cos_i > cos_o  # θi < θo
    tan_beta = jnp.where(
        i_steeper,
        jnp.where(cos_i > 1e-6, sin_i / jnp.maximum(cos_i, 1e-6), 0.0),
        jnp.where(cos_o > 1e-6, sin_o / jnp.maximum(cos_o, 1e-6), 0.0),
    )
    sin_alpha = jnp.where(i_steeper, sin_o, sin_i)

    term = (a + b * cos_phi_diff * sin_alpha * tan_beta) / _PI
    brdf = _scale3(color, term)
    pdf = cos_o / _PI
    return brdf, pdf


def _eval_pbr3(color, rough, metal, ior, i, o, normal):
    """PBRMaterial::bsdf_pdf (material.rs:311-355), column form — mirrors
    ops/bsdf.py._eval_pbr: GGX specular reflection plus kd-scaled Oren–Nayar
    diffuse, pdf a Fresnel-weighted blend of the two techniques."""
    alpha = rough * rough
    alpha2 = alpha * alpha

    h = _normalize3(_add3(i, o))
    n_h = _dot3(normal, h)
    d_ggx = _ggx_d(alpha2, n_h)
    cos_i = jnp.maximum(_dot3(i, normal), 0.0)
    cos_o = jnp.maximum(_dot3(o, normal), 0.0)
    g2 = _smith_g2(alpha2, cos_i, cos_o)
    cos_f = jnp.maximum(_dot3(i, h), 0.0)
    f = _fresnel3(color, metal, ior, cos_f)
    spec_brdf = _scale3(f, d_ggx * g2 / (4.0 * cos_i * cos_o))
    spec_pdf = d_ggx * jnp.abs(n_h) / (4.0 * jnp.abs(_dot3(i, h)))

    # Diffuse: Oren–Nayar × kd (material.rs:332-341); metals don't diffuse.
    diff_raw, diff_pdf = _eval_oren_nayar3(color, rough, i, o, normal)
    not_metal = metal < 1.0
    one_m = 1.0 - metal
    diff_brdf = tuple(
        jnp.where(not_metal, diff_raw[c] * (1.0 - f[c]) * one_m, 0.0)
        for c in range(3)
    )

    brdf = _add3(spec_brdf, diff_brdf)
    f_avg = (f[0] + f[1] + f[2]) / 3.0
    sw = f_avg
    dw = (1.0 - f_avg) * one_m
    tw = sw + dw
    pdf = jnp.where(
        tw > 1e-6,
        (sw * spec_pdf + dw * diff_pdf) / jnp.maximum(tw, 1e-6),
        spec_pdf,
    )
    bad = (cos_o <= 0.0) | ~_finite3(brdf) | ~_finite(pdf)
    brdf = _where3(bad, (0.0 * pdf,) * 3, brdf)
    pdf = jnp.where(bad, 1.0, pdf)
    return brdf, pdf


def _sample_pbr3(color, rough, metal, ior, i, normal, r1, r2, u_coin, d_diff):
    """PBRMaterial sampling (material.rs:358-388), column form — mirrors
    ops/bsdf.py._sample_pbr: approximate-Fresnel coin picks GGX-VNDF
    specular vs the shared cosine-hemisphere diffuse sample, then the
    blended bsdf_pdf evaluates at the sampled direction."""
    cos_i = jnp.maximum(_dot3(i, normal), 0.0)
    mean_c = (color[0] + color[1] + color[2]) / 3.0
    f0s = jnp.where(metal > 0.5, mean_c, 0.04)
    f_approx = f0s + (1.0 - f0s) * _pow5(1.0 - cos_i)
    sw = f_approx
    dw = (1.0 - f_approx) * (1.0 - metal)
    tw = sw + dw
    p_spec = jnp.where(tw > 1e-6, sw / jnp.maximum(tw, 1e-6), 1.0)
    use_spec = u_coin < p_spec

    h = _sample_vndf(i, normal, rough, r1, r2)
    o_spec = _normalize3(_sub3(_scale3(h, 2.0 * _dot3(i, h)), i))

    o = _where3(use_spec, o_spec, d_diff)
    bsdf, pdf = _eval_pbr3(color, rough, metal, ior, i, o, normal)
    cos = jnp.maximum(_dot3(o, normal), 0.0)

    bad = ~_finite3(bsdf) | ~_finite(pdf) | (pdf <= 0.0)
    o = _where3(bad, normal, o)
    bsdf = _where3(bad, (0.0 * pdf,) * 3, bsdf)
    pdf = jnp.where(bad, 1.0, pdf)
    cos = jnp.where(bad, 0.0, cos)
    return o, bsdf, pdf, cos


# ---------------------------------------------------------------------------
# The megakernel
# ---------------------------------------------------------------------------

def _fused_bounce_kernel(
    busy_ref, bounce_ref, o_ref, d_ref, eta_ref, pdfp_ref, pfx_ref, u_ref,
    sph_ref, tri_ref, lgt_ref, *refs,
    num_tris, num_lights, max_bounces, use_mis, use_nee, has_mirror,
    has_on, has_pbr, has_tri_l, has_sph_l,
    eps, rr_min_depth, rr_max_depth, fuse_shadow, sections, use_quad,
    fuse_raygen,
):
    if use_quad:
        quad_ref, quadg_ref, refs = refs[0], refs[1], refs[2:]
    if fuse_raygen:
        started_ref, pxy_ref, cam_ref, refs = refs[0], refs[1], refs[2], refs[3:]
    (rad_ref, no_ref, nd_ref, neta_ref, npdf_ref, npfx_ref, live_ref,
     shade_ref, dir_ref, sd_ref, st_ref) = refs
    busy = busy_ref[0:1, :] != 0
    bounce = bounce_ref[0:1, :]
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    eta_in = eta_ref[0:1, :]
    pdf_prev = pdfp_ref[0:1, :]
    pfx = (pfx_ref[0:1, :], pfx_ref[1:2, :], pfx_ref[2:3, :])

    if fuse_raygen:
        # Primary-ray generation + started-lane state resets, folded into
        # the kernel: inputs above are the PRE-refill carried pool state,
        # and the refilled lanes' camera rays are computed here (same op
        # sequence as models/camera.py generate_rays, so the ray values
        # match the XLA path) instead of paying ~15 (3,S)/(1,S) XLA arrays
        # of raygen + where-merge traffic per pool iteration.
        # (busy/bounce arrive post-merge as always: the pool needs them in
        # XLA anyway — the RNG draw is keyed on the merged bounce — so only
        # the float-state merges move in here.)
        started = started_ref[0:1, :] != 0
        dtype = ox.dtype
        jx = u_ref[7:8, :]   # rng.SLOT_JITTER_X
        jy = u_ref[8:9, :]   # rng.SLOT_JITTER_Y
        pxf = pxy_ref[0:1, :].astype(dtype)
        pyf = pxy_ref[1:2, :].astype(dtype)
        # cam_ref rows: [origin(3), lower_left(3), w-1, h-1] /
        #               [horizontal(3), vertical(3), 0, 0]
        org = (cam_ref[0:1, 0:1], cam_ref[0:1, 1:2], cam_ref[0:1, 2:3])
        ll = (cam_ref[0:1, 3:4], cam_ref[0:1, 4:5], cam_ref[0:1, 5:6])
        hor = (cam_ref[1:2, 0:1], cam_ref[1:2, 1:2], cam_ref[1:2, 2:3])
        ver = (cam_ref[1:2, 3:4], cam_ref[1:2, 4:5], cam_ref[1:2, 5:6])
        uu_c = (pxf + jx) / cam_ref[0:1, 6:7]
        vv_c = (pyf + jy) / cam_ref[0:1, 7:8]
        comps = tuple(
            ll[c] + hor[c] * uu_c + ver[c] * vv_c - org[c] for c in range(3)
        )
        ln = jnp.sqrt(_dot3(comps, comps))
        safe = jnp.where(ln > 0.0, ln, 1.0)
        pos = ln > 0.0
        cam_d = tuple(jnp.where(pos, comps[c] / safe, comps[c]) for c in range(3))
        ox = jnp.where(started, org[0], ox)
        oy = jnp.where(started, org[1], oy)
        oz = jnp.where(started, org[2], oz)
        dx = jnp.where(started, cam_d[0], dx)
        dy = jnp.where(started, cam_d[1], dy)
        dz = jnp.where(started, cam_d[2], dz)
        eta_in = jnp.where(started, 1.0, eta_in)
        pdf_prev = jnp.where(started, 1.0, pdf_prev)
        pfx = tuple(jnp.where(started, 1.0, pfx[c]) for c in range(3))
    o3 = (ox, oy, oz)
    d3 = (dx, dy, dz)
    t_min = jnp.full(ox.shape, eps, ox.dtype)
    t_max = jnp.full(ox.shape, _INF, ox.dtype)

    od = _dot3(o3, d3)
    oo = _dot3(o3, o3)

    # ================= 1. Closest hit (spheres + triangles) =================
    # Triangles (Möller–Trumbore, shape.rs:161-198; zero-edge pads self-reject)
    v0 = (tri_ref[:, 0:1], tri_ref[:, 1:2], tri_ref[:, 2:3])
    e1 = (tri_ref[:, 3:4], tri_ref[:, 4:5], tri_ref[:, 5:6])
    e2 = (tri_ref[:, 6:7], tri_ref[:, 7:8], tri_ref[:, 8:9])

    hx = dy * e2[2] - dz * e2[1]
    hy = dz * e2[0] - dx * e2[2]
    hz = dx * e2[1] - dy * e2[0]
    a = e1[0] * hx + e1[1] * hy + e1[2] * hz
    f = 1.0 / a
    sx = ox - v0[0]; sy = oy - v0[1]; sz = oz - v0[2]
    uu = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1[2] - sz * e1[1]
    qy = sz * e1[0] - sx * e1[2]
    qz = sx * e1[1] - sy * e1[0]
    vv = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2[0] * qx + e2[1] * qy + e2[2] * qz)
    ok = (
        (jnp.abs(a) >= 1e-8)
        & (uu >= 0.0) & (uu <= 1.0)
        & (vv >= 0.0) & (uu + vv <= 1.0)
        & (t >= t_min) & (t <= t_max)
    )
    ts = jnp.where(ok, t, _INF)
    tri_t = jnp.min(ts, axis=0, keepdims=True)
    tri_arg = jnp.argmin(ts, axis=0).astype(jnp.int32)[None, :]
    tri_hit = tri_t < _INF
    row_iota = jax.lax.broadcasted_iota(jnp.int32, ts.shape, 0)
    mask_t = ((row_iota == tri_arg) & tri_hit).astype(ts.dtype)
    tsel = _select_rows(
        mask_t,
        [tri_ref[:, c : c + 1] for c in range(_TC_N, _TC_N + 3)]
        + [tri_ref[:, c : c + 1] for c in range(_TC_KIND, _TRI_COLS)],
    )
    tn = (tsel[0], tsel[1], tsel[2])
    t_kind, t_col0, t_col1, t_col2, t_emi0, t_emi1, t_emi2, t_rough, t_metal, t_ior = tsel[3:]

    # Spheres (half-b quadratic with NaN-miss padding, shape.rs:53-89)
    cx = sph_ref[:, 0:1]; cy = sph_ref[:, 1:2]; cz = sph_ref[:, 2:3]
    kq = sph_ref[:, 3:4]
    if use_quad:
        # MXU quadratic-form sweep: disc and half_b for every (sphere, ray)
        # pair from one bf16-split dot per recentered 64-sphere block (see
        # _sphere_quad_tables — disc/half_b are translation-invariant, so
        # cluster-local evaluation keeps the cancellation error far below
        # the eps self-hit guard). Replaces ~15 VPU ops/pair with ~84%-
        # utilized matmuls; knife-edge silhouette lanes may round
        # differently than the VPU path (documented determinism contract).
        one_r = jnp.ones_like(ox)
        zpad = jnp.zeros((_QUAD_K - 6 * _QUAD_FEATS, ox.shape[1]), ox.dtype)
        n_blocks = quadg_ref.shape[0]
        cb = quad_ref.shape[0] // (2 * n_blocks)
        disc_b, hb_b = [], []
        for c in range(n_blocks):
            gx = quadg_ref[c : c + 1, 0:1]
            gy = quadg_ref[c : c + 1, 1:2]
            gz = quadg_ref[c : c + 1, 2:3]
            oxc, oyc, ozc = ox - gx, oy - gy, oz - gz
            odc = oxc * dx + oyc * dy + ozc * dz
            ooc = oxc * oxc + oyc * oyc + ozc * ozc
            phi = jnp.concatenate([
                dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz,
                odc * dx, odc * dy, odc * dz, oxc, oyc, ozc,
                odc * odc - ooc, one_r, dx, dy, dz,
            ], axis=0)                                   # (17, W)
            p0, p1, p2 = _bf16_split3(phi)
            phi_ext = jnp.concatenate(
                [p0, p1, p2, p0, p1, p0, zpad], axis=0
            ).astype(jnp.bfloat16)                       # (128, W)
            base = c * 2 * cb
            pairs = jax.lax.dot_general(
                quad_ref[base : base + 2 * cb, :], phi_ext,
                (((1,), (0,)), ((), ())),
                preferred_element_type=ox.dtype,
            )                                            # (2*cb, W)
            disc_b.append(pairs[:cb, :])
            hb_b.append(odc - pairs[cb:, :])
        p_rows = sph_ref.shape[0]
        disc = jnp.concatenate(disc_b, axis=0)[:p_rows, :]
        half_b = jnp.concatenate(hb_b, axis=0)[:p_rows, :]
    else:
        cd = cx * dx + cy * dy + cz * dz
        co = cx * ox + cy * oy + cz * oz
        half_b = od - cd
        cterm = oo - 2.0 * co + kq
        disc = half_b * half_b - cterm
    sq = jnp.sqrt(disc)
    root1 = -half_b - sq
    t_c = jnp.where(root1 >= t_min, root1, -half_b + sq)
    oks = (t_c >= t_min) & (t_c <= jnp.minimum(t_max, tri_t))
    tss = jnp.where(oks, t_c, _INF)
    sph_t = jnp.min(tss, axis=0, keepdims=True)
    sph_arg = jnp.argmin(tss, axis=0).astype(jnp.int32)[None, :]
    sph_hit = sph_t < tri_t
    rows_s = jax.lax.broadcasted_iota(jnp.int32, tss.shape, 0)
    mask_s = ((rows_s == sph_arg) & sph_hit).astype(tss.dtype)
    ssel = _select_rows(
        mask_s,
        [sph_ref[:, c : c + 1] for c in (_SC_CX, _SC_CY, _SC_CZ, _SC_INVR)]
        + [sph_ref[:, c : c + 1] for c in range(_SC_KIND, _SPH_COLS)],
    )
    scx, scy, scz, sir = ssel[0], ssel[1], ssel[2], ssel[3]
    s_kind, s_col0, s_col1, s_col2, s_emi0, s_emi1, s_emi2, s_rough, s_metal, s_ior = ssel[4:]

    # Merge
    best_t = jnp.where(sph_hit, sph_t, tri_t)
    hit_valid = sph_hit | tri_hit
    tt0 = jnp.where(hit_valid, best_t, 0.0)
    px = ox + tt0 * dx
    py = oy + tt0 * dy
    pz = oz + tt0 * dz
    point = (px, py, pz)
    outward = (
        jnp.where(sph_hit, (px - scx) * sir, tn[0]),
        jnp.where(sph_hit, (py - scy) * sir, tn[1]),
        jnp.where(sph_hit, (pz - scz) * sir, tn[2]),
    )
    prim = jnp.where(sph_hit, num_tris + sph_arg, jnp.where(tri_hit, tri_arg, -1))

    kind = jnp.where(sph_hit, s_kind, t_kind)
    m_col = _where3(sph_hit, (s_col0, s_col1, s_col2), (t_col0, t_col1, t_col2))
    m_emi = _where3(sph_hit, (s_emi0, s_emi1, s_emi2), (t_emi0, t_emi1, t_emi2))
    m_rough = jnp.where(sph_hit, s_rough, t_rough)
    m_metal = jnp.where(sph_hit, s_metal, t_metal)
    m_ior = jnp.where(sph_hit, s_ior, t_ior)

    front_face = _dot3(d3, outward) < 0.0
    normal = _where3(front_face, outward, _neg3(outward))
    kind_i = kind.astype(jnp.int32)

    # ================= 2. Emissive terminal rules ==========================
    emis = hit_valid & (kind_i == mat.KIND_EMISSIVE) & (_dot3(m_emi, m_emi) > 0.0)
    if not (use_mis or use_nee):  # brdf_only: visible at any depth
        emis_gain = m_emi
    else:
        if use_mis and num_lights > 0 and "emis" in sections:
            # Light row of the hit primitive (MIS bsdf-side pdf query,
            # rendering.rs:113-121; NOT divided by num_lights — the quirk).
            if num_lights == 1:
                # Single light (lights are auto-detected, so every emissive
                # prim IS a light): an emissive hit's light row can only be
                # row 0 — broadcast its scalars instead of the one-hot MXU
                # select. Lanes whose hit is not the light see row-0 values
                # too, but their w_bsdf is consumed only through the `emis`
                # gate below, so the image is bitwise identical.
                lsel = [
                    lgt_ref[0:1, c : c + 1]
                    for c in range(_LC_ISTRI, _LC_EMI)
                ]
            else:
                lp = lgt_ref[:, _LC_PRIM : _LC_PRIM + 1]
                mask_l = (lp == prim.astype(lp.dtype)).astype(lp.dtype)
                lsel = _select_rows(
                    mask_l,
                    [lgt_ref[:, c : c + 1] for c in range(_LC_ISTRI, _LC_EMI)],
                )
            l_is_tri = lsel[_LC_ISTRI] > 0.5
            lpv = (lsel[_LC_P], lsel[_LC_P + 1], lsel[_LC_P + 2])
            l_rad = lsel[_LC_RAD]
            l_n = (lsel[_LC_N], lsel[_LC_N + 1], lsel[_LC_N + 2])
            l_area = lsel[_LC_AREA]
            # Light-class lanes are statically gated (Scene.has_tri_lights /
            # has_sph_lights): with a single light class the where-merge IS
            # the kept lane, so skipping the other is bitwise-identical.
            if has_tri_l:
                # Triangle lane: area→solid-angle pdf toward the known hit
                # point (shape.rs:228-239; two-sided emitters).
                to_l = _sub3(point, o3)
                dist_l = jnp.sqrt(_dot3(to_l, to_l))
                safe_dl = jnp.where(dist_l > 0.0, dist_l, 1.0)
                ldir_l = (to_l[0] / safe_dl, to_l[1] / safe_dl, to_l[2] / safe_dl)
                cos_light = jnp.abs(_dot3(l_n, _neg3(ldir_l)))
                pdf_area = 1.0 / jnp.maximum(l_area, 1e-20)
                pdf_tri = jnp.where(
                    cos_light > 1e-8,
                    pdf_area * (dist_l * dist_l) / jnp.maximum(cos_light, 1e-8),
                    1e-8,
                )
            if has_sph_l:
                # Sphere lane: constant cone pdf (shape.rs:91-145).
                to_c = _sub3(lpv, o3)
                dist_sq = _dot3(to_c, to_c)
                sin2_max = (l_rad * l_rad) / jnp.where(dist_sq > 0.0, dist_sq, 1.0)
                cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
                solid = 2.0 * _PI * (1.0 - cos_max)
                pdf_sph = 1.0 / jnp.maximum(solid, 1e-12)
            if has_tri_l and has_sph_l:
                pdf_shape = jnp.where(l_is_tri, pdf_tri, pdf_sph)
            elif has_tri_l:
                pdf_shape = pdf_tri
            else:
                pdf_shape = pdf_sph
            w_bsdf = pdf_prev / (pdf_prev + pdf_shape)
        else:
            w_bsdf = jnp.zeros_like(pdf_prev)
        # Depth 0: raw emission; deeper: MIS-weighted (rendering.rs:42-49).
        emis_gain = _where3(bounce == 0, m_emi, _scale3(m_emi, w_bsdf))

    gain = _forz3(
        (pfx[0] * emis_gain[0], pfx[1] * emis_gain[1], pfx[2] * emis_gain[2])
    )
    be = busy & emis
    rad = _where3(be, gain, (0.0 * ox,) * 3)

    shade = busy & hit_valid & ~emis & (bounce < max_bounces)
    i3 = _neg3(d3)
    u0 = u_ref[0:1, :]; u1 = u_ref[1:2, :]; u2 = u_ref[2:3, :]
    u3 = u_ref[3:4, :]; u4 = u_ref[4:5, :]; u5 = u_ref[5:6, :]
    u6 = u_ref[6:7, :]

    # ================= 3. NEE + shadow any-hit =============================
    if use_nee and num_lights > 0 and "nee" in sections:
        if num_lights == 1:
            # Single light: every lane picks row 0 (u0 is drawn either way,
            # so the RNG stream is unchanged) — broadcast its scalars and
            # skip the pick iota + one-hot MXU select entirely.
            psel = [lgt_ref[0:1, c : c + 1] for c in range(_LC_PRIM)]
        else:
            lidx = jnp.minimum(
                (u0 * num_lights).astype(jnp.int32), num_lights - 1
            )
            liota = jax.lax.broadcasted_iota(
                jnp.int32, (lgt_ref.shape[0], lidx.shape[1]), 0
            )
            mask_pick = (liota == lidx).astype(ox.dtype)
            psel = _select_rows(
                mask_pick, [lgt_ref[:, c : c + 1] for c in range(_LC_PRIM)]
            )
        p_is_tri = psel[_LC_ISTRI] > 0.5
        p_p = (psel[_LC_P], psel[_LC_P + 1], psel[_LC_P + 2])
        p_rad = psel[_LC_RAD]
        p_e1 = (psel[_LC_E1], psel[_LC_E1 + 1], psel[_LC_E1 + 2])
        p_e2 = (psel[_LC_E2], psel[_LC_E2 + 1], psel[_LC_E2 + 2])
        p_n = (psel[_LC_N], psel[_LC_N + 1], psel[_LC_N + 2])
        p_area = psel[_LC_AREA]
        p_emi = (psel[_LC_EMI], psel[_LC_EMI + 1], psel[_LC_EMI + 2])

        # Light-class lanes statically gated (Scene.has_tri_lights /
        # has_sph_lights) — single-class scenes skip the other lane's math
        # entirely; the where-merge with a uniform predicate IS that lane.
        if has_tri_l:
            # Triangle lane: sqrt-warp area sample (shape.rs:210-219).
            sqrt_r1 = jnp.sqrt(u1)
            wu = 1.0 - sqrt_r1
            wv = u2 * sqrt_r1
            lp_tri = _add3(_add3(p_p, _scale3(p_e1, wu)), _scale3(p_e2, wv))

        if has_sph_l:
            # Sphere lane: uniform cone direction, re-intersected
            # (shape.rs:91-145). Round-5 op trims, all bitwise-exact reuses:
            # |ocv|^2 IS dist_sq ((-x)*(-x) == x*x), the normalize's length
            # dot IS dist_sq, and -(p_p - point) IS point - p_p in IEEE.
            to_c = _sub3(p_p, point)
            dist_sq = _dot3(to_c, to_c)
            rad_sq = p_rad * p_rad
            sin2_max = rad_sq / jnp.where(dist_sq > 0.0, dist_sq, 1.0)
            cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))
            solid = 2.0 * _PI * (1.0 - cos_max)
            pdf_sph = 1.0 / jnp.maximum(solid, 1e-12)
            cth = 1.0 - u1 + u1 * cos_max
            sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
            phi = 2.0 * _PI * u2
            ln_c = jnp.sqrt(dist_sq)
            safe_c = jnp.where(ln_c > 0.0, ln_c, 1.0)
            wdir = tuple(
                jnp.where(ln_c > 0.0, c / safe_c, c) for c in to_c
            )
            wy_big = jnp.abs(wdir[1]) > 0.999
            onec = jnp.ones_like(wdir[0])
            zeroc = jnp.zeros_like(wdir[0])
            upv = (jnp.where(wy_big, onec, zeroc), jnp.where(wy_big, zeroc, onec), zeroc)
            uax = _normalize3(_cross3(upv, wdir))
            vax = _cross3(wdir, uax)
            cone = _normalize3(
                _add3(
                    _add3(_scale3(uax, sth * jnp.cos(phi)), _scale3(vax, sth * jnp.sin(phi))),
                    _scale3(wdir, cth),
                )
            )
            ocv = _neg3(to_c)
            a_q = _dot3(cone, cone)
            hb_q = _dot3(ocv, cone)
            c_q = dist_sq - rad_sq
            disc_q = hb_q * hb_q - a_q * c_q
            t_q = (-hb_q - jnp.sqrt(jnp.maximum(disc_q, 0.0))) / a_q
            lp_sph = _add3(point, _scale3(cone, t_q))

        if has_tri_l and has_sph_l:
            lpoint = _where3(p_is_tri, lp_tri, lp_sph)
            lnorm = _where3(p_is_tri, p_n, _normalize3(_sub3(lp_sph, p_p)))
        elif has_tri_l:
            lpoint, lnorm = lp_tri, p_n
        else:
            lpoint, lnorm = lp_sph, _normalize3(_sub3(lp_sph, p_p))

        to_light = _sub3(lpoint, point)
        ldist = jnp.sqrt(_dot3(to_light, to_light))
        safe_ld = jnp.where(ldist > 0.0, ldist, 1.0)
        ldir = (
            to_light[0] / safe_ld, to_light[1] / safe_ld, to_light[2] / safe_ld
        )

        if has_tri_l:
            cos_li = jnp.abs(_dot3(lnorm, _neg3(ldir)))
            pdf_area = 1.0 / jnp.maximum(p_area, 1e-20)
            pdf_tri = jnp.where(
                cos_li > 1e-8,
                pdf_area * (ldist * ldist) / jnp.maximum(cos_li, 1e-8),
                1e-8,
            )
        if has_tri_l and has_sph_l:
            ls_pdf = jnp.where(p_is_tri, pdf_tri, pdf_sph) / num_lights
        elif has_tri_l:
            ls_pdf = pdf_tri / num_lights
        else:
            ls_pdf = pdf_sph / num_lights

        # Shadow any-hit sweep over both classes, t in [eps, dist - eps]
        # (rendering.rs:62-65). Same hit criteria as the closest sweeps.
        # Only when fuse_shadow: by this point the kernel's register file is
        # crowded and the in-kernel sweep measured 134 us vs 61 us for the
        # standalone any-hit kernel — the split (shadow ray exported, swept
        # by ops/pallas_intersect.any_hit, visibility applied in XLA) wins.
        if fuse_shadow and "shadow" in sections:
            so = point
            sd = ldir
            s_tmax = ldist - eps
            sod = _dot3(so, sd)
            soo = _dot3(so, so)
            s_cd = cx * sd[0] + cy * sd[1] + cz * sd[2]
            s_co = cx * so[0] + cy * so[1] + cz * so[2]
            s_hb = sod - s_cd
            s_ct = soo - 2.0 * s_co + kq
            s_disc = s_hb * s_hb - s_ct
            s_sq = jnp.sqrt(s_disc)
            s_r1 = -s_hb - s_sq
            s_tc = jnp.where(s_r1 >= eps, s_r1, -s_hb + s_sq)
            s_ok = (s_tc >= eps) & (s_tc <= s_tmax)
            occ_s = jnp.max(jnp.where(s_ok, 1.0, 0.0), axis=0, keepdims=True)

            shx = sd[1] * e2[2] - sd[2] * e2[1]
            shy = sd[2] * e2[0] - sd[0] * e2[2]
            shz = sd[0] * e2[1] - sd[1] * e2[0]
            sa = e1[0] * shx + e1[1] * shy + e1[2] * shz
            sf = 1.0 / sa
            ssx = so[0] - v0[0]; ssy = so[1] - v0[1]; ssz = so[2] - v0[2]
            su = sf * (ssx * shx + ssy * shy + ssz * shz)
            sqx = ssy * e1[2] - ssz * e1[1]
            sqy = ssz * e1[0] - ssx * e1[2]
            sqz = ssx * e1[1] - ssy * e1[0]
            sv = sf * (sd[0] * sqx + sd[1] * sqy + sd[2] * sqz)
            st = sf * (e2[0] * sqx + e2[1] * sqy + e2[2] * sqz)
            s_ok_t = (
                (jnp.abs(sa) >= 1e-8)
                & (su >= 0.0) & (su <= 1.0)
                & (sv >= 0.0) & (su + sv <= 1.0)
                & (st >= eps) & (st <= s_tmax)
            )
            occ_t = jnp.max(jnp.where(s_ok_t, 1.0, 0.0), axis=0, keepdims=True)
            blocked = (occ_s + occ_t) > 0.0
        else:
            blocked = ldist < 0.0  # split mode: visibility resolved outside

        # _eval_lambert inlined so its o·n dot is shared with cos_l
        # (commutative products — bitwise identical to the composed path).
        ldir_n = _dot3(ldir, normal)
        cos_l = jnp.abs(ldir_n)
        lam_b = _scale3(m_col, 1.0 / _PI)
        lam_p = jnp.maximum(ldir_n, 0.0) * (1.0 / _PI)
        if has_mirror and "neeeval" in sections:
            mir_b, mir_p = _eval_mirror(
                m_col, m_rough, m_metal, m_ior, i3, ldir, normal, eta_in
            )
            is_mir = kind_i == mat.KIND_MIRROR
            bsdf_l = _where3(is_mir, mir_b, lam_b)
            pdf_l = jnp.where(is_mir, mir_p, lam_p)
        else:
            bsdf_l, pdf_l = lam_b, lam_p
        if has_on and "neeeval" in sections:
            on_b, on_p = _eval_oren_nayar3(m_col, m_rough, i3, ldir, normal)
            is_on = kind_i == mat.KIND_OREN_NAYAR
            bsdf_l = _where3(is_on, on_b, bsdf_l)
            pdf_l = jnp.where(is_on, on_p, pdf_l)
        if has_pbr and "neeeval" in sections:
            pbr_b, pbr_p = _eval_pbr3(
                m_col, m_rough, m_metal, m_ior, i3, ldir, normal
            )
            is_pbr = kind_i == mat.KIND_PBR
            bsdf_l = _where3(is_pbr, pbr_b, bsdf_l)
            pdf_l = jnp.where(is_pbr, pbr_p, pdf_l)
        # Non-diffuse/non-mirror kinds (emissive) eval to zero / pdf 1.
        is_em_k = kind_i == mat.KIND_EMISSIVE
        bsdf_l = _where3(is_em_k, (0.0 * ox,) * 3, bsdf_l)
        pdf_l = jnp.where(is_em_k, 1.0, pdf_l)

        if use_mis:
            w_nee = ls_pdf / (ls_pdf + pdf_l)
        else:
            w_nee = jnp.ones_like(ls_pdf)
        # Same association as the composed path's
        # w_nee * bsdf * emission * (cos/pdf) for bitwise agreement.
        cscale = cos_l / ls_pdf
        direct = (
            w_nee * bsdf_l[0] * p_emi[0] * cscale,
            w_nee * bsdf_l[1] * p_emi[1] * cscale,
            w_nee * bsdf_l[2] * p_emi[2] * cscale,
        )
        direct = _forz3(_where3(blocked, (0.0 * ox,) * 3, direct))
        sdir = ldir
        # Shadow t_max for the external sweep; lanes that cannot contribute
        # (not shading) get an empty range so the any-hit settles them free.
        stmax = jnp.where(shade, ldist - eps, -1.0)
    else:
        direct = (0.0 * ox,) * 3
        sdir = (0.0 * ox + 1.0,) * 3
        stmax = 0.0 * ox - 1.0

    # ================= 4. BSDF sample + RR + state update ==================
    eta_s = jnp.where(front_face, 1.0 / m_ior, m_ior)
    d_diff = _cosine_hemisphere(normal, u3, u4)
    lam_b, lam_p = _eval_lambert(m_col, d_diff, normal)
    cos_diff = jnp.maximum(_dot3(d_diff, normal), 0.0)
    if "sample" not in sections:  # profiling knob only
        has_mirror = False
        has_on = False
        has_pbr = False
    if has_mirror:
        mo, mb, mp, mc = _sample_mirror(
            m_col, m_rough, m_metal, m_ior, i3, normal, eta_s, u3, u4, u5
        )
        is_mir = kind_i == mat.KIND_MIRROR
        o_dir = _where3(is_mir, mo, d_diff)
        bsdf_s = _where3(is_mir, mb, lam_b)
        pdf_s = jnp.where(is_mir, mp, lam_p)
        cos_s = jnp.where(is_mir, mc, cos_diff)
    else:
        o_dir, bsdf_s, pdf_s, cos_s = d_diff, lam_b, lam_p, cos_diff
    if has_on:
        # Diffuse sample direction is shared (material.rs:93-122, 267-295):
        # only the evaluated brdf/pdf differ from the Lambert lane.
        on_b, on_p = _eval_oren_nayar3(m_col, m_rough, i3, d_diff, normal)
        is_on = kind_i == mat.KIND_OREN_NAYAR
        bsdf_s = _where3(is_on, on_b, bsdf_s)
        pdf_s = jnp.where(is_on, on_p, pdf_s)
    if has_pbr:
        pbr_o, pbr_b, pbr_p, pbr_c = _sample_pbr3(
            m_col, m_rough, m_metal, m_ior, i3, normal, u3, u4, u5, d_diff
        )
        is_pbr = kind_i == mat.KIND_PBR
        o_dir = _where3(is_pbr, pbr_o, o_dir)
        bsdf_s = _where3(is_pbr, pbr_b, bsdf_s)
        pdf_s = jnp.where(is_pbr, pbr_p, pdf_s)
        cos_s = jnp.where(is_pbr, pbr_c, cos_s)
    is_em_k = kind_i == mat.KIND_EMISSIVE
    o_dir = _where3(is_em_k, normal, o_dir)
    bsdf_s = _where3(is_em_k, (0.0 * ox,) * 3, bsdf_s)
    pdf_s = jnp.where(is_em_k, 1.0, pdf_s)
    cos_s = jnp.where(is_em_k, 0.0, cos_s)

    fscale = cos_s / pdf_s
    factor = _scale3(bsdf_s, fscale)
    next_tp = (pfx[0] * factor[0], pfx[1] * factor[1], pfx[2] * factor[2])

    # RR schedule (rendering.rs:91-98).
    lum = jnp.minimum(_luminance3(_forz3(next_tp)), 1.0)
    decay = jnp.exp2(
        -(jnp.maximum(bounce - rr_min_depth, 0)).astype(lum.dtype)
    )
    rr = jnp.where(
        bounce < rr_min_depth,
        jnp.ones_like(lum),
        jnp.where(bounce >= rr_max_depth, lum * decay, lum),
    )
    survive = u6 < rr
    live = shade & survive

    # Quirk 1: NEE direct only counts when RR survives (rendering.rs:100-102).
    if fuse_shadow:
        # Visibility already applied; fold the NEE gain into rad_delta.
        dgain = _forz3(
            (pfx[0] * direct[0], pfx[1] * direct[1], pfx[2] * direct[2])
        )
        rad = _add3(rad, _where3(live, dgain, (0.0 * ox,) * 3))
        dout = (0.0 * ox,) * 3
    else:
        # Split mode: export prefix·direct; the caller masks by the external
        # any-hit's visibility AND `live` before adding (same quirk).
        dout = _forz3(
            (pfx[0] * direct[0], pfx[1] * direct[1], pfx[2] * direct[2])
        )

    new_pfx = _forz3(
        (next_tp[0] / rr, next_tp[1] / rr, next_tp[2] / rr)
    )

    rad_ref[0:1, :] = rad[0]
    rad_ref[1:2, :] = rad[1]
    rad_ref[2:3, :] = rad[2]
    dir_ref[0:1, :] = dout[0]
    dir_ref[1:2, :] = dout[1]
    dir_ref[2:3, :] = dout[2]
    sd_ref[0:1, :] = sdir[0]
    sd_ref[1:2, :] = sdir[1]
    sd_ref[2:3, :] = sdir[2]
    # Quirk 1 again: only RR survivors collect NEE, so only they need the
    # external visibility sweep — everyone else gets an empty [eps, -1] range
    # the any-hit kernel settles for free.
    st_ref[:, :] = jnp.where(live, stmax, -1.0)
    no_ref[0:1, :] = jnp.where(live, point[0], ox)
    no_ref[1:2, :] = jnp.where(live, point[1], oy)
    no_ref[2:3, :] = jnp.where(live, point[2], oz)
    nd_ref[0:1, :] = jnp.where(live, o_dir[0], dx)
    nd_ref[1:2, :] = jnp.where(live, o_dir[1], dy)
    nd_ref[2:3, :] = jnp.where(live, o_dir[2], dz)
    neta_ref[:, :] = jnp.where(live, eta_s, eta_in)
    npdf_ref[:, :] = jnp.where(live, pdf_s, pdf_prev)
    npfx_ref[0:1, :] = jnp.where(live, new_pfx[0], pfx[0])
    npfx_ref[1:2, :] = jnp.where(live, new_pfx[1], pfx[1])
    npfx_ref[2:3, :] = jnp.where(live, new_pfx[2], pfx[2])
    live_ref[:, :] = live.astype(jnp.int32)
    shade_ref[:, :] = shade.astype(jnp.int32)


class FusedTables(NamedTuple):
    """Scene tables packed for the megakernel (built once per render)."""

    sph: jnp.ndarray   # (Ps, _SPH_COLS)
    tri: jnp.ndarray   # (Pt, _TRI_COLS)
    lgt: jnp.ndarray   # (L8, _LGT_COLS)
    # (NC*128, _QUAD_K) bf16 sphere quadratic-form table for the MXU sweep
    # and its (NC, 8) f32 cluster-centroid table (both None when the scene
    # dtype is not f32 or there are no spheres): block c yields disc and c.d
    # for its 64 spheres in cluster-local coordinates via one matmul against
    # the per-ray feature stack (see _sphere_quad_tables).
    quad: jnp.ndarray | None
    quadg: jnp.ndarray | None


# The sphere quadratic (shape.rs:53-89) is bilinear in per-ray and per-sphere
# features, so the whole (P, W) pair sweep's multiply work can ride the MXU:
#   disc = cd^2 - 2 od cd + od^2 - oo + 2 co - kq   (kq = |c|^2 - r^2)
# with the 17 ray features
#   phi = [dx^2 dy^2 dz^2  dxdy dxdz dydz  od*d(3)  o(3)  od^2-oo  1  d(3)]
# and per-sphere coefficients
#   psi = [cx^2 cy^2 cz^2  2cxcy 2cxcz 2cycz  -2c(3)  2c(3)  1  -kq  c(3)]
# (the last 3 features/coefficients produce cd so half_b = od - cd).
# Operands on the MXU round to bf16, so both sides are split into bf16
# pieces (hi/mid/lo, 8+8+8 >= f32's 24 mantissa bits) and the six split
# pairs with combined precision >= 2^-24 are laid out ALONG THE CONTRACTION
# AXIS: K = 6*17 = 102 (padded to 128) in bf16 dots with f32 accumulation
# — exact products, ~84% MXU utilization.
#
# CRITICAL (round-3 lesson, measured): evaluated in GLOBAL coordinates the
# f32 accumulation error scales with |o|^2 ~ scene-diameter^2 (~3.6e-3
# absolute at this scene's corners), which overwhelms the eps=1e-3
# self-intersection guard — every bounce off a sphere falsely re-hit its
# own sphere at t ~ 2e-3 (+28% pool iterations, +57% image brightness).
# disc and half_b are translation-invariant, so the sweep runs in
# CLUSTER-LOCAL coordinates: spheres in contiguous morton blocks of
# _QUAD_CB rows share a centroid g, the coefficients use c-g and
# kq' = |c-g|^2 - r^2, and the kernel subtracts g from the ray origin per
# block. Self-hit pairs then see cluster-local magnitudes (error ~1e-5,
# 100x under eps); distant-pair error stays comparable to the VPU chain's
# own distributed-cancellation error (the kq-precompute form pays the same
# |o|^2 cancellation).
_QUAD_FEATS = 17
_QUAD_K = 128   # 6 * _QUAD_FEATS = 102, padded to the MXU contraction width
_QUAD_CB = 128  # spheres per recentered block (2*_QUAD_CB table rows per dot)


def _bf16_split3(a):
    """f32 -> three bf16-exact f32 pieces summing to a (within 1 ulp).

    Safe INSIDE Pallas kernels (Mosaic compiles the casts as written). Do
    NOT use in XLA-land table construction — see _trunc_split3."""
    b0 = a.astype(jnp.bfloat16).astype(a.dtype)
    r1 = a - b0
    b1 = r1.astype(jnp.bfloat16).astype(a.dtype)
    b2 = r1 - b1
    return b0, b1, b2


def _trunc_split3(a):
    """f32 -> three EXACT bf16-representable f32 pieces summing to a, via
    integer bit masking (each piece is the next 8-16 mantissa bits; the
    subtractions are exact because the residuals are representable).

    Measured round-3 hazard: the cast-based split (_bf16_split3) is silently
    DESTROYED by XLA's simplifier when the table construction is traced
    inside the same jit as the consumer dot (the production pool traces
    build_tables inside render_pool) — the f32->bf16->f32 round trips fold
    away, the coefficients round to single-bf16 precision, and the sphere
    sweep gained +30% false hits end to end. Integer bit ops cannot be
    algebraically folded with float converts, so this form survives any
    pipeline. NaN rows stay NaN (the quiet bit lives in the kept mantissa
    bits)."""
    mask = jnp.uint32(0xFFFF0000)
    ui = jax.lax.bitcast_convert_type(a, jnp.uint32)
    b0 = jax.lax.bitcast_convert_type(ui & mask, a.dtype)
    r1 = a - b0
    u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    b1 = jax.lax.bitcast_convert_type(u1 & mask, a.dtype)
    b2 = r1 - b1
    return b0, b1, b2


def _sphere_quad_tables(centers, radius, dtype):
    """Per-cluster bf16 coefficient tables + (NC, 8) f32 centroid table.

    Returns ``(quad (NC*2*_QUAD_CB, _QUAD_K) bf16, g (NC, 8) f32)``: block c
    holds rows [disc coeffs | cd coeffs] for its _QUAD_CB spheres in
    coordinates recentered on that block's centroid. Rows with radius <= 0
    (including padding) carry NaN kq so their disc poisons to NaN.
    """
    p = centers.shape[0]
    p_pad = _cdiv(max(p, 1), _QUAD_CB) * _QUAD_CB
    c_all = _pad_rows(centers, p_pad)
    r_all = _pad_rows(radius[:, None], p_pad)[:, 0]
    valid = (
        jnp.arange(p_pad) < p
    ) & (r_all > 0.0)
    nc = p_pad // _QUAD_CB

    vb = valid.reshape(nc, _QUAD_CB)
    cb = c_all.reshape(nc, _QUAD_CB, 3)
    cnt = jnp.maximum(jnp.sum(vb, axis=1), 1)[:, None]
    g = jnp.sum(jnp.where(vb[:, :, None], cb, 0.0), axis=1) / cnt  # (NC, 3)

    cl = cb - g[:, None, :]                         # cluster-local centers
    cx = cl[:, :, 0].reshape(-1)
    cy = cl[:, :, 1].reshape(-1)
    cz = cl[:, :, 2].reshape(-1)
    kq = jnp.where(
        valid, cx * cx + cy * cy + cz * cz - r_all * r_all, jnp.nan
    )
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    psi_disc = jnp.stack([
        cx * cx, cy * cy, cz * cz,
        2.0 * cx * cy, 2.0 * cx * cz, 2.0 * cy * cz,
        -2.0 * cx, -2.0 * cy, -2.0 * cz,
        2.0 * cx, 2.0 * cy, 2.0 * cz,
        one, -kq, zero, zero, zero,
    ], axis=0)                                           # (17, P_pad)
    psi_cd = jnp.stack(
        [zero] * (_QUAD_FEATS - 3) + [cx, cy, cz], axis=0
    )                                                    # (17, P_pad)

    def ext(psi):
        s0, s1, s2 = _trunc_split3(psi)
        e = jnp.concatenate([s0, s0, s0, s1, s1, s2], axis=0)   # (102, P_pad)
        pad = jnp.zeros((_QUAD_K - e.shape[0], e.shape[1]), dtype)
        return jnp.concatenate([e, pad], axis=0).T               # (P_pad, 128)

    ed = ext(psi_disc).reshape(nc, _QUAD_CB, _QUAD_K)
    ec = ext(psi_cd).reshape(nc, _QUAD_CB, _QUAD_K)
    quad = jnp.concatenate([ed, ec], axis=1).reshape(
        nc * 2 * _QUAD_CB, _QUAD_K
    ).astype(jnp.bfloat16)
    g8 = jnp.concatenate([g, jnp.zeros((nc, 5), dtype)], axis=1)
    return quad, g8


def supports_scene(scene: Scene, integrator: str) -> bool:
    """Static gate: can the megakernel serve this scene/integrator?
    (ON/PBR scenes ride statically-gated extra lanes since round 4 —
    `has_on`/`has_pbr` on fused_bounce — so only the size caps remain.)"""
    return (
        integrator in ("mis", "nee", "brdf_only")
        and scene.tri_v0.shape[0] <= MAX_TRIS
        and scene.sph_center.shape[0] <= MAX_SPHERES
        and scene.light_geom.shape[0] <= MAX_LIGHTS
    )


def build_tables(scene: Scene) -> FusedTables:
    """Pack per-primitive material rows (resolving the material indirection at
    scene-build rate, not wave rate) and the light table. Call once outside
    the render loop so the packing isn't re-executed per bounce."""
    dtype = scene.mat_color.dtype

    def mat_cols(mid):
        return [
            scene.mat_kind[mid].astype(dtype)[:, None],
            scene.mat_color[mid],
            scene.mat_emission[mid],
            scene.mat_roughness[mid][:, None],
            scene.mat_metallic[mid][:, None],
            scene.mat_ior[mid][:, None],
        ]

    centers = scene.sph_center
    radius = scene.sph_radius
    kq = jnp.where(
        radius > 0.0,
        jnp.sum(centers * centers, axis=-1) - radius * radius,
        jnp.nan,
    )[:, None]
    inv_r = jnp.where(
        radius > 0, 1.0 / jnp.where(radius > 0, radius, 1.0), 0.0
    )[:, None]
    sph = jnp.concatenate([centers, kq, inv_r] + mat_cols(scene.sph_mat), axis=1)
    sph = _pad_rows(sph, _round8(sph.shape[0]))
    # Padding rows: k stays NaN only for real padded radius-0 rows; rows added
    # here get k=0 with center 0 — give them NaN too so they can never hit.
    if sph.shape[0] > centers.shape[0]:
        fixk = jnp.concatenate(
            [kq[:, 0], jnp.full((sph.shape[0] - centers.shape[0],), jnp.nan, dtype)]
        )
        sph = sph.at[:, _SC_K].set(fixk)

    tri = jnp.concatenate(
        [scene.tri_v0, scene.tri_e1, scene.tri_e2, scene.tri_normal]
        + mat_cols(scene.tri_mat),
        axis=1,
    )
    tri = _pad_rows(tri, _round8(tri.shape[0]))

    lgt = jnp.concatenate(
        [scene.light_geom, scene.light_prims.astype(dtype)[:, None]], axis=1
    )
    # Padded light rows: prim id -2 (matches no hit), zero geometry.
    pad_rows = _round8(lgt.shape[0]) - lgt.shape[0]
    if pad_rows:
        fill = jnp.zeros((pad_rows, _LGT_COLS), dtype).at[:, _LC_PRIM].set(-2.0)
        lgt = jnp.concatenate([lgt, fill], axis=0)
    if dtype == jnp.float32 and centers.shape[0] > 0:
        quad, quadg = _sphere_quad_tables(centers, radius, dtype)
    else:
        quad = quadg = None
    return FusedTables(sph=sph, tri=tri, lgt=lgt, quad=quad, quadg=quadg)


class BounceResult(NamedTuple):
    rad_delta: jnp.ndarray   # (N, 3) radiance gained this bounce (pre-masked)
    next_o: jnp.ndarray      # (N, 3) == hit point for live lanes (also the
    #                          shadow-ray origin in split mode)
    next_d: jnp.ndarray      # (N, 3)
    next_eta: jnp.ndarray    # (N,)
    next_pdf: jnp.ndarray    # (N,)
    next_prefix: jnp.ndarray  # (N, 3)
    live: jnp.ndarray        # (N,) bool
    shade: jnp.ndarray       # (N,) bool
    # Split mode (fuse_shadow=False) only — zeros otherwise:
    nee_gain: jnp.ndarray    # (N, 3) prefix-direct, pending visibility mask
    shadow_d: jnp.ndarray    # (N, 3) shadow-ray direction
    shadow_tmax: jnp.ndarray  # (N,) shadow range end; < 0 for lanes w/o NEE


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_tris", "num_lights", "integrator", "max_bounces", "eps",
        "interpret", "ray_tile", "fuse_shadow", "transposed", "sections",
        "has_on", "has_pbr", "has_tri_lights", "has_sph_lights",
    ),
)
def fused_bounce(
    tables: FusedTables,
    busy, bounce, ray_o, ray_d, eta, pdf_prev, prefix, uniforms,
    *,
    num_tris: int,
    num_lights: int,
    integrator: str,
    max_bounces: int,
    eps: float = 1e-3,
    interpret: bool = False,
    ray_tile: int | None = None,
    fuse_shadow: bool = False,
    transposed: bool = False,
    raygen=None,
    has_on: bool = False,
    has_pbr: bool = False,
    has_tri_lights: bool = True,
    has_sph_lights: bool = True,
    sections: frozenset = frozenset({"emis", "nee", "neeeval", "shadow", "sample"}),
) -> BounceResult:
    """One full path-vertex step for a wave (see module docstring).

    ``uniforms`` is the (N, 8) per-bounce draw vector (utils/rng.py slots).
    ``num_tris`` must be the scene's PADDED triangle row count — the global
    prim-id base for spheres (models/scene.py id convention).
    ``transposed``: inputs/outputs already in kernel layout — busy/bounce/
    eta/pdf_prev as (S,), 3-vectors as (3, S), uniforms (8, S); S a ray_tile
    multiple. The production pool uses this to keep its whole state in
    kernel layout (zero per-iteration transposes).
    ``raygen``: optional ``(started (S,) bool, px (S,) i32, py (S,) i32,
    cam_row (2, 8))`` — transposed mode only. When given, ray_o/ray_d/eta/
    pdf_prev/prefix are the PRE-refill carried state and the kernel performs
    the primary-ray generation (camera row packed by pool._camera_row) and
    the started-lane float merges itself; busy/bounce must still arrive
    post-merge (the pool's RNG draw needs them in XLA regardless).
    ``sections`` is a PROFILING-ONLY knob (examples/profile_fused.py): a
    subset disables parts of the kernel to attribute its cost; production
    callers must pass the default full set.
    """
    if ray_tile is None:
        # PT_FUSED_RAY_TILE overrides at trace time (profiling only; see the
        # RAY_TILE note for the measured tile-width negative result).
        ray_tile = int(_os.environ.get("PT_FUSED_RAY_TILE", "0")) or RAY_TILE
    if transposed:
        # Caller keeps the whole pool state in kernel layout — (k, S) rows,
        # rays on the lane axis — so no per-iteration pad/transpose traffic.
        # (Lane padding only fires for small pools; production S is already
        # a ray_tile multiple.)
        n = busy.shape[0]
        n_pad = _cdiv(n, ray_tile) * ray_tile
        dtype = ray_o.dtype
        use_mis = integrator == "mis"
        use_nee = integrator in ("mis", "nee")
        has_mirror = True

        def lane_pad(a, fill=0.0):
            pad = n_pad - a.shape[-1]
            if pad == 0:
                return a
            return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                           constant_values=fill)

        busy_p = lane_pad(busy.astype(jnp.int32)[None, :], 0)
        bounce_p = lane_pad(bounce[None, :], 0)
        o_t = lane_pad(ray_o)
        d_t = lane_pad(ray_d, 1.0)
        pfx_t = lane_pad(prefix)
        u_t = lane_pad(uniforms)
        eta_p = lane_pad(eta[None, :], 1.0)
        pdfp_p = lane_pad(pdf_prev[None, :], 1.0)
    else:
        n = busy.shape[0]
        n_pad = _cdiv(n, ray_tile) * ray_tile
        dtype = ray_o.dtype
        use_mis = integrator == "mis"
        use_nee = integrator in ("mis", "nee")
        has_mirror = True  # lane gating decided by caller via supports_scene

        busy_p = _pad_rows(busy.astype(jnp.int32)[:, None], n_pad).T
        bounce_p = _pad_rows(bounce[:, None], n_pad).T
        o_t = _pad_rows(ray_o, n_pad).T
        d_t = _pad_rows(ray_d, n_pad, fill=1.0).T
        eta_p = _pad_rows(eta[:, None], n_pad, fill=1.0).T
        pdfp_p = _pad_rows(pdf_prev[:, None], n_pad, fill=1.0).T
        pfx_t = _pad_rows(prefix, n_pad).T
        u_t = _pad_rows(uniforms, n_pad).T

    grid = (n_pad // ray_tile,)

    def spec(k):
        return pl.BlockSpec((k, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    def out_struct(shape, dt):
        vma = frozenset().union(
            *(jax.typeof(a).vma for a in (ray_o, ray_d, busy, prefix))
        )
        return jax.ShapeDtypeStruct(shape, dt, vma=vma)

    # MXU quadratic sphere sweep: f32 production path only. The VPU
    # formulation stays the reference: interpret-mode (the fused-vs-composed
    # exact-ray-count tests) and f64 scenes always use it, and
    # PT_NO_MXU_QUAD=1 restores it on TPU for A/B runs (see quad_enabled).
    use_quad = (
        tables.quad is not None
        and dtype == jnp.float32
        and quad_enabled(interpret)
    )
    if raygen is not None:
        if not transposed:
            raise ValueError("raygen fusion requires transposed mode")
        rg_started, rg_px, rg_py, rg_cam = raygen
        rg_started_p = lane_pad(rg_started.astype(jnp.int32)[None, :], 0)
        rg_pxy_p = lane_pad(
            jnp.concatenate([rg_px[None, :], rg_py[None, :]], axis=0), 0
        )
        rg_in = [rg_started_p, rg_pxy_p, rg_cam]
        rg_specs = [
            spec(1), spec(2), pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    else:
        rg_in, rg_specs = [], []
    outs = pl.pallas_call(
        functools.partial(
            _fused_bounce_kernel,
            num_tris=num_tris,
            num_lights=num_lights,
            max_bounces=max_bounces,
            use_mis=use_mis,
            use_nee=use_nee,
            has_mirror=has_mirror,
            has_on=has_on,
            has_pbr=has_pbr,
            # Inconsistent caller flags (both False with lights present)
            # degrade to both lanes on — correctness over the trim.
            # PT_NO_LIGHTGATE=1 keeps both lanes for A/B attribution
            # (trace-time, like PT_NO_MXU_QUAD).
            has_tri_l=(has_tri_lights or not has_sph_lights
                       or bool(_os.environ.get("PT_NO_LIGHTGATE"))),
            has_sph_l=(has_sph_lights or not has_tri_lights
                       or bool(_os.environ.get("PT_NO_LIGHTGATE"))),
            eps=eps,
            rr_min_depth=4,
            rr_max_depth=50,
            fuse_shadow=fuse_shadow,
            sections=sections,
            use_quad=use_quad,
            fuse_raygen=raygen is not None,
        ),
        grid=grid,
        in_specs=[
            spec(1), spec(1), spec(3), spec(3), spec(1), spec(1), spec(3),
            spec(9 if raygen is not None else 8),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2 if use_quad else [])
          + rg_specs,
        out_specs=[
            spec(3), spec(3), spec(3), spec(1), spec(1), spec(3), spec(1),
            spec(1), spec(3), spec(3), spec(1),
        ],
        out_shape=[
            out_struct((3, n_pad), dtype),
            out_struct((3, n_pad), dtype),
            out_struct((3, n_pad), dtype),
            out_struct((1, n_pad), dtype),
            out_struct((1, n_pad), dtype),
            out_struct((3, n_pad), dtype),
            out_struct((1, n_pad), jnp.int32),
            out_struct((1, n_pad), jnp.int32),
            out_struct((3, n_pad), dtype),
            out_struct((3, n_pad), dtype),
            out_struct((1, n_pad), dtype),
        ],
        interpret=interpret,
    )(busy_p, bounce_p, o_t, d_t, eta_p, pdfp_p, pfx_t, u_t,
      tables.sph, tables.tri, tables.lgt,
      *([tables.quad, tables.quadg] if use_quad else []),
      *rg_in)
    rad, no, nd, neta, npdf, npfx, live, shade, dgain, sdir, stmax = outs
    if transposed:
        return BounceResult(
            rad_delta=rad[:, :n],
            next_o=no[:, :n],
            next_d=nd[:, :n],
            next_eta=neta[0, :n],
            next_pdf=npdf[0, :n],
            next_prefix=npfx[:, :n],
            live=live[0, :n] != 0,
            shade=shade[0, :n] != 0,
            nee_gain=dgain[:, :n],
            shadow_d=sdir[:, :n],
            shadow_tmax=stmax[0, :n],
        )
    return BounceResult(
        rad_delta=rad[:, :n].T,
        next_o=no[:, :n].T,
        next_d=nd[:, :n].T,
        next_eta=neta[0, :n],
        next_pdf=npdf[0, :n],
        next_prefix=npfx[:, :n].T,
        live=live[0, :n] != 0,
        shade=shade[0, :n] != 0,
        nee_gain=dgain[:, :n].T,
        shadow_d=sdir[:, :n].T,
        shadow_tmax=stmax[0, :n],
    )


def quad_enabled(interpret: bool) -> bool:
    """Trace-time gate shared by the megakernel sweep and the quad any-hit:
    the MXU quadratic-form path runs on real accelerators only (the VPU
    formulation stays the interpret-mode / f64 reference), PT_FORCE_MXU_QUAD
    turns it on under the interpreter for equivalence tests, and
    PT_NO_MXU_QUAD restores the VPU path on TPU for A/B runs."""
    import os as _os

    if _os.environ.get("PT_NO_MXU_QUAD"):
        return False
    return not interpret or bool(_os.environ.get("PT_FORCE_MXU_QUAD"))


def _quad_anyhit_kernel(o_ref, d_ref, tmax_ref, tri_ref, quad_ref, quadg_ref,
                        occ_ref, *, eps, interval):
    """Shadow any-hit over the megakernel's scene tables.

    Same hit criteria as ops/pallas_intersect._anyhit_kernel (the reference's
    shape.rs:53-89 sphere quadratic and shape.rs:161-198 Möller-Trumbore,
    OR-reduced — occlusion needs no winner), but the ~17 VPU ops/pair of
    sphere quadratic setup ride the MXU via the recentered bf16-split tables
    (_sphere_quad_tables); only the root select + range test stay on the VPU.

    Lanes with t_max < eps (the pool's no-NEE sentinel and lane padding)
    cannot satisfy ``t >= eps & t <= t_max`` and need no masking; NaN
    sphere-padding rows poison disc to NaN, which fails every comparison.
    """
    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    t_max = tmax_ref[0:1, :]
    t_min = jnp.full(t_max.shape, eps, t_max.dtype)

    # Triangles: single VMEM tile (zero-edge padding rows self-reject).
    v0x = tri_ref[:, 0:1]; v0y = tri_ref[:, 1:2]; v0z = tri_ref[:, 2:3]
    e1x = tri_ref[:, 3:4]; e1y = tri_ref[:, 4:5]; e1z = tri_ref[:, 5:6]
    e2x = tri_ref[:, 6:7]; e2y = tri_ref[:, 7:8]; e2z = tri_ref[:, 8:9]
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    f = 1.0 / a
    sx = ox - v0x; sy = oy - v0y; sz = oz - v0z
    uu = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    ok_t = (
        (jnp.abs(a) >= 1e-8)
        & (uu >= 0.0) & (uu <= 1.0)
        & (vv >= 0.0) & (uu + vv <= 1.0)
        & (t >= t_min) & (t <= t_max)
    )
    occ = jnp.any(ok_t, axis=0, keepdims=True)

    # Spheres: MXU quadratic-form sweep, one bf16-split dot per recentered
    # block (identical table layout/precision story to the megakernel's
    # closest-hit sweep — see the _sphere_quad_tables comment block).
    one_r = jnp.ones_like(ox)
    zpad = jnp.zeros((_QUAD_K - 6 * _QUAD_FEATS, ox.shape[1]), ox.dtype)
    n_blocks = quadg_ref.shape[0]
    cb = quad_ref.shape[0] // (2 * n_blocks)
    for c in range(n_blocks):
        gx = quadg_ref[c : c + 1, 0:1]
        gy = quadg_ref[c : c + 1, 1:2]
        gz = quadg_ref[c : c + 1, 2:3]
        oxc, oyc, ozc = ox - gx, oy - gy, oz - gz
        odc = oxc * dx + oyc * dy + ozc * dz
        ooc = oxc * oxc + oyc * oyc + ozc * ozc
        phi = jnp.concatenate([
            dx * dx, dy * dy, dz * dz, dx * dy, dx * dz, dy * dz,
            odc * dx, odc * dy, odc * dz, oxc, oyc, ozc,
            odc * odc - ooc, one_r, dx, dy, dz,
        ], axis=0)                                   # (17, W)
        p0, p1, p2 = _bf16_split3(phi)
        phi_ext = jnp.concatenate(
            [p0, p1, p2, p0, p1, p0, zpad], axis=0
        ).astype(jnp.bfloat16)                       # (128, W)
        base = c * 2 * cb
        pairs = jax.lax.dot_general(
            quad_ref[base : base + 2 * cb, :], phi_ext,
            (((1,), (0,)), ((), ())),
            preferred_element_type=ox.dtype,
        )                                            # (2*cb, W)
        disc = pairs[:cb, :]
        half_b = odc - pairs[cb:, :]
        if interval:
            # sqrt-free interval test, minimal-op form. Occlusion is "the
            # quadratic has a root in the closed [t_min, t_max]" (exactly the
            # reference's near-then-far selection + range check). With roots
            # -hb ∓ √disc, the interval [t_min, t_max] intersects [r1, r2]
            # iff  √disc ≥ t_min + hb  (far root past t_min)  and
            #      √disc ≥ -(t_max + hb)  (near root before t_max);
            # folding the two via m = max(...) and squaring sign-awarely,
            # that is  disc ≥ 0  ∧  disc ≥ m·|m|  — 9 (P, W)-plane ops vs 19
            # for the parabola-endpoint form this replaces (measured +3.1%
            # headline over the sqrt form; this form trims the same test
            # further). Rounding differs from the sqrt form only on
            # knife-edge lanes (the documented determinism freedom).
            # PT_ANYHIT_INTERVAL=0 restores the sqrt form for A/B.
            ta = t_min + half_b
            tb = t_max + half_b
            m = jnp.maximum(ta, -tb)
            ok_any = (disc >= 0.0) & (disc >= m * jnp.abs(m))
            ok_any = ok_any & (t_max >= t_min)   # empty ranges never hit
            occ = occ | jnp.any(ok_any, axis=0, keepdims=True)
        else:
            sq = jnp.sqrt(disc)
            root1 = -half_b - sq
            t_c = jnp.where(root1 >= t_min, root1, -half_b + sq)
            ok_s = (t_c >= t_min) & (t_c <= t_max)
            occ = occ | jnp.any(ok_s, axis=0, keepdims=True)
    occ_ref[:, :] = occ.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret", "ray_tile")
)
def any_hit_quad(
    tables: FusedTables,
    o, d, t_max,
    *,
    eps: float = 1e-3,
    interpret: bool = False,
    ray_tile: int | None = None,
):
    """Occlusion mask for the pool's NEE shadow rays via the MXU quad sweep.

    Kernel-layout inputs (the production pool's zero-transpose path): ``o``/
    ``d`` are (3, S), ``t_max`` (S,) with values < eps meaning "no query"
    (the megakernel emits shadow_tmax < 0 for lanes without NEE). Requires
    ``tables.quad`` (f32 scene with spheres); callers gate on that plus
    :func:`quad_enabled`. Replaces ops/pallas_intersect.any_hit on the fused
    pool path — same hit criteria, knife-edge lanes may round differently
    than the VPU path (documented determinism contract).
    """
    import os as _os
    if ray_tile is None:
        ray_tile = int(_os.environ.get("PT_FUSED_RAY_TILE", "0")) or RAY_TILE
    # Default ON since the round-4 A/B (+3.1% headline); PT_ANYHIT_INTERVAL=0
    # restores the sqrt/root-select form for attribution runs.
    interval = _os.environ.get("PT_ANYHIT_INTERVAL", "1") not in ("0", "")
    n = t_max.shape[0]
    n_pad = _cdiv(n, ray_tile) * ray_tile
    dtype = o.dtype

    def lane_pad(a, fill=0.0):
        pad = n_pad - a.shape[-1]
        if pad == 0:
            return a
        return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)],
                       constant_values=fill)

    o_p = lane_pad(o)
    d_p = lane_pad(d, 1.0)
    tmax_p = lane_pad(t_max[None, :], -1.0)

    def spec(k):
        return pl.BlockSpec((k, ray_tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    vma = frozenset().union(*(jax.typeof(a).vma for a in (o, d, t_max)))
    occ = pl.pallas_call(
        functools.partial(_quad_anyhit_kernel, eps=eps, interval=interval),
        grid=(n_pad // ray_tile,),
        in_specs=[
            spec(3), spec(3), spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=spec(1),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32, vma=vma),
        interpret=interpret,
    )(o_p, d_p, tmax_p, tables.tri, tables.quad, tables.quadg)
    return occ[0, :n] != 0
