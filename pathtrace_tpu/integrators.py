"""Wavefront path-tracing integrators.

The reference integrates with per-pixel *recursion* over bounce depth
(rendering.rs:34-142) — three scene traversals per bounce (path, shadow, peek;
the recursion re-traces the peeked ray). Here the whole wave advances together
inside ``lax.while_loop`` with alive masks: per bounce one shadow trace and one
peek trace, and the peek **is** the next bounce's hit (the re-trace is
deterministic, so reusing it is semantics-preserving and removes a third of
the traversal cost).

Estimator semantics replicate the reference exactly, including its two quirks
(both required for RMSE parity — SURVEY §3.2):

1. Russian-roulette termination discards the NEE direct light already gathered
   at the current vertex (rendering.rs:100-102) — so `direct` is only added to
   the accumulator *after* the ray survives RR.
2. The balance-heuristic bsdf-side pdf is not divided by the light count while
   the NEE-side pdf is (rendering.rs:114-117 vs world.rs:260).

Other conventions preserved: lights are camera-visible only at depth 0 in MIS
(rendering.rs:42-49) but at any depth in BRDF-only (rendering.rs:225-227); RR
schedule 1 below depth 4, throughput-luminance-capped above, hard 0.5^(d-4)
decay from depth 50 (rendering.rs:91-98); ray t_min 0.001 everywhere and
shadow t_max = dist - 0.001 (rendering.rs:41, 62-65); the IOR ratio is carried
on the ray — NEE at a vertex evaluates with the eta set at the *previous*
vertex, the BSDF sample with the current vertex's (rendering.rs:72 vs :83).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.scene import Scene
from .ops import bsdf as bsdf_ops
from .ops import lights as light_ops
from .ops.intersect import Hit, intersect, occluded
from .utils import rng as rng_ops
from .utils import vec

EPS = 1e-3          # ray t_min / shadow t_max margin (rendering.rs:41,64)
RR_MIN_DEPTH = 4    # rendering.rs:6
RR_MAX_DEPTH = 50   # rendering.rs:7

INTEGRATORS = ("mis", "nee", "brdf_only")


class _WaveState(NamedTuple):
    bounce: jnp.ndarray
    ray_d: jnp.ndarray
    ray_eta: jnp.ndarray
    hit: Hit
    prefix: jnp.ndarray
    radiance: jnp.ndarray
    alive: jnp.ndarray
    rays: jnp.ndarray  # scene-traversal ray-query counter (per-wave metric)


def _rr_probability(bounce, next_throughput):
    """RR schedule (rendering.rs:91-98)."""
    lum = jnp.minimum(vec.luminance(vec.finite_or_zero(next_throughput)), 1.0)
    decay = jnp.exp2(-(jnp.maximum(bounce - RR_MIN_DEPTH, 0)).astype(lum.dtype))
    return jnp.where(
        bounce < RR_MIN_DEPTH,
        jnp.ones_like(lum),
        jnp.where(bounce >= RR_MAX_DEPTH, lum * decay, lum),
    )


@partial(
    jax.jit,
    static_argnames=(
        "integrator", "max_bounces", "return_stats", "num_light_samples"
    ),
)
def trace_wave(
    scene: Scene,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    keys: jax.Array,
    integrator: str = "mis",
    max_bounces: int = 64,
    return_stats: bool = False,
    num_light_samples: int = 1,
):
    """Estimate radiance for a wave of primary rays. Returns ``(N, 3)``, or
    ``(radiance, ray_queries)`` when ``return_stats`` — ray_queries is the
    total number of scene-traversal ray tests issued (primary + shadow + peek),
    the numerator of the Mrays/s throughput metric.

    ``keys``: per-ray threefry keys (pixel, sample) — bounce indices are folded
    in internally, so results are independent of wave batching.

    ``num_light_samples``: NEE light samples per vertex, averaged — the
    reference's ``NUM_LIGHT_SAMPLES`` loop (rendering.rs:10,55-81); the
    constant is 1 upstream. At 1 this function is bitwise-identical to the
    pre-knob estimator (the extra fold/divide are statically elided);
    ignored by ``brdf_only`` which has no NEE lane.
    """
    if integrator not in INTEGRATORS:
        raise ValueError(f"unknown integrator {integrator!r}; expected {INTEGRATORS}")
    if num_light_samples < 1:
        raise ValueError("num_light_samples must be >= 1")
    if integrator == "brdf_only":
        radiance, rays = _trace_brdf_only(scene, ray_o, ray_d, keys, max_bounces)
    else:
        radiance, rays = _trace_nee_mis(
            scene, ray_o, ray_d, keys, max_bounces,
            use_mis=integrator == "mis",
            num_light_samples=num_light_samples,
        )
    return (radiance, rays) if return_stats else radiance


# Key-fold namespace for NEE light samples beyond the first: sample j draws
# its uniforms from fold_in(key, _NEE_FOLD_BASE + j) before the bounce fold,
# keeping every random decision at a stable (pixel, sample, light_j, bounce,
# slot) coordinate. Sample 0 keeps the unfolded key so num_light_samples=1
# reproduces the historical stream bit-exactly.
_NEE_FOLD_BASE = 0x4E4545  # "NEE"


def _trace_nee_mis(scene, ray_o, ray_d, keys, max_bounces, use_mis,
                   num_light_samples=1):
    n = ray_o.shape[0]
    dtype = ray_o.dtype

    # Primary camera wave: spatially coherent — per-tile kernels win.
    hit0 = intersect(scene, ray_o, ray_d, EPS, jnp.inf, coherent=True)
    mp0 = bsdf_ops.mat_of(scene, hit0.mat)
    emis0 = hit0.valid & bsdf_ops.is_emissive_params(mp0)
    # Lights are visible to the camera only (depth==0, rendering.rs:42-49).
    radiance = jnp.where(emis0[:, None], bsdf_ops.emitted_params(mp0), 0.0)
    alive = hit0.valid & ~emis0

    # Carry initializers derive from the (possibly sharded) inputs so their
    # varying-axes match the loop body's outputs under shard_map.
    state = _WaveState(
        bounce=jnp.int32(0),
        ray_d=ray_d,
        ray_eta=jnp.ones_like(ray_d[..., 0]),
        hit=hit0,
        prefix=jnp.ones_like(ray_d),
        radiance=radiance,
        alive=alive,
        rays=jnp.sum(jnp.ones_like(ray_d[..., 0], dtype=jnp.int32)),
    )

    def cond(s: _WaveState):
        return (s.bounce < max_bounces) & jnp.any(s.alive)

    def body(s: _WaveState) -> _WaveState:
        u = rng_ops.bounce_uniforms(keys, s.bounce, dtype=dtype)
        hit = s.hit
        mp = bsdf_ops.mat_of(scene, hit.mat)
        i = -s.ray_d

        # --- NEE (rendering.rs:55-81): num_light_samples averaged ---
        def nee_once(u_l):
            ls = light_ops.sample_light_point(
                scene,
                hit.point,
                u_l[:, rng_ops.SLOT_LIGHT_SELECT],
                u_l[:, rng_ops.SLOT_LIGHT_U],
                u_l[:, rng_ops.SLOT_LIGHT_V],
            )
            blocked = occluded(scene, hit.point, ls.dir, EPS, ls.dist - EPS,
                               coherent=False)
            cos_l = jnp.abs(vec.dot(hit.normal, ls.dir))
            bsdf_l, pdf_bsdf_l = bsdf_ops.eval_bsdf(
                scene, hit.mat, i, s.ray_eta, ls.dir, hit.normal, params=mp
            )
            if use_mis:
                w_nee = ls.pdf / (ls.pdf + pdf_bsdf_l)
            else:
                w_nee = jnp.ones_like(ls.pdf)
            d = (
                w_nee[:, None] * bsdf_l * ls.emission
                * (cos_l / ls.pdf)[:, None]
            )
            return vec.finite_or_zero(jnp.where(blocked[:, None], 0.0, d))

        direct = nee_once(u)
        for j in range(1, num_light_samples):
            kj = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                keys, _NEE_FOLD_BASE + j
            )
            direct = direct + nee_once(
                rng_ops.bounce_uniforms(kj, s.bounce, dtype=dtype)
            )
        if num_light_samples > 1:  # 平均を取る (rendering.rs:80-81)
            direct = direct / num_light_samples

        # --- BSDF sample (rendering.rs:83-89) ---
        eta_s = bsdf_ops.eta_ratio(scene, hit.mat, hit.front_face, params=mp)
        o_dir, bsdf_s, pdf_s, cos_s = bsdf_ops.sample_bsdf(
            scene,
            hit.mat,
            i,
            eta_s,
            hit.normal,
            u[:, rng_ops.SLOT_BSDF_U],
            u[:, rng_ops.SLOT_BSDF_V],
            u[:, rng_ops.SLOT_FRESNEL],
            params=mp,
        )
        factor = bsdf_s * (cos_s / pdf_s)[:, None]  # bsdf·cos/pdf
        next_tp = s.prefix * factor

        # --- Russian roulette (rendering.rs:91-102) ---
        rr = _rr_probability(s.bounce, next_tp)
        survive = u[:, rng_ops.SLOT_RR] < rr

        # Quirk 1: the vertex's direct light only counts if RR survives.
        live = s.alive & survive
        radiance = s.radiance + jnp.where(
            live[:, None], vec.finite_or_zero(s.prefix * direct), 0.0
        )

        # --- Peek (rendering.rs:104-135); doubles as the next bounce's hit ---
        # Bounce wave: incoherent — big meshes route per-ray (resolve_auto).
        peek = intersect(scene, hit.point, o_dir, EPS, jnp.inf,
                         coherent=False)
        peek_mp = bsdf_ops.mat_of(scene, peek.mat)
        peek_emis = peek.valid & bsdf_ops.is_emissive_params(peek_mp)

        if use_mis:
            # Quirk 2: pdf_shape without the 1/num_lights factor.
            pdf_shape = light_ops.light_pdf_toward(scene, peek.prim, hit.point, peek.point)
            w_bsdf = pdf_s / (pdf_s + pdf_shape)
            hit_light = (
                w_bsdf[:, None]
                * bsdf_s
                * bsdf_ops.emitted_params(peek_mp)
                * (cos_s / (pdf_s * rr))[:, None]
            )
            radiance = radiance + jnp.where(
                (live & peek_emis)[:, None],
                vec.finite_or_zero(s.prefix * hit_light),
                0.0,
            )
        # (NEE mode: a BSDF ray that lands on a light contributes nothing —
        # that transport already flowed through the NEE term.)

        cont = live & peek.valid & ~peek_emis
        prefix = jnp.where(
            cont[:, None],
            vec.finite_or_zero(s.prefix * factor / rr[:, None]),
            s.prefix,
        )

        return _WaveState(
            bounce=s.bounce + 1,
            ray_d=o_dir,
            # The spawned ray carries the eta chosen at THIS vertex; the next
            # vertex's NEE evaluates with it before overwriting (rendering.rs:72,83-87).
            ray_eta=eta_s,
            hit=peek,
            prefix=prefix,
            radiance=radiance,
            alive=cont,
            # num_light_samples shadow traces + 1 peek per alive lane
            rays=s.rays + (num_light_samples + 1)
            * jnp.sum(s.alive).astype(s.rays.dtype),
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.radiance, final.rays


def _trace_brdf_only(scene, ray_o, ray_d, keys, max_bounces):
    """Pure BSDF-sampling path tracing (rendering.rs:209-266): lights visible
    at every depth, one trace per bounce, same RR schedule."""
    n = ray_o.shape[0]
    dtype = ray_o.dtype

    class S(NamedTuple):
        bounce: jnp.ndarray
        ray_o: jnp.ndarray
        ray_d: jnp.ndarray
        prefix: jnp.ndarray
        radiance: jnp.ndarray
        alive: jnp.ndarray
        rays: jnp.ndarray

    state = S(
        bounce=jnp.int32(0),
        ray_o=ray_o,
        ray_d=ray_d,
        prefix=jnp.ones_like(ray_d),
        radiance=jnp.zeros_like(ray_d),
        alive=jnp.ones_like(ray_d[..., 0], dtype=bool),
        rays=jnp.sum(jnp.zeros_like(ray_d[..., 0], dtype=jnp.int32)),
    )

    def cond(s: S):
        return (s.bounce < max_bounces) & jnp.any(s.alive)

    def body(s: S) -> S:
        u = rng_ops.bounce_uniforms(keys, s.bounce, dtype=dtype)
        hit = intersect(scene, s.ray_o, s.ray_d, EPS, jnp.inf)
        mp = bsdf_ops.mat_of(scene, hit.mat)
        emis = hit.valid & bsdf_ops.is_emissive_params(mp)

        radiance = s.radiance + jnp.where(
            (s.alive & emis)[:, None],
            vec.finite_or_zero(s.prefix * bsdf_ops.emitted_params(mp)),
            0.0,
        )

        i = -s.ray_d
        eta_s = bsdf_ops.eta_ratio(scene, hit.mat, hit.front_face, params=mp)
        o_dir, bsdf_s, pdf_s, cos_s = bsdf_ops.sample_bsdf(
            scene,
            hit.mat,
            i,
            eta_s,
            hit.normal,
            u[:, rng_ops.SLOT_BSDF_U],
            u[:, rng_ops.SLOT_BSDF_V],
            u[:, rng_ops.SLOT_FRESNEL],
            params=mp,
        )
        factor = bsdf_s * (cos_s / pdf_s)[:, None]
        next_tp = s.prefix * factor
        rr = _rr_probability(s.bounce, next_tp)
        survive = u[:, rng_ops.SLOT_RR] < rr

        cont = s.alive & hit.valid & ~emis & survive
        prefix = jnp.where(
            cont[:, None], vec.finite_or_zero(s.prefix * factor / rr[:, None]), s.prefix
        )
        return S(
            bounce=s.bounce + 1,
            ray_o=hit.point,
            ray_d=o_dir,
            prefix=prefix,
            radiance=radiance,
            alive=cont,
            rays=s.rays + jnp.sum(s.alive).astype(s.rays.dtype),
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.radiance, final.rays
