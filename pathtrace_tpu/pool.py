"""Persistent-pool wavefront renderer (path regeneration).

The plain wavefront loop (integrators.py) processes one wave of paths until
every ray dies: as Russian roulette kills lanes the wave's tail runs at a few
percent occupancy, so counted-ray throughput collapses. Here a fixed pool of
``num_slots`` path slots is kept saturated instead — the moment a path
terminates its radiance is scatter-added into the framebuffer and the slot is
refilled with the next ``(pixel, sample)`` work item (camera ray regeneration).
Occupancy stays ~100% until the global work queue drains.

The estimator is the *same* reference-exact math as integrators.py, rewritten
in trace-at-top form: each iteration traces the slot's pending ray, and when a
BSDF ray lands on a light the MIS term is reconstructed from carried state
(``pdf_prev``, the previous vertex position, and the prefix that already
includes bsdf·cos/(pdf·rr)):

    contribution = prefix · pdf_prev/(pdf_prev + pdf_shape(prev_vertex, hit)) · E

which is algebraically identical to rendering.rs:113-121 (and pdf_shape keeps
the reference's missing-1/num_lights quirk). The NEE-discarded-on-RR quirk,
eta carry, depth-0-only emissive visibility (MIS/NEE) vs any-depth (BRDF-only),
and the RR schedule are identical to the wavefront path; equality is tested
sample-for-sample against render() in tests/test_pool.py.

Because the counter-based RNG addresses randomness by (pixel, sample, bounce,
slot-coordinate), the pool's scheduling freedom changes nothing statistically —
the same sample indices produce the same paths as the plain renderer.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .integrators import EPS, _rr_probability
from .models.camera import Camera
from .models.scene import Scene
from .ops import bsdf as bsdf_ops
from .ops import lights as light_ops
from .ops import pallas_shade
from .ops.intersect import (
    intersect,
    occluded,
    occluded_transposed,
    resolve_auto,
)
from .utils import rng as rng_ops
from .utils import vec

# Deferred-flush ring depth: framebuffer applied once per this many pool
# iterations. Must divide nothing in particular; 8 makes the amortized RMW
# negligible while the ring stays ~1.5 MB at 16k slots.
# PT_FLUSH_EVERY overrides at trace time (profiling knob: distinguishes
# per-apply cost, which amortizes with depth, from per-iteration carry
# traffic, which does not).
FLUSH_EVERY = int(os.environ.get("PT_FLUSH_EVERY", "8"))

# Process-wide override for the fused-megakernel auto gate (None = auto:
# fused whenever the scene qualifies and the intersect method is pallas).
_FUSED_OVERRIDE: bool | None = None


def set_fused(value: bool | None) -> None:
    """Force the bounce megakernel on/off (None restores auto). Read at trace
    time — caches are dropped so already-traced renders re-trace."""
    global _FUSED_OVERRIDE
    if value != _FUSED_OVERRIDE:
        _FUSED_OVERRIDE = value
        jax.clear_caches()


class _PoolState(NamedTuple):
    # Per-slot path state
    pixel: jnp.ndarray      # (S,) int32 assigned pixel id (undefined if !busy)
    chunk: jnp.ndarray      # (S,) int32 work-item chunk index (framebuffer row)
    sample: jnp.ndarray     # (S,) int32 assigned sample index
    bounce: jnp.ndarray     # (S,) int32 current path depth
    ray_o: jnp.ndarray      # (S, 3) ray origin == previous path vertex (the
    #                         MIS bsdf-side pdf query runs ray_o -> hit.point)
    ray_d: jnp.ndarray      # (S, 3)
    ray_eta: jnp.ndarray    # (S,) eta carried on the ray (set at spawn vertex)
    pdf_prev: jnp.ndarray   # (S,) bsdf pdf of the ray's sample at spawn
    prefix: jnp.ndarray     # (S, 3) throughput incl. rr division
    radiance: jnp.ndarray   # (S, 3) accumulated path radiance
    busy: jnp.ndarray       # (S,) slot holds an in-flight path
    # Per-slot work stream. Streams form two-ended deques shared within the
    # slot's XOR-GROUP (slot ^ m for masks m of the group): the owner
    # consumes from the front (cursor), and once a slot's own stream is
    # exhausted it steals from the BACK of a group-mate's (drain-tail
    # harvest — per-stream total path length varies ~a few %, so exhausted
    # slots otherwise idle while their neighbours finish; group sharing
    # divides that spread). Exactly-once: a thief only takes when >= 1 item
    # remains AFTER the owner's same-iteration front take and all earlier
    # masks' takes, so consumers can never cross.
    cursor: jnp.ndarray     # (S,) int32: next front item of this slot's stream
    stolen: jnp.ndarray     # (S,) int32: items taken from the BACK of this
    #                         slot's stream by its group-mates
    from_mask: jnp.ndarray  # (S,) int32: 0 = own item; m > 0 = the in-flight
    #                         item belongs to group-mate (slot ^ m)'s stream
    #                         (flush routes to that owner's column)
    image: jnp.ndarray      # (chunks, S, 3) slot-strided framebuffer
    # Deferred-flush ring: dying paths park (radiance, chunk) here and the
    # (chunks, S, 3) framebuffer is read-modify-written only once every
    # FLUSH_EVERY iterations — the full-image RMW measured ~15% of iteration
    # time at 1080p/16k slots when paid per iteration.
    fbuf_rad: jnp.ndarray    # (FLUSH_EVERY, S, 3)
    fbuf_chunk: jnp.ndarray  # (FLUSH_EVERY, S) int32, -1 = empty
    # Per-mask rings for STOLEN items, indexed by the OWNER's column (the
    # park XOR-permutes the lanes). Owner j's mask-m thief is unique
    # (j ^ m), so ring columns never collide; the dense apply adds every
    # ring in one framebuffer read-modify-write pass.
    fbuf2_rad: jnp.ndarray   # (R, FLUSH_EVERY, S, 3)
    fbuf2_chunk: jnp.ndarray  # (R, FLUSH_EVERY, S) int32, -1 = empty
    iters: jnp.ndarray      # scalar int32 diagnostics
    # Traced-ray counter as an exact (hi, lo) uint32 pair: a config-3-scale
    # render (1024^2 x 256 spp x ~4 queries/path) crosses 2^31 and would wrap
    # an int32; JAX's default no-x64 mode rules out a plain int64 scalar.
    rays_lo: jnp.ndarray    # scalar uint32
    rays_hi: jnp.ndarray    # scalar uint32
    # Busy-slot counter (same hi/lo encoding): occupancy diagnostics —
    # busy / (iters * S) is the pool's utilization including the drain tail.
    busy_lo: jnp.ndarray    # scalar uint32
    busy_hi: jnp.ndarray    # scalar uint32


def _per_slot_uniforms(keys, bounces, dtype, transposed=False):
    def draw(k, b):
        return jax.random.uniform(
            jax.random.fold_in(k, b), (rng_ops.NUM_SLOTS,), dtype=dtype
        )

    # out_axes=1 materializes the kernel-layout (NUM_SLOTS, S) draw directly;
    # the VALUES per (slot, lane) coordinate are identical either way.
    return jax.vmap(draw, out_axes=1 if transposed else 0)(keys, bounces)


def _pool_loop(
    scene: Scene,
    camera: Camera,
    pixel_lo,
    sample_lo,
    *,
    width: int,
    height: int,
    total_pixels: int,
    local_pixels: int,
    spp: int,
    integrator: str,
    max_bounces: int,
    num_slots: int,
    seed: int,
    method: str | None = None,
):
    """Pool render of the contiguous global pixel range
    ``[pixel_lo, pixel_lo + local_pixels)`` and the sample range
    ``[sample_lo, sample_lo + spp)``.

    ``pixel_lo`` and ``sample_lo`` are *traced* scalars so the same compiled
    program serves every shard of a device mesh (each device renders its own
    pixel/sample window); the single-device :func:`render_pool` calls this
    with zeros. RNG coordinates are global ``(pixel, sample)``, so the traced
    sample set is independent of how the frame is split.

    Returns ``(image_sum (local_pixels, 3), rays (2,) uint32 hi/lo, iters)``.
    """
    use_mis = integrator == "mis"
    use_nee = integrator in ("mis", "nee")
    # Megakernel path: the whole bounce (closest hit + shading + NEE shadow
    # sweep + BSDF sample + RR) fuses into one Pallas kernel for small scenes
    # on real accelerators (ops/pallas_shade.py). The composed per-op path
    # below remains the reference implementation (CPU, big scenes, ON/PBR).
    # Per-call traversal override beats the process default (the global
    # set_default_method pattern still works but costs a jax.clear_caches).
    # Unset -> "auto", resolved HERE (not in intersect) so the pool's own
    # fused-megakernel gate below sees the real engine: big-triangle scenes
    # route to the BVH union sweep on every wave class. Round-5 fix — the
    # old `method or default_method()` collapsed to "pallas" on TPU, so the
    # pool never took resolve_auto's BVH route and config-4 benches silently
    # ran the flat-tile engine.
    method = resolve_auto(method or "auto", scene.tri_v0.shape[0], None)
    fused = (
        pallas_shade.supports_scene(scene, integrator)
        and method in ("pallas", "pallas_interpret")
        and _FUSED_OVERRIDE is not False
    )
    fused_tables = pallas_shade.build_tables(scene) if fused else None
    # NEE shadow via the MXU quad-table any-hit kernel (same gate family as
    # the megakernel's quadratic sweep; falls back to the general
    # ops/pallas_intersect.any_hit when the scene has no quad tables).
    quad_shadow = (
        fused
        and fused_tables.quad is not None
        and pallas_shade.quad_enabled(method == "pallas_interpret")
        and not os.environ.get("PT_NO_QUAD_SHADOW")  # A/B attribution knob
    )
    # Transposed layout: with the megakernel in play the pool keeps every
    # 3-vector state array in kernel layout (3, S) — rays on the lane axis —
    # so no per-iteration pad/transpose traffic feeds the kernels (the
    # (S, 3) round trips measured ~10% of the iteration).
    tl = fused
    num_pixels = local_pixels
    S = min(num_slots, num_pixels)
    chunks = -(-num_pixels // S)          # pixels per slot stream
    work_per_slot = chunks * spp          # work item j -> (chunk j%chunks, sample j//chunks)
    padded_pixels = chunks * S
    # Pixel <-> (chunk, slot) bijection: a coprime multiplicative stride that
    # scatters each slot's stream across the whole image, mixing short (sky)
    # and long (glass) paths into every slot's stream so the pool drains
    # evenly. The inverse permutation is applied once at the end.
    # The stride is capped so w*perm fits in uint32 exactly (w < padded);
    # otherwise the modular map silently stops being a bijection for
    # non-power-of-two paddings (overflow wraps at 2^32, not at padded).
    bound = max((2**32 - 1) // max(padded_pixels, 1), 1)
    perm = max(1, min(bound, int(0.6180339887 * padded_pixels)))
    while math.gcd(perm, padded_pixels) != 1:
        perm -= 1
    dtype = camera.origin.dtype
    base = rng_ops.base_key(seed)
    # Camera packed for the megakernel's raygen mode (pallas_shade
    # _fused_bounce_kernel): row 0 = [origin, lower_left, w-1, h-1],
    # row 1 = [horizontal, vertical, 0, 0]. Loop-invariant.
    cam_row = jnp.stack([
        jnp.concatenate([
            camera.origin, camera.lower_left_corner,
            # generate_rays divides by the CAMERA's dims (not the frame's;
            # they agree in every current caller, but keep the contract).
            jnp.asarray([camera.width - 1, camera.height - 1], dtype),
        ]),
        jnp.concatenate([
            camera.horizontal, camera.vertical, jnp.zeros((2,), dtype),
        ]),
    ])

    # Derive every loop-carry from the traced offsets so the while_loop body
    # and init agree on varying axes under shard_map (pixel_lo varies over dp,
    # sample_lo over sp; a plain zeros() would be device-invariant).
    pixel_lo = jnp.asarray(pixel_lo, jnp.int32)
    sample_lo = jnp.asarray(sample_lo, jnp.int32)
    izero = pixel_lo * 0 + sample_lo * 0               # traced int32 zero
    fzero = izero.astype(dtype)

    # 3-vector state shape and its (S,)-mask broadcaster, by layout.
    v3shape = (3, S) if tl else (S, 3)

    def m3(mask):
        return mask[None, :] if tl else mask[:, None]

    zero3 = jnp.zeros(v3shape, dtype) + fzero
    init_d = (
        jnp.concatenate([jnp.zeros((2, S), dtype), jnp.ones((1, S), dtype)], 0)
        if tl else
        jnp.concatenate([jnp.zeros((S, 2), dtype), jnp.ones((S, 1), dtype)], 1)
    )
    slot_ids = jnp.arange(S, dtype=jnp.int32)
    chunk_iota = jnp.arange(chunks, dtype=jnp.int32)
    # XOR-group work-stealing (drain-tail harvest): trace-time static.
    # Slots form groups of G = 4 (or 2 when S is only even); a slot whose own
    # stream is exhausted steals the BACK of group-mate (slot ^ m)'s stream,
    # trying masks in order. Per-stream totals spread ~sigma*sqrt(2 ln S)
    # (~8% idle measured at 16k slots); sharing over a group of G divides
    # the spread by ~sqrt(G)..G. Each (owner, mask) pair has a unique thief,
    # so the per-mask flush rings never collide.
    #
    # OFF by default — measured round 4 (v5e headline bench, 16k slots):
    # G4 stealing saves only ~4% of pool iterations (4680 vs 4872) but costs
    # 5.8x PER ITERATION (20.1 vs 116.8 Mrays/s end to end; pair stealing
    # 48.2) — the XOR reshuffles, sequenced-take guards and per-mask flush
    # rings triple-digit-microsecond the hot loop. The CPU drain-iteration
    # model that motivated it was real but the constant dwarfs it. Opt in
    # with PT_STEAL=4 (XOR-groups of 4) or PT_STEAL=2 (pairs) for workloads
    # that are genuinely drain-tail-dominated (tiny frames, huge pools).
    steal_env = os.environ.get("PT_STEAL", "")
    if not steal_env or os.environ.get("PT_NO_STEAL") or S % 2 != 0:
        steal_masks: tuple = ()
    elif S % 4 == 0 and steal_env != "2":
        steal_masks = (1, 2, 3)
    else:
        steal_masks = (1,)
    steal = bool(steal_masks)
    n_rings = max(len(steal_masks), 1)

    def xswap(a, m):
        """Permute the slot axis by XOR with group mask ``m``."""
        g4 = S % 4 == 0
        if a.ndim == 1 or not tl:          # (S,) or untransposed (S, 3)
            if g4:
                v = a.reshape((S // 4, 2, 2) + a.shape[1:])
                if m & 2:
                    v = v[:, ::-1]
                if m & 1:
                    v = v[:, :, ::-1]
            else:
                v = a.reshape((S // 2, 2) + a.shape[1:])[:, ::-1]
            return v.reshape(a.shape)
        if g4:                              # kernel layout: slot is last axis
            v = a.reshape(a.shape[:-1] + (S // 4, 2, 2))
            if m & 2:
                v = v[..., ::-1, :]
            if m & 1:
                v = v[..., ::-1]
        else:
            v = a.reshape(a.shape[:-1] + (S // 2, 2))[..., ::-1]
        return v.reshape(a.shape)

    state = _PoolState(
        pixel=jnp.zeros((S,), jnp.int32) + izero,
        chunk=jnp.zeros((S,), jnp.int32) + izero,
        sample=jnp.zeros((S,), jnp.int32) + izero,
        bounce=jnp.zeros((S,), jnp.int32) + izero,
        ray_o=zero3,
        ray_d=init_d + fzero,
        ray_eta=jnp.ones((S,), dtype) + fzero,
        pdf_prev=jnp.ones((S,), dtype) + fzero,
        prefix=jnp.ones(v3shape, dtype) + fzero,
        radiance=zero3,
        busy=(slot_ids + izero) < 0,
        cursor=jnp.zeros((S,), jnp.int32) + izero,
        stolen=jnp.zeros((S,), jnp.int32) + izero,
        from_mask=jnp.zeros((S,), jnp.int32) + izero,
        image=jnp.zeros((chunks,) + v3shape, dtype) + fzero,
        fbuf_rad=jnp.zeros((FLUSH_EVERY,) + v3shape, dtype) + fzero,
        fbuf_chunk=jnp.full((FLUSH_EVERY, S), -1, jnp.int32) + izero[..., None],
        fbuf2_rad=jnp.zeros((n_rings, FLUSH_EVERY) + v3shape, dtype) + fzero,
        fbuf2_chunk=jnp.full((n_rings, FLUSH_EVERY, S), -1, jnp.int32)
        + izero[..., None],
        iters=jnp.int32(0) + izero,
        rays_lo=jnp.uint32(0) + izero.astype(jnp.uint32),
        rays_hi=jnp.uint32(0) + izero.astype(jnp.uint32),
        busy_lo=jnp.uint32(0) + izero.astype(jnp.uint32),
        busy_hi=jnp.uint32(0) + izero.astype(jnp.uint32),
    )

    def cond(s: _PoolState):
        return jnp.any(s.busy) | jnp.any(s.cursor < work_per_slot - s.stolen)

    def body(s: _PoolState) -> _PoolState:
        import os as _os
        _ablate = _os.environ.get("PT_POOL_ABLATE", "")
        # ---- Refill: each free slot pulls the next item of its own stream,
        # or (drain-tail harvest) the BACK item of a group-mate's ----
        free = ~s.busy
        if steal:
            can_own = s.cursor < work_per_slot - s.stolen
            refill_own = free & can_own
            # Back items available per stream AFTER the owner's own front
            # take this iteration; each mask's takes are then accounted
            # before the next mask looks, so stealing only when >= 1
            # remains guarantees every item executes exactly once.
            avail = (
                work_per_slot - s.stolen - s.cursor
                - refill_own.astype(jnp.int32)
            )
            cb = jnp.zeros_like(avail)      # back takes this iteration
            want = free & ~can_own
            q = s.cursor
            src_slot = slot_ids
            mask_new = jnp.zeros_like(s.from_mask)
            refill = refill_own
            for m in steal_masks:
                take_m = want & (xswap(avail, m) >= 1)
                # Back index BEFORE this mask's take, seen from the thief.
                q_b = work_per_slot - 1 - xswap(s.stolen + cb, m)
                q = jnp.where(take_m, q_b, q)
                src_slot = jnp.where(take_m, slot_ids ^ m, src_slot)
                mask_new = jnp.where(take_m, m, mask_new)
                got = xswap(take_m, m).astype(jnp.int32)
                avail = avail - got
                cb = cb + got
                want = want & ~take_m
                refill = refill | take_m
            stolen = s.stolen + cb
        else:
            refill_own = refill = free & (s.cursor < work_per_slot)
            q = s.cursor
            src_slot = slot_ids
            stolen = s.stolen
            mask_new = s.from_mask
        w_item = (q % chunks) * S + src_slot
        new_local = (
            (w_item.astype(jnp.uint32) * jnp.uint32(perm)) % jnp.uint32(padded_pixels)
        ).astype(jnp.int32)
        # Global pixel id = window base + permuted local id; the RNG keys off
        # the *global* (pixel, sample) coordinate, so any pixel/sample split
        # of the frame traces the identical sample set.
        new_pixel = pixel_lo + new_local
        # Global sample index: progressive passes / sample-parallel shards
        # continue the same counter-RNG streams.
        new_sample = q // chunks + sample_lo
        # Padding work items (local id >= local window, or global id past the
        # frame on the last shard) are skipped; waste <= S/num_pixels.
        pixel_ok = (new_local < num_pixels) & (new_pixel < total_pixels)
        cursor = jnp.where(refill_own, s.cursor + 1, s.cursor)

        started = refill & pixel_ok
        pixel = jnp.where(started, jnp.minimum(new_pixel, total_pixels - 1), s.pixel)
        chunk = jnp.where(started, q % chunks, s.chunk)
        sample = jnp.where(started, new_sample, s.sample)
        from_mask = jnp.where(started, mask_new, s.from_mask)
        keys = rng_ops.pixel_sample_keys(base, pixel, sample)

        # One (NUM_SLOTS, S) draw per iteration covers every stochastic
        # decision of this bounce INCLUDING refill jitter (slots 7-8 at
        # bounce 0 — refilled lanes have bounce == 0 by construction).
        u = _per_slot_uniforms(keys, bounce_next := jnp.where(started, 0, s.bounce),
                               dtype, transposed=tl)
        if "nornd" in _ablate:
            shape = (rng_ops.NUM_SLOTS, S) if tl else (S, rng_ops.NUM_SLOTS)
            u = jnp.broadcast_to(fzero + 0.5, shape) * (
                1.0 + 1e-6 * (bounce_next[None, :] if tl else
                              bounce_next[:, None]).astype(dtype))
        # Raygen fusion measured NEGATIVE on TPU in the round-4 A/B (−0.9%:
        # the saved camera glue is cheaper as XLA ops than as extra
        # megakernel rows) — opt-in via PT_RAYGEN_FUSION=1 for A/B runs.
        fuse_rg = (
            fused and "noraygen" not in _ablate
            and bool(_os.environ.get("PT_RAYGEN_FUSION"))
        )
        if not fuse_rg:
            jx = u[rng_ops.SLOT_JITTER_X] if tl else u[:, rng_ops.SLOT_JITTER_X]
            jy = u[rng_ops.SLOT_JITTER_Y] if tl else u[:, rng_ops.SLOT_JITTER_Y]
            jitter = jnp.stack([jx, jy], axis=1)
        if fuse_rg:
            # Raygen + started-lane float merges fold into the megakernel
            # (pallas_shade raygen mode): only the cheap (S,) int pixel
            # decomposition stays here, and the carried (3, S) float state
            # goes to the kernel pre-merge — ~15 XLA arrays of raygen and
            # where-merge traffic per iteration removed.
            cam_o = cam_d = None
        elif "noraygen" in _ablate:  # profiling: constant rays, no camera math
            cam_o = jnp.broadcast_to(
                camera.origin[:, None] if tl else camera.origin, v3shape
            ) + fzero
            cam_d = -init_d + m3(jitter[:, 0]) * 1e-6
        else:
            px = pixel % width
            py = pixel // width
            cam_o, cam_d = camera.generate_rays(
                px, (height - 1) - py, jitter, transposed=tl
            )

        r = m3(started)
        bounce = bounce_next
        if fuse_rg:
            ray_o, ray_d = s.ray_o, s.ray_d
            ray_eta, pdf_prev, prefix = s.ray_eta, s.pdf_prev, s.prefix
        else:
            ray_o = jnp.where(r, cam_o, s.ray_o)
            ray_d = jnp.where(r, cam_d, s.ray_d)
            ray_eta = jnp.where(started, 1.0, s.ray_eta)
            pdf_prev = jnp.where(started, 1.0, s.pdf_prev)
            prefix = jnp.where(r, 1.0, s.prefix)
        radiance = jnp.where(r, 0.0, s.radiance)
        busy = s.busy | started

        if fused:
            # ---- One bounce for every busy slot: megakernel + any-hit ----
            # The megakernel runs closest hit, material resolve, emissive MIS,
            # the NEE light sample/eval and the BSDF sample; the NEE shadow
            # sweep stays in the standalone any-hit kernel (running it inside
            # the crowded megakernel measured 134 us vs 61 us standalone) and
            # its visibility mask is applied here.
            res = pallas_shade.fused_bounce(
                fused_tables, busy, bounce, ray_o, ray_d, ray_eta, pdf_prev,
                prefix, u,
                num_tris=scene.tri_v0.shape[0],
                num_lights=scene.num_lights,
                integrator=integrator,
                max_bounces=max_bounces,
                eps=EPS,
                has_on=scene.has_oren_nayar,
                has_pbr=scene.has_pbr,
                has_tri_lights=scene.has_tri_lights,
                has_sph_lights=scene.has_sph_lights,
                transposed=True,
                interpret=method == "pallas_interpret",
                raygen=(
                    (started, pixel % width, (height - 1) - pixel // width,
                     cam_row)
                    if fuse_rg else None
                ),
            )
            radiance = radiance + res.rad_delta
            if use_nee and scene.num_lights > 0 and "noshadow" not in _ablate:
                if quad_shadow:
                    # MXU quad-table any-hit over the megakernel's own scene
                    # tables (pallas_shade.any_hit_quad): the shadow sweep's
                    # ~17 VPU ops/pair of quadratic setup ride the MXU.
                    blocked = pallas_shade.any_hit_quad(
                        fused_tables, res.next_o, res.shadow_d,
                        res.shadow_tmax, eps=EPS,
                        interpret=method == "pallas_interpret",
                    )
                else:
                    blocked = occluded_transposed(
                        scene, res.next_o, res.shadow_d, EPS, res.shadow_tmax,
                        method=method,
                    )
                radiance = radiance + jnp.where(
                    m3(res.live & ~blocked), res.nee_gain, 0.0
                )
            shade = res.shade
            live = res.live
            next_ray_o, next_ray_d = res.next_o, res.next_d
            next_eta, next_pdf, next_prefix = (
                res.next_eta, res.next_pdf, res.next_prefix
            )
        else:
            # ---- One bounce for every busy slot: composed per-op path ----
            hit = intersect(scene, ray_o, ray_d, EPS, jnp.inf, method=method)
            mp = bsdf_ops.mat_of(scene, hit.mat)  # one resolve per bounce
            emis = hit.valid & bsdf_ops.is_emissive_params(mp)
            emission = bsdf_ops.emitted_params(mp)

            # Emissive terminal rules (rendering.rs:42-49 / 225-227):
            if integrator == "brdf_only":
                emis_gain = emission
            else:
                if use_mis:
                    # ray_o is the previous path vertex (camera origin at
                    # depth 0) — the MIS bsdf-side pdf query's viewpoint.
                    pdf_shape = light_ops.light_pdf_toward(
                        scene, hit.prim, ray_o, hit.point
                    )
                    w_bsdf = pdf_prev / (pdf_prev + pdf_shape)
                else:
                    w_bsdf = jnp.zeros((S,), dtype)
                # depth 0: raw emission; depth >0: MIS-weighted (prefix already
                # carries bsdf·cos/(pdf·rr) from the spawning vertex).
                emis_gain = jnp.where(
                    (bounce == 0)[:, None], emission, w_bsdf[:, None] * emission
                )
            radiance = radiance + jnp.where(
                (busy & emis)[:, None], vec.finite_or_zero(prefix * emis_gain), 0.0
            )

            # A path may reach bounce == max_bounces only to collect a light
            # hit (the wavefront loop's final peek term); it never shades there.
            shade = busy & hit.valid & ~emis & (bounce < max_bounces)
            i_dir = -ray_d

            # ---- NEE (rendering.rs:55-81) ----
            if use_nee:
                ls = light_ops.sample_light_point(
                    scene,
                    hit.point,
                    u[:, rng_ops.SLOT_LIGHT_SELECT],
                    u[:, rng_ops.SLOT_LIGHT_U],
                    u[:, rng_ops.SLOT_LIGHT_V],
                )
                blocked = occluded(
                    scene, hit.point, ls.dir, EPS, ls.dist - EPS, method=method
                )
                cos_l = jnp.abs(vec.dot(hit.normal, ls.dir))
                bsdf_l, pdf_bsdf_l = bsdf_ops.eval_bsdf(
                    scene, hit.mat, i_dir, ray_eta, ls.dir, hit.normal, params=mp
                )
                w_nee = (
                    ls.pdf / (ls.pdf + pdf_bsdf_l) if use_mis
                    else jnp.ones_like(ls.pdf)
                )
                direct = (
                    w_nee[:, None] * bsdf_l * ls.emission
                    * (cos_l / ls.pdf)[:, None]
                )
                direct = vec.finite_or_zero(
                    jnp.where(blocked[:, None], 0.0, direct)
                )
            else:
                direct = zero3

            # ---- BSDF sample + RR (rendering.rs:83-102) ----
            eta_s = bsdf_ops.eta_ratio(scene, hit.mat, hit.front_face, params=mp)
            o_dir, bsdf_s, pdf_s, cos_s = bsdf_ops.sample_bsdf(
                scene,
                hit.mat,
                i_dir,
                eta_s,
                hit.normal,
                u[:, rng_ops.SLOT_BSDF_U],
                u[:, rng_ops.SLOT_BSDF_V],
                u[:, rng_ops.SLOT_FRESNEL],
                params=mp,
            )
            factor = bsdf_s * (cos_s / pdf_s)[:, None]
            next_tp = prefix * factor
            rr = _rr_probability(bounce, next_tp)
            survive = u[:, rng_ops.SLOT_RR] < rr

            live = shade & survive
            # Quirk 1: NEE direct only counts when RR survives.
            radiance = radiance + jnp.where(
                live[:, None], vec.finite_or_zero(prefix * direct), 0.0
            )
            l2f = live[:, None]
            next_ray_o = jnp.where(l2f, hit.point, ray_o)
            next_ray_d = jnp.where(l2f, o_dir, ray_d)
            next_eta = jnp.where(live, eta_s, ray_eta)
            next_pdf = jnp.where(live, pdf_s, pdf_prev)
            next_prefix = jnp.where(
                l2f, vec.finite_or_zero(prefix * factor / rr[:, None]), prefix
            )

        # ---- Path termination & flush (dense slot-strided add, no scatter) ----
        # Dying paths park in a FLUSH_EVERY-deep ring; the (chunks, S, 3)
        # framebuffer RMW happens once per ring cycle. Rows are applied in
        # ascending ring order = iteration order, so every image element sees
        # the same addition sequence as an immediate per-iteration flush
        # (bitwise-identical totals — adding the masked zeros is exact).
        done = busy & ~live
        done_own = done & (from_mask == 0) if steal else done
        flush = jnp.where(m3(done_own), radiance, 0.0)       # v3shape
        row = jax.lax.rem(s.iters, jnp.int32(FLUSH_EVERY))
        fbuf_rad = jax.lax.dynamic_update_slice(
            s.fbuf_rad, flush[None], (row, jnp.int32(0), jnp.int32(0)))
        fbuf_chunk = jax.lax.dynamic_update_slice(
            s.fbuf_chunk, jnp.where(done_own, chunk, -1)[None],
            (row, jnp.int32(0)))
        fbuf2_rad, fbuf2_chunk = s.fbuf2_rad, s.fbuf2_chunk
        if steal:
            # Stolen items park in the per-mask ring at the OWNER's column
            # (XOR-permute): owner j's mask-m thief is unique (j ^ m), so
            # each ring's columns never collide, and the item's framebuffer
            # cell is image[chunk, j].
            for r, m in enumerate(steal_masks):
                done_m = done & (from_mask == m)
                flush_m = xswap(jnp.where(m3(done_m), radiance, 0.0), m)
                chunk_m = xswap(jnp.where(done_m, chunk, -1), m)
                fbuf2_rad = jax.lax.dynamic_update_slice(
                    fbuf2_rad, flush_m[None, None],
                    (jnp.int32(r), row, jnp.int32(0), jnp.int32(0)))
                fbuf2_chunk = jax.lax.dynamic_update_slice(
                    fbuf2_chunk, chunk_m[None, None],
                    (jnp.int32(r), row, jnp.int32(0)))

        if "noflush" in _ablate:  # profiling: drop the framebuffer entirely
            fbuf_rad, fbuf_chunk = s.fbuf_rad * 0.0, s.fbuf_chunk * 0 - 1
            fbuf2_rad, fbuf2_chunk = s.fbuf2_rad * 0.0, s.fbuf2_chunk * 0 - 1
        # The framebuffer itself is untouched here: the dense RMW apply runs
        # in the OUTER loop once per ring cycle (see apply_flush below). A
        # lax.cond on the (chunks, 3, S) carry was measured to copy the whole
        # framebuffer through the untaken branch every iteration (~61 us of
        # pure HBM traffic at 1080p/16k slots — the single biggest line in
        # the round-3 iteration budget).
        image = s.image

        # ---- Continue surviving paths ----
        # Explicit accumulator dtype: under x64 a plain uint32 sum would
        # promote to uint64 and break the while_loop carry contract.
        busy_inc = jnp.sum(busy.astype(jnp.uint32), dtype=jnp.uint32)
        rays_inc = busy_inc + (
            jnp.sum(shade.astype(jnp.uint32), dtype=jnp.uint32)
            if use_nee else jnp.uint32(0)
        )
        rays_lo = s.rays_lo + rays_inc  # uint32 wrap detected via carry below
        busy_lo = s.busy_lo + busy_inc
        return _PoolState(
            pixel=pixel,
            chunk=chunk,
            sample=sample,
            bounce=jnp.where(live, bounce + 1, bounce),
            ray_o=next_ray_o,
            ray_d=next_ray_d,
            ray_eta=next_eta,
            pdf_prev=next_pdf,
            prefix=next_prefix,
            radiance=jnp.where(m3(live), radiance, zero3),
            busy=live,
            cursor=cursor,
            stolen=stolen,
            from_mask=from_mask,
            image=image,
            fbuf_rad=fbuf_rad,
            fbuf_chunk=fbuf_chunk,
            fbuf2_rad=fbuf2_rad,
            fbuf2_chunk=fbuf2_chunk,
            iters=s.iters + 1,
            rays_lo=rays_lo,
            rays_hi=s.rays_hi + (rays_lo < s.rays_lo).astype(jnp.uint32),
            busy_lo=busy_lo,
            busy_hi=s.busy_hi + (busy_lo < s.busy_lo).astype(jnp.uint32),
        )

    def apply_flush(s: _PoolState) -> _PoolState:
        """Dense slot-strided framebuffer RMW: add every parked ring row in
        ascending ring order (= iteration order, so each image element sees
        the same addition sequence as an immediate per-iteration flush —
        bitwise-identical totals; the masked zero adds are exact)."""
        img, fr, fc = s.image, s.fbuf_rad, s.fbuf_chunk
        rings = [(fr, fc)]
        if steal:
            rings += [
                (s.fbuf2_rad[r], s.fbuf2_chunk[r])
                for r in range(len(steal_masks))
            ]
        for rr, rc in rings:
            for kk in range(FLUSH_EVERY):
                oh = (chunk_iota[:, None] == rc[kk][None, :]).astype(dtype)
                if tl:  # img (chunks, 3, S); mask broadcast over components
                    img = img + oh[:, None, :] * rr[kk][None, :, :]
                else:   # img (chunks, S, 3)
                    img = img + oh[:, :, None] * rr[kk][None, :, :]
        # Reset via *0 (not fresh constants) so the carry keeps its varying
        # mesh axes under shard_map.
        out = s._replace(image=img, fbuf_rad=fr * 0.0, fbuf_chunk=fc * 0 - 1)
        if steal:
            out = out._replace(
                fbuf2_rad=s.fbuf2_rad * 0.0, fbuf2_chunk=s.fbuf2_chunk * 0 - 1
            )
        return out

    # Two-level loop: the inner level runs EXACTLY FLUSH_EVERY bounce
    # iterations (fori, no per-iteration exit test — the two (S,) any-
    # reductions plus predicate sync of a while cond were ~3% of the
    # iteration), the outer level applies the flush ring UNCONDITIONALLY.
    # This keeps the big framebuffer carry out of any lax.cond/select, which
    # XLA pays for with a full-buffer copy per iteration on the untaken
    # branch. Only the FINAL ring cycle can over-run (<= FLUSH_EVERY - 1
    # empty iterations once per render): with no busy lane and no work left,
    # refill/started/done are all false, so the body is a provable state
    # no-op except the iters diagnostic (its ring rows park chunk = -1).
    def inner_body(i, s):
        return body(s)

    def outer_body(s: _PoolState) -> _PoolState:
        s = jax.lax.fori_loop(0, FLUSH_EVERY, inner_body, s)
        # "noapply" ablation: park in the ring but never apply it (isolates
        # the ring-DUS per-iteration cost from the amortized dense RMW).
        if "noflush" in _ablate_outer or "noapply" in _ablate_outer:
            return s
        return apply_flush(s)

    _ablate_outer = os.environ.get("PT_POOL_ABLATE", "")
    final = jax.lax.while_loop(cond, outer_body, state)
    # Drain the partial flush ring (rows past the last boundary; empty rows
    # carry chunk −1 and match nothing).
    image_full = final.image
    drain_rings = [(final.fbuf_rad, final.fbuf_chunk)]
    if steal:
        drain_rings += [
            (final.fbuf2_rad[r], final.fbuf2_chunk[r])
            for r in range(len(steal_masks))
        ]
    for rr, rc in drain_rings:
        for kk in range(FLUSH_EVERY):
            oh = (chunk_iota[:, None] == rc[kk][None, :]).astype(dtype)
            if tl:
                image_full = image_full + oh[:, None, :] * rr[kk][None, :, :]
            else:
                image_full = image_full + oh[:, :, None] * rr[kk][None, :, :]
    # Work item w = chunk*S + slot accumulated at image[chunk, slot]; its
    # local pixel is (w*perm) % padded. One inverse GATHER restores order:
    # pixel p reads work item (p * perm^-1) % padded (modular inverse exists
    # since gcd(perm, padded) == 1). A TPU gather here measured ~4 ms where
    # the equivalent .at[dest].set scatter measured 84 ms per render (round
    # 3 trace) — same bitwise result, it is a pure permutation either way.
    # (The transposed layout pays its single (chunks, 3, S) -> (chunks, S, 3)
    # transpose here, once per render.)
    if tl:
        image_full = jnp.transpose(image_full, (0, 2, 1))
    flat = image_full.reshape(padded_pixels, 3)
    if padded_pixels < (1 << 21):
        # p * perm_inv mod padded without 64-bit ints: split perm_inv =
        # a*2^11 + b (p < 2^21, a < 2^10, b < 2^11), so every intermediate
        # product stays below 2^32. Covers every BASELINE config (1080p
        # padded is ~2.08M < 2^21).
        p_ids = jnp.arange(padded_pixels, dtype=jnp.uint32)
        perm_inv = pow(perm, -1, padded_pixels)
        inv_hi, inv_lo = divmod(perm_inv, 2048)
        pp = jnp.uint32(padded_pixels)
        src = (
            ((p_ids * jnp.uint32(inv_hi)) % pp * jnp.uint32(2048)) % pp
            + (p_ids * jnp.uint32(inv_lo)) % pp
        ) % pp
        image_sum = jnp.take(flat, src.astype(jnp.int32), axis=0)[:num_pixels]
    else:
        # Frames past ~2M padded pixels: the u32 split above would overflow;
        # fall back to the (slower) inverse scatter.
        w_ids = jnp.arange(padded_pixels, dtype=jnp.uint32)
        dest = (
            (w_ids * jnp.uint32(perm)) % jnp.uint32(padded_pixels)
        ).astype(jnp.int32)
        image_sum = jnp.zeros_like(flat).at[dest].set(flat)[:num_pixels]
    counters = jnp.stack(
        [final.rays_hi, final.rays_lo, final.busy_hi, final.busy_lo]
    )
    return image_sum, counters, final.iters


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "integrator", "max_bounces", "num_slots", "seed",
        "sample_offset", "dtype", "method",
    ),
)
def render_pool(
    scene: Scene,
    camera: Camera,
    *,
    width: int,
    height: int,
    spp: int,
    integrator: str = "mis",
    max_bounces: int = 64,
    num_slots: int = 32768,
    seed: int = 0,
    sample_offset: int = 0,
    dtype=None,
    method: str | None = None,
):
    """Render the full frame with a saturated path pool.

    ``dtype`` selects the estimator's compute precision (None keeps the
    scene/camera dtypes); ``jnp.float64`` matches the reference's native
    precision (math.rs:4-8) and needs the process-global ``jax_enable_x64``.

    ``method`` overrides the intersection traversal for this call only
    (None = the platform default / :func:`set_default_method` override) —
    the per-call form avoids the global's trace-cache invalidation.

    Returns ``(image_sum (H*W, 3), counters, iterations)``; divide by spp
    for mean radiance. ``counters`` is a ``(4,)`` uint32
    ``(rays_hi, rays_lo, busy_hi, busy_lo)`` stack — decode with
    :func:`ray_count` / :func:`busy_count` — so both stay exact past 2^32.

    Work assignment is slot-strided: slot ``s`` owns exactly the work items
    ``w ≡ s (mod S)``, whose pixels are a coprime-stride permutation of the
    image (see :func:`_pool_loop`). The framebuffer is a dense
    ``(chunks, S, 3)`` array that dying slots flush with a one-hot masked add
    over the tiny ``chunks`` axis — TPU scatter-adds into a megapixel
    framebuffer measured ~10 ms/iteration; the dense flush is ~0.1 — and one
    inverse scatter at the end restores pixel order.

    ``num_slots`` trades per-iteration efficiency against drain-tail
    occupancy: smaller pools give each slot a longer work stream, which
    amortizes the heavy tail of path lengths (glass TIR chains run to depth
    30+). Measured on v5e at 1080p: 16k slots ≈ 2x the throughput of 256k.

    The multi-chip production path is
    :func:`pathtrace_tpu.parallel.sharding.render_pool_sharded`, which runs
    :func:`_pool_loop` per device over a ``dp`` (pixel window) × ``sp``
    (sample window) mesh.
    """
    if dtype is not None:
        from .render import cast_floats

        scene = cast_floats(scene, dtype)
        camera = cast_floats(camera, dtype)
    num_pixels = width * height
    return _pool_loop(
        scene,
        camera,
        jnp.int32(0),
        jnp.int32(sample_offset),
        width=width,
        height=height,
        total_pixels=num_pixels,
        local_pixels=num_pixels,
        spp=spp,
        integrator=integrator,
        max_bounces=max_bounces,
        num_slots=num_slots,
        seed=seed,
        method=method,
    )


def ray_count(rays) -> int:
    """Exact traced-ray count from render_pool's counter vector.

    Accepts a plain scalar (older checkpointed stats), an ``(..., 2)``
    stack of ``(hi, lo)`` pairs (round-1 checkpoints), or the current
    ``(..., 4)`` ``(rays_hi, rays_lo, busy_hi, busy_lo)`` stack — per-device
    leading axes (render_pool_sharded) are summed exactly in Python ints."""
    import numpy as np

    r = np.asarray(rays)
    if r.ndim == 0:
        return int(r)
    rows = r.reshape(-1, r.shape[-1])
    return sum((int(row[0]) << 32) | int(row[1]) for row in rows)


def busy_count(rays) -> int:
    """Exact busy-slot-iteration count from the ``(..., 4)`` counter stack;
    occupancy = busy_count / (pool iterations x slots)."""
    import numpy as np

    r = np.asarray(rays)
    rows = r.reshape(-1, r.shape[-1])
    if rows.shape[-1] < 4:
        raise ValueError("busy counters absent (round-1 checkpoint format)")
    return sum((int(row[2]) << 32) | int(row[3]) for row in rows)
