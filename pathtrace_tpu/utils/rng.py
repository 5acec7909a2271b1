"""Counter-based RNG discipline (threefry) for scheduling-independent sampling.

The reference seeds a per-pixel sequential generator ``StdRng(seed=(y<<32)|x)``
and draws in program order (``/root/reference/src/main.rs:49-52``), which makes
every sample stream reproducible but inherently serial. On TPU the wave
scheduler must be free to reorder/batch work, so we derive an independent
threefry key for every ``(pixel, sample)`` pair and fold the bounce index in
per wavefront iteration. Draw *slots* within a bounce are positions in a fixed
uniform vector, so each random decision has a stable coordinate
``(pixel, sample, bounce, slot)`` regardless of batching — this is what makes
the reference's single-sample replay debugging (world.rs:614-678) trivial here:
re-rendering any one pixel/sample reproduces its path bit-exactly.

Distributions match the reference; bit-streams intentionally do not (parity is
statistical, per BASELINE.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Fixed slot layout for the per-bounce uniform draw vector. One contiguous
# uniform(NUM_SLOTS) draw per ray per bounce covers every stochastic decision
# in any integrator lane; unused slots cost nothing after XLA DCE of the
# consuming expressions (the draw itself is one fused threefry).
SLOT_LIGHT_SELECT = 0  # uniform light pick             (world.rs:255)
SLOT_LIGHT_U = 1       # light surface sample r1        (shape.rs:211, 111)
SLOT_LIGHT_V = 2       # light surface sample r2        (shape.rs:212, 112)
SLOT_BSDF_U = 3        # BSDF sample r1 (cosine/VNDF)   (material.rs:100, mirror.rs:42)
SLOT_BSDF_V = 4        # BSDF sample r2                 (material.rs:101, mirror.rs:43)
SLOT_FRESNEL = 5       # reflect/refract coin           (mirror.rs:232)
SLOT_RR = 6            # Russian roulette               (rendering.rs:100)
# Camera sub-pixel jitter rides in the bounce-0 draw (slots 7-8): a separate
# per-iteration jitter stream cost the pool an extra fold_in + draw chain
# (~3% of the production iteration) for bits that are only consumed at path
# regeneration, where bounce == 0 anyway.
SLOT_JITTER_X = 7      # primary-ray jitter x           (camera.rs:140, world.rs:296)
SLOT_JITTER_Y = 8      # primary-ray jitter y
NUM_SLOTS = 9


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


@jax.jit
def pixel_sample_keys(key: jax.Array, pixel_ids: jnp.ndarray, sample_idx) -> jax.Array:
    """Derive one key per ray from ``(pixel_id, sample_idx)``.

    ``pixel_ids``: int32 ``(N,)``; ``sample_idx``: scalar or ``(N,)``.
    Counter-based analogue of the reference's ``(y<<32)|x`` per-pixel seeding
    (main.rs:51) extended with the sample index so samples are independent
    *and* individually addressable.
    """
    sample_idx = jnp.broadcast_to(jnp.asarray(sample_idx), pixel_ids.shape)
    k = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pixel_ids)
    return jax.vmap(jax.random.fold_in)(k, sample_idx)


@partial(jax.jit, static_argnames=("dtype",))
def bounce_uniforms(keys: jax.Array, bounce, dtype=jnp.float32) -> jnp.ndarray:
    """Per-ray uniforms ``(N, NUM_SLOTS)`` in [0, 1) for one bounce.

    ``keys``: per-ray key array ``(N,)``; ``bounce``: traced scalar.
    """
    def draw(k):
        return jax.random.uniform(jax.random.fold_in(k, bounce), (NUM_SLOTS,), dtype=dtype)

    return jax.vmap(draw)(keys)


@partial(jax.jit, static_argnames=("dtype",))
def primary_jitter(keys: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """Sub-pixel jitter ``(N, 2)`` in [0, 1) for primary-ray AA
    (camera.rs:139-147, world.rs:296-299): slots 7-8 of the bounce-0 draw,
    so renderers that already draw bounce-0 uniforms get it for free."""
    return bounce_uniforms(keys, 0, dtype=dtype)[:, SLOT_JITTER_X : SLOT_JITTER_Y + 1]
