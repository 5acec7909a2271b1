"""Measure the chip's effective VPU f32 throughput ceiling.

Speed-of-light probe for the intersection kernels (docs/PERFORMANCE.md):
a Pallas kernel iterates a fused multiply-add chain on a VMEM-resident
(256, 1024) f32 block — the same operand shape as one (cluster, ray-tile)
sweep step — with no HBM traffic inside the timed loop. The measured
FMA/s is the ceiling against which the sweeps' pair-test rate is judged.

Four independent chains hide the FMA latency; K iterations amortize kernel
entry. Prints ops/s counting one multiply-add as TWO flops.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ROWS, LANES = 8, 512   # 4 vregs per chain value — all chains stay in registers
CHAINS = 16            # independent chains to cover FMA latency
K = 4096               # fma-chain iterations per kernel call


def _kernel(x_ref, o_ref):
    x = x_ref[:, :]
    chains = tuple(x * (1.0 + 1e-4 * c) for c in range(CHAINS))

    def body(i, carry):
        # Independent register-resident FMA chains; multipliers keep values
        # finite. (A single big block spills to VMEM and measures bandwidth,
        # not ALU issue — the first version of this probe made that mistake.)
        return tuple(
            a * (1.0 + 1e-6 * (c + 1)) + 0.5 * (1 if c % 2 == 0 else -1)
            for c, a in enumerate(carry)
        )

    chains = jax.lax.fori_loop(0, K, body, chains)
    acc = chains[0]
    for a in chains[1:]:
        acc = acc + a
    o_ref[:, :] = acc


@functools.partial(jax.jit)
def run(x):
    return pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(x)


def main():
    print(jax.devices())
    x = jnp.ones((ROWS, LANES), jnp.float32) * 0.5
    run(x).block_until_ready()  # compile
    reps = 50
    best = float("inf")
    for r in range(5):
        xs = [x + 1e-6 * (r * reps + i) for i in range(reps)]
        t0 = time.perf_counter()
        outs = [run(xi) for xi in xs]
        float(jnp.sum(outs[-1]))
        dt = (time.perf_counter() - t0) / reps
        best = min(best, dt)
    fmas = ROWS * LANES * K * CHAINS
    print(
        f"per-call {best*1e6:.1f} us  "
        f"FMA/s {fmas/best:.3e}  f32 flops/s {2*fmas/best:.3e}"
    )


if __name__ == "__main__":
    main()
