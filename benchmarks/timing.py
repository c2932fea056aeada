"""On-device timing utilities.

Two gotchas of this environment (see .claude/skills/verify/SKILL.md):
jax.block_until_ready does not reliably sync over the tunneled device, and
per-call dispatch has high latency.  So: iterate INSIDE one jitted
fori_loop (with an input perturbation per iteration so XLA cannot hoist
the loop-invariant computation), and sync by fetching a scalar reduction.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def time_on_device(fn: Callable, *args, iters: int = 10,
                   warmup: bool = True) -> float:
    """Seconds per call of fn(*args); fn's first arg must be a float array
    (perturbed each iteration to defeat loop hoisting)."""

    def reduce_out(out):
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    @jax.jit
    def run(x0, rest_args):
        def body(i, acc):
            x = x0 + (i.astype(x0.dtype) if jnp.issubdtype(
                x0.dtype, jnp.floating) else 0)
            return acc + reduce_out(fn(x, *rest_args))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    x0, rest = args[0], args[1:]
    if warmup:
        float(run(x0, rest))
    t0 = time.perf_counter()
    float(run(x0, rest))
    return (time.perf_counter() - t0) / iters
