"""Differentiability for the forward-only Pallas kernels.

The kernels in ``cor_tpu.ops.pallas`` are forward-only: ``pallas_call``
defines no JVP/transpose rule, so ``jax.grad`` through a fused path raises.
In the reference configuration this never matters — every tower those
kernels serve is frozen (param-level stop_gradient; reference:
lib/build_model.py:112-120) and XLA never builds their backward. But an
unfrozen fine-tune (or a gradient taken w.r.t. the *inputs*, e.g. for
feature attribution) should not have to flip the fused paths off.

``with_oracle_vjp`` wraps a kernel in ``jax.custom_vjp``: the forward runs
the kernel; the backward is the VJP of the XLA numerics oracle,
rematerialized from the saved primal inputs — exactly the recompute
``jax.checkpoint`` would do, so peak memory matches the remat'd XLA path.
The oracle and kernel agree to the kernel-parity tolerances asserted by
tests, so the returned gradient is exact for the oracle and correct to
those tolerances for the kernel output actually used in the forward.
"""

from __future__ import annotations

from typing import Callable

import jax


def with_oracle_vjp(fast_fn: Callable, oracle_fn: Callable) -> Callable:
    """Differentiable wrapper: ``fast_fn`` forward, ``oracle_fn`` VJP backward.

    Both callables must take the same positional pytree arguments and return
    the same output structure. All non-array configuration (head counts,
    window sizes, eps) must be closed over — cache the wrapped function per
    static configuration (``functools.lru_cache``) so repeated calls reuse
    one ``custom_vjp`` identity and avoid retracing.
    """

    @jax.custom_vjp
    def f(*args):
        return fast_fn(*args)

    def fwd(*args):
        # Residuals are the primal inputs; the backward recomputes the
        # oracle's forward from them (checkpoint-style), so nothing beyond
        # the inputs is kept live.
        return fast_fn(*args), args

    def bwd(residuals, cotangent):
        _, vjp = jax.vjp(oracle_fn, *residuals)
        return vjp(cotangent)

    f.defvjp(fwd, bwd)
    return f
