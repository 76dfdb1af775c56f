"""Backend-aware jit wrapper for serving programs that embed the decode
Pallas kernels.

XLA accounts a pallas_call's VMEM operand staging against a 16 MB
"scoped vmem" stack when the call sits inside a while/scan body.  The
composite LM decode step (grid-pipelined slow kernel + VMEM-resident fast
kernel, ops/pallas_slow_decode.py / ops/pallas_fast_decode.py) legitimately
stages ~60 MB of fast-layer weights, so serving scans need the limit raised
on TPU.  The flag is TPU-only — XLA:CPU rejects it ("No such compile
option") — so the wrapper keeps two compiled variants and picks by the
platform of the first committed array argument at call time.
"""

from __future__ import annotations

import functools
from typing import Any

import jax

# 64 MiB: fits the fast kernel's resident weights with headroom; still far
# below the v5e's 128 MiB VMEM so XLA keeps room for its own pipelining.
SCOPED_VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": 65536}

_ACCEL_PLATFORMS = ("tpu", "axon")


def _on_accelerator(args: Any) -> bool:
    for leaf in jax.tree_util.tree_leaves(args):
        if isinstance(leaf, jax.Array):
            try:
                devs = leaf.devices()
            except Exception:
                continue
            for d in devs:
                return d.platform in _ACCEL_PLATFORMS
    return False


def scoped_vmem_jit(fun=None, *, static_argnums=()):
    """jax.jit that adds SCOPED_VMEM_OPTS when called with TPU-resident
    arrays and compiles plainly otherwise (CPU tests, interpret mode)."""
    if fun is None:
        return functools.partial(scoped_vmem_jit, static_argnums=static_argnums)
    plain = jax.jit(fun, static_argnums=static_argnums)
    tuned = jax.jit(fun, static_argnums=static_argnums,
                    compiler_options=SCOPED_VMEM_OPTS)

    @functools.wraps(fun)
    def call(*args):
        return (tuned if _on_accelerator(args) else plain)(*args)

    # AOT surface (bench.py pre-compiles the serving programs): dispatch
    # .lower() by the same platform rule as the call itself
    call.lower = lambda *args, **kw: (
        tuned if _on_accelerator(args) else plain).lower(*args, **kw)
    return call
