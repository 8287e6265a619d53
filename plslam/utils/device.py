"""Host→device array conversion with a defensive copy.

On the CPU backend, XLA may ZERO-COPY a numpy buffer into a jax.Array when
dtype/layout/alignment line up (observed for float64 and int32 arrays when
the requested dtype matches). The jax.Array is then an alias of the live
host buffer: any later in-place numpy mutation silently mutates the
"immutable" device array. This corrupted the estimator's factor snapshot —
`_reject_outliers` drops slots in place between the solve and the
marginalization, and the marginalization then read post-drop tables
(nondeterministically, since whether XLA zero-copies depends on allocation
details). On TPU the transfer always copies; tests (CPU, float64) bite.

Every conversion of a host array that is mutated in place afterwards must go
through `asdev`.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def asdev(x, dtype=None):
    """`jnp.asarray` with a guaranteed host-side copy first."""
    return jnp.asarray(np.array(x), dtype)


def pull_all(*xs):
    """Read several device arrays back to host with OVERLAPPED round trips.

    A fresh device→host readback through the TPU tunnel costs ~25–50 ms
    regardless of size, but concurrent pulls overlap (measured: 2 pulls in
    42 ms vs 83 ms serially). Start every copy async, then materialize."""
    for x in xs:
        try:
            x.copy_to_host_async()
        except Exception:
            pass
    return [np.asarray(x) for x in xs]


def highest_matmul_precision(fn):
    """Decorator: trace `fn`'s ops at matmul precision 'highest' (true f32).

    TPU f32 matmuls default to fast bf16 MXU passes. The frontends tolerate
    that (pixel noise dominates; the LK kernel still measures 0.007 px median
    flow error on-chip), but the estimator numerics — whitened residual
    stacks, JᵀJ/Schur assembly, covariance propagation — lose ~3 decimal
    digits, which compounds through the window solve. Measured end-to-end on
    a rendered EuRoC-class 12 s sequence (scripts/system_fps.py dataset,
    f32): ATE 0.761 m at default precision vs 0.301 m at 'highest', with no
    measurable throughput cost (the solve is op-latency-bound, not FLOPs
    -bound — CLAUDE.md TPU perf rules). CPU backends ignore the setting, so
    the f64 test mesh is unaffected.

    Apply to every solver/marginalization/preintegration/initialization
    entry point; leave the image-plane frontend kernels on the fast default.

    `PLSLAM_MATMUL_PRECISION` overrides the level ('highest' default;
    'high' = 3-pass bf16, measured nearly as accurate; 'default' =
    kill-switch back to bf16 for A/B measurement).
    """
    import functools
    import os

    import jax

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        # read at CALL time: the precision context is part of jax's jit cache
        # key, so an A/B harness can flip the env var inside ONE process (one
        # tunnel claim) and get separately-compiled executables per level
        level = os.environ.get("PLSLAM_MATMUL_PRECISION", "highest")
        with jax.default_matmul_precision(level):
            return fn(*args, **kwargs)

    return wrapped
