"""Benchmark: sliding-window BA (frontend-equivalent factors + 8-iteration
LM/Schur solve + marginalization) throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference runs its backend at 10 solves/s (keyframe rate, 40 ms
Ceres budget — BASELINE.md tier-2). vs_baseline = our solves/s ÷ 10.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import plslam  # noqa: F401  (repo-root run)
    from plslam.config import SolverConfig
    from plslam.io import synthetic
    from plslam.models import marginalization as marg
    from plslam.models import packing, solver
    from plslam.models.state import layout

    dtype = jnp.float32
    cfg = SolverConfig(max_features=192, max_line_feats=64)
    lay = layout(cfg)

    seq = synthetic.make_sequence(duration=6.0, n_points=420, n_lines=160, seed=3)
    frames = list(range(0, 55, 5))
    state64, f64v = packing.factors_from_synthetic(seq, frames, cfg, lay)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, t
    )
    state = cast(state64)
    f = cast(f64v)

    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    f = jax.device_put(f, dev)

    def step(st, fac):
        st_out, stats = solver.optimize_window(st, fac, lay, cfg, num_iters=8)
        prior = marg.marginalize_old(st_out, fac, lay, cfg)
        return st_out, stats, prior

    # compile
    t0 = time.time()
    st_out, stats, prior = step(state, f)
    jax.block_until_ready((st_out, prior))
    compile_s = time.time() - t0

    # timed: full keyframe backend ticks (solve + marginalize)
    n_iter = 30
    t0 = time.time()
    for _ in range(n_iter):
        st_out, stats, prior = step(state, f)
    jax.block_until_ready((st_out, prior))
    elapsed = time.time() - t0
    solves_per_s = n_iter / elapsed

    n_pts = int(np.asarray(jnp.sum(f.pt_valid)))
    n_lns = int(np.asarray(jnp.sum(f.ln_valid)))
    print(
        f"# window=11 pts={n_pts} lines={n_lns} dtype={dtype.__name__} "
        f"compile={compile_s:.1f}s run={elapsed:.3f}s cost0={float(stats.cost0):.3e} "
        f"cost={float(stats.cost):.3e} device={dev.platform}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "window_ba_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s (8-iter LM + marginalization, 11 kf, ~190 pts, 64 lines)",
        "vs_baseline": round(solves_per_s / 10.0, 2),
    }))


if __name__ == "__main__":
    main()
