"""Weak-scaling curve for the landmark-sharded distributed BA on a forced
CPU device mesh — the in-sandbox stand-in for the multi-host ≥70 %-efficiency
target (BASELINE.md; real multi-chip hardware is not reachable here).

Weak scaling: the landmark load grows with the device count (64 features +
24 lines per device), so ideal scaling keeps time/iteration constant.
Collective volume per LM iteration is architectural, not measured: 2 psums of
the reduced camera system (S [DC,DC] + rhs [DC]) + 2 scalar cost psums +
1 diag psum, all f32 — these are the ONLY cross-device bytes in the design
(landmark elimination never crosses shards).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/scaling_curve.py
Writes a markdown table to stdout.
"""
import time
import sys

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing
from plslam.models.state import layout
from plslam.parallel import distributed_ba as dba


def run_curve(device_counts=(1, 2, 4, 8), per_dev_f=64, per_dev_l=24, iters=8, reps=3):
    rows = []
    for n in device_counts:
        if n > len(jax.devices()):
            continue
        cfg = SolverConfig(max_features=per_dev_f * n, max_line_feats=per_dev_l * n)
        lay = layout(cfg)
        seq = synthetic.make_sequence(duration=6.0, n_points=per_dev_f * n + 40,
                                      n_lines=per_dev_l * n + 16, seed=3)
        state, f = packing.factors_from_synthetic(seq, list(range(0, 55, 5)), cfg, lay)
        cast = lambda t: jax.tree.map(
            lambda a: a.astype(jnp.float32) if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, t)
        state, f = cast(state), cast(f)
        mesh = dba.make_mesh(n)
        # warmup/compile
        out = dba.distributed_optimize_window(state, f, lay, cfg, mesh, num_iters=iters)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = dba.distributed_optimize_window(state, f, lay, cfg, mesh, num_iters=iters)
            jax.block_until_ready(out)
            ts.append((time.perf_counter() - t0) / iters)
        t_iter = min(ts)
        DC = lay.dim_cam
        coll_bytes = 4 * (DC * DC + 2 * DC + 2)  # S + rhs + diag + 2 scalars, f32
        rows.append(dict(n=n, mf=cfg.max_features, ml=cfg.max_line_feats,
                         t_ms=t_iter * 1e3, coll_kb=coll_bytes / 1024.0,
                         cost=float(out[1])))
    base = rows[0]["t_ms"]
    print("| devices | landmarks (pts+lines) | time/LM-iter (ms) | weak-scaling eff. | psum bytes/iter |")
    print("|---|---|---|---|---|")
    for r in rows:
        eff = base / r["t_ms"]
        print(f"| {r['n']} | {r['mf']}+{r['ml']} | {r['t_ms']:.1f} | {eff*100:.0f}% | {r['coll_kb']:.0f} KiB |")
    return rows


if __name__ == "__main__":
    run_curve()
