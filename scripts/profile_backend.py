"""Backend solve timing: blocks vs dense linearization on the real chip.

Times `optimize_window` (8 LM iters) under the three linearization paths and
`marginalize_old`, steady-state, unique inputs per call.
Run: timeout 900 python scripts/profile_backend.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import plslam  # noqa: F401
from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import marginalization as marg
from plslam.models import packing, solver
from plslam.models.state import layout


def timeit(fn, args_list, n_warm=25, n_meas=40):
    for i in range(n_warm):
        out = fn(*args_list[i % len(args_list)])
    jax.block_until_ready(out)
    outs = []
    t0 = time.time()
    for i in range(n_meas):
        outs.append(fn(*args_list[i % len(args_list)]))
    jax.block_until_ready(outs)
    return (time.time() - t0) / n_meas


def main():
    dev = jax.devices()[0]
    dtype = jnp.float32
    cfg = SolverConfig(max_features=192, max_line_feats=64)
    lay = layout(cfg)
    seq = synthetic.make_sequence(duration=6.0, n_points=420, n_lines=160, seed=3)
    state64, f64 = packing.factors_from_synthetic(seq, list(range(0, 55, 5)), cfg, lay)
    cast = lambda t: jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype") and a.dtype == jnp.float64 else a, t)
    state = jax.device_put(cast(state64), dev)
    f = jax.device_put(cast(f64), dev)

    @jax.jit
    def opt_blocks(st, fac):
        return solver.optimize_window(st, fac, lay, cfg, num_iters=8)

    @jax.jit
    def opt_dense(st, fac):
        return solver.optimize_window(st, fac, lay, cfg, num_iters=8, dense=True)

    @jax.jit
    def marg_only(st, fac):
        return marg.marginalize_old(st, fac, lay, cfg)

    states = [state._replace(p=state.p + 1e-7 * float(np.sin(i))) for i in range(8)]
    jax.block_until_ready(states)
    args = [(s, f) for s in states]

    t_b = timeit(opt_blocks, args)
    t_d = timeit(opt_dense, args)
    t_m = timeit(marg_only, args)
    sb = opt_blocks(state, f)[1]
    sd = opt_dense(state, f)[1]
    print(f"device={dev.platform}", file=sys.stderr)
    print(f"optimize_window blocks (8 it) {t_b*1e3:7.2f} ms  cost {float(sb.cost):.4e}",
          file=sys.stderr)
    print(f"optimize_window dense  (8 it) {t_d*1e3:7.2f} ms  cost {float(sd.cost):.4e}",
          file=sys.stderr)
    print(f"marginalize_old               {t_m*1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
