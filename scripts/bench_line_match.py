"""TPU micro-benchmark: float-cosine vs binary-Hamming LBD line matching
(VERDICT r2 item #7 — measure, keep the winner, document).

Run: cd /root/repo && timeout 900 python scripts/bench_line_match.py
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from plslam.models import frontend_lines as fl


def timeit(fn, *args, n=50, warmup=25):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    N = 96
    segs1 = jnp.asarray(rng.uniform(0, 400, (N, 4)), jnp.float32)
    segs2 = segs1 + jnp.asarray(rng.normal(0, 2, (N, 4)), jnp.float32)
    v = jnp.ones((N,), jnp.float32)
    d = rng.normal(size=(N, fl.N_BANDS * 8)).astype(np.float32)
    desc1 = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    desc2 = jnp.asarray(desc1 + 0.1 * rng.normal(size=d.shape).astype(np.float32))
    db1 = fl.binarize_lbd(desc1)
    db2 = fl.binarize_lbd(desc2)

    t_float = timeit(lambda: fl.match_lbd(desc1, segs1, v, desc2, segs2, v))
    t_bin = timeit(lambda: fl.match_lbd_binary(db1, segs1, v, db2, segs2, v, pallas=False))
    results = {"float_cosine_ms": round(t_float, 3), "binary_xla_ms": round(t_bin, 3)}
    if jax.default_backend() == "tpu":
        t_pal = timeit(lambda: fl.match_lbd_binary(db1, segs1, v, db2, segs2, v, pallas=True))
        results["binary_pallas_ms"] = round(t_pal, 3)
        # distance-matrix only (the kernel's own surface)
        from plslam.ops.kernels.hamming import hamming_matrix_pallas
        from plslam.models.keyframe_db import hamming_matrix

        results["hamming_pallas_ms"] = round(timeit(lambda: hamming_matrix_pallas(db1, db2)), 3)
        results["hamming_xla_ms"] = round(timeit(lambda: hamming_matrix(db1, db2)), 3)
        # equivalence sanity
        a = np.asarray(hamming_matrix_pallas(db1, db2))
        b = np.asarray(hamming_matrix(db1, db2))
        assert (a == b).all(), "pallas != xla hamming"
    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
