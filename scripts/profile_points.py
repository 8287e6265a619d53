"""Per-stage timing of the point-frontend tick on the real chip.
Run: timeout 900 python scripts/profile_points.py"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import plslam  # noqa: F401
from plslam.io import render, synthetic
from plslam.models import frontend_points as fp
from plslam.ops.cameras import PinholeRadTan

H, W = 480, 752
MAX_PTS = 150


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
    seq = synthetic.make_sequence(duration=1.0, n_points=500, n_lines=48, seed=7)
    cam = PinholeRadTan.create(460.0, 460.0, W / 2, H / 2)
    imgs = [jax.device_put(jnp.asarray(
        render.render_frame(seq, k, cam, H, W, blob_sigma=2.5, style="textured"),
        dtype), dev) for k in range(2)]
    jit_imgs = [imgs[0] + 1e-4 * float(np.sin(i)) for i in range(8)]

    NLVL = fp.auto_levels((H, W))
    pyr0 = tuple(fp.build_pyramid(imgs[0], levels=NLVL))
    uv0, sc0 = fp.shi_tomasi_grid(imgs[0], jnp.zeros((1, 2), dtype),
                                  jnp.zeros((1,), dtype), cell=30, max_out=MAX_PTS)
    valid0 = sc0 > 1e-5

    @jax.jit
    def stage_pyr(img):
        return fp.build_pyramid(img, levels=NLVL)

    @jax.jit
    def stage_lk(img):
        pyr = fp.build_pyramid(img, levels=NLVL)
        return fp.lk_track_fast(pyr0, pyr, uv0, valid0)

    @jax.jit
    def stage_lk_only(pyr_new):
        return fp.lk_track_fast(pyr0, pyr_new, uv0, valid0)

    @jax.jit
    def stage_detect(img):
        return fp.shi_tomasi_grid(img, uv0, valid0.astype(dtype), cell=30, max_out=MAX_PTS)

    @jax.jit
    def full_tick(pyr_prev, img_new, uv, valid):
        pyr_new = fp.build_pyramid(img_new, levels=NLVL)
        out, status = fp.lk_track_fast(pyr_prev, pyr_new, uv, valid)
        ok = (status > 0) & valid
        det_uv, det_sc = fp.shi_tomasi_grid(pyr_new[0], out, ok.astype(dtype),
                                            cell=30, max_out=MAX_PTS)
        fill = jnp.clip(jnp.cumsum(~ok) - 1, 0, MAX_PTS - 1)
        uv2 = jnp.where(ok[:, None], out, det_uv[fill])
        valid2 = ok | (det_sc[fill] > 1e-5)
        return tuple(pyr_new), uv2, valid2

    args = [(im,) for im in jit_imgs]
    pyrs = [tuple(stage_pyr(im)) for im in jit_imgs]
    t_full = timeit(full_tick, [(pyr0, im, uv0, valid0) for im in jit_imgs])
    t_pyr = timeit(stage_pyr, args)
    t_lk = timeit(stage_lk, args)
    t_lko = timeit(stage_lk_only, [(p,) for p in pyrs])
    t_det = timeit(stage_detect, args)
    print(f"device={dev.platform} levels={NLVL}", file=sys.stderr)
    for k, v in [("full pt_tick", t_full), ("build_pyramid", t_pyr),
                 ("pyramid+LK", t_lk), ("LK only (pyr cached)", t_lko),
                 ("shi_tomasi_grid", t_det)]:
        print(f"{k:24s} {v * 1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
