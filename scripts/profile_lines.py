"""Per-stage timing of the line-frontend tick on the real chip.

Decomposes the bench's `ln_tick` (2-octave tiled-Hough + LBD + match) into
stages, each timed as its own steady-state jitted program with unique inputs
(anti-memoization jitter), to locate the hot spot before optimizing.
Run: timeout 900 python scripts/profile_lines.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import plslam  # noqa: F401
from plslam.io import render, synthetic
from plslam.models import frontend_lines as fl
from plslam.models import frontend_points as fp

H, W = 480, 752
MAX_LINES = 64


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
    from plslam.ops.cameras import PinholeRadTan
    cam = PinholeRadTan.create(460.0, 460.0, W / 2, H / 2)
    img0 = jax.device_put(jnp.asarray(
        render.render_frame(seq, 0, cam, H, W, blob_sigma=2.5, style="textured"),
        dtype), dev)

    # unique inputs per call
    jit_imgs = [img0 + 1e-4 * float(np.sin(i)) for i in range(8)]
    jax.block_until_ready(jit_imgs)

    k5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype) / 16.0

    @jax.jit
    def stage_edge(img):
        return fl.edge_map(img)

    @jax.jit
    def stage_detect_o0(img):
        mag, ang, edge = fl.edge_map(img)
        return fl.detect_segments(mag, ang, edge, H, W, max_out=MAX_LINES)

    @jax.jit
    def stage_detect_o1(img):
        cur = fp._sep_conv(img, k5)[::2, ::2]
        mag, ang, edge = fl.edge_map(cur)
        return fl.detect_segments(mag, ang, edge, H // 2, W // 2, max_out=MAX_LINES)

    @jax.jit
    def stage_hough_only(img):
        """detect_segments minus peaks: edge_map + tiles + scatter accum."""
        mag, ang, edge = fl.edge_map(img)
        m = mag * edge
        ys = fl._tile_starts(H, fl.TILE, fl.TILE_STRIDE)
        xs = fl._tile_starts(W, fl.TILE, fl.TILE_STRIDE)
        tiles = [(y, x) for y in ys for x in xs]
        thetas = jnp.linspace(0.0, np.pi, fl.N_THETA, endpoint=False).astype(dtype)
        ct, st = jnp.cos(thetas), jnp.sin(thetas)
        rho_max = float(fl.TILE) * 0.75
        drho = float(2 * rho_max / fl.N_RHO)
        yy, xx = jnp.meshgrid(jnp.arange(fl.TILE, dtype=dtype),
                              jnp.arange(fl.TILE, dtype=dtype), indexing="ij")
        xc = (xx - fl.TILE / 2.0).reshape(-1)
        yc = (yy - fl.TILE / 2.0).reshape(-1)
        tile_mag = jnp.stack([jax.lax.dynamic_slice(m, (y, x), (fl.TILE, fl.TILE))
                              for (y, x) in tiles])
        tile_ang = jnp.stack([jax.lax.dynamic_slice(ang, (y, x), (fl.TILE, fl.TILE))
                              for (y, x) in tiles])

        def tile_hough(mm, aa):
            pix_w = mm.reshape(-1)
            pa = aa.reshape(-1)
            rho = xc[:, None] * ct[None, :] + yc[:, None] * st[None, :]
            rbin = jnp.clip(((rho + rho_max) / drho).astype(jnp.int32), 0, fl.N_RHO - 1)
            dth = jnp.abs(((pa[:, None] - thetas[None, :]) + jnp.pi / 2) % jnp.pi - jnp.pi / 2)
            gate = (dth < (np.pi / fl.N_THETA) * 1.5).astype(dtype)
            wgt = pix_w[:, None] * gate
            acc = jnp.zeros((fl.N_THETA, fl.N_RHO), dtype)
            acc = acc.at[jnp.broadcast_to(jnp.arange(fl.N_THETA)[None, :], rbin.shape),
                         rbin].add(wgt)
            return acc

        return jax.vmap(tile_hough)(tile_mag, tile_ang)

    @jax.jit
    def stage_lbd(img, segs, valid):
        gx, gy = fl._scharr(img)
        return fl.lbd_descriptors(gx, gy, segs, valid)

    @jax.jit
    def stage_match(desc, segs, valid):
        return fl.match_lbd(desc, segs, valid, desc, segs, valid)

    @jax.jit
    def ln_tick(img, prev_segs, prev_desc, prev_valid):
        segs_o, score_o, valid_o = [], [], []
        cur = img
        for o in range(2):
            mag, ang, edge = fl.edge_map(cur)
            s, sc, v = fl.detect_segments(mag, ang, edge, *cur.shape, max_out=MAX_LINES)
            segs_o.append(s * float(2 ** o))
            score_o.append(sc * float(2 ** o))
            valid_o.append(v)
            if o == 0:
                cur = fp._sep_conv(cur, k5)[::2, ::2]
        segs, score, valid = fl.merge_candidates(
            jnp.concatenate(segs_o), jnp.concatenate(score_o),
            jnp.concatenate(valid_o), max_out=MAX_LINES)
        gx, gy = fl._scharr(img)
        desc = fl.lbd_descriptors(gx, gy, segs, valid.astype(img.dtype))
        match = fl.match_lbd(prev_desc, prev_segs, prev_valid, desc, segs,
                             valid.astype(img.dtype))
        return segs, desc, valid.astype(img.dtype), match

    segs0, score0, valid0 = stage_detect_o0(img0)
    desc0 = stage_lbd(img0, segs0, valid0.astype(dtype))
    imgs_args = [(im,) for im in jit_imgs]

    t_full = timeit(ln_tick, [(im, segs0, desc0, valid0.astype(dtype))
                              for im in jit_imgs])
    t_edge = timeit(stage_edge, imgs_args)
    t_o0 = timeit(stage_detect_o0, imgs_args)
    t_o1 = timeit(stage_detect_o1, imgs_args)
    t_hough = timeit(stage_hough_only, imgs_args)
    t_lbd = timeit(stage_lbd, [(im, segs0, valid0.astype(dtype)) for im in jit_imgs])
    t_match = timeit(stage_match, [(desc0 + 1e-6 * i, segs0, valid0.astype(dtype))
                                   for i in range(8)])

    print(f"device={dev.platform}", file=sys.stderr)
    for k, v in [("full ln_tick", t_full), ("edge_map", t_edge),
                 ("detect octave0 (incl edge)", t_o0),
                 ("detect octave1 (incl down+edge)", t_o1),
                 ("edge+tiles+hough-scatter only", t_hough),
                 ("lbd", t_lbd), ("match", t_match)]:
        print(f"{k:34s} {v * 1e3:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
