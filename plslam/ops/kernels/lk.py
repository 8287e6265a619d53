"""Pallas TPU kernel: pyramidal inverse-compositional Lucas-Kanade tracking.

The reference's per-frame hot loop #3 (`cv::calcOpticalFlowPyrLK`, 21×21
window, 3 pyramid levels — SURVEY.md §3.5). TPU-first design:

  * a pyramid level (≤752×480 f32 ≈ 1.4 MB) fits ENTIRELY in VMEM, so both
    images are loaded once and every feature's window is a cheap VMEM
    dynamic slice — zero HBM traffic inside the iteration loop;
  * bilinear sampling of a regular patch grid at fractional offset (fy,fx)
    is the weighted sum of four integer-shifted static subwindows — no
    gathers, pure VPU;
  * grid = one program per feature; the fixed-count GN iteration runs as a
    `fori_loop` carrying the subpixel guess.

`lk_track_pallas` mirrors the jnp reference implementation in
`models/frontend_points.lk_track` (same template gradients, same update) and
is tested against it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 21  # patch size (matches cv::calcOpticalFlowPyrLK default)
HALF = WIN // 2
ROWS = 32  # window rows held per feature (margin for guess drift)
LANES = 128  # window cols (lane-aligned)


def _bilinear_patch(ref, y0f, x0f, size, Himg, Wimg):
    """size×size patch of `ref` at float top-left (y0f, x0f).

    Mosaic requires vector loads at sublane offsets divisible by 8 (and
    lane-aligned tiles), so we load an aligned (32×256) window and rotate the
    residual offset in-register with `pltpu.roll`; the fractional part is a
    4-term weighted sum of static shifted subwindows. No gathers anywhere."""
    s = size
    iy = jnp.floor(y0f)
    ix = jnp.floor(x0f)
    fy = (y0f - iy).astype(ref.dtype)
    fx = (x0f - ix).astype(ref.dtype)
    rows = min(32, Himg)  # aligned window (multiple of 8 / 128), shrunk
    lanes = min(256, Wimg)  # for small top-pyramid levels
    iyc = jnp.clip(iy.astype(jnp.int32), 0, Himg - (s + 1))
    ixc = jnp.clip(ix.astype(jnp.int32), 0, Wimg - (s + 1))
    by = jnp.clip((iyc // 8) * 8, 0, Himg - rows)
    bx = jnp.clip((ixc // 128) * 128, 0, Wimg - lanes)
    ry = iyc - by  # 0..8 (clamp at the bottom edge can push it to 8)
    rx = ixc - bx
    win = ref[pl.ds(pl.multiple_of(by, 8), rows), pl.ds(pl.multiple_of(bx, 128), lanes)]
    win = pltpu.roll(win, -ry, 0)
    win = pltpu.roll(win, -rx, 1)
    sub = win  # rows/cols 0..s now hold the patch
    w00 = (1.0 - fy) * (1.0 - fx)
    w01 = (1.0 - fy) * fx
    w10 = fy * (1.0 - fx)
    w11 = fy * fx
    return (
        w00 * sub[0:s, 0:s] + w01 * sub[0:s, 1 : s + 1]
        + w10 * sub[1 : s + 1, 0:s] + w11 * sub[1 : s + 1, 1 : s + 1]
    )


def _lk_kernel(pts_ref, guess_ref, prev_ref, cur_ref, out_ref, err_ref, iters: int):
    dtype = prev_ref.dtype
    Himg, Wimg = prev_ref.shape
    i = pl.program_id(0)
    cx = pts_ref[i, 0]
    cy = pts_ref[i, 1]
    gx0 = guess_ref[i, 0]
    gy0 = guess_ref[i, 1]

    # ---- template patch (23×23 for a +1 gradient ring) around (cx, cy) ----
    T23 = _bilinear_patch(prev_ref, cy - HALF - 1.0, cx - HALF - 1.0, WIN + 2, Himg, Wimg)
    T = T23[1 : WIN + 1, 1 : WIN + 1]
    Tx = 0.5 * (T23[1 : WIN + 1, 2 : WIN + 2] - T23[1 : WIN + 1, 0:WIN])
    Ty = 0.5 * (T23[2 : WIN + 2, 1 : WIN + 1] - T23[0:WIN, 1 : WIN + 1])
    H00 = jnp.sum(Tx * Tx)
    H01 = jnp.sum(Tx * Ty)
    H11 = jnp.sum(Ty * Ty)
    det = H00 * H11 - H01 * H01
    ok = det > 1e-6
    det_safe = jnp.where(ok, det, 1.0)

    def body(_, g):
        gx, gy = g[0], g[1]
        I = _bilinear_patch(cur_ref, gy - HALF, gx - HALF, WIN, Himg, Wimg)
        e = I - T
        b0 = jnp.sum(e * Tx)
        b1 = jnp.sum(e * Ty)
        du = (H11 * b0 - H01 * b1) / det_safe
        dv = (-H01 * b0 + H00 * b1) / det_safe
        return jnp.stack([gx - du, gy - dv])

    g = jax.lax.fori_loop(0, iters, body, jnp.stack([gx0, gy0]))

    # final residual for the convergence/status gate
    I = _bilinear_patch(cur_ref, g[1] - HALF, g[0] - HALF, WIN, Himg, Wimg)
    err = jnp.mean(jnp.abs(I - T))

    out_ref[i, 0] = g[0]
    out_ref[i, 1] = g[1]
    err_ref[i, 0] = jnp.where(ok, err, jnp.asarray(1e9, dtype))


def _pad_image(img):
    h, w = img.shape
    ph = (-h) % 8
    pw = (-w) % 128
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), mode="edge")
    return img


@partial(jax.jit, static_argnames=("iters", "interpret"))
def lk_level_pallas(prev_img, cur_img, pts, guess, iters: int = 10, interpret: bool = False):
    """Track all features one pyramid level: returns (pts_out [N,2], err [N])."""
    prev_p = _pad_image(prev_img)
    cur_p = _pad_image(cur_img)
    n = pts.shape[0]
    dtype = prev_img.dtype
    # scalar tables live whole in SMEM (per-feature rows picked by program_id
    # — blocked SMEM specs are not lowerable on TPU)
    out, err = pl.pallas_call(
        partial(_lk_kernel, iters=iters),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, 2), dtype),
            jax.ShapeDtypeStruct((n, 1), dtype),
        ),
        interpret=interpret,
    )(pts, guess, prev_p, cur_p)
    return out, err[:, 0]


def lk_track_pallas(pyr_prev, pyr_cur, pts_prev, valid, levels: int | None = None, iters: int = 10,
                    err_thresh: float = 0.12, interpret: bool = False):
    """Full pyramidal tracker (drop-in for `frontend_points.lk_track`);
    levels=None uses the full supplied pyramid."""
    levels = len(pyr_prev) if levels is None else levels
    dtype = pts_prev.dtype
    n = pts_prev.shape[0]
    guess = pts_prev
    err = jnp.zeros((n,), dtype)
    for level in range(levels - 1, -1, -1):
        scale = 2.0**level
        out, err = lk_level_pallas(
            pyr_prev[level], pyr_cur[level], pts_prev / scale, guess / scale,
            iters=iters, interpret=interpret,
        )
        guess = out * scale
    H, W = pyr_cur[0].shape
    inb = (
        (guess[:, 0] > HALF) & (guess[:, 0] < W - HALF)
        & (guess[:, 1] > HALF) & (guess[:, 1] < H - HALF)
    )
    status = valid & inb & (err < err_thresh)
    return guess, status
