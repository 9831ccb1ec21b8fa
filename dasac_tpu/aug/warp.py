"""Batched affine warping: affine_grid + grid_sample with torch's
``align_corners=False`` conventions (the pair used throughout the reference's
multi-view fusion, ``models/sac.py:289-310``).

Coordinate convention (torch): normalized coords in [-1, 1]; with
align_corners=False the pixel centers sit at ((2*i+1)/S - 1).  ``theta`` is a
[.., 2, 3] matrix mapping OUTPUT normalized coords (x, y, 1) to INPUT
normalized coords; sampling is bilinear with zero padding (or nearest for
label maps).

TPU notes: the sample is four clamped flat gathers + a lerp — XLA lowers
this to vector gathers that stay in VMEM for our [T,H,W,C] tiles.  Static
shapes only; vmapped over the batch.
"""

import jax
import jax.numpy as jnp
import numpy as np


def affine_grid(theta, height, width):
    """Normalized sampling grid for ``theta`` [..., 2, 3] -> [..., H, W, 2].

    Last dim is (x, y) in input normalized coords (torch affine_grid parity).
    """
    xs = (2.0 * jnp.arange(width, dtype=jnp.float32) + 1.0) / width - 1.0
    ys = (2.0 * jnp.arange(height, dtype=jnp.float32) + 1.0) / height - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # [H, W, 3]
    # out[..., h, w, i] = sum_j theta[..., i, j] * base[h, w, j]
    return jnp.einsum("...ij,hwj->...hwi", theta, base)


def _unnormalize(coord, size):
    """Normalized [-1,1] -> continuous pixel coords (align_corners=False)."""
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(img, grid, mode="bilinear"):
    """Sample ``img`` [N,H,W,C] at ``grid`` [N,Ho,Wo,2] ((x,y) normalized).

    Zero padding outside the input; bilinear or nearest.  Matches torch
    ``F.grid_sample(..., align_corners=False, padding_mode='zeros')``.
    """
    n, h, w, c = img.shape
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)

    if mode == "nearest":
        # torch nearest uses std::nearbyint = round-half-to-EVEN (jnp.round)
        xi = jnp.round(x).astype(jnp.int32)
        yi = jnp.round(y).astype(jnp.int32)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi = jnp.clip(xi, 0, w - 1)
        yi = jnp.clip(yi, 0, h - 1)
        flat = img.reshape(n, h * w, c)
        idx = yi * w + xi  # [N,Ho,Wo]
        out = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        return out * valid[..., None].astype(img.dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(jnp.float32)
    wy = (y - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(n, h * w, c).astype(jnp.float32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        idx = yc * w + xc
        v = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        return v * valid[..., None].astype(jnp.float32)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wxe = wx[..., None]
    wye = wy[..., None]
    out = (
        v00 * (1 - wxe) * (1 - wye)
        + v01 * wxe * (1 - wye)
        + v10 * (1 - wxe) * wye
        + v11 * wxe * wye
    )
    return out.astype(img.dtype)


def warp_affine(img, theta, out_hw=None, mode="bilinear"):
    """grid_sample(img, affine_grid(theta)) for AXIS-ALIGNED affines.

    Every transform in the SAC pipeline is a flip/scale/translate (alpha=0
    throughout, dataloader_target.py:226), i.e. ``theta`` has zero off-
    diagonals, so the 2-D warp factorizes into two 1-D resamplings: a row
    gather (whole [W,C] rows — contiguous DMA) and a column gather ([C]
    vectors).  On TPU this replaces H*W random point-gathers with H + W
    vectorized ones — the difference between VPU-speed and scalar-speed.

    ``img`` [N,H,W,C], ``theta`` [N,2,3] with theta[:,0,1]=theta[:,1,0]=0.
    Zero padding, bilinear or nearest; numerically identical to
    grid_sample(affine_grid(theta)) for such thetas.
    """
    if out_hw is None:
        out_hw = (img.shape[1], img.shape[2])
    oh, ow = int(out_hw[0]), int(out_hw[1])
    n, h, w, c = img.shape

    # the separable fast path is only valid for axis-aligned thetas; a
    # rotated/sheared affine must use warp_affine_general (silently dropping
    # the off-diagonal terms would produce wrong output).  Traced thetas
    # from dasac_tpu.aug.pipelines are axis-aligned by construction (zeros
    # stacked into the off-diagonals); concrete inputs are checked here.
    if not isinstance(theta, jax.core.Tracer):
        offdiag = np.abs(np.asarray(theta)[:, [0, 1], [1, 0]]).max()
        if offdiag > 1e-6:
            raise ValueError(
                "warp_affine requires axis-aligned theta (off-diagonals "
                "zero, got max |offdiag|={}); use warp_affine_general for "
                "rotations".format(offdiag))

    # per-axis normalized maps: xin = a*xout + b
    ax, bx = theta[:, 0, 0], theta[:, 0, 2]
    ay, by = theta[:, 1, 1], theta[:, 1, 2]
    xs = (2.0 * jnp.arange(ow, dtype=jnp.float32) + 1.0) / ow - 1.0
    ys = (2.0 * jnp.arange(oh, dtype=jnp.float32) + 1.0) / oh - 1.0
    src_x = _unnormalize(ax[:, None] * xs[None] + bx[:, None], w)  # [N,Wo]
    src_y = _unnormalize(ay[:, None] * ys[None] + by[:, None], h)  # [N,Ho]

    def axis_gather(data, src, axis, size):
        """1-D resample of ``data`` along ``axis`` at positions ``src``."""
        if mode == "nearest":
            # round-half-to-even, matching torch grid_sample nearest
            i = jnp.round(src).astype(jnp.int32)
            valid = (i >= 0) & (i < size)
            ic = jnp.clip(i, 0, size - 1)
            out = _take_axis(data, ic, axis)
            return out * _expand(valid, data.ndim, axis).astype(data.dtype)
        i0 = jnp.floor(src)
        frac = (src - i0).astype(jnp.float32)
        i0 = i0.astype(jnp.int32)
        v0 = (i0 >= 0) & (i0 < size)
        v1 = (i0 + 1 >= 0) & (i0 + 1 < size)
        g0 = _take_axis(data, jnp.clip(i0, 0, size - 1), axis)
        g1 = _take_axis(data, jnp.clip(i0 + 1, 0, size - 1), axis)
        w0 = ((1.0 - frac) * v0).astype(jnp.float32)
        w1 = (frac * v1).astype(jnp.float32)
        out = (g0.astype(jnp.float32) * _expand(w0, data.ndim, axis)
               + g1.astype(jnp.float32) * _expand(w1, data.ndim, axis))
        return out.astype(data.dtype)

    out = axis_gather(img, src_y, 1, h)       # rows:   [N,Ho,W,C]
    out = axis_gather(out, src_x, 2, w)       # cols:   [N,Ho,Wo,C]
    return out


def valid_mask_affine(theta, out_hw, src_hw):
    """In-bounds mask of ``warp_affine(ones, theta, mode='nearest') > 0.5``
    for axis-aligned thetas, as the outer product of two 1-D bounds tests —
    O(H+W) instead of a third full warp pass per view.

    ``theta`` [N,2,3] axis-aligned; returns bool [N, Ho, Wo].
    """
    oh, ow = int(out_hw[0]), int(out_hw[1])
    h, w = int(src_hw[0]), int(src_hw[1])
    ax, bx = theta[:, 0, 0], theta[:, 0, 2]
    ay, by = theta[:, 1, 1], theta[:, 1, 2]
    xs = (2.0 * jnp.arange(ow, dtype=jnp.float32) + 1.0) / ow - 1.0
    ys = (2.0 * jnp.arange(oh, dtype=jnp.float32) + 1.0) / oh - 1.0
    src_x = _unnormalize(ax[:, None] * xs[None] + bx[:, None], w)
    src_y = _unnormalize(ay[:, None] * ys[None] + by[:, None], h)

    def inb(src, size):
        i = jnp.round(src).astype(jnp.int32)  # same rounding as axis_gather
        return (i >= 0) & (i < size)

    return inb(src_y, h)[:, :, None] & inb(src_x, w)[:, None, :]


def _take_axis(data, idx, axis):
    """take_along_axis with a per-batch 1-D index [N, K] along ``axis``."""
    shape = [data.shape[0]] + [1] * (data.ndim - 1)
    shape[axis] = idx.shape[1]
    return jnp.take_along_axis(data, idx.reshape(shape), axis=axis)


def _expand(arr, ndim, axis):
    """[N, K] -> broadcastable against data with K on ``axis``."""
    shape = [arr.shape[0]] + [1] * (ndim - 1)
    shape[axis] = arr.shape[1]
    return arr.reshape(shape)


def warp_affine_general(img, theta, out_hw=None, mode="bilinear"):
    """Full 2-D grid_sample path for arbitrary affines (rotation support);
    kept for generality/tests — the pipeline uses the separable fast path."""
    if out_hw is None:
        out_hw = (img.shape[1], img.shape[2])
    grid = affine_grid(theta, out_hw[0], out_hw[1])
    return grid_sample(img, grid, mode=mode)
