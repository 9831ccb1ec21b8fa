"""Fused on-device augmentation pipelines.

The reference's CPU/PIL chains (datasets/tf_seg.py, tf_target.py) become one
affine warp per output view plus batched photometric kernels — all inside the
jitted train step on uint8 HBM inputs with static shapes (BASELINE.json
north star: augmentations as fused device kernels).

Source chain (dataloader_seg.py:70-110): RandScale -> [Blur] -> HFlip ->
[Jitter] -> RandCrop(pad) -> Normalize(+renorm) -> ApplyMask(255).
Target chain (dataloader_target.py:95-139): [host: MaskScale(CROP)] ->
shared RandScale+RandCrop -> group HFlip -> per-view GuidedHFlip ->
per-view RandScaleCrop (affine-tracked) -> photometric on the student copy
-> Normalize -> ApplyMask.

Geometric composition note: every chain step is a similarity transform, so
the whole chain collapses into a single output->input affine per view; the
view image is produced by ONE bilinear gather (labels: nearest), which also
makes augmentation exactly consistent with the teacher's warp-pool-unwarp
refinement (the per-view tracked part is literally ``affine_inv``).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dasac_tpu.aug import photometric as P
from dasac_tpu.aug.affine import build_affine, build_affine_inv, compose
from dasac_tpu.aug.warp import valid_mask_affine, warp_affine

IGNORE = 255


def _pixel_affine_to_theta(a_y, b_y, a_x, b_x, dst_hw, src_hw=None):
    """Per-axis pixel map src_px = a*dst_px + b  ->  normalized 2x3 theta.

    align_corners=False convention; handles differing src/dst sizes.
    """
    dh, dw = dst_hw
    sh, sw = src_hw if src_hw is not None else dst_hw

    def axis(a, b, d, s):
        coef = a * d / s
        off = (a * d - a + 2.0 * b + 1.0) / s - 1.0
        return coef, off

    coef_x, off_x = axis(a_x, b_x, dw, sw)
    coef_y, off_y = axis(a_y, b_y, dh, sh)
    zeros = jnp.zeros_like(coef_x)
    row0 = jnp.stack([coef_x, zeros, off_x], -1)
    row1 = jnp.stack([zeros, coef_y, off_y], -1)
    return jnp.stack([row0, row1], -2)


def _flip_theta(flip):
    """Horizontal mirror in normalized coords (exact for align_corners=False)."""
    zeros = jnp.zeros_like(flip)
    ones = jnp.ones_like(flip)
    row0 = jnp.stack([flip, zeros, zeros], -1)
    row1 = jnp.stack([zeros, ones, zeros], -1)
    return jnp.stack([row0, row1], -2)


def _warp_views(image, label, theta, out_hw=None):
    """Warp one base image/label to T views; returns imgs, labels, valid."""
    t = theta.shape[0]
    imgs = jnp.broadcast_to(image[None], (t,) + image.shape)
    imgs = warp_affine(imgs, theta, out_hw=out_hw)
    lbl = jnp.broadcast_to(label[None, ..., None].astype(jnp.float32),
                           (t,) + label.shape + (1,))
    lbl_w = warp_affine(lbl, theta, out_hw=out_hw, mode="nearest")[..., 0]
    valid = valid_mask_affine(theta, out_hw or label.shape, label.shape)
    labels = jnp.where(valid, lbl_w.astype(jnp.int32), IGNORE)
    return imgs, labels, valid


class TargetViews(NamedTuple):
    frames_aug: jnp.ndarray    # [G*T, H, W, 3] normalized, padding zeroed
    labels: jnp.ndarray        # [G*T, H, W] int32, 255 at ignore+padding
    frames_clean: jnp.ndarray  # [G*T, H, W, 3] normalized (teacher input)
    affine: jnp.ndarray        # [G*T, 2, 3] view -> reference
    affine_inv: jnp.ndarray    # [G*T, 2, 3] reference -> view
    padding: jnp.ndarray       # [G*T, H, W] bool, True at augmentation padding


def augment_target_groups(key, images, labels, *, group_size,
                          target_scale=(1.0, 1.1), zoom=(0.5, 1.2),
                          group_hflip=True, guided_hflip=True,
                          blur=True, jitter=0.4, greyscale=0.2,
                          mean=(0.485, 0.456, 0.406),
                          std=(0.229, 0.224, 0.225)):
    """Expand [G, H, W, ...] uint8 crop-size inputs into augmented groups.

    Args:
        images: [G, H, W, 3] uint8 (already at CROP_SIZE, host-resized).
        labels: [G, H, W] uint8/int trainIds (255 ignore).
    Returns a TargetViews with leading dim G*T (views of group g contiguous).
    """
    g, h, w, _ = images.shape
    t = group_size
    keys = jax.random.split(key, 8)

    # --- shared scale + crop (one per group) --------------------------------
    sigma = jax.random.uniform(keys[0], (g,), minval=target_scale[0],
                               maxval=target_scale[1])
    off_y = jax.random.uniform(keys[1], (g,)) * (sigma * h - h)
    off_x = jax.random.uniform(keys[2], (g,)) * (sigma * w - w)
    theta_sc = _pixel_affine_to_theta(
        1.0 / sigma, off_y / sigma, 1.0 / sigma, off_x / sigma, (h, w))

    gflip = jnp.where(
        group_hflip & (jax.random.uniform(keys[3], (g,)) > 0.5), -1.0, 1.0)
    theta_shared = compose(theta_sc, _flip_theta(gflip))  # crop then flip

    # --- per-view tracked params (guided flip + zoom) -----------------------
    vkeys = jax.random.split(keys[4], 4)
    vflip = jnp.where(
        guided_hflip & (jax.random.uniform(vkeys[0], (g, t)) > 0.5), -1.0, 1.0)
    s = jax.random.uniform(vkeys[1], (g, t), minval=zoom[0], maxval=zoom[1])
    # view 0 keeps the reference frame (tf_target.py:195-196)
    s = s.at[:, 0].set(1.0)
    # crop (s<1): offsets in [0, d-s*d]; pad (s>1): in [d-s*d, 0] — both are
    # u * (d - s*d) with u ~ U[0,1]
    u_y = jax.random.uniform(vkeys[2], (g, t))
    u_x = jax.random.uniform(vkeys[3], (g, t))
    ii = u_y * (h - s * h)
    jj = u_x * (w - s * w)
    dy = ii + s * h / 2.0 - h / 2.0
    dx = jj + s * w / 2.0 - w / 2.0
    zero = jnp.zeros_like(dy)
    params = jnp.stack([dy, dx, zero, 1.0 / s, vflip], -1)  # [G,T,5]

    params_flat = params.reshape(g * t, 5)
    affine = build_affine(params_flat, (h, w))
    affine_inv = build_affine_inv(affine, params_flat, (h, w))

    # full warp: base -> shared frame -> view
    theta_full = compose(
        jnp.repeat(theta_shared, t, axis=0), affine_inv)  # [G*T,2,3]

    imgs_f = images.astype(jnp.float32) / 255.0

    def per_group(img, lbl, thetas):
        return _warp_views(img, lbl, thetas)

    imgs_v, labels_v, valid_v = jax.vmap(per_group)(
        imgs_f, labels.astype(jnp.int32), theta_full.reshape(g, t, 2, 3))
    imgs_v = imgs_v.reshape(g * t, h, w, 3)
    labels_v = labels_v.reshape(g * t, h, w)
    valid_v = valid_v.reshape(g * t, h, w)

    # --- photometric on the student copy ------------------------------------
    aug = imgs_v
    if blur:
        aug = P.gaussian_blur(keys[5], aug)
    if jitter > 0:
        aug = P.color_jitter(keys[6], aug, jitter, min(0.1, jitter), p=0.5)
    if greyscale > 0:
        aug = P.random_grayscale(keys[7], aug, greyscale)

    vm = valid_v[..., None].astype(jnp.float32)
    frames_aug = P.normalize(aug, mean, std) * vm
    frames_clean = P.normalize(imgs_v, mean, std) * vm

    return TargetViews(frames_aug, labels_v, frames_clean,
                       affine, affine_inv, ~valid_v)


def augment_source_batch(key, images, labels, *, crop_hw,
                         scale_range=(0.5, 1.5), hflip=True,
                         jitter=0.0, blur=False,
                         mean=(0.485, 0.456, 0.406),
                         std=(0.229, 0.224, 0.225)):
    """Source augmentation: scale/flip/crop as one warp + photometric.

    Args:
        images: [B, H0, W0, 3] uint8 full-resolution source frames.
        labels: [B, H0, W0] trainIds.
        crop_hw: static output (H, W).
    Returns (frames [B,H,W,3] normalized with padding zeroed,
             labels [B,H,W] int32 with 255 at ignore+padding).

    The reference scales the full image then random-crops with centered
    padding when the scaled image is smaller than the crop
    (tf_seg.py MaskRandScale + MaskRandCrop); both cases reduce to
    src = (dst - pad + off) / sigma per axis.
    """
    b, h0, w0, _ = images.shape
    ch, cw = crop_hw
    keys = jax.random.split(key, 6)

    sigma = jax.random.uniform(keys[0], (b,), minval=scale_range[0],
                               maxval=scale_range[1])
    sh, sw = sigma * h0, sigma * w0

    def off_pad(scaled, crop, u):
        off = u * jnp.maximum(scaled - crop, 0.0)
        pad = jnp.floor(jnp.maximum(crop - scaled, 0.0) / 2.0)
        return off, pad

    off_y, pad_y = off_pad(sh, ch, jax.random.uniform(keys[1], (b,)))
    off_x, pad_x = off_pad(sw, cw, jax.random.uniform(keys[2], (b,)))

    flip = jnp.where(hflip & (jax.random.uniform(keys[3], (b,)) > 0.5),
                     -1.0, 1.0)

    theta = _pixel_affine_to_theta(
        1.0 / sigma, (off_y - pad_y) / sigma,
        1.0 / sigma, (off_x - pad_x) / sigma, (ch, cw), (h0, w0))
    # reference order: scale -> flip -> crop; a flip between scale and crop
    # mirrors the crop window, which re-parameterizes to flipping after the
    # crop with a mirrored (still uniform) offset
    theta = compose(theta, _flip_theta(flip))

    imgs_f = images.astype(jnp.float32) / 255.0
    # anti-alias pre-blur for downscale warps (PIL's area-weighted resize has
    # implicit low-pass; point-sampled gathers do not)
    aa_sigma = 0.5 * jnp.sqrt(jnp.maximum(1.0 / sigma**2 - 1.0, 0.0))
    imgs_f = P.gaussian_blur_sigma(imgs_f, aa_sigma)

    def warp_one(img, lbl, th):
        i, l, v = _warp_views(img, lbl, th[None], out_hw=(ch, cw))
        return i[0], l[0], v[0]

    frames, labels_o, valid = jax.vmap(warp_one)(
        imgs_f, labels.astype(jnp.int32), theta)

    # the reference blurs/jitters BEFORE RandCrop pads (dataloader_seg.py
    # chain), so its photometric ops never see padding; mask-aware variants
    # keep the padded border from deflating the contrast mean or bleeding
    # black into valid pixels.  (The target chain intentionally omits this:
    # the reference applies target photometric AFTER the padded per-view
    # zoom, dataloader_target.py:284-296.)
    if blur:
        frames = P.gaussian_blur(keys[4], frames, valid=valid)
    if jitter > 0:
        frames = P.color_jitter(keys[5], frames, jitter, min(0.1, jitter),
                                p=0.5, valid=valid)

    vm = valid[..., None].astype(jnp.float32)
    frames = P.normalize(frames, mean, std) * vm
    return frames, labels_o


def renorm_stats(mean, std, source_mean, source_std, target_mean, target_std):
    """Source-renormalisation statistics (dataloader_seg.py:96-107):
    mean' = mu_src - sigma_src/sigma_tgt * (mu_tgt - mean),
    std'  = sigma_src * std / sigma_tgt."""
    import numpy as np

    mean = np.asarray(mean)
    std = np.asarray(std)
    m_src, s_src = np.asarray(source_mean), np.asarray(source_std)
    m_tgt, s_tgt = np.asarray(target_mean), np.asarray(target_std)
    new_mean = m_src - s_src / s_tgt * (m_tgt - mean)
    new_std = s_src * std / s_tgt
    return tuple(new_mean.tolist()), tuple(new_std.tolist())
