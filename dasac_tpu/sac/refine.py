"""Multi-view teacher refinement: warp -> pool -> unwarp
(reference ``SAC._refine`` + pooling ops, models/sac.py:218-313).

TPU-first restructuring: groups are explicit — tensors are [G, T, H, W, C]
and the view pool is a masked reduction over the T axis on-device.  The
reference's cross-GPU ``_gather`` (sac.py:198-216) disappears entirely: each
group lives whole on one device and groups are batched along the data mesh
axis (SURVEY.md §2.3 "TPU-native equivalent").
"""

from typing import Optional

import jax
import jax.numpy as jnp

from dasac_tpu.aug.warp import warp_affine
from dasac_tpu.nn.functional import resize_bilinear_align_corners
from dasac_tpu.sac.core import entropy


def avg_pool_views(masked_probs, tolerance=0.1):
    """Masked average over views (reference _avg_pool, sac.py:238-269).

    Args:
        masked_probs: [G, T, H, W, C] aligned probabilities, zero where
            invalid (prob mass per valid pixel ~1).
    Returns:
        pooled [G, T, H, W, C] (same average broadcast to every view),
        valid [G, T, H, W, 1] float mask (total mass > tolerance).
    """
    t = masked_probs.shape[1]
    total = jnp.sum(masked_probs, axis=1, keepdims=True)          # [G,1,H,W,C]
    mass = jnp.sum(total, axis=-1, keepdims=True)                 # [G,1,H,W,1]
    valid = (mass > tolerance).astype(masked_probs.dtype)
    avg = total / jnp.clip(mass, 1e-3, None)
    avg = jnp.broadcast_to(avg, masked_probs.shape)
    valid = jnp.broadcast_to(valid, masked_probs.shape[:-1] + (1,))
    return avg, valid


def minentropy_pool_views(masked_probs, tolerance=0.1):
    """Pick the min-entropy view per pixel (reference _minentropy_pool,
    sac.py:218-236)."""
    g, t, h, w, c = masked_probs.shape
    ent = entropy(masked_probs.reshape(g * t, h, w, c)).reshape(g, t, h, w, 1)
    best = jnp.argmin(ent, axis=1, keepdims=True)                 # [G,1,H,W,1]
    sel = jnp.take_along_axis(masked_probs, best, axis=1)         # [G,1,H,W,C]
    sel = jnp.broadcast_to(sel, masked_probs.shape)
    mass = jnp.sum(masked_probs, axis=(1, 4), keepdims=True)      # [G,1,H,W,1]
    valid = jnp.broadcast_to(
        (mass > tolerance).astype(masked_probs.dtype),
        masked_probs.shape[:-1] + (1,),
    )
    return sel, valid


POOLS = {"avg_pool": avg_pool_views, "minentropy_pool": minentropy_pool_views}


def _pool_over_views(probs_m, affine, affine_inv, *, group_size, pool):
    """Shared warp -> pool -> unwarp tail of both refine resolutions
    (sac.py:283-307): align every view's masked probabilities to the
    reference frame, weight by the warped validity of the inverse map, pool
    over the group's T views, then warp the pooled map and its count-mask
    back into each view's frame.  Works at any (h, w) — the full and
    stride8 paths stay in lockstep by construction.

    Returns (refined [B,h,w,C], aligned [B,h,w,C]) — ``aligned`` feeds the
    visualisation diagnostics on the full path.
    """
    b, h, w, c = probs_m.shape
    aligned = warp_affine(probs_m, affine)
    valid_aligned = warp_affine(
        jnp.ones((b, h, w, 1), probs_m.dtype), affine_inv)
    masked = aligned * valid_aligned

    t = group_size
    g = b // t
    pooled, valid = POOLS[pool](masked.reshape(g, t, h, w, c))
    pooled = pooled.reshape(b, h, w, c)
    valid = valid.reshape(b, h, w, 1)

    refined = warp_affine(pooled, affine_inv)
    refined_valid = warp_affine(valid, affine_inv)
    return refined * refined_valid, aligned


def refine(teacher_logits, affine, affine_inv, ignore_mask, *,
           group_size, pool="avg_pool", pool_on=True,
           out_hw: Optional[tuple] = None, compute_dtype=None,
           res: str = "full"):
    """Teacher probability refinement across a group's views.

    Args:
        teacher_logits: [B, h, w, C] stride-8 teacher logits (B = G*T).
        affine / affine_inv: [B, 2, 3] view->reference / reference->view.
        ignore_mask: [B, H, W] bool, True at augmentation padding.
        group_size: T, static.
        out_hw: full resolution (H, W); defaults to ignore_mask's.
        compute_dtype: None keeps today's semantics (f32 upsample
            interpolation, warps in the teacher-logits dtype);
            ``jnp.bfloat16`` runs the whole no-grad chain in bf16 — the
            full-resolution probability tensors halve their HBM traffic
            (TPU.REFINE_DTYPE experiment, measured in PARITY.md).
        res: ``"full"`` reproduces the reference order exactly (upsample
            the stride-8 logits FIRST, then softmax/mask/warp/pool at full
            resolution).  ``"stride8"`` runs the whole chain at the
            teacher's native stride-8 resolution — the affines are
            normalized-coordinate maps, so the same thetas warp the small
            grid — and upsamples the POOLED result once at the end.  The
            teacher carries no information below stride 8, so this only
            reorders the bilinear smoothing vs the softmax/pool
            nonlinearities; it trades ~8 full-resolution no-grad passes for
            one (TPU.REFINE_RES experiment, measured in PARITY.md).
    Returns:
        (refined_probs [B, H, W, C], diags dict)

    Mirrors sac.py:271-313: upsample (align_corners=True) -> softmax -> zero
    padded pixels -> warp to reference frame -> multiply by the warped
    validity of the inverse map -> pool over views -> warp the pooled map and
    its count-mask back per view.  The running-conf update is the caller's
    job (it needs the pre-warp probs).
    """
    if out_hw is None:
        out_hw = (ignore_mask.shape[-2], ignore_mask.shape[-1])
    h, w = out_hw

    if res == "stride8":
        return _refine_stride8(
            teacher_logits, affine, affine_inv, ignore_mask, out_hw=(h, w),
            group_size=group_size, pool=pool, pool_on=pool_on,
            compute_dtype=compute_dtype)

    if compute_dtype is None:
        logits_up = resize_bilinear_align_corners(teacher_logits, (h, w))
    else:
        logits_up = resize_bilinear_align_corners(
            teacher_logits.astype(compute_dtype), (h, w),
            compute_dtype=compute_dtype)
    probs = jax.nn.softmax(logits_up, axis=-1)
    # the running-conf update consumes the PRE-masking probabilities
    # (reference order: _update_running_conf BEFORE zeroing padded pixels,
    # sac.py:277-282) — masking first would deflate every class mean on
    # zoom-out views
    diags = {"teacher_probs": probs}
    probs = probs * (1.0 - ignore_mask[..., None].astype(probs.dtype))
    if not pool_on:
        return probs, diags

    refined, aligned = _pool_over_views(
        probs, affine, affine_inv, group_size=group_size, pool=pool)
    diags["teacher_aligned"] = aligned
    return refined, diags


def _refine_stride8(teacher_logits, affine, affine_inv, ignore_mask, *,
                    out_hw, group_size, pool, pool_on, compute_dtype):
    """Whole refine chain at the teacher's native stride-8 grid.

    Same ops as the full path in the same order, but every [.., H, W, C]
    tensor is [.., h8, w8, C]; the single full-resolution tensor produced is
    the final upsample of the pooled result.  The affines are normalized-
    coordinate maps, so they warp the small grid directly.  The ignore mask
    is nearest-sampled onto the stride-8 grid at the align_corners positions
    the final upsample reads from.

    ``diags["teacher_probs"]`` is returned at stride-8 — its only training
    consumer is :func:`~dasac_tpu.sac.core.update_running_conf`, a
    shape-agnostic spatial mean.  ``teacher_aligned`` (visualisation only)
    is omitted; the vis step uses ``res="full"``.
    """
    h8, w8 = teacher_logits.shape[1], teacher_logits.shape[2]
    h, w = out_hw

    resize_dtype = jnp.float32 if compute_dtype is None else compute_dtype
    logits = (teacher_logits if compute_dtype is None
              else teacher_logits.astype(compute_dtype))
    probs = jax.nn.softmax(logits, axis=-1)                       # [B,h8,w8,C]
    diags = {"teacher_probs": probs}

    # stride-8 ignore mask: sample at the positions the align_corners
    # upsample maps the small grid to (i * (H-1)/(h8-1)); the augmentation
    # padding is piecewise-constant, so nearest sampling is exact away from
    # the pad boundary
    yi = jnp.round(jnp.linspace(0.0, h - 1.0, h8)).astype(jnp.int32)
    xi = jnp.round(jnp.linspace(0.0, w - 1.0, w8)).astype(jnp.int32)
    mask8 = ignore_mask[:, yi[:, None], xi[None, :]]              # [B,h8,w8]
    probs_m = probs * (1.0 - mask8[..., None].astype(probs.dtype))

    if not pool_on:
        out = resize_bilinear_align_corners(
            probs_m, (h, w), compute_dtype=resize_dtype)
        return out, diags

    refined, _ = _pool_over_views(
        probs_m, affine, affine_inv, group_size=group_size, pool=pool)
    return resize_bilinear_align_corners(
        refined, (h, w), compute_dtype=resize_dtype), diags
