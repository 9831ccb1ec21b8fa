"""SAC algorithm core as pure functions (the heart — SURVEY.md §2.2).

All state (running class prior, teacher params, init flag) is explicit and
threaded through the train step; everything here is jit/vmap/shard_map safe
with static shapes and no host round-trips.

Layout: probabilities/logits are channels-last ``[..., H, W, C]``; label maps
are ``[..., H, W]`` int32 with 255 = ignore.
"""

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE = 255


# ---------------------------------------------------------------------------
# running class prior (reference models/sac.py:104-117)
# ---------------------------------------------------------------------------

def update_running_conf(running_conf, probs, stat_momentum, threshold_beta,
                        tolerance=1e-8, axis_name: Optional[str] = None):
    """EMA of the mean class probability.

    Classes still at their init value (``threshold_beta``) adopt the batch
    average directly (the reference's ``new_index`` copy); others get
    ``m*old + (1-m)*avg``.  With ``axis_name`` the batch average is pmean'd
    across the mesh so every replica tracks the global prior (the reference
    relied on DDP buffer broadcast instead).
    """
    c = probs.shape[-1]
    probs_avg = jnp.mean(probs.reshape(-1, c).astype(jnp.float32), axis=0)
    if axis_name is not None:
        probs_avg = jax.lax.pmean(probs_avg, axis_name)
    is_new = (probs_avg > tolerance) & (running_conf == threshold_beta)
    ema = stat_momentum * running_conf + (1.0 - stat_momentum) * probs_avg
    return jnp.where(is_new, probs_avg, ema)


def threshold_discount(running_conf, threshold_beta):
    """1 - exp(-prior/beta): relaxes thresholds for long-tail classes
    (reference models/sac.py:151-152)."""
    return 1.0 - jnp.exp(-running_conf / threshold_beta)


# ---------------------------------------------------------------------------
# pseudo-label generation (reference models/sac.py:154-187)
# ---------------------------------------------------------------------------

def pseudo_labels(probs, ignore_augm, running_conf, *, upper, lower,
                  threshold_beta, discount=True,
                  compute_dtype=jnp.float32):
    """Adaptive-threshold pseudo labels.

    Per image, each class's confidence peak (max prob over pixels where that
    class is the argmax) sets its threshold ``clamp(upper*peak*discount_c,
    min=lower)``; a pixel keeps its argmax label iff its confidence strictly
    exceeds the argmax class's threshold (equivalent to the reference's
    scatter/gt/sum-==1 formulation since only the argmax channel is nonzero).

    Args:
        probs: [B, H, W, C] teacher probabilities (may be mass-deficient
            where views were invalid).
        ignore_augm: [B, H, W] bool, True at augmentation padding.
    Returns:
        labels [B,H,W] int32 (255 ignore), max_conf [B,H,W], max_idx [B,H,W].
    """
    b, h, w, c = probs.shape
    probs = probs.astype(compute_dtype)
    max_conf = jnp.max(probs, axis=-1)
    max_idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)

    onehot = jax.nn.one_hot(max_idx, c, dtype=compute_dtype)
    peaks = jnp.max((onehot * max_conf[..., None]).reshape(b, -1, c),
                    axis=1).astype(jnp.float32)  # [B,C]: threshold math f32
    thresholds = peaks * upper
    if discount:
        thresholds = thresholds * threshold_discount(running_conf, threshold_beta)[None]
    thresholds = jnp.maximum(thresholds, lower)  # [B, C]

    # one-hot contraction instead of per-pixel gather (VPU-friendly on TPU)
    tau = jnp.einsum("bhwc,bc->bhw", onehot,
                     thresholds.astype(compute_dtype))
    keep = (max_conf > tau) & (~ignore_augm)
    labels = jnp.where(keep, max_idx, IGNORE)
    return labels, max_conf, max_idx


# ---------------------------------------------------------------------------
# losses (reference models/sac.py:119-149 and the source CE in
# models/deeplabv2.py:222-224)
# ---------------------------------------------------------------------------

def _nll(logits, labels, compute_dtype=jnp.float32, impl="xla"):
    """Per-pixel negative log-likelihood with ignore masking.

    Uses a one-hot contraction instead of per-pixel gathers (point gathers
    run at scalar speed on TPU; the one-hot multiply-reduce stays on the
    VPU).  ``compute_dtype`` sets the full-resolution log-softmax/one-hot
    precision (the per-pixel NLL is always returned in f32 — bf16 here is
    the TPU.LOSS_DTYPE traffic experiment).  ``impl="pallas"`` computes the
    NLL with the fused :mod:`dasac_tpu.ops.ce` kernel instead (softmax
    recomputed in backward — no materialized f32 log-softmax residual;
    values agree with the XLA path to f32 roundoff).  Returns (nll [B,H,W]
    zeroed at ignore, valid mask [B,H,W], onehot).
    """
    c = logits.shape[-1]
    valid = labels != IGNORE
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, c, dtype=compute_dtype)
    if impl == "pallas":
        if compute_dtype != jnp.float32:
            raise ValueError(
                "CE_IMPL=pallas computes in f32 only; it cannot honour "
                "LOSS_DTYPE=%s — drop one of the two settings"
                % jnp.dtype(compute_dtype).name)
        from dasac_tpu.ops.ce import nll_pallas

        return nll_pallas(logits, labels), valid, onehot
    logp = jax.nn.log_softmax(logits.astype(compute_dtype), axis=-1)
    picked = jnp.sum(logp * onehot, axis=-1).astype(jnp.float32)
    return jnp.where(valid, -picked, 0.0), valid, onehot


def cross_entropy_mean(logits, labels, compute_dtype=jnp.float32,
                       impl="xla"):
    """Reference source loss: sum of valid per-pixel CE divided by the TOTAL
    pixel count (torch ignore_index zeros + .mean(), train.py:133)."""
    nll, _, _ = _nll(logits, labels, compute_dtype, impl=impl)
    return jnp.mean(nll)


def focal_ce(logits, pseudo_gt, teacher_conf, running_conf, p=3,
             use_conf=True, compute_dtype=jnp.float32, impl="xla"):
    """Focal-weighted self-supervision CE (focal_ce_conf by default).

    Per-pixel loss = (1 - clamp(prior,0))^p [class] * NLL, optionally
    multiplied by the teacher confidence, then averaged over ALL pixels
    (ignored pixels contribute zero).  Also returns the per-class mean-loss
    diagnostic (reference loss_per_class).
    """
    c = logits.shape[-1]
    focal_w = (1.0 - jnp.clip(running_conf, 0.0, None)) ** p  # [C]
    nll, valid, onehot = _nll(logits, pseudo_gt, compute_dtype, impl=impl)
    safe = jnp.where(valid, pseudo_gt, 0).astype(jnp.int32)
    # one-hot contraction (no per-pixel gather)
    w = jnp.einsum("...c,c->...", onehot, focal_w) * valid.astype(jnp.float32)
    ce = nll * w
    if use_conf:
        # reproduce the reference broadcast exactly: loss_ce [B,H,W] *
        # teacher_probs [B,1,H,W] broadcasts to [B,B,H,W] before .mean()
        # (sac.py:148), i.e. each pixel's CE is weighted by the BATCH-MEAN
        # confidence at that location, not its own view's.  mean_{i,j,h,w}
        # ce[j]*conf[i] == mean_{h,w}[ mean_j ce * mean_i conf ] — computed
        # in that factored O(BHW) form instead of materializing B^2 maps.
        ce_mean_views = jnp.mean(ce, axis=0)
        conf_mean_views = jnp.mean(teacher_conf.astype(jnp.float32), axis=0)
        loss = jnp.mean(ce_mean_views * conf_mean_views)
    else:
        loss = jnp.mean(ce)

    # diagnostic: per-class mean of ce over all pixels & batch (one-hot
    # contraction — no scatter)
    per_class = jnp.einsum("...c,...->c", onehot, ce) / ce.size
    return loss, jax.lax.stop_gradient(per_class)


def entropy(probs, eps=1e-5):
    """Per-pixel entropy; near-zero-mass pixels get 1/eps
    (reference models/sac.py:189-196)."""
    probs = probs.astype(jnp.float32)
    probs_eps = (probs + eps) / (1.0 + eps)
    ent = -jnp.sum(probs * jnp.log(probs_eps), axis=-1, keepdims=True)
    mass = jnp.sum(probs, axis=-1, keepdims=True)
    return jnp.where(mass < 0.1, 1.0 / eps, ent)


# ---------------------------------------------------------------------------
# momentum (EMA) teacher (reference models/sac.py:70-102)
# ---------------------------------------------------------------------------

def ema_update(teacher, student, momentum):
    """teacher <- m*teacher + (1-m)*student over every leaf (the reference
    updates weight/bias/running_mean/running_var, which is exactly our
    params + batch_stats trees)."""
    return jax.tree.map(
        lambda t, s: momentum * t + (1.0 - momentum) * s, teacher, student
    )


def teacher_param_distance(teacher, student):
    """Sum of per-tensor L2 distances (the reference's teacher_diff
    diagnostic)."""
    leaves_t = jax.tree.leaves(teacher)
    leaves_s = jax.tree.leaves(student)
    return sum(
        jnp.linalg.norm((t - s).astype(jnp.float32).reshape(-1))
        for t, s in zip(leaves_t, leaves_s)
    )


def maybe_update_teacher(teacher, student, slow_init, running_conf, *,
                         momentum, threshold_beta, do_update):
    """Conditional teacher update under jit (lax.cond, no host logic).

    First effective update copies the student wholesale and resets the class
    prior to ``threshold_beta`` (reference lazy init, sac.py:74-81);
    afterwards it EMAs.  ``do_update`` is a traced bool (step % k == 0).

    Returns (teacher, slow_init, running_conf, diff) where diff is the
    parameter distance diagnostic (0 on the init branch).
    """

    def _init(_):
        rc = jnp.full_like(running_conf, threshold_beta)
        return student, jnp.ones_like(slow_init), rc, jnp.float32(0.0)

    def _ema(_):
        diff = teacher_param_distance(teacher, student)
        new_t = ema_update(teacher, student, momentum)
        return new_t, slow_init, running_conf, diff

    def _noop(_):
        diff = teacher_param_distance(teacher, student)
        return teacher, slow_init, running_conf, diff

    def _update(_):
        return jax.lax.cond(slow_init > 0, _ema, _init, None)

    return jax.lax.cond(do_update, _update, _noop, None)
