"""Training visualisation grids (reference base_trainer.py:75-278).

Builds the same diagnostic panels the reference logs to TensorBoard: input
views, GT masks, pseudo-labels, student/teacher predictions, confidence and
entropy heatmaps, and the teacher-aligned views — stacked into one uint8
image grid per tag.  A fixed batch is captured once so the panels stay
comparable epoch over epoch (base_trainer.py:200-218).
"""

import numpy as np

from dasac_tpu.aug import photometric as P
from dasac_tpu.data.category import colorize


def _to_u8(img01):
    return (np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8)


def denorm_to_u8(frames, mean, std):
    """Normalized [B,H,W,3] -> uint8 RGB."""
    return _to_u8(np.asarray(P.denormalize(frames, mean, std)))


def heatmap(values01, cmap="inferno"):
    """[B,H,W] in [0,1] -> uint8 RGB via matplotlib colormap."""
    try:
        import matplotlib

        mapper = matplotlib.colormaps[cmap]
    except Exception:
        v = np.clip(np.asarray(values01), 0, 1)
        return np.stack([_to_u8(v)] * 3, -1)
    v = np.clip(np.asarray(values01), 0, 1)
    return _to_u8(mapper(v)[..., :3])


def grid(rows, pad=2):
    """rows: list of [B,H,W,3] uint8 -> one [R*(H+pad), B*(W+pad), 3]."""
    rows = [np.asarray(r) for r in rows]
    b, h, w, _ = rows[0].shape
    out = np.zeros((len(rows) * (h + pad), b * (w + pad), 3), np.uint8)
    for ri, row in enumerate(rows):
        for bi in range(min(b, row.shape[0])):
            out[ri * (h + pad):ri * (h + pad) + h,
                bi * (w + pad):bi * (w + pad) + w] = row[bi]
    return out


def masks_to_rgb(masks):
    return np.stack([colorize(m) for m in np.asarray(masks)])


def entropy_heatmap(probs, cmap="jet"):
    """[B,H,W,C] probabilities -> normalized-entropy jet heatmap
    (reference base_trainer.py:244-250 _error_rgb with the jet colormap)."""
    p = np.clip(np.asarray(probs, np.float32), 1e-8, 1.0)
    ent = -np.sum(p * np.log(p), axis=-1) / np.log(p.shape[-1])
    return heatmap(ent, cmap=cmap)


def target_panel(views, refined_probs, pseudo, student_up, mean, std,
                 max_items=4, diags=None):
    """The reference's train_target visual: aug view / clean view / GT /
    pseudo-labels / student pred / teacher refined pred / teacher conf /
    teacher entropy (jet), plus the teacher-ALIGNED views (warped frame,
    aligned pred, aligned conf — base_trainer.py:170-176)."""
    sel = slice(0, max_items)
    aug = denorm_to_u8(np.asarray(views.frames_aug)[sel], mean, std)
    clean = denorm_to_u8(np.asarray(views.frames_clean)[sel], mean, std)
    gt = masks_to_rgb(np.asarray(views.labels)[sel])
    ps = masks_to_rgb(np.asarray(pseudo)[sel])
    student = masks_to_rgb(np.argmax(np.asarray(student_up)[sel], -1))
    teacher = masks_to_rgb(np.argmax(np.asarray(refined_probs)[sel], -1))
    conf = heatmap(np.max(np.asarray(refined_probs)[sel], -1))
    ent = entropy_heatmap(np.asarray(refined_probs)[sel])
    rows = [aug, clean, gt, ps, student, teacher, conf, ent]
    if diags and "teacher_aligned" in diags:
        aligned = np.asarray(diags["teacher_aligned"])[sel]
        frames_al = denorm_to_u8(
            np.asarray(diags["frames_aligned"])[sel], mean, std)
        pred_al = masks_to_rgb(np.argmax(aligned, -1))
        blend = (0.3 * frames_al + 0.7 * pred_al).astype(np.uint8)
        rows += [frames_al, blend, heatmap(np.max(aligned, -1))]
    return grid(rows)


def source_panel(frames, labels, logits_up, mean, std, max_items=4):
    """Input / GT / prediction / confidence for a source batch."""
    sel = slice(0, max_items)
    img = denorm_to_u8(np.asarray(frames)[sel], mean, std)
    gt = masks_to_rgb(np.asarray(labels)[sel])
    probs = np.asarray(logits_up)[sel]
    probs = np.exp(probs - probs.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    pred = masks_to_rgb(np.argmax(probs, -1))
    conf = heatmap(np.max(probs, -1))
    return grid([img, gt, pred, conf])


class FixedBatch:
    """Capture-once storage for stable epoch-over-epoch visuals
    (reference save_fixed_batch / has_fixed_batch)."""

    def __init__(self):
        self._batches = {}

    def has(self, tag):
        return tag in self._batches

    def save(self, tag, batch):
        if tag not in self._batches:
            self._batches[tag] = tuple(np.asarray(x) for x in batch)

    def get(self, tag):
        return self._batches.get(tag)
