"""Streaming segmentation metrics as on-device confusion accumulation.

The reference's Jaccard (utils/metrics.py:9-53) loops classes in Python and
.item()s per sample; here a batch contributes one [C, C] confusion matrix via
a single bincount, reduced with psum across the mesh at summarise time.
tp/fp/fn and the IoU/precision/recall formulas match the reference exactly
(tp / max(1e-3, .)).
"""

import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred, gt, num_classes, ignore=255):
    """[..., H, W] int preds/gts -> [C, C] confusion (rows = gt, cols = pred).

    Pixels whose gt is ``ignore`` are dropped (the reference additionally
    overwrites pred with ignore there — same effect).
    """
    valid = gt != ignore
    gt_c = jnp.where(valid, gt, 0).astype(jnp.int32)
    pred_c = jnp.where(valid, pred, 0).astype(jnp.int32)
    idx = (gt_c * num_classes + pred_c).reshape(-1)
    weights = valid.reshape(-1).astype(jnp.float32)
    counts = jnp.bincount(idx, weights=weights,
                          length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def tp_fp_fn(conf):
    tp = jnp.diagonal(conf)
    fp = jnp.sum(conf, axis=0) - tp
    fn = jnp.sum(conf, axis=1) - tp
    return tp, fp, fn


def summarise(conf):
    """Per-class (iou, precision, recall) numpy arrays (reference
    utils/metrics.py:41-53)."""
    conf = np.asarray(conf)
    tp = np.diagonal(conf)
    fp = conf.sum(axis=0) - tp
    fn = conf.sum(axis=1) - tp
    denom_j = np.maximum(1e-3, tp + fp + fn)
    denom_p = np.maximum(1e-3, tp + fp)
    denom_r = np.maximum(1e-3, tp + fn)
    return tp / denom_j, tp / denom_p, tp / denom_r


def mean_iou(conf, ignore_class=()):
    iou, _, _ = summarise(conf)
    keep = [i for i in range(iou.shape[0]) if i not in set(ignore_class)]
    return float(np.mean(iou[keep]))


class StatManager:
    """Scalar running-average registry (reference utils/stat_manager.py)."""

    def __init__(self):
        self._sums = {}
        self._counts = {}

    def update_stats(self, key, val, count=1):
        self._sums[key] = self._sums.get(key, 0.0) + float(val) * count
        self._counts[key] = self._counts.get(key, 0) + count

    def __getitem__(self, key):
        return self._sums[key] / max(1, self._counts[key])

    def items(self):
        for k in self._sums:
            yield k, self[k]

    def keys(self):
        return self._sums.keys()

    def has_vals(self, key):
        return key in self._sums and self._counts[key] > 0
