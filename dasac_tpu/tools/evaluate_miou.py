"""Offline mIoU evaluation of exported prediction PNGs.

The reference delegates final scoring to the external cityscapesScripts
``evalPixelLevelSemanticLabeling`` tool (reference README.md:160-161); this
tool closes that loop in-tree: it matches exported prediction masks (either
the trainId paletted PNGs or the Cityscapes-labelId PNGs under ``cs/`` that
``infer_val.py`` writes — dasac_tpu/infer/engine.py:134-142) against
ground-truth ``*_gtFine_labelIds.png`` files and reports per-class
IoU/precision/recall plus the mean, using the exact formulas of the training
metrics (dasac_tpu/train/metrics.py, reference utils/metrics.py:41-53).

Evaluation protocol parity:
  * pixels whose ground truth maps to ignore (255) are dropped;
  * ``--ignore-class`` removes classes from the MEAN (the SYNTHIA 16-class
    protocol: 9,14,16 — reference launch/train.sh:41, train.py:447-449)
    while keeping their per-class rows visible.

Usage:
  python -m dasac_tpu.tools.evaluate_miou \
      --pred snapshots/.../masks/cs --gt /data/cityscapes/gtFine/val \
      [--pred-format auto|trainid|labelid] [--ignore-class 9 14 16] \
      [--json out.json]
"""

import argparse
import glob
import json
import os

import numpy as np
from PIL import Image

from dasac_tpu.data.category import (IGNORE_LABEL, cs_to_trainid_table,
                                     get_class_names)
from dasac_tpu.train.metrics import summarise

NUM_CLASSES = 19


_RECORD_SUFFIXES = ("_gtFine_labelIds", "_gtFine_labelTrainIds",
                    "_gtFine_instanceIds", "_gtFine_color", "_leftImg8bit")


def _stem_key(path):
    """Frame key: the basename with any Cityscapes record-type suffix
    (_gtFine_labelIds / _leftImg8bit / ...) and the extension stripped, so a
    prediction matches its ground truth regardless of which record name the
    exporter used."""
    base = os.path.splitext(os.path.basename(path))[0]
    for suf in _RECORD_SUFFIXES:
        if base.endswith(suf):
            return base[:-len(suf)]
    return base


def _index_gt(gt_dir):
    """(key -> path, format): *labelIds.png files carry Cityscapes labelIds;
    the plain-PNG fallback (synthetic/test layouts, pre-converted masks)
    carries trainIds directly and must NOT go through the labelId LUT."""
    pattern = os.path.join(gt_dir, "**", "*labelIds.png")
    files = glob.glob(pattern, recursive=True)
    gt_format = "labelid"
    if not files:
        files = glob.glob(os.path.join(gt_dir, "**", "*.png"), recursive=True)
        gt_format = "trainid"
    return {_stem_key(f): f for f in files}, gt_format


def _read_mask(path):
    """Native-dtype read: no uint8 cast here — 16-bit values (e.g. 256 from
    an I/I;16 PNG matched by the plain-PNG fallback) must survive to the
    out-of-range validation instead of wrapping into valid class ids."""
    img = Image.open(path)
    mode = img.mode
    if mode not in ("L", "P", "I", "I;16"):
        img = img.convert("L")
    return np.asarray(img), mode


def _detect_format(arr, png_mode, pred_dir):
    """Resolve ``--pred-format auto``.

    Strong hints first: our own trainId exports are paletted ("P" mode,
    engine.py:136-138) while the labelId exports under ``cs/`` are plain "L";
    then the value range — labelIds use {0..33} with pixels above 18 and no
    255, trainIds use {0..18, 255}.
    """
    if png_mode == "P":
        return "trainid"
    if os.path.basename(os.path.normpath(pred_dir)) == "cs":
        return "labelid"
    vals = np.unique(arr)
    if vals.max(initial=0) <= 33 and (vals > 18).any() and not (
            vals == IGNORE_LABEL).any():
        return "labelid"
    return "trainid"


def evaluate_dirs(pred_dir, gt_dir, pred_format="auto", gt_format="auto",
                  num_classes=NUM_CLASSES, verbose=False):
    """Accumulate the [C, C] confusion over every matched (pred, gt) pair."""
    gt_index, detected_gt = _index_gt(gt_dir)
    if gt_format == "auto":
        gt_format = detected_gt
    preds = sorted(glob.glob(os.path.join(pred_dir, "*.png")))
    if not preds:
        raise FileNotFoundError("no prediction PNGs in %s" % pred_dir)

    lut = cs_to_trainid_table()
    # one extra column collects predictions that map to void/ignore: they
    # count as false negatives for the gt class (as in the official tool)
    # without polluting any real class's false positives
    width = num_classes + 1
    conf = np.zeros((width, width), np.int64)
    matched = 0
    for i, p in enumerate(preds):
        key = _stem_key(p)
        gt_path = gt_index.get(key)
        if gt_path is None:
            continue
        matched += 1
        pred, png_mode = _read_mask(p)
        gt = _read_mask(gt_path)[0].astype(np.int64)
        if gt_format == "labelid":
            if gt.max(initial=0) > 255:
                raise ValueError(
                    "%s holds values above 255 (e.g. %d) — not Cityscapes "
                    "labelIds" % (gt_path, int(gt.max())))
            gt = lut[gt].astype(np.int64)
        if pred_format == "auto":
            # decide ONCE, from the first matched file, so one run never
            # mixes interpretations across frames
            pred_format = _detect_format(pred, png_mode, pred_dir)
        pred = pred.astype(np.int64)
        if pred_format == "labelid":
            if pred.max(initial=0) > 255:
                raise ValueError(
                    "%s holds values above 255 (e.g. %d) — not Cityscapes "
                    "labelIds" % (p, int(pred.max())))
            pred = lut[pred].astype(np.int64)
        assert pred.shape == gt.shape, (p, pred.shape, gt_path, gt.shape)
        valid = gt != IGNORE_LABEL
        bad = valid & (gt >= num_classes)
        if bad.any():
            raise ValueError(
                "%s holds values outside the trainId range (e.g. %d) — "
                "if the ground truth is Cityscapes labelIds, pass "
                "--gt-format labelid" % (gt_path, int(gt[bad][0])))
        pred_c = np.minimum(pred, num_classes)
        idx = gt[valid].astype(np.int64) * width + pred_c[valid]
        conf += np.bincount(idx, minlength=width * width).reshape(width, width)
        if verbose and (i + 1) % 100 == 0:
            print("  scored %d/%d" % (i + 1, len(preds)))
    if matched == 0:
        raise FileNotFoundError(
            "no prediction in %s matched a ground-truth mask in %s"
            % (pred_dir, gt_dir))
    return conf, matched


def format_report(conf, ignore_class=(), num_classes=NUM_CLASSES):
    # conf may carry the extra void-prediction column; summarise handles any
    # square matrix and the slice below keeps only the real classes (their
    # row sums still include void predictions, i.e. FNs stay counted)
    iou, prec, rec = (m[:num_classes] for m in summarise(conf))
    names = get_class_names()[:num_classes]
    keep = [c for c in range(num_classes) if c not in set(ignore_class)]
    lines = ["{:<16} {:>7} {:>7} {:>7}".format("class", "IoU", "Pr", "Re")]
    for c in range(num_classes):
        tag = "" if c in keep else "  (excluded from mean)"
        lines.append("{:<16} {:7.4f} {:7.4f} {:7.4f}{}".format(
            names[c], iou[c], prec[c], rec[c], tag))
    miou = float(np.mean(iou[keep]))
    lines.append("{:<16} {:7.4f}  ({} classes)".format(
        "mean IoU", miou, len(keep)))
    return "\n".join(lines), {
        "mean_iou": miou,
        "classes": {names[c]: {"iou": float(iou[c]), "precision":
                               float(prec[c]), "recall": float(rec[c])}
                    for c in range(num_classes)},
        "ignored_classes": sorted(set(ignore_class)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--pred", required=True,
                    help="directory of prediction PNGs")
    ap.add_argument("--gt", required=True,
                    help="ground-truth root (searched recursively for "
                         "*labelIds.png)")
    ap.add_argument("--pred-format", default="auto",
                    choices=["auto", "trainid", "labelid"])
    ap.add_argument("--gt-format", default="auto",
                    choices=["auto", "trainid", "labelid"],
                    help="auto: *labelIds.png files are labelIds, the "
                         "plain-PNG fallback is trainIds")
    ap.add_argument("--ignore-class", type=int, nargs="*", default=[],
                    help="class ids excluded from the mean "
                         "(SYNTHIA protocol: 9 14 16)")
    ap.add_argument("--json", default=None, help="also write a JSON report")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    conf, matched = evaluate_dirs(args.pred, args.gt, args.pred_format,
                                  gt_format=args.gt_format,
                                  verbose=args.verbose)
    report, payload = format_report(conf, args.ignore_class)
    payload["images"] = matched
    print("scored %d images" % matched)
    print(report)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
