"""Offline mIoU evaluator: exported PNGs vs gtFine labelIds ground truth.

Covers both prediction formats our inference engine writes (paletted trainId
masks and Cityscapes-labelId masks under cs/ — infer/engine.py:134-142), the
auto-detection between them, void-prediction accounting, and the SYNTHIA
16-class protocol (reference train.py:447-449).
"""

import os

import numpy as np
import pytest
from PIL import Image

from dasac_tpu.data.category import train_palette, trainid_to_cs_table
from dasac_tpu.tools import evaluate_miou as EM

H, W = 12, 16


def _gt_trainids():
    gt = np.zeros((H, W), np.uint8)
    gt[:, W // 2:] = 1          # right half: sidewalk
    gt[:2, :] = 255             # top rows: ignore
    return gt


def _pred_trainids():
    pred = np.zeros((H, W), np.uint8)
    pred[:, W // 2:] = 1
    pred[4:6, :] = 13           # a band mispredicted as car
    return pred


def _write_gt(dirpath, name, gt_train):
    t2c = trainid_to_cs_table()
    lab = t2c[gt_train]          # trainId 255 -> labelId 0 (void/unlabeled)
    os.makedirs(dirpath, exist_ok=True)
    Image.fromarray(lab).save(
        os.path.join(dirpath, name + "_gtFine_labelIds.png"))


def _write_pred_trainid(dirpath, name, pred):
    os.makedirs(dirpath, exist_ok=True)
    img = Image.fromarray(pred, mode="P")
    img.putpalette(train_palette())
    img.save(os.path.join(dirpath, name + "_gtFine_labelIds.png"))


def _write_pred_labelid(dirpath, name, pred):
    os.makedirs(dirpath, exist_ok=True)
    Image.fromarray(trainid_to_cs_table()[pred]).save(
        os.path.join(dirpath, name + "_gtFine_labelIds.png"))


def _expected_iou(gt, pred, c):
    valid = gt != 255
    tp = np.sum(valid & (gt == c) & (pred == c))
    fp = np.sum(valid & (gt != c) & (pred == c))
    fn = np.sum(valid & (gt == c) & (pred != c))
    return tp / max(1e-3, tp + fp + fn)


@pytest.mark.parametrize("fmt", ["trainid", "labelid"])
def test_evaluator_matches_hand_iou(tmp_path, fmt):
    gt, pred = _gt_trainids(), _pred_trainids()
    _write_gt(str(tmp_path / "gt" / "cityA"), "cityA_000000_000019", gt)
    writer = _write_pred_trainid if fmt == "trainid" else _write_pred_labelid
    pred_dir = str(tmp_path / ("cs" if fmt == "labelid" else "pred"))
    writer(pred_dir, "cityA_000000_000019", pred)

    # auto-detection must resolve the right format for both export flavors
    conf, matched = EM.evaluate_dirs(pred_dir, str(tmp_path / "gt"),
                                     pred_format="auto")
    assert matched == 1
    report, payload = EM.format_report(conf)
    for c, nm in ((0, "road"), (1, "sidewalk"), (13, "car")):
        assert payload["classes"][nm]["iou"] == pytest.approx(
            _expected_iou(gt, pred, c), abs=1e-9)
    per_class = [_expected_iou(gt, pred, c) for c in range(19)]
    assert payload["mean_iou"] == pytest.approx(np.mean(per_class), abs=1e-9)
    assert "mean IoU" in report


def test_void_predictions_count_as_fn_not_fp(tmp_path):
    gt = np.zeros((H, W), np.uint8)       # all road
    pred = np.zeros((H, W), np.uint8)
    pred[:, :W // 2] = 255                # left half predicted void
    _write_gt(str(tmp_path / "gt"), "cityB_000001_000019", gt)
    # labelId export: trainId 255 maps to labelId 0 = void
    _write_pred_labelid(str(tmp_path / "cs"), "cityB_000001_000019", pred)

    conf, _ = EM.evaluate_dirs(str(tmp_path / "cs"), str(tmp_path / "gt"),
                               pred_format="labelid")
    _, payload = EM.format_report(conf)
    # road: half the pixels lost to void -> IoU 0.5; sidewalk untouched (the
    # void pixels must NOT surface as false positives of any real class)
    assert payload["classes"]["road"]["iou"] == pytest.approx(0.5)
    assert payload["classes"]["road"]["recall"] == pytest.approx(0.5)
    for nm, row in payload["classes"].items():
        if nm != "road":
            assert row["precision"] == 0.0  # tp=fp=0 everywhere else


def test_synthia_protocol_excludes_classes(tmp_path):
    gt, pred = _gt_trainids(), _pred_trainids()
    _write_gt(str(tmp_path / "gt"), "cityC_000002_000019", gt)
    _write_pred_trainid(str(tmp_path / "pred"), "cityC_000002_000019", pred)
    conf, _ = EM.evaluate_dirs(str(tmp_path / "pred"), str(tmp_path / "gt"))
    _, full = EM.format_report(conf)
    report16, p16 = EM.format_report(conf, ignore_class=(9, 14, 16))
    keep = [c for c in range(19) if c not in (9, 14, 16)]
    names = list(full["classes"])
    expected = np.mean([full["classes"][names[c]]["iou"] for c in keep])
    assert p16["mean_iou"] == pytest.approx(expected, abs=1e-12)
    assert p16["ignored_classes"] == [9, 14, 16]
    assert "(excluded from mean)" in report16
    assert "(16 classes)" in report16


def test_cli_json_roundtrip(tmp_path):
    gt, pred = _gt_trainids(), _pred_trainids()
    _write_gt(str(tmp_path / "gt"), "cityD_000003_000019", gt)
    _write_pred_trainid(str(tmp_path / "pred"), "cityD_000003_000019", pred)
    out = str(tmp_path / "report.json")
    rc = EM.main(["--pred", str(tmp_path / "pred"),
                  "--gt", str(tmp_path / "gt"), "--json", out])
    assert rc == 0
    import json

    with open(out) as f:
        payload = json.load(f)
    assert payload["images"] == 1
    assert 0.0 < payload["mean_iou"] < 1.0


def test_16bit_gt_values_fail_loud_not_wrap(tmp_path):
    """Regression: _read_mask used to cast to uint8 BEFORE validation, so a
    16-bit GT value of 256 wrapped to trainId 0 and silently polluted the
    confusion matrix instead of raising the loud format error."""
    gt = np.zeros((H, W), np.int32)
    gt[0, 0] = 256               # out of trainId range only at 16-bit width
    os.makedirs(str(tmp_path / "gt"), exist_ok=True)
    Image.fromarray(gt, mode="I").save(
        str(tmp_path / "gt" / "cityE_000004_000019.png"))
    _write_pred_trainid(str(tmp_path / "pred"), "cityE_000004_000019",
                        _pred_trainids())
    with pytest.raises(ValueError, match="trainId range"):
        EM.evaluate_dirs(str(tmp_path / "pred"), str(tmp_path / "gt"),
                         pred_format="trainid")
