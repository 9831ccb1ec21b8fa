"""Dataset-layout validator (dasac_tpu/tools/check_dataset.py): fail-fast
checks a user's DATASET.ROOT must pass before the PARITY_RUNBOOK recipe."""

import json
import os

import numpy as np
from PIL import Image

from dasac_tpu.data.synth import make_synthetic_root
from dasac_tpu.tools import check_dataset as CD
from tests.test_png16 import _write_png16


def _root(tmp_path, **kw):
    return make_synthetic_root(str(tmp_path / "data"), hw=(32, 48),
                               n_train_src=4, n_train_tgt=4, n_val=2, **kw)


def test_valid_root_is_ready(tmp_path, capsys):
    root = _root(tmp_path)
    rc = CD.main(["--root", root, "--task", "gta", "--spot", "3",
                  "--json", str(tmp_path / "rep.json")])
    out = capsys.readouterr().out
    assert rc == 0 and "READY" in out
    rep = json.load(open(str(tmp_path / "rep.json")))
    assert rep["splits"]["train_game_9K"]["missing"] == 0
    # synthetic lists are tiny; the reference-count mismatch is a warning,
    # not a failure
    assert "count_warning" in rep["splits"]["train_game_9K"]
    assert rep["splits"]["train_cityscapes"]["mask_kinds"] == {"trainid": 3}


def test_missing_files_fail(tmp_path):
    root = _root(tmp_path)
    os.remove(os.path.join(root, "images", "src_001.png"))
    report, failures = CD.check_root(root, "gta", spot=2, verbose=False)
    assert any("files missing" in f for f in failures)


def test_unconverted_labelids_fail_with_hint(tmp_path):
    root = _root(tmp_path)
    bad = np.full((32, 48), 26, np.uint8)  # Cityscapes labelId for 'car'
    Image.fromarray(bad).save(os.path.join(root, "labels", "tgt_000.png"))
    report, failures = CD.check_root(root, "gta", spot=4, verbose=False)
    hints = [f for f in failures if "convert_train_ids" in f]
    # the mask sits in a CITYSCAPES split: the hint must name the cs
    # table even under --task gta (the gta table would remap labelIds
    # into wrong-but-in-range trainIds that then pass the validator)
    assert hints and "--dataset cs" in hints[0], failures


def test_unconverted_source_ids_hint_names_source_table(tmp_path):
    root = _root(tmp_path)
    bad = np.full((32, 48), 26, np.uint8)
    Image.fromarray(bad).save(os.path.join(root, "labels", "src_000.png"))
    report, failures = CD.check_root(root, "gta", spot=4, verbose=False)
    hints = [f for f in failures if "convert_train_ids" in f]
    assert hints and "--dataset gta" in hints[0], failures


def test_synthia_16bit_gt_detected_via_real_decoder(tmp_path):
    root = _root(tmp_path, source_split="train_synthia_9K",
                 val_splits=("val_cityscapes", "val2_cityscapes",
                             "val_synthia"))
    ids = np.arange(1, 13).repeat(128).reshape(32, 48).astype(np.uint16)
    vals = np.stack([ids, ids * 0, ids * 0], -1)
    _write_png16(os.path.join(root, "labels", "src_000.png"), vals)
    report, failures = CD.check_root(root, "synthia", spot=4, seed=1,
                                     verbose=False)
    # flagged as raw 16-bit SYNTHIA GT, decoded by the real 16-bit reader
    # (so the message can report the labeled fraction), with the exact
    # conversion command
    msgs = [f for f in failures if "16-bit" in f]
    assert msgs and "convert_train_ids" in msgs[0], failures


def test_16bit_grayscale_trainid_mask_judged_by_loader_behavior(tmp_path):
    # a trainId mask saved at 16-bit depth is NOT blanket-rejected as "raw
    # SYNTHIA GT": it is accepted iff the training loader's 8-bit PIL path
    # reads the same values, else failed with a re-save hint (never with
    # the misleading convert_train_ids hint)
    root = _root(tmp_path)
    ids = np.where(np.arange(32 * 48).reshape(32, 48) % 7 == 0,
                   255, 11).astype(np.uint16)
    p = os.path.join(root, "labels", "src_000.png")
    _write_png16(p, ids[..., None], color_type=0)
    with Image.open(p) as m:
        faithful = bool(
            (np.asarray(m.convert("L")).astype(np.uint8) == ids).all())
    report, failures = CD.check_root(root, "gta", spot=4, verbose=False)
    msgs = [f for f in failures if "src_000" in f]
    if faithful:
        assert not msgs, failures
    else:
        assert msgs and "re-save it as 8-bit" in msgs[0], failures
        assert "convert_train_ids" not in msgs[0], failures


def test_stale_pack_flagged(tmp_path):
    root = _root(tmp_path)
    pdir = os.path.join(root, "packed")
    os.makedirs(pdir)
    with open(os.path.join(pdir, "train_cityscapes_32x48.json"), "w") as f:
        json.dump({"version": 2, "n": 99, "hw": [32, 48], "mode": "resize",
                   "mask_basenames": ["stale.png"]}, f)
    report, failures = CD.check_root(root, "gta", spot=2, verbose=False)
    assert any("stale pack" in f for f in failures), failures
