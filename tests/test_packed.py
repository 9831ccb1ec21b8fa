"""Packed dataset format: offline pack tool, memmap reader, and the data
factory's transparent auto-detection (dasac_tpu/data/packed.py,
tools/pack_dataset.py — no reference counterpart, replaces per-epoch PNG
decode)."""

import json
import os

import numpy as np
import pytest

from dasac_tpu.core.config import cfg, cfg_from_list
from dasac_tpu.data import factory, host_loader, lists, packed
from dasac_tpu.data.synth import make_synthetic_root
from dasac_tpu.tools.pack_dataset import pack_split


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_synthetic_root(str(tmp_path_factory.mktemp("p")),
                               hw=(32, 40), n_train_src=6, n_train_tgt=5,
                               n_val=3)


def test_pack_roundtrip_bit_exact(root):
    hdr = pack_split(root, "train_cityscapes", size=(32, 40), verbose=False)
    imgs, msks = lists.read_split(root, "train_cityscapes")
    ref = host_loader.SegDataset(imgs, msks, (32, 40), mode="resize")
    ds = packed.PackedDataset(hdr)
    assert len(ds) == len(imgs)
    assert ds.mask_basenames() == ref.mask_basenames()
    for i in range(len(imgs)):
        pi, pm = ds.load(i)
        ri, rm = ref.load(i)
        np.testing.assert_array_equal(pi, ri)
        np.testing.assert_array_equal(pm, rm)
    # padding sample contract matches SegDataset (all-ignore dummy)
    pi, pm = ds.load(-1)
    ri, rm = ref.load(-1)
    np.testing.assert_array_equal(pi, ri)
    np.testing.assert_array_equal(pm, rm)
    # batch loads agree with per-sample loads
    got = ds.load_batch([2, 0, -1])
    for (gi, gm), i in zip(got, [2, 0, -1]):
        ei, em = ds.load(i)
        np.testing.assert_array_equal(gi, ei)
        np.testing.assert_array_equal(gm, em)


def _loaders(root, **sets):
    pairs = ["DATASET.ROOT", str(root),
             "DATASET.CROP_SIZE", "[32,40]",
             "TRAIN.TASK", "train_game_9K",
             "TRAIN.TARGET", "train_cityscapes",
             "TRAIN.BATCH_SIZE", "2",
             "TRAIN.NUM_GROUPS", "1",
             "MODEL.BASELINE", "False"]
    for k, v in sets.items():
        pairs += [k.replace("__", "."), str(v)]
    cfg_from_list(pairs)
    return factory.Loaders(cfg)


def test_factory_prefers_pack_and_batches_match(root):
    # pack the SAC target split at CROP_SIZE and the source at native size
    pack_split(root, "train_cityscapes", size=(32, 40), verbose=False)
    pack_split(root, "train_game_9K", verbose=False)

    plain = _loaders(root, TPU__PACKED_DIR="")
    auto = _loaders(root, TPU__PACKED_DIR="auto")
    assert isinstance(plain.source, host_loader.SegDataset)
    assert isinstance(auto.source, packed.PackedDataset)
    assert isinstance(auto.target, packed.PackedDataset)

    # identical epoch -> identical batches, decoded vs packed
    sa, ta = plain.train_loaders(epoch=0)
    sb, tb = auto.train_loaders(epoch=0)
    for (ai, am), (bi, bm) in zip(sa, sb):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(am, bm)
    for (ai, am), (bi, bm) in zip(ta, tb):
        np.testing.assert_array_equal(ai, bi)
        np.testing.assert_array_equal(am, bm)


def test_stale_or_mismatched_pack_is_ignored(root, tmp_path):
    out = str(tmp_path / "packs")
    hdr = pack_split(root, "train_cityscapes", size=(32, 40), out_dir=out,
                     verbose=False)
    # wrong size requested -> no pack
    assert packed.find_pack(out, "train_cityscapes", (64, 80), "resize") is None
    # wrong mode -> no pack
    assert packed.find_pack(out, "train_cityscapes", (32, 40),
                            "center_crop") is None
    # corrupt header -> no pack
    with open(hdr) as f:
        meta = json.load(f)
    meta["version"] = 999
    with open(hdr, "w") as f:
        json.dump(meta, f)
    assert packed.find_pack(out, "train_cityscapes", (32, 40),
                            "resize") is None
    # sample-count mismatch vs the split list -> factory falls back
    meta["version"] = packed._VERSION
    meta["mask_basenames"] = meta["mask_basenames"][:-1]
    with open(hdr, "w") as f:
        json.dump(meta, f)
    loaders = _loaders(root, TPU__PACKED_DIR=out)
    assert isinstance(loaders.target, host_loader.SegDataset)


def test_crash_safe_packing_leaves_no_header(root, tmp_path):
    out = str(tmp_path / "packs2")
    imgs, msks = lists.read_split(root, "train_cityscapes")
    ds = host_loader.SegDataset(imgs, msks, (32, 40), mode="resize")

    class Boom(RuntimeError):
        pass

    orig = ds.load
    calls = {"n": 0}

    def failing(i):
        calls["n"] += 1
        if calls["n"] > 2:
            raise Boom()
        return orig(i)

    ds.load = failing
    with pytest.raises(Boom):
        packed.write_pack(ds, "train_cityscapes", out, verbose=False)
    assert packed.find_pack(out, "train_cityscapes", (32, 40),
                            "resize") is None
