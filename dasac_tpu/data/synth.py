"""Synthetic tiny datasets on disk: real PNGs + split lists in the reference
layout, so the train/infer CLIs and tests run end-to-end without
GTA5/Cityscapes (SURVEY.md §4: one CPU-runnable end-to-end config)."""

import os

import numpy as np
from PIL import Image


def _toy_scene(rng, h, w, num_classes):
    """A blocky 'scene': horizontal bands + random rectangles, image =
    class-colored noise so segmentation is learnable."""
    mask = np.zeros((h, w), np.uint8)
    mask[h // 3:, :] = 1 % num_classes
    mask[2 * h // 3:, :] = 2 % num_classes
    for _ in range(3):
        c = rng.randint(0, num_classes)
        y0, x0 = rng.randint(0, h // 2), rng.randint(0, w // 2)
        mask[y0:y0 + h // 4, x0:x0 + w // 4] = c
    base = np.linspace(0, 255, num_classes + 1)[mask]
    img = np.stack([
        base + rng.randn(h, w) * 10,
        255 - base + rng.randn(h, w) * 10,
        np.full((h, w), 128) + rng.randn(h, w) * 10,
    ], -1).clip(0, 255).astype(np.uint8)
    return img, mask


def make_synthetic_root(root, *, n_train_src=8, n_train_tgt=8, n_val=4,
                        hw=(64, 96), num_classes=19, seed=0,
                        source_split="train_game_9K",
                        target_split="train_cityscapes",
                        val_splits=("val_cityscapes", "val2_cityscapes",
                                    "train_cityscapes", "val_game_1K"),
                        src_hw=None, tgt_hw=None, val_hw=None):
    """Create a data root with images/, labels/, and split .txt files.

    Returns the root path.  Splits reuse the same pools where the reference
    does (train_cityscapes doubles as a val set).  ``src_hw``/``tgt_hw``/
    ``val_hw`` override ``hw`` per pool (e.g. native GTA/Cityscapes sizes
    for input-pipeline benchmarks).
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)

    def write_pool(prefix, n, pool_hw):
        pool_hw = pool_hw or hw
        lines = []
        for i in range(n):
            img, mask = _toy_scene(rng, pool_hw[0], pool_hw[1], num_classes)
            ip = "images/{}_{:03d}.png".format(prefix, i)
            lp = "labels/{}_{:03d}.png".format(prefix, i)
            Image.fromarray(img).save(os.path.join(root, ip))
            Image.fromarray(mask).save(os.path.join(root, lp))
            lines.append("{} {}".format(ip, lp))
        return lines

    src_lines = write_pool("src", n_train_src, src_hw)
    tgt_lines = write_pool("tgt", n_train_tgt, tgt_hw)
    val_lines = write_pool("val", n_val, val_hw)

    def write_split(name, lines):
        with open(os.path.join(root, name + ".txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    write_split(source_split, src_lines)
    write_split(target_split, tgt_lines)
    for vs in val_splits:
        if vs == target_split:
            continue
        write_split(vs, val_lines)
    return root
