"""Split-list reading (the reference's ``data/<split>.txt`` format:
``image_path [mask_path]`` per line, paths relative to DATASET.ROOT —
dataloader_seg.py:46-66)."""

import os


def read_split(root, split):
    """Returns (image_paths, mask_paths) — mask is None when absent."""
    split_fn = os.path.join(root, split + ".txt")
    assert os.path.isfile(split_fn), "Split file not found: {}".format(split_fn)
    images, masks = [], []
    with open(split_fn) as f:
        for line in f:
            parts = line.strip().split(" ")
            if not parts or not parts[0]:
                continue
            img = os.path.join(root, parts[0].lstrip("/"))
            assert os.path.isfile(img), "{} not found".format(img)
            images.append(img)
            if len(parts) == 2:
                msk = os.path.join(root, parts[1].lstrip("/"))
                assert os.path.isfile(msk), "{} not found".format(msk)
                masks.append(msk)
            else:
                masks.append(None)
    return images, masks


def canonical_size(split, crop_hw=None):
    """Host-side canonical (H, W) per split family.

    GTA frames are standardized to 1052x1914 (reference
    dataloader_seg.py:151-153); other datasets keep native size, which the
    loader still enforces for static shapes.
    """
    if "game" in split:
        return (1052, 1914)
    if "synthia" in split:
        return (760, 1280)
    if "cityscapes" in split:
        return (1024, 2048)
    return crop_hw
