"""Offline importance-sampling weight computation
(reference tools/compute_IS_weights.py:42-98).

Given a directory of predicted trainId masks (e.g. the ABN baseline's
inference output on train_cityscapes), computes per-image per-class pixel
fractions normalized by the class's total pixel count:
``{mask_basename: {class_id: class_pixels_in_image / total_class_pixels}}``.

Vectorized: one np.bincount per mask instead of a per-label Python loop.

Output format: ``torch`` (default when torch is importable) writes with
``torch.save`` — byte-compatible with the reference's own output
(compute_IS_weights.py:97), so the reference's ``DataTarget.init_sampling``
(dataloader_target.py:83-92) loads our weights directly; ``pickle`` is the
torch-free fallback.  Our sampler (data/sampler.load_sample_weights) reads
BOTH, so interop holds in both directions either way.
"""

import argparse
import fnmatch
import os
import pickle
import sys

import numpy as np
from PIL import Image


def _save(mask_stats, out, fmt="auto"):
    if fmt == "auto":
        try:
            import torch  # noqa: F401
            fmt = "torch"
        except ImportError:
            fmt = "pickle"
    if fmt == "torch":
        import torch
        torch.save(mask_stats, out)
    else:
        with open(out, "wb") as f:
            pickle.dump(mask_stats, f)
    return fmt


def count(labels_dir, ext="*.png", out=None, num_classes=19, verbose=True,
          fmt="auto"):
    matches = sorted(
        os.path.join(labels_dir, f)
        for f in fnmatch.filter(os.listdir(labels_dir), ext))
    if verbose:
        print("Found {} masks".format(len(matches)))

    mask_stats = {}
    pixel_count = np.zeros(num_classes, np.float64)
    num_images = np.zeros(num_classes, np.int64)
    for fp in matches:
        mask = np.asarray(Image.open(fp))
        counts = np.bincount(mask.reshape(-1), minlength=256)[:num_classes]
        present = np.nonzero(counts)[0]
        mask_stats[os.path.basename(fp)] = {
            int(c): float(counts[c]) for c in present}
        pixel_count[present] += counts[present]
        num_images[present] += 1

    if verbose:
        print("Pixel count / # of Images:")
        for c in range(num_classes):
            if pixel_count[c]:
                print("Class {:02d}: {:2.1f} {}".format(
                    c, pixel_count[c], num_images[c]))

    for stats in mask_stats.values():
        for c in stats:
            # plain Python float: numpy scalars would trip torch.load's
            # weights_only unpickler on the reference side
            stats[c] = float(stats[c] / pixel_count[c])

    if out:
        if os.path.isfile(out):
            print("Output file already exists: {}".format(out))
            sys.exit(1)
        _save(mask_stats, out, fmt)
    return mask_stats


def main(argv=None):
    parser = argparse.ArgumentParser(description="Count pixels")
    parser.add_argument("--labels", type=str, default="./data/labels")
    parser.add_argument("--ext", type=str, default="*.png")
    parser.add_argument("--out", type=str, default="./data/weights.data")
    parser.add_argument("--num-classes", type=int, default=19)
    parser.add_argument("--format", choices=["auto", "torch", "pickle"],
                        default="auto", dest="fmt",
                        help="'torch' = reference-compatible torch.save "
                             "(dataloader_target.py:83-92 loads it); "
                             "'pickle' needs no torch; 'auto' = torch when "
                             "importable")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    count(args.labels, args.ext, args.out, args.num_classes, fmt=args.fmt)


if __name__ == "__main__":
    main()
