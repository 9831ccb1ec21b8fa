"""Palette helpers (reference utils/palette.py:11-49): the VOC-style
bit-interleaved colormap and matplotlib-colormap palettes, plus the
Cityscapes train palette re-exported for convenience."""

import numpy as np

from dasac_tpu.data.category import train_palette  # noqa: F401


def colormap(n=256):
    """VOC bit-shuffle colormap [n, 3] uint8: color of index i is built by
    distributing i's bits across the channels' high bits."""
    out = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        cid = i
        for j in range(8):
            r |= ((cid >> 0) & 1) << (7 - j)
            g |= ((cid >> 1) & 1) << (7 - j)
            b |= ((cid >> 2) & 1) << (7 - j)
            cid >>= 3
        out[i] = (r, g, b)
    return out


def create_palette(num_classes, cmap_name="jet"):
    """Flat palette [768] from a matplotlib colormap (falls back to the VOC
    colormap when matplotlib is unavailable)."""
    try:
        import matplotlib

        mapper = matplotlib.colormaps[cmap_name]
        colors = (np.asarray(
            [mapper(i / max(1, num_classes - 1))[:3] for i in range(num_classes)]
        ) * 255).astype(np.uint8)
    except Exception:
        colors = colormap(num_classes)
    palette = np.zeros((256, 3), np.uint8)
    palette[:num_classes] = colors[:num_classes]
    return palette.reshape(-1)
