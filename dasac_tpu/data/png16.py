"""Minimal 16-bit PNG reader (numpy + zlib).

SYNTHIA ground-truth masks are 16-bit RGB PNGs whose class id is the VALUE
of channel 0 (reference tools/id_mappers.py:75-77 reads them via
imageio/FreeImage).  Pillow truncates 16-bit channels to the HIGH byte, which
maps every id 1..255 to 0 — silently turning the whole dataset into ignore
labels — so these files need a real 16-bit decode path.  This reader handles
exactly that case: non-interlaced, bit depth 16, gray/RGB/gray+alpha/RGBA.
"""

import struct
import zlib

import numpy as np

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # PNG color type -> sample count


def read_png16(path):
    """Decode a 16-bit PNG into uint16 [H, W] or [H, W, C]."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: %s" % path)
    pos, width, height, channels = 8, None, None, None
    idat = []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 16:
                raise ValueError("read_png16 expects bit depth 16, got %d "
                                 "(%s)" % (depth, path))
            if interlace:
                raise ValueError("interlaced PNG unsupported: %s" % path)
            if color not in _CHANNELS:
                raise ValueError("palette 16-bit PNG impossible: %s" % path)
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or height is None or channels is None or not idat:
        raise ValueError("truncated PNG: %s" % path)

    raw = zlib.decompress(b"".join(idat))
    bpp = channels * 2  # bytes per pixel
    stride = width * bpp
    if len(raw) < height * (stride + 1):
        raise ValueError("short IDAT stream: %s" % path)

    out = np.empty((height, stride), np.uint8)
    prev = np.zeros(stride, np.uint16)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, np.uint8, stride,
                            y * (stride + 1) + 1).astype(np.uint16)
        if ftype == 0:                                   # None
            cur = row
        elif ftype == 2:                                 # Up
            cur = (row + prev) & 0xFF
        else:
            # Sub/Average/Paeth depend on the previous PIXEL: sequential
            # per-byte scan (rare in practice for GT masks).  Python-int
            # arithmetic throughout: the Paeth predictor a + b - c must be
            # allowed to go negative (uint16 wrap-around picks the wrong
            # neighbour and corrupts every later byte of the row).
            cur = np.zeros(stride, np.uint16)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                else:
                    raise ValueError("bad PNG filter %d: %s" % (ftype, path))
                cur[i] = (int(row[i]) + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur

    arr = out.reshape(height, width, channels, 2)
    values = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]  # big-endian
    return values[..., 0] if channels == 1 else values
