"""16-bit PNG decoding for SYNTHIA ground truth (dasac_tpu/data/png16.py).

Pillow truncates 16-bit channels to the high byte, which maps every SYNTHIA
class id (1..22, stored as the low bits of channel 0) to 0/ignore — the
reader must recover the true 16-bit values."""

import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from dasac_tpu.data.id_mappers import SynthiaMapper, get_mapper
from dasac_tpu.data.png16 import read_png16


def _chunk(ctype, body):
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _write_png16(path, values, color_type=2, filters=None):
    """values uint16 [H, W, C]; per-row filter types (default all 0)."""
    h, w, c = values.shape
    filters = filters or [0] * h
    be = values.astype(">u2").tobytes()
    stride = w * c * 2
    bpp = c * 2
    raw = bytearray()
    prev = b"\x00" * stride
    for y in range(h):
        row = be[y * stride:(y + 1) * stride]
        f = filters[y]
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:  # Sub
            raw += bytes((row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                         for i in range(stride))
        elif f == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            raw += bytes((row[i] - ((row[i - bpp] if i >= bpp else 0)
                                    + prev[i]) // 2) & 0xFF
                         for i in range(stride))
        elif f == 4:  # Paeth
            raw += bytes((row[i] - _paeth(row[i - bpp] if i >= bpp else 0,
                                          prev[i],
                                          prev[i - bpp] if i >= bpp else 0))
                         & 0xFF for i in range(stride))
        else:
            raise NotImplementedError(f)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
                 + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                 + _chunk(b"IEND", b""))


def test_read_png16_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    vals = rng.randint(0, 2**16, (6, 5, 3)).astype(np.uint16)
    p = str(tmp_path / "m.png")
    _write_png16(p, vals, filters=[0, 2, 0, 2, 2, 0])
    got = read_png16(p)
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("ftype", [1, 3, 4])
def test_read_png16_roundtrip_pixel_filters(tmp_path, ftype):
    """Sub/Average/Paeth rows (regression: uint16 wrap-around in the Paeth
    predictor a + b - c corrupted decoded pixels, e.g. 0x2233 -> 0x2133)."""
    rng = np.random.RandomState(ftype)
    vals = rng.randint(0, 2**16, (7, 6, 3)).astype(np.uint16)
    p = str(tmp_path / "m.png")
    _write_png16(p, vals, filters=[0, ftype, ftype, 2, ftype, 1, ftype])
    np.testing.assert_array_equal(read_png16(p), vals)


def test_read_png16_paeth_wraparound_case(tmp_path):
    # a + b < c in byte space forces the predictor negative: the exact
    # pattern that wrapped under uint16 arithmetic and mis-picked a neighbour
    vals = np.array([[[0x0001], [0xFF00]],
                     [[0x2233], [0x0102]]], np.uint16)
    p = str(tmp_path / "m.png")
    _write_png16(p, vals, color_type=0, filters=[0, 4])
    np.testing.assert_array_equal(read_png16(p), vals[..., 0])


def test_read_png16_idat_before_ihdr_is_value_error(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n" + _chunk(b"IDAT", zlib.compress(b"\x00"))
                 + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated"):
        read_png16(p)


def test_synthia_mapper_reads_true_16bit_ids(tmp_path):
    # class ids 1..22 live in the 16-bit VALUE of channel 0; PIL's high-byte
    # truncation would read them all as 0 (-> 255/ignore after the LUT)
    ids = np.arange(1, 21).reshape(4, 5).astype(np.uint16)
    vals = np.stack([ids, ids * 0, ids * 0], -1)
    p = str(tmp_path / "gt.png")
    _write_png16(p, vals)

    # Pillow really does truncate (the bug this guards against)
    pil = np.asarray(Image.open(p).convert("RGB"))
    assert pil[..., 0].max() == 0

    raw = SynthiaMapper.read(p)
    np.testing.assert_array_equal(raw, ids.astype(np.uint8))
    train = get_mapper("synthia").remap(raw)
    assert (train != 255).sum() == (ids <= 21).sum() - (ids == 13).sum() \
        - (ids == 14).sum()  # parking/road-work map to ignore


def test_8bit_masks_still_use_pil(tmp_path):
    m = np.array([[3, 1], [16, 2]], np.uint8)
    p = str(tmp_path / "m8.png")
    Image.fromarray(m).save(p)
    np.testing.assert_array_equal(SynthiaMapper.read(p), m)
