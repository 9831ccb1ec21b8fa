"""Native C++ decoder tests: PNG roundtrip, PIL resize parity, error paths,
and host_loader integration."""

import os

import numpy as np
import pytest
from PIL import Image

from dasac_tpu.data import host_loader, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


@pytest.fixture()
def pngs(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
    mask = rng.randint(0, 19, (40, 56)).astype(np.uint8)
    ip = str(tmp_path / "img.png")
    mp = str(tmp_path / "mask.png")
    Image.fromarray(img).save(ip)
    Image.fromarray(mask).save(mp)
    return ip, mp, img, mask


def test_exact_roundtrip(pngs):
    ip, mp, img, mask = pngs
    ni, nm = native.decode_pair(ip, mp, (40, 56))
    np.testing.assert_array_equal(ni, img)
    np.testing.assert_array_equal(nm, mask)


def test_resize_close_to_pil(pngs):
    ip, mp, img, mask = pngs
    ni, nm = native.decode_pair(ip, mp, (20, 28))
    pi = np.asarray(Image.fromarray(img).resize((28, 20), Image.BILINEAR))
    assert np.abs(ni.astype(int) - pi.astype(int)).mean() < 1.5
    pm = np.asarray(Image.fromarray(mask).resize((28, 20), Image.NEAREST))
    np.testing.assert_array_equal(nm, pm)


def test_missing_mask_fills_ignore(pngs):
    ip, _, _, _ = pngs
    _, nm = native.decode_pair(ip, None, (40, 56))
    assert (nm == 255).all()


def test_batch_with_failure(pngs, tmp_path):
    ip, mp, _, _ = pngs
    imgs, masks, status = native.decode_batch(
        [ip, str(tmp_path / "missing.png")], [mp, None], (40, 56), threads=2)
    assert status.tolist() == [0, -1]
    assert imgs.shape == (2, 40, 56, 3)


def test_png_info(pngs):
    ip, _, _, _ = pngs
    assert native.png_info(ip) == (40, 56)


def test_host_loader_uses_native(pngs):
    ip, mp, img, mask = pngs
    ds = host_loader.SegDataset([ip], [mp], (40, 56), mode="resize")
    ni, nm = ds.load(0)
    np.testing.assert_array_equal(ni, img)
    np.testing.assert_array_equal(nm, mask)


def test_palette_png_mask(tmp_path):
    """Paletted label PNGs (our inference export format) decode to indices."""
    from dasac_tpu.data.category import train_palette

    mask = np.random.RandomState(1).randint(0, 19, (16, 16)).astype(np.uint8)
    p = Image.fromarray(mask, mode="P")
    p.putpalette(train_palette())
    fp = str(tmp_path / "pal.png")
    p.save(fp)
    img = (np.zeros((16, 16, 3))).astype(np.uint8)
    ip = str(tmp_path / "img.png")
    Image.fromarray(img).save(ip)
    _, nm = native.decode_pair(ip, fp, (16, 16))
    np.testing.assert_array_equal(nm, mask)


def test_fuzz_color_types_bit_exact(tmp_path):
    """Random sizes across all 8-bit PNG color types decode bit-exactly
    (vs PIL); truncated/garbage files are rejected, never crash."""
    rng = np.random.RandomState(0)
    for trial in range(25):
        h, w = rng.randint(1, 70), rng.randint(1, 70)
        kind = ["rgb", "gray", "rgba", "palette", "la"][trial % 5]
        if kind == "rgb":
            im = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
        elif kind == "gray":
            im = Image.fromarray((rng.rand(h, w) * 255).astype(np.uint8))
        elif kind == "rgba":
            im = Image.fromarray((rng.rand(h, w, 4) * 255).astype(np.uint8),
                                 "RGBA")
        elif kind == "la":
            im = Image.fromarray(
                (rng.rand(h, w) * 255).astype(np.uint8)).convert("LA")
        else:
            im = Image.fromarray(rng.randint(0, 19, (h, w)).astype(np.uint8),
                                 "P")
            pal = np.zeros(768, np.uint8)
            pal[:57] = rng.randint(0, 255, 57)
            im.putpalette(pal)
        p = str(tmp_path / "f{}.png".format(trial))
        im.save(p)
        out = native.decode_pair(p, None, (h, w))
        assert out is not None, (kind, h, w)
        np.testing.assert_array_equal(
            out[0], np.asarray(Image.open(p).convert("RGB")), err_msg=kind)

    trunc = str(tmp_path / "trunc.png")
    with open(p, "rb") as f:
        data = f.read()
    with open(trunc, "wb") as f:
        f.write(data[:30])
    assert native.decode_pair(trunc, None, (8, 8)) is None


def test_hostile_ihdr_dimensions_rejected(tmp_path):
    """A PNG claiming absurd dimensions (2^31 x 2^31) must be rejected by
    the bounds check, not abort via bad_alloc or overflow the unfilter
    buffers."""
    import struct
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    for w, h in [(2**31 - 1, 2**31 - 1), (2**16, 2**16), (40000, 2)]:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        body = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00" * 16))
                + chunk(b"IEND", b""))
        fp = str(tmp_path / "hostile_{}.png".format(w))
        with open(fp, "wb") as f:
            f.write(body)
        assert native.decode_pair(fp, None, (8, 8)) is None


def test_load_batch_matches_per_sample(pngs, tmp_path):
    """SegDataset.load_batch (C++ pool path) returns exactly what the
    per-sample load path returns, including padding slots and fallback
    samples."""
    ip, mp, img, mask = pngs
    # one non-PNG sample forces the PIL fallback inside a native batch
    jp = str(tmp_path / "j.jpg")
    Image.fromarray(np.full((20, 30, 3), 77, np.uint8)).save(jp)
    ds = host_loader.SegDataset([ip, jp], [mp, None], (40, 56), mode="resize")
    idxs = [0, -1, 1, 0]
    batch = ds.load_batch(idxs, pool=None, threads=2)
    assert len(batch) == 4
    for got, i in zip(batch, idxs):
        want = ds.load(i)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
