"""Augmentation engine tests: photometric kernel semantics and the
self-consistency guarantee of the fused geometric pipeline (SURVEY.md §7
hard part #1: the pipeline must be internally consistent — every view warps
back onto the reference frame)."""

import jax
import jax.numpy as jnp
import numpy as np

from dasac_tpu.aug import photometric as P
from dasac_tpu.aug import pipelines
from dasac_tpu.aug.warp import warp_affine


def _smooth_image(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        0.5 + 0.5 * np.sin(7 * xx / w + 3 * yy / h),
        xx / w,
        yy / h,
    ], -1)
    return img.astype(np.float32)


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------

def test_brightness_contrast_saturation_formulas():
    img = jnp.asarray(_smooth_image(8, 8)[None])
    np.testing.assert_allclose(
        np.asarray(P.adjust_brightness(img, 0.5)), np.asarray(img) * 0.5,
        atol=1e-6)
    gray = np.asarray(P.adjust_saturation(img, 0.0))
    assert np.allclose(gray[..., 0], gray[..., 1]) and np.allclose(
        gray[..., 1], gray[..., 2])
    # contrast 1.0 is identity
    np.testing.assert_allclose(
        np.asarray(P.adjust_contrast(img, 1.0)), np.asarray(img), atol=1e-6)


def test_hue_roundtrip():
    img = jnp.asarray(np.random.RandomState(0).rand(1, 6, 6, 3).astype(np.float32))
    shifted = P.adjust_hue(img, 0.25)
    back = P.adjust_hue(shifted, -0.25)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)


def test_color_jitter_p_gating():
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(np.random.RandomState(1).rand(16, 4, 4, 3).astype(np.float32))
    out_never = P.color_jitter(key, img, 0.4, 0.1, p=0.0)
    np.testing.assert_array_equal(np.asarray(out_never), np.asarray(img))
    out_always = P.color_jitter(key, img, 0.4, 0.1, p=1.0)
    changed = np.abs(np.asarray(out_always) - np.asarray(img)).max(axis=(1, 2, 3))
    assert (changed > 1e-4).all()


def test_grayscale_p():
    key = jax.random.PRNGKey(1)
    img = jnp.asarray(np.random.RandomState(2).rand(8, 4, 4, 3).astype(np.float32))
    out = np.asarray(P.random_grayscale(key, img, 1.0))
    assert np.allclose(out[..., 0], out[..., 1], atol=1e-6)
    out0 = np.asarray(P.random_grayscale(key, img, 0.0))
    np.testing.assert_array_equal(out0, np.asarray(img))


def test_gaussian_blur_properties():
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
    out = np.asarray(P.gaussian_blur_sigma(img, jnp.asarray([2.0, 0.01])))
    # large sigma smooths (variance shrinks), tiny sigma ~ identity
    assert out[0].var() < np.asarray(img)[0].var() * 0.5
    np.testing.assert_allclose(out[1], np.asarray(img)[1], atol=1e-3)
    # mean roughly preserved under edge padding
    assert abs(out[0].mean() - np.asarray(img)[0].mean()) < 0.02


def test_gaussian_kernel_is_normalized_gaussian():
    # blur an impulse; the response equals the normalized gaussian taps
    img = np.zeros((1, 1, 31, 1), np.float32)
    img[0, 0, 15, 0] = 1.0
    sigma = 1.3
    out = np.asarray(P.gaussian_blur_sigma(jnp.asarray(img), jnp.asarray([sigma])))
    taps = out[0, 0, 15 - 6:15 + 7, 0]
    offs = np.arange(-6, 7)
    expect = np.exp(-0.5 * (offs / sigma) ** 2)
    expect /= expect.sum()
    np.testing.assert_allclose(taps, expect, atol=1e-5)


def test_renorm_stats_formula():
    mean, std = pipelines.renorm_stats(
        (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
        (0.481, 0.479, 0.465), (0.243, 0.239, 0.237),
        (0.300, 0.344, 0.297), (0.175, 0.180, 0.177))
    m = 0.481 - 0.243 / 0.175 * (0.300 - 0.485)
    s = 0.243 * 0.229 / 0.175
    assert abs(mean[0] - m) < 1e-9 and abs(std[0] - s) < 1e-9


# ---------------------------------------------------------------------------
# target pipeline self-consistency
# ---------------------------------------------------------------------------

def _run_target(key, g=2, t=3, h=48, w=64, **kw):
    imgs = np.stack([(_smooth_image(h, w, i) * 255).astype(np.uint8)
                     for i in range(g)])
    labels = np.zeros((g, h, w), np.uint8)
    labels[:, h // 2:, :] = 7
    labels[:, :4, :] = 255
    return pipelines.augment_target_groups(
        key, jnp.asarray(imgs), jnp.asarray(labels), group_size=t, **kw), imgs


def test_target_views_shapes_and_padding():
    out, _ = _run_target(jax.random.PRNGKey(0), zoom=(1.05, 1.3))
    g, t, h, w = 2, 3, 48, 64
    assert out.frames_aug.shape == (g * t, h, w, 3)
    assert out.labels.shape == (g * t, h, w)
    assert out.affine.shape == (g * t, 2, 3)
    pad = np.asarray(out.padding)
    labels = np.asarray(out.labels)
    # zoom > 1 guarantees padded borders on every non-reference view
    assert pad.any()
    assert (labels[pad] == 255).all()
    clean = np.asarray(out.frames_clean)
    assert np.abs(clean[pad]).max() == 0.0
    # view 0 of each group: affine is flip-only (scale 1, no translation)
    for gi in range(g):
        a0 = np.asarray(out.affine[gi * t])
        assert abs(abs(a0[0, 0]) - 1.0) < 1e-5
        assert abs(a0[1, 1] - 1.0) < 1e-5
        np.testing.assert_allclose(a0[:, 2], 0.0, atol=1e-5)


def test_target_views_warp_back_consistent():
    """Aligning every clean view with its tracked affine reproduces the
    reference frame (view 0 aligned) on the common interior — the invariant
    the SAC refinement relies on."""
    out, _ = _run_target(jax.random.PRNGKey(7), zoom=(0.6, 1.2),
                         blur=False, jitter=0.0, greyscale=0.0)
    g, t, h, w = 2, 3, 48, 64
    clean = out.frames_clean
    aligned = warp_affine(clean, out.affine)
    valid = warp_affine(
        (~out.padding)[..., None].astype(jnp.float32), out.affine)
    aligned = np.asarray(aligned)
    valid = np.asarray(valid)[..., 0]
    for gi in range(g):
        ref = aligned[gi * t]
        ref_v = valid[gi * t]
        for vi in range(1, t):
            a = aligned[gi * t + vi]
            v = valid[gi * t + vi] * ref_v
            # interior: erode borders by ignoring a margin
            m = np.zeros((h, w), bool)
            m[6:-6, 6:-6] = True
            sel = (v > 0.99) & m
            assert sel.mean() > 0.2, "degenerate overlap"
            err = np.abs(a - ref)[sel].mean()
            assert err < 0.08, err


def test_target_photometric_only_on_student_copy():
    out, _ = _run_target(jax.random.PRNGKey(3), zoom=(0.5, 1.0),
                         blur=True, jitter=0.8, greyscale=0.9)
    aug = np.asarray(out.frames_aug)
    clean = np.asarray(out.frames_clean)
    assert np.abs(aug - clean).max() > 0.05  # photometric actually applied
    pad = np.asarray(out.padding)
    if pad.any():  # zoom<=1.0 rarely pads; check zeroing when it does
        assert np.abs(aug[pad]).max() == 0.0


# ---------------------------------------------------------------------------
# source pipeline
# ---------------------------------------------------------------------------

def test_source_batch_shapes_and_padding():
    rng = np.random.RandomState(5)
    imgs = (rng.rand(4, 64, 96, 3) * 255).astype(np.uint8)
    labels = rng.randint(0, 19, (4, 64, 96)).astype(np.uint8)
    frames, labels_o = pipelines.augment_source_batch(
        jax.random.PRNGKey(2), jnp.asarray(imgs), jnp.asarray(labels),
        crop_hw=(48, 48), scale_range=(0.4, 0.6))
    assert frames.shape == (4, 48, 48, 3)
    lo = np.asarray(labels_o)
    # sigma<=0.6 on a 64-tall image -> scaled height <=38 < 48 crop: the
    # border must be padded with ignore labels and zeroed pixels
    assert (lo == 255).any()
    f = np.asarray(frames)
    assert np.abs(f[lo == 255]).max() == 0.0
    # interior keeps real labels
    assert (lo != 255).any()


def test_source_scale_one_is_identity_crop():
    img = (_smooth_image(32, 32) * 255).astype(np.uint8)[None]
    labels = np.arange(32 * 32).reshape(1, 32, 32).astype(np.int32) % 19
    frames, labels_o = pipelines.augment_source_batch(
        jax.random.PRNGKey(4), jnp.asarray(img), jnp.asarray(labels),
        crop_hw=(32, 32), scale_range=(1.0, 1.0), hflip=False)
    np.testing.assert_array_equal(np.asarray(labels_o)[0], labels[0])
    expect = P.normalize(jnp.asarray(img[0], jnp.float32) / 255.0,
                         (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    np.testing.assert_allclose(np.asarray(frames[0]), np.asarray(expect),
                               atol=2e-2)


def test_masked_photometric_ignores_padding():
    """Contrast mean and blur must not be polluted by warp padding when a
    validity mask is provided (the reference's source chain blurs/jitters
    BEFORE RandCrop pads — dataloader_seg.py)."""
    import numpy as np
    from dasac_tpu.aug import photometric as P

    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 20, 3).astype(np.float32)
    valid = np.ones((2, 16, 20), bool)
    valid[:, :, 12:] = False          # right band = padding
    padded = img * valid[..., None]   # zeros in the pad, like the warp output

    # contrast: masked mean over the padded image == plain mean over the
    # valid crop alone
    f = 1.7
    crop = img[:, :, :12]
    want = np.asarray(P.adjust_contrast(jnp.asarray(crop), f))
    got = np.asarray(P.adjust_contrast(jnp.asarray(padded), f,
                                       jnp.asarray(valid)))[:, :, :12]
    np.testing.assert_allclose(got, want, atol=1e-6)

    # blur: away from the pad boundary the masked blur equals the plain blur
    # of the unpadded content; at the boundary it must NOT darken (the
    # unmasked blur bleeds black in)
    sigma = jnp.asarray([1.0, 1.5])
    plain_full = np.asarray(P.gaussian_blur_sigma(jnp.asarray(img), sigma))
    masked = np.asarray(P.gaussian_blur_sigma(jnp.asarray(padded), sigma,
                                              valid=jnp.asarray(valid)))
    unmasked = np.asarray(P.gaussian_blur_sigma(jnp.asarray(padded), sigma))
    interior = masked[:, :, :5]       # >6 taps away from the pad edge
    np.testing.assert_allclose(interior, plain_full[:, :, :5], atol=1e-5)
    # boundary column: unmasked blur is darkened by the zero pad; masked not
    edge_masked = masked[:, :, 11].mean()
    edge_unmasked = unmasked[:, :, 11].mean()
    assert edge_masked > edge_unmasked + 0.01
    # padding itself is left untouched (callers zero it after normalize)
    np.testing.assert_allclose(masked[:, :, 12:], padded[:, :, 12:],
                               atol=1e-6)
