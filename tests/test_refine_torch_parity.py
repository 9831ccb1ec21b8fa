"""Composed numeric parity: our refine() pipeline (upsample -> softmax ->
mask -> separable warp -> pool -> unwarp) against a literal torch
transcription of the reference's _refine/_avg_pool (models/sac.py:238-313)
on identical inputs — validates the whole chain including the separable
warp fast path and the align_corners mixture."""

import numpy as np
import pytest

import jax.numpy as jnp

from dasac_tpu.aug import affine as A
from dasac_tpu.sac.refine import refine

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _torch_refine(logits_bchw, T, aff, aff_inv, ignore_mask, h, w,
                  tolerance=0.1):
    """Oracle transcription of sac.py:271-313 (_refine with _avg_pool)."""
    logits = torch.from_numpy(logits_bchw)
    pred = TF.interpolate(logits, (h, w), mode="bilinear", align_corners=True)
    probs = TF.softmax(pred, 1)
    probs = probs * (1 - torch.from_numpy(ignore_mask)[:, None].float())

    aff_t = torch.from_numpy(aff)
    inv_t = torch.from_numpy(aff_inv)
    grid = TF.affine_grid(aff_t, probs.size(), align_corners=False)
    aligned = TF.grid_sample(probs, grid, align_corners=False)

    ones = torch.ones_like(aligned)
    grid_inv = TF.affine_grid(inv_t, ones.size(), align_corners=False)
    valid_aligned = TF.grid_sample(ones, grid_inv, align_corners=False)

    masked = aligned * valid_aligned
    B, C, H, W = masked.shape
    probs_T = masked.view(-1, T, C, H, W)
    total = probs_T.sum(1, keepdim=True)
    mass = total.sum(2, keepdim=True)
    mask = (mass > tolerance).float()
    avg = total / mass.clamp(1e-3)
    avg = avg.expand(-1, T, -1, -1, -1).reshape(B, C, H, W)
    mask = mask.expand(-1, T, -1, -1, -1).reshape(B, 1, H, W)

    refined = TF.grid_sample(avg, grid_inv, align_corners=False)
    refined_valid = TF.grid_sample(mask, grid_inv, align_corners=False)
    return (refined * refined_valid).numpy()


def test_refine_matches_torch_oracle():
    rng = np.random.RandomState(0)
    G, T, C = 2, 3, 6
    h, w = 48, 64
    B = G * T
    logits = rng.randn(B, h // 8, w // 8, C).astype(np.float32) * 2

    params = np.stack([
        rng.uniform(-8, 8, B), rng.uniform(-10, 10, B), np.zeros(B),
        1.0 / rng.uniform(0.6, 1.2, B), rng.choice([-1.0, 1.0], B),
    ], 1).astype(np.float32)
    params[::T] = [0, 0, 0, 1, 1]
    aff = np.asarray(A.build_affine(params, (h, w)))
    inv = np.asarray(A.build_affine_inv(jnp.asarray(aff), params, (h, w)))
    ignore = (rng.rand(B, h, w) < 0.1)

    ours, _ = refine(jnp.asarray(logits), jnp.asarray(aff), jnp.asarray(inv),
                     jnp.asarray(ignore), group_size=T)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    ref = _torch_refine(
        np.transpose(logits, (0, 3, 1, 2)).copy(), T, aff, inv,
        ignore.astype(np.float32), h, w)

    # identical up to bilinear boundary rounding
    diff = np.abs(ours - ref)
    assert diff.mean() < 2e-4, diff.mean()
    assert np.quantile(diff, 0.999) < 5e-3


def test_refine_minentropy_matches_selection():
    """min-entropy pool: identical affines, one sharp + one flat view —
    refined equals the sharp view's probs for both."""
    rng = np.random.RandomState(1)
    h, w, C = 16, 16, 4
    sharp = np.full((h // 8, w // 8, C), -5.0, np.float32)
    sharp[..., 1] = 5.0
    flat = np.zeros((h // 8, w // 8, C), np.float32)
    logits = np.stack([flat, sharp])
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    ignore = np.zeros((2, h, w), bool)
    refined, _ = refine(jnp.asarray(logits), jnp.asarray(ident),
                        jnp.asarray(ident), jnp.asarray(ignore),
                        group_size=2, pool="minentropy_pool")
    r = np.asarray(refined)
    assert (np.argmax(r, -1) == 1).all()
    assert r[..., 1].min() > 0.9


def test_refine_bf16_chain_pseudo_label_stability():
    """TPU.REFINE_DTYPE=bfloat16 runs the no-grad refine/pseudo-label chain
    in bf16; labels must agree with the f32 chain except at threshold
    boundaries (the adopt-criterion of the traffic experiment)."""
    import jax

    from dasac_tpu.sac import core as sac_core

    rng = np.random.RandomState(1)
    G, T, C = 2, 4, 19
    h, w = 64, 128
    B = G * T
    # confident teacher: peaked logits so pseudo-labels have real coverage
    peak_cls = rng.randint(0, C, (B, h // 8, w // 8))
    logits = np.full((B, h // 8, w // 8, C), -2.0, np.float32)
    np.put_along_axis(logits, peak_cls[..., None], 4.0, axis=-1)
    logits += 0.3 * rng.randn(*logits.shape).astype(np.float32)

    params = np.stack([
        rng.uniform(-8, 8, B), rng.uniform(-10, 10, B), np.zeros(B),
        1.0 / rng.uniform(0.6, 1.2, B), rng.choice([-1.0, 1.0], B),
    ], 1).astype(np.float32)
    params[::T] = [0, 0, 0, 1, 1]
    aff = np.asarray(A.build_affine(params, (h, w)))
    inv = np.asarray(A.build_affine_inv(jnp.asarray(aff), params, (h, w)))
    ignore = (rng.rand(B, h, w) < 0.05)
    rc = np.full(C, 0.3, np.float32)

    out = {}
    for tag, cd in (("f32", None), ("bf16", jnp.bfloat16)):
        lg = jnp.asarray(logits, jnp.bfloat16)
        refined, _ = refine(lg, jnp.asarray(aff), jnp.asarray(inv),
                            jnp.asarray(ignore), group_size=T,
                            compute_dtype=cd)
        pl, conf, _ = sac_core.pseudo_labels(
            refined, jnp.asarray(ignore), jnp.asarray(rc),
            upper=0.5, lower=0.05, threshold_beta=1e-3,
            compute_dtype=jnp.float32 if cd is None else cd)
        out[tag] = (np.asarray(pl), np.asarray(conf, np.float32))

    labeled = (out["f32"][0] != 255) | (out["bf16"][0] != 255)
    agree = np.mean(out["f32"][0][labeled] == out["bf16"][0][labeled])
    cover_f32 = np.mean(out["f32"][0] != 255)
    cover_bf16 = np.mean(out["bf16"][0] != 255)
    assert cover_f32 > 0.15, cover_f32  # the test batch is non-degenerate
    assert agree > 0.97, agree
    assert abs(cover_f32 - cover_bf16) < 0.02, (cover_f32, cover_bf16)
    assert np.abs(out["f32"][1] - out["bf16"][1]).mean() < 0.01


def test_refine_stride8_pseudo_label_stability():
    """TPU.REFINE_RES=stride8 runs the whole refine chain at the teacher's
    native stride-8 grid and upsamples the pooled result once; the teacher
    carries no sub-stride-8 information, so away from label boundaries the
    pseudo-labels AND confidences must agree with the full-resolution chain
    (the adopt-criterion of the traffic experiment).  Near boundaries the
    reordered bilinear smoothing moves threshold decisions — a band effect
    that shrinks as regions grow, so region size here is chosen realistic
    (8 stride-8 px ≈ 64 full-res px; Cityscapes regions are larger still)."""
    from dasac_tpu.sac import core as sac_core

    from dasac_tpu.aug.warp import valid_mask_affine, warp_affine

    rng = np.random.RandomState(2)
    G, T, C = 2, 4, 19
    h, w = 192, 384
    h8, w8 = h // 8, w // 8
    B = G * T

    # coherent groups, like real SAC views: one smooth peaked label map per
    # group; each view sees it through its own affine (the teacher's logits
    # on view v are the group map sampled at affine_inv, the same geometry
    # the refine chain inverts).  Independent per-view noise on top.
    peak_cls = rng.randint(0, C, (G, h8 // 8, w8 // 8))
    peak_cls = np.repeat(np.repeat(peak_cls, 8, 1), 8, 2)  # 8x8-s8 regions
    base = np.full((G, h8, w8, C), -2.0, np.float32)
    np.put_along_axis(base, peak_cls[..., None], 4.0, axis=-1)

    params = np.stack([
        rng.uniform(-20, 20, B), rng.uniform(-30, 30, B), np.zeros(B),
        1.0 / rng.uniform(0.6, 1.2, B), rng.choice([-1.0, 1.0], B),
    ], 1).astype(np.float32)
    params[::T] = [0, 0, 0, 1, 1]
    aff = np.asarray(A.build_affine(params, (h, w)))
    inv = np.asarray(A.build_affine_inv(jnp.asarray(aff), params, (h, w)))

    base_rep = np.repeat(base, T, axis=0)                       # [B,h8,w8,C]
    logits = np.array(warp_affine(jnp.asarray(base_rep), jnp.asarray(inv)))
    logits += 0.3 * rng.randn(*logits.shape).astype(np.float32)
    # augmentation padding = the view pixels the group map doesn't cover
    ignore = ~np.asarray(valid_mask_affine(jnp.asarray(inv), (h, w), (h, w)))
    rc = np.full(C, 0.3, np.float32)

    out = {}
    for res in ("full", "stride8"):
        refined, diags = refine(
            jnp.asarray(logits), jnp.asarray(aff), jnp.asarray(inv),
            jnp.asarray(ignore), group_size=T, res=res)
        assert refined.shape == (B, h, w, C), (res, refined.shape)
        pl, conf, _ = sac_core.pseudo_labels(
            refined, jnp.asarray(ignore), jnp.asarray(rc),
            upper=0.5, lower=0.05, threshold_beta=1e-3)
        # the running-conf statistic is a shape-agnostic spatial mean; it
        # must be close whether fed stride-8 or upsampled probabilities
        probs_avg = np.asarray(
            jnp.mean(diags["teacher_probs"].astype(jnp.float32)
                     .reshape(-1, C), axis=0))
        out[res] = (np.asarray(pl), np.asarray(conf, np.float32), probs_avg)

    plf, pls = out["full"][0], out["stride8"][0]
    cover_full = np.mean(plf != 255)
    cover_s8 = np.mean(pls != 255)
    assert cover_full > 0.5, cover_full
    assert abs(cover_full - cover_s8) < 0.03, (cover_full, cover_s8)
    # where BOTH paths commit to a class they must agree
    both = (plf != 255) & (pls != 255)
    assert np.mean(plf[both] == pls[both]) > 0.995
    # confidence (the focal-CE weight): small overall, and vanishing on
    # interiors (pixels whose label is constant in a (2r+1)^2 window) —
    # proving the disagreement is a boundary band, not a systematic shift
    dconf = np.abs(out["full"][1] - out["stride8"][1])
    assert dconf[both].mean() < 0.08, dconf[both].mean()

    def interior(pl, r):
        m = pl != 255
        eq = np.ones_like(m)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                eq &= np.roll(np.roll(pl, dy, 1), dx, 2) == pl
        return m & eq

    im = interior(plf, 8) & both
    assert im.mean() > 0.3, im.mean()
    assert np.mean(plf[im] == pls[im]) > 0.9999
    assert dconf[im].mean() < 0.03, dconf[im].mean()
    assert np.abs(out["full"][2] - out["stride8"][2]).max() < 0.02


def test_refine_stride8_pool_off_shape():
    """pool_on=False at stride8: masked per-view probs upsampled to full
    resolution (same contract as the full-res path)."""
    rng = np.random.RandomState(3)
    B, C, h, w = 2, 4, 64, 64
    logits = rng.randn(B, h // 8, w // 8, C).astype(np.float32)
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32),
                    (B, 1, 1))
    ignore = np.zeros((B, h, w), bool)
    ignore[:, :32] = True  # top padding band — constant region, exact at s8
    out, _ = refine(jnp.asarray(logits), jnp.asarray(ident),
                    jnp.asarray(ident), jnp.asarray(ignore),
                    group_size=B, pool_on=False, res="stride8")
    full, _ = refine(jnp.asarray(logits), jnp.asarray(ident),
                     jnp.asarray(ident), jnp.asarray(ignore),
                     group_size=B, pool_on=False, res="full")
    assert out.shape == (B, h, w, C)
    o = np.asarray(out)
    # the padded band stays zero after the upsample, up to the bilinear
    # support of the last masked stride-8 sample row (align_corners rows sit
    # at i*(h-1)/(h8-1) = 0,9,18,27,...; rows :32 mask samples 0..27)
    assert np.abs(o[:, :19]).max() < 1e-6
    # probabilities agree away from the mask-boundary band
    assert np.abs(o[:, 45:] - np.asarray(full)[:, 45:]).mean() < 0.05
