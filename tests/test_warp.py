"""Warp engine parity vs torch F.affine_grid/F.grid_sample
(align_corners=False, zero padding) and affine forward/inverse consistency."""

import numpy as np
import pytest

import jax.numpy as jnp

from dasac_tpu.aug import affine as A
from dasac_tpu.aug.warp import affine_grid, grid_sample, warp_affine

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _rand_theta(n, seed=0, rot=True):
    rng = np.random.RandomState(seed)
    thetas = []
    for _ in range(n):
        s = rng.uniform(0.6, 1.6)
        a = rng.uniform(-0.4, 0.4) if rot else 0.0
        f = rng.choice([-1.0, 1.0])
        tx, ty = rng.uniform(-0.4, 0.4, 2)
        thetas.append([[f * s * np.cos(a), -s * np.sin(a), tx],
                       [s * np.sin(a), s * np.cos(a), ty]])
    return np.asarray(thetas, np.float32)


def test_affine_grid_matches_torch():
    theta = _rand_theta(3)
    ours = np.asarray(affine_grid(jnp.asarray(theta), 7, 11))
    ref = TF.affine_grid(torch.from_numpy(theta), (3, 1, 7, 11),
                         align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(mode):
    rng = np.random.RandomState(1)
    img = rng.rand(2, 16, 20, 3).astype(np.float32)
    theta = _rand_theta(2, seed=2)
    grid = TF.affine_grid(torch.from_numpy(theta), (2, 3, 16, 20),
                          align_corners=False)
    ref = TF.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), grid,
        mode=mode, padding_mode="zeros", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid.numpy()),
                                  mode=mode))
    if mode == "nearest":
        # rounding ties may differ at exact .5 boundaries; allow tiny count
        mismatch = (np.abs(ours - ref) > 1e-5).mean()
        assert mismatch < 0.01, mismatch
    else:
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_reference_affine_math_identity():
    """flip-only / identity params give the expected matrices."""
    crop = (64, 128)
    params = np.array([
        [0, 0, 0, 1, 1],     # identity
        [0, 0, 0, 1, -1],    # flip
    ], np.float32)
    aff = np.asarray(A.build_affine(params, crop))
    np.testing.assert_allclose(aff[0], [[1, 0, 0], [0, 1, 0]], atol=1e-6)
    np.testing.assert_allclose(aff[1], [[-1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_affine_inverse_is_matrix_inverse():
    """For alpha=0 (the pipeline's only case) affine_inv composes with affine
    to the identity (dataloader_target.py:248-262 math)."""
    rng = np.random.RandomState(3)
    n = 8
    params = np.stack([
        rng.uniform(-60, 60, n),            # dy
        rng.uniform(-120, 120, n),          # dx
        np.zeros(n),                        # alpha
        1.0 / rng.uniform(0.5, 1.2, n),     # recorded scale = 1/zoom
        rng.choice([-1.0, 1.0], n),         # flip
    ], axis=1).astype(np.float32)
    crop = (128, 256)
    aff = A.build_affine(params, crop)
    inv = A.build_affine_inv(aff, params, crop)
    prod = np.asarray(A.compose(aff, inv))
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (n, 1, 1))
    np.testing.assert_allclose(prod, ident, atol=1e-4)
    prod2 = np.asarray(A.compose(inv, aff))
    np.testing.assert_allclose(prod2, ident, atol=1e-4)


def test_warp_unwarp_roundtrip():
    """warp(unwarp(x)) ~= x on the interior (SURVEY.md §7 hard part #1)."""
    # smooth image: double bilinear resampling preserves low frequencies
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    img = np.stack([np.sin(4 * xx + 2 * yy), xx * yy], -1)[None]

    params = np.array([[10.0, -6.0, 0.0, 1.0 / 0.8, -1.0]], np.float32)
    aff = A.build_affine(params, (64, 64))
    inv = A.build_affine_inv(aff, params, (64, 64))
    view = warp_affine(jnp.asarray(img), inv)          # generate the view
    back = warp_affine(view, aff)                      # align to reference
    ours = np.asarray(back)[0]
    # compare on the central region (borders lose content to zoom/crop)
    c_ref = img[0][16:48, 16:48]
    c_back = ours[16:48, 16:48]
    assert np.abs(c_ref - c_back).mean() < 0.05


def test_valid_mask_affine_equals_ones_warp():
    """The O(H+W) outer-product mask must reproduce nearest-warping a ones
    tensor exactly (same rounding, same bounds) for axis-aligned thetas."""
    import numpy as np
    from dasac_tpu.aug.warp import valid_mask_affine, warp_affine

    rng = np.random.RandomState(3)
    t = 6
    theta = np.zeros((t, 2, 3), np.float32)
    theta[:, 0, 0] = rng.uniform(-2.0, 2.0, t)  # incl. flips + zoom-out
    theta[:, 1, 1] = rng.uniform(0.3, 2.0, t)
    theta[:, 0, 2] = rng.uniform(-1.0, 1.0, t)
    theta[:, 1, 2] = rng.uniform(-1.0, 1.0, t)
    h, w = 17, 23
    ones = jnp.ones((t, h, w, 1), jnp.float32)
    ref = np.asarray(
        warp_affine(ones, jnp.asarray(theta), mode="nearest")[..., 0]) > 0.5
    got = np.asarray(valid_mask_affine(jnp.asarray(theta), (h, w), (h, w)))
    np.testing.assert_array_equal(got, ref)
