"""Functional-op parity tests against torch (CPU oracle).

SURVEY.md §4: numeric-parity tests with explicit tolerance since bilinear
conventions differ between frameworks.
"""

import numpy as np
import pytest

from dasac_tpu.nn import functional as F

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (32, 32)),
    ((65, 129), (512, 1024)),
    ((7, 5), (20, 11)),
    ((16, 16), (8, 8)),
])
def test_resize_align_corners_matches_torch(in_hw, out_hw):
    x = _rand((2, *in_hw, 3))
    ours = np.asarray(F.resize_bilinear_align_corners(x, out_hw))
    ref = TF.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), out_hw,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("hw", [(256, 256), (256, 512), (255, 257), (129, 65)])
def test_max_pool_ceil_matches_torch(hw):
    x = _rand((2, *hw, 4), seed=1)
    ours = np.asarray(F.max_pool_ceil(x, 3, 2, 1))
    ref = TF.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1, ceil_mode=True
    ).permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=0)


def test_max_pool_floor_matches_torch():
    x = _rand((1, 64, 64, 8), seed=2)
    ours = np.asarray(F.max_pool(x, 2, 2))
    ref = TF.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=0)


def test_resize_nearest_shapes():
    x = _rand((1, 10, 10, 1))
    y = np.asarray(F.resize_nearest(x, (5, 7)))
    assert y.shape == (1, 5, 7, 1)
    # identity when size matches
    z = np.asarray(F.resize_nearest(x, (10, 10)))
    np.testing.assert_array_equal(z, x)


def test_resize_matmul_matches_gather_and_torch():
    import jax.numpy as jnp
    """The MXU (interpolation-matrix) resize formulation is numerically the
    gather+lerp path, which itself matches torch align_corners=True."""
    import pytest

    from dasac_tpu.nn import functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 13, 17, 5).astype(np.float32)
    assert F.RESIZE_METHOD == "matmul"  # adopted default (579->422 ms/step)
    got = np.asarray(F.resize_bilinear_align_corners(jnp.asarray(x),
                                                     (104, 136)))
    try:
        F.RESIZE_METHOD = "gather"
        ref = np.asarray(F.resize_bilinear_align_corners(jnp.asarray(x),
                                                         (104, 136)))
    finally:
        F.RESIZE_METHOD = "matmul"
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    torch = pytest.importorskip("torch")
    import torch.nn.functional as TF

    t = TF.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                       (104, 136), mode="bilinear",
                       align_corners=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, t, atol=2e-4, rtol=1e-4)
