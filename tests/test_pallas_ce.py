"""Fused pallas CE kernel (ops/ce.py) vs the XLA formulation.

On CPU the kernel runs in pallas interpreter mode — the same kernel code
the TPU compiles.  Values must agree with sac/core._nll to f32 roundoff,
gradients included (the kernel recomputes softmax in backward instead of
saving the log-softmax map).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.ops.ce import nll_pallas
from dasac_tpu.sac import core as sac_core


def _rand_case(rng, shape, c, ignore_frac=0.2, dtype=jnp.float32):
    logits = jnp.asarray(rng.randn(*shape, c).astype(np.float32) * 3,
                         dtype=dtype)
    labels = rng.randint(0, c, shape).astype(np.int32)
    mask = rng.rand(*shape) < ignore_frac
    labels = jnp.asarray(np.where(mask, sac_core.IGNORE, labels))
    return logits, labels


@pytest.mark.parametrize("shape,c", [
    ((3, 7, 11), 19),      # single partial block
    ((2, 35, 31), 21),     # multi-block grid with partial tail (2170 rows)
])
def test_nll_forward_matches_xla(shape, c):
    rng = np.random.RandomState(0)
    logits, labels = _rand_case(rng, shape, c)
    ours = nll_pallas(logits, labels)
    ref, valid, _ = sac_core._nll(logits, labels)
    assert ours.shape == shape and ours.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # ignored pixels exactly zero
    assert np.all(np.asarray(ours)[~np.asarray(valid)] == 0.0)


def test_nll_gradient_matches_xla_f32():
    rng = np.random.RandomState(1)
    logits, labels = _rand_case(rng, (2, 9, 13), 19)
    w = jnp.asarray(rng.rand(2, 9, 13).astype(np.float32))

    def loss(impl):
        def f(x):
            nll, _, _ = sac_core._nll(x, labels, impl=impl)
            return jnp.mean(nll * w)
        return f

    v_p, g_p = jax.value_and_grad(loss("pallas"))(logits)
    v_x, g_x = jax.value_and_grad(loss("xla"))(logits)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-7)


def test_nll_bf16_logits_grad_dtype_and_values():
    rng = np.random.RandomState(2)
    logits, labels = _rand_case(rng, (2, 8, 16), 19, dtype=jnp.bfloat16)

    def f(impl):
        return lambda x: jnp.mean(sac_core._nll(x, labels, impl=impl)[0])

    v_p, g_p = jax.value_and_grad(f("pallas"))(logits)
    v_x, g_x = jax.value_and_grad(f("xla"))(logits)
    assert g_p.dtype == jnp.bfloat16 == g_x.dtype
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p, np.float32),
                               np.asarray(g_x, np.float32),
                               rtol=2e-2, atol=1e-6)


def test_all_ignored_is_zero_everywhere():
    rng = np.random.RandomState(3)
    logits, _ = _rand_case(rng, (1, 6, 10), 19)
    labels = jnp.full((1, 6, 10), sac_core.IGNORE, jnp.int32)
    nll = nll_pallas(logits, labels)
    assert np.all(np.asarray(nll) == 0.0)
    g = jax.grad(lambda x: jnp.sum(nll_pallas(x, labels)))(logits)
    assert np.all(np.asarray(g) == 0.0)


def test_cross_entropy_mean_impl_parity():
    rng = np.random.RandomState(4)
    logits, labels = _rand_case(rng, (2, 12, 20), 19)
    v_x, g_x = jax.value_and_grad(
        lambda x: sac_core.cross_entropy_mean(x, labels))(logits)
    v_p, g_p = jax.value_and_grad(
        lambda x: sac_core.cross_entropy_mean(x, labels, impl="pallas")
    )(logits)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("use_conf", [True, False])
def test_focal_ce_impl_parity(use_conf):
    rng = np.random.RandomState(5)
    logits, pseudo = _rand_case(rng, (4, 10, 14), 19)
    conf = jnp.asarray(rng.rand(4, 10, 14).astype(np.float32))
    running_conf = jnp.asarray(rng.rand(19).astype(np.float32))

    def f(impl):
        def loss(x):
            l, per_class = sac_core.focal_ce(
                x, pseudo, conf, running_conf, use_conf=use_conf, impl=impl)
            return l, per_class
        return loss

    (v_x, pc_x), g_x = jax.value_and_grad(f("xla"), has_aux=True)(logits)
    (v_p, pc_p), g_p = jax.value_and_grad(f("pallas"), has_aux=True)(logits)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pc_p), np.asarray(pc_x),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-8)


def test_pallas_rejects_nonf32_loss_dtype():
    """CE_IMPL=pallas + LOSS_DTYPE=bfloat16 must fail loud, not silently
    run the f32 kernel (the bf16-CE experiment would measure nothing)."""
    rng = np.random.RandomState(7)
    logits, labels = _rand_case(rng, (2, 5, 6), 19)
    with pytest.raises(ValueError, match="LOSS_DTYPE"):
        sac_core._nll(logits, labels, compute_dtype=jnp.bfloat16,
                      impl="pallas")
