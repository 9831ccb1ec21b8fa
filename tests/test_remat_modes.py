"""Remat modes are pure scheduling choices: gradients must be identical.

"none" keeps all activations, "block" checkpoints residual blocks / VGG
stage chunks (conv recompute in backward), "convs" saves tagged conv
outputs and recomputes only the frozen-BN/ReLU elementwise chain
(nn/resnet.remat_mode).  All three must produce bit-comparable losses and
gradients — remat never changes math, only what survives the forward pass.

Tolerances allow f32 recompute-reassociation roundoff: the rematerialized
backward fuses/reassociates differently, so deep first-layer grads can
accumulate ~1% relative noise in f32 (verified: with jax_enable_x64 the
three modes agree to f32-ULP level, so the f32 spread is pure roundoff).
A semantic bug (wrong/missing gradient term) differs at O(1) relative.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.nn.factory import build_model


def _loss_and_grads(arch, remat, x, labels, num_classes):
    model = build_model(arch, num_classes, dtype=jnp.float32, remat=remat)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           train=False, update_stats=False)

    def loss_fn(params):
        _, up = model.apply({"params": params,
                             "batch_stats": variables["batch_stats"]},
                            x, train=False, update_stats=False)
        logp = jax.nn.log_softmax(up, -1)
        onehot = jax.nn.one_hot(labels, num_classes)
        return -jnp.mean(jnp.sum(onehot * logp, -1))

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    return float(loss), grads


@pytest.mark.parametrize("arch", [
    "deeplabv2_resnet101", "deeplabv2_vgg16_bn", "fcn_vgg16_bn"])
def test_remat_modes_identical_grads(arch):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 5, (1, 48, 64)))

    base_loss, base_grads = _loss_and_grads(arch, "none", x, labels, 5)
    for mode in ("block", "convs"):
        loss, grads = _loss_and_grads(arch, mode, x, labels, 5)
        assert np.isclose(loss, base_loss, rtol=1e-5, atol=1e-7), mode
        flat_a = jax.tree_util.tree_leaves(base_grads)
        flat_b = jax.tree_util.tree_leaves(grads)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            denom = np.linalg.norm(a) + 1e-30
            rel_l2 = np.linalg.norm(a - b) / denom
            assert rel_l2 < 2e-2, "mode={} rel_l2={}".format(mode, rel_l2)


def test_remat_mode_rejects_unknown():
    from dasac_tpu.nn.resnet import remat_mode
    assert remat_mode(False) == "none"
    assert remat_mode(True) == "block"
    assert remat_mode("convs") == "convs"
    with pytest.raises(ValueError):
        remat_mode("everything")
