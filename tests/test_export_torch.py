"""Checkpoint export back to the reference .pth format
(dasac_tpu/tools/export_torch.py — the inverse of nn/convert.py).

Two guarantees:
  * the exported state_dict loads into the reference's OWN torch backbone
    with ``strict=True`` (exact key/shape compatibility, reference
    models/deeplabv2.py, models/fcn.py), and the torch forward reproduces
    the flax logits;
  * flax -> torch -> flax round-trips bit-exactly through the importer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dasac_tpu.core.state import create_train_state
from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model
from dasac_tpu.tools import export_torch
from dasac_tpu.train.checkpoints import NullTx

torch = pytest.importorskip("torch")

from tests.test_fullnet_torch_parity import _build_ref  # noqa: E402


def _rand_state(arch, num_classes=19, seed=3):
    """TrainState with non-trivial params/stats and distinct teacher."""
    model = build_model(arch, num_classes)
    state = create_train_state(model, NullTx(), num_classes, (32, 48, 3),
                               rng=jax.random.PRNGKey(seed))
    k = jax.random.PRNGKey(seed + 1)
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(k, len(leaves))
    params = treedef.unflatten([
        l + 0.01 * jax.random.normal(kk, l.shape, l.dtype)
        for l, kk in zip(leaves, keys)])
    teacher = jax.tree.map(lambda l: l * 0.5 + 0.1, params)
    return model, state.replace(
        params=params, teacher_params=teacher,
        running_conf=jnp.linspace(0.0, 1.0, num_classes),
        slow_init=jnp.asarray(1.0))


@pytest.mark.parametrize("arch", [
    "deeplabv2_resnet101", "fcn_vgg16_bn",
])
def test_export_strict_loads_into_reference_model(arch):
    model, state = _rand_state(arch)
    snap = export_torch.export_snapshot(state, arch, score=0.5, epoch=7)
    assert set(snap) == {"model", "opt", "score", "epoch"}

    student, teacher, extras = convert.split_sac_snapshot(snap["model"])
    np.testing.assert_allclose(extras["running_conf"],
                               np.asarray(state.running_conf))
    assert "_unmatched" not in extras

    ref = _build_ref(arch)
    ref.load_state_dict(student, strict=True)  # exact keys, exact shapes
    ref.eval()

    # the reference network must reproduce OUR logits from the export
    # (64x96: FCN8s skip fusion needs pool-aligned sizes)
    hw = (64, 96)
    x = np.random.RandomState(0).randn(1, *hw, 3).astype(np.float32)
    with torch.no_grad():
        t_logits, _ = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits, _ = model.apply(variables, jnp.asarray(x), train=False,
                            update_stats=False)
    np.testing.assert_allclose(np.transpose(np.asarray(t_logits),
                                            (0, 2, 3, 1)),
                               np.asarray(logits, np.float32),
                               rtol=1e-4, atol=1e-4)

    # teacher exports separately and differs from the student
    ref.load_state_dict(teacher, strict=True)
    assert any(not np.array_equal(student[k], teacher[k]) for k in student
               if student[k].dtype.is_floating_point)


def test_export_import_roundtrip_bit_exact():
    arch = "deeplabv2_vgg16_bn"
    model, state = _rand_state(arch)
    sd = export_torch.export_variables(
        {"params": state.params, "batch_stats": state.batch_stats}, arch)

    fresh = build_model(arch, 19)
    variables = fresh.init({"params": jax.random.PRNGKey(9)},
                           jnp.zeros((1, 32, 48, 3)), train=False,
                           update_stats=False)
    merged, n_loaded, skipped = convert.apply_state_dict(
        dict(variables), {k: v.numpy() for k, v in sd.items()},
        arch, "reference")
    real = [k for k in skipped if not k.endswith("num_batches_tracked")]
    assert not real, real
    for coll in ("params", "batch_stats"):
        got = jax.tree_util.tree_leaves_with_path(merged[coll])
        want = {jax.tree_util.keystr(p): l for p, l in
                jax.tree_util.tree_leaves_with_path(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}[coll])}
        assert got and len(got) == len(want)
        for path, leaf in got:
            np.testing.assert_array_equal(
                np.asarray(leaf, np.float32),
                np.asarray(want[jax.tree_util.keystr(path)], np.float32),
                err_msg=str(path))
