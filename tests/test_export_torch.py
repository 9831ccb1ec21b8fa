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


def test_export_momentum_resumes_reference_optimizer():
    """The exported 'opt' field is a positional torch SGD state_dict the
    reference's training resume (utils/checkpoints.py:54 ->
    opt.load_state_dict) accepts: 4 param groups in BaseNet.parameter_groups
    order with OUR momentum buffers, which then drive a reference-side
    optimizer step."""
    from dasac_tpu.train.optim import build_optimizer
    from dasac_tpu.utils.collections import AttrDict

    arch = "deeplabv2_vgg16_bn"
    mcfg = AttrDict()
    for k, v in dict(LR=1e-3, WEIGHT_DECAY=5e-4, MOMENTUM=0.9, OPT="SGD",
                     OPT_NESTEROV=False, BETA1=0.9).items():
        mcfg[k] = v

    model, state = _rand_state(arch)
    tx, _ = build_optimizer(mcfg, arch, state.params)
    opt_state = tx.init(state.params)
    # two dummy updates so every momentum trace is nonzero and distinct
    params = state.params
    for seed in (0, 1):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        grads = treedef.unflatten([
            0.1 * jax.random.normal(kk, l.shape, l.dtype)
            for l, kk in zip(leaves, keys)])
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
    state = state.replace(params=params, opt_state=opt_state)

    snap = export_torch.export_snapshot(state, arch, model_cfg=mcfg)
    opt_sd = snap["opt"]
    assert len(opt_sd["param_groups"]) == 4
    n = sum(len(g["params"]) for g in opt_sd["param_groups"])
    assert n == len(opt_sd["state"]) == len(
        jax.tree.leaves(state.params))
    assert opt_sd["param_groups"][1]["weight_decay"] == 0.0  # bias group
    assert opt_sd["param_groups"][2]["lr"] == pytest.approx(1e-2)  # 10x

    # reference side: model + optimizer exactly as train.py builds them
    ref = _build_ref(arch)
    student, _, _ = convert.split_sac_snapshot(snap["model"])
    ref.load_state_dict(student, strict=True)
    groups = ref.parameter_groups(mcfg.LR, mcfg.WEIGHT_DECAY)
    opt = torch.optim.SGD(groups, lr=mcfg.LR, momentum=mcfg.MOMENTUM,
                          nesterov=mcfg.OPT_NESTEROV,
                          weight_decay=mcfg.WEIGHT_DECAY)
    opt.load_state_dict(opt_sd)  # the exact reference resume call

    # our momentum buffer landed on the right torch parameter
    kmap = convert.key_map(arch, "reference")
    named = dict(ref.named_parameters())
    checked = 0
    for gi, group in enumerate(opt.param_groups):
        for p in group["params"][:2]:
            buf = opt.state[p]["momentum_buffer"].numpy()
            tkey = next(k for k, v in named.items() if v is p)
            coll, path, kind = kmap[tkey]
            ours = np.asarray(export_torch._extract_momentum(
                state.opt_state)["/".join(path)], np.float32)
            if kind == "conv":
                ours = np.transpose(ours, (3, 2, 0, 1))
            np.testing.assert_allclose(buf, ours, rtol=1e-6, atol=1e-7,
                                       err_msg=tkey)
            checked += 1
    assert checked >= 8

    # and the buffers drive a reference-side step (zero grads: the update
    # is pure momentum decay, so params must move)
    before = {k: v.detach().clone() for k, v in named.items()}
    for p in ref.parameters():
        p.grad = torch.zeros_like(p)
    opt.step()
    moved = [k for k, v in named.items()
             if not torch.equal(before[k], v.detach())]
    assert moved, "momentum buffers did not drive the resume step"


def test_momentum_import_roundtrip_through_pth(tmp_path):
    """The OTHER interop direction: Checkpointer.load of a reference-format
    .pth carrying an 'opt' state_dict restores every SGD momentum buffer
    into our optax traces (reference-side training resumes into OUR stack
    without restarting momentum)."""
    import optax

    from dasac_tpu.train.checkpoints import Checkpointer
    from dasac_tpu.train.optim import build_optimizer
    from dasac_tpu.utils.collections import AttrDict

    arch = "deeplabv2_vgg16_bn"
    mcfg = AttrDict()
    for k, v in dict(LR=1e-3, WEIGHT_DECAY=5e-4, MOMENTUM=0.9, OPT="SGD",
                     OPT_NESTEROV=False, BETA1=0.9).items():
        mcfg[k] = v

    model, state = _rand_state(arch)
    tx, _ = build_optimizer(mcfg, arch, state.params)
    opt_state = tx.init(state.params)
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    grads = treedef.unflatten([
        0.1 * jax.random.normal(kk, l.shape, l.dtype)
        for l, kk in zip(leaves, keys)])
    _, opt_state = tx.update(grads, opt_state, state.params)
    state = state.replace(opt_state=opt_state)

    snap = export_torch.export_snapshot(state, arch, model_cfg=mcfg)
    pth = str(tmp_path / "resume.pth")
    torch.save(snap, pth)

    # fresh template with a real optimizer (zero-init traces)
    template = create_train_state(model, tx, 19, (32, 48, 3),
                                  rng=jax.random.PRNGKey(11))
    ck = Checkpointer(str(tmp_path), max_n=1)
    ck.arch = arch
    loaded, _, _ = ck.load(pth, template)

    want = export_torch._extract_momentum(state.opt_state)
    got = export_torch._extract_momentum(loaded.opt_state)
    assert set(got) == set(want) and want
    nonzero = 0
    for key in want:
        np.testing.assert_allclose(np.asarray(got[key], np.float32),
                                   np.asarray(want[key], np.float32),
                                   rtol=1e-6, atol=1e-7, err_msg=key)
        nonzero += bool(np.abs(np.asarray(want[key])).max() > 0)
    assert nonzero == len(want)  # every trace moved, none left at init

    # a template WITHOUT an optimizer (inference) must still load cleanly
    infer_template = create_train_state(model, NullTx(), 19, (32, 48, 3),
                                        rng=jax.random.PRNGKey(12))
    loaded2, _, _ = ck.load(pth, infer_template)
    assert len(jax.tree.leaves(loaded2.opt_state)) == 0
