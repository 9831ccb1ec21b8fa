"""Optimizer with the reference's 4 learning-rate groups
(models/basenet.py:102-139): pretrained weights 1x, pretrained biases 2x (no
weight decay), from-scratch weights 10x, from-scratch biases 20x (no decay).

Implemented as one optax.multi_transform over a label pytree derived from the
param paths: top-level scopes in ``new_param_scopes(arch)`` are 'new'; leaf
names 'bias' are biases, 'kernel'/'scale' are weights (torch puts BN affine
weight in the weight group with decay — reproduced).
"""

import jax
import optax

from dasac_tpu.nn.factory import new_param_scopes

GROUPS = ("old_w", "old_b", "new_w", "new_b")


def param_labels(params, arch):
    new_scopes = set(new_param_scopes(arch))

    def label(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        is_new = top in new_scopes
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        is_bias = leaf_name == "bias"
        if is_new:
            return "new_b" if is_bias else "new_w"
        return "old_b" if is_bias else "old_w"

    return jax.tree_util.tree_map_with_path(label, params)


def lr_multipliers(arch):
    """(old_w, old_b, new_w, new_b) multipliers.

    All three reference archs use (1, 2, 10, 20) (deeplabv2.py:203-211,
    fcn.py:97-105); BaseNet's default (1,2,1,2) applies to none of them.
    """
    return {"old_w": 1.0, "old_b": 2.0, "new_w": 10.0, "new_b": 20.0}


def _sgd(lr, wd, momentum, nesterov):
    parts = []
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.sgd(lr, momentum=momentum, nesterov=nesterov))
    return optax.chain(*parts)


def _adam(lr, wd, beta1):
    parts = []
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(optax.adam(lr, b1=beta1))
    return optax.chain(*parts)


def build_optimizer(model_cfg, arch, params):
    """(tx, labels) from the MODEL config section (reference
    base_trainer.py:47-73 get_optim)."""
    base_lr = model_cfg.LR
    wd = model_cfg.WEIGHT_DECAY
    mults = lr_multipliers(arch)
    opt = model_cfg.OPT.lower()

    txs = {}
    for g in GROUPS:
        lr = base_lr * mults[g]
        g_wd = 0.0 if g.endswith("_b") else wd  # biases: no decay
        if opt == "sgd":
            txs[g] = _sgd(lr, g_wd, model_cfg.MOMENTUM, model_cfg.OPT_NESTEROV)
        elif opt == "adam":
            txs[g] = _adam(lr, g_wd, model_cfg.BETA1)
        elif hasattr(optax, opt):
            # generic-by-name fallback (reference base_trainer.py:66-70
            # resolves torch.optim by getattr the same way)
            parts = []
            if g_wd > 0:
                parts.append(optax.add_decayed_weights(g_wd))
            parts.append(getattr(optax, opt)(lr))
            txs[g] = optax.chain(*parts)
        else:
            raise ValueError("Unsupported optimizer: {}".format(model_cfg.OPT))

    labels = param_labels(params, arch)
    return optax.multi_transform(txs, labels), labels
