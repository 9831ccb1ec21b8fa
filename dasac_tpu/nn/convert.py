"""Torch checkpoint -> flax variables converter.

Handles three checkpoint families (SURVEY.md §7 build step 2):
  * torchvision ImageNet backbones (``resnet101-5d3b4d8f.pth``,
    ``vgg16_bn-6c64b313.pth``) — reference MODEL.INIT_MODEL;
  * reference released snapshots (``{"model": state_dict, "opt": ..}`` with
    ``module.backbone.*`` / ``module.slow_net.*`` prefixes and the
    ``running_conf`` / ``slow_init`` buffers, utils/checkpoints.py:62-74);
  * either of the above with missing keys -> strict=False semantics (keep
    the template's initialization for unmatched params, like
    ``load_state_dict(strict=False)`` at infer_val.py:143).

Layout: torch conv OIHW -> flax HWIO; BN weight/bias -> scale/bias in
"params", running_mean/var -> mean/var in "batch_stats".
"""

import numpy as np


def load_torch_file(path):
    """Read a .pth file into {key: np.ndarray} (torch CPU only)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data and isinstance(data["model"], dict):
        # reference snapshot container {model, opt, score, epoch}
        out = {"model": {k: _np(v) for k, v in data["model"].items()}}
        for k in ("score", "epoch"):
            if k in data:
                out[k] = data[k]
        opt = data.get("opt")
        if isinstance(opt, dict) and opt.get("state"):
            # torch.optim state_dict: positional param ids -> buffer dicts
            out["opt"] = {
                "state": {int(i): {kk: _np(vv) for kk, vv in s.items()}
                          for i, s in opt["state"].items()},
                "param_groups": opt.get("param_groups", []),
            }
        return out
    return {k: _np(v) for k, v in data.items()}


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


# ---------------------------------------------------------------------------
# name mapping: torch key -> (collection, flax path tuple)
# ---------------------------------------------------------------------------

_BN_PARTS = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _emit_conv(key_base, path):
    return {
        key_base + ".weight": ("params", path + ("kernel",), "conv"),
        key_base + ".bias": ("params", path + ("bias",), "flat"),
    }


def _emit_bn(key_base, path):
    out = {}
    for torch_part, (coll, flax_part) in _BN_PARTS.items():
        out[key_base + "." + torch_part] = (coll, path + (flax_part,), "flat")
    return out


def _resnet_map(torch_style):
    """torch key map for the ResNet-101 trunk + ASPP head.

    ``torch_style``: 'torchvision' (plain resnet101 keys) or 'reference'
    (DeepLabV2_ResNet101: trunk under ``model.``, ASPP = ``model.layer5``).
    """
    prefix = "model." if torch_style == "reference" else ""
    m = {}
    m.update(_emit_conv(prefix + "conv1", ("backbone", "conv1")))
    m.pop(prefix + "conv1.bias")  # no bias on trunk convs
    m.update(_emit_bn(prefix + "bn1", ("backbone", "bn1")))
    for li, n_blocks in enumerate((3, 4, 23, 3), start=1):
        for bi in range(n_blocks):
            tb = "{}layer{}.{}".format(prefix, li, bi)
            fb = ("backbone", "layer{}_{}".format(li, bi))
            for ci in (1, 2, 3):
                m["{}.conv{}.weight".format(tb, ci)] = (
                    "params", fb + ("conv{}".format(ci), "kernel"), "conv")
                m.update(_emit_bn("{}.bn{}".format(tb, ci), fb + ("bn{}".format(ci),)))
            m["{}.downsample.0.weight".format(tb)] = (
                "params", fb + ("downsample_conv", "kernel"), "conv")
            m.update(_emit_bn("{}.downsample.1".format(tb), fb + ("downsample_bn",)))
    if torch_style == "reference":
        for i in range(4):
            m.update(_emit_conv("model.layer5.conv2d_list.{}".format(i),
                                ("aspp", "conv{}".format(i))))
    return m


# torchvision vgg16_bn conv/bn feature indices (pools at 6,13,23,33,43)
_VGG_CONV_IDX = (0, 3, 7, 10, 14, 17, 20, 24, 27, 30, 34, 37, 40)
_VGG_BN_IDX = tuple(i + 1 for i in _VGG_CONV_IDX)


def _vgg_deeplab_map(torch_style):
    """Key map for DeepLabv2/VGG-16.

    torchvision: ``features.<orig_idx>``.  reference: pools 33/43 removed so
    original indices >33 shift down by one; fc6/fc7 appended at sequential
    indices 42/44 (models/deeplabv2.py:253-267).
    """
    m = {}
    for ci in _VGG_CONV_IDX:
        bi = ci + 1
        if torch_style == "reference":
            tci = ci - 1 if ci > 33 else ci
            tbi = bi - 1 if bi > 33 else bi
        else:
            tci, tbi = ci, bi
        fpath = ("features", "features_{}".format(ci))
        fbn = ("features", "features_{}".format(bi))
        m.update(_emit_conv("features.{}".format(tci), fpath))
        m.update(_emit_bn("features.{}".format(tbi), fbn))
    if torch_style == "reference":
        m.update(_emit_conv("features.42", ("fc6",)))
        m.update(_emit_conv("features.44", ("fc7",)))
        for i in range(4):
            m.update(_emit_conv("classifier.conv2d_list.{}".format(i),
                                ("aspp", "conv{}".format(i))))
    return m


def _fcn_map(torch_style):
    """Key map for FCN8s/VGG-16 (models/fcn.py:26-95)."""
    m = {}
    for ci in _VGG_CONV_IDX:
        bi = ci + 1
        if torch_style == "reference":
            # blocks are Sequential SLICES (block1=[:24], block2=[24:34],
            # block3=[34:]); torch slicing preserves the original child
            # names, so keys keep their torchvision feature indices
            block = "block1" if ci < 24 else ("block2" if ci < 34 else "block3")
            tkey_c = "{}.{}".format(block, ci)
            tkey_b = "{}.{}".format(block, bi)
        else:
            block = "block1" if ci < 24 else ("block2" if ci < 34 else "block3")
            tkey_c = "features.{}".format(ci)
            tkey_b = "features.{}".format(bi)
        m.update(_emit_conv(tkey_c, (block, "features_{}".format(ci))))
        m.update(_emit_bn(tkey_b, (block, "features_{}".format(bi))))
    if torch_style == "reference":
        # vgg_head Sequential: 0 conv7x7, 1 bn, 4 conv1x1, 5 bn, 8 conv1x1
        m.update(_emit_conv("vgg_head.0", ("head_fc6",)))
        m.update(_emit_bn("vgg_head.1", ("head_bn6",)))
        m.update(_emit_conv("vgg_head.4", ("head_fc7",)))
        m.update(_emit_bn("vgg_head.5", ("head_bn7",)))
        m.update(_emit_conv("vgg_head.8", ("head_score",)))
        m.update(_emit_conv("score_pool4", ("score_pool4",)))
        m.update(_emit_conv("score_pool3", ("score_pool3",)))
    return m


def key_map(arch, torch_style):
    arch = arch.lower()
    if arch == "deeplabv2_resnet101":
        return _resnet_map(torch_style)
    if arch == "deeplabv2_vgg16_bn":
        return _vgg_deeplab_map(torch_style)
    if arch == "fcn_vgg16_bn":
        return _fcn_map(torch_style)
    raise ValueError(arch)


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        if p not in node:
            return False
        node = node[p]
    if path[-1] not in node:
        return False
    old = node[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            "Shape mismatch at {}: {} vs {}".format(path, old.shape, value.shape)
        )
    node[path[-1]] = value.astype(np.float32)
    return True


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(tree)


def apply_state_dict(variables, state_dict, arch, torch_style, verbose=False):
    """Merge a torch state_dict into flax ``variables`` (strict=False).

    Returns (new_variables, n_loaded, skipped_keys).
    """
    out = {c: _to_mutable(variables[c]) for c in variables}
    kmap = key_map(arch, torch_style)
    n_loaded, skipped = 0, []
    for tkey, val in state_dict.items():
        if tkey.endswith("num_batches_tracked"):
            continue
        if tkey not in kmap:
            skipped.append(tkey)
            continue
        coll, path, kind = kmap[tkey]
        arr = np.asarray(val)
        if kind == "conv":
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        if coll not in out:
            skipped.append(tkey)
            continue
        if _set_path(out[coll], path, arr):
            n_loaded += 1
        else:
            skipped.append(tkey)
    if verbose and skipped:
        print("convert: skipped {} keys (e.g. {})".format(
            len(skipped), skipped[:5]))
    return out, n_loaded, skipped


def split_sac_snapshot(model_state):
    """Split a reference SAC snapshot state_dict into student/teacher/buffers.

    Reference snapshots prefix with ``module.`` (DDP) and hold the student
    under ``backbone.`` and the teacher under ``slow_net.``
    (models/sac.py:41-63).  Baseline snapshots only have ``backbone.``.
    """
    student, teacher, extras = {}, {}, {}
    for k, v in model_state.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if k.startswith("backbone."):
            student[k[len("backbone."):]] = v
        elif k.startswith("slow_net."):
            teacher[k[len("slow_net."):]] = v
        elif k in ("running_conf", "slow_init"):
            extras[k] = np.asarray(v)
        else:
            extras.setdefault("_unmatched", []).append(k)
    return student, teacher, extras
