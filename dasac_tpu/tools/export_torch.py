"""Export a dasac_tpu checkpoint back to the reference's .pth snapshot format.

The inverse of dasac_tpu/nn/convert.py: flax variables (NHWC/HWIO) are mapped
back to the reference's torch state_dict keys (``module.backbone.*`` student,
``module.slow_net.*`` EMA teacher, ``module.running_conf`` / ``module.
slow_init`` buffers — reference models/sac.py:41-63) and wrapped in the
reference's snapshot container ``{"model", "opt", "score", "epoch"}``
(reference utils/checkpoints.py:68-71).  A model trained here can then run
inside the original torch stack — full interop both ways.

With ``--cfg`` the SGD momentum buffers are also exported into ``opt`` in
torch's positional param-group format (the exact 4-group member order of
``BaseNet.parameter_groups``, models/basenet.py:102-139), so the
reference-side TRAINING resume (``opt.load_state_dict(data["opt"])``,
utils/checkpoints.py:54) continues with our momentum instead of restarting
it.  Without ``--cfg`` (or with a non-momentum optimizer) ``opt`` stays
``{}`` — sufficient for reference-side inference (infer_val.py never builds
an optimizer) but NOT for reference-side training resume, whose
``load_state_dict`` rejects an empty dict.

Usage:
  python -m dasac_tpu.tools.export_torch --resume snapshots/.../best.ckpt \
      --arch deeplabv2_resnet101 --out model.pth \
      [--cfg configs/deeplabv2_resnet101_train.yaml]
"""

import argparse

import numpy as np

from dasac_tpu.nn import convert


def _get_path(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def export_variables(variables, arch):
    """flax {params, batch_stats} -> torch-keyed {str: torch.Tensor} for one
    network (no prefix), inverting convert.apply_state_dict exactly."""
    import torch

    kmap = convert.key_map(arch, "reference")
    sd, missing = {}, []
    for tkey, (coll, path, kind) in kmap.items():
        arr = _get_path(variables.get(coll, {}), path)
        if arr is None:
            # the key map enumerates a downsample projection for EVERY
            # residual block but only stride/width-changing blocks have one
            # (in torch and flax alike) — absent there means absent in the
            # reference too; the strict-load test guards against under-export
            if "downsample" not in tkey:
                missing.append(tkey)
            continue
        arr = np.asarray(arr, np.float32)
        if kind == "conv":
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        # always copy: jax buffers surface as non-writable numpy views
        sd[tkey] = torch.from_numpy(np.array(arr, np.float32, order="C"))
        if tkey.endswith(".running_mean"):
            # torch BN state_dicts carry a step counter; emit it so
            # load_state_dict(strict=True) round-trips cleanly
            sd[tkey[:-len("running_mean")] + "num_batches_tracked"] = (
                torch.tensor(0, dtype=torch.long))
    if missing:
        raise KeyError("flax variables missing %d mapped tensors (e.g. %s)"
                       % (len(missing), missing[:5]))
    return sd


def _extract_momentum(opt_state):
    """Collect every optax TraceState leaf keyed by the 'a/b/c' param path.

    Works through chain/masked/multi_transform wrappers: masked-out leaves
    are MaskedNode pytree nodes with no children, so flattening each trace
    yields only that group's real buffers; the union covers every param
    exactly once."""
    import jax
    import optax

    traces = []

    def walk(obj):
        if isinstance(obj, optax.TraceState):
            traces.append(obj.trace)
        elif isinstance(obj, (tuple, list)):
            for o in obj:
                walk(o)
        elif isinstance(obj, dict):
            for o in obj.values():
                walk(o)

    walk(opt_state)
    flat = {}
    for tr in traces:
        for path, leaf in jax.tree_util.tree_flatten_with_path(tr)[0]:
            flat["/".join(str(getattr(k, "key", k)) for k in path)] = leaf
    return flat


def export_opt_state(state, arch, model_cfg):
    """torch.optim.SGD ``state_dict()`` with our momentum buffers.

    Parameter ids are positional across the reference's 4 param groups
    (torch_param_groups.PARAM_GROUPS order); hyperparameters reproduce
    base_trainer.py:47-58 + basenet.py:105-110 (2x bias LR, decay-free
    biases).  Returns {} when the optimizer carries no momentum traces.
    """
    import torch

    from dasac_tpu.tools.torch_param_groups import PARAM_GROUPS
    from dasac_tpu.train.optim import GROUPS, lr_multipliers

    flat = _extract_momentum(state.opt_state)
    if not flat:
        return {}
    kmap = convert.key_map(arch, "reference")
    mults = lr_multipliers(arch)
    base_lr, wd = model_cfg.LR, model_cfg.WEIGHT_DECAY
    opt_st, param_groups, idx = {}, [], 0
    for gname, keys in zip(GROUPS, PARAM_GROUPS[arch]):
        ids = []
        for tkey in keys:
            coll, path, kind = kmap[tkey]
            leaf = flat.get("/".join(path))
            if leaf is None:
                raise KeyError("no momentum trace for %s (flax %r)"
                               % (tkey, path))
            arr = np.asarray(leaf, np.float32)
            if kind == "conv":
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
            opt_st[idx] = {"momentum_buffer": torch.from_numpy(
                np.array(arr, np.float32, order="C"))}
            ids.append(idx)
            idx += 1
        param_groups.append({
            "lr": base_lr * mults[gname],
            "momentum": float(model_cfg.MOMENTUM),
            "dampening": 0,
            "weight_decay": 0.0 if gname.endswith("_b") else wd,
            "nesterov": bool(model_cfg.OPT_NESTEROV),
            "maximize": False,
            "params": ids,
        })
    return {"state": opt_st, "param_groups": param_groups}


def import_opt_state(opt_dict, opt_state, arch):
    """The inverse of :func:`export_opt_state`: map a torch.optim.SGD
    ``state_dict()`` (positional param ids over the reference's 4 param
    groups) back into our optax TraceState momentum buffers, so a TRAINING
    resume from a reference ``.pth`` continues the reference's momentum
    instead of silently restarting it (reference utils/checkpoints.py:54).

    Returns (new_opt_state, n_imported).  Buffers torch never materialised
    (params untouched before the save) keep our zero-init trace; shape
    mismatches raise.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from dasac_tpu.tools.torch_param_groups import PARAM_GROUPS
    from dasac_tpu.train.optim import GROUPS

    kmap = convert.key_map(arch, "reference")
    st = opt_dict.get("state", {})
    groups = opt_dict.get("param_groups", [])
    # torch ids come from the saved param_groups when present (robust to
    # non-sequential ids); else fall back to the positional convention
    if groups:
        ids_per_group = [g["params"] for g in groups]
    else:
        ids_per_group, idx = [], 0
        for keys in PARAM_GROUPS[arch]:
            ids_per_group.append(list(range(idx, idx + len(keys))))
            idx += len(keys)
    if len(ids_per_group) != len(GROUPS):
        raise ValueError("expected %d param groups, snapshot has %d"
                         % (len(GROUPS), len(ids_per_group)))

    buf = {}
    for keys, ids in zip(PARAM_GROUPS[arch], ids_per_group):
        if len(keys) != len(ids):
            raise ValueError("param-group size mismatch: %d keys vs %d ids"
                             % (len(keys), len(ids)))
        for tkey, pid in zip(keys, ids):
            entry = st.get(pid, st.get(str(pid)))
            if not entry or "momentum_buffer" not in entry:
                continue
            _, path, kind = kmap[tkey]
            arr = np.asarray(entry["momentum_buffer"], np.float32)
            if kind == "conv":
                arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            buf["/".join(path)] = arr

    imported = []

    def _sub_trace(ts):
        def repl(path, leaf):
            key = "/".join(str(getattr(k, "key", k)) for k in path)
            arr = buf.get(key)
            if arr is None:
                return leaf
            if tuple(arr.shape) != tuple(leaf.shape):
                raise ValueError("momentum shape mismatch at %s: %s vs %s"
                                 % (key, arr.shape, leaf.shape))
            imported.append(key)
            return jnp.asarray(arr, leaf.dtype)

        return optax.TraceState(
            trace=jax.tree_util.tree_map_with_path(repl, ts.trace))

    new_opt = jax.tree_util.tree_map(
        lambda x: _sub_trace(x) if isinstance(x, optax.TraceState) else x,
        opt_state, is_leaf=lambda x: isinstance(x, optax.TraceState))
    return new_opt, len(imported)


def export_snapshot(state, arch, score=0.0, epoch=0, model_cfg=None):
    """TrainState -> the reference's snapshot dict (student + teacher +
    algorithm buffers, DDP 'module.' prefix included).  With ``model_cfg``
    (a MODEL config section) the SGD momentum buffers go into ``opt``."""
    import torch

    model = {}
    for prefix, params, stats in (
            ("module.backbone.", state.params, state.batch_stats),
            ("module.slow_net.", state.teacher_params, state.teacher_stats)):
        sd = export_variables({"params": params, "batch_stats": stats}, arch)
        model.update({prefix + k: v for k, v in sd.items()})
    model["module.running_conf"] = torch.from_numpy(
        np.array(state.running_conf, np.float32))
    model["module.slow_init"] = torch.from_numpy(
        np.array(state.slow_init, np.float32).reshape(1))
    opt = export_opt_state(state, arch, model_cfg) if model_cfg else {}
    return {"model": model, "opt": opt, "score": float(score),
            "epoch": int(epoch)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--resume", required=True, help="dasac_tpu .ckpt path")
    ap.add_argument("--arch", required=True,
                    choices=["deeplabv2_resnet101", "deeplabv2_vgg16_bn",
                             "fcn_vgg16_bn"])
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--cfg", default=None,
                    help="training config: rebuilds the optimizer so the "
                         "checkpoint's SGD momentum exports into 'opt'")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from dasac_tpu.core.state import create_train_state
    from dasac_tpu.nn.factory import build_model
    from dasac_tpu.train.checkpoints import Checkpointer, NullTx

    model = build_model(args.arch, args.num_classes, dtype=jnp.float32)
    model_cfg = None
    if args.cfg:
        from dasac_tpu.core.config import cfg, cfg_from_file

        cfg_from_file(args.cfg)
        model_cfg = cfg.MODEL
    state = create_train_state(model, NullTx(), args.num_classes,
                               (64, 64, 3), rng=jax.random.PRNGKey(0))
    if model_cfg is not None:
        from dasac_tpu.train.optim import build_optimizer

        tx, _ = build_optimizer(model_cfg, args.arch, state.params)
        state = state.replace(opt_state=tx.init(state.params))
    ckpt = Checkpointer(None)
    ckpt.arch = args.arch
    state, epoch, score = ckpt.load(args.resume, state)
    snap = export_snapshot(state, args.arch, score=score or 0.0,
                           epoch=epoch or 0, model_cfg=model_cfg)
    torch.save(snap, args.out)
    n = sum(k.startswith("module.backbone.") for k in snap["model"])
    print("exported %s (%d tensors/net + buffers) -> %s"
          % (args.arch, n, args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
