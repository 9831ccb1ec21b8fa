"""Export a dasac_tpu checkpoint back to the reference's .pth snapshot format.

The inverse of dasac_tpu/nn/convert.py: flax variables (NHWC/HWIO) are mapped
back to the reference's torch state_dict keys (``module.backbone.*`` student,
``module.slow_net.*`` EMA teacher, ``module.running_conf`` / ``module.
slow_init`` buffers — reference models/sac.py:41-63) and wrapped in the
reference's snapshot container ``{"model", "opt", "score", "epoch"}``
(reference utils/checkpoints.py:68-71, ``opt`` left empty).  A model trained
here can then run inside the original torch stack (its infer_val.py loads
snapshots with strict=False) — full interop both ways.

Usage:
  python -m dasac_tpu.tools.export_torch --resume snapshots/.../best.ckpt \
      --arch deeplabv2_resnet101 --out model.pth
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


def export_snapshot(state, arch, score=0.0, epoch=0):
    """TrainState -> the reference's snapshot dict (student + teacher +
    algorithm buffers, DDP 'module.' prefix included)."""
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
    return {"model": model, "opt": {}, "score": float(score),
            "epoch": int(epoch)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--resume", required=True, help="dasac_tpu .ckpt path")
    ap.add_argument("--arch", required=True,
                    choices=["deeplabv2_resnet101", "deeplabv2_vgg16_bn",
                             "fcn_vgg16_bn"])
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--num-classes", type=int, default=19)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from dasac_tpu.core.state import create_train_state
    from dasac_tpu.nn.factory import build_model
    from dasac_tpu.train.checkpoints import Checkpointer, NullTx

    model = build_model(args.arch, args.num_classes, dtype=jnp.float32)
    state = create_train_state(model, NullTx(), args.num_classes,
                               (64, 64, 3), rng=jax.random.PRNGKey(0))
    ckpt = Checkpointer(None)
    ckpt.arch = args.arch
    state, epoch, score = ckpt.load(args.resume, state)
    snap = export_snapshot(state, args.arch, score=score or 0.0,
                           epoch=epoch or 0)
    torch.save(snap, args.out)
    n = sum(k.startswith("module.backbone.") for k in snap["model"])
    print("exported %s (%d tensors/net + buffers) -> %s"
          % (args.arch, n, args.out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
