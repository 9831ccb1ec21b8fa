#!/usr/bin/env python
"""Inference + export entry point — same CLI as the reference infer_val.py:

    python infer_val.py --cfg configs/deeplabv2_resnet101_train.yaml \
        --dataloader cityscapes --resume snapshot.ckpt \
        --infer-list data/val_cityscapes.txt --mask-output-dir out/

Extensions over the reference's single-scale script: ``--set`` keys
VAL.SCALES / VAL.FLIP are not config keys; use --scales/--flip flags below.
"""

import argparse
import sys

import jax
import numpy as np

from dasac_tpu.core.config import cfg, cfg_from_file, cfg_from_list
from dasac_tpu.core.opts import add_global_arguments
from dasac_tpu.core.state import create_train_state
from dasac_tpu.data.category import get_class_names, get_num_classes
from dasac_tpu.infer.engine import InferDataset, run_inference
from dasac_tpu.nn.factory import build_model, compute_dtype
from dasac_tpu.train.checkpoints import Checkpointer, NullTx
from dasac_tpu.train.metrics import summarise


def main(argv=None):
    parser = argparse.ArgumentParser(description="dasac_tpu inference")
    add_global_arguments(parser)
    parser.add_argument("--scales", type=float, nargs="+", default=[1.0],
                        help="multi-scale factors (default: single scale)")
    parser.add_argument("--flip", action="store_true",
                        help="average with horizontally flipped forward")
    parser.add_argument("--fuse", choices=["full", "stride8"],
                        default="full",
                        help="where the scale/flip fusion happens: 'full' "
                             "= reference protocol (softmax+average at "
                             "native resolution per scale); 'stride8' = "
                             "average on the trunk's stride-8 grid and "
                             "upsample the fused probabilities ONCE "
                             "(faster; boundary-band-only deviation — "
                             "PARITY.md)")
    parser.add_argument("--save-raw", action="store_true")
    parser.add_argument("--vis", action="store_true")
    parser.add_argument("--teacher", action="store_true",
                        help="use the EMA teacher weights")
    parser.add_argument("--batch", type=int, default=0,
                        help="total images per step (default: one per chip); "
                             "values above the chip count put several images "
                             "on each chip — measured +21%% serving "
                             "throughput at batch 8 on one chip (PARITY.md)")
    parser.add_argument("--spatial", type=int, nargs="?", const=-1,
                        default=0,
                        help="shard the image height over the mesh instead "
                             "of the batch; bare flag (or -1) = all chips "
                             "cooperate per frame (lowest latency), N = a "
                             "combined (devices/N, N) mesh — N chips per "
                             "frame, devices/N frames in parallel")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    from dasac_tpu.core.cache import enable_compile_cache
    from dasac_tpu.nn import functional as nn_functional

    enable_compile_cache(cfg.TPU.COMPILE_CACHE)
    nn_functional.RESIZE_METHOD = cfg.TPU.RESIZE_METHOD

    num_classes = get_num_classes()
    model = build_model(cfg.MODEL.ARCH, num_classes,
                        dtype=compute_dtype(cfg.TPU))
    state = create_train_state(model, NullTx(), num_classes,
                               (*cfg.DATASET.CROP_SIZE, 3),
                               rng=jax.random.PRNGKey(args.seed or 0))
    assert args.resume, "--resume snapshot required"
    ckpt = Checkpointer(None)
    ckpt.arch = cfg.MODEL.ARCH
    state, _, _ = ckpt.load(args.resume, state)

    if args.teacher:
        variables = {"params": state.teacher_params,
                     "batch_stats": state.teacher_stats}
    else:
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    # --infer-list: a split name or a path like data/val_cityscapes.txt.
    # The list file resolves from the explicit path / DATASET.ROOT / the
    # bundled repo lists; image paths inside always resolve against
    # DATASET.ROOT (reference dataloader_infer.py:41-64 semantics)
    import os

    split = os.path.splitext(os.path.basename(args.infer_list))[0]
    list_dir = (os.path.dirname(args.infer_list)
                if os.path.isfile(args.infer_list) else None)
    dataset = InferDataset(cfg.DATASET.ROOT, split, list_dir=list_dir,
                           cityscapes_names=(args.dataloader == "cityscapes"))

    assert args.mask_output_dir, "--mask-output-dir required"
    conf = run_inference(
        model, variables, dataset, args.mask_output_dir,
        mean=tuple(cfg.DATASET.MEAN), std=tuple(cfg.DATASET.STD),
        num_classes=num_classes, scales=tuple(args.scales), flip=args.flip,
        save_raw=args.save_raw, vis=args.vis, workers=args.workers or 4,
        batch_size=args.batch or None, spatial=args.spatial, fuse=args.fuse)

    if conf is not None:
        iou, pr, re = summarise(conf)
        keep = [i for i in range(num_classes)
                if i not in set(cfg.VAL.IGNORE_CLASS)]
        for name, v in zip(get_class_names(), iou):
            print("IoU_{}: {:4.3f}".format(name, v))
        print("mIoU ({} classes): {:4.3f}".format(
            len(keep), float(np.mean(iou[keep]))))


if __name__ == "__main__":
    main()
