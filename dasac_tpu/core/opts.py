"""CLI arguments — same flag surface as the reference (opts.py:15-109) so
launch scripts carry over; GPU/dist flags are accepted and mapped to the
mesh (world-size/rank become mesh/process hints, NCCL backend is ignored).
"""

import argparse
import os


def add_global_arguments(parser):
    parser.add_argument("--snapshot-dir", type=str, default="./snapshots",
                        help="Where to save snapshots of the model.")
    parser.add_argument("--logdir", type=str, default="./logs",
                        help="Where to save log files of the model.")
    parser.add_argument("--exp", type=str, default="main",
                        help="ID of the experiment (multiple runs)")
    parser.add_argument("--resume", type=str, default=None,
                        help="Snapshot (.ckpt or reference .pth) to resume from")
    parser.add_argument("--run", type=str, default="run0", help="ID of the run")
    parser.add_argument("--mask-output-dir", type=str, default=None,
                        help="path where to save masks")
    parser.add_argument("--split", type=str, default=None,
                        help="[train|val|test] split to use")
    parser.add_argument("--workers", type=int, default=None, metavar="N",
                        help="host decode threads")
    parser.add_argument("--dataloader", type=str, default=None,
                        help="Specifies dataloader to use.")
    parser.add_argument("--infer-list", default="data/val_cityscapes.txt",
                        type=str)
    # distributed flags accepted for launch-script compatibility; the TPU
    # runtime derives parallelism from the mesh instead
    parser.add_argument("--world-size", default=-1, type=int)
    parser.add_argument("--dist-url", default="", type=str)
    parser.add_argument("--dist-backend", default="xla", type=str)
    parser.add_argument("--rank", default=0, type=int)
    parser.add_argument("--multiprocessing-distributed", action="store_true")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace into the logdir")
    parser.add_argument("--cfg", dest="cfg_file", required=True,
                        help="Config file for training (and optionally testing)")
    parser.add_argument("--set", dest="set_cfgs", default=[], nargs="+",
                        help="Set config keys: KEY VALUE [KEY VALUE ...]")


def get_arguments(args_in):
    parser = argparse.ArgumentParser(description="dasac_tpu")
    add_global_arguments(parser)
    args = parser.parse_args(args_in)

    if args.dataloader is None:
        args.dataloader = "default"
    args.logdir = os.path.join(args.logdir, args.dataloader, args.exp,
                               args.run or "run0")
    os.makedirs(args.logdir, exist_ok=True)
    args.snapshot_dir = os.path.join(args.snapshot_dir, args.dataloader,
                                     args.exp, args.run or "run0")
    os.makedirs(args.snapshot_dir, exist_ok=True)
    return args
