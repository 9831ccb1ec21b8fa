#!/usr/bin/env python
"""Training entry point — same CLI as the reference train.py.

    python train.py --cfg configs/deeplabv2_resnet101_train.yaml \
        --exp sac_gta --run v1 [--resume snapshot] [--set KEY VAL ...]

One process per HOST drives the mesh (SPMD via shard_map); there is no
mp.spawn / NCCL worker choreography.  On a pod, pass
``--multiprocessing-distributed`` (coordinator from the standard JAX env).
"""

import random
import sys

# NOTE: jax.distributed.initialize() must run before anything touches the
# backend, and importing the framework initializes it (module-level jnp
# constants) — so only argv parsing happens before the init decision.


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if "--multiprocessing-distributed" in argv:
        import os

        import jax

        # explicit env resolution: JAX_* vars first, then the reference's
        # torch.distributed convention (MASTER_ADDR/PORT + WORLD_SIZE/RANK,
        # reference train.py:482-551) so its launch recipes keep working.
        # MASTER_ADDR alone (a stale torch leftover in the environment) must
        # NOT override initialize()'s TPU-metadata auto-detection — only a
        # complete torch-style launch (addr + world size + rank) counts.
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if (coord is None and os.environ.get("MASTER_ADDR")
                and os.environ.get("WORLD_SIZE")
                and os.environ.get("RANK")):
            coord = "{}:{}".format(os.environ["MASTER_ADDR"],
                                   os.environ.get("MASTER_PORT", "12355"))
        nproc = os.environ.get("JAX_NUM_PROCESSES",
                               os.environ.get("WORLD_SIZE"))
        pid = os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK"))
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=None if nproc is None else int(nproc),
            process_id=None if pid is None else int(pid))

    import numpy as np

    from dasac_tpu.core.config import cfg, cfg_from_file, cfg_from_list
    from dasac_tpu.core.opts import get_arguments
    from dasac_tpu.train.loop import Trainer

    args = get_arguments(argv)
    try:  # per-process title like the reference (train.py:477); optional dep
        import jax as _jax
        import setproctitle

        setproctitle.setproctitle(
            "dasac_tpu | {} | p{}".format(args.run, _jax.process_index()))
    except Exception:
        pass
    cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)
    if args.workers:
        cfg.TPU.LOADER_THREADS = args.workers

    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)

    if args.profile:
        try:
            import jax

            jax.profiler.start_trace(args.logdir)
            print("Profiler trace -> {}".format(args.logdir))
        except Exception as e:  # axon tunnel may not support device tracing
            print("Profiler unavailable: {}".format(e))
            args.profile = False

    trainer = Trainer(args, cfg, seed=args.seed or 0)
    try:
        trainer.fit()
    finally:
        if args.profile:
            import jax

            jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
