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
        import jax

        jax.distributed.initialize()

    import numpy as np

    from dasac_tpu.core.config import cfg, cfg_from_file, cfg_from_list
    from dasac_tpu.core.opts import get_arguments
    from dasac_tpu.train.loop import Trainer

    args = get_arguments(argv)
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
