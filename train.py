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


def resolve_dist_env(env):
    """(coordinator_address, num_processes, process_id) for
    jax.distributed.initialize, from JAX_* vars first, then the reference's
    torch.distributed convention (MASTER_ADDR/PORT + WORLD_SIZE/RANK,
    reference train.py:482-551) so its launch recipes keep working.

    The torch-style vars only count as a COMPLETE launch (addr + world size
    + rank together): a stale MASTER_ADDR or WORLD_SIZE leftover alone must
    not override initialize()'s TPU-metadata auto-detection.
    """
    coord = env.get("JAX_COORDINATOR_ADDRESS")
    torch_style = bool(env.get("MASTER_ADDR") and env.get("WORLD_SIZE")
                       and env.get("RANK"))
    if coord is None and torch_style:
        coord = "{}:{}".format(env["MASTER_ADDR"],
                               env.get("MASTER_PORT", "12355"))
    nproc = env.get("JAX_NUM_PROCESSES",
                    env.get("WORLD_SIZE") if torch_style else None)
    pid = env.get("JAX_PROCESS_ID",
                  env.get("RANK") if torch_style else None)
    return (coord,
            None if nproc is None else int(nproc),
            None if pid is None else int(pid))


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if "--multiprocessing-distributed" in argv:
        import os

        import jax

        coord, nproc, pid = resolve_dist_env(os.environ)
        # generous shutdown tolerance: ranks reach process exit with real
        # skew (rank 0 alone writes checkpoints/panels; on loaded CI hosts
        # per-rank compile skew adds minutes) and a late rank must not fail
        # the whole pod at the final coordination-service barrier.  Real
        # hangs are still caught by the launcher's own timeout.
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid,
            shutdown_timeout_seconds=int(
                os.environ.get("DASAC_SHUTDOWN_TIMEOUT", "900")))

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

    from dasac_tpu.core.cache import enable_compile_cache

    enable_compile_cache(cfg.TPU.COMPILE_CACHE)

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
