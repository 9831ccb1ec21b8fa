#!/usr/bin/env python
"""Benchmark: SAC adaptation-training throughput on one TPU chip.

Measures the flagship configuration (deeplabv2_resnet101_train.yaml
semantics): DeepLabv2/ResNet-101, 512x1024 crops, 8 source images + 2
groups x 4 target views per step, bf16 compute, remat, device-side
augmentation — the complete fused train step including teacher forward,
refinement, pseudo-labels and both gradient branches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``value`` follows the reference's own counter (train.py:314: images/sec =
iterations * TRAIN.BATCH_SIZE / elapsed, i.e. source images only).

Measured on v5e (round 1): 13.0 img/s/chip with --remat block (default),
13.3 with --remat none — backward convs dominate either way, so the default
keeps the checkpointing headroom.

``vs_baseline``: the reference publishes no throughput (BASELINE.md).  We
estimate its 4x Titan-X (Pascal, ~11 fp32 TFLOP/s each) adaptation run at
~6 img/s total => ~1.5 img/s per GPU, from the step's ~17 TFLOPs at ~35%
utilization; vs_baseline = ours_per_chip / 1.5.  The north star is >= 3.
"""

import argparse
import json
import sys
import time

import numpy as np

REF_IMAGES_PER_SEC_PER_GPU = 1.5  # documented estimate, see module docstring


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--remat", choices=["block", "none"], default="block",
                        help="activation checkpointing mode for the trunk")
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from dasac_tpu.core.state import create_train_state
    from dasac_tpu.nn.factory import build_model
    from dasac_tpu.train import optim, steps

    hw = (512, 1024)
    batch_size = 8     # TRAIN.BATCH_SIZE (source images per step)
    num_groups = 2     # TRAIN.NUM_GROUPS
    group_size = 4     # TRAIN.GROUP_SIZE

    model = build_model("deeplabv2_resnet101", 19, dtype=jnp.bfloat16,
                        remat=(args.remat == "block"))

    class _MC:
        LR = 2.5e-4
        WEIGHT_DECAY = 5e-4
        OPT = "SGD"
        OPT_NESTEROV = False
        MOMENTUM = 0.9
        BETA1 = 0.5

    variables = jax.jit(
        lambda r: model.init({"params": r}, jnp.zeros((1, 64, 64, 3)),
                             train=False, update_stats=False)
    )(jax.random.PRNGKey(0))
    tx, _ = optim.build_optimizer(_MC, "deeplabv2_resnet101",
                                  variables["params"])
    state = create_train_state(model, tx, 19, (*hw, 3))

    scfg = steps.StepConfig(
        num_classes=19, crop_hw=hw, group_size=group_size,
        lr_target=5.0, net_momentum_iter=100, zoom=(0.5, 1.0),
        guided_hflip=True, tgt_blur=True, tgt_jitter=0.4, tgt_greyscale=0.2,
        src_scale=(0.5, 1.0))
    step = jax.jit(steps.make_sac_step(model, tx, scfg), donate_argnums=(0,))

    rng = np.random.RandomState(0)
    batch = (
        jnp.asarray((rng.rand(batch_size, *hw, 3) * 255).astype(np.uint8)),
        jnp.asarray(rng.randint(0, 19, (batch_size, *hw)).astype(np.uint8)),
        jnp.asarray((rng.rand(num_groups, *hw, 3) * 255).astype(np.uint8)),
        jnp.asarray(rng.randint(0, 19, (num_groups, *hw)).astype(np.uint8)),
    )
    key = jax.random.PRNGKey(0)

    # warmup: compile + first steps (teacher init path included)
    for _ in range(3):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)

    iters = args.iters
    t0 = time.monotonic()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics)
    dt = time.monotonic() - t0

    images_per_sec = iters * batch_size / dt
    print(json.dumps({
        "metric": "sac_adapt_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "img/s/chip (TRAIN.BATCH_SIZE=8 @512x1024, r101, bf16)",
        "vs_baseline": round(images_per_sec / REF_IMAGES_PER_SEC_PER_GPU, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
