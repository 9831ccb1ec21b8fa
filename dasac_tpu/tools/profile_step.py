"""Component-level throughput breakdown of the SAC train step on the
current device (tracing/profiling subsystem — SURVEY.md §5).

Times each stage of the flagship step in isolation:
  aug        device-side source+target augmentation
  teacher    teacher forward (no grad) on the clean views
  refine     warp->pool->unwarp + running-conf + pseudo-labels + focal loss
  src_grad   source CE forward+backward
  tgt_grad   target focal-CE forward+backward
  full       the complete fused step (reference point)

Usage: python -m dasac_tpu.tools.profile_step [--hw 512 1024] [--iters 5]
"""

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, nargs=2, default=[512, 1024])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--groups", type=int, default=2)
    p.add_argument("--group-size", type=int, default=4)
    p.add_argument("--arch", default="deeplabv2_resnet101")
    p.add_argument("--stages", nargs="+", default=None,
                   help="subset of stages to run")
    # shipped-step defaults (PARITY.md round-3 adoptions)
    p.add_argument("--remat", choices=["block", "none", "convs"], default="none")
    p.add_argument("--refine-dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--refine-res", choices=["full", "stride8"],
                   default="stride8")
    p.add_argument("--resize-method", choices=["matmul", "gather"],
                   default="matmul")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp

    from dasac_tpu.core.cache import enable_repo_cache

    enable_repo_cache()

    from dasac_tpu.aug import pipelines
    from dasac_tpu.core.state import create_train_state
    from dasac_tpu.nn import functional as nn_functional
    from dasac_tpu.nn.factory import build_model
    from dasac_tpu.sac import core as sac_core
    from dasac_tpu.sac import refine as sac_refine
    from dasac_tpu.train import optim, steps

    nn_functional.RESIZE_METHOD = args.resize_method  # trace-time global

    hw = tuple(args.hw)
    B, G, T = args.batch, args.groups, args.group_size
    model = build_model(args.arch, 19, dtype=jnp.bfloat16,
                        remat=args.remat)

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
    tx, _ = optim.build_optimizer(_MC, args.arch, variables["params"])
    state = create_train_state(model, tx, 19, (*hw, 3))
    scfg = steps.StepConfig(num_classes=19, crop_hw=hw, group_size=T,
                            lr_target=5.0, zoom=(0.5, 1.0), tgt_jitter=0.4,
                            tgt_greyscale=0.2, src_scale=(0.5, 1.0),
                            refine_dtype=args.refine_dtype,
                            refine_res=args.refine_res)

    rng = np.random.RandomState(0)
    src_i = jnp.asarray((rng.rand(B, *hw, 3) * 255).astype(np.uint8))
    src_l = jnp.asarray(rng.randint(0, 19, (B, *hw)).astype(np.uint8))
    tgt_i = jnp.asarray((rng.rand(G, *hw, 3) * 255).astype(np.uint8))
    tgt_l = jnp.asarray(rng.randint(0, 19, (G, *hw)).astype(np.uint8))
    key = jax.random.PRNGKey(0)
    vstate = {"params": state.params, "batch_stats": state.batch_stats}

    def stage_aug(key):
        f, l = pipelines.augment_source_batch(
            key, src_i, src_l, crop_hw=hw, scale_range=scfg.src_scale)
        v = pipelines.augment_target_groups(
            key, tgt_i, tgt_l, group_size=T, zoom=scfg.zoom,
            jitter=scfg.tgt_jitter, greyscale=scfg.tgt_greyscale)
        return f, l, v

    frames_src, lbls_src, views = jax.jit(stage_aug)(key)
    frames_src = jax.block_until_ready(frames_src)

    def stage_teacher(v):
        tl, _ = model.apply(vstate, v.frames_clean, train=False,
                            update_stats=False)
        return tl

    t_logits = jax.jit(stage_teacher)(views)

    _rd = jnp.bfloat16 if args.refine_dtype == "bfloat16" else None
    _rd_pl = jnp.bfloat16 if args.refine_dtype == "bfloat16" else jnp.float32

    def stage_refine(tl, v, rc):
        refined, diags = sac_refine.refine(
            tl, v.affine, v.affine_inv, v.padding, group_size=T,
            compute_dtype=_rd, res=args.refine_res)
        rc = sac_core.update_running_conf(rc, diags["teacher_probs"],
                                          0.99, 1e-3)
        pseudo, conf, _ = sac_core.pseudo_labels(
            refined, v.padding, rc, upper=0.75, lower=0.2,
            threshold_beta=1e-3, compute_dtype=_rd_pl)
        return pseudo, conf, rc

    def stage_src_grad(params, f, l):
        def loss(p):
            _, up = model.apply({"params": p,
                                 "batch_stats": state.batch_stats},
                                f, train=False, update_stats=False)
            return sac_core.cross_entropy_mean(up, l)
        return jax.grad(loss)(params)

    def stage_tgt_grad(params, v, pseudo, conf, rc):
        def loss(p):
            _, up = model.apply({"params": p,
                                 "batch_stats": state.batch_stats},
                                v.frames_aug, train=False, update_stats=False)
            return sac_core.focal_ce(up, pseudo, conf, rc, p=3)[0]
        return jax.grad(loss)(params)

    full_step = steps.make_sac_step(model, tx, scfg)

    pseudo, conf, rc = jax.jit(stage_refine)(
        t_logits, views, state.running_conf)

    stages = {
        "aug": (jax.jit(stage_aug), (key,)),
        "teacher": (jax.jit(stage_teacher), (views,)),
        "refine": (jax.jit(stage_refine),
                   (t_logits, views, state.running_conf)),
        "src_grad": (jax.jit(stage_src_grad),
                     (state.params, frames_src, lbls_src)),
        "tgt_grad": (jax.jit(stage_tgt_grad),
                     (state.params, views, pseudo, conf, rc)),
        "full": (jax.jit(full_step),
                 (state, (src_i, src_l, tgt_i, tgt_l), key)),
    }
    selected = args.stages or list(stages)

    def _checksum(tree):
        # reduce to one scalar so timing can't be fooled by lazy/partial
        # materialization of large pytrees through the device tunnel
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                   for x in jax.tree.leaves(tree)
                   if hasattr(x, "dtype") and jnp.issubdtype(
                       x.dtype, jnp.number))

    results = {}
    for name in selected:
        fn, fargs = stages[name]
        timed = jax.jit(lambda *a, _f=fn: _checksum(_f(*a)))
        out = timed(*fargs)  # compile + warmup
        out.block_until_ready()
        t0 = time.monotonic()
        for _ in range(args.iters):
            out = timed(*fargs)
        out.block_until_ready()
        results[name] = (time.monotonic() - t0) / args.iters
        print(json.dumps({"stage": name,
                          "ms": round(results[name] * 1e3, 1)}), flush=True)
    return results


if __name__ == "__main__":
    main()
