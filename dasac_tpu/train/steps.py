"""Compiled train/eval steps: the whole SAC iteration as ONE program.

The reference's per-iteration host choreography (train.py:119-251: H2D
copies, two backwards, .item() syncs, dist.all_reduce calls) collapses into
a single jitted SPMD step: device-side augmentation, teacher EMA under
lax.cond, teacher forward + multi-view refinement, pseudo-labels, fused
source+target value_and_grad, pmean'd gradients, optax update.  No host
round-trips inside the hot loop (BASELINE.json north star).

Two trainers:
  * SAC (MODEL.BASELINE=False): BN frozen, teacher branch active
    (train.py:290-298 + models/sac.py:315-378)
  * ABN (MODEL.BASELINE=True): source step trains with live BN, target pass
    only refreshes BN statistics (train.py:281-289)
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dasac_tpu.aug import pipelines
from dasac_tpu.sac import core as sac_core
from dasac_tpu.sac import refine as sac_refine
from dasac_tpu.train.metrics import confusion_matrix


class StepConfig(NamedTuple):
    """Static hyperparameters baked into the compiled step."""

    num_classes: int = 19
    crop_hw: Tuple[int, int] = (512, 1024)
    group_size: int = 4
    # optimization
    lr_target: float = 1.0
    target_only: bool = False
    # teacher / prior
    net_momentum: float = 0.99
    net_momentum_iter: int = 100
    stat_momentum: float = 0.99
    threshold_beta: float = 1e-3
    conf_discount: bool = True
    pool: str = "avg_pool"
    pool_on: bool = True
    # "bfloat16" runs the no-grad teacher refine/pseudo-label chain in bf16
    # (halves its full-res HBM traffic; measured in PARITY.md)
    refine_dtype: str = "float32"
    # rematerialize the CE losses' internals (full-res f32 log-softmax) in
    # the backward pass instead of saving them (traffic experiment)
    ckpt_loss: bool = False
    # "bfloat16" computes the CE log-softmax/one-hot maps in bf16 with f32
    # per-pixel NLL and reductions (gradient-carrying: changes training
    # numerics slightly — measured but NOT the default, PARITY.md)
    loss_dtype: str = "float32"
    # "pallas" computes the per-pixel NLL with the fused ops/ce.py kernel
    # (softmax recomputed in backward — no materialized f32 log-softmax
    # residual; f32-roundoff-identical to "xla")
    ce_impl: str = "xla"
    # "stride8" runs the teacher refine chain at the logits' native stride-8
    # grid and upsamples the pooled result once (reorders the bilinear
    # smoothing vs the softmax/pool nonlinearities — measured in PARITY.md)
    refine_res: str = "full"
    focal_p: int = 3
    use_conf_loss: bool = True  # MODEL.LOSS == focal_ce_conf
    run_conf_upper: float = 0.75
    run_conf_lower: float = 0.2
    # source augmentation
    src_scale: Tuple[float, float] = (0.5, 1.5)
    src_hflip: bool = True
    src_jitter: float = 0.0
    src_blur: bool = False
    src_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    src_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # target augmentation
    target_scale: Tuple[float, float] = (1.0, 1.1)
    zoom: Tuple[float, float] = (0.5, 1.2)
    group_hflip: bool = True
    guided_hflip: bool = True
    tgt_blur: bool = True
    tgt_jitter: float = 0.0
    tgt_greyscale: float = 0.0
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


def step_config_from_cfg(cfg):
    """Derive a StepConfig from the global config (reference yaml schema)."""
    d = cfg.DATASET
    m = cfg.MODEL
    if d.RENORM_SOURCE:
        src_mean, src_std = pipelines.renorm_stats(
            d.MEAN, d.STD, d.SOURCE_MEAN, d.SOURCE_STD,
            d.TARGET_MEAN, d.TARGET_STD)
    else:
        src_mean, src_std = tuple(d.MEAN), tuple(d.STD)
    return StepConfig(
        num_classes=19,
        crop_hw=tuple(d.CROP_SIZE),
        group_size=cfg.TRAIN.GROUP_SIZE,
        lr_target=m.LR_TARGET,
        target_only=cfg.TRAIN.TARGET_ONLY,
        net_momentum=m.NET_MOMENTUM,
        net_momentum_iter=m.NET_MOMENTUM_ITER,
        stat_momentum=m.STAT_MOMENTUM,
        threshold_beta=m.THRESHOLD_BETA,
        conf_discount=m.CONF_DISCOUNT,
        pool=m.CONF_POOL,
        pool_on=m.CONF_POOL_ON,
        refine_dtype=cfg.TPU.REFINE_DTYPE,
        refine_res=cfg.TPU.REFINE_RES,
        ckpt_loss=cfg.TPU.CKPT_LOSS,
        loss_dtype=cfg.TPU.LOSS_DTYPE,
        ce_impl=cfg.TPU.CE_IMPL,
        focal_p=m.FOCAL_P,
        use_conf_loss=(m.LOSS == "focal_ce_conf"),
        run_conf_upper=m.RUN_CONF_UPPER,
        run_conf_lower=m.RUN_CONF_LOWER,
        src_scale=(d.SCALE_FROM, d.SCALE_TO),
        src_hflip=d.RND_HFLIP,
        # reference quirk reproduced: gate on SRC_RND_JITTER, strength from
        # RND_JITTER (dataloader_seg.py:84-85)
        src_jitter=(d.RND_JITTER if d.SRC_RND_JITTER > 0 else 0.0),
        src_blur=d.SRC_RND_BLUR,
        src_mean=src_mean,
        src_std=src_std,
        target_scale=tuple(d.TARGET_SCALE),
        zoom=tuple(d.RND_ZOOM),
        group_hflip=d.RND_HFLIP,
        guided_hflip=d.GUIDED_HFLIP,
        tgt_blur=d.RND_BLUR,
        tgt_jitter=d.RND_JITTER,
        tgt_greyscale=d.RND_GREYSCALE,
        mean=tuple(d.MEAN),
        std=tuple(d.STD),
    )


def _fold_axis(key, axis_name):
    if axis_name is None:
        return key
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def _pmean(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


# ---------------------------------------------------------------------------
# SAC adaptation step
# ---------------------------------------------------------------------------

def make_sac_step(model, tx, scfg: StepConfig, axis_name: Optional[str] = None):
    """Returns step(state, batch, rng) -> (state, metrics).

    ``batch`` = (src_images u8 [B,H0,W0,3], src_labels [B,H0,W0],
                 tgt_images u8 [G,H,W,3],  tgt_labels [G,H,W]).
    The returned function is the PER-SHARD body: wrap with shard_map (batch
    sharded over 'data', state replicated) or jit directly for one device.
    """
    views_step = make_sac_views_step(model, tx, scfg, axis_name)

    def step(state, batch, rng):
        src_images, src_labels, tgt_images, tgt_labels = batch
        rng = jax.random.fold_in(rng, state.step)
        rng = _fold_axis(rng, axis_name)
        k_src, k_tgt = jax.random.split(rng)

        # ---- device-side augmentation -------------------------------------
        src_frames, src_lbls = pipelines.augment_source_batch(
            k_src, src_images, src_labels, crop_hw=scfg.crop_hw,
            scale_range=scfg.src_scale, hflip=scfg.src_hflip,
            jitter=scfg.src_jitter, blur=scfg.src_blur,
            mean=scfg.src_mean, std=scfg.src_std)
        views = pipelines.augment_target_groups(
            k_tgt, tgt_images, tgt_labels, group_size=scfg.group_size,
            target_scale=scfg.target_scale, zoom=scfg.zoom,
            group_hflip=scfg.group_hflip, guided_hflip=scfg.guided_hflip,
            blur=scfg.tgt_blur, jitter=scfg.tgt_jitter,
            greyscale=scfg.tgt_greyscale, mean=scfg.mean, std=scfg.std)
        return views_step(state, src_frames, src_lbls, views, rng)

    return step


def make_sac_views_step(model, tx, scfg: StepConfig,
                        axis_name: Optional[str] = None, debug: bool = False):
    """The SAC iteration on PRE-AUGMENTED inputs.

    ``views_step(state, src_frames, src_lbls, views, rng)`` with
    ``src_frames`` already normalized/cropped and ``views`` a
    :class:`~dasac_tpu.aug.pipelines.TargetViews`.  This is the exact body
    `make_sac_step` runs after device-side augmentation — exposed so the
    training-step parity test can feed both this step and the reference's
    torch ``SAC.forward`` (models/sac.py:315-378) identical views.

    With ``debug=True`` the metrics dict additionally carries the
    pseudo-labels, teacher confidence, refined probabilities and raw summed
    gradients (never pmean'd — single-device verification only);
    ``debug="light"`` returns only the pseudo-labels and running_conf (the
    long-horizon parity run reads metrics back every iteration, and the
    full r101 gradient pytree would dominate its wall time).
    """

    # refine-chain precision: None = f32 interpolation (reference-exact);
    # bf16 halves the no-grad chain's full-res traffic
    _rd = jnp.bfloat16 if scfg.refine_dtype == "bfloat16" else None
    _rd_pl = jnp.bfloat16 if scfg.refine_dtype == "bfloat16" else jnp.float32
    _ld = jnp.bfloat16 if scfg.loss_dtype == "bfloat16" else jnp.float32

    def views_step(state, src_frames, src_lbls, views, rng):
        # ---- teacher EMA / lazy init (sac.py:70-102, train.py:294) --------
        # the reference's per-epoch counter updates at iteration 0 of every
        # epoch, so the teacher is initialized on the very first SAC step
        # even after resuming from an ABN snapshot; our step counter is
        # global, so force the lazy init whenever it hasn't happened yet
        do_update = jnp.logical_or(
            (state.step % scfg.net_momentum_iter) == 0,
            state.slow_init == 0)
        teacher = {"params": state.teacher_params, "stats": state.teacher_stats}
        student = {"params": state.params, "stats": state.batch_stats}
        teacher, slow_init, running_conf, teacher_diff = (
            sac_core.maybe_update_teacher(
                teacher, student, state.slow_init, state.running_conf,
                momentum=scfg.net_momentum,
                threshold_beta=scfg.threshold_beta, do_update=do_update))

        # ---- teacher branch on clean views (no grad) ----------------------
        t_logits, _ = model.apply(
            {"params": teacher["params"], "batch_stats": teacher["stats"]},
            views.frames_clean, train=False, update_stats=False)
        refined, diags = sac_refine.refine(
            t_logits, views.affine, views.affine_inv, views.padding,
            group_size=scfg.group_size, pool=scfg.pool, pool_on=scfg.pool_on,
            compute_dtype=_rd, res=scfg.refine_res)
        running_conf = sac_core.update_running_conf(
            running_conf, diags["teacher_probs"], scfg.stat_momentum,
            scfg.threshold_beta, axis_name=axis_name)
        pseudo, conf, _ = sac_core.pseudo_labels(
            refined, views.padding, running_conf,
            upper=scfg.run_conf_upper, lower=scfg.run_conf_lower,
            threshold_beta=scfg.threshold_beta, discount=scfg.conf_discount,
            compute_dtype=_rd_pl)
        pseudo = jax.lax.stop_gradient(pseudo)
        conf = jax.lax.stop_gradient(conf)

        # ---- source + target gradients (summed) ---------------------------
        # Two sequential value_and_grads instead of one fused loss: the
        # reference also runs two backwards before one optimizer step
        # (train.py:130-233); mathematically identical, and sequencing keeps
        # only ONE branch's activations live at a time (HBM peak halves —
        # the fused version OOMs the full 512x1024 batch on a 16G chip).

        # student forwards run in train mode: the reference keeps Dropout
        # active during SAC (only BN layers are forced to eval,
        # basenet.py:86-100); BN stays frozen via update_stats=False
        k_drop_src, k_drop_tgt = jax.random.split(
            jax.random.fold_in(rng, 1337))

        def _src_ce(src_up):
            return sac_core.cross_entropy_mean(src_up, src_lbls,
                                               compute_dtype=_ld,
                                               impl=scfg.ce_impl)

        def _tgt_ce(tgt_up):
            return sac_core.focal_ce(
                tgt_up, pseudo, conf, running_conf, p=scfg.focal_p,
                use_conf=scfg.use_conf_loss, compute_dtype=_ld,
                impl=scfg.ce_impl)

        if scfg.ckpt_loss:
            # save only the bf16 logits; recompute the f32 log-softmax maps
            # during backward (elementwise flops for full-res f32 traffic)
            _src_ce = jax.checkpoint(_src_ce)
            _tgt_ce = jax.checkpoint(_tgt_ce)

        def src_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            _, src_up = model.apply(variables, src_frames,
                                    train=True, update_stats=False,
                                    rngs={"dropout": k_drop_src})
            return _src_ce(src_up)

        def tgt_loss(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            _, tgt_up = model.apply(variables, views.frames_aug,
                                    train=True, update_stats=False,
                                    rngs={"dropout": k_drop_tgt})
            self_ce, per_class = _tgt_ce(tgt_up)
            return scfg.lr_target * self_ce, (self_ce, per_class)

        if scfg.target_only:
            ce_src = jnp.float32(0.0)
            (_, (self_ce, per_class)), grads = jax.value_and_grad(
                tgt_loss, has_aux=True)(state.params)
        else:
            ce_src, grads_src = jax.value_and_grad(src_loss)(state.params)
            # barrier: the target branch must not be scheduled before the
            # source BACKWARD completes (ties params to the src grads), so
            # only one branch's activations are ever live
            grads_src, params_seq = jax.lax.optimization_barrier(
                (grads_src, state.params))
            (_, (self_ce, per_class)), grads_tgt = jax.value_and_grad(
                tgt_loss, has_aux=True)(params_seq)
            grads = jax.tree.map(jnp.add, grads_src, grads_tgt)
        grads = _pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            teacher_params=teacher["params"],
            teacher_stats=teacher["stats"],
            running_conf=running_conf,
            slow_init=slow_init,
            step=state.step + 1,
        )
        metrics = _pmean({
            "src_loss_ce": ce_src,
            "self_ce": self_ce,
            "teacher_diff": teacher_diff,
            "pseudo_cover": jnp.mean((pseudo != sac_core.IGNORE).astype(
                jnp.float32)),
            # [C] per-class self-supervision CE (reference loss_per_class,
            # sac.py:360-368) — published as per-class TB scalars
            "self_ce_per_class": per_class,
        }, axis_name)
        if debug:
            metrics = dict(metrics)
            metrics.update(pseudo=pseudo, running_conf=running_conf)
            if debug != "light":
                metrics.update(conf=conf, refined=refined, grads=grads)
        return new_state, metrics

    return views_step


# ---------------------------------------------------------------------------
# ABN baseline step
# ---------------------------------------------------------------------------

def make_abn_step(model, tx, scfg: StepConfig, axis_name: Optional[str] = None):
    """ABN: source CE training with live BN + target stats-only pass.

    ``batch`` = (src_images, src_labels, tgt_images [B_t,Ht,Wt,3],
    tgt_labels) — the baseline's target loader is a plain source-style
    dataset (datasets/__init__.py:51-53), so the target branch uses the
    source geometric pipeline with standard normalization.
    """
    frames_step = make_abn_frames_step(model, tx, scfg, axis_name)

    def step(state, batch, rng):
        src_images, src_labels, tgt_images, tgt_labels = batch
        rng = jax.random.fold_in(rng, state.step)
        rng = _fold_axis(rng, axis_name)
        k_src, k_tgt = jax.random.split(rng)

        src_frames, src_lbls = pipelines.augment_source_batch(
            k_src, src_images, src_labels, crop_hw=scfg.crop_hw,
            scale_range=scfg.src_scale, hflip=scfg.src_hflip,
            jitter=scfg.src_jitter, blur=scfg.src_blur,
            mean=scfg.src_mean, std=scfg.src_std)
        tgt_frames, tgt_lbls_o = pipelines.augment_source_batch(
            k_tgt, tgt_images, tgt_labels, crop_hw=scfg.crop_hw,
            scale_range=scfg.src_scale, hflip=scfg.src_hflip,
            jitter=scfg.src_jitter, blur=scfg.src_blur,
            mean=scfg.mean, std=scfg.std)
        return frames_step(state, src_frames, src_lbls,
                           tgt_frames, tgt_lbls_o, rng)

    return step


def make_abn_frames_step(model, tx, scfg: StepConfig,
                         axis_name: Optional[str] = None):
    """The ABN iteration on PRE-AUGMENTED inputs — the exact body
    ``make_abn_step`` runs after device-side augmentation, exposed so the
    ABN trajectory parity test can feed this step and the reference's
    baseline path (train.py:273-289: live-BN source backward + optim.step,
    then a no-grad train-mode target forward) identical frames.
    """

    def frames_step(state, src_frames, src_lbls, tgt_frames, tgt_lbls, rng):
        k_src, k_tgt = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (_, src_up), mut = model.apply(
                variables, src_frames, train=True, update_stats=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(k_src, 1)})
            ce = sac_core.cross_entropy_mean(src_up, src_lbls,
                                             impl=scfg.ce_impl)
            return ce, mut["batch_stats"]

        (ce_src, stats_after_src), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = _pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        # target pass: BN statistics only, no gradient (train.py:286-289)
        variables = {"params": params, "batch_stats": stats_after_src}
        (_, tgt_up), mut = model.apply(
            variables, tgt_frames, train=True, update_stats=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(k_tgt, 1)})
        ce_tgt = sac_core.cross_entropy_mean(tgt_up, tgt_lbls,
                                             impl=scfg.ce_impl)

        new_state = state.replace(
            params=params,
            batch_stats=mut["batch_stats"],
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = _pmean({"src_loss_ce": ce_src, "loss_ce": ce_tgt},
                         axis_name)
        return new_state, metrics

    return frames_step


# ---------------------------------------------------------------------------
# evaluation steps
# ---------------------------------------------------------------------------

def make_eval_step(model, scfg: StepConfig, axis_name: Optional[str] = None,
                   teacher: bool = False):
    """Plain eval: normalized forward -> argmax -> confusion [C, C]."""

    def step(state, images_u8, labels):
        from dasac_tpu.aug import photometric as P

        x = P.normalize(images_u8.astype(jnp.float32) / 255.0,
                        scfg.mean, scfg.std)
        params = state.teacher_params if teacher else state.params
        stats = state.teacher_stats if teacher else state.batch_stats
        _, up = model.apply({"params": params, "batch_stats": stats},
                            x, train=False, update_stats=False)
        pred = jnp.argmax(up, -1)
        conf = confusion_matrix(pred, labels, scfg.num_classes)
        if axis_name is not None:
            conf = jax.lax.psum(conf, axis_name)
        return conf

    return step


def make_target_eval_step(model, scfg: StepConfig,
                          axis_name: Optional[str] = None):
    """Target-group eval: confusions for the reference's four layers
    (logits_up / teacher_init / teacher_refined / teacher_labels,
    train.py:388).

    The refine/pseudo-label chain runs with the SAME refine_res /
    refine_dtype the train step uses, so teacher_refined/teacher_labels
    measure the labels training actually consumes (not a reference-exact
    f32 full-res variant the run never sees)."""

    _rd = jnp.bfloat16 if scfg.refine_dtype == "bfloat16" else None
    _rd_pl = jnp.bfloat16 if scfg.refine_dtype == "bfloat16" else jnp.float32

    def step(state, tgt_images, tgt_labels, rng):
        views = pipelines.augment_target_groups(
            _fold_axis(rng, axis_name), tgt_images, tgt_labels,
            group_size=scfg.group_size, target_scale=scfg.target_scale,
            zoom=scfg.zoom, group_hflip=scfg.group_hflip,
            guided_hflip=scfg.guided_hflip, blur=scfg.tgt_blur,
            jitter=scfg.tgt_jitter, greyscale=scfg.tgt_greyscale,
            mean=scfg.mean, std=scfg.std)

        student = {"params": state.params, "batch_stats": state.batch_stats}
        tparams = {"params": state.teacher_params,
                   "batch_stats": state.teacher_stats}
        _, student_up = model.apply(student, views.frames_aug,
                                    train=False, update_stats=False)
        t_logits, t_up = model.apply(tparams, views.frames_clean,
                                     train=False, update_stats=False)
        refined, _ = sac_refine.refine(
            t_logits, views.affine, views.affine_inv, views.padding,
            group_size=scfg.group_size, pool=scfg.pool, pool_on=scfg.pool_on,
            compute_dtype=_rd, res=scfg.refine_res)
        pseudo, _, _ = sac_core.pseudo_labels(
            refined, views.padding, state.running_conf,
            upper=scfg.run_conf_upper, lower=scfg.run_conf_lower,
            threshold_beta=scfg.threshold_beta, discount=scfg.conf_discount,
            compute_dtype=_rd_pl)

        confs = {
            "logits_up": confusion_matrix(
                jnp.argmax(student_up, -1), views.labels, scfg.num_classes),
            "teacher_init": confusion_matrix(
                jnp.argmax(t_up, -1), views.labels, scfg.num_classes),
            "teacher_refined": confusion_matrix(
                jnp.argmax(refined, -1), views.labels, scfg.num_classes),
            "teacher_labels": confusion_matrix(
                pseudo, views.labels, scfg.num_classes),
        }
        if axis_name is not None:
            confs = jax.lax.psum(confs, axis_name)
        return confs

    return step


def make_visual_step(model, scfg: StepConfig):
    """Full target-branch outputs for visualisation panels (the reference's
    TB diagnostics, base_trainer.py:118-191): returns (views, refined_probs,
    pseudo_labels, student_logits_up, diags) where diags carries the
    teacher-aligned probability maps and the matching warped frames
    (reference sac.py:293-296 debug diagnostics)."""

    def step(state, tgt_images, tgt_labels, rng):
        from dasac_tpu.aug.warp import warp_affine

        views = pipelines.augment_target_groups(
            rng, tgt_images, tgt_labels, group_size=scfg.group_size,
            target_scale=scfg.target_scale, zoom=scfg.zoom,
            group_hflip=scfg.group_hflip, guided_hflip=scfg.guided_hflip,
            blur=scfg.tgt_blur, jitter=scfg.tgt_jitter,
            greyscale=scfg.tgt_greyscale, mean=scfg.mean, std=scfg.std)
        t_logits, _ = model.apply(
            {"params": state.teacher_params,
             "batch_stats": state.teacher_stats},
            views.frames_clean, train=False, update_stats=False)
        # visualisation intentionally uses the full-res f32 chain regardless
        # of TPU.REFINE_RES/REFINE_DTYPE: the panels need the full-resolution
        # teacher_aligned maps, which the stride8 path does not materialise
        # (and this step runs once per ITER_TB, so its cost is irrelevant)
        refined, rdiags = sac_refine.refine(
            t_logits, views.affine, views.affine_inv, views.padding,
            group_size=scfg.group_size, pool=scfg.pool, pool_on=scfg.pool_on)
        pseudo, _, _ = sac_core.pseudo_labels(
            refined, views.padding, state.running_conf,
            upper=scfg.run_conf_upper, lower=scfg.run_conf_lower,
            threshold_beta=scfg.threshold_beta, discount=scfg.conf_discount)
        _, student_up = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            views.frames_aug, train=False, update_stats=False)
        diags = {}
        if "teacher_aligned" in rdiags:
            diags["teacher_aligned"] = rdiags["teacher_aligned"]
            diags["frames_aligned"] = warp_affine(views.frames_clean,
                                                  views.affine)
        return views, refined, pseudo, student_up, diags

    return step


# ---------------------------------------------------------------------------
# sharding wrappers
# ---------------------------------------------------------------------------

def shard_train_step(step_fn, mesh, axis_name="data"):
    """Wrap a per-shard step for SPMD: batch sharded on axis 0, state and rng
    replicated.  Gradients/metrics are pmean'd inside the step, so outputs
    stay replicated."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), (P(axis_name), P(axis_name), P(axis_name),
                        P(axis_name)), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_target_eval_step(step_fn, mesh, axis_name="data"):
    """SPMD target eval: groups shard over 'data' (whole groups per device,
    like the train step), state/rng replicated, confusions psum'd inside."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_eval_step(step_fn, mesh, axis_name="data"):
    """SPMD eval: images/labels shard over 'data', the confusion matrix is
    psum'd inside the step (replicated output)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# GSPMD wrappers (TPU.PARTITION = "gspmd")
# ---------------------------------------------------------------------------
# The alternative to shard_map: the step stays the GLOBAL-batch program
# (axis_name=None — the exact single-device semantics), jitted with input
# shardings over a 2-D (data, sp) mesh.  XLA's SPMD partitioner splits every
# op, all-reduces the gradients against the replicated parameters, and
# inserts conv halo exchanges where the image height is sharded — so crops
# too large for one chip's HBM can train across chips (the training
# counterpart of infer_val --spatial; no reference counterpart —
# DistributedDataParallel only splits batches).  shard_map mode instead
# reproduces the reference's per-GPU-batch DDP semantics and supports
# multi-process pods.


def _gspmd_shardings(mesh):
    # single source of truth with Trainer._place's batch placement
    from dasac_tpu.core.mesh import replicated, spatial_batch_sharding

    return replicated(mesh), spatial_batch_sharding(mesh)


def gspmd_train_step(step_fn, mesh):
    """jit a global-batch train step (built with ``axis_name=None``) over
    the mesh: state/rng replicated, every batch leaf sharded batch-over-data
    and height-over-sp."""
    repl, batch = _gspmd_shardings(mesh)
    return jax.jit(step_fn,
                   in_shardings=(repl, (batch, batch, batch, batch), repl),
                   out_shardings=(repl, repl),
                   donate_argnums=(0,))


def gspmd_eval_step(step_fn, mesh):
    repl, batch = _gspmd_shardings(mesh)
    return jax.jit(step_fn, in_shardings=(repl, batch, batch),
                   out_shardings=repl)


def gspmd_target_eval_step(step_fn, mesh):
    repl, batch = _gspmd_shardings(mesh)
    return jax.jit(step_fn, in_shardings=(repl, batch, batch, repl),
                   out_shardings=repl)
