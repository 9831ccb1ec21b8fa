"""Trainer: epoch loop, validation cadence, checkpoint-best — the control
plane around the compiled steps (reference train.py:48-533 restructured: the
per-iteration work is one device program; the host only feeds uint8 batches
and reads back scalar metrics once per log interval).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils

from dasac_tpu.core.mesh import (DATA_AXIS, make_mesh, make_mesh_2d,
                                 replicated, shard_batch,
                                 spatial_batch_sharding)
from dasac_tpu.core.state import create_train_state
from dasac_tpu.data.factory import Loaders
from dasac_tpu.nn import convert
from dasac_tpu.nn.factory import build_model, compute_dtype
from dasac_tpu.train import optim as optim_lib
from dasac_tpu.train import steps as steps_lib
from dasac_tpu.train.checkpoints import BestTracker, Checkpointer, NullTx
from dasac_tpu.train.metrics import StatManager, summarise
from dasac_tpu.utils.logging import ScalarWriter
from dasac_tpu.utils.timer import Timer
from dasac_tpu.utils import visualise


class Trainer:
    def __init__(self, args, cfg, seed=0):
        self.args = args
        self.cfg = cfg
        self.seed = getattr(args, "seed", None) or seed

        self.n_proc = jax.process_count()
        self.is_main = jax.process_index() == 0
        n_dev = cfg.TPU.MESH_DEVICES
        assert cfg.TPU.PARTITION in ("shard_map", "gspmd"), (
            "unknown TPU.PARTITION %r (expected 'shard_map' or 'gspmd')"
            % (cfg.TPU.PARTITION,))
        self.gspmd = cfg.TPU.PARTITION == "gspmd"
        if self.gspmd:
            # GSPMD mode: one global-batch program partitioned by XLA over
            # a (data, sp) mesh — image height shards over 'sp' (conv halo
            # exchanges), batch over 'data'.
            n_sp = max(1, int(cfg.TPU.MESH_SP))
            if self.n_proc > 1:
                # pod x gspmd: one global mesh over every process's devices.
                # Each process feeds its batch-block slice; shard_batch
                # assembles global (data, sp)-sharded arrays.  Keep each sp
                # group within one host so the conv halo exchanges ride
                # ICI, never DCN: make_mesh_2d lays 'sp' along adjacent
                # devices, which stay intra-process iff the local device
                # count divides into whole sp groups.
                n_dev = len(jax.devices())
                n_local = len(jax.local_devices())
                assert n_local % n_sp == 0, (
                    "TPU.MESH_SP=%d must divide the %d local devices per "
                    "process (sp halo exchanges must not cross hosts)"
                    % (n_sp, n_local))
                n_data = n_dev // n_sp
                for name, v in (("TRAIN.BATCH_SIZE", cfg.TRAIN.BATCH_SIZE),
                                ("TRAIN.NUM_GROUPS", cfg.TRAIN.NUM_GROUPS)):
                    assert v % n_data == 0, (
                        "{}={} must be divisible by the {}-way data axis "
                        "of the {}-device gspmd pod".format(name, v,
                                                            n_data, n_dev))
            else:
                if not n_dev:
                    n_dev = n_sp * _auto_mesh_size(
                        len(jax.devices()) // n_sp,
                        cfg.TRAIN.BATCH_SIZE, cfg.TRAIN.NUM_GROUPS)
                assert n_dev % n_sp == 0, (
                    "TPU.MESH_DEVICES=%d must be divisible by TPU.MESH_SP=%d"
                    % (n_dev, n_sp))
            self.mesh = make_mesh_2d(n_dev // n_sp, n_sp)
        else:
            if self.n_proc > 1:
                # pod: the mesh MUST span every process's devices; the
                # global batch dims have to divide the device count
                n_dev = len(jax.devices())
                for name, v in (("TRAIN.BATCH_SIZE", cfg.TRAIN.BATCH_SIZE),
                                ("TRAIN.NUM_GROUPS", cfg.TRAIN.NUM_GROUPS)):
                    assert v % n_dev == 0, (
                        "{}={} must be divisible by the {}-device pod".format(
                            name, v, n_dev))
            elif not n_dev:
                # auto: largest device count dividing both batch dimensions
                n_dev = _auto_mesh_size(len(jax.devices()),
                                        cfg.TRAIN.BATCH_SIZE,
                                        cfg.TRAIN.NUM_GROUPS)
            self.mesh = make_mesh(n_dev)
        self.n_dev = int(self.mesh.devices.size)
        self.sharded = self.n_dev > 1 and not self.gspmd
        axis = DATA_AXIS if self.sharded else None
        print("Mesh: {} device(s) / {} process(es){}".format(
            self.n_dev, self.n_proc,
            " (gspmd {})".format("x".join(map(str, self.mesh.devices.shape)))
            if self.gspmd else
            " (data-parallel)" if self.sharded else ""))

        if self.n_proc > 1:
            # Establish the cross-process collective contexts NOW, not at
            # the first in-step collective: the gloo/ICI clique rendezvous
            # publishes each rank's endpoint with a short (~30 s) key-value
            # timeout, and the first in-step collective otherwise only
            # happens after minutes of per-rank compile/dataset-setup skew —
            # a slow rank then times the fast ranks out (observed on a
            # loaded 1-core CI host).  Two stages: (1) a coordination-service
            # barrier with a GENEROUS timeout absorbs whatever skew the
            # ranks accumulated since initialize() (backend creation and
            # framework imports are not free under contention); (2) one
            # barrier collective then creates the clique context with all
            # ranks aligned to within milliseconds, comfortably inside the
            # 30 s rendezvous window.  Every later collective reuses the
            # context, so arbitrary downstream skew is safe.
            try:
                from jax._src import distributed as _dist

                _dist.global_state.client.wait_at_barrier(
                    "dasac_tpu:mesh_ready", 15 * 60 * 1000)
            except Exception:
                pass  # private API; stage (2) alone still narrows the race
            multihost_utils.sync_global_devices("dasac_tpu:collectives_up")
            # warm the one-device-per-process clique too (used by the
            # resume broadcast below) while the ranks are still aligned
            multihost_utils.broadcast_one_to_all(np.zeros((), np.float32))

        # multi-host (pod): each process decodes its slice of every batch;
        # shard_batch assembles global arrays over the full mesh
        assert cfg.TRAIN.BATCH_SIZE % self.n_proc == 0 and \
            cfg.TRAIN.NUM_GROUPS % self.n_proc == 0, (
                "global batch dims must divide the process count")
        self.loaders = Loaders(cfg, num_replicas=self.n_proc,
                               rank=jax.process_index(), seed=self.seed)
        self.nclass = self.loaders.num_classes
        self.class_names = self.loaders.class_names

        from dasac_tpu.nn import functional as nn_functional

        nn_functional.RESIZE_METHOD = cfg.TPU.RESIZE_METHOD
        dtype = compute_dtype(cfg.TPU)
        self.arch = cfg.MODEL.ARCH
        self.model = build_model(self.arch, self.nclass, dtype=dtype,
                                 axis_name=axis, remat=cfg.TPU.REMAT)

        # state + optimizer
        sample_hw = tuple(cfg.DATASET.CROP_SIZE)
        self.scfg = steps_lib.step_config_from_cfg(cfg)._replace(
            num_classes=self.nclass)
        # two-phase init: params must exist before the multi_transform
        # labels can be built, so start with the load-only NullTx
        state = create_train_state(
            self.model, NullTx(), self.nclass, (*sample_hw, 3),
            rng=jax.random.PRNGKey(self.seed))
        self.tx, _ = optim_lib.build_optimizer(cfg.MODEL, self.arch,
                                               state.params)
        state = state.replace(opt_state=self.tx.init(state.params))

        # ImageNet init (MODEL.INIT_MODEL, models/__init__.py:22-25)
        init_model = cfg.MODEL.INIT_MODEL
        if init_model and os.path.isfile(init_model):
            sd = convert.load_torch_file(init_model)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            new_vars, n_loaded, _ = convert.apply_state_dict(
                variables, sd.get("model", sd), self.arch, "torchvision")
            print("Loaded {} backbone tensors from {}".format(
                n_loaded, init_model))
            state = state.replace(params=new_vars["params"],
                                  batch_stats=new_vars["batch_stats"],
                                  teacher_params=jax.tree.map(
                                      jnp.copy, new_vars["params"]),
                                  teacher_stats=jax.tree.map(
                                      jnp.copy, new_vars["batch_stats"]))
        elif init_model:
            print("Backbone model not found: {}".format(init_model))

        # checkpointing / resume
        self.checkpointer = Checkpointer(
            getattr(args, "snapshot_dir", None) or "./snapshots")
        self.checkpointer.arch = self.arch
        self.start_epoch, best = 0, -1e16
        resume = getattr(args, "resume", None)
        if resume == "auto":
            # preemption recovery: continue from the rolling snapshot
            resume = self.checkpointer.latest_path()
            if resume is None:
                print("No last.ckpt found; starting fresh")
        if resume:
            state, self.start_epoch, best = self.checkpointer.load(
                resume, state)
            print("Resumed from {} (epoch {}, score {:.3f})".format(
                resume, self.start_epoch, best))
        self.best = BestTracker(self.checkpointer, best)
        if self.n_proc > 1:
            # pod: make every process's state bit-identical (resume may have
            # found different/missing snapshots per host), then promote to
            # global replicated arrays so the multi-process pjit accepts it
            state = multihost_utils.broadcast_one_to_all(state)
            rep = replicated(self.mesh)
            state = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    rep, np.asarray(x)), state)
        self.state = state

        # compiled steps
        if cfg.MODEL.BASELINE:
            per_shard = steps_lib.make_abn_step(self.model, self.tx,
                                                self.scfg, axis)
        else:
            per_shard = steps_lib.make_sac_step(self.model, self.tx,
                                                self.scfg, axis)
        if self.gspmd:
            self.train_step = steps_lib.gspmd_train_step(per_shard,
                                                         self.mesh)
        elif self.sharded:
            self.train_step = steps_lib.shard_train_step(per_shard, self.mesh)
        else:
            self.train_step = jax.jit(per_shard, donate_argnums=(0,))
        if self.gspmd:
            self.eval_step = steps_lib.gspmd_eval_step(
                steps_lib.make_eval_step(self.model, self.scfg), self.mesh)
        elif self.sharded:
            self.eval_step = steps_lib.shard_eval_step(
                steps_lib.make_eval_step(self.model, self.scfg, axis),
                self.mesh)
        else:
            self.eval_step = jax.jit(
                steps_lib.make_eval_step(self.model, self.scfg))
        # plain-jit eval over full (replicated) batches — fallback for the
        # single-device trainer's target validation
        self.eval_step_local = jax.jit(
            steps_lib.make_eval_step(self.model, self.scfg))
        if self.gspmd:
            self.target_eval_step = steps_lib.gspmd_target_eval_step(
                steps_lib.make_target_eval_step(self.model, self.scfg),
                self.mesh)
        elif self.sharded:
            # groups shard over the mesh exactly like the train step, and
            # each process decodes only its slice (no pod-wide redundancy)
            self.target_eval_step = steps_lib.shard_target_eval_step(
                steps_lib.make_target_eval_step(self.model, self.scfg, axis),
                self.mesh)
        else:
            self.target_eval_step = jax.jit(
                steps_lib.make_target_eval_step(self.model, self.scfg))
        self.visual_step = jax.jit(
            steps_lib.make_visual_step(self.model, self.scfg))

        def _vis_forward(params, stats, x):
            _, up = self.model.apply({"params": params, "batch_stats": stats},
                                     x, train=False, update_stats=False)
            return up

        # jitted: an eager apply would dispatch op-by-op (very slow through
        # a remote-device tunnel)
        self._vis_forward = jax.jit(_vis_forward)

        # writers (only the main process writes logs/checkpoints on a pod,
        # matching the reference's rank-0 gating, train.py:523)
        logdir = getattr(args, "logdir", None) or "./logs"

        def _writer(sub):
            if self.is_main:
                return ScalarWriter(os.path.join(logdir, sub))
            return _NullWriter()

        self.writer = _writer("train")
        self.writer_target = _writer("train_target")
        self.writer_val = {vs: _writer(vs) for vs in self.loaders.val}
        self.rng = jax.random.PRNGKey(self.seed)
        self.fixed = visualise.FixedBatch()

    # ------------------------------------------------------------------ train

    def _host_local_state(self):
        """State usable by plain-jit (single-device) eval/visual steps: on a
        pod, pull the replicated values out of the global arrays."""
        if self.n_proc == 1:
            return self.state
        return jax.tree.map(
            lambda x: jnp.asarray(x.addressable_shards[0].data), self.state)

    def _place(self, batch):
        if self.gspmd:
            return shard_batch(self.mesh, batch,
                               spatial_batch_sharding(self.mesh))
        if self.sharded:
            return shard_batch(self.mesh, batch)
        return jax.tree.map(jnp.asarray, batch)

    def train_epoch(self, epoch, log_every=10):
        cfg = self.cfg
        stat = StatManager()
        timer = Timer()
        src_loader, tgt_loader = self.loaders.train_loaders(epoch)
        images_per_step = (cfg.TRAIN.BATCH_SIZE +
                           cfg.TRAIN.NUM_GROUPS * cfg.TRAIN.GROUP_SIZE)

        pending = None  # delay metric readback by one step (no sync stall)
        for i, ((src_i, src_l), (tgt_i, tgt_l)) in enumerate(
                zip(src_loader, tgt_loader)):
            batch = self._place((src_i, src_l, tgt_i, tgt_l))
            self.state, metrics = self.train_step(self.state, batch, self.rng)
            if pending is not None:
                pi, pmetrics = pending
                self._log_train(stat, pending, epoch)
                if pi % log_every == 0:
                    # print the PREVIOUS step's metrics: already materialized,
                    # so the device pipeline never stalls on the host
                    mvals = {k: float(v) for k, v in pmetrics.items()
                             if np.ndim(v) == 0}
                    rate = (pi + 1) * images_per_step / timer.elapsed()
                    msg = " | ".join("{} {:.4f}".format(k, v)
                                     for k, v in sorted(mvals.items()))
                    print("Loss [{:04d}]: {} | Im/Sec: {:.1f}".format(
                        pi, msg, rate))
            pending = (i, metrics)
        if pending is not None:
            self._log_train(stat, pending, epoch)

        for name, val in stat.items():
            self.writer.add_scalar("train_epoch/{}".format(name), val, epoch)
        # per-group learning rates (reference train.py:328-330; constant
        # schedule, groups ordered like BaseNet.parameter_groups)
        from dasac_tpu.train.optim import GROUPS, lr_multipliers

        mults = lr_multipliers(cfg.MODEL.ARCH)
        for gi, g in enumerate(GROUPS):
            self.writer.add_scalar("lr/enc_group_{:02d}".format(gi),
                                   cfg.MODEL.LR * mults[g], epoch)
        return stat

    def _log_train(self, stat, pending, epoch):
        _, metrics = pending
        for k, v in metrics.items():
            if k == "self_ce_per_class":
                # [C] vector -> per-class scalars (reference loss_per_class)
                v = np.asarray(v)
                for ni, cname in enumerate(self.class_names):
                    stat.update_stats(
                        "self_ce_class/{:02d}_{}".format(ni, cname),
                        float(v[ni]))
            else:
                stat.update_stats(k, float(v))

    # ------------------------------------------------------------- validation

    def validation(self, epoch, split, max_batches=None, target_mode=False):
        """Returns the best layer's mIoU on the split (reference
        train.py:339-469)."""
        ignore = set(self.cfg.VAL.IGNORE_CLASS)
        writer = self.writer_val.get(split, self.writer)
        if target_mode:
            return self._validation_target(epoch, max_batches)

        bs = max(1, self.cfg.TRAIN.BATCH_SIZE // 2)
        # sharded eval needs global batch % data axis == 0 (gspmd shards
        # batch over 'data' only; shard_map spreads it over every device)
        round_to = (self.mesh.shape["data"] if self.gspmd
                    else self.n_dev if self.sharded else 0)
        if round_to:
            bs = max(round_to, (bs // round_to) * round_to)
        # multi-host: each process decodes only its slice of every global
        # batch (the assembled batch covers each image once; confusions are
        # psum'd inside the sharded eval step)
        loader = self.loaders.val_loader(split, batch_size=bs // self.n_proc,
                                         max_batches=max_batches,
                                         distributed=self.n_proc > 1)
        conf = None
        first_batch = None
        for imgs, lbls in loader:
            if first_batch is None:
                first_batch = (imgs, lbls)
            c = self.eval_step(
                self.state, *self._place((imgs, lbls.astype(np.int32))))
            conf = c if conf is None else conf + c
        if self.n_proc > 1:
            print("[val:{}] rank {} decoded {} real images".format(
                split, jax.process_index(), loader.n_real))
        if conf is None:  # empty split / max_batches == 0
            return 0.0
        self._visualise_val(writer, split, first_batch, epoch)
        return self._publish(writer, "logits_up", np.asarray(conf), epoch,
                             ignore)

    def _visualise_val(self, writer, split, batch, epoch):
        """Input/GT/pred/confidence panel for a fixed val batch
        (reference visualise_results on val sets, base_trainer.py:272-278)."""
        self.fixed.save(split, batch)
        imgs, lbls = self.fixed.get(split)
        from dasac_tpu.aug import photometric as P

        local = self._host_local_state()
        x = P.normalize(jnp.asarray(imgs, jnp.float32) / 255.0,
                        self.scfg.mean, self.scfg.std)
        up = self._vis_forward(local.params, local.batch_stats, x)
        panel = visualise.source_panel(x, lbls, up, self.scfg.mean,
                                       self.scfg.std)
        writer.add_image("{}/panel".format(split), panel, epoch)

    def _validation_target(self, epoch, max_batches):
        """Target-train-split validation (reference train.py:510-512, every
        LOG.ITER_TARGET epochs).  SAC: the four teacher/student layers via
        target_eval_step.  ABN baseline: a plain forward (the reference's
        step_target is ``step(train=False)``), publishing logits_up only."""
        ignore = set(self.cfg.VAL.IGNORE_CLASS)
        baseline = self.cfg.MODEL.BASELINE
        epoch_key = jax.random.fold_in(self.rng, 10_000 + epoch)
        # sharded: groups spread over the mesh and each process decodes only
        # its slice (the step psums the confusions).  Unsharded: plain jits
        # on full batches with a host-local state copy.
        on_mesh = self.sharded or self.gspmd
        local_state = None if on_mesh else self._host_local_state()
        _, tgt_loader = self.loaders.train_loaders(
            epoch, replicated_eval=not self.sharded)
        confs = None
        first_batch = None
        for bi, (imgs, lbls) in enumerate(tgt_loader):
            if max_batches and bi >= max_batches:
                break
            if bi == 0:
                first_batch = (imgs, lbls)
                self.fixed.save("train_target", (imgs, lbls))
            if on_mesh:
                imgs_g, lbls_g = self._place((imgs, lbls.astype(np.int32)))
                if baseline:
                    c = {"logits_up": self.eval_step(
                        self.state, imgs_g, lbls_g)}
                else:
                    c = self.target_eval_step(
                        self.state, imgs_g, lbls_g,
                        jax.random.fold_in(epoch_key, bi))
            elif baseline:
                c = {"logits_up": self.eval_step_local(
                    local_state, jnp.asarray(imgs),
                    jnp.asarray(lbls.astype(np.int32)))}
            else:
                c = self.target_eval_step(
                    local_state, jnp.asarray(imgs),
                    jnp.asarray(lbls.astype(np.int32)),
                    jax.random.fold_in(epoch_key, bi))
            confs = c if confs is None else jax.tree.map(
                lambda a, b: a + b, confs, c)
        if baseline:
            if first_batch is not None:  # input/GT/pred panel, like val sets
                self._visualise_val(self.writer_target, "train_target",
                                    first_batch, epoch)
        else:
            self._visualise_target(epoch)
        if confs is None:  # empty loader / max_batches == 0
            return 0.0
        best = 0.0
        for layer, conf in confs.items():
            best = max(best, self._publish(
                self.writer_target, layer, np.asarray(conf), epoch, ignore))
        return best

    def _visualise_target(self, epoch):
        """Fixed-batch diagnostic panel + per-class running_conf scalars
        (reference base_trainer.py:118-198)."""
        batch = self.fixed.get("train_target")
        if batch is None:
            return
        imgs, lbls = batch
        # ONE group suffices: the panel shows max_items (= GROUP_SIZE) views
        # anyway, and the full-batch visual forward both peaks HBM (it OOMed
        # the flagship burn-in next to the resident train state) and reads
        # multi-GB f32 tensors back through a slow H2D link
        views, refined, pseudo, student_up, diags = self.visual_step(
            self._host_local_state(), jnp.asarray(imgs[:1]),
            jnp.asarray(lbls[:1].astype(np.int32)),
            jax.random.fold_in(self.rng, 777))
        panel = visualise.target_panel(
            views, refined, pseudo, student_up,
            self.scfg.mean, self.scfg.std, diags=diags)
        self.writer_target.add_image("train_target/panel", panel, epoch)
        rc = np.asarray(self.state.running_conf)
        for ni, cname in enumerate(self.class_names):
            self.writer_target.add_scalar(
                "running_conf/{:02d}_{}".format(ni, cname), rc[ni], epoch)

    def _publish(self, writer, layer, conf, epoch, ignore):
        iou, pr, re = summarise(conf)
        keep = [i for i in range(self.nclass) if i not in ignore]
        for ni, cname in enumerate(self.class_names):
            label = "{}_{:02d}_{}".format(layer, ni, cname)
            writer.add_scalar("{}/IoU".format(label), iou[ni], epoch)
            writer.add_scalar("{}/Precision".format(label), pr[ni], epoch)
            writer.add_scalar("{}/Recall".format(label), re[ni], epoch)
        miou = float(np.mean(iou[keep]))
        writer.add_scalar("{}_all/mIoU".format(layer), miou, epoch)
        writer.add_scalar("{}_all/Precision".format(layer),
                          float(np.mean(pr[keep])), epoch)
        writer.add_scalar("{}_all/Recall".format(layer),
                          float(np.mean(re[keep])), epoch)
        print("[{}] mIoU {:.3f}".format(layer, miou))
        return miou

    # ------------------------------------------------------------------- fit

    def fit(self, num_epochs=None, snapshot=True):
        cfg = self.cfg
        num_epochs = num_epochs or cfg.TRAIN.NUM_EPOCHS
        log_val = cfg.LOG.ITER_VAL
        log_target = cfg.LOG.ITER_TARGET
        for epoch in range(self.start_epoch, num_epochs + 1):
            print("Epoch >>> {:02d} <<<".format(epoch))
            # target-split validation runs for BOTH modes (the reference's
            # baseline uses step_target = step(train=False), train.py:115)
            if epoch > self.start_epoch and epoch % log_target == 0:
                self.validation(epoch, cfg.TRAIN.TARGET, max_batches=300,
                                target_mode=True)
            if epoch > self.start_epoch and epoch % log_val == 0:
                score = 0.0
                for vs in self.loaders.val:
                    s = self.validation(epoch, vs)
                    if vs == self.loaders.testset:
                        score += s
                if snapshot and self.is_main:
                    saved = self.best.update(self.state, score, epoch)
                    if saved:
                        print("New best snapshot: {}".format(saved))
            self.train_epoch(epoch)
            if snapshot and self.is_main:
                # rolling preemption-safe snapshot after every epoch
                self.checkpointer.save_latest(self.state, self.best.best,
                                              epoch + 1)
        return self.state


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def close(self):
        pass


def _auto_mesh_size(available, batch_size, num_groups):
    n = min(available, batch_size, num_groups)
    while n > 1 and (batch_size % n or num_groups % n):
        n -= 1
    return max(1, n)


