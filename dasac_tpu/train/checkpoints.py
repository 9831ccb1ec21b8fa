"""Checkpoint management: best-N snapshots of the full train state.

Parity with the reference Checkpoint (utils/checkpoints.py:12-74): keeps the
top ``max_n`` snapshots named ``epoch{E:03d}_score{S:4.3f}``, stores
{state, score, epoch}; loading restores the whole algorithm state including
the EMA teacher and running_conf (SURVEY.md §5 checkpoint/resume).

Also loads reference ``.pth`` snapshots (student/teacher/buffers) through
the torch converter so released da-sac models seed this framework.
"""

import os
import pickle

import jax
import numpy as np
from flax import serialization


class NullTx:
    """Optimizer stand-in for load-only state construction (inference,
    export): satisfies create_train_state's tx.init contract with an empty
    opt_state."""

    def init(self, params):
        return ()


class Checkpointer:
    def __init__(self, path, max_n=3):
        self.path = path
        self.max_n = max_n
        self.kept = []
        if path:
            os.makedirs(path, exist_ok=True)

    def _file(self, suffix):
        return os.path.join(self.path, suffix + ".ckpt")

    def save(self, state, score, epoch):
        suffix = "epoch{:03d}_score{:4.3f}".format(epoch, score)
        fn = self._file(suffix)
        if not os.path.isfile(fn):
            payload = {
                "state": serialization.to_bytes(state),
                "score": float(score),
                "epoch": int(epoch),
            }
            with open(fn, "wb") as f:
                pickle.dump(payload, f)
        self.kept.append(suffix)
        n_rm = max(0, len(self.kept) - self.max_n)
        for suffix_rm in self.kept[:n_rm]:
            old = self._file(suffix_rm)
            if os.path.isfile(old):
                os.remove(old)
        self.kept = self.kept[n_rm:]
        return fn

    def save_latest(self, state, score, epoch):
        """Rolling preemption-safe snapshot (atomic rename) — the reference
        has no fault tolerance beyond manual --resume (SURVEY.md §5)."""
        fn = os.path.join(self.path, "last.ckpt")
        tmp = fn + ".tmp"
        payload = {
            "state": serialization.to_bytes(state),
            "score": float(score),
            "epoch": int(epoch),
        }
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, fn)
        return fn

    def latest_path(self):
        fn = os.path.join(self.path, "last.ckpt")
        return fn if os.path.isfile(fn) else None

    def load(self, path, state_template):
        """Returns (state, epoch, score).  ``path`` may be a .ckpt of ours or
        a reference .pth snapshot."""
        if path.endswith(".pth"):
            return self._load_torch(path, state_template)
        with open(path, "rb") as f:
            payload = pickle.load(f)
        raw = serialization.msgpack_restore(payload["state"])
        fields = {}
        for name, stored in raw.items():
            tmpl = getattr(state_template, name)
            if name == "opt_state" and _is_empty(tmpl):
                continue  # inference-time template carries no optimizer
            fields[name] = serialization.from_state_dict(tmpl, stored)
        state = state_template.replace(**fields)
        return state, payload.get("epoch", 0), payload.get("score", -1e16)

    def _load_torch(self, path, state_template, arch=None):
        from dasac_tpu.nn import convert

        if arch is None:
            arch = getattr(self, "arch", None)
        assert arch, "set checkpointer.arch before loading .pth snapshots"
        data = convert.load_torch_file(path)
        model_sd = data.get("model", data)
        student_sd, teacher_sd, extras = convert.split_sac_snapshot(model_sd)
        if not student_sd:  # bare state_dict without backbone. prefix
            student_sd = model_sd

        variables = {"params": state_template.params,
                     "batch_stats": state_template.batch_stats}
        new_vars, n_s, _ = convert.apply_state_dict(
            variables, student_sd, arch, "reference")
        state = state_template.replace(
            params=new_vars["params"], batch_stats=new_vars["batch_stats"])

        if teacher_sd:
            tvars = {"params": state_template.teacher_params,
                     "batch_stats": state_template.teacher_stats}
            new_t, n_t, _ = convert.apply_state_dict(
                tvars, teacher_sd, arch, "reference")
            state = state.replace(teacher_params=new_t["params"],
                                  teacher_stats=new_t["batch_stats"])
        else:
            # strict=False semantics: ABN snapshots carry no teacher; it
            # stays at init until the first EMA update copies the student
            pass
        if "running_conf" in extras:
            state = state.replace(
                running_conf=jax.numpy.asarray(
                    extras["running_conf"], jax.numpy.float32))
        if "slow_init" in extras:
            state = state.replace(
                slow_init=jax.numpy.asarray(
                    np.asarray(extras["slow_init"]).reshape(())[()],
                    jax.numpy.float32))
        opt = data.get("opt") if isinstance(data, dict) else None
        if opt and not _is_empty(state_template.opt_state):
            # training resume: continue the reference's SGD momentum
            # (reference utils/checkpoints.py:54) instead of restarting it
            from dasac_tpu.tools.export_torch import import_opt_state

            new_opt, n_m = import_opt_state(opt, state.opt_state, arch)
            if n_m:
                state = state.replace(opt_state=new_opt)
        epoch = int(data.get("epoch", 0)) if isinstance(data, dict) else 0
        score = float(data.get("score", -1e16)) if isinstance(data, dict) else -1e16
        return state, epoch, score


def _is_empty(tree):
    return len(jax.tree.leaves(tree)) == 0


class BestTracker:
    """checkpoint_best logic (base_trainer.py:37-45)."""

    def __init__(self, checkpointer, best=-1e16):
        self.checkpointer = checkpointer
        self.best = best

    def update(self, state, score, epoch):
        if score > self.best:
            self.best = score
            return self.checkpointer.save(state, score, epoch)
        return None
