"""Observability: scalar/image writers (reference base_trainer.py TB usage,
SURVEY.md §5 metrics/logging).

Every scalar goes to a JSONL event log (machine-readable, survives without
tensorboard); when torch's SummaryWriter is importable the same scalars are
mirrored to TensorBoard so the reference's monitoring workflow carries over.
"""

import json
import os
import time


class ScalarWriter:
    def __init__(self, logdir, use_tensorboard=True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "events.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag, value, step):
        rec = {"t": time.time(), "tag": tag, "value": float(value),
               "step": int(step)}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def add_image(self, tag, image_hwc, step):
        """uint8 [H,W,3]; saved as PNG next to the log + mirrored to TB."""
        from PIL import Image
        import numpy as np

        arr = np.asarray(image_hwc)
        d = os.path.join(self.logdir, "images")
        os.makedirs(d, exist_ok=True)
        Image.fromarray(arr).save(
            os.path.join(d, "{}_{:06d}.png".format(
                tag.replace("/", "_"), int(step))))
        if self._tb is not None:
            self._tb.add_image(tag, arr, int(step), dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
