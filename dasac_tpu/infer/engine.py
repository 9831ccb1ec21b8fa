"""Inference engine: full-resolution single- or multi-scale (+flip)
evaluation and Cityscapes export (reference infer_val.py:50-184, extended
with the multi-scale+flip protocol).

Exports per image:
  * ``<name>.png``        — trainId mask, paletted PNG (pixel values ARE the
                            trainIds, so it is bit-compatible with the
                            reference's uint8 export while rendering in color)
  * ``cs/<name>.png``     — Cityscapes labelId mask (for the official
                            evalPixelLevelSemanticLabeling tool)
  * ``raw/<name>.npz``    — softmax probabilities (optional)
  * ``vis/<name>.png``    — overlay visualisation (optional)
"""

import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dasac_tpu.aug import photometric as P
from dasac_tpu.data import lists
from dasac_tpu.data.category import (colorize, train_palette,
                                     trainid_to_cs_table)
from dasac_tpu.nn.functional import resize_bilinear_align_corners
from dasac_tpu.train.metrics import confusion_matrix


class InferDataset:
    """Full-resolution loader for an infer list (reference DLInfer /
    DLCityscapesInfer, dataloader_infer.py:30-124).

    Frames are standardized to the split's canonical size (GTA val frames
    vary slightly per file — the reference resizes them too), which keeps
    the jitted forward at ONE static shape instead of recompiling per
    unique (H, W).  Decode goes through the native C++ path when available.
    """

    def __init__(self, root, split, cityscapes_names=False, list_dir=None):
        from dasac_tpu.data.host_loader import SegDataset

        from dasac_tpu.data.factory import _split_size

        self.images, self.masks = lists.read_split(root, split,
                                                   list_dir=list_dir)
        self.cityscapes_names = cityscapes_names
        # canonical split size, but never force a huge upscale on
        # small (synthetic/test) frames — same guard as the train factory
        self.out_hw = _split_size(split, self.images)
        self._ds = SegDataset(self.images, self.masks, self.out_hw,
                              mode="resize")

    def __len__(self):
        return len(self.images)

    def name(self, i):
        base = os.path.splitext(os.path.basename(self.images[i]))[0]
        if self.cityscapes_names:
            base = base.replace("_leftImg8bit", "_gtFine_labelIds")
        return base

    def load(self, i):
        return self._ds.load(i)

    def load_batch(self, idxs, pool=None, threads=4):
        return self._ds.load_batch(idxs, pool=pool, threads=threads)


def make_infer_fn(model, mean, std, scales=(1.0,), flip=False, fuse="full",
                  output="probs"):
    """Jittable (variables, uint8 [1,H,W,3]) -> averaged softmax [1,H,W,C].

    Scale factors resize the input (bilinear); each scale's logits are
    upsampled back to native resolution with align_corners=True (matching the
    model's own upsampling convention) and the softmax maps are averaged;
    with ``flip`` each scale also runs on the mirrored image.

    The mirrored view is CONCATENATED along batch with the unmirrored one —
    one forward at 2x batch instead of two sequential forwards (the weights
    and spatial shape are shared, samples are independent, BN is frozen, so
    the probabilities are identical; the small scales otherwise leave the
    MXU underfed — measured in PARITY.md's multi-scale serving row).

    ``fuse`` picks where the scale fusion happens:
      * ``"full"``    — reference protocol: every scale's logits are
        upsampled to native resolution, softmaxed there, and the
        full-resolution probability maps are averaged.
      * ``"stride8"`` — the heads stay on the trunk's native stride-8 grid:
        each scale's RAW logits are resampled (align-corners) to the
        largest scale's stride-8 grid, softmaxed and averaged THERE, and
        the fused probabilities are upsampled once at the end.  The model
        carries no information below stride 8, so — exactly like the
        adopted ``TPU.REFINE_RES=stride8`` training chain (PARITY.md) —
        the two protocols differ only by the order of the bilinear
        smoothing vs the softmax nonlinearity: a label-boundary band
        effect.  It deletes ``2 x len(scales) - 1`` full-resolution
        upsample+softmax chains per step; stability + measured numbers in
        PARITY.md.  Default stays the reference-exact ``"full"``.

    ``output`` picks the program's result:
      * ``"probs"``  — the averaged probability volume (default; needed
        for ``save_raw`` and for any downstream fusion).
      * ``"argmax"`` — the uint8 trainId mask [B,H,W]: the final argmax
        fuses INTO the program, so the full-resolution f32 [B,H,W,C]
        volume (1.28 GB at batch 8, Cityscapes val — the top two writes
        in the single-scale HLO traffic ranking) is never materialised
        in HBM and the program's output shrinks ~80x.  In the
        single-scale unflipped ``fuse="full"`` case the softmax is also
        skipped (argmax-invariant, bit-exact); everywhere else the
        probability averaging is unchanged and only the final argmax
        moves on-device-into-program.
    """
    assert fuse in ("full", "stride8"), fuse
    assert output in ("probs", "argmax"), output
    # argmax(softmax(up)/denom) == argmax(up): skip the softmax entirely
    # when nothing is averaged and the caller only wants labels
    skip_softmax = (output == "argmax" and fuse == "full"
                    and len(scales) == 1 and not flip)

    def _finish(p):
        if output == "argmax":
            return jnp.argmax(p, axis=-1).astype(jnp.uint8)
        return p

    def fn(variables, image_u8):
        x = P.normalize(image_u8.astype(jnp.float32) / 255.0, mean, std)
        b, h, w = x.shape[0], x.shape[1], x.shape[2]

        def scaled(s):
            if s == 1.0:
                return x
            sh, sw = int(round(h * s)), int(round(w * s))
            return jax.image.resize(x, (x.shape[0], sh, sw, 3), "linear")

        def forward(xi, want_raw):
            raw, up = model.apply(variables, xi, train=False,
                                  update_stats=False)
            if want_raw:
                return raw  # stride-8 logits; XLA dead-code-eliminates `up`
            up = resize_bilinear_align_corners(up, (h, w))
            if skip_softmax:
                return up
            return jax.nn.softmax(up, axis=-1)

        if fuse == "stride8":
            logits = [forward(jnp.concatenate([xs, xs[:, :, ::-1, :]], 0)
                              if flip else xs, True)
                      for xs in map(scaled, scales)]
            # common grid = the largest scale's stride-8 grid
            tgt = max(((lg.shape[1], lg.shape[2]) for lg in logits),
                      key=lambda s: s[0] * s[1])
            acc = None
            for lg in logits:
                p = jax.nn.softmax(
                    resize_bilinear_align_corners(lg, tgt), axis=-1)
                if flip:
                    p = p[:b] + p[b:][:, :, ::-1, :]
                acc = p if acc is None else acc + p
            denom = len(scales) * (2 if flip else 1)
            return _finish(resize_bilinear_align_corners(acc / denom,
                                                         (h, w)))

        acc = None
        for xs in map(scaled, scales):
            if flip:
                both = forward(jnp.concatenate(
                    [xs, xs[:, :, ::-1, :]], axis=0), False)
                p = both[:b] + both[b:][:, :, ::-1, :]
            else:
                p = forward(xs, False)
            acc = p if acc is None else acc + p
        denom = len(scales) * (2 if flip else 1)
        return _finish(acc / denom)

    return fn


class ResultWriter:
    """Async PNG/npz export (reference ResultWriter + mp.Pool,
    infer_val.py:70-109,160)."""

    def __init__(self, out_dir, save_cs=True, save_raw=False, vis=False,
                 workers=4):
        self.out_dir = out_dir
        self.save_cs = save_cs
        self.save_raw = save_raw
        self.vis = vis
        os.makedirs(out_dir, exist_ok=True)
        if save_cs:
            os.makedirs(os.path.join(out_dir, "cs"), exist_ok=True)
        if save_raw:
            os.makedirs(os.path.join(out_dir, "raw"), exist_ok=True)
        if vis:
            os.makedirs(os.path.join(out_dir, "vis"), exist_ok=True)
        self._palette = train_palette()
        self._t2c = trainid_to_cs_table()
        self._pool = ThreadPoolExecutor(workers)
        self._futures = []

    def submit(self, pred, image_u8, name, probs=None):
        """``pred``: uint8 [H,W] trainId mask (argmax already taken — on
        DEVICE by run_inference, so the per-image D2H readback is 2 MB of
        uint8 instead of an 80x larger f32 probability volume).  ``probs``
        is only needed (and only fetched) for ``save_raw``."""
        self._futures.append(
            self._pool.submit(self._write, np.asarray(pred),
                              np.asarray(image_u8), name,
                              None if probs is None else np.asarray(probs)))

    def _write(self, pred, image_u8, name, probs=None):
        pal_img = Image.fromarray(pred, mode="P")
        pal_img.putpalette(self._palette)
        pal_img.save(os.path.join(self.out_dir, name + ".png"))
        if self.save_cs:
            cs = self._t2c[pred]
            Image.fromarray(cs).save(
                os.path.join(self.out_dir, "cs", name + ".png"))
        if self.save_raw:
            assert probs is not None
            np.savez_compressed(
                os.path.join(self.out_dir, "raw", name + ".npz"),
                raw=probs.astype(np.float16))
        if self.vis:
            overlay = (0.3 * image_u8 + 0.7 * colorize(pred)).astype(np.uint8)
            Image.fromarray(overlay).save(
                os.path.join(self.out_dir, "vis", name + ".png"))
        return name

    def close(self):
        for f in self._futures:
            f.result()
        self._pool.shutdown()


def infer_mesh(batch_size=None, spatial=False):
    """(mesh, shard, b, n_sp): the inference mesh layout for a mode —
    shared by :func:`run_inference` and ``tools/bench_infer`` so the
    serving benchmark measures exactly the layouts inference runs.

    ``spatial`` False/0: 1-D 'data' mesh, batch ``b`` sharded over it
    (devices trimmed to ``b`` when the batch is smaller, batch trimmed
    DOWN to the nearest mesh multiple otherwise).  ``spatial`` True/-1:
    ALL devices on one frame's height.  ``spatial`` N: combined 2-D
    ``(data, sp)`` mesh — N chips per frame; the data axis honors a
    smaller explicit ``batch_size`` by trimming devices, like the batch
    path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = jax.local_devices()
    if spatial:
        n_sp = (len(devices) if spatial is True or int(spatial) < 0
                else int(spatial))
        assert len(devices) % n_sp == 0, (
            "spatial=%d must divide the %d-device mesh"
            % (n_sp, len(devices)))
        n_data = len(devices) // n_sp
        if batch_size:
            n_data = min(n_data, batch_size)
        b = batch_size or n_data
        b = max(n_data, (b // n_data) * n_data)
        mesh = Mesh(np.array(devices[:n_data * n_sp]).reshape(n_data, n_sp),
                    ("data", "sp"))
        shard = NamedSharding(mesh, P("data", "sp"))
    else:
        n_sp = 0
        b = batch_size or len(devices)
        devices = devices[:min(len(devices), b)]
        if b % len(devices) != 0:
            # batch must tile the mesh evenly: trim the batch DOWN to the
            # nearest multiple rather than collapsing to one device (a
            # 12-image batch on 8 chips runs as 8, not as 12 on one chip)
            b = (b // len(devices)) * len(devices)
        mesh = Mesh(np.array(devices), ("data",))
        shard = NamedSharding(mesh, P("data"))
    return mesh, shard, b, n_sp


def run_inference(model, variables, dataset, out_dir, *, mean, std,
                  num_classes=19, scales=(1.0,), flip=False, save_cs=True,
                  save_raw=False, vis=False, workers=4, verbose=True,
                  progress_every=50, batch_size=None, spatial=False,
                  fuse="full"):
    """Full loop: forward every image, export, accumulate the confusion
    matrix when ground truth is present.  Returns (conf [C,C] or None).

    Mesh-parallel: images batch to ``batch_size`` (default: one per local
    device) and shard over a 1-D device mesh — the data-parallel counterpart
    of the reference's nn.DataParallel (infer_val.py:150) — with host decode
    prefetched one batch ahead and PNG export async behind.

    ``spatial`` shards the image HEIGHT over the mesh (GSPMD inserts the
    conv halo exchanges), cutting per-image latency where batching cannot
    (no reference counterpart — nn.DataParallel only splits batches).
    ``True`` (or -1) puts ALL chips on one frame; an int N builds a
    combined 2-D ``(data, sp)`` mesh — N chips cooperate per frame while
    ``devices/N`` frames run in parallel (the throughput/latency
    trade-off dial).  Heights that do not tile the sp axis are edge-padded
    to the next multiple and the output sliced back — the forward then
    runs at a marginally taller canvas (sub-pixel interpolation shifts;
    bit-identical at divisible sizes).

    ``fuse="stride8"`` fuses the multi-scale averaging on the stride-8
    grid (see :func:`make_infer_fn`); the default ``"full"`` is the
    reference-exact protocol.

    Unless ``save_raw`` asks for the probability volumes, the program
    returns the fused on-device argmax directly (``make_infer_fn``
    ``output="argmax"``, label-exact): the full-resolution f32 [B,H,W,C]
    volume never materialises between programs, and only uint8 masks
    cross D2H.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dasac_tpu.data import host_loader

    mesh, shard, b, n_sp = infer_mesh(batch_size, spatial)
    repl = NamedSharding(mesh, P())
    variables = jax.device_put(variables, repl)

    output = "probs" if save_raw else "argmax"
    infer_fn = jax.jit(make_infer_fn(model, mean, std, scales, flip, fuse,
                                     output=output),
                       in_shardings=(repl, shard), out_shardings=shard)
    # argmax ON DEVICE: the writer needs the uint8 trainId mask, so read
    # back 2 MB of preds per frame instead of the f32 [H,W,C] probability
    # volume (~80x more D2H at C=19; full probs only cross when save_raw)
    argmax_fn = jax.jit(lambda p: jnp.argmax(p, axis=-1).astype(jnp.uint8))

    writer = ResultWriter(out_dir, save_cs=save_cs, save_raw=save_raw,
                          vis=vis, workers=workers)
    have_gt = any(m is not None for m in dataset.masks)
    conf = None

    n = len(dataset)
    loader = host_loader.padded_plain_loader(dataset, b, threads=workers,
                                             prefetch=2)

    for bi, (imgs, masks) in enumerate(loader):
        # spatial sharding requires the height to tile the sp axis evenly
        # (GTA's canonical 1052 px does not at 8 devices): pad
        # edge-replicated rows up to the next multiple and slice them off
        # the output.  The extra rows only perturb the receptive-field
        # context of the last few true rows.
        h_img = imgs.shape[1]
        h_pad = (-h_img % n_sp) if n_sp else 0
        if h_pad:
            imgs = np.pad(imgs, ((0, 0), (0, h_pad), (0, 0), (0, 0)),
                          mode="edge")
        if save_raw:
            probs = infer_fn(variables, jax.device_put(imgs, shard))
            preds = argmax_fn(probs)
        else:
            probs = None
            preds = infer_fn(variables, jax.device_put(imgs, shard))
        if h_pad:
            preds = preds[:, :h_img]
            imgs = imgs[:, :h_img]
        if have_gt:
            c = confusion_matrix(
                preds, jnp.asarray(masks.astype(np.int32)), num_classes)
            conf = c if conf is None else conf + c
        preds_np = np.asarray(preds)  # ONE batched uint8 D2H readback
        probs_np = (np.asarray(probs[:, :h_img] if h_pad else probs)
                    if probs is not None else None)
        for k in range(b):
            i = bi * b + k
            if i >= n:
                break
            writer.submit(preds_np[k], imgs[k], dataset.name(i),
                          probs=None if probs_np is None else probs_np[k])
        if verbose and (bi * b) % progress_every < b:
            print("[{:4d}/{:4d}] {}".format(min(bi * b + 1, n), n,
                                            dataset.name(min(bi * b, n - 1))))
    writer.close()
    return None if conf is None else np.asarray(conf)
