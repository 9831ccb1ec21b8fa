"""Host-side decode + prefetch pipeline feeding uint8 batches to the device.

Replaces torch DataLoader workers (the reference's multiprocess PIL pipeline)
with a thread pool: PIL decode releases the GIL in its C core, geometric and
photometric augmentation happens on-device (dasac_tpu/aug), so the host only
decodes, optionally resizes/crops, and stacks uint8 arrays.  Batches are
prefetched ahead of the training step (SURVEY.md §7 hard part #4).

When the native C++ decoder (dasac_tpu/data/native.py) is available it is
used instead of PIL for PNG decode + resize.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

from dasac_tpu.data.category import IGNORE_LABEL


def _load_pair(img_path, mask_path, out_hw, mode):
    """Decode one (image, mask) pair to uint8 arrays sized ``out_hw``."""
    if (mode == "resize" and out_hw is not None
            and img_path.endswith(".png")
            and (mask_path is None or mask_path.endswith(".png"))):
        from dasac_tpu.data import native

        res = native.decode_pair(img_path, mask_path, out_hw,
                                 mask_fill=IGNORE_LABEL)
        if res is not None:
            return res
        # fall through to PIL for formats the native decoder rejects

    img = Image.open(img_path).convert("RGB")
    if mask_path is None:
        mask = Image.new("L", img.size, IGNORE_LABEL)
    else:
        mask = Image.open(mask_path)
        # P-mode masks carry trainIds as palette INDICES (the native decoder
        # returns them raw, and our own inference engine exports this
        # format); convert("L") would take the luminance of the palette
        # colors instead — keep it only for true grayscale/RGB masks
        if mask.mode != "P":
            mask = mask.convert("L")
    assert img.size == mask.size, (img_path, img.size, mask.size)

    if mode == "native":
        pass
    elif mode == "resize":
        if out_hw is not None and (img.size[1], img.size[0]) != tuple(out_hw):
            img = img.resize((out_hw[1], out_hw[0]), Image.BILINEAR)
            mask = mask.resize((out_hw[1], out_hw[0]), Image.NEAREST)
    elif mode == "center_crop":
        img = _center_crop(img, out_hw, fill=0)
        mask = _center_crop(mask, out_hw, fill=IGNORE_LABEL)
    else:
        raise ValueError(mode)
    return np.asarray(img, np.uint8), np.asarray(mask, np.uint8)


def _center_crop(im, out_hw, fill=0):
    th, tw = out_hw
    w, h = im.size
    if w < tw or h < th:
        new = Image.new(im.mode, (max(w, tw), max(h, th)),
                        fill if im.mode in ("L", "P") else (fill,) * 3)
        new.paste(im, ((max(w, tw) - w) // 2, (max(h, th) - h) // 2))
        im = new
        w, h = im.size
    left = (w - tw) // 2
    top = (h - th) // 2
    return im.crop((left, top, left + tw, top + th))


class SegDataset:
    """File lists + decode policy for one split."""

    def __init__(self, images, masks, out_hw, mode="resize"):
        self.images = images
        self.masks = masks
        self.out_hw = tuple(out_hw) if out_hw is not None else None
        self.mode = mode
        self.num_samples = len(images)  # may be overridden (epoch alignment)

    def set_num_samples(self, n):
        self.num_samples = n

    def __len__(self):
        return self.num_samples

    def load(self, i):
        if i < 0:
            # padding sample (fills a partial tail batch): contributes nothing
            assert self.out_hw is not None
            return (np.zeros((*self.out_hw, 3), np.uint8),
                    np.full(self.out_hw, IGNORE_LABEL, np.uint8))
        i = i % len(self.images)
        return _load_pair(self.images[i], self.masks[i], self.out_hw, self.mode)

    def _native_eligible(self, i):
        return (i >= 0 and self.mode == "resize" and self.out_hw is not None
                and self.images[i % len(self.images)].endswith(".png")
                and (self.masks[i % len(self.images)] is None
                     or self.masks[i % len(self.images)].endswith(".png")))

    def load_batch(self, idxs, pool=None, threads=8):
        """Decode a whole batch, preferring ONE call into the C++ thread
        pool (decode+unfilter+resize with the GIL released for the entire
        batch); per-sample failures and non-PNG/crop samples fall back to
        the Python path.  Returns list[(img, mask)] ordered like ``idxs``."""
        from dasac_tpu.data import native

        out = [None] * len(idxs)
        sel = [j for j, i in enumerate(idxs) if self._native_eligible(i)]
        if sel and native.available():
            ii = [idxs[j] % len(self.images) for j in sel]
            res = native.decode_batch(
                [self.images[i] for i in ii], [self.masks[i] for i in ii],
                self.out_hw, threads=threads, mask_fill=IGNORE_LABEL)
            if res is not None:
                imgs, masks, status = res
                for k, j in enumerate(sel):
                    if status[k] == 0:
                        out[j] = (imgs[k], masks[k])
        rest = [j for j in range(len(idxs)) if out[j] is None]
        if rest:
            loaded = (pool.map(self.load, [idxs[j] for j in rest]) if pool
                      else map(self.load, [idxs[j] for j in rest]))
            for j, pair in zip(rest, loaded):
                out[j] = pair
        return out

    def mask_basenames(self):
        import os

        return [None if m is None else os.path.basename(m) for m in self.masks]


class PrefetchLoader:
    """Iterates batches of decoded samples with thread-pool prefetch.

    ``index_fn(batch_idx) -> list[int]`` decides which samples form a batch
    (plain slicing for source/val; importance sampling for target groups).
    """

    def __init__(self, dataset, batch_size, num_batches, index_fn,
                 threads=8, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_batches = num_batches
        self.index_fn = index_fn
        self.threads = threads
        self.prefetch = max(1, prefetch)

    def __len__(self):
        return self.num_batches

    def _assemble(self, pool, bi):
        idxs = self.index_fn(bi)
        pairs = self.dataset.load_batch(idxs, pool, self.threads)
        imgs = np.stack([p[0] for p in pairs])
        msks = np.stack([p[1] for p in pairs])
        return imgs, msks

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            # stop-aware put: a plain q.put blocks forever when the consumer
            # abandons the iterator (e.g. validation's max_batches break),
            # leaking the producer thread and its pool
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # exceptions (corrupt file, transient FS error) are forwarded to
            # the consumer instead of silently killing this thread — a dead
            # producer with no sentinel would hang the training job forever
            try:
                with ThreadPoolExecutor(self.threads) as pool:
                    for bi in range(self.num_batches):
                        if stop.is_set() or not put(self._assemble(pool, bi)):
                            return
                put(None)
            except BaseException as e:  # noqa: B036 — re-raised in consumer
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def padded_plain_loader(dataset, batch_size, threads, prefetch,
                        max_batches=None, num_replicas=1, rank=0):
    """Sequential loader over the whole dataset with the tail batch padded by
    all-ignore dummies (index -1), keeping batch shapes static without
    double-counting images (shared by validation and inference).

    Multi-host: with ``num_replicas``/``rank`` each process decodes only its
    contiguous ``batch_size`` slice of every global batch (global stride =
    batch_size * num_replicas), so the pod's assembled batches cover each
    image exactly once; all ranks see the same batch count.  The loader's
    ``n_real`` attribute counts this rank's non-dummy samples."""
    n = len(dataset)
    stride = batch_size * num_replicas
    num_batches = -(-n // stride)
    if max_batches:
        num_batches = min(num_batches, max_batches)
    idx = np.full(num_batches * stride, -1, np.int64)
    take = min(n, len(idx))
    idx[:take] = np.arange(take)
    # this rank's interleaved view: batch bi -> global[bi*stride + rank*bs :]
    local = idx.reshape(num_batches, num_replicas, batch_size)[:, rank, :]
    local = local.reshape(-1)
    loader = PrefetchLoader(dataset, batch_size, num_batches,
                            make_plain_index_fn(local, batch_size),
                            threads=threads, prefetch=prefetch)
    loader.n_real = int((local >= 0).sum())
    return loader


def make_plain_index_fn(sampler_indices, batch_size):
    idx = np.asarray(sampler_indices)

    def fn(bi):
        return idx[bi * batch_size:(bi + 1) * batch_size].tolist()

    return fn


def make_importance_index_fn(importance, order, batch_size, epoch, seed=0):
    """Target-group batches: each slot draws an image by class-uniform
    importance sampling, seeded deterministically per (epoch, slot)."""

    def fn(bi):
        out = []
        for k in range(batch_size):
            slot = int(order[(bi * batch_size + k) % len(order)])
            rng = np.random.RandomState(
                (seed * 9973 + epoch * 131071 + slot) % (2**31 - 1))
            out.append(importance.sample(slot, rng))
        return out

    return fn
