"""Batch assembly: padded static-shape collate + background-prefetch loader.

Behavioral parity target: cerberusdet/data/dataloaders.py (create_dataloader
:39-93, InfiniteDataLoader :96-112) and LoadImagesAndLabels.collate_fn
(datasets.py:440-459). Differences by design (TPU-first):
  * The collate pads labels to `max_labels` per image and emits a dense
    {img, cls, prob, bboxes, mask} dict — static shapes end-to-end, no
    (batch_idx, ragged rows) indirection.
  * Prefetch is a thread pipeline: decode/augment (cv2 releases the GIL) runs
    on a pool, batches are assembled in order (this host feeds one accelerator
    process; torch's worker-process pool is unnecessary machinery here).
    Determinism holds under any thread schedule because the dataset derives
    its augmentation RNG per (seed, epoch, index), not from global state.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from cerberusdet_tpu.data.dataset import DetectionDataset
from cerberusdet_tpu.data.samplers import BalancedSampler, HostShardSampler, ShuffleSampler

# ------------------------------------------------------- process workers
# The reference scales decode/augment with torch DataLoader worker PROCESSES
# (dataloaders.py:96-112). The default here is a thread pool (cv2 and the
# native decoder drop the GIL), but the python-level mosaic/label work can
# GIL-cap a many-core host — num_workers > 0 switches to a process pool.
# Each worker holds its own dataset replica (sent once at pool start);
# samples stay deterministic because augmentation RNG is a pure function of
# (seed, epoch, index), which travels WITH each request — worker scheduling
# cannot perturb results.
_WORKER_DS: Optional[DetectionDataset] = None

# HBM bytes claimed by device-resident packs across ALL loaders in this
# process (multi-task training builds one loader per task; the residency
# budget must bound the TOTAL, not each pack individually)
_RESIDENT_CLAIMED = 0
_RESIDENT_LOCK = threading.Lock()

_SET_ROW = None


def _set_row(img, i, row):
    """img[i] = row[0] on device, donating img — XLA updates the batch
    buffer in place (used by the rare blur/median per-sample patch-ups)."""
    global _SET_ROW
    if _SET_ROW is None:
        import functools

        import jax

        @functools.partial(jax.jit, donate_argnums=0)
        def f(img, i, row):
            return img.at[i].set(row[0])

        _SET_ROW = f
    return _SET_ROW(img, i, row)


def _init_worker(dataset: DetectionDataset) -> None:
    global _WORKER_DS
    _WORKER_DS = dataset
    try:  # cv2 threads x worker processes oversubscribe; 1 thread per worker
        import cv2

        cv2.setNumThreads(0)
    except Exception:
        pass


def _worker_getitem(epoch: int, index: int):
    _WORKER_DS.epoch = epoch
    return _WORKER_DS[index]


def _worker_getplan(epoch: int, index: int):
    from cerberusdet_tpu.data.device_augment import plan_sample

    _WORKER_DS.epoch = epoch
    return plan_sample(_WORKER_DS, index)


def pad_labels(labels: List[np.ndarray], max_labels: int) -> Dict[str, np.ndarray]:
    """Dense-pad per-sample (n, 6) [cls, prob, xywhn] label arrays to
    {'cls': (B,M) i32, 'prob': (B,M) f32, 'bboxes': (B,M,4) f32,
    'mask': (B,M) bool}. Shared by the host collate and the device-augment
    collate so batch semantics cannot drift apart."""
    b = len(labels)
    cls = np.zeros((b, max_labels), np.int32)
    prob = np.zeros((b, max_labels), np.float32)
    boxes = np.zeros((b, max_labels, 4), np.float32)
    mask = np.zeros((b, max_labels), bool)
    for i, lb in enumerate(labels):
        n = min(len(lb), max_labels)
        if n:
            cls[i, :n] = lb[:n, 0].astype(np.int32)
            prob[i, :n] = lb[:n, 1]
            boxes[i, :n] = lb[:n, 2:6]
            mask[i, :n] = True
    return {"cls": cls, "prob": prob, "bboxes": boxes, "mask": mask}


def collate(samples: List[tuple], max_labels: int = 300) -> Dict[str, Any]:
    """[(img, labels (n,6), meta)] -> dense batch dict.

    Returns {'img': (B,H,W,3) uint8, 'cls': (B,M) i32, 'prob': (B,M) f32,
    'bboxes': (B,M,4) f32 xywhn, 'mask': (B,M) bool, 'meta': [meta...]}."""
    imgs = np.stack([s[0] for s in samples])
    out = pad_labels([s[1] for s in samples], max_labels)
    out["img"] = imgs
    out["meta"] = [s[2] for s in samples]
    return out


class DataLoader:
    """Sampler-driven batched loader with optional thread prefetch. Drops the
    last partial batch when `drop_last` (static batch shapes for jit)."""

    def __init__(self, dataset: DetectionDataset, batch_size: int, sampler=None,
                 max_labels: int = 300, drop_last: bool = True,
                 prefetch: int = 3, num_threads: Optional[int] = None,
                 num_workers: int = 0, device_augment: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler if sampler is not None else ShuffleSampler(len(dataset), False)
        self.max_labels = max_labels
        self.drop_last = drop_last
        self.prefetch = prefetch
        if num_threads is None:
            num_threads = min(8, os.cpu_count() or 1)
        self.num_threads = max(num_threads, 1)
        self.num_workers = max(num_workers, 0)  # >0: process pool
        self._pool = None
        # device_augment: workers emit pixel-free SamplePlans; the
        # mosaic/warp/HSV/flip pipeline runs as one jitted XLA program on
        # the accelerator (data/device_augment.py). When the packed image
        # cache fits the HBM budget (CERBERUS_DEVICE_PACK_GB, default 2.0)
        # it is uploaded ONCE and batches ship only tile indices + warp
        # params (KBs); otherwise tiles ship per batch.
        self.device_augment = device_augment
        self._aug_fn = None
        self._dev_pack = None
        self._resident = False
        self._claimed_bytes = 0
        self._axis_aligned = False
        self._affine_pad = 0
        self._pixel_fns = {}
        if device_augment and dataset._pack is not None:
            # warp routing: rotation/shear/perspective-free hyps (the
            # defaults) take the MXU-matmul warp; rotating/shearing hyps
            # with perspective == 0 (the tuned voc_obj365 recipes) take the
            # 3-pass decomposed affine warp — both gather-free; only
            # perspective != 0 (no published recipe) still needs gathers
            from cerberusdet_tpu.data.device_augment import required_shear_pad

            hyp = dataset.hyp
            persp = hyp.get("perspective", 0)
            self._axis_aligned = not (hyp.get("degrees", 0)
                                      or hyp.get("shear", 0) or persp)
            if not self._axis_aligned and not persp:
                pad = required_shear_pad(hyp, dataset.imgsz)
                if pad <= dataset.imgsz // 4:
                    self._affine_pad = pad
            import jax

            if (not self._axis_aligned and not self._affine_pad
                    and jax.default_backend() != "cpu"
                    and not os.environ.get("CERBERUS_DEVICE_AUGMENT_GATHER")):
                # the gather-warp fallback measured ~70x off on TPU (8 img/s
                # vs 598, PROFILE.md) — a silent cliff; perspective (or
                # extreme-angle) hyps keep the host cv2 pipeline unless
                # explicitly overridden
                print("augment_device: hyp draws perspective or extreme "
                      "rotation — falling back to host augmentation (the "
                      "TPU gather warp is ~70x slower; set CERBERUS_DEVICE_"
                      "AUGMENT_GATHER=1 to force the device path)")
                self.device_augment = False
        if self.device_augment and dataset._pack is not None:
            global _RESIDENT_CLAIMED
            budget = float(os.environ.get("CERBERUS_DEVICE_PACK_GB", "2.0"))
            nbytes = dataset._pack[0].nbytes
            with _RESIDENT_LOCK:
                if _RESIDENT_CLAIMED + nbytes <= budget * 1e9:
                    _RESIDENT_CLAIMED += nbytes
                    self._claimed_bytes = nbytes
                    self._resident = True

    def _augment_on_device(self, item):
        """{tiles|tile_idx, aug, ...} -> {img: device array, ...} via the
        jitted augmentation program (dispatch is async; it overlaps the next
        host batch and the train step). Rare blur/median samples (p=0.01
        each; item["pixel_ops"]) are re-augmented one-at-a-time through a
        per-(blur_k, median_k) variant program — the pixel op sits at its
        host-pipeline point, between mixup and grayscale — and patched into
        the batch row in place (donated buffer)."""
        from cerberusdet_tpu.data.device_augment import make_augment_fn

        item = dict(item)
        ops = item.pop("pixel_ops", ())
        if "tile_idx" in item:
            if self._aug_fn is None:
                self._aug_fn = make_augment_fn(
                    self.dataset.imgsz, item["tile_idx"].shape[1],
                    resident=True, axis_aligned=self._axis_aligned,
                    shear_pad=self._affine_pad)
            if self._dev_pack is None:
                import jax

                self._dev_pack = jax.device_put(np.asarray(self.dataset._pack[0]))
            tile_idx = item.pop("tile_idx")
            aug = item.pop("aug")
            img = self._aug_fn(self._dev_pack, tile_idx, aug)
            for i, bk, mk in ops:
                fn = self._pixel_fn((bk, mk), tile_idx.shape[1], resident=True)
                row = fn(self._dev_pack, tile_idx[i:i + 1],
                         {k: v[i:i + 1] for k, v in aug.items()})
                img = _set_row(img, np.int32(i), row)
        else:
            if self._aug_fn is None:
                self._aug_fn = make_augment_fn(
                    self.dataset.imgsz, item["tiles"].shape[1],
                    axis_aligned=self._axis_aligned,
                    shear_pad=self._affine_pad)
            tiles = item.pop("tiles")
            aug = item.pop("aug")
            img = self._aug_fn(tiles, aug)
            for i, bk, mk in ops:
                fn = self._pixel_fn((bk, mk), tiles.shape[1], resident=False)
                row = fn(tiles[i:i + 1], {k: v[i:i + 1] for k, v in aug.items()})
                img = _set_row(img, np.int32(i), row)
        item["img"] = img
        return item

    def _pixel_fn(self, key, n_slots, resident):
        """Single-sample augment variant with (blur_k, median_k) applied;
        compiled on first occurrence, cached for the loader's lifetime."""
        fn = self._pixel_fns.get(key)
        if fn is None:
            from cerberusdet_tpu.data.device_augment import make_augment_fn

            fn = self._pixel_fns[key] = make_augment_fn(
                self.dataset.imgsz, n_slots, resident=resident,
                axis_aligned=self._axis_aligned,
                shear_pad=self._affine_pad, pixel_ops=key)
        return fn

    def _collate_plans(self, plans, pool=None):
        from cerberusdet_tpu.data.device_augment import collate_device

        return collate_device(self.dataset, plans, self.max_labels, pool,
                              as_indices=self._resident)

    def _collate_batch(self, idxs, pool=None):
        """One batch, sampled on `pool` (or inline) — the single assembly
        path shared by the sequential and thread-prefetch modes."""
        if self.device_augment:
            from cerberusdet_tpu.data.device_augment import plan_sample

            plan = lambda i: plan_sample(self.dataset, i)  # noqa: E731
            plans = (list(pool.map(plan, idxs)) if pool is not None
                     else [plan(i) for i in idxs])
            return self._collate_plans(plans, pool)
        if pool is not None:
            samples = list(pool.map(self.dataset.__getitem__, idxs))
        else:
            samples = [self.dataset[i] for i in idxs]
        return collate(samples, self.max_labels)

    def set_epoch(self, epoch: int):
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _process_pool(self):
        """Lazy worker-process pool; the dataset replica ships once per
        worker at pool start. Cache payloads (the RAM image cache and the
        packed memmap's pixel array) are stripped by
        DetectionDataset.__getstate__ during pickling — pixel-reading
        workers re-open the pack from its path on first access, planner
        workers (device_augment) never touch pixels at all."""
        if self._pool is None:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            # spawn, not fork: the pool is built from the prefetch thread of
            # a multi-threaded (JAX) process — forking here can clone a held
            # lock into the child and deadlock it before _init_worker runs
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_init_worker, initargs=(self.dataset,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
        if self._claimed_bytes:
            global _RESIDENT_CLAIMED
            with _RESIDENT_LOCK:
                _RESIDENT_CLAIMED -= self._claimed_bytes
            self._claimed_bytes = 0
            self._dev_pack = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self) -> Iterator[List[int]]:
        batch: List[int] = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        if self.prefetch <= 0:
            for idxs in self._batches():
                item = self._collate_batch(idxs)
                yield self._augment_on_device(item) if self.device_augment else item
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()

        def worker():
            # Items fetched on a pool (decode/augment drop the GIL in cv2);
            # executor.map preserves sample order, so batches are identical
            # to the sequential path. num_workers > 0 swaps in a process
            # pool (kept alive across epochs) for GIL-free python work.
            try:
                if self.num_workers:
                    pool = self._process_pool()
                    epoch = getattr(self.dataset, "epoch", 0)
                    # tile memcpy (non-resident device mode) still spreads
                    # over threads — numpy copies release the GIL
                    with ThreadPoolExecutor(self.num_threads) as tpool:
                        for idxs in self._batches():
                            if cancel.is_set():
                                return
                            if self.device_augment:
                                plans = list(pool.map(_worker_getplan,
                                                      [epoch] * len(idxs), idxs))
                                q.put(self._collate_plans(plans, tpool))
                            else:
                                samples = list(pool.map(_worker_getitem,
                                                        [epoch] * len(idxs), idxs))
                                q.put(collate(samples, self.max_labels))
                else:
                    with ThreadPoolExecutor(self.num_threads) as pool:
                        for idxs in self._batches():
                            if cancel.is_set():
                                return
                            q.put(self._collate_batch(idxs, pool))
            except BaseException as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                # deliver the sentinel; if the consumer cancelled and left,
                # give up instead of blocking this (daemon) thread forever
                while not cancel.is_set():
                    try:
                        q.put(stop, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                # the jitted augmentation dispatch happens on the consumer
                # thread (cheap + async) so the worker stays pure-host
                yield self._augment_on_device(item) if self.device_augment else item
        finally:
            # consumer stopped early (break / close / GC): stop the worker
            # instead of letting it decode into the void (and read files the
            # caller may already be cleaning up)
            cancel.set()
            while t.is_alive():
                while not q.empty():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break
                t.join(timeout=0.05)


class InfiniteLoader:
    """Cycles the underlying loader forever, bumping the sampler epoch
    (replaces InfiniteDataLoader + the reference's iterator-cycling at
    averaging.py:148-152)."""

    def __init__(self, loader: DataLoader, epoch: int = 0):
        # `epoch` seeds the sampler/augmentation streams: callers that build
        # a fresh InfiniteLoader per training epoch MUST pass the real epoch
        # or every epoch repeats the same order and augmentations
        self.loader = loader
        self.epoch = epoch
        self._it = None

    def __len__(self):
        return len(self.loader)

    def __next__(self):
        if self._it is None:
            self.loader.set_epoch(self.epoch)
            self._it = iter(self.loader)
        try:
            return next(self._it)
        except StopIteration:
            self.epoch += 1
            self.loader.set_epoch(self.epoch)
            self._it = iter(self.loader)
            return next(self._it)

    def __iter__(self):
        return self


def create_dataloader(
    path,
    imgsz: int,
    batch_size: int,
    stride: int = 32,
    hyp: Optional[dict] = None,
    augment: bool = False,
    rect: bool = False,
    pad: float = 0.0,
    balanced_sampler: bool = False,
    class_choice: str = "least_sampled",
    shuffle: bool = True,
    use_xml: bool = False,
    classnames=None,
    multi_label: bool = False,
    soft_label: bool = False,
    max_labels: int = 300,
    task: str = "task",
    seed: int = 0,
    host_sharded: bool = True,
    cache_dir: Optional[str] = None,
    cache_images="",  # False/"" | True/"ram" | "disk"
    num_threads: Optional[int] = None,
    single_cls: bool = False,
    fast_decode: Optional[bool] = None,
    num_workers: int = 0,
    augment_device: bool = False,
):
    """Build (dataset, loader) for one task (dataloaders.py:39-93 parity)."""
    if augment_device:
        if not augment:
            augment_device = False  # device pipeline only exists for training
        elif rect:
            raise ValueError("augment_device is incompatible with rect batching")
        else:
            cache_images = "disk"  # the packed memmap is the tile source
    dataset = DetectionDataset(
        path, imgsz=imgsz, augment=augment, hyp=hyp, rect=rect, stride=stride,
        pad=pad, batch_size=batch_size, use_xml=use_xml, classnames=classnames,
        multi_label=multi_label, soft_label=soft_label, task=task,
        cache_dir=cache_dir, cache_images=cache_images, seed=seed,
        single_cls=single_cls, fast_decode=fast_decode,
    )
    if balanced_sampler and augment:
        sampler = BalancedSampler(dataset.labels, class_choice, seed=seed)
    else:
        sampler = ShuffleSampler(len(dataset), shuffle=shuffle and augment, seed=seed)
    import jax

    if host_sharded and jax.process_count() > 1:
        sampler = HostShardSampler(sampler)
    loader = DataLoader(dataset, batch_size, sampler, max_labels=max_labels,
                        drop_last=augment, num_threads=num_threads,
                        num_workers=num_workers, device_augment=augment_device)
    return dataset, loader
