"""Host data pipeline: parallel decode + prefetch feeding the device.

The reference uses a single-worker torch DataLoader (``lib/datasets/
dataloader.py:47-50``). Here a thread pool decodes `.chunk` files and pads
them to fixed shapes while the TPU computes the previous batch (double
buffering via a bounded queue). Samples with zero gt boxes are skipped, as
in the reference train loop (``lib/model/trainval.py:330-331``).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from tpu3dsis.io.dataset import SceneDataset, pad_sample


class PrefetchLoader:
    """Iterable over stacked fixed-shape batches (numpy, ready to device_put)."""

    def __init__(
        self,
        dataset: SceneDataset,
        cfg,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        with_mask_canvas: bool = True,
        drop_empty: bool = True,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.with_mask_canvas = with_mask_canvas
        self.drop_empty = drop_empty

    def __len__(self):
        return max(1, len(self.dataset) // self.batch_size)

    def _load_one(self, idx):
        path = self.dataset.scenes[idx]
        try:
            if self.with_mask_canvas:
                from tpu3dsis.io.dataset import load_fast_padded

                fast = load_fast_padded(self.dataset, path, self.cfg)
                if fast is not None:
                    return self._compact(fast)
            sample = self.dataset[idx]
        except Exception:  # corrupt file: skip (reference crashes)
            return None
        if self.drop_empty and sample.gt_box.shape[0] == 0:
            return None
        return self._compact(
            pad_sample(sample, self.cfg, self.with_mask_canvas)
        )

    def _compact(self, padded):
        """TPU_COMPACT_TRANSFERS: shrink the per-step host->device bytes.

        The train step is transfer-bound on tunnel-attached chips
        (BENCH_NOTES.md): binary canvas as uint8 (exact — the step casts the
        sliced window back to f32), TSDF data at the compute dtype when that
        is bfloat16 (identical to the cast the first conv performs anyway).
        Raw-uint8 images are handled at load time (frames.load_color).
        """
        if not bool(dict.get(self.cfg, "TPU_COMPACT_TRANSFERS", False)):
            return padded
        if "mask_canvas" in padded:
            padded["mask_canvas"] = padded["mask_canvas"].astype(np.uint8)
        if str(self.cfg.TPU_COMPUTE_DTYPE) == "bfloat16":
            import ml_dtypes

            padded["data"] = padded["data"].astype(ml_dtypes.bfloat16)
        return padded

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            batch = []
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.num_workers) as pool:
                for padded in pool.map(self._load_one, order):
                    if stop.is_set():
                        return
                    if padded is None:
                        continue
                    batch.append(padded)
                    if len(batch) == self.batch_size:
                        stacked = {
                            k: np.stack([b[k] for b in batch])
                            for k in batch[0]
                        }
                        q.put(stacked)
                        batch = []
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
