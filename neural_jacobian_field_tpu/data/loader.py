"""Host data loader: sample, collate, prefetch.

Replaces the reference's torch DataLoader + PL DataModule
(data/data_module.py:14-60) with a thread-prefetched NumPy iterator emitting
`RawBatch` pytrees ready for `shard_batch` + the jitted train step. Batches
have static shapes (tracks are padded/truncated to a fixed count with the
visibility mask zeroed on padding — SURVEY.md §7 static-shape rule).
"""

import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from ..training.prepare import RawBatch
from .dataset import DatasetCommon


def _pad_tracks(item: dict, num_tracks: int) -> dict:
    sel = item["pixel_selector"]
    n = len(sel)
    if n >= num_tracks:
        keep = np.random.permutation(n)[:num_tracks]
        return {
            "pixel_selector": sel[keep],
            "pixel_motion": item["pixel_motion"][keep],
            "pixel_visible_mask": item["pixel_visible_mask"][keep],
        }
    pad = num_tracks - n
    return {
        "pixel_selector": np.concatenate([sel, np.zeros(pad, sel.dtype)]),
        "pixel_motion": np.concatenate(
            [item["pixel_motion"], np.zeros((pad, 2), np.float32)]
        ),
        # padding is masked OUT (visible=0), unlike real negatives (visible=1)
        "pixel_visible_mask": np.concatenate(
            [item["pixel_visible_mask"], np.zeros(pad, np.float32)]
        ),
    }


def collate(items, num_tracks: Optional[int] = None) -> RawBatch:
    """Stack item dicts into a RawBatch."""
    tracks_mode = "pixel_selector" in items[0]
    if tracks_mode and num_tracks is not None:
        items = [{**it, **_pad_tracks(it, num_tracks)} for it in items]

    def stack(key):
        if key not in items[0]:
            return None
        return np.stack([np.asarray(it[key]) for it in items], axis=0)

    return RawBatch(
        ctxt_rgb=stack("ctxt_rgb"),
        ctxt_extrinsics=stack("ctxt_extrinsics"),
        ctxt_intrinsics=stack("ctxt_intrinsics"),
        robot_action=stack("robot_action"),
        trgt_rgb=stack("trgt_rgb"),
        trgt_depth=stack("trgt_depth"),
        trgt_extrinsics=stack("trgt_extrinsics"),
        trgt_intrinsics=stack("trgt_intrinsics"),
        near=stack("near"),
        far=stack("far"),
        flow=stack("flow"),
        pixel_selector=stack("pixel_selector"),
        pixel_motion=stack("pixel_motion"),
        pixel_visible_mask=stack("pixel_visible_mask"),
    )


class DataLoader:
    """Random-sampling loader with background prefetch threads.

    Fast path: when the native decoder is available and the dataset needs no
    per-item Python work (no augmentation, tracks mode excepted), each batch
    is materialized by THREE threaded C++ calls — one RGB decode over all
    2*B images, one depth decode, one flow-.npz load — with the GIL released
    throughout (`_make_batch_native`). The per-item Python path is GIL-bound
    at ~54 items/s at reference shapes (benchmarks/input_pipeline_bench.py),
    under the ~119 items/s the device demands; the batched path clears it.
    """

    def __init__(self, dataset: DatasetCommon, batch_size: int,
                 num_tracks: Optional[int] = None, num_workers: int = 2,
                 prefetch: int = 4, seed: int = 0, decode_threads: int = 8):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_tracks = num_tracks
        self.num_workers = max(0, num_workers)
        self.prefetch = prefetch
        self.decode_threads = decode_threads
        self._rng = random.Random(seed)
        from .native import get_lib

        self._native = get_lib() is not None and not getattr(
            dataset, "needs_python_items", True)

    def _make_batch(self) -> RawBatch:
        idxs = [self._rng.randrange(len(self.dataset)) for _ in range(self.batch_size)]
        if self._native:
            try:
                return self._make_batch_native(idxs)
            except (IOError, OSError):
                # corrupt file: per-item path has the retry semantics
                pass
        return collate([self.dataset[i] for i in idxs], self.num_tracks)

    def _make_batch_native(self, idxs) -> RawBatch:
        from .native import (decode_depth_batch, decode_rgb_batch_u8,
                             load_flow_npz_batch)

        ds = self.dataset
        plans = [ds.plan_item(i) for i in idxs]
        b = len(plans)
        hw = plans[0]["hw_ctxt"]
        if any(p["hw_ctxt"] != hw or p["hw_trgt"] != hw for p in plans) or \
           any(p["tracks_args"] is not None for p in plans):
            # mixed resolutions / tracks supervision: per-item path
            return collate([ds[i] for i in idxs], self.num_tracks)
        h, w = hw
        t = self.decode_threads
        # uint8 wire format: prepare_training_batch normalizes on device
        rgb = decode_rgb_batch_u8(
            [p["ctxt_path"] for p in plans] + [p["trgt_path"] for p in plans],
            h, w, threads=t)
        depth = decode_depth_batch([p["depth_path"] for p in plans], h, w,
                                   scale=plans[0]["depth_scale"], threads=t)
        flow = None
        if plans[0]["flow_path"] is not None:
            flow = load_flow_npz_batch([p["flow_path"] for p in plans], h, w,
                                       threads=t)

        def stack(key):
            return np.stack([p[key] for p in plans], axis=0)

        return RawBatch(
            ctxt_rgb=rgb[:b],
            ctxt_extrinsics=stack("ctxt_extrinsics"),
            ctxt_intrinsics=stack("ctxt_intrinsics"),
            robot_action=stack("robot_action"),
            trgt_rgb=rgb[b:],
            trgt_depth=depth,
            trgt_extrinsics=stack("trgt_extrinsics"),
            trgt_intrinsics=stack("trgt_intrinsics"),
            near=stack("near"),
            far=stack("far"),
            flow=flow,
            pixel_selector=None,
            pixel_motion=None,
            pixel_visible_mask=None,
        )

    def __iter__(self) -> Iterator[RawBatch]:
        if self.num_workers == 0:
            while True:
                yield self._make_batch()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    q.put(self._make_batch(), timeout=0.5)
                except queue.Full:
                    continue

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()


class ValidationWrapper:
    """Length-1 dataset serving one random underlying item per epoch
    (data/validation_wrapper.py:6-23) — validation renders are expensive, so
    each pass samples a single random scene."""

    def __init__(self, dataset, seed: int = 0):
        self.dataset = dataset
        self._rng = random.Random(seed)

    def __len__(self) -> int:
        return 1

    def __getitem__(self, idx: int):
        return self.dataset[self._rng.randrange(len(self.dataset))]
