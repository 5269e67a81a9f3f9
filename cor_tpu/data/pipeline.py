"""COR127K data pipeline: CSV manifest -> host-side decode/augment ->
prefetched NHWC numpy batches ready for device_put.

Capability parity with the reference's datasets/loaders
(reference: utils/dataloader.py:77-412):

- CSV schema: Id, Compose, Dataset, Target, Query_img, Query_mask,
  Support_img, Support_mask, Text (+ optional query_cat); rows are filtered
  to Compose == 0 (:91,259).
- Paths: {root}/{Dataset}/image/{Query_img},
  {root}/{Dataset}/mask/{Target}/{Query_mask},
  {root}/{Dataset}/image/{Support_img},
  {root}/{Dataset}/mask/sup/{Support_mask} (:160-166).
- Query image: PIL resize 1024^2 + ImageNet normalize; query mask: resize +
  [0,1]; support image: resize 384^2 + normalize; support mask: resize 384^2.
- Train-only augmentations (cor_tpu.data.augment).

TPU-first deltas: emits NHWC float32 arrays; a thread-pool prefetcher
replaces torch DataLoader workers; a SyntheticDataset provides
deterministic fake triplets for tests and benchmarks.
"""

from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import numpy as np
from PIL import Image

from cor_tpu.data.augment import train_augment
from cor_tpu.data.tokenizer import get_tokenizer

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# manifest
# ---------------------------------------------------------------------------

REQUIRED_COLUMNS = (
    "Id",
    "Compose",
    "Dataset",
    "Target",
    "Query_img",
    "Query_mask",
    "Support_img",
    "Support_mask",
    "Text",
)


def load_manifest(csv_path: str | Path, compose_filter: int = 0):
    """Read the triplet CSV, keep Compose == compose_filter rows
    (reference: dataloader.py:91)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"Manifest {csv_path} missing columns: {missing}")
    df = df[df["Compose"] == compose_filter].reset_index(drop=True)
    return df


# ---------------------------------------------------------------------------
# sample decoding
# ---------------------------------------------------------------------------


def _to_float_img(img: Image.Image, size: int, normalize: bool) -> np.ndarray:
    from cor_tpu.native import native_available, resize_normalize_f32

    if native_available():
        # C++ data-plane: Pillow-bit-exact resample + normalize in one
        # GIL-released call (cor_tpu/native/preproc.cpp) — measured 3.7x
        # single-thread and ~30x under 8 loader threads vs PIL + numpy
        arr8 = np.asarray(img, np.uint8)
        return resize_normalize_f32(
            arr8, size, size,
            IMAGENET_MEAN if normalize else None,
            IMAGENET_STD if normalize else None,
        )
    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if normalize:
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    return arr  # HWC


@dataclass
class CORDataset:
    """Map-style dataset over the COR127K manifest."""

    csv_path: str
    dataset_path: str
    train: bool = False
    query_img_size: int = 1024
    support_img_size: int = 384
    tokenizer_path: Optional[str] = None
    context_length: int = 64
    seed: int = 42
    capitalized_dirs: bool = False  # TestDataset_Single uses Image/Mask (:480-484)
    limit: Optional[int] = None
    # set by DataLoader each epoch so augmentations vary across epochs (the
    # reference draws fresh worker randomness per epoch)
    epoch: int = 0

    def __post_init__(self):
        self.df = load_manifest(self.csv_path)
        if self.limit is not None and self.limit < 1:
            # iloc[:-N] would silently keep all-but-the-last-N rows — the
            # opposite of the documented "first N" debug truncation
            raise ValueError(f"limit must be a positive row count, got {self.limit}")
        if self.limit:
            self.df = self.df.iloc[: self.limit]
        self.tokenizer = get_tokenizer(self.tokenizer_path, self.context_length)
        self._img_dir = "Image" if self.capitalized_dirs else "image"
        self._mask_dir = "Mask" if self.capitalized_dirs else "mask"

    def __len__(self) -> int:
        return len(self.df)

    def _paths(self, row):
        root = Path(self.dataset_path) / str(row["Dataset"])
        return {
            "query_img": root / self._img_dir / row["Query_img"],
            "query_mask": root / self._mask_dir / str(row["Target"]) / row["Query_mask"],
            "support_img": root / self._img_dir / row["Support_img"],
            "support_mask": root / self._mask_dir / "sup" / row["Support_mask"],
        }

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.df.iloc[idx]
        paths = self._paths(row)
        q_img = Image.open(paths["query_img"]).convert("RGB")
        q_mask = Image.open(paths["query_mask"]).convert("L")
        s_img = Image.open(paths["support_img"]).convert("RGB")
        s_mask = Image.open(paths["support_mask"]).convert("L")

        native_hw = (q_mask.size[1], q_mask.size[0])

        if self.train:
            # (seed, epoch, idx): deterministic per run, fresh per epoch
            rng = np.random.default_rng((self.seed, self.epoch, idx))
            q_img, q_mask = train_augment(q_img, q_mask, rng)

        sample = {
            "pair_id": np.int64(row["Id"]),
            "query_img": _to_float_img(q_img, self.query_img_size, True),
            "query_mask": _to_float_img(q_mask, self.query_img_size, False),
            "support_img": _to_float_img(s_img, self.support_img_size, True),
            "support_mask": _to_float_img(s_mask, self.support_img_size, False),
            "text": self.tokenizer(str(row["Text"]))[0],
            "native_hw": np.array(native_hw, np.int32),
            # native-resolution GT source for val_metric (stays on host)
            "query_mask_path": str(paths["query_mask"]),
        }
        return sample


@dataclass
class SyntheticDataset:
    """Deterministic synthetic triplets with blob masks — shape-identical to
    CORDataset output. Used by tests, bench.py, and smoke training."""

    length: int = 64
    query_img_size: int = 1024
    support_img_size: int = 384
    context_length: int = 64
    vocab_size: int = 32000
    native_hw: Optional[tuple] = None  # defaults to (query_img_size,)*2
    seed: int = 0
    train: bool = False

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng((self.seed, idx))
        q, s = self.query_img_size, self.support_img_size

        def blob(size):
            yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
            cy, cx, r = rng.uniform(0.25, 0.75, 3) * np.array([1, 1, 0.35])
            m = ((yy - cy) ** 2 + (xx - cx) ** 2 < (0.08 + r * 0.2) ** 2)
            return m.astype(np.float32)[:, :, None]

        native = self.native_hw or (q, q)
        return {
            "pair_id": np.int64(idx),
            "query_img": rng.standard_normal((q, q, 3)).astype(np.float32),
            "query_mask": blob(q),
            "support_img": rng.standard_normal((s, s, 3)).astype(np.float32),
            "support_mask": blob(s),
            "text": rng.integers(2, self.vocab_size, self.context_length).astype(np.int32),
            "native_hw": np.array(native, np.int32),
        }


# ---------------------------------------------------------------------------
# batching + prefetch
# ---------------------------------------------------------------------------


def _collate(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class DataLoader:
    """Thread-pool loader with background prefetch.

    Replaces the reference's torch DataLoader(num_workers=8, pin_memory,
    prefetch_factor=4) (reference: dataloader.py:220-241); decode/augment are
    PIL/numpy (GIL-released) so threads scale.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 42,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        # multi-host data parallelism: host `shard_id` of `num_shards` reads
        # every num_shards-th index of the (identically seeded) global order,
        # so the union over hosts is a disjoint cover of each epoch — the
        # host-level analog of DDP's DistributedSampler. batch_size stays the
        # PER-HOST batch.
        assert 0 <= shard_id < num_shards
        self.shard_id = shard_id
        self.num_shards = num_shards

    def _shard_len(self) -> int:
        # every shard is padded (by wrapping) to the same ceil(n/num_shards)
        # length, so all hosts yield identical batch counts per epoch
        return -(-len(self.dataset) // self.num_shards)

    def __len__(self) -> int:
        n = self._shard_len()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle order / augmentation draws to the TRAINER's epoch
        number (torch DistributedSampler.set_epoch analog). Without this a
        resumed run's fresh loader restarts its private counter at 0 and
        replays epoch-0's shuffle and augmentation sequence."""
        self.epoch = int(epoch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        if self.num_shards > 1:
            # equal-length shards, DistributedSampler-style: pad the global
            # order by wrapping so len(order) divides num_shards — otherwise
            # hosts get shard lengths differing by 1 and (with drop_last) can
            # execute DIFFERENT numbers of collective train steps, deadlocking
            # the job at epoch end (torch DistributedSampler pads for the
            # same reason)
            total = self._shard_len() * self.num_shards
            if total > len(order):
                order = np.concatenate([order, order[: total - len(order)]])
            order = order[self.shard_id :: self.num_shards]
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = self.epoch  # fresh augmentation draws per epoch
        self.epoch += 1

        batches = [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        stop = object()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def produce():
            from collections import deque

            with cf.ThreadPoolExecutor(self.num_workers) as pool:
                # bounded decode-ahead (torch prefetch_factor semantics): at
                # most num_workers + prefetch batches in flight, and each
                # consumed future is DROPPED — submitting the whole epoch up
                # front would decode ahead without bound and pin every
                # result until epoch end (~190 MB/batch at the reference
                # geometry -> host OOM on a 127K-row manifest)
                ahead = self.num_workers + self.prefetch
                pending: deque = deque()
                it = iter(batches)
                try:
                    while True:
                        while len(pending) < ahead:
                            idxs = next(it, None)
                            if idxs is None:
                                break
                            pending.append(
                                pool.submit(
                                    lambda idxs=idxs: _collate(
                                        [self.dataset[int(i)] for i in idxs]
                                    )
                                )
                            )
                        if not pending:
                            break
                        q.put(pending.popleft().result())
                except Exception as e:  # surface worker errors
                    q.put(e)
                    return
            q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, Exception):
                raise item
            yield item


def get_train_loader(cfg, tokenizer_path: Optional[str] = None) -> DataLoader:
    """reference: dataloader.py:201-241."""
    ds = CORDataset(
        csv_path=cfg.train_csv,
        dataset_path=cfg.dataset_path,
        train=True,
        tokenizer_path=tokenizer_path or getattr(cfg, "tokenizer_path", None),
        seed=cfg.seed,
    )
    import jax

    return DataLoader(
        ds,
        cfg.batch_size,
        shuffle=True,
        drop_last=True,
        num_workers=cfg.num_workers,
        seed=cfg.seed,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
    )


def get_valid_loader(
    cfg, csv_path: Optional[str] = None, tokenizer_path=None,
    limit: Optional[int] = None,
) -> DataLoader:
    """reference: dataloader.py:372-412. ``limit`` truncates the manifest to
    the first N rows — the working form of the reference's commented
    debug-truncation lines (dataloader.py:89,257)."""
    ds = CORDataset(
        csv_path=csv_path or cfg.val_csv,
        dataset_path=cfg.dataset_path,
        train=False,
        tokenizer_path=tokenizer_path or getattr(cfg, "tokenizer_path", None),
        limit=limit,
    )
    # validation stays UNSHARDED across hosts: every downstream consumer
    # (val_metric's manifest join by row order, pred-mask file naming, the
    # trainer's host-side metric accumulation) assumes the full, globally
    # ordered split; only the train loader shards (DistributedSampler analog)
    return DataLoader(
        ds,
        cfg.batch_size,
        shuffle=False,
        drop_last=False,
        num_workers=cfg.num_workers,
    )
