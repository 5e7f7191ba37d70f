"""Host-parallel, device-prefetched input pipeline (replaces the reference's
single-threaded ``keras.utils.Sequence``, ref dataset.py:18-123).

Design for input-bound throughput (SURVEY.md §7 "hard parts"): a thread pool
decodes JPEGs while the device trains on the previous batch; batches are
``device_put`` ahead of time (double-buffered prefetch) with an optional
``NamedSharding`` so each host shard feeds its mesh slice directly.

Batch layout is raw — ``(images u8, boxes (B, N, 5), valid (B, N))`` — and
augmentation + grid encoding happen on-device inside the jitted train step
(``data.augment`` + ``core.grid``), so the host never touches float pixels.
"""

from __future__ import annotations

import collections
import concurrent.futures
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from keras_object_detection_tpu.data.reader import list_examples, load_example

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray]


class YoloDataset:
    """Epoch-based batched loader over a YOLO-format directory.

    Mirrors the reference generator's surface: ``len()`` follows the same
    drop_remainder arithmetic (ref dataset.py:38-47), shuffling reshuffles
    indices each epoch (ref dataset.py:33-36). Unlike the reference, the last
    partial batch is padded (with a per-image validity count) instead of
    silently shrinking the array shape, keeping shapes static for jit.
    """

    def __init__(
        self,
        data_dir: str,
        image_size: int,
        batch_size: int,
        max_boxes: int = 64,
        shuffle: bool = False,
        drop_remainder: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        cache_in_memory: bool = False,
        cache_dir: Optional[str] = None,
        letterbox: bool = False,
    ):
        """``shard_index``/``shard_count``: multi-host input sharding — each
        host reads a disjoint strided slice of the file list (the DCN-scale
        analogue of the per-chip batch sharding; SURVEY.md §2.2). Defaults to
        the single-host identity. Pass ``jax.process_index()`` /
        ``jax.process_count()`` under ``jax.distributed``.

        ``cache_in_memory``: keep decoded/resized uint8 images + labels in
        RAM after first read. Since augmentation runs on-device, the host
        work per example is identical every epoch — caching removes the JPEG
        decode from the steady-state input path entirely (~600 KB/image at
        448 square; size accordingly).

        ``cache_dir``: decode-ahead DISK cache (``data/disk_cache.py``) for
        datasets too big for RAM — images are decoded once into a uint8
        memmap (built eagerly on construction if absent/stale) and epochs
        read raw bytes instead of re-decoding JPEGs.

        ``letterbox``: aspect-preserving resize with centered gray padding
        and consistent box remap (beyond parity — the reference's square
        resize distorts aspect, ref dataset.py:143-146). Recorded in the
        disk cache's validity key, so flipping it rebuilds the cache."""
        paths = np.array(list_examples(data_dir))
        if shard_count > 1:
            paths = paths[shard_index::shard_count]
        self.paths = paths
        if len(self.paths) == 0:
            raise FileNotFoundError(f"no *.jpg files under {data_dir!r}")
        self.image_size = image_size
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.letterbox = letterbox
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._rng = np.random.RandomState(seed)
        self._pool = concurrent.futures.ThreadPoolExecutor(num_workers)
        self._cache: Optional[dict] = {} if cache_in_memory else None
        self._disk = None
        if cache_dir is not None:
            from keras_object_detection_tpu.data.disk_cache import (
                open_or_build)

            self._disk = open_or_build(list(self.paths), image_size,
                                       max_boxes, cache_dir,
                                       letterbox=letterbox)
            self._disk_index = {p: i for i, p in enumerate(self.paths)}

    def __len__(self) -> int:
        n, b = len(self.paths), self.batch_size
        if self.drop_remainder:
            return n // b
        return n // b + (1 if n % b else 0)

    @property
    def num_examples(self) -> int:
        return len(self.paths)

    def _load_one(self, path: str):
        if self._cache is not None:
            hit = self._cache.get(path)
            if hit is not None:
                return hit
        if self._disk is not None:
            ex = self._disk.load(self._disk_index[path])
        else:
            ex = load_example(path, self.image_size, self.max_boxes,
                              letterbox=self.letterbox)
        if self._cache is not None:
            self._cache[path] = ex
        return ex

    def _load_batch(self, paths) -> Batch:
        size = self.image_size
        results = list(self._pool.map(self._load_one, paths))
        images = np.zeros((self.batch_size, size, size, 3), np.uint8)
        boxes = np.zeros((self.batch_size, self.max_boxes, 5), np.float32)
        valid = np.zeros((self.batch_size, self.max_boxes), bool)
        for i, (img, bx, vl) in enumerate(results):
            images[i], boxes[i], valid[i] = img, bx, vl
        return images, boxes, valid

    def epoch_indices(self) -> Iterator[np.ndarray]:
        """Per-batch index arrays into ``paths`` for one epoch (the final
        batch may be short when drop_remainder=False). The single source of
        the epoch order — both the host loader and DeviceCachedDataset
        derive their batches from it, keeping their orders bit-identical."""
        order = np.arange(len(self.paths))
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(len(self)):
            yield order[i * self.batch_size : (i + 1) * self.batch_size]

    def epoch(self) -> Iterator[Batch]:
        """Yield host batches for one epoch (images padded to batch_size;
        trailing pad images have zero valid boxes and zero pixels)."""
        for sel in self.epoch_indices():
            yield self._load_batch(self.paths[sel])

    def prefetched(
        self,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
    ) -> Iterator[Batch]:
        """Epoch iterator with device transfer overlapped ahead of compute.

        With a ``NamedSharding`` over the mesh's data axis, each batch lands
        already sharded across devices (the DP input path, SURVEY.md §2.2).
        """

        def put(batch: Batch):
            if sharding is None:
                return jax.device_put(batch)
            return jax.device_put(batch, sharding)

        queue: collections.deque = collections.deque()
        it = self.epoch()
        try:
            for _ in range(prefetch):
                queue.append(put(next(it)))
        except StopIteration:
            pass
        while queue:
            try:
                queue.append(put(next(it)))
            except StopIteration:
                pass
            yield queue.popleft()


def _hbm_budget_bytes(device, layout: str) -> int:
    """Per-device byte budget for the cache: the device's reported memory
    limit minus a working-set allowance (params + optimizer/EMA state +
    train-step activations — ~4 GB covers the flagship at batch 32), or a
    12 GB default when the backend doesn't report memory stats."""
    headroom = 4 << 30
    try:
        stats = device.memory_stats()
        limit = int(stats.get("bytes_limit", 0)) if stats else 0
    except Exception:
        limit = 0
    if limit > headroom:
        return limit - headroom
    return 12 << 30


class DeviceCachedDataset:
    """The ENTIRE dataset resident in device HBM; batches are gathered
    on-device by index array.

    TPU-native input path for datasets that fit in accelerator memory
    (448x448 uint8 is ~600 KB/image -> ~13 GB for VOC-size sets, ~1 GB for
    thousands of images): images/boxes/validity are transferred ONCE, and
    each step ships only a (batch,) int32 index vector. Eliminates the
    per-step host->device image transfer entirely — on relay-attached chips
    that transfer is both the throughput bottleneck (~73 MB/s observed) and
    a host-memory leak (the axon PJRT client retains every transfer buffer;
    ~19 MB leaked per 448x448 batch-32 put, OOM after ~150 epochs).

    Two HBM layouts (``DataConfig.device_cache_layout``):

    - ``"replicated"``: every device holds the full dataset; the gather is
      a local ``arr[idx]`` constrained back to the batch sharding.
    - ``"sharded"``: rows are sharded over the mesh's data axis, so
      per-device memory is dataset/dp and VOC-scale 448 sets fit an 8-chip
      mesh. The gather runs under ``shard_map``: each device picks the
      requested rows that live in ITS shard (out-of-shard slots zeroed) and
      one ``lax.psum_scatter`` over ICI assembles the batch directly in
      data-axis-sharded form — exactly one owner contributes per slot, so
      the integer add is exact and uint8 pixels never widen. Against the
      reference, which re-decodes every JPEG from disk every epoch (ref
      dataset.py:75-76), both layouts decode exactly once per run.

    Row ``num_examples`` is an all-zero sentinel used to pad the final
    partial batch — identical semantics to the host loader's zero-padding.
    Batch composition is bit-identical across layouts and to the host
    loader (one shared shuffle stream, ``YoloDataset.epoch_indices``).
    """

    def __init__(self, ds: YoloDataset, sharding=None, mesh=None,
                 data_axis: str = "data", layout: str = "replicated"):
        """``mesh`` + ``layout``: the mesh-aware path (preferred). ``layout``
        ``"sharded"`` requires ``mesh``; rows land sharded over
        ``data_axis``. ``sharding``: legacy escape hatch — an explicit
        ``NamedSharding`` for the cache arrays (replicated layout only)."""
        if layout not in ("replicated", "sharded"):
            raise ValueError(f"unknown device_cache layout {layout!r}")
        if layout == "sharded" and mesh is None:
            raise ValueError("layout='sharded' requires a mesh")
        n, size, m = ds.num_examples, ds.image_size, ds.max_boxes
        dp = mesh.shape[data_axis] if (mesh is not None) else 1
        # rows: n examples + >=1 zero pad row, rounded up so each data-axis
        # shard is equal-sized
        n_rows = n + 1
        if layout == "sharded":
            n_rows = ((n_rows + dp - 1) // dp) * dp
        row_bytes = size * size * 3 + m * 5 * 4 + m  # image + boxes + valid
        per_device = n_rows * row_bytes // (dp if layout == "sharded" else 1)
        budget = _hbm_budget_bytes(jax.devices()[0], layout)
        if per_device > budget:  # checked BEFORE any allocation/decode work
            raise ValueError(
                f"device_cache: dataset needs {per_device / 1e9:.1f} GB "
                f"per device ({layout}) — too large for HBM (budget "
                f"{budget / 1e9:.1f} GB); "
                + ("use cache_dir (disk) instead"
                   if layout == "sharded" or dp == 1 else
                   "try device_cache_layout='sharded' or cache_dir (disk)"))
        imgs = np.zeros((n_rows, size, size, 3), np.uint8)
        boxes = np.zeros((n_rows, m, 5), np.float32)
        valid = np.zeros((n_rows, m), bool)
        for i, p in enumerate(ds.paths):
            im, bx, vl = ds._load_one(p)
            imgs[i], boxes[i], valid[i] = im, bx, vl
        if layout == "sharded" or (sharding is None and mesh is not None):
            from jax.sharding import NamedSharding, PartitionSpec

            spec = (PartitionSpec(data_axis) if layout == "sharded"
                    else PartitionSpec())
            sharding = NamedSharding(mesh, spec)
        put = (lambda x: jax.device_put(x, sharding) if sharding is not None
               else jax.device_put(x))
        self.images = put(imgs)
        self.boxes = put(boxes)
        self.valid = put(valid)
        if ds._cache:
            # the load loop populated the host RAM cache; nothing reads it
            # again once the data lives in HBM — release the duplicate copy
            ds._cache.clear()
        self.layout = layout
        self.n_rows = n_rows
        self.pad_row = n
        self.batch_size = ds.batch_size
        self.num_examples = n
        self._mesh = mesh
        self._data_axis = data_axis
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def make_gather(self, batch_sharding=None):
        """Build ``gather(images, boxes, valid, idx) -> (imgs, boxes, valid)``
        for use INSIDE a jitted step (one dispatch per step total).

        Replicated layout: local take + optional sharding constraint to the
        batch sharding. Sharded layout: shard_map local-take + psum_scatter
        (see class docstring); the result is already data-axis sharded.
        """
        if self.layout == "replicated":
            def gather(imgs, bxs, vld, idx):
                if batch_sharding is None:
                    return imgs[idx], bxs[idx], vld[idx]
                c = lambda x: jax.lax.with_sharding_constraint(
                    x, batch_sharding)
                return c(imgs[idx]), c(bxs[idx]), c(vld[idx])

            return gather

        import jax.numpy as jnp
        from functools import partial
        from jax.sharding import PartitionSpec as P

        axis = self._data_axis
        n_local = self.n_rows // self._mesh.shape[axis]

        @partial(jax.shard_map, mesh=self._mesh,
                 in_specs=(P(axis), P(axis), P(axis), P()),
                 out_specs=(P(axis), P(axis), P(axis)))
        def gather(imgs, bxs, vld, idx):
            d = jax.lax.axis_index(axis)
            local = idx - d * n_local
            ok = (local >= 0) & (local < n_local)
            li = jnp.clip(local, 0, n_local - 1)

            def pick(arr):
                rows = arr[li]
                mask = ok.reshape((-1,) + (1,) * (rows.ndim - 1))
                rows = jnp.where(mask, rows, jnp.zeros((), rows.dtype))
                return jax.lax.psum_scatter(
                    rows, axis, scatter_dimension=0, tiled=True)

            # bool has no add; ship validity as uint8 and re-threshold
            return (pick(imgs), pick(bxs),
                    pick(vld.astype(jnp.uint8)) != 0)

        return gather

    def epoch_indices(self) -> Iterator[np.ndarray]:
        """Per-batch index arrays (padded to batch_size with the zero row).
        Delegates the order to ``YoloDataset.epoch_indices`` — one shared
        shuffle implementation, bit-identical to the host loader."""
        for sel in self._ds.epoch_indices():
            if len(sel) < self.batch_size:
                sel = np.concatenate([
                    sel, np.full(self.batch_size - len(sel), self.pad_row)])
            yield sel.astype(np.int32)
