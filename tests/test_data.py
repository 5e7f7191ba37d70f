"""Data pipeline tests: reader parity with the reference label format
(ref dataset.py:114-123), loader shape/semantics, and on-device augmentation
invariants (boxes stay consistent with images, eval path bit-comparable)."""

import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.data.augment import augment_batch, preprocess_eval_batch
from keras_object_detection_tpu.data.pipeline import YoloDataset
from keras_object_detection_tpu.data.reader import (
    list_examples,
    load_example,
    read_yolo_labels,
)

FIXTURE = "/root/reference/yolo_v1/data"


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """A 5-image dataset built by replicating the reference fixture."""
    d = tmp_path_factory.mktemp("yolo_data")
    for i in range(5):
        shutil.copy(os.path.join(FIXTURE, "test.jpg"), d / f"img{i}.jpg")
        shutil.copy(os.path.join(FIXTURE, "test.txt"), d / f"img{i}.txt")
    return str(d)


def test_read_yolo_labels_fixture():
    boxes = read_yolo_labels(os.path.join(FIXTURE, "test.txt"))
    assert boxes.shape == (3, 5)
    # column order [cx, cy, w, h, class] (ref dataset.py:120)
    np.testing.assert_allclose(
        boxes[0], [0.756250, 0.210417, 0.293750, 0.179167, 0.0], rtol=1e-6)
    assert list(boxes[:, 4]) == [0.0, 1.0, 2.0]


def test_load_example_shapes():
    img, boxes, valid = load_example(
        os.path.join(FIXTURE, "test.jpg"), image_size=224, max_boxes=8)
    assert img.shape == (224, 224, 3) and img.dtype == np.uint8
    assert boxes.shape == (8, 5) and valid.sum() == 3
    assert img.max() > 10  # decoded real pixels


def test_dataset_len_semantics(data_dir):
    # 5 images, batch 2: ceil -> 3 batches, drop_remainder -> 2 (ref dataset.py:38-47)
    assert len(YoloDataset(data_dir, 64, 2)) == 3
    assert len(YoloDataset(data_dir, 64, 2, drop_remainder=True)) == 2


def test_dataset_epoch_batches(data_dir):
    ds = YoloDataset(data_dir, 64, 2, max_boxes=8)
    batches = list(ds.epoch())
    assert len(batches) == 3
    images, boxes, valid = batches[0]
    assert images.shape == (2, 64, 64, 3)
    assert valid.sum() == 6  # 3 boxes per image
    # last batch is padded: one real image + one zero pad
    images, boxes, valid = batches[-1]
    assert valid[0].sum() == 3 and valid[1].sum() == 0
    assert images[1].sum() == 0


def test_dataset_shuffle_reshuffles(data_dir):
    ds = YoloDataset(data_dir, 16, 5, shuffle=True, seed=0)
    ds2 = YoloDataset(data_dir, 16, 5, shuffle=False)
    # same content regardless of order
    a = np.sort(next(ds.epoch())[0].sum(axis=(1, 2, 3)))
    b = np.sort(next(ds2.epoch())[0].sum(axis=(1, 2, 3)))
    np.testing.assert_array_equal(a, b)


def test_prefetched_yields_device_arrays(data_dir):
    ds = YoloDataset(data_dir, 32, 2)
    got = list(ds.prefetched())
    assert len(got) == len(ds)
    assert isinstance(got[0][0], jax.Array)


def test_eval_preprocess_bit_comparable():
    # /255 normalization, exactly the reference Normalize(0,1)
    img = np.arange(48, dtype=np.uint8).reshape(1, 4, 4, 3)
    out = np.asarray(preprocess_eval_batch(jnp.asarray(img)))
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, rtol=1e-7)


def test_augment_shapes_and_ranges():
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, size=(4, 64, 64, 3), dtype=np.uint8)
    boxes = np.zeros((4, 8, 5), np.float32)
    valid = np.zeros((4, 8), bool)
    boxes[:, 0] = [0.5, 0.5, 0.3, 0.3, 1.0]
    valid[:, 0] = True
    out_img, out_boxes, out_valid = augment_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
        jax.random.PRNGKey(0))
    assert out_img.shape == (4, 64, 64, 3)
    assert float(out_img.min()) >= 0.0 and float(out_img.max()) <= 1.0
    # surviving boxes stay in [0, 1]
    ob = np.asarray(out_boxes)[np.asarray(out_valid)]
    assert (ob[:, :4] >= -1e-6).all() and (ob[:, :4] <= 1 + 1e-6).all()
    # class ids preserved
    assert set(ob[:, 4]) <= {1.0}


def test_augment_hflip_only_flips_cx():
    # force flip (prob=1), disable everything else
    images = np.zeros((1, 32, 32, 3), np.uint8)
    images[:, :, :8] = 255  # bright left strip
    boxes = np.array([[[0.2, 0.4, 0.1, 0.1, 0.0]]], np.float32)
    valid = np.ones((1, 1), bool)
    out_img, out_boxes, out_valid = augment_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
        jax.random.PRNGKey(1), hflip_prob=1.0,
        color_strengths=(0.0, 0.0, 0.0, 0.0), crop_scale=(1.0, 1.0),
        crop_ratio=(1.0, 1.0))
    assert bool(out_valid[0, 0])
    np.testing.assert_allclose(
        np.asarray(out_boxes)[0, 0, :4], [0.8, 0.4, 0.1, 0.1], atol=1e-5)
    # bright strip moved to the right side
    assert float(out_img[0, :, -8:].mean()) > float(out_img[0, :, :8].mean())


def test_augment_identity_when_disabled():
    rng = np.random.RandomState(2)
    images = rng.randint(0, 255, size=(2, 16, 16, 3), dtype=np.uint8)
    boxes = np.array([[[0.5, 0.5, 0.2, 0.2, 0.0]]] * 2, np.float32)
    valid = np.ones((2, 1), bool)
    out_img, out_boxes, out_valid = augment_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
        jax.random.PRNGKey(3), hflip_prob=0.0,
        color_strengths=(0.0, 0.0, 0.0, 0.0), crop_scale=(1.0, 1.0),
        crop_ratio=(1.0, 1.0))
    np.testing.assert_allclose(
        np.asarray(out_img), images.astype(np.float32) / 255.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_boxes), boxes, atol=1e-5)


def test_augment_out_size_crop_fidelity():
    """The crop-fidelity path (DataConfig.train_decode_size): feeding a
    higher-resolution decode with ``out_size`` set to the model resolution
    yields IDENTICAL crop-window/box geometry (all window math is in relative
    units off the same key stream) and images that match the low-res path up
    to resampling error — while sampling at/above target resolution like
    Albumentations' crop-the-original (ref dataset.py:139)."""
    rng = np.random.RandomState(7)
    hi = rng.randint(0, 255, size=(3, 112, 112, 3), dtype=np.uint8)
    # the low-res path sees the SAME content pre-downsampled (the status quo)
    lo = np.stack([
        np.asarray(jax.image.resize(jnp.asarray(im, jnp.float32), (56, 56, 3),
                                    "linear"))
        for im in hi]).clip(0, 255).astype(np.uint8)
    boxes = np.zeros((3, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.55, 0.4, 0.3, 2.0]
    boxes[:, 1] = [0.2, 0.2, 0.15, 0.2, 5.0]
    valid = np.zeros((3, 8), bool)
    valid[:, :2] = True
    key = jax.random.PRNGKey(11)
    kw = dict(hflip_prob=0.5, color_strengths=(0.0,) * 4,
              crop_scale=(0.8, 1.0), crop_ratio=(0.75, 4 / 3),
              min_visibility=0.1)
    hi_img, hi_boxes, hi_valid = augment_batch(
        jnp.asarray(hi), jnp.asarray(boxes), jnp.asarray(valid), key,
        out_size=56, **kw)
    lo_img, lo_boxes, lo_valid = augment_batch(
        jnp.asarray(lo), jnp.asarray(boxes), jnp.asarray(valid), key,
        out_size=56, **kw)
    assert hi_img.shape == (3, 56, 56, 3)
    # identical geometry: same windows -> same boxes/validity, exactly
    np.testing.assert_array_equal(np.asarray(hi_valid), np.asarray(lo_valid))
    np.testing.assert_allclose(np.asarray(hi_boxes), np.asarray(lo_boxes),
                               atol=1e-6)
    # same content up to resampling error
    diff = np.abs(np.asarray(hi_img) - np.asarray(lo_img)).mean()
    assert diff < 0.08, diff


def test_train_decode_size_validation():
    from keras_object_detection_tpu.config import DataConfig

    d = DataConfig(train_decode_size=501)
    assert d.train_input_size(448) == 501
    assert DataConfig().train_input_size(448) == 448
    with pytest.raises(ValueError, match="train_decode_size"):
        DataConfig(train_decode_size=224).train_input_size(448)


def test_augment_crop_drops_low_visibility():
    # box at the far corner; a centered tight crop must drop it
    images = np.zeros((1, 64, 64, 3), np.uint8)
    boxes = np.array([[[0.03, 0.03, 0.05, 0.05, 0.0],
                       [0.5, 0.5, 0.4, 0.4, 1.0]]], np.float32)
    valid = np.ones((1, 2), bool)
    dropped_corner = 0
    for seed in range(20):
        _, ob, ov = augment_batch(
            jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
            jax.random.PRNGKey(seed), hflip_prob=0.0,
            color_strengths=(0.0, 0.0, 0.0, 0.0), crop_scale=(0.5, 0.6),
            crop_ratio=(1.0, 1.0))
        ov = np.asarray(ov)[0]
        assert ov[1]  # big center box always survives a 0.5-0.6 area crop
        dropped_corner += int(~ov[0])
    assert dropped_corner > 0  # corner box dropped in some crops


def test_cache_in_memory_identical_and_faster(data_dir):
    import time

    ds_nc = YoloDataset(data_dir, 224, 5)
    ds_c = YoloDataset(data_dir, 224, 5, cache_in_memory=True)
    a = next(ds_nc.epoch())
    b1 = next(ds_c.epoch())  # populates cache
    t0 = time.perf_counter()
    b2 = next(ds_c.epoch())  # served from cache
    cached_t = time.perf_counter() - t0
    np.testing.assert_array_equal(a[0], b1[0])
    np.testing.assert_array_equal(b1[0], b2[0])
    np.testing.assert_array_equal(b1[1], b2[1])
    t0 = time.perf_counter()
    next(ds_nc.epoch())
    uncached_t = time.perf_counter() - t0
    assert cached_t < uncached_t


def test_disk_cache_identical_and_stale_rebuild(data_dir, tmp_path):
    """cache_dir: batches from the decode-ahead memmap cache are identical to
    live decode; a stale cache (different image_size) is rebuilt, a valid one
    is reused (mtimes preserved)."""
    import json

    cache = str(tmp_path / "cache")
    ds_live = YoloDataset(data_dir, 224, 5)
    ds_disk = YoloDataset(data_dir, 224, 5, cache_dir=cache)
    a = next(ds_live.epoch())
    b = next(ds_disk.epoch())
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])

    # valid cache is reused: meta file untouched on reopen
    meta = os.path.join(cache, "meta.json")
    before = os.path.getmtime(meta)
    YoloDataset(data_dir, 224, 5, cache_dir=cache)
    assert os.path.getmtime(meta) == before
    # stale (different size): rebuilt with new geometry, still correct
    ds_96 = YoloDataset(data_dir, 96, 5, cache_dir=cache)
    assert json.load(open(meta))["image_size"] == 96
    img96 = next(ds_96.epoch())[0]
    assert img96.shape[1:] == (96, 96, 3)
    np.testing.assert_array_equal(
        img96[0], next(YoloDataset(data_dir, 96, 5).epoch())[0][0])


def test_device_cached_dataset_size_guard(data_dir):
    """The HBM-size guard fires BEFORE any host allocation or decode work
    (an oversized request must fail fast, not after minutes of decode)."""
    from keras_object_detection_tpu.data.pipeline import DeviceCachedDataset

    ds = YoloDataset(data_dir, 50000, 2, max_boxes=4)  # ~37 GB of uint8
    with pytest.raises(ValueError, match="too large for HBM"):
        DeviceCachedDataset(ds)


def test_device_cache_guard_layout_aware(data_dir):
    """The guard budgets PER DEVICE: a dataset too big replicated on a dp
    mesh suggests the sharded layout; a dataset too big even per-shard still
    raises (pointing at the disk cache)."""
    from keras_object_detection_tpu.data.pipeline import DeviceCachedDataset
    from keras_object_detection_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data_parallel=4, model_parallel=2)
    ds = YoloDataset(data_dir, 50000, 2, max_boxes=4)  # ~45 GB replicated
    with pytest.raises(ValueError, match="sharded"):
        DeviceCachedDataset(ds, mesh=mesh, layout="replicated")
    ds_huge = YoloDataset(data_dir, 120000, 2, max_boxes=4)  # ~65 GB/shard
    with pytest.raises(ValueError, match="cache_dir"):
        DeviceCachedDataset(ds_huge, mesh=mesh, layout="sharded")


def test_device_cache_sharded_gather_bit_parity(data_dir):
    """Sharded layout (rows sharded over the data axis, shard_map +
    psum_scatter gather): per-device memory is dataset/dp, and gathered
    batches are BIT-IDENTICAL to both the host loader and the replicated
    layout across a shuffled epoch (shared shuffle stream, same padding)."""
    from keras_object_detection_tpu.data.pipeline import DeviceCachedDataset
    from keras_object_detection_tpu.parallel.mesh import (batch_sharding,
                                                          create_mesh)

    mesh = create_mesh(data_parallel=4, model_parallel=2)
    mk = lambda: YoloDataset(data_dir, 64, 4, max_boxes=4, shuffle=True,
                             seed=7)
    host = mk()
    sharded = DeviceCachedDataset(mk(), mesh=mesh, layout="sharded")
    replicated = DeviceCachedDataset(mk(), mesh=mesh, layout="replicated")

    # per-device shard holds n_rows/dp rows (the whole point of the layout)
    assert sharded.n_rows % 4 == 0
    shard_rows = {s.data.shape[0] for s in sharded.images.addressable_shards}
    assert shard_rows == {sharded.n_rows // 4}
    repl_rows = {s.data.shape[0]
                 for s in replicated.images.addressable_shards}
    assert repl_rows == {replicated.n_rows}

    bsh = batch_sharding(mesh)
    g_s = jax.jit(sharded.make_gather(bsh))
    g_r = jax.jit(replicated.make_gather(bsh))
    for _ in range(2):  # two epochs: shuffle stream stays in lockstep
        for (hi, hb, hv), idx_s, idx_r in zip(
                host.epoch(), sharded.epoch_indices(),
                replicated.epoch_indices()):
            np.testing.assert_array_equal(idx_s, idx_r)
            si, sb, sv = g_s(sharded.images, sharded.boxes, sharded.valid,
                             jnp.asarray(idx_s))
            ri, rb, rv = g_r(replicated.images, replicated.boxes,
                             replicated.valid, jnp.asarray(idx_r))
            for got in (si, ri):
                np.testing.assert_array_equal(np.asarray(got), hi)
            for got in (sb, rb):
                np.testing.assert_array_equal(np.asarray(got), hb)
            for got in (sv, rv):
                np.testing.assert_array_equal(np.asarray(got), hv)
            assert si.sharding.is_equivalent_to(bsh, si.ndim)
