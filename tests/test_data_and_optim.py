"""Tests: samplers, datasets (synthetic), augmentation ops vs PIL,
optimizer labeling/schedules, mixup, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.config import OptimFamilyConfig, ScheduleConfig
from ofb_tpu.core.optim import (build_search_optimizer, cosine_schedule,
                                label_params, make_trainable_mask)
from ofb_tpu.data.datasets import SyntheticDataset, build_dataset
from ofb_tpu.data.samplers import distributed_indices, epoch_batches, \
    ra_indices
from ofb_tpu.ops import augment as A
from ofb_tpu.ops.mixup import mixup_cutmix, one_hot_smooth


# ---------------------------------------------------------------------------
# samplers (reference samplers.py:8-59; SURVEY §4 seam)
# ---------------------------------------------------------------------------

def test_ra_sampler_semantics():
    n, world = 1024, 4
    per_rank = [ra_indices(n, epoch=3, rank=r, world=world) for r in
                range(world)]
    num_selected = int(np.floor(n // 256 * 256 / world))
    for idx in per_rank:
        assert len(idx) == num_selected
    # 3x repetition: across ranks the same index appears up to 3 times in
    # one "world pass"
    allidx = np.concatenate(per_rank)
    _, counts = np.unique(allidx, return_counts=True)
    assert counts.max() <= 3
    # deterministic per epoch, different across epochs
    again = ra_indices(n, epoch=3, rank=0, world=world)
    np.testing.assert_array_equal(per_rank[0], again)
    other = ra_indices(n, epoch=4, rank=0, world=world)
    assert not np.array_equal(per_rank[0], other)


def test_distributed_indices_partition():
    n, world = 100, 8
    parts = [distributed_indices(n, 0, r, world) for r in range(world)]
    total = sum(len(p) for p in parts)
    assert total == int(np.ceil(n / world)) * world
    covered = set(np.concatenate(parts).tolist())
    assert covered == set(range(n))


def test_epoch_batches_shape():
    b = epoch_batches(np.arange(103), 10)
    assert b.shape == (10, 10)


def test_synthetic_dataset():
    ds = SyntheticDataset(64, 10, 32)
    img, lbl = ds[7]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    img2, _ = ds[7]
    np.testing.assert_array_equal(img, img2)


# ---------------------------------------------------------------------------
# augmentation vs PIL ground truth
# ---------------------------------------------------------------------------

@pytest.fixture
def sample_img():
    rs = np.random.RandomState(0)
    return rs.randint(0, 256, (24, 24, 3), np.uint8)


def test_invert_solarize_posterize_vs_pil(sample_img):
    from PIL import Image, ImageOps
    img = jnp.asarray(sample_img, jnp.float32)
    pil = Image.fromarray(sample_img)

    np.testing.assert_allclose(np.array(A.invert(img)),
                               np.asarray(ImageOps.invert(pil)), atol=0)
    np.testing.assert_allclose(
        np.array(A.solarize(img, 128.0)),
        np.asarray(ImageOps.solarize(pil, 128)), atol=0)
    np.testing.assert_allclose(
        np.array(A.posterize(img, jnp.asarray(3))),
        np.asarray(ImageOps.posterize(pil, 3)), atol=0)


def test_autocontrast_matches_pil(sample_img):
    from PIL import Image, ImageOps
    img = jnp.asarray(sample_img, jnp.float32)
    pil = Image.fromarray(sample_img)
    ours = np.array(A.autocontrast(img))
    ref = np.asarray(ImageOps.autocontrast(pil)).astype(np.float32)
    assert np.abs(ours - ref).mean() < 2.0  # rounding differences


def test_enhancement_ops_match_pil(sample_img):
    from PIL import Image, ImageEnhance
    img = jnp.asarray(sample_img, jnp.float32)
    pil = Image.fromarray(sample_img)
    for fac in (0.5, 1.3):
        np.testing.assert_allclose(
            np.array(A.brightness(img, fac)),
            np.asarray(ImageEnhance.Brightness(pil).enhance(fac)),
            atol=1.0)
        np.testing.assert_allclose(
            np.array(A.color(img, fac)),
            np.asarray(ImageEnhance.Color(pil).enhance(fac)), atol=2.0)
        ours_c = np.array(A.contrast(img, fac))
        ref_c = np.asarray(ImageEnhance.Contrast(pil).enhance(fac))
        assert np.abs(ours_c - ref_c).mean() < 3.0


def test_affine_identity_and_translate(sample_img):
    img = jnp.asarray(sample_img, jnp.float32)
    out = A.affine_warp(img, jnp.array([[1.0, 0, 0], [0, 1.0, 0]]))
    np.testing.assert_allclose(np.array(out), sample_img, atol=1e-3)
    # translate by +4 px in x: output pixel x samples source x+4
    out = A.affine_warp(img, jnp.array([[1.0, 0, 4.0], [0, 1.0, 0]]))
    np.testing.assert_allclose(np.array(out)[:, :18], sample_img[:, 4:22],
                               atol=1e-3)


def test_train_augment_batch_shapes():
    rs = np.random.RandomState(0)
    batch = rs.randint(0, 256, (4, 40, 40, 3), np.uint8)
    out = A.train_augment_batch(jax.random.PRNGKey(0), jnp.asarray(batch),
                                out_size=32)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.array(out)).all()
    # normalized domain: roughly centered
    assert abs(float(out.mean())) < 3.0


def test_eval_preprocess_batch():
    rs = np.random.RandomState(0)
    batch = rs.randint(0, 256, (2, 40, 40, 3), np.uint8)
    out = A.eval_preprocess_batch(jnp.asarray(batch), out_size=32)
    assert out.shape == (2, 32, 32, 3)


# ---------------------------------------------------------------------------
# mixup
# ---------------------------------------------------------------------------

def test_mixup_labels_sum_to_one():
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.rand(8, 16, 16, 3), jnp.float32)
    lbls = jnp.asarray(rs.randint(0, 10, (8,)))
    out_im, out_y = mixup_cutmix(jax.random.PRNGKey(0), imgs, lbls,
                                 num_classes=10)
    np.testing.assert_allclose(np.array(out_y.sum(-1)), np.ones(8),
                               rtol=1e-5)
    assert out_im.shape == imgs.shape


def test_one_hot_smooth():
    y = one_hot_smooth(jnp.asarray([2]), 10, 0.1)
    assert abs(float(y[0, 2]) - 0.91) < 1e-6
    assert abs(float(y[0, 0]) - 0.01) < 1e-6


# ---------------------------------------------------------------------------
# optimizer: labels, schedules, masks
# ---------------------------------------------------------------------------

def test_param_labels():
    params = {
        "pos_embed": jnp.zeros((1, 5, 8)),
        "patch_embed": {"score": jnp.zeros((8,)),
                        "proj": {"kernel": jnp.zeros((2, 2, 3, 8)),
                                 "bias": jnp.zeros((8,))}},
        "blocks": [{"attn": {"qkv": {"kernel": jnp.zeros((8, 24)),
                                     "bias": jnp.zeros((24,))}}}],
        "decoder": {"conv": {"kernel": jnp.zeros((1, 1, 8, 12)),
                             "bias": jnp.zeros((12,))}},
    }
    labels = label_params(params)
    assert labels["pos_embed"] == "param_nd"
    assert labels["patch_embed"]["score"] == "param_nd"
    assert labels["patch_embed"]["proj"]["kernel"] == "param_d"
    assert labels["blocks"][0]["attn"]["qkv"]["kernel"] == "param_d"
    assert labels["blocks"][0]["attn"]["qkv"]["bias"] == "param_nd"
    assert labels["decoder"]["conv"]["kernel"] == "dec_d"
    assert labels["decoder"]["conv"]["bias"] == "dec_nd"


def test_cosine_schedule_matches_timm_semantics():
    sched = ScheduleConfig(warmup_lr=1e-6, min_lr=1e-5, warmup_epochs=2)
    fn = cosine_schedule(1e-3, sched, total_steps=100, steps_per_epoch=10)
    assert abs(float(fn(0)) - 1e-6) < 1e-9          # warmup start
    assert abs(float(fn(20)) - 1e-3) < 1e-6          # warmup end -> base lr
    mid = float(fn(60))                              # half of cosine span
    assert 1e-5 < mid < 1e-3
    assert abs(float(fn(100)) - 1e-5) < 1e-8         # min at end
    assert abs(float(fn(150)) - 1e-5) < 1e-8         # clamped after end


def test_trainable_mask_freezes():
    params = {"patch_embed": {"score": jnp.zeros((4,))},
              "blocks": [{"attn": {"score": jnp.zeros((2, 2))}}]}
    alphas = {"patch": jnp.zeros(5), "embed": jnp.zeros(3),
              "blocks": [{"attn": jnp.zeros((2, 2)), "mlp": jnp.zeros(3)}]}
    pm, am = make_trainable_mask(params, alphas, freeze_weights=False,
                                 w_patch=0.0, w_head=0.5, w_mlp=0.5,
                                 w_embedding=0.5)
    assert am["patch"] == 0.0 and am["embed"] == 1.0
    assert am["blocks"][0]["attn"] == 1.0


def test_scan_image_folder_and_cifar_pickles(tmp_path):
    """Self-contained folder scan + CIFAR pickle reader (no torchvision)."""
    from PIL import Image
    import pickle
    from ofb_tpu.data.datasets import CifarDataset, scan_image_folder

    for cls in ("cat", "dog"):
        d = tmp_path / "imgs" / cls
        d.mkdir(parents=True)
        Image.new("RGB", (8, 8)).save(d / "x.jpg")
    samples, c2i = scan_image_folder(str(tmp_path / "imgs"))
    assert c2i == {"cat": 0, "dog": 1}
    assert len(samples) == 2 and samples[0][1] == 0

    # synthetic CIFAR-10 batch files
    rs = np.random.RandomState(0)
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    for fn in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        d = {b"data": rs.randint(0, 256, (4, 3072), np.uint8),
             b"labels": [0, 1, 2, 3]}
        with open(base / fn, "wb") as f:
            pickle.dump(d, f)
    ds = CifarDataset(str(tmp_path), train=True, staging=32)
    assert len(ds) == 20
    img, lbl = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    ds_test = CifarDataset(str(tmp_path), train=False, staging=40)
    img2, _ = ds_test[1]
    assert img2.shape == (40, 40, 3)


def test_freeze_weights_mask():
    """--freeze_weights keeps only alpha/score/norm/token/decoder/mask/head
    trainable (reference search.py:421-426)."""
    params = {
        "patch_embed": {"score": jnp.zeros(4),
                        "proj": {"kernel": jnp.zeros((2, 2, 3, 4)),
                                 "bias": jnp.zeros(4)}},
        "cls_token": jnp.zeros((1, 1, 4)),
        "blocks": [{"attn": {"qkv": {"kernel": jnp.zeros((4, 12))}},
                    "norm1": {"scale": jnp.zeros(4)}}],
        "head": {"kernel": jnp.zeros((4, 10))},
        "decoder": {"conv": {"kernel": jnp.zeros((1, 1, 4, 12))}},
    }
    alphas = {"patch": jnp.zeros(5), "embed": jnp.zeros(3), "blocks": []}
    pm, _ = make_trainable_mask(params, alphas, freeze_weights=True)
    assert pm["patch_embed"]["score"] == 1.0
    assert pm["patch_embed"]["proj"]["kernel"] == 0.0
    assert pm["cls_token"] == 1.0            # 'token'
    assert pm["blocks"][0]["attn"]["qkv"]["kernel"] == 0.0
    assert pm["blocks"][0]["norm1"]["scale"] == 1.0
    assert pm["head"]["kernel"] == 1.0
    assert pm["decoder"]["conv"]["kernel"] == 1.0


def test_mixup_modes_and_minmax():
    """timm parity surface: pair/elem modes and cutmix_minmax boxes
    (reference search.py:148-156 flags)."""
    rs = np.random.RandomState(1)
    imgs = jnp.asarray(rs.rand(8, 16, 16, 3), jnp.float32)
    lbls = jnp.asarray(rs.randint(0, 10, (8,)))

    for mode in ("batch", "pair", "elem"):
        out_im, out_y = mixup_cutmix(jax.random.PRNGKey(3), imgs, lbls,
                                     num_classes=10, mode=mode)
        np.testing.assert_allclose(np.array(out_y.sum(-1)), np.ones(8),
                                   rtol=1e-5)
        # every output pixel is a convex combination of x[i] and x[B-1-i]
        lo = np.minimum(np.asarray(imgs), np.asarray(imgs)[::-1]) - 1e-6
        hi = np.maximum(np.asarray(imgs), np.asarray(imgs)[::-1]) + 1e-6
        assert (np.asarray(out_im) >= lo).all()
        assert (np.asarray(out_im) <= hi).all()

    # pair mode: params shared per (i, B-1-i) pair -> label lambdas mirror
    _, y_pair = mixup_cutmix(jax.random.PRNGKey(5), imgs, lbls,
                             num_classes=10, mode="pair",
                             label_smoothing=0.0, switch_prob=0.0)
    oh = np.asarray(jax.nn.one_hot(lbls, 10))
    lam = (np.asarray(y_pair) * oh).sum(-1)   # weight on own label
    distinct = oh.argmax(-1) != oh[::-1].argmax(-1)
    np.testing.assert_allclose(lam[distinct], lam[::-1][distinct], atol=1e-6)

    # cutmix_minmax: pure-cut draws, box area ratio within [0.2, 0.8]^2
    out_im, out_y = mixup_cutmix(jax.random.PRNGKey(7), imgs, lbls,
                                 num_classes=10, mixup_alpha=0.0,
                                 cutmix_alpha=0.0, cutmix_minmax=(0.2, 0.8),
                                 mode="elem", label_smoothing=0.0)
    lam = (np.asarray(out_y) * oh).sum(-1)
    same = oh.argmax(-1) == oh[::-1].argmax(-1)
    # lam = 1 - cut_h*cut_w/(H*W) in [1 - 0.8^2, 1 - 0.2^2]
    assert ((lam[~same] >= 1 - 0.64 - 1e-6)
            & (lam[~same] <= 1 - 0.04 + 1e-6)).all()
    # the pasted region is exactly the flipped image's pixels
    diff = np.abs(np.asarray(out_im) - np.asarray(imgs)).sum(-1) > 1e-6
    fmatch = np.abs(np.asarray(out_im) - np.asarray(imgs)[::-1]).sum(-1) < 1e-6
    assert (fmatch[diff]).all()


def test_digits_dataset():
    """Real-image digits set: deterministic disjoint 80/20 split, uint8
    staging squares (used by the accuracy story, scripts/digits_story.py)."""
    from ofb_tpu.data.datasets import DigitsDataset
    tr = DigitsDataset(True, 40)
    va = DigitsDataset(False, 40)
    assert len(tr) + len(va) == 1797 and len(va) == 360
    img, lbl = tr[0]
    assert img.shape == (40, 40, 3) and img.dtype == np.uint8
    assert 0 <= lbl <= 9
    tr2 = DigitsDataset(True, 40)
    np.testing.assert_array_equal(tr.labels, tr2.labels)


def test_imnet_folder_pipeline_end_to_end(tmp_path):
    """IMNET/IMNET100 build_dataset -> FolderDataset JPEG decode ->
    make_epoch_loader staging batch, on a synthetic ImageFolder tree (the
    production ImageNet path, runnable without the real dataset)."""
    from PIL import Image
    from ofb_tpu.config import DataConfig
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import make_epoch_loader

    rs = np.random.RandomState(0)
    for split, n in (("train", 3), ("val", 2)):
        for cls in ("n01", "n02"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = rs.randint(0, 255, (40, 52, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")

    dcfg = DataConfig(data_path=str(tmp_path), data_set="IMNET",
                      batch_size=4)
    ds, nb = build_dataset(True, dcfg, staging=32)
    assert nb == 1000 and len(ds) == 6
    img, lbl = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert lbl in (0, 1)
    loader = make_epoch_loader(ds, epoch=0, rank=0, world=1, batch_size=4,
                               repeated_aug=False, train=True, seed=0,
                               num_workers=0)
    imgs, lbls = next(iter(loader))
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    assert set(np.asarray(lbls)) <= {0, 1}

    # IMNET100: subset index built and cached
    dcfg100 = DataConfig(data_path=str(tmp_path), data_set="IMNET100",
                         batch_size=4)
    ds100, nb100 = build_dataset(False, dcfg100, staging=32)
    assert nb100 == 100 and len(ds100) == 4
    assert (tmp_path / "imnet100_val.pkl").exists()


def test_inat_json_dataset(tmp_path):
    """INAT json-annotation loader on a synthetic tree
    (reference datasets.py:19-58 semantics)."""
    import json as _json
    from PIL import Image
    from ofb_tpu.config import DataConfig
    from ofb_tpu.data.datasets import build_dataset

    rs = np.random.RandomState(1)
    cats = [{"id": 0, "name": "zebra"}, {"id": 1, "name": "ant"}]
    images, anns = [], []
    (tmp_path / "imgs").mkdir()
    for i in range(4):
        fn = f"imgs/{i}.jpg"
        Image.fromarray(rs.randint(0, 255, (24, 24, 3), np.uint8)).save(
            tmp_path / fn)
        images.append({"id": i, "file_name": fn})
        anns.append({"image_id": i, "category_id": i % 2})
    with open(tmp_path / "train2018.json", "w") as f:
        _json.dump({"images": images, "annotations": anns}, f)
    with open(tmp_path / "categories2018.json", "w") as f:
        _json.dump(cats, f)

    dcfg = DataConfig(data_path=str(tmp_path), data_set="INAT", batch_size=2)
    ds, nb = build_dataset(True, dcfg, staging=32)
    assert nb == 2 and len(ds) == 4
    img, lbl = ds[1]
    assert img.shape == (32, 32, 3)
    # sorted names: ant=0, zebra=1; image 1 -> category_id 1 -> 'ant' -> 0
    assert lbl == 0


# ---------------------------------------------------------------------------
# device-resident dataset cache (pipeline.build_device_cache / feed)
# ---------------------------------------------------------------------------

def test_device_cache_matches_host_feed():
    """The cached feed must be BIT-IDENTICAL to the host-loader feed: same
    epoch index plan (same samplers/seed), same augment rng stream — the
    only difference is where the staging bytes come from."""
    from ofb_tpu.data.pipeline import (build_device_cache, device_cache_feed,
                                       device_feed, make_epoch_loader)

    ds = SyntheticDataset(37, 5, 24)
    cache, labels = build_device_cache(ds, chunk=16)
    assert cache.shape == (37, 24, 24, 3) and cache.dtype == jnp.uint8
    # cache rows are exactly the dataset's staging images
    for i in (0, 7, 36):
        img, lbl = ds[i]
        np.testing.assert_array_equal(np.asarray(cache[i]), img)
        assert int(labels[i]) == lbl

    common = dict(epoch=2, rank=0, world=1, batch_size=8, seed=3)
    for raw, train, ra, accum in ((True, True, True, 2), (False, True, True, 1),
                                  (False, False, False, 1)):
        loader = make_epoch_loader(ds, train=train, repeated_aug=ra,
                                   **{k: v for k, v in common.items()
                                      if k != "batch_size"},
                                   batch_size=common["batch_size"])
        host = list(device_feed(loader, rng=jax.random.PRNGKey(9),
                                train=train, accum_iter=accum, out_size=16,
                                raw=raw))
        cached = list(device_cache_feed(cache, labels,
                                        rng=jax.random.PRNGKey(9),
                                        train=train, repeated_aug=ra,
                                        accum_iter=accum, out_size=16,
                                        raw=raw, **common))
        assert len(host) == len(cached) and len(host) > 0
        for (hx, hy), (cx, cy) in zip(host, cached):
            np.testing.assert_array_equal(np.asarray(hx), np.asarray(cx))
            np.testing.assert_array_equal(np.asarray(hy), np.asarray(cy))


def test_device_cache_size_guard():
    from ofb_tpu.data.pipeline import build_device_cache
    ds = SyntheticDataset(64, 4, 32)
    with pytest.raises(ValueError):
        build_device_cache(ds, max_bytes=1000)
