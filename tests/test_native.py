"""Native data-prep library (native/ofb_dataprep.cpp via ctypes)."""

import io
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from ofb_tpu.data.native import (native_available, resize_rgb, stage_jpeg,
                                 stage_jpeg_batch)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


def _jpeg_bytes(w=96, h=64, seed=0, quality=95):
    from PIL import Image
    rs = np.random.RandomState(seed)
    # smooth image so JPEG loss is small
    base = rs.rand(8, 8, 3)
    img = np.kron(base, np.ones((h // 8, w // 8, 1)))
    img = (img * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue(), img


def test_stage_shapes_and_determinism():
    data, _ = _jpeg_bytes()
    a = stage_jpeg(data, 48)
    b = stage_jpeg(data, 48)
    assert a.shape == (48, 48, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)


def test_stage_close_to_pil():
    from PIL import Image
    data, _ = _jpeg_bytes(w=128, h=96, seed=1)
    out = stage_jpeg(data, 64)
    pil = Image.open(io.BytesIO(data)).convert("RGB")
    w, h = pil.size
    s = 64
    nw, nh = (s, max(s, round(h * s / w))) if w < h else (
        max(s, round(w * s / h)), s)
    ref = np.asarray(pil.resize((nw, nh), Image.BICUBIC))
    x0, y0 = (nw - s) // 2, (nh - s) // 2
    ref = ref[y0:y0 + s, x0:x0 + s]
    assert np.abs(out.astype(float) - ref.astype(float)).mean() < 6.0


def test_batch_matches_single_and_handles_garbage():
    data, _ = _jpeg_bytes()
    batch = stage_jpeg_batch([data, b"not a jpeg", data], 32, nthreads=2)
    single = stage_jpeg(data, 32)
    np.testing.assert_array_equal(batch[0], single)
    np.testing.assert_array_equal(batch[2], single)
    assert batch[1].sum() == 0  # failed slot zero-filled


def test_resize_rgb_identity():
    rs = np.random.RandomState(0)
    img = rs.randint(0, 256, (16, 16, 3), np.uint8)
    out = resize_rgb(img, 16, 16)
    np.testing.assert_array_equal(out, img)


def test_host_loader_native_batch_path(tmp_path):
    """HostLoader takes the whole-batch native staging path for JPEG folder
    datasets (one C call, threaded)."""
    from PIL import Image
    import numpy as np
    rs = np.random.RandomState(0)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            img = (rs.rand(40, 48, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.jpg", quality=95)

    from ofb_tpu.data.datasets import FolderDataset
    from ofb_tpu.data.pipeline import HostLoader
    ds = FolderDataset(str(tmp_path), staging=32)
    loader = HostLoader(ds, np.arange(6).reshape(2, 3))
    batches = list(loader)
    assert len(batches) == 2
    imgs, lbls = batches[0]
    assert imgs.shape == (3, 32, 32, 3) and imgs.dtype == np.uint8
    assert lbls.shape == (3,)
    # native batch output must equal the per-image dataset path
    ref0 = ds[0][0]
    np.testing.assert_array_equal(imgs[0], ref0)


def test_make_imagefolder_roundtrip(tmp_path):
    """The JPEG ImageFolder generator produces a tree that scan/decode
    (native or PIL fallback) stages correctly, with class-separable
    content (different classes differ more than JPEG noise)."""
    import subprocess
    import sys
    root = str(tmp_path / "imf")
    r = subprocess.run(
        [sys.executable, "scripts/make_imagefolder.py", "--root", root,
         "--classes", "3", "--per-class", "2", "--val-per-class", "1",
         "--min-size", "40", "--max-size", "64"],
        cwd=REPO, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-1500:]

    from ofb_tpu.data.datasets import FolderDataset
    ds = FolderDataset(root + "/train", staging=48)
    assert len(ds) == 6
    imgs = {}
    for i in range(len(ds)):
        arr, target = ds[i]
        assert arr.shape == (48, 48, 3) and arr.dtype == np.uint8
        imgs.setdefault(target, []).append(arr.astype(np.float32))
    assert sorted(imgs) == [0, 1, 2]
    # same-class pairs closer than cross-class pairs (content is learnable)
    same = np.abs(imgs[0][0] - imgs[0][1]).mean()
    cross = np.abs(imgs[0][0] - imgs[1][0]).mean()
    assert cross > same
