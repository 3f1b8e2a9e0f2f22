"""Native runtime tests: the C++ fastload decoder vs the PIL reference path
(skipped when no toolchain can build the library)."""

import os

import numpy as np
import pytest
from PIL import Image

from dvg_tpu.runtime import fastload

pytestmark = pytest.mark.skipif(not fastload.is_available(),
                                reason="native fastload not built")


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        p = str(d / f"{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def _pil(paths, size, mode):
    out = []
    for p in paths:
        img = Image.open(p).convert(mode)
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        a = np.asarray(img, np.float32) / 255.0
        out.append(a[..., None] if mode == "L" else a)
    return np.stack(out)


def test_rgb_exact(png_dir):
    out = fastload.decode_batch(png_dir, 64, 64, 3)
    np.testing.assert_allclose(out, _pil(png_dir, 64, "RGB"), atol=1e-6)


def test_gray_and_resize_within_one_lsb(png_dir):
    # PIL rounds intermediates to uint8; the native path stays float →
    # agreement to 1/255
    for size, ch, mode in [(64, 1, "L"), (32, 3, "RGB"), (128, 3, "RGB")]:
        out = fastload.decode_batch(png_dir, size, size, ch)
        ref = _pil(png_dir, size, mode)
        assert np.abs(out - ref).max() <= 1.01 / 255.0, (size, ch)


def test_into_preallocated_time_major(png_dir):
    buf = np.empty((3, 2, 64, 64, 3), np.float32)   # (T, B, H, W, C)
    fastload.decode_batch(png_dir, 64, 64, 3, out=buf)
    ref = _pil(png_dir, 64, "RGB").reshape(3, 2, 64, 64, 3)
    np.testing.assert_allclose(buf, ref, atol=1e-6)


def test_missing_file_error(png_dir):
    with pytest.raises(IOError):
        fastload.decode_batch([png_dir[0], "/nope/x.png"], 64, 64, 3)


def test_dataset_path_uses_native(tmp_path):
    """BAIR loader path decodes identically via native and PIL routes."""
    from dvg_tpu.data.frames import BAIR, _read_png
    root = tmp_path / "processed_data" / "train" / "shard" / "0"
    os.makedirs(root)
    rng = np.random.RandomState(1)
    for t in range(4):
        Image.fromarray(rng.randint(0, 256, (64, 64, 3), np.uint8)).save(
            str(root / f"{t}.png"))
    ds = BAIR(train=False, data_root=str(tmp_path), seq_len=4)
    # train=False walks dirs in order
    ds.root = str(tmp_path / "processed_data" / "train")
    ds.dirs = [str(root)]
    seq, _ = ds[0]
    ref = np.stack([_read_png(str(root / f"{t}.png"), 64, False)
                    for t in range(4)])
    np.testing.assert_allclose(seq, ref, atol=1e-6)
