"""Dataset layer tests: Moving-MNIST determinism/shapes, loader batching,
metadata-driven frame datasets, conversion tools (SURVEY.md §4 plan)."""

import json
import os

import numpy as np
import pytest

from dvg_tpu.config import DVGConfig
from dvg_tpu.data import Loader, MovingMNIST, load_dataset, normalize_batch
from dvg_tpu.data.convert import build_metadata, iter_tfrecords, parse_example
from dvg_tpu.data.frames import KTH


def test_moving_mnist_shapes_and_range():
    ds = MovingMNIST(train=True, seq_len=7, num_digits=2, image_size=64)
    x, y = ds[0]
    assert x.shape == (7, 64, 64, 1)
    assert x.dtype == np.float32
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert y == 0


def test_moving_mnist_deterministic_per_index():
    """Unlike the reference (worker-seed-dependent, moving_mnist.py:30-33),
    samples are a pure function of (seed, index)."""
    a = MovingMNIST(train=True, seq_len=5, seed=3)
    b = MovingMNIST(train=True, seq_len=5, seed=3)
    np.testing.assert_array_equal(a[11][0], b[11][0])
    assert not np.array_equal(a[11][0], a[12][0])
    c = MovingMNIST(train=True, seq_len=5, seed=4)
    assert not np.array_equal(a[11][0], c[11][0])


def test_moving_mnist_digits_move():
    x, _ = MovingMNIST(train=True, seq_len=10, seed=1)[0]
    diffs = [np.abs(x[t + 1] - x[t]).sum() for t in range(9)]
    assert all(d > 0 for d in diffs), "digits must move every frame"


def test_loader_time_major():
    ds = MovingMNIST(train=True, seq_len=6, image_size=64)
    loader = Loader(ds, batch_size=3, seed=0)
    b0 = loader.next_batch(0)
    assert b0.shape == (6, 3, 64, 64, 1)
    np.testing.assert_array_equal(b0, loader.next_batch(0))
    assert not np.array_equal(b0, loader.next_batch(1))


def _make_bair_tree(root, shards=1, trajs=8, frames=15, size=64):
    from PIL import Image
    rng = np.random.default_rng(0)
    for s in range(shards):
        for v in range(trajs):
            d = os.path.join(root, "processed_data", "train", f"s{s}", str(v))
            os.makedirs(d, exist_ok=True)
            base = np.clip(np.cumsum(rng.normal(size=(size, size, 3)),
                                     axis=0) * 20 + 128, 0, 255)
            for t in range(frames):
                arr = np.clip(base + t * 2, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{t}.png"))


@pytest.mark.perf
def test_loader_sustains_png_tree_throughput(tmp_path):
    """The Loader must keep a chip fed from a PNG tree: persistent decode +
    batch pools (no per-batch executor churn) and `prefetch` batches built
    ahead. Asserts (a) a conservative absolute floor and (b) that the
    prefetch pipeline hides batch-build time behind consumer work — when
    the consumer is slower than the producer, `next()` returns from the
    ready queue nearly instantly instead of paying a full batch build.

    Wall-clock-sensitive (marked `perf`): deselect with `-m "not perf"` on
    loaded/shared CI machines; the floors are set ~5x below the pace this
    single-core box sustains."""
    import time

    from dvg_tpu.data.frames import BAIR

    _make_bair_tree(str(tmp_path))
    ds = BAIR(train=True, data_root=str(tmp_path), seq_len=10)
    loader = Loader(ds, batch_size=16, seed=0, num_threads=4, prefetch=4)
    try:
        it = iter(loader)
        next(it)                                   # warm pools + caches
        t0 = time.perf_counter()
        n = 6
        for _ in range(n):
            b = next(it)
        build_s = (time.perf_counter() - t0) / n   # producer-bound pace
        fps = 16 * 10 / build_s
        assert b.shape == (10, 16, 64, 64, 3)
        assert fps > 150, f"loader too slow: {fps:.0f} frames/s"

        # consumer slower than producer -> batches wait ready in the pipe
        lat = []
        for _ in range(4):
            time.sleep(2 * build_s)                # "training step"
            t0 = time.perf_counter()
            next(it)
            lat.append(time.perf_counter() - t0)
        assert min(lat) < 0.75 * build_s, (
            f"prefetch not hiding build time: next() latencies {lat} "
            f"vs build {build_s:.3f}s")
    finally:
        loader.stop()


def test_loader_surfaces_build_errors():
    """A failing batch build (e.g. corrupt file) must surface to the
    consumer as the original exception, not hang or leak silently."""

    class Flaky:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            if i >= 6:
                raise IOError(f"corrupt item {i}")
            return np.zeros((3, 8, 8, 1), np.float32), 0

    loader = Loader(Flaky(), batch_size=2, shuffle=False, num_threads=2,
                    prefetch=2, device_assemble=False)
    try:
        it = iter(loader)
        got = 0
        with pytest.raises(IOError):
            for _ in range(10):
                next(it)
                got += 1
        assert got >= 1      # healthy steps delivered before the failure
    finally:
        loader.stop()


def test_loader_stop_and_restart(tmp_path):
    """stop() tears the pools down; the Loader remains usable after."""
    ds = MovingMNIST(train=True, seq_len=4, image_size=64)
    loader = Loader(ds, batch_size=2, seed=0, device_assemble=False)
    it = iter(loader)
    a = next(it)
    loader.stop()
    b = loader.next_batch(0)        # rebuilds pools on demand
    assert a.shape == b.shape
    loader.stop()


def test_normalize_batch():
    items = [np.zeros((4, 8, 8, 1), np.float32) for _ in range(3)]
    out = normalize_batch(items)
    assert out.shape == (4, 3, 8, 8, 1)


def test_load_dataset_registry():
    cfg = DVGConfig(dataset="smmnist", n_past=2, n_future=3, n_eval=5)
    tr, te = load_dataset(cfg)
    assert tr.seq_len == 5 and te.seq_len == 5
    with pytest.raises(ValueError):
        load_dataset(cfg.replace(dataset="nope"))


def _make_png_tree(root, classes, vids=2, frames=12, size=16):
    from PIL import Image
    for cls in classes:
        for v in range(vids):
            d = os.path.join(root, "processed", cls, f"vid{v}")
            os.makedirs(d, exist_ok=True)
            for t in range(frames):
                arr = np.full((size, size), (t * 17) % 255, np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(d, f"image-{t}_16x16.png"))


def test_metadata_and_kth_loader(tmp_path):
    root = str(tmp_path)
    classes = ("boxing", "walking")
    _make_png_tree(root, classes)
    path = build_metadata(root, classes, image_size=64, split="train")
    meta = json.load(open(path))
    assert set(meta) == set(classes)
    rec = meta["boxing"][0]
    assert rec["n"] == 12 and len(rec["files"]) == 4

    # KTH only knows its 6 canonical classes; monkeypatch for the fixture
    tiny_classes = classes

    class TinyKTH(KTH):
        classes = tiny_classes
    ds = TinyKTH(train=True, data_root=root, seq_len=3, image_size=64)
    seq, cls_id = ds[0]
    assert seq.shape == (3, 64, 64, 1)
    assert 0 <= cls_id < len(classes)
    # deterministic per index
    np.testing.assert_array_equal(ds[5][0], ds[5][0])


def test_ucf_pt_metadata_and_train_fallback(tmp_path):
    """UCF reads the reference's torch-pickled *_meta64x64.pt metadata
    (ucf.py:31) and mirrors the reference's forced-train fallback when the
    requested test split has no metadata (ucf.py:13)."""
    import torch

    from dvg_tpu.data.frames import UCF

    root = str(tmp_path)
    classes = ("Basketball", "Diving")
    _make_png_tree(root, classes, vids=1, frames=8)
    meta = {}
    for cls in classes:
        files = [f"image-{t}_16x16.png" for t in range(8)]
        meta[cls] = [{"vid": "vid0",
                      "files": [files[:2], files[2:4], files[4:6], files[6:]],
                      "n": 8}]
    torch.save(meta, os.path.join(root, "train_meta64x64.pt"))

    class TinyUCF(UCF):
        classes = ("Basketball", "Diving")

    ds = TinyUCF(train=True, data_root=root, seq_len=2, image_size=64)
    seq, cls_id = ds[0]
    assert seq.shape == (2, 64, 64, 3)       # UCF is RGB
    assert 0 <= cls_id < 2
    np.testing.assert_array_equal(ds[3][0], ds[3][0])   # deterministic

    # no test metadata on disk -> reference fallback forces the train split
    ds_test = TinyUCF(train=False, data_root=root, seq_len=2, image_size=64)
    assert ds_test.train is True and ds_test.meta is not None
    seq2, _ = ds_test[1]
    assert seq2.shape == (2, 64, 64, 3)


def test_tfrecord_example_roundtrip(tmp_path):
    """Hand-encode a TFRecord of tf.train.Examples; the pure-python reader
    must recover the raw image bytes (convert_bair.py parity without TF)."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def ld(field, payload):       # length-delimited field
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    img = bytes(range(48))  # fake 4x4x3 image
    bytes_list = ld(1, img)
    feature = ld(1, bytes_list)
    entry = ld(1, b"0/image_aux1/encoded") + ld(2, feature)
    features = ld(1, entry)
    example = ld(1, features)

    import struct
    path = tmp_path / "a.tfrecords"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(example)) + b"\0" * 4
                + example + b"\0" * 4)

    recs = list(iter_tfrecords(str(path)))
    assert len(recs) == 1
    feats = parse_example(recs[0])
    assert feats["0/image_aux1/encoded"][0] == img


def test_loader_process_local_rows_match_global_batch(tmp_path, monkeypatch):
    """Loader._build_process_local: the per-process row blocks must
    concatenate to EXACTLY the single-process global batch, for both the
    synthetic-stream path (full-batch generate + slice: the stream RNG is
    seeded by batch SIZE, so a half-batch is not a slice) and the per-item
    index path (shared (seed, step) index list, sliced). Multi-process
    context is simulated by monkeypatching the process topology."""
    import jax

    from dvg_tpu.data.frames import BAIR
    from dvg_tpu.data.moving_mnist import MovingMNIST

    _make_bair_tree(str(tmp_path))
    datasets = [
        MovingMNIST(train=True, seq_len=4, image_size=64, seed=3),
        BAIR(train=True, data_root=str(tmp_path), seq_len=5),
    ]
    captured = {}

    def fake_make_array(sharding, local):
        captured["local"] = np.asarray(local)
        return local

    for ds in datasets:
        loader = Loader(ds, batch_size=8, seed=0, num_threads=1,
                        sharding="sentinel")
        # host-assembled reference (device_assemble uses the on-device
        # scatter-add whose zeros differ from numpy's at subnormal level)
        full = Loader(ds, batch_size=8, seed=0, num_threads=1,
                      device_assemble=False)._build(3)
        full = np.asarray(full)
        halves = []
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "make_array_from_process_local_data",
                            fake_make_array)
        for pid in range(2):
            monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
            loader._build(3)
            halves.append(captured["local"])
        monkeypatch.undo()
        got = np.concatenate(halves, axis=1)
        np.testing.assert_array_equal(got, full, err_msg=type(ds).__name__)


REF_KTH_META = "/root/reference/data"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_KTH_META, "train_meta64x64.json")),
    reason="reference KTH metadata artifacts not on disk")
def test_kth_reference_real_metadata(tmp_path):
    """Drive the KTH loader with the reference's REAL experiment metadata
    (/root/reference/data/{train,test}_meta64x64.json), laid out exactly as
    the reference reads them: processed/<class>/<split>_meta64x64.json for
    EVERY class (kth.py:28-30 opens all six unconditionally — the loader is
    equally strict, see test_kth_partial_class_layout_rejected). Every real
    record is validated structurally, frames named by the records are
    materialized as symlinks to one real PNG, and the sampling law is
    asserted to honor {vid, files, n}: each drawn item is a contiguous
    seq_len-window of ONE chunk of ONE real record, labelled by its class
    row. (Match: /root/reference/data/kth.py:10-68.)"""
    from PIL import Image

    from dvg_tpu.data import frames as frames_mod

    train_meta = json.load(
        open(os.path.join(REF_KTH_META, "train_meta64x64.json")))
    test_meta = json.load(
        open(os.path.join(REF_KTH_META, "test_meta64x64.json")))

    # 1) every real record parses into the schema the loader relies on
    for meta in (train_meta, test_meta):
        assert isinstance(meta, list) and meta
        for rec in meta:
            assert set(rec) == {"vid", "files", "n"}
            assert isinstance(rec["vid"], str)
            assert all(isinstance(f, str)
                       for ch in rec["files"] for f in ch)
            assert rec["n"] == sum(len(ch) for ch in rec["files"])

    # 2) reference on-disk layout + symlinked frames: the real record
    # lists under every class dir, as a fully converted dataset would have
    root = str(tmp_path)
    src = os.path.join(root, "frame.png")
    Image.fromarray(np.full((64, 64), 128, np.uint8)).save(src)
    for split, meta in (("train", train_meta), ("test", test_meta)):
        for cls in KTH.classes:
            cdir = os.path.join(root, "processed", cls)
            os.makedirs(cdir, exist_ok=True)
            with open(os.path.join(cdir, f"{split}_meta64x64.json"),
                      "w") as f:
                json.dump(meta, f)
            for rec in meta:
                vdir = os.path.join(cdir, rec["vid"])
                os.makedirs(vdir, exist_ok=True)
                for ch in rec["files"]:
                    for fn in ch:
                        p = os.path.join(vdir, fn)
                        if not os.path.exists(p):
                            os.symlink(src, p)

    # 3) sampling honors the metadata: capture the exact paths requested
    real_read = frames_mod._read_sequence
    captured = []

    def spy(paths, width, gray):
        captured.append(list(paths))
        return real_read(paths, width, gray)

    frames_mod._read_sequence = spy
    try:
        for train, meta in ((True, train_meta), (False, test_meta)):
            ds = KTH(train=train, data_root=root, seq_len=20, image_size=64)
            assert set(ds.meta) == set(KTH.classes)
            byvid = {r["vid"]: r for r in meta}
            drawn = set()
            for idx in range(12):
                seq, cls_id = ds[idx]
                assert seq.shape == (20, 64, 64, 1)
                paths = captured[-1]
                dirs = {os.path.dirname(p) for p in paths}
                assert len(dirs) == 1
                vdir = dirs.pop()
                vid = os.path.basename(vdir)
                cls = os.path.basename(os.path.dirname(vdir))
                drawn.add(cls)
                assert cls_id == KTH.classes.index(cls)
                rec = byvid[vid]
                names = [os.path.basename(p) for p in paths]
                assert any(
                    names == ch[s:s + 20]
                    for ch in rec["files"]
                    for s in range(max(1, len(ch) - 19))
                ), f"{vid}: window not contiguous in any chunk"
            assert len(drawn) > 1, "class draw must span classes"
    finally:
        frames_mod._read_sequence = real_read


def test_kth_partial_class_layout_rejected(tmp_path):
    """A per-class layout covering only SOME classes is an error, not a
    silently narrowed class distribution — the reference (kth.py:28-30)
    opens every class file unconditionally and crashes on a missing one."""
    cdir = os.path.join(str(tmp_path), "processed", "walking")
    os.makedirs(cdir)
    with open(os.path.join(cdir, "train_meta64x64.json"), "w") as f:
        json.dump([{"vid": "v", "files": [["0.png"]], "n": 1}], f)
    with pytest.raises(FileNotFoundError, match="missing for"):
        KTH(train=True, data_root=str(tmp_path), seq_len=5, image_size=64)


def test_kth_partial_single_file_metadata_rejected(tmp_path):
    """Single-file metadata covering only SOME classes (or with empty
    record lists) must also fail loudly — same silently-narrowed-
    distribution failure mode as the per-class layout; the reference
    crashes here too (randint over an empty record list, kth.py:38).
    Contract (frames.py _validate_meta): present-but-invalid metadata is
    rejected EAGERLY at construction; only metadata missing from disk
    defers its FileNotFoundError to first access."""
    meta = {c: [{"vid": "v", "files": [["0.png"] * 9], "n": 9}]
            for c in KTH.classes[:4]}
    meta[KTH.classes[4]] = []         # present but empty = still missing
    with open(os.path.join(str(tmp_path), "train_meta64x64.json"),
              "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="none for"):
        KTH(train=True, data_root=str(tmp_path), seq_len=5, image_size=64)


def test_kth_foreign_class_names_rejected(tmp_path):
    """Single-file metadata whose class keys share no names with the KTH
    class table must fail loudly at construction (eager validation of
    present metadata, frames.py _validate_meta), not KeyError later."""
    with open(os.path.join(str(tmp_path), "train_meta64x64.json"),
              "w") as f:
        json.dump({"Biking": [{"vid": "v", "files": [["0.png"]],
                               "n": 1}]}, f)
    with pytest.raises(ValueError, match="share no names"):
        KTH(train=True, data_root=str(tmp_path), seq_len=5, image_size=64)


def test_kth_empty_files_record_diagnostic(tmp_path):
    """A record with an empty 'files' list (or an empty chunk) must raise
    the loader's own diagnostic naming the video, not numpy's opaque
    'low >= high' from randint over an empty list."""
    meta = {c: [{"vid": f"{c}_v", "files": [["0.png"] * 9], "n": 9}]
            for c in KTH.classes}
    meta[KTH.classes[0]] = [{"vid": "broken_vid", "files": [], "n": 0}]
    with open(os.path.join(str(tmp_path), "train_meta64x64.json"),
              "w") as f:
        json.dump(meta, f)
    ds = KTH(train=True, data_root=str(tmp_path), seq_len=5, image_size=64)
    # draw until the broken class is hit (class choice is index-seeded)
    with pytest.raises(ValueError, match="broken_vid"):
        for i in range(64):
            try:
                ds[i]
            except FileNotFoundError:   # healthy classes: PNGs don't exist
                continue


def test_build_metadata_array_split_covers_all_frames(tmp_path):
    """Chunking follows the reference's np.array_split (meta_creator.py:20):
    a video whose length is not divisible by n_chunks keeps EVERY frame
    (13 → 4/3/3/3), where fixed-size chunking would drop the tail."""
    root = str(tmp_path)
    d = os.path.join(root, "processed", "boxing", "vid0")
    os.makedirs(d)
    from PIL import Image
    for t in range(13):
        Image.fromarray(np.zeros((16, 16), np.uint8)).save(
            os.path.join(d, f"image-{t}_16x16.png"))
    path = build_metadata(root, ("boxing",), image_size=64, split="train")
    rec = json.load(open(path))["boxing"][0]
    sizes = [len(c) for c in rec["files"]]
    assert sizes == [4, 3, 3, 3] and sum(sizes) == rec["n"] == 13


# -- stochastic bounce law (reference moving_mnist.py:56-79) -----------------

class _ScriptedRng:
    """Stands in for np.random.Generator: returns queued arrays for each
    successive integers() call so wall hits can be forced deterministically."""

    def __init__(self, script):
        self.script = [np.asarray(s, dtype=np.int64) for s in script]

    def integers(self, *a, **k):
        return self.script.pop(0)


def _scripted_traj(start, vel, new_mag, new_other, deterministic=False):
    ds = MovingMNIST(train=True, seq_len=3, num_digits=1, image_size=64,
                     deterministic=deterministic)
    script = [[0], [start], [vel]]
    if not deterministic:
        script += [[new_mag], [new_other]]
    traj, _ = ds._trajectories(_ScriptedRng(script), 1)
    return traj[:, 0]


def test_bounce_single_axis_redraws_away_and_other_full_range():
    """Reference moving_mnist.py:56-79: the colliding axis redraws AWAY from
    its wall (magnitude = new_mag draw), the other axis redraws over the
    full range (new_other draw)."""
    # y-under: away dy = +new_mag[0], dx = new_other[1]
    t = _scripted_traj(start=[2, 10], vel=[-4, 0],
                       new_mag=[3, 2], new_other=[1, 1])
    assert t[1].tolist() == [0, 10]        # clamped to the wall
    assert t[2].tolist() == [3, 11]        # moved by (+3 away, +1 redrawn)
    # x-over: away dx = -new_mag[1], dy = new_other[0]
    t = _scripted_traj(start=[10, 30], vel=[0, 4],
                       new_mag=[3, 2], new_other=[1, 1])
    assert t[1].tolist() == [10, 31]       # clamped to lim-1 = 31
    assert t[2].tolist() == [11, 29]       # moved by (+1 redrawn, -2 away)


def test_bounce_corner_x_branch_overwrites_dy():
    """On a simultaneous corner hit the reference's x branch runs AFTER the
    y branch, so its full-range dy redraw overwrites the y branch's
    away-from-wall dy: final velocity is (dy = new_other, dx = away)."""
    # both under
    t = _scripted_traj(start=[1, 1], vel=[-4, -4],
                       new_mag=[3, 2], new_other=[1, 1])
    assert t[1].tolist() == [0, 0]
    assert t[2].tolist() == [1, 2]         # dy = new_other[0]=1, dx = +2 away
    # y-under, x-over
    t = _scripted_traj(start=[1, 30], vel=[-4, 4],
                       new_mag=[3, 2], new_other=[1, 1])
    assert t[1].tolist() == [0, 31]
    assert t[2].tolist() == [1, 29]        # dy = new_other[0]=1, dx = -2 away


def test_bounce_deterministic_reflects_only_colliding_axis():
    t = _scripted_traj(start=[2, 10], vel=[-4, 1],
                       new_mag=None, new_other=None, deterministic=True)
    assert t[1].tolist() == [0, 11]
    assert t[2].tolist() == [4, 12]        # dy flipped, dx untouched


def test_resize_bilinear_uint8_quantized_like_torchvision():
    """The 28->32 upscale mirrors torchvision Scale(32)+ToTensor
    (reference moving_mnist.py:24): PIL bilinear on the uint8 image, THEN
    /255 — so every output value sits on the uint8 grid and edges are
    interpolated (nearest-neighbor would keep only {0,1})."""
    from dvg_tpu.data.moving_mnist import _resize_bilinear

    rng = np.random.default_rng(0)
    imgs = rng.random((3, 28, 28), dtype=np.float32)
    out = _resize_bilinear(imgs, 32)
    assert out.shape == (3, 32, 32) and out.dtype == np.float32
    np.testing.assert_allclose(out * 255.0, np.round(out * 255.0), atol=1e-4)
    assert out.min() >= 0.0 and out.max() <= 1.0

    const = np.full((1, 28, 28), 0.5, np.float32)
    want = np.float32(int(0.5 * 255.0 + 0.5)) / np.float32(255.0)
    assert np.all(_resize_bilinear(const, 32) == want)

    step = np.zeros((1, 28, 28), np.float32)
    step[:, :, 14:] = 1.0
    o = _resize_bilinear(step, 32)[0]
    assert ((o > 0.0) & (o < 1.0)).any()   # bilinear blends the edge


# -- resume continuation and the INDEX_PURE shuffle domain -------------------

def test_loader_iter_from_continues_stream():
    """--resume feeds the stream from the checkpointed step: iter_from(k)'s
    first batch equals next_batch(k), not the step-0 replay."""
    ds = MovingMNIST(train=True, seq_len=3, num_digits=1, image_size=64)
    ld = Loader(ds, 2, seed=7, num_threads=1)
    it = ld.iter_from(5)
    try:
        first = np.asarray(next(it))
        second = np.asarray(next(it))
    finally:
        ld.stop()
    np.testing.assert_array_equal(first, np.asarray(ld2_batch(ds, 5)))
    np.testing.assert_array_equal(second, np.asarray(ld2_batch(ds, 6)))


def ld2_batch(ds, step):
    ld = Loader(ds, 2, seed=7, num_threads=1)
    return ld.next_batch(step)


def test_index_pure_shuffle_domain_exceeds_len(tmp_path):
    """INDEX_PURE frame datasets widen the shuffle domain past len() so a
    training run samples more distinct (video, chunk, start) windows than
    len(dataset) — the reference draws fresh np.random windows per access
    (kth.py:37-44), so capping at len() would narrow the distribution."""
    root = str(tmp_path)
    _make_png_tree(root, ("boxing", "walking"))
    build_metadata(root, ("boxing", "walking"), image_size=64, split="train")

    class TinyKTH(KTH):
        classes = ("boxing", "walking")
    ds = TinyKTH(train=True, data_root=root, seq_len=3, image_size=64)
    assert ds.INDEX_PURE
    ld = Loader(ds, batch_size=64, seed=0, num_threads=1)
    idx = ld._indices(0)
    assert idx.max() >= len(ds), "shuffle domain must exceed len()"
    # every widened index is a valid pure draw
    seq, cid = ds[int(idx.max())]
    assert seq.shape == (3, 64, 64, 1) and 0 <= cid < 2
    # non-pure datasets keep the [0, len) domain
    class Plain:
        def __len__(self):
            return 10
    assert Loader(Plain(), 64, seed=0)._indices(0).max() < 10


def test_ucf_per_class_pt_metadata(tmp_path):
    """The reference's real UCF layout: per-class torch pickles at
    processed/<cls>/train_meta64x64.pt (ucf.py:31) whose records hold
    numpy string ARRAYS for the chunks (meta_creator.py's np.array_split)
    — both the probe and the ndarray-chunk handling must cope."""
    import torch

    from dvg_tpu.data.frames import UCF

    root = str(tmp_path)
    classes = ("BenchPress", "Fencing")
    _make_png_tree(root, classes, vids=1, frames=8)
    for cls in classes:
        files = np.array([f"image-{t}_16x16.png" for t in range(8)])
        rec = {"vid": "vid0", "files": np.array_split(files, 4), "n": 8}
        torch.save([rec], os.path.join(root, "processed", cls,
                                       "train_meta64x64.pt"))

    class TinyUCF(UCF):
        classes = ("BenchPress", "Fencing")

    ds = TinyUCF(train=True, data_root=root, seq_len=2, image_size=64)
    seq, cls_id = ds[0]
    assert seq.shape == (2, 64, 64, 3) and 0 <= cls_id < 2
    np.testing.assert_array_equal(ds[3][0], ds[3][0])


def test_moving_mnist_splits_use_disjoint_digits(tmp_path):
    """The reference's test split draws from the held-out t10k images
    (datasets.MNIST(train=train), moving_mnist.py:20-26): the split must
    select the digit SOURCE, not just perturb the trajectory RNG."""
    tr = MovingMNIST(train=True, seq_len=2, seed=3)
    te = MovingMNIST(train=False, seq_len=2, seed=3)
    assert not np.array_equal(tr.digits, te.digits)  # glyph-disjoint banks
    # idx-file selection: write distinct train/t10k files and check each
    # split reads its own
    import struct
    for stem, fill in (("train-images-idx3-ubyte", 10),
                       ("t10k-images-idx3-ubyte", 200)):
        with open(tmp_path / stem, "wb") as f:
            f.write(struct.pack(">IIII", 2051, 3, 28, 28))
            f.write(bytes([fill]) * (3 * 28 * 28))
    tr2 = MovingMNIST(train=True, seq_len=2, data_root=str(tmp_path))
    te2 = MovingMNIST(train=False, seq_len=2, data_root=str(tmp_path))
    assert float(tr2.digits.max()) == np.float32(10 / 255.0)
    assert float(te2.digits.max()) == np.float32(200 / 255.0)


def test_moving_mnist_missing_split_is_loud(tmp_path):
    """An explicit data_root must never swap in glyphs silently: a missing
    idx file warns when NO real MNIST is present, and raises when the
    OTHER split's file exists (train and eval would otherwise score
    different data distributions — real digits vs glyphs)."""
    import struct

    # empty data_root: glyph fallback still allowed, but with a warning
    with pytest.warns(UserWarning, match="procedural glyphs"):
        MovingMNIST(train=False, seq_len=2, data_root=str(tmp_path))
    # data_root="" (the default): silent procedural glyphs, no warning
    import warnings as W
    with W.catch_warnings():
        W.simplefilter("error")
        MovingMNIST(train=False, seq_len=2)
    # train file present but t10k missing: mixing distributions is fatal
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 2, 28, 28))
        f.write(bytes([50]) * (2 * 28 * 28))
    MovingMNIST(train=True, seq_len=2, data_root=str(tmp_path))  # fine
    with pytest.raises(FileNotFoundError, match="OTHER split"):
        MovingMNIST(train=False, seq_len=2, data_root=str(tmp_path))


def test_moving_mnist_corrupt_idx_is_fatal(tmp_path):
    """A PRESENT-but-unreadable idx file (bad magic / truncated header) is
    not 'not found': glyph fallback would silently swap the data
    distribution, so _load_mnist_images raises instead of returning None."""
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(b"\x00\x00\x07\xff garbage not an idx header")
    with pytest.raises(ValueError, match="unreadable"):
        MovingMNIST(train=True, seq_len=2, data_root=str(tmp_path))
    # truncated header (< 16 bytes) is the same failure mode
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(b"\x00\x00")
    with pytest.raises(ValueError, match="unreadable"):
        MovingMNIST(train=True, seq_len=2, data_root=str(tmp_path))
