"""PNG-tree video datasets: BAIR robot-push, KTH actions, UCF-101 subset.

Behavioral parity with /root/reference/data/{bair,kth,ucf}.py, rebuilt as
pure functions of (seed, index):

  * **BAIR** (bair.py:10-62): frames at
    ``<root>/processed_data/{train,test}/<shard>/<traj>/<t>.png`` (64x64
    RGB); training draws a random trajectory per item, test cycles the
    trajectory list in order; ``len() == 10000`` regardless of disk
    contents. The reference's shard-scan early-``break`` at i==50 never
    fires (bair.py:23-28, `i` is never incremented) — behaviorally it scans
    everything, so we scan everything.
  * **KTH** (kth.py:10-68): 6 action classes; per-split JSON metadata in
    the reference's on-disk layout ``processed/<class>/{train,test}_meta
    <W>x<W>.json`` (each a LIST of ``{"vid": ..., "files": [chunks of
    frame filenames], "n": count}`` records — kth.py:28-30), with a
    single-file ``<root>/{train,test}_meta<W>x<W>.json`` dict-of-classes
    convenience layout also accepted; a random (class, video, chunk)
    draw REJECTED while the chunk is shorter than ``seq_len``
    (kth.py:37-44's ``while True`` loop), then a random start; returns
    ``(seq, class_id)``.
  * **UCF** (ucf.py:10-73): same access pattern over 9 UCF-101 classes,
    RGB, metadata in the same JSON schema (the reference's torch-pickled
    ``*_meta64x64.pt`` files are regenerated as JSON by
    ``dvg_tpu.data.convert.build_metadata``; ``.pt`` files are still read
    if present, via torch). The reference forces train=True (ucf.py:13); we
    honor the requested split when its metadata exists and mirror the
    reference fallback otherwise.

All datasets return float32 ``(T, H, W, C)`` arrays in [0, 1].
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

KTH_CLASSES = ("boxing", "handclapping", "handwaving", "jogging",
               "running", "walking")
# the reference's 9-class UCF-101 subset and target ids (ucf.py:17-18)
UCF_CLASSES = ("BenchPress", "BodyWeightSquats", "CleanAndJerk", "PullUps",
               "PushUps", "Shotput", "TennisSwing", "Lunges", "Fencing")


def _read_png(path: str, width: int, gray: bool) -> np.ndarray:
    img = Image.open(path)
    if gray:
        img = img.convert("L")
    else:
        img = img.convert("RGB")
    if img.size != (width, width):
        img = img.resize((width, width), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if gray:
        arr = arr[..., None]
    return arr


def _read_sequence(paths, width: int, gray: bool) -> np.ndarray:
    """Decode a frame sequence → (T, W, W, C) float32 [0,1]. Uses the native
    threaded decoder (dvg_tpu.runtime.fastload) when built; PIL otherwise
    (both paths agree to ≤1/255 per pixel)."""
    c = 1 if gray else 3
    try:
        from dvg_tpu.runtime import fastload
        if fastload.is_available():
            return fastload.decode_batch(list(paths), width, width, c)
    except Exception:
        pass
    return np.stack([_read_png(p, width, gray) for p in paths])


class BAIR:
    """BAIR robot-push 64x64 RGB, 30-frame trajectories."""

    # every integer index is a valid fresh (seed, index) draw — the Loader
    # widens its shuffle domain past len() so the sampled trajectory space
    # matches the reference's fresh-randomness-per-access breadth
    INDEX_PURE = True

    def __init__(self, train: bool = True, data_root: str = ".",
                 seq_len: int = 30, image_size: int = 64, seed: int = 1):
        self.root = os.path.join(
            data_root, "processed_data", "train" if train else "test")
        self.train = train
        self.seq_len = seq_len
        self.image_size = image_size
        self.seed = (seed, 0 if train else 1)
        self.dirs: List[str] = []
        if os.path.isdir(self.root):
            for shard in sorted(os.listdir(self.root)):
                sp = os.path.join(self.root, shard)
                if not os.path.isdir(sp):
                    continue
                for traj in sorted(os.listdir(sp), key=_numeric_key):
                    tp = os.path.join(sp, traj)
                    if os.path.isdir(tp):
                        self.dirs.append(tp)

    def __len__(self) -> int:
        return 10000  # reference bair.py:61 hardcodes epoch length

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        if not self.dirs:
            raise FileNotFoundError(
                f"no BAIR trajectories under {self.root}; run "
                "data/download_bair.sh + dvg_tpu.data.convert.convert_bair")
        if self.train:
            rng = np.random.default_rng((*self.seed, index))
            d = self.dirs[int(rng.integers(0, len(self.dirs)))]
        else:
            d = self.dirs[index % len(self.dirs)]
        paths = [os.path.join(d, f"{t}.png") for t in range(self.seq_len)]
        return _read_sequence(paths, self.image_size, gray=False), 0


class _MetaVideoDataset:
    """Shared random-window loader over the chunked-frame-list metadata
    schema used by KTH and UCF (SURVEY.md §2.11-12)."""

    classes: Sequence[str] = ()
    gray: bool = False
    INDEX_PURE = True        # see BAIR.INDEX_PURE

    def __init__(self, train: bool = True, data_root: str = ".",
                 seq_len: int = 20, image_size: int = 64, seed: int = 1):
        self.root = data_root
        self.train = train
        self.seq_len = seq_len
        self.image_size = image_size
        self.seed = (seed, 0 if train else 1)
        self.meta = self._load_meta(train)
        self._validate_meta()

    def _meta_path(self, train: bool, ext: str) -> str:
        split = "train" if train else "test"
        w = self.image_size
        return os.path.join(self.root, f"{split}_meta{w}x{w}.{ext}")

    def _load_meta(self, train: bool) -> Optional[dict]:
        # Reference on-disk layout first: one metadata file of records per
        # class at processed/<class>/<split>_meta<W>x<W>.{json,pt} — the
        # reference reads per-class JSON for KTH (kth.py:28-30) and
        # per-class torch pickles for UCF (ucf.py:31).
        split = "train" if train else "test"
        w = self.image_size
        paths = {}
        for c in self.classes:
            for ext in ("json", "pt"):
                p = os.path.join(self.root, "processed", c,
                                 f"{split}_meta{w}x{w}.{ext}")
                if os.path.exists(p):
                    paths.setdefault(c, p)
        if paths:
            # the reference opens every class file unconditionally and
            # crashes on a missing one — a partial set would silently
            # narrow the sampled class distribution
            missing = [c for c in self.classes if c not in paths]
            if missing:
                raise FileNotFoundError(
                    f"per-class metadata present for {sorted(paths)} but "
                    f"missing for {missing} (expected e.g. processed/"
                    f"{missing[0]}/{split}_meta{w}x{w}.json); convert all "
                    "classes or remove the partial layout")
            return {c: self._read_meta_file(p) for c, p in paths.items()}
        jpath = self._meta_path(train, "json")
        if os.path.exists(jpath):
            with open(jpath) as f:
                return json.load(f)
        ppath = self._meta_path(train, "pt")
        if os.path.exists(ppath):
            raw = self._read_meta_file(ppath)
            return {c: raw[c] for c in raw}
        return None

    @staticmethod
    def _read_meta_file(path: str):
        if path.endswith(".json"):
            with open(path) as f:
                return json.load(f)
        # reference-format torch pickle (meta_creator.py stores lists of
        # numpy string arrays); torch>=2.6 defaults weights_only=True,
        # which rejects pickled numpy — this is the user's own metadata
        # file, the same trust the reference extends to it (ucf.py:31)
        import torch
        try:
            return torch.load(path, weights_only=False)
        except TypeError:              # older torch without the kwarg
            return torch.load(path)

    def _validate_meta(self) -> None:
        """Class-coverage validation, run ONCE at metadata load (the
        metadata is immutable after __init__). A missing-from-disk metadata
        file (meta is None) stays legal here — __getitem__ raises its
        actionable FileNotFoundError only when data is actually asked for,
        so constructing a dataset for introspection never needs files."""
        if self.meta is None:
            return
        avail = [c for c in self.classes if self.meta.get(c)]
        if not avail:
            raise ValueError(
                f"metadata classes {sorted(self.meta)} share no names with "
                f"the expected {type(self).__name__} classes "
                f"{list(self.classes)} (or all record lists are empty) — "
                "check class naming/casing in the metadata file")
        if len(avail) != len(self.classes):
            # a partial class set silently narrows the sampled distribution
            # (same failure mode the per-class layout rejects in _load_meta);
            # the reference crashes here too — randint over an empty record
            # list (kth.py:38)
            bad = [c for c in self.classes if not self.meta.get(c)]
            raise ValueError(
                f"metadata has records for {avail} but none for {bad} — "
                "convert every class or restrict the dataset's `classes`")

    def __len__(self) -> int:
        return len(self.classes) * 100 if self.train else 1000

    def _frame_dir(self, cls: str, vid: str) -> str:
        return os.path.join(self.root, "processed", cls, vid)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        if self.meta is None:
            raise FileNotFoundError(
                f"metadata not found at {self._meta_path(self.train, 'json')}; "
                "run dvg_tpu.data.convert.build_metadata after frame conversion")
        rng = np.random.default_rng((*self.seed, index))
        # _validate_meta guaranteed every class has records
        avail = self.classes
        # Reference kth.py:37-44 redraws (class, video, chunk) while the
        # chunk is shorter than seq_len; bound the loop and fall back to
        # right-padding if nothing fits (degenerate metadata only).
        for _ in range(1000):
            cls = avail[int(rng.integers(0, len(avail)))]
            vids = self.meta[cls]
            rec = vids[int(rng.integers(0, len(vids)))]
            if not rec.get("files"):
                # surface the loader's own diagnostic instead of numpy's
                # opaque "low >= high" from randint over an empty list
                raise ValueError(
                    f"metadata record {rec.get('vid')!r} in class {cls!r} "
                    "has an empty 'files' list — rebuild the metadata for "
                    "that video (dvg_tpu.data.convert.build_metadata)")
            chunk = rec["files"][int(rng.integers(0, len(rec["files"])))]
            if len(chunk) >= self.seq_len:
                break
        cls_id = self.classes.index(cls)
        # len(), not truthiness: chunks from .pt metadata are numpy string
        # arrays (meta_creator.py's np.array_split), whose bool() raises
        if len(chunk) == 0:
            raise ValueError(
                f"metadata record {rec.get('vid')!r} in class {cls!r} "
                "contains an empty frame chunk — rebuild the metadata for "
                "that video (dvg_tpu.data.convert.build_metadata)")
        if len(chunk) < self.seq_len:
            start = 0
            chunk = list(chunk) + [chunk[-1]] * (self.seq_len - len(chunk))
        else:
            start = int(rng.integers(0, len(chunk) - self.seq_len + 1))
        d = self._frame_dir(cls, rec["vid"])
        paths = [os.path.join(d, fn)
                 for fn in chunk[start:start + self.seq_len]]
        return _read_sequence(paths, self.image_size, self.gray), cls_id


class KTH(_MetaVideoDataset):
    classes = KTH_CLASSES
    gray = True


class UCF(_MetaVideoDataset):
    classes = UCF_CLASSES
    gray = False

    def __init__(self, train: bool = True, **kw):
        super().__init__(train=train, **kw)
        if self.meta is None and train is False:
            # reference ucf.py:13 forces the train split; fall back likewise
            self.meta = self._load_meta(True)
            self.train = True
            self._validate_meta()


def _numeric_key(name: str):
    return (0, int(name)) if name.isdigit() else (1, name)
