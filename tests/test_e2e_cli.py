"""End-to-end CLI smoke test: the full user path on the CPU mesh —
`train.py` 2 epochs → checkpoint → `generate_frames.py` in its three modes
(default eval, sample-parallel --mesh_samples, --gp_trigger_flag) —
asserting every artifact the reference drivers produce (train.py:340-392,
generate_frames.py:324-329) plus the ones this framework adds
(metrics.jsonl, persisted eval .npz). Protects the restore-then-override
glue and the --mesh_samples global-id select translation that unit tests
can't see."""

import glob
import json
import os

import numpy as np
import pytest

from dvg_tpu.cli import generate as gen_cli
from dvg_tpu.cli import train as train_cli

TRAIN_ARGS = [
    "--dataset", "smmnist", "--channels", "1", "--data_root", "",
    "--batch_size", "4", "--mesh", "2",
    "--niter", "2", "--epoch_size", "2",
    "--n_past", "2", "--n_future", "2", "--n_eval", "4",
    "--g_dim", "8", "--rnn_size", "16",
    "--ckpt_every", "1", "--seed", "1",
]


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    out, logs = root / "run", root / "logs"
    os.makedirs(out)
    rc = train_cli.main(TRAIN_ARGS + ["--output_path", str(out),
                                      "--log_dir", str(logs)])
    assert rc == 0
    return root, out, logs


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_train_cli_artifacts(trained):
    root, out, logs = trained
    assert os.path.exists(out / "model.ckpt")
    # qualitative plot grid + gif every ckpt_every epochs (train.py:331-335)
    assert os.path.exists(out / "sample_0.png")
    assert os.path.exists(out / "sample_0.gif")
    assert os.path.exists(out / "sample_1.png")
    recs = _read_jsonl(logs / "metrics.jsonl")
    epochs = [r for r in recs if r.get("kind") == "epoch"]
    assert len(epochs) == 2
    assert all(np.isfinite(r["epoch_mse"]) for r in epochs)


def test_generate_cli_default_path(trained):
    """Default eval: posterior + diverse rollout + persisted arrays + GIFs.
    The checkpoint's geometry (g_dim=8, rnn_size=16, n_past=2) must be
    restored from the checkpoint — the CLI is NOT told about it
    (restore-then-override, generate_frames.py:43-49)."""
    root, out, _ = trained
    glogs = root / "glogs"
    rc = gen_cli.main([
        "--model_dir", str(out), "--log_dir", str(glogs),
        "--dataset", "smmnist", "--data_root", "",
        "--nsample", "4", "--num_batches", "1",
        "--override_n_eval", "4", "--override_batch_size", "2",
        "--gif_rows", "2",
    ])
    assert rc == 0
    arrs = np.load(glogs / "eval_batch0.npz")
    # (B, S, T') with B=2 rows, S=4 samples, T'=2 free-run frames
    assert arrs["ssim"].shape == (2, 4, 2)
    assert arrs["psnr"].shape == (2, 4, 2)
    assert np.isfinite(arrs["ssim"]).all()
    recs = _read_jsonl(glogs / "metrics.jsonl")
    ev = [r for r in recs if r.get("kind") == "eval"]
    assert len(ev) == 1 and np.isfinite(ev[0]["ssim_best_mean"])
    gifs = sorted(glob.glob(str(glogs / "sample_lstm_*.gif")))
    assert len(gifs) == 2      # --gif_rows 2


def test_generate_cli_mesh_samples(trained):
    """Sample-parallel (and 2-D sample x data) eval produces the same
    artifact set; exercises the global-id -> (device, local) select
    translation end-to-end."""
    root, out, _ = trained
    glogs = root / "glogs_mesh"
    rc = gen_cli.main([
        "--model_dir", str(out), "--log_dir", str(glogs),
        "--dataset", "smmnist", "--data_root", "",
        "--nsample", "4", "--num_batches", "1",
        "--mesh_samples", "2", "--mesh_data", "2",
        "--override_n_eval", "4", "--override_batch_size", "2",
        "--gif_rows", "1",
    ])
    assert rc == 0
    arrs = np.load(glogs / "eval_batch0.npz")
    assert arrs["ssim"].shape == (2, 4, 2)
    assert np.isfinite(arrs["ssim"]).all()
    assert len(glob.glob(str(glogs / "sample_lstm_*.gif"))) == 1


def test_generate_cli_gp_trigger(trained, monkeypatch):
    """--gp_trigger_flag: adaptive variance-trigger rollout writing
    every-3rd-frame strips under recursive_generation/<idx>/
    (generate_frames.py:249-300 contract)."""
    root, out, _ = trained
    glogs = root / "glogs_trigger"
    monkeypatch.chdir(root)     # strips are written CWD-relative
    rc = gen_cli.main([
        "--model_dir", str(out), "--log_dir", str(glogs),
        "--dataset", "smmnist", "--data_root", "",
        "--num_batches", "1", "--gp_trigger_flag",
        "--override_n_eval", "14", "--override_batch_size", "2",
    ])
    assert rc == 0
    strips = glob.glob(str(root / "recursive_generation" / "*" / "*.png"))
    assert len(strips) == 2     # one strip per batch row
    recs = _read_jsonl(glogs / "metrics.jsonl")
    trig = [r for r in recs if r.get("kind") == "trigger"]
    assert len(trig) == 1 and np.isfinite(trig[0]["triggers"])
