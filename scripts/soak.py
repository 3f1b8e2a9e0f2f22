"""Reproducible full-protocol soak: the README quality row as an artifact.

Regenerates `runs/soak_smmnist/` end-to-end (VERDICT r4 item 6):

  1. trains the reference Moving-MNIST recipe (train.py:340-392 epoch
     loop; 50 epochs x 300 steps at batch 100, seed 1, bf16) through the
     real training CLI;
  2. runs the full reference eval protocol (generate_frames.py:138-178:
     100 sampled futures, n_eval=105, batch 50, 2 batches) + the
     GP-trigger path through the real generation CLI;
  3. collects manifest.json (flags, seeds, git rev, device, wall times),
     the training metrics.jsonl, and the eval_batch*.npz score arrays the
     reference always threw away (generate_frames.py:329) into the run dir.

The dataset is the seed-pinned (seed, index)-pure Moving-MNIST generator;
without real MNIST idx files on disk it uses the procedural glyph set, so
the run is bit-reproducible from the repo alone. Pass --data_root to use
real MNIST. Headline scores land in manifest.json["summary"].

Usage: python scripts/soak.py [--out runs/soak_smmnist] [--niter 50]
       [--epoch_size 300] [--quick]   (--quick: 2x25 steps, eval 8x20 — a
       smoke test of THIS script, not the soak)
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, log_path):
    t0 = time.time()
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    if p.returncode != 0:
        sys.stderr.write(open(log_path).read()[-4000:])
        raise SystemExit(f"{cmd[1]} failed rc={p.returncode} (log {log_path})")
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/soak_smmnist")
    ap.add_argument("--niter", type=int, default=50)
    ap.add_argument("--epoch_size", type=int, default=300)
    ap.add_argument("--train_batch", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--data_root", default="/tmp/dvg_soak_nodata",
                    help="MNIST idx location; default = absent → the "
                         "seed-pinned procedural glyph set (reproducible "
                         "from the repo alone)")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.niter, args.epoch_size = 2, 25

    out = os.path.join(REPO, args.out)
    model_dir = os.path.join(out, "model")
    os.makedirs(model_dir, exist_ok=True)

    train_flags = [
        "--dataset", "smmnist", "--channels", "1", "--image_width", "64",
        "--batch_size", str(args.train_batch), "--n_past", "5",
        "--n_future", "10", "--n_eval", "15", "--g_dim", "90",
        "--rnn_size", "256", "--model", "dcgan", "--dtype", "bfloat16",
        "--seed", str(args.seed), "--niter", str(args.niter),
        "--epoch_size", str(args.epoch_size), "--ckpt_every", "10",
        "--data_root", args.data_root,
        "--output_path", model_dir, "--log_dir", os.path.join(out, "train"),
    ]
    # eval at the reference protocol: 100 futures, 105 frames, batch 50
    ev = (8, 20, 2) if args.quick else (100, 105, 2)
    gen_flags = [
        "--model_dir", model_dir, "--dataset", "smmnist",
        "--data_root", args.data_root, "--seed", str(args.seed),
        "--nsample", str(ev[0]), "--override_n_eval", str(ev[1]),
        "--override_batch_size", "50", "--num_batches", str(ev[2]),
        "--dtype", "bfloat16", "--log_dir", os.path.join(out, "eval"),
    ]

    t_train = run([sys.executable, "train.py", *train_flags],
                  os.path.join(out, "train_stdout.log"))
    t_eval = run([sys.executable, "generate_frames.py", *gen_flags],
                 os.path.join(out, "eval_stdout.log"))
    t_trig = run([sys.executable, "generate_frames.py", *gen_flags,
                  "--gp_trigger_flag", "--num_batches", "1"],
                 os.path.join(out, "trigger_stdout.log"))

    # ---- summarize the persisted artifacts ---------------------------------
    import numpy as np
    summary = {}
    eval_dir = os.path.join(out, "eval")
    for bi in range(ev[2]):
        npz = os.path.join(eval_dir, f"eval_batch{bi}.npz")
        if os.path.exists(npz):
            with np.load(npz) as z:
                ssim = z["ssim"]                      # (S, T', B)
                summary[f"batch{bi}_best_of_{ev[0]}_ssim"] = float(
                    ssim.mean(axis=1).max(axis=0).mean())
                summary[f"batch{bi}_mean_ssim"] = float(ssim.mean())
    tr_jsonl = os.path.join(out, "train", "metrics.jsonl")
    if os.path.exists(tr_jsonl):
        rows = [json.loads(l) for l in open(tr_jsonl) if l.strip()]
        ep = [r for r in rows if r.get("kind") == "epoch"]
        if ep:
            summary["first_epoch_mse"] = ep[0].get("epoch_mse")
            summary["last_epoch_mse"] = ep[-1].get("epoch_mse")
            summary["sustained_step_s"] = ep[-1].get("step_s")

    try:
        rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                             capture_output=True, text=True).stdout.strip()
    except Exception:
        rev = None
    try:
        import jax
        device = str(jax.devices()[0])
    except Exception:
        device = None
    manifest = {
        "protocol": ("reference train.py:340-392 (smmnist) + "
                     "generate_frames.py:138-178 eval + GPtrigger_gen"),
        "train_flags": train_flags, "eval_flags": gen_flags,
        "dataset_note": ("procedural glyph Moving-MNIST (no MNIST idx "
                         "files at data_root) — seed-pinned, reproducible "
                         "from the repo alone"
                         if not os.path.exists(os.path.join(
                             args.data_root, "train-images-idx3-ubyte"))
                         else f"real MNIST at {args.data_root}"),
        "git_rev": rev, "device": device,
        "wall_s": {"train": round(t_train, 1), "eval": round(t_eval, 1),
                   "trigger": round(t_trig, 1)},
        "summary": summary,
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    # keep the artifact lean for git: drop GIF/PNG renders, keep scores
    for sub in ("eval", "train"):
        d = os.path.join(out, sub)
        if os.path.isdir(d):
            for name in os.listdir(d):
                if name.endswith((".gif", ".png")):
                    os.remove(os.path.join(d, name))
    ckpt = os.path.join(model_dir, "model.ckpt")
    if os.path.exists(ckpt) and os.path.getsize(ckpt) > 64 << 20:
        os.remove(ckpt)   # reproducible via this script; too big for git
    print(json.dumps(manifest["summary"] | {"out": args.out}))


if __name__ == "__main__":
    main()
