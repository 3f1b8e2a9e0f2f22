"""Configuration for DVG-TPU.

One dataclass that honors ALL of the reference's argparse flags
(reference train.py:17-46, generate_frames.py:17-41) — including the ones
the reference declares but never wires up:

  * ``model`` ('dcgan'|'vgg') — dead in the reference (train.py:75 hardcodes
    models.dcgan_64); HERE it actually selects the backbone family.
  * ``image_width`` (64|128) — dead in the reference; HERE it selects the
    64- vs 128-px encoder/decoder variants.
  * ``z_dim`` — unused in the reference (no VAE path wired); kept for the
    gaussian_lstm / gaussian_encoder components which this framework ships
    as first-class (see dvg_tpu.models.rnn / .vgg).

The checkpoint acts as the config store at generation time: restore replaces
the live config and then overrides n_eval=105 / n_future=100 / batch_size=50
(reference generate_frames.py:43-49). See `generation_override`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict


@dataclasses.dataclass
class DVGConfig:
    # -- optimization (reference train.py:18-29) --
    lr: float = 0.002
    beta1: float = 0.9
    batch_size: int = 50
    optimizer: str = "adam"
    niter: int = 601            # epochs
    seed: int = 1
    epoch_size: int = 300       # steps per epoch

    # -- bookkeeping (reference train.py:21-25) --
    log_dir: str = "logs"
    model_dir: str = ""
    name: str = ""
    output_path: str = "."
    data_root: str = "path/to/data/"

    # -- data/model geometry (reference train.py:30-43) --
    image_width: int = 64
    channels: int = 1
    dataset: str = "kth"
    n_past: int = 5
    ft: bool = True             # run the two finetune passes per batch
    n_future: int = 10
    n_eval: int = 15
    rnn_size: int = 256
    predictor_rnn_layers: int = 2
    z_dim: int = 10
    g_dim: int = 90
    model: str = "dcgan"        # 'dcgan' | 'vgg' — honored for real here
    data_threads: int = 5
    last_frame_skip: bool = False
    num_digits: int = 2         # moving-mnist only (reference utils.py:35)

    # -- GP hyperparameters (reference models/gp_models.py:12-13, train.py:105-106) --
    num_inducing_points: int = 40
    gp_lr: float = 0.002
    gp_lr_milestones: tuple = (3, 5)
    gp_lr_gamma: float = 0.1

    # -- generation (reference generate_frames.py:27, 137) --
    gp_trigger_flag: bool = False
    trigger_sigma: float = 2.01   # reference: (2 + 0.01·depth) with depth
    #   frozen at 1 (generate_frames.py:230; the loop never increments it)
    trigger_margin: float = 0.0   # subtracted from the trigger threshold:
    #   value > mean + trigger_sigma·std − trigger_margin. 0.0 reproduces
    #   the reference exactly; >0 makes the adaptive path MORE eager to
    #   fork (sensitivity control the reference hardcodes away — a
    #   near-constant variance signal has std≈0, where no σ multiple can
    #   ever fire and only an absolute margin can)
    nsample: int = 100
    full_cov_sampling: bool = False  # reference-exact batch-correlated GP
    #   .rsample() at fork steps (generate_frames.py:170) instead of the
    #   default per-row marginal draw; costs a (g_dim, B, B) Cholesky per
    #   forked frame. Per-row draws are key-only under this knob, so exact
    #   re-rolls need the FULL batch (cli/generate handles this).

    # -- TPU-native knobs (no reference counterpart) --
    dtype: str = "float32"          # compute dtype for conv stacks
    use_pallas: bool = False        # route hot ops through Pallas kernels
    eval_metric: str = "skimage"    # 'skimage' | 'finn' (utils.py:237-301)
    remat: bool = False             # jax.checkpoint the conv sweeps in the
                                    # train step (fits VGG-128 training in HBM)
    mesh_shape: tuple = ()          # e.g. (("data", 4), ("sample", 2))
    jit_backend: str = ""           # override jax backend for tests

    # ------------------------------------------------------------------
    @property
    def seq_len_train(self) -> int:
        return self.n_past + self.n_future

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "DVGConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        cfg = cls(**known)
        # tuples arrive as lists from JSON/msgpack round-trips
        cfg.gp_lr_milestones = tuple(cfg.gp_lr_milestones)
        cfg.mesh_shape = tuple(tuple(x) for x in cfg.mesh_shape)
        return cfg

    def generation_override(self) -> "DVGConfig":
        """The restore-then-override contract of generate_frames.py:47-49."""
        cfg = dataclasses.replace(self)
        cfg.n_eval = 105
        cfg.n_future = 100
        cfg.batch_size = 50
        return cfg

    def replace(self, **kw) -> "DVGConfig":
        return dataclasses.replace(self, **kw)
