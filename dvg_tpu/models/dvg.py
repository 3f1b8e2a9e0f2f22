"""The assembled DVG model: conv encoder/decoder + latent LSTM + batched SVGP.

Mirrors the model wiring of /root/reference/train.py:75-112:
  encoder/decoder  — backbone selected by (model, image_width); g_dim=90 latent
  frame_predictor  — lstm(g_dim, g_dim, rnn_size=256, layers=2)
  gp / likelihood  — 90-task SVGP with 40 inducing points + Gaussian noise

`DVGModel` is a static (hashable, config-only) wrapper; all parameters and
BatchNorm statistics live in explicit pytrees so every rollout/step is a pure
function — jit/vmap/scan/pjit compose freely around it.

Pytree layout (checkpoint schema):
  params = {encoder, decoder, frame_predictor, gp, likelihood}
  stats  = {encoder, decoder}          # BatchNorm running stats
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dvg_tpu.config import DVGConfig
from dvg_tpu.models import gp as gp_mod
from dvg_tpu.models import rnn as rnn_mod
from dvg_tpu.models.registry import get_backbone


class DVGModel:
    """Static model definition bound to a config. Stateless: all state is in
    the (params, stats) pytrees returned by `init`."""

    def __init__(self, cfg: DVGConfig):
        self.cfg = cfg
        self.backbone = get_backbone(cfg.model, cfg.image_width)

    # -- init ---------------------------------------------------------------
    def init(self, key) -> Tuple[Dict, Dict]:
        cfg = self.cfg
        k_enc, k_dec, k_lstm, k_gp = jax.random.split(key, 4)
        params = {
            "encoder": self.backbone.encoder_init(k_enc, cfg.g_dim, cfg.channels),
            "decoder": self.backbone.decoder_init(k_dec, cfg.g_dim, cfg.channels),
            "frame_predictor": rnn_mod.lstm_init(
                k_lstm, cfg.g_dim, cfg.g_dim, cfg.rnn_size,
                cfg.predictor_rnn_layers),
            "gp": gp_mod.gp_init(k_gp, cfg.g_dim, cfg.num_inducing_points),
            "likelihood": gp_mod.likelihood_init(cfg.g_dim),
        }
        stats = {
            "encoder": self.backbone.encoder_stats_init(cfg.g_dim, cfg.channels),
            "decoder": self.backbone.decoder_stats_init(cfg.g_dim, cfg.channels),
        }
        return params, stats

    # -- pieces (all pure) ----------------------------------------------------
    def encode(self, params, stats, x, train: bool, axis_name=None):
        """x: (B,H,W,C) → ((h (B,g_dim), skips), new encoder stats).
        `axis_name` (shard_map DP): global-batch BN statistics."""
        return self.backbone.encoder_apply(params["encoder"], stats["encoder"],
                                           x, train, axis_name=axis_name)

    def decode(self, params, stats, h, skips, train: bool, axis_name=None):
        """(h (B,g_dim), skips) → (x (B,H,W,C), new decoder stats)."""
        return self.backbone.decoder_apply(params["decoder"], stats["decoder"],
                                           h, skips, train,
                                           axis_name=axis_name)

    def decode_skip_pre(self, params, skips):
        """Hoist the frozen-skip half of every decoder stage conv: computed
        ONCE per rollout instead of at every scan step (the skips are
        frozen at the last context frame in every non---last_frame_skip
        generation path, reference generate_frames.py:116-127). Requires
        BN-folded params; pair with decode_hoisted."""
        return self.backbone.decoder_skip_pre(params["decoder"], skips)

    def decode_hoisted(self, params, h, skip_pre):
        """Eval-mode decode against decode_skip_pre's precomputed halves —
        ~half the decoder FLOPs of the scanned generation hot loop
        (PERF.md r5). Returns frames only."""
        return self.backbone.decoder_apply_hoisted(params["decoder"], h,
                                                   skip_pre)

    def lstm_hidden_init(self, batch_size: int, dtype=jnp.float32):
        return rnn_mod.lstm_hidden_init(batch_size, self.cfg.rnn_size,
                                        self.cfg.predictor_rnn_layers, dtype)

    def predict_latent(self, params, hidden, h):
        """One LSTM step: latent h_t → h_{t+1} prediction."""
        return rnn_mod.lstm_apply(params["frame_predictor"], hidden, h)

    # -- GP over latents. Latent (B, g_dim) ⇄ GP task layout (g_dim, B, 1) ----
    @staticmethod
    def to_gp_layout(h):
        return jnp.swapaxes(h, 0, 1)[..., None]

    @staticmethod
    def from_gp_layout(y):
        return jnp.swapaxes(y, 0, 1)

    def gp_posterior(self, params, h):
        """h: (B, g_dim) → GPPosterior over the next latent (task layout)."""
        return gp_mod.posterior(params["gp"], self.to_gp_layout(h))

    def gp_elbo(self, params, h, h_target, num_data: int):
        """Per-task ELBO, (g_dim,). h/h_target: (B, g_dim)."""
        return gp_mod.elbo(params["gp"], params["likelihood"],
                           self.to_gp_layout(h),
                           jnp.swapaxes(h_target, 0, 1), num_data)

    def gp_mean(self, params, h):
        """Posterior predictive mean of the next latent, (B, g_dim)."""
        post = self.gp_posterior(params, h)
        return self.from_gp_layout(post.mean)

    def gp_rsample(self, params, h, key, full_cov: bool = False):
        y = gp_mod.rsample(params["gp"], params["likelihood"],
                           self.to_gp_layout(h), key, full_cov=full_cov)
        return self.from_gp_layout(y)

    def gp_variance(self, params, h):
        """Predictive variance incl. noise, (B, g_dim) — the trigger signal."""
        v = gp_mod.predictive_variance(params["gp"], params["likelihood"],
                                       self.to_gp_layout(h))
        return self.from_gp_layout(v)

    def gp_cache(self, params) -> gp_mod.GPCache:
        return gp_mod.build_cache(params["gp"], params["likelihood"])

    def fold_inference_params(self, params, stats):
        """Inference params with every eval-mode BatchNorm folded into its
        conv (layers.fold_conv_bn) — numerically the conv→BN composition,
        minus one elementwise pass over every activation map per block.
        Only valid for train=False applies; the returned pytree has no
        'bn' entries for encoder/decoder blocks."""
        return dict(
            params,
            encoder=self.backbone.encoder_fold(params["encoder"],
                                               stats["encoder"]),
            decoder=self.backbone.decoder_fold(params["decoder"],
                                               stats["decoder"]),
        )
