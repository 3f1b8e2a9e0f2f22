"""Optimizers: 4 Adam groups + the GP MultiStepLR schedule.

Reference wiring (/root/reference/train.py:95-106):
  * three Adam(lr=0.002) groups with DEFAULT betas (0.9, 0.999) for
    frame_predictor, encoder, decoder (train.py:95-97). NB the reference
    CLI's --lr/--beta1 flags are DEAD there (never passed to any
    optimizer); here they are honored for real like the other dead flags
    (--model, --image_width — PARITY.md), and the defaults
    (lr=0.002, beta1=0.9) reproduce the reference's hardcoded values;
  * one Adam(lr=0.002) over gp_layer + likelihood params with
    MultiStepLR(milestones=[3, 5], gamma=0.1) (train.py:105-106), where the
    scheduler is stepped at the START of each epoch (train.py:347) — torch
    semantics make the decay effective DURING epochs 2 and 4 (0-based):
    after the step at epoch e the scheduler's internal counter is e+1, and
    MultiStepLR applies gamma^bisect_right(milestones, e+1). We reproduce
    that exactly (`gp_lr_schedule`).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Dict, NamedTuple

import jax.numpy as jnp
import optax

from dvg_tpu.config import DVGConfig

MODULE_GROUPS = ("frame_predictor", "encoder", "decoder", "gp_group")


def gp_lr_schedule(cfg: DVGConfig):
    """Step-indexed schedule reproducing torch MultiStepLR stepped before
    each epoch (reference train.py:347). Returns lr as a jnp scalar."""
    milestones = tuple(cfg.gp_lr_milestones)
    gamma = cfg.gp_lr_gamma
    base = cfg.gp_lr

    # decay factor as a function of the epoch the step falls in
    def schedule(step):
        epoch = step // cfg.epoch_size
        factor = jnp.ones((), jnp.float32)
        for m in milestones:
            # effective during epoch e iff e + 1 >= m
            factor = jnp.where(epoch + 1 >= m, factor * gamma, factor)
        return base * factor

    # static helper for logging
    schedule.at_epoch = lambda e: base * (
        gamma ** bisect_right(list(milestones), e + 1))
    return schedule


class Optimizers(NamedTuple):
    frame_predictor: optax.GradientTransformation
    encoder: optax.GradientTransformation
    decoder: optax.GradientTransformation
    gp_group: optax.GradientTransformation  # gp + likelihood jointly


def make_optimizers(cfg: DVGConfig) -> Optimizers:
    adam = lambda lr: optax.adam(lr, b1=cfg.beta1, b2=0.999, eps=1e-8)
    # The GP optimizer updates twice per batch when the finetune pass is on
    # (joint step train.py:245 + finetune step train.py:170), so its internal
    # update count runs at 2x the batch counter; rescale to epochs.
    updates_per_batch = 2 if cfg.ft else 1
    sched = gp_lr_schedule(cfg)
    gp_opt = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_schedule(
            lambda count: -sched(count // updates_per_batch)),
    )
    return Optimizers(
        frame_predictor=adam(cfg.lr),
        encoder=adam(cfg.lr),
        decoder=adam(cfg.lr),
        gp_group=gp_opt,
    )


def split_params(params: Dict) -> Dict[str, Dict]:
    """Partition the model param tree into the 4 optimizer groups."""
    return {
        "frame_predictor": params["frame_predictor"],
        "encoder": params["encoder"],
        "decoder": params["decoder"],
        "gp_group": {"gp": params["gp"], "likelihood": params["likelihood"]},
    }


def merge_params(groups: Dict[str, Dict]) -> Dict:
    return {
        "frame_predictor": groups["frame_predictor"],
        "encoder": groups["encoder"],
        "decoder": groups["decoder"],
        "gp": groups["gp_group"]["gp"],
        "likelihood": groups["gp_group"]["likelihood"],
    }
