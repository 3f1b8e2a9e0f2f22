"""Backbone registry: (model, image_width) → encoder/decoder functions.

The reference declares --model dcgan|vgg and --image_width 64|128 but ignores
both (train.py:75 hardcodes models.dcgan_64). This registry honors them for
real, selecting among the four backbone variants (SURVEY.md §5.6).
"""

from __future__ import annotations

from typing import NamedTuple

from dvg_tpu.models import dcgan, vgg


class Backbone(NamedTuple):
    encoder_init: callable
    encoder_stats_init: callable
    encoder_apply: callable
    decoder_init: callable
    decoder_stats_init: callable
    decoder_apply: callable
    num_skips: int
    encoder_fold: callable = None     # eval-BN → conv weight folding
    decoder_fold: callable = None
    decoder_apply_grouped: callable = None   # shared-skip variant decode
    #   (train-step joint pass; see dcgan.decoder_apply_grouped)
    decoder_skip_pre: callable = None        # frozen-skip conv halves,
    #   hoisted out of the generation scan (dcgan.decoder_skip_pre)
    decoder_apply_hoisted: callable = None   # eval decode consuming them


def get_backbone(model: str = "dcgan", image_width: int = 64) -> Backbone:
    if image_width not in (64, 128):
        raise ValueError(f"image_width must be 64 or 128, got {image_width}")
    num_skips = 4 if image_width == 64 else 5
    if model == "dcgan":
        mod = dcgan
    elif model == "vgg":
        mod = vgg
    else:
        raise ValueError(f"model must be 'dcgan' or 'vgg', got {model!r}")

    def enc_init(key, dim, nc):
        return mod.encoder_init(key, dim, nc, image_width)

    def enc_stats(dim, nc):
        return mod.encoder_stats_init(dim, nc, image_width)

    def dec_init(key, dim, nc):
        return mod.decoder_init(key, dim, nc, image_width)

    def dec_stats(dim, nc):
        return mod.decoder_stats_init(dim, nc, image_width)

    def dec_apply(params, stats, vec, skips, train, axis_name=None):
        return mod.decoder_apply(params, stats, vec, skips, train,
                                 image_width=image_width,
                                 axis_name=axis_name)

    # every backbone MUST provide the grouped decode — the train step uses
    # it unconditionally (train/step.py joint pass); resolve it EAGERLY so
    # a backbone without one fails at registration with its name, not with
    # an opaque error mid-training-step
    grouped_fn = mod.decoder_apply_grouped
    # same eagerness for the hoisted-decode pair: the rollout hot path uses
    # them unconditionally whenever skips are frozen (generate/rollout.py)
    skip_pre_fn = mod.decoder_skip_pre
    hoisted_fn = mod.decoder_apply_hoisted

    def dec_grouped(params, stats, vecs, skips_unique, group_idx, train,
                    axis_name=None):
        return grouped_fn(params, stats, vecs, skips_unique, group_idx,
                          train, image_width=image_width,
                          axis_name=axis_name)

    return Backbone(
        encoder_init=enc_init,
        encoder_stats_init=enc_stats,
        encoder_apply=mod.encoder_apply,
        decoder_init=dec_init,
        decoder_stats_init=dec_stats,
        decoder_apply=dec_apply,
        num_skips=num_skips,
        encoder_fold=mod.encoder_fold,
        decoder_fold=mod.decoder_fold,
        decoder_apply_grouped=dec_grouped,
        decoder_skip_pre=lambda params, skips: skip_pre_fn(
            params, skips, image_width=image_width),
        decoder_apply_hoisted=lambda params, vec, skip_pre: hoisted_fn(
            params, vec, skip_pre, image_width=image_width),
    )
