"""Shape and skip-wiring contracts for the four conv backbones
(reference models/dcgan_64.py, dcgan_128.py, vgg_64.py, vgg_128.py)."""

import jax
import jax.numpy as jnp
import pytest

from dvg_tpu.models.registry import get_backbone
from dvg_tpu.models import vgg as vgg_mod

G_DIM = 90


@pytest.mark.parametrize("model", ["dcgan", "vgg"])
@pytest.mark.parametrize("width,nc", [(64, 1), (64, 3), (128, 3)])
def test_encoder_decoder_roundtrip(model, width, nc):
    bb = get_backbone(model, width)
    key = jax.random.PRNGKey(0)
    enc_p = bb.encoder_init(key, G_DIM, nc)
    enc_s = bb.encoder_stats_init(G_DIM, nc)
    dec_p = bb.decoder_init(key, G_DIM, nc)
    dec_s = bb.decoder_stats_init(G_DIM, nc)

    x = jax.random.uniform(key, (2, width, width, nc))
    (h, skips), enc_s2 = bb.encoder_apply(enc_p, enc_s, x, train=True)
    assert h.shape == (2, G_DIM)
    assert len(skips) == bb.num_skips
    # skip resolutions: dcgan skips start at width/2; vgg at full width
    top = width // 2 if model == "dcgan" else width
    for i, s in enumerate(skips):
        assert s.shape[1] == s.shape[2] == top // (2 ** i), (i, s.shape)

    y, dec_s2 = bb.decoder_apply(dec_p, dec_s, h, skips, train=True)
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))
    # stats trees must keep their structure (scan-carry compatible)
    assert jax.tree_util.tree_structure(enc_s) == jax.tree_util.tree_structure(enc_s2)
    assert jax.tree_util.tree_structure(dec_s) == jax.tree_util.tree_structure(dec_s2)


def test_output_ranges():
    """dcgan-64 decoder ends in tanh (dcgan_64.py:76); vgg in sigmoid."""
    key = jax.random.PRNGKey(1)
    for model, lo in [("dcgan", -1.0), ("vgg", 0.0)]:
        bb = get_backbone(model, 64)
        enc_p = bb.encoder_init(key, G_DIM, 1)
        enc_s = bb.encoder_stats_init(G_DIM, 1)
        dec_p = bb.decoder_init(key, G_DIM, 1)
        dec_s = bb.decoder_stats_init(G_DIM, 1)
        x = jax.random.uniform(key, (2, 64, 64, 1))
        (h, skips), _ = bb.encoder_apply(enc_p, enc_s, x, train=True)
        y, _ = bb.decoder_apply(dec_p, dec_s, h, skips, train=True)
        assert float(y.min()) >= lo and float(y.max()) <= 1.0


def test_eval_mode_uses_running_stats():
    bb = get_backbone("dcgan", 64)
    key = jax.random.PRNGKey(2)
    enc_p = bb.encoder_init(key, G_DIM, 1)
    enc_s = bb.encoder_stats_init(G_DIM, 1)
    x = jax.random.uniform(key, (4, 64, 64, 1))
    (_, _), s_train = bb.encoder_apply(enc_p, enc_s, x, train=True)
    (_, _), s_eval = bb.encoder_apply(enc_p, enc_s, x, train=False)
    # eval mode must not touch stats; train mode must
    assert jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), enc_s, s_eval))
    changed = jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), enc_s, s_train)
    assert not all(jax.tree_util.tree_leaves(changed))


def test_gaussian_encoder():
    key = jax.random.PRNGKey(3)
    p = vgg_mod.gaussian_encoder_init(key, G_DIM, 10, nc=1)
    s = vgg_mod.gaussian_encoder_stats_init(G_DIM, nc=1)
    x = jax.random.uniform(key, (2, 64, 64, 1))
    (z, mu, logvar, skips), _ = vgg_mod.gaussian_encoder_apply(
        p, s, x, train=True, rng=key)
    assert z.shape == mu.shape == logvar.shape == (2, 10)
    assert len(skips) == 4


@pytest.mark.parametrize("model,width", [("dcgan", 64), ("vgg", 64),
                                         ("dcgan", 128)])
def test_hoisted_decode_matches_fused(model, width):
    """decoder_apply_hoisted(decoder_skip_pre(...)) must reproduce the fused
    eval decode on BN-folded params — including when the latent batch is a
    merged sample·batch multiple of the skip batch (the rollout's broadcast
    contract, models/layers.py:broadcast_add)."""
    import numpy as np
    bb = get_backbone(model, width)
    key = jax.random.PRNGKey(0)
    dim, nc, b, s_n = 12, 3, 2, 3
    enc_p = bb.encoder_init(key, dim, nc)
    enc_s = bb.encoder_stats_init(dim, nc)
    dec_p = bb.decoder_init(jax.random.PRNGKey(1), dim, nc)
    dec_s = bb.decoder_stats_init(dim, nc)
    enc_s = jax.tree.map(lambda a: a + 0.3, enc_s)
    dec_s = jax.tree.map(lambda a: a + 0.3, dec_s)
    x = jax.random.uniform(jax.random.PRNGKey(2), (b, width, width, nc))

    (h, skips), _ = bb.encoder_apply(enc_p, enc_s, x, train=False)
    dec_f = bb.decoder_fold(dec_p, dec_s)

    # unfolded params must be rejected (the hoist is eval/folded-only)
    with pytest.raises(ValueError, match="BN-folded"):
        bb.decoder_apply_hoisted(dec_p, h, bb.decoder_skip_pre(dec_f, skips))

    y_ref, _ = bb.decoder_apply(dec_f, dec_s, h, skips, train=False)
    pre = bb.decoder_skip_pre(dec_f, skips)
    y_h = bb.decoder_apply_hoisted(dec_f, h, pre)
    np.testing.assert_allclose(np.asarray(y_h), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    # merged sample·batch axis: latent at (S·B), skips frozen at (B)
    h_m = jnp.tile(h, (s_n, 1))
    sk_m = [jnp.tile(s, (s_n, 1, 1, 1)) for s in skips]
    y_ref_m, _ = bb.decoder_apply(dec_f, dec_s, h_m, sk_m, train=False)
    y_h_m = bb.decoder_apply_hoisted(dec_f, h_m, pre)
    np.testing.assert_allclose(np.asarray(y_h_m), np.asarray(y_ref_m),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("model,width", [("dcgan", 64), ("vgg", 64),
                                         ("dcgan", 128)])
def test_bn_folding_matches_eval_forward(model, width):
    """fold_conv_bn'd params must reproduce the unfolded eval-mode forward
    (conv→BN composition) through the full encoder/decoder stack."""
    import numpy as np
    bb = get_backbone(model, width)
    key = jax.random.PRNGKey(0)
    dim, nc = 12, 3
    enc_p = bb.encoder_init(key, dim, nc)
    enc_s = bb.encoder_stats_init(dim, nc)
    dec_p = bb.decoder_init(jax.random.PRNGKey(1), dim, nc)
    dec_s = bb.decoder_stats_init(dim, nc)
    # non-trivial running stats so the fold actually has work to do
    enc_s = jax.tree.map(lambda a: a + 0.3, enc_s)
    dec_s = jax.tree.map(lambda a: a + 0.3, dec_s)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, width, width, nc))

    (h, skips), _ = bb.encoder_apply(enc_p, enc_s, x, train=False)
    y, _ = bb.decoder_apply(dec_p, dec_s, h, skips, train=False)

    enc_f = bb.encoder_fold(enc_p, enc_s)
    dec_f = bb.decoder_fold(dec_p, dec_s)
    (h_f, skips_f), _ = bb.encoder_apply(enc_f, enc_s, x, train=False)
    y_f, _ = bb.decoder_apply(dec_f, dec_s, h_f, skips_f, train=False)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
