"""Vestigial action-classifier components (SURVEY.md §2.22; reference
models/cnn_block_frame.py:3-85, linear_layer.py:9-48): shipped for
capability parity, so pin their contracts — geometry (the reference's
fc1=2304 implies a (15, 64, 64) clip), train/eval dropout behavior, BN
stats updates, and MLP head shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from dvg_tpu.models.classifiers import (cnn_block_frame_apply,
                                        cnn_block_frame_init,
                                        cnn_block_frame_stats_init,
                                        mlp_apply, mlp_init)


def test_cnn_block_frame_shapes_and_modes():
    for ch in (1, 3):          # CNNBlockFrame (gray) / CNNBlockFrame3 (RGB)
        params = cnn_block_frame_init(jax.random.PRNGKey(0), in_channels=ch)
        stats = cnn_block_frame_stats_init()
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 15, 64, 64, ch))
        logits, new_stats = cnn_block_frame_apply(params, stats, x,
                                                  train=False)
        assert logits.shape == (2, 6)
        assert np.isfinite(np.asarray(logits)).all()
        # eval mode: deterministic, stats untouched
        logits2, _ = cnn_block_frame_apply(params, stats, x, train=False)
        np.testing.assert_array_equal(np.asarray(logits),
                                      np.asarray(logits2))
        np.testing.assert_array_equal(
            np.asarray(new_stats["bn1"]["mean"]),
            np.asarray(stats["bn1"]["mean"]))

        # train mode: BN stats move; dropout varies with the rng
        lt1, ts = cnn_block_frame_apply(params, stats, x, train=True,
                                        rng=jax.random.PRNGKey(2))
        lt2, _ = cnn_block_frame_apply(params, stats, x, train=True,
                                       rng=jax.random.PRNGKey(3))
        assert not np.array_equal(np.asarray(ts["bn1"]["mean"]),
                                  np.asarray(stats["bn1"]["mean"]))
        assert not np.array_equal(np.asarray(lt1), np.asarray(lt2))


def test_cnn_block_frame_gradients_flow():
    params = cnn_block_frame_init(jax.random.PRNGKey(0))
    stats = cnn_block_frame_stats_init()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 15, 64, 64, 1))
    y = jnp.asarray([0, 3])

    def loss(p):
        logits, _ = cnn_block_frame_apply(p, stats, x, train=False)
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(2), y])

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(norms) > 0


def test_mlp_variants():
    # MLP: 90 -> 50 -> 6 (latent classifier); MLP2: 10 -> 6 -> 6
    for in_dim, hidden in ((90, 50), (10, 6)):
        p = mlp_init(jax.random.PRNGKey(0), in_dim=in_dim, hidden=hidden)
        out = mlp_apply(p, jnp.ones((4, in_dim)))
        assert out.shape == (4, 6)
        assert np.isfinite(np.asarray(out)).all()
