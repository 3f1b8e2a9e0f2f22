"""Full-model parity vs the reference's composed torch model (CPU).

Builds the reference architecture (/root/reference/models/dcgan_64.py:28-88 +
lstm.py:42-72) in torch, transplants DVG-TPU parameters into it, and checks
end-to-end that:
  * per-frame encoder latents and skip maps match,
  * the teacher-forced LSTM latent predictions match,
  * the decoded frames (pred / target / GP-mean variants) match,
  * the joint-loss pixel/latent terms of /root/reference/train.py:223-239
    (mse, ae_mse, mse_gp, mse_latent) match,
  * the BatchNorm running-stat EMA folding reproduces torch's sequential
    per-call updates in the reference call order.

The GP's own ELBO term can't be cross-checked here (gpytorch not installed);
models/gp.py is validated against closed-form GPs in tests/test_gp.py. GP
predictive means are computed in JAX and fed through BOTH decoders, so the
mse_gp pixel path is still covered.

Also: reference-checkpoint import round-trip (train.py:380-388 schema →
import_torch.import_checkpoint → native model.ckpt).
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dvg_tpu.config import DVGConfig
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.train import import_torch as IT
from dvg_tpu.train import step as S

CFG = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                batch_size=2, n_past=2, n_future=2, n_eval=6,
                g_dim=16, rnn_size=32, num_inducing_points=8)


def _jax_model():
    model = DVGModel(CFG)
    params, stats = model.init(jax.random.PRNGKey(3))
    return model, params, stats


def _torch_modules(params, stats):
    c = IT.torch_classes()
    enc = c["DcganEncoder"](CFG.g_dim, CFG.channels, CFG.image_width)
    dec = c["DcganDecoder"](CFG.g_dim, CFG.channels, CFG.image_width)
    fp = c["RefLSTM"](CFG.g_dim, CFG.g_dim, CFG.rnn_size,
                      CFG.predictor_rnn_layers, CFG.batch_size)
    IT.dcgan_encoder_j2t(params["encoder"], stats["encoder"], enc)
    IT.dcgan_decoder_j2t(params["decoder"], stats["decoder"], dec)
    IT.lstm_j2t(params["frame_predictor"], fp)
    return enc, dec, fp


def _clip():
    t = CFG.seq_len_train
    x = jax.random.uniform(
        jax.random.PRNGKey(11),
        (t, CFG.batch_size, CFG.image_width, CFG.image_width, CFG.channels))
    return np.asarray(x)


def _to_torch(frame_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        frame_nhwc.transpose(0, 3, 1, 2)))


def test_composed_model_matches_reference_architecture():
    model, params, stats = _jax_model()
    enc, dec, fp = _torch_modules(params, stats)
    enc.train(), dec.train(), fp.train()
    x = _clip()
    t, b = x.shape[0], x.shape[1]
    n_past = CFG.n_past

    # ---- JAX side: one joint_loss evaluation -------------------------------
    loss_j, aux = S.joint_loss(params, stats, jnp.asarray(x), model, CFG)
    met = {k: float(v) for k, v in aux["metrics"].items()}
    h_all, skips_j, _ = S.encode_frames(model, params, stats, jnp.asarray(x))
    h_pred_j = np.asarray(
        S.lstm_teacher_forced(params["frame_predictor"], h_all[:-1]))
    gp_mean_j = np.asarray(jax.vmap(
        lambda ht: model.gp_mean(params, ht))(h_all[:-1]))

    # ---- torch side: the reference train_model loop (train.py:200-239) -----
    mse = mse_latent = ae_mse = mse_gp = 0.0
    crit = torch.nn.MSELoss()
    fp.hidden = fp.init_hidden()
    skip = None
    with torch.no_grad():
        for i in range(1, t):
            h_i, skips_t = enc(_to_torch(x[i - 1]))
            h_target = enc(_to_torch(x[i]))[0]
            if i < n_past:
                skip = skips_t
            # encoder latent parity at this frame
            np.testing.assert_allclose(
                h_i.numpy(), np.asarray(h_all[i - 1]), rtol=1e-4, atol=1e-5)
            h_pred = fp(h_i)
            np.testing.assert_allclose(
                h_pred.numpy(), h_pred_j[i - 1], rtol=1e-4, atol=1e-5)
            mse_latent += crit(h_pred, h_target)
            x_pred = dec([h_pred, skip])
            x_target_pred = dec([h_target, skip])
            x_pred_gp = dec([torch.from_numpy(gp_mean_j[i - 1]), skip])
            mse += crit(x_pred, _to_torch(x[i]))
            ae_mse += crit(x_target_pred, _to_torch(x[i]))
            mse_gp += crit(x_pred_gp, _to_torch(x[i]))

    # ---- loss-term parity (train.py:223-239 accumulation) ------------------
    np.testing.assert_allclose(float(mse), met["mse"], rtol=2e-4)
    np.testing.assert_allclose(float(ae_mse), met["ae_mse"], rtol=2e-4)
    np.testing.assert_allclose(float(mse_gp), met["mse_gp"], rtol=2e-4)
    np.testing.assert_allclose(float(mse_latent), met["mse_latent"],
                               rtol=2e-4)
    ref_loss = (1000.0 * float(ae_mse) + 0.001 * float(mse)
                + 0.01 * float(mse_latent) + 0.001 * float(mse_gp)
                + 0.0001 * met["max_ll"])
    np.testing.assert_allclose(ref_loss, float(loss_j), rtol=2e-4)

    # ---- BN running-stat EMA folding matches torch's sequential updates ----
    folded = aux["stats"]
    enc_t, _ = IT.dcgan_encoder_t2j(enc)
    enc_s = IT.dcgan_encoder_t2j(enc)[1]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-4, atol=1e-6),
        folded["encoder"], enc_s)
    dec_s = IT.dcgan_decoder_t2j(dec)[1]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-4, atol=1e-6),
        folded["decoder"], dec_s)


def test_decoded_frame_parity_eval_mode():
    """Eval-mode (running-stat BN) decode parity — the generation path."""
    model, params, stats = _jax_model()
    enc, dec, _ = _torch_modules(params, stats)
    enc.eval(), dec.eval()
    x = _clip()
    with torch.no_grad():
        h_t, skips_t = enc(_to_torch(x[0]))
        y_t = dec([h_t, skips_t]).numpy()
    (h_j, skips_j), _ = model.encode(params, stats, jnp.asarray(x[0]),
                                     train=False)
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    y_j, _ = model.decode(params, stats, h_j, skips_j, train=False)
    np.testing.assert_allclose(
        np.asarray(y_j).transpose(0, 3, 1, 2), y_t, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("last_frame_skip", [False, True])
def test_posterior_rollout_parity(last_frame_skip):
    """The rollout engine's posterior path vs the reference's make_gifs
    posterior loop (generate_frames.py:111-134), incl. the
    --last_frame_skip per-step skip refresh (116-119). The GP predictive
    mean is computed by the native GP cache on both sides (gpytorch is not
    installed), so this pins the encoder/LSTM/decoder closed-loop wiring
    and the skip semantics."""
    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.models import gp as G

    cfg = CFG.replace(last_frame_skip=last_frame_skip)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(3))
    cache = model.gp_cache(params)
    enc, dec, fp = _torch_modules(params, stats)
    enc.eval(), dec.eval(), fp.eval()
    fns = make_rollout_fns(model, cfg, nsample=2)
    t = cfg.n_eval
    x = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(17),
        (t, cfg.batch_size, cfg.image_width, cfg.image_width, cfg.channels)))

    out_j = np.asarray(fns.posterior(params, stats, cache, jnp.asarray(x)))

    # ---- torch reference loop ----------------------------------------------
    fp.hidden = fp.init_hidden()
    gen = [x[0]]
    x_in, skip = x[0], None
    with torch.no_grad():
        for i in range(1, t):
            h, skips = enc(_to_torch(x_in))
            if last_frame_skip or i < cfg.n_past:
                skip = skips
            if i < cfg.n_past:
                fp(h)
                x_in = x[i]
            else:
                h_pred = fp(h)
                mean, _ = G.cached_mean_var(
                    cache, model.to_gp_layout(jnp.asarray(h_pred.numpy())))
                x_in = dec([torch.from_numpy(
                    np.asarray(model.from_gp_layout(mean))), skip])
                x_in = x_in.numpy().transpose(0, 2, 3, 1)
            gen.append(np.asarray(x_in))
    np.testing.assert_allclose(out_j, np.stack(gen), rtol=1e-3, atol=1e-4)


def test_reference_checkpoint_import_roundtrip(tmp_path):
    """Synthesize a model.pth with the reference's exact schema (whole
    pickled modules under models.* paths + gpytorch-style state_dicts +
    opt namespace), import it, and check the converted pytrees."""
    model, params, stats = _jax_model()
    enc, dec, fp = _torch_modules(params, stats)
    d, m = CFG.g_dim, CFG.num_inducing_points
    g = torch.Generator().manual_seed(0)
    gp_sd = {
        "variational_strategy.inducing_points": torch.rand(d, m, 1,
                                                           generator=g),
        "variational_strategy.variational_distribution.variational_mean":
            torch.randn(d, m, generator=g) * 0.1,
        "variational_strategy.variational_distribution."
        "chol_variational_covar":
            torch.eye(m).expand(d, m, m).contiguous(),
        "mean_module.constant": torch.zeros(d, 1),
        "covar_module.raw_outputscale": torch.zeros(d),
        "covar_module.base_kernel.raw_lengthscale": torch.zeros(d, 1, 1),
    }
    lik_sd = {"noise_covar.raw_noise": torch.zeros(d, 1)}
    opt = argparse.Namespace(
        dataset="smmnist", channels=1, image_width=64, batch_size=2,
        n_past=2, n_future=2, n_eval=6, g_dim=d, rnn_size=32,
        model="dcgan", last_frame_skip=False, log_dir="x", data_root="y")
    pth = str(tmp_path / "model.pth")
    IT.save_reference_style_checkpoint(pth, enc, dec, fp, gp_sd, lik_sd, opt)

    out = IT.import_checkpoint(pth, str(tmp_path / "imported"))
    from dvg_tpu.train.checkpoint import load_checkpoint
    cfg2, payload = load_checkpoint(out)
    assert (cfg2.g_dim, cfg2.num_inducing_points, cfg2.model,
            cfg2.image_width) == (d, m, "dcgan", 64)

    # converted conv/LSTM params equal a direct transplant back
    from flax import serialization
    enc_p, enc_s = IT.dcgan_encoder_t2j(enc)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
        jax.tree.map(np.asarray, payload["params"]["encoder"]),
        jax.tree.map(np.asarray, serialization.to_state_dict(enc_p)))
    np.testing.assert_allclose(
        payload["params"]["gp"]["z"],
        gp_sd["variational_strategy.inducing_points"].numpy().reshape(d, m, 1))
    np.testing.assert_allclose(payload["params"]["likelihood"]["raw_noise"],
                               np.zeros(d))

    # the imported checkpoint drives a rollout end-to-end
    from dvg_tpu.generate.rollout import make_rollout_fns
    from dvg_tpu.train.step import init_train_state
    model2 = DVGModel(cfg2)
    _, state2, _ = init_train_state(cfg2, jax.random.PRNGKey(0))
    cfg2b, state2 = load_checkpoint(out, state2)
    cache = model2.gp_cache(state2.params)
    fns = make_rollout_fns(model2, cfg2, nsample=2)
    xg = jax.random.uniform(jax.random.PRNGKey(5),
                            (cfg2.n_eval, 2, 64, 64, 1))
    post = fns.posterior(state2.params, state2.stats, cache, xg)
    assert np.isfinite(np.asarray(post)).all()
