"""Parity against the VERBATIM reference source (/root/reference).

Unlike tests/test_full_model_parity.py (which uses the bridge's lookalike
torch classes, needed for checkpoint unpickling), these tests import the
reference's own model files — models/dcgan_64.py, models/vgg_64.py,
models/lstm.py — off /root/reference, transplant DVG-TPU weights into them,
and assert:

  * forward/loss parity of the joint training pass for BOTH the dcgan and
    vgg compositions (reference train.py:200-239 loop semantics);
  * **one-full-train-step UPDATE parity**: starting from identical weights
    and fresh optimizers, the reference's per-batch sequence
    train_model → train_frame_predictor → train_GP_Frame_predictor
    (train.py:358-361, with the exact zero_grad placements at train.py:147,
    176, 201-203 and torch Adam ×4, train.py:95-106) produces the same
    post-step parameters — encoder, decoder, LSTM, AND the GP group — as one
    step of dvg_tpu.train.step.make_train_step_fn. Run in float64 on both
    sides so Adam's g/|g| normalization doesn't amplify float noise.

The only code the reference can't run on CPU is models/lstm.py's hardcoded
`.cuda()` in init_hidden (lstm.py:24-25, 61-62); torch.Tensor.cuda is patched
to identity for the duration of the module.

gpytorch is not installed, so the torch side's GP uses a direct torch
translation of dvg_tpu/models/gp.py's whitened-SVGP math (same
parameterization gpytorch uses; gp.py is validated against closed-form GPs
in tests/test_gp.py). It is fully differentiable, so the GP group's Adam
updates — and the GP terms' gradient contributions to the ENCODER (reference
train.py:225-226, 232 flow into `h`) — are covered too.

Note on single-step cleanliness: from FRESH optimizer state one full batch
has no cross-pass gradient leak — train_model starts with all grads None,
train_frame_predictor zeroes the frame_predictor (train.py:176), and
train_GP_Frame_predictor zeroes the GP optimizer (train.py:147). The known
leak (train_model never zeroing the GP optimizer) only contaminates the
SECOND batch onward, which dvg_tpu documents as a deliberate deviation
(train/step.py module docstring).
"""

import math
import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="verbatim reference source not on disk at /root/reference")

from dvg_tpu.config import DVGConfig
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.train import import_torch as IT
from dvg_tpu.train import step as S
from dvg_tpu.train.optim import make_optimizers, split_params

REFERENCE = "/root/reference"

CFG = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                batch_size=2, n_past=2, n_future=2, n_eval=6,
                g_dim=16, rnn_size=32, num_inducing_points=8)


@pytest.fixture(scope="module")
def ref():
    """Import the verbatim reference model modules off /root/reference
    (shared recipe: conftest.reference_modules)."""
    from conftest import reference_modules
    with reference_modules() as mods:
        yield mods


def _jax_model(cfg=CFG):
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(3))
    return model, params, stats


def _clip(cfg=CFG, seed=11):
    t = cfg.seq_len_train
    x = jax.random.uniform(
        jax.random.PRNGKey(seed),
        (t, cfg.batch_size, cfg.image_width, cfg.image_width, cfg.channels))
    return np.asarray(x)


def _to_torch(frame_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        frame_nhwc.transpose(0, 3, 1, 2)))


def _verbatim_modules(ref, cfg, params, stats, backbone="dcgan"):
    mod = ref.dcgan if backbone == "dcgan" else ref.vgg
    enc = mod.encoder(cfg.g_dim, cfg.channels)
    dec = mod.decoder(cfg.g_dim, cfg.channels)
    fp = ref.lstm.lstm(cfg.g_dim, cfg.g_dim, cfg.rnn_size,
                       cfg.predictor_rnn_layers, cfg.batch_size)
    if backbone == "dcgan":
        IT.dcgan_encoder_j2t(params["encoder"], stats["encoder"], enc)
        IT.dcgan_decoder_j2t(params["decoder"], stats["decoder"], dec)
    else:
        IT.vgg_encoder_j2t(params["encoder"], stats["encoder"], enc)
        IT.vgg_decoder_j2t(params["decoder"], stats["decoder"], dec)
    IT.lstm_j2t(params["frame_predictor"], fp)
    return enc, dec, fp


# ===========================================================================
# torch translation of dvg_tpu/models/gp.py (whitened SVGP; differentiable)
# ===========================================================================

def _t_gp_params(params):
    """Torch leaf tensors (requires_grad) mirroring the JAX GP pytrees."""
    mk = lambda a: torch.tensor(np.asarray(a, np.float64),
                                requires_grad=True)
    gp = {k: mk(v) for k, v in params["gp"].items()}
    lik = {"raw_noise": mk(params["likelihood"]["raw_noise"])}
    return gp, lik


def _t_sp(x):
    return torch.nn.functional.softplus(x)


def _t_cross(gp, x1, x2):
    ls = _t_sp(gp["raw_lengthscale"])[:, None, None]
    os_ = _t_sp(gp["raw_outputscale"])[:, None, None]
    diff = x1[..., :, 0][..., :, None] - x2[..., :, 0][..., None, :]
    return os_ * torch.exp(-0.5 * (diff / ls) ** 2)


def _t_posterior(gp, x):
    """gp.py posterior(): mean/var of q(f(X)). x: (D,B,1) → (D,B) each."""
    z = gp["z"]
    m = z.shape[1]
    kzz = _t_cross(gp, z, z) + 1e-4 * torch.eye(m, dtype=z.dtype)
    l_k = torch.linalg.cholesky(kzz)
    kxz = _t_cross(gp, x, z)
    at_ = torch.linalg.solve_triangular(l_k, kxz.transpose(1, 2),
                                        upper=False)
    a = at_.transpose(1, 2)
    mean = gp["mean_const"][:, None] + torch.einsum(
        "dbm,dm->db", a, gp["var_mean"])
    l_s = torch.tril(gp["var_chol"])
    a_ls = torch.einsum("dbm,dmn->dbn", a, l_s)
    k_diag = _t_sp(gp["raw_outputscale"])[:, None].expand(-1, x.shape[1])
    var = k_diag - (a * a).sum(-1) + (a_ls * a_ls).sum(-1)
    return mean, torch.clamp(var, min=1e-10)


def _t_kl(gp):
    m_ = gp["var_mean"]
    l_s = torch.tril(gp["var_chol"])
    mi = m_.shape[-1]
    diag = torch.diagonal(l_s, dim1=-2, dim2=-1)
    tr_s = (l_s * l_s).sum(dim=(-2, -1))
    logdet = 2.0 * torch.log(diag.abs() + 1e-20).sum(-1)
    return 0.5 * (tr_s + (m_ * m_).sum(-1) - mi - logdet)


def _t_elbo(gp, lik, x, y, num_data):
    """gp.py elbo(): per-task (D,) ELBO, gpytorch VariationalELBO scaling."""
    mean, var = _t_posterior(gp, x)
    noise = (_t_sp(lik["raw_noise"]) + 1e-4)[:, None]
    ll = -0.5 * (math.log(2.0 * math.pi) + torch.log(noise)
                 + ((y - mean) ** 2 + var) / noise)
    return ll.mean(-1) - _t_kl(gp) / num_data


def _gp_in(h, g_dim, b):
    """reference train.py:225: h.transpose(0,1).view(90, B, 1)."""
    return h.transpose(0, 1).reshape(g_dim, b, 1)


# ===========================================================================
# forward/loss parity (verbatim source), dcgan AND vgg
# ===========================================================================

@pytest.mark.parametrize("backbone", ["dcgan", "vgg"])
def test_verbatim_joint_pass_parity(ref, backbone):
    """The reference train_model loop (train.py:200-239) on the VERBATIM
    modules vs one joint_loss evaluation: latents, LSTM predictions, the
    four pixel/latent loss terms, and the BN running-stat folding."""
    cfg = CFG.replace(model=backbone,
                      n_future=1 if backbone == "vgg" else CFG.n_future)
    model, params, stats = _jax_model(cfg)
    enc, dec, fp = _verbatim_modules(ref, cfg, params, stats, backbone)
    enc.train(), dec.train(), fp.train()
    x = _clip(cfg)
    t = x.shape[0]
    n_past = cfg.n_past

    loss_j, aux = S.joint_loss(params, stats, jnp.asarray(x), model, cfg)
    met = {k: float(v) for k, v in aux["metrics"].items()}
    h_all, _, _ = S.encode_frames(model, params, stats, jnp.asarray(x))
    h_pred_j = np.asarray(
        S.lstm_teacher_forced(params["frame_predictor"], h_all[:-1]))
    gp_mean_j = np.asarray(jax.vmap(
        lambda ht: model.gp_mean(params, ht))(h_all[:-1]))

    mse = mse_latent = ae_mse = mse_gp = 0.0
    crit = torch.nn.MSELoss()
    fp.hidden = fp.init_hidden()
    skip = None
    with torch.no_grad():
        for i in range(1, t):
            h_full = enc(_to_torch(x[i - 1]))
            h_target = enc(_to_torch(x[i]))[0]
            if i < n_past:
                h, skip = h_full
            else:
                h = h_full[0]
            np.testing.assert_allclose(
                h.numpy(), np.asarray(h_all[i - 1]), rtol=1e-4, atol=1e-5)
            h_pred = fp(h)
            np.testing.assert_allclose(
                h_pred.numpy(), h_pred_j[i - 1], rtol=1e-4, atol=1e-5)
            mse_latent += crit(h_pred, h_target)
            x_pred = dec([h_pred, skip])
            x_target_pred = dec([h_target, skip])
            x_pred_gp = dec([torch.from_numpy(gp_mean_j[i - 1]), skip])
            mse += crit(x_pred, _to_torch(x[i]))
            ae_mse += crit(x_target_pred, _to_torch(x[i]))
            mse_gp += crit(x_pred_gp, _to_torch(x[i]))

    np.testing.assert_allclose(float(mse), met["mse"], rtol=3e-4)
    np.testing.assert_allclose(float(ae_mse), met["ae_mse"], rtol=3e-4)
    np.testing.assert_allclose(float(mse_gp), met["mse_gp"], rtol=3e-4)
    np.testing.assert_allclose(float(mse_latent), met["mse_latent"],
                               rtol=3e-4)

    # BN running-stat folding vs torch's sequential in-loop updates
    folded = aux["stats"]
    t2j_enc = (IT.dcgan_encoder_t2j if backbone == "dcgan"
               else IT.vgg_encoder_t2j)
    t2j_dec = (IT.dcgan_decoder_t2j if backbone == "dcgan"
               else IT.vgg_decoder_t2j)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-4, atol=1e-6),
        folded["encoder"], t2j_enc(enc)[1])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-4, atol=1e-6),
        folded["decoder"], t2j_dec(dec)[1])


def test_verbatim_eval_mode_decode_parity(ref):
    """Eval-mode encode→decode (the generation path) vs verbatim modules."""
    model, params, stats = _jax_model()
    enc, dec, _ = _verbatim_modules(ref, CFG, params, stats, "dcgan")
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


# ===========================================================================
# ONE-TRAIN-STEP UPDATE PARITY (float64, verbatim modules, torch Adam x4)
# ===========================================================================

def _torch_reference_step(ref, cfg, params, stats, x64):
    """Run the reference's exact per-batch training sequence
    (train.py:358-361) in torch float64. Returns the final modules, GP
    tensors, and the three pass losses."""
    g_dim, b = cfg.g_dim, cfg.batch_size
    t = cfg.seq_len_train
    n_past = cfg.n_past
    crit = torch.nn.MSELoss()

    enc, dec, fp = _verbatim_modules(ref, cfg, params, stats, "dcgan")
    enc.double(), dec.double(), fp.double()
    enc.train(), dec.train(), fp.train()
    gp_t, lik_t = _t_gp_params(params)

    # train.py:95-106 — four Adams at lr=0.002 (betas/eps default), GP group
    # over gp + likelihood params jointly
    opt_fp = torch.optim.Adam(fp.parameters(), lr=cfg.lr)
    opt_enc = torch.optim.Adam(enc.parameters(), lr=cfg.lr)
    opt_dec = torch.optim.Adam(dec.parameters(), lr=cfg.lr)
    opt_gp = torch.optim.Adam(
        [{"params": list(gp_t.values())},
         {"params": [lik_t["raw_noise"]]}], lr=cfg.gp_lr)

    xt = [torch.from_numpy(np.ascontiguousarray(
        x64[i].transpose(0, 3, 1, 2))) for i in range(t)]

    # ---- pass 1: train_model (train.py:200-245) ---------------------------
    enc.zero_grad(), dec.zero_grad(), fp.zero_grad()
    fp.hidden = fp.init_hidden()
    mse = mse_latent = ae_mse = mse_gp = 0
    max_ll = torch.zeros(g_dim, dtype=torch.float64)
    skip = None
    for i in range(1, t):
        h_full = enc(xt[i - 1])
        h_target = enc(xt[i])[0]
        if i < n_past:                                   # train.py:217-220
            h, skip = h_full
        else:
            h = h_full[0]
        h_pred = fp(h)
        mse_latent = mse_latent + crit(h_pred, h_target)
        gp_x = _gp_in(h, g_dim, b)                       # train.py:225
        max_ll = max_ll - _t_elbo(gp_t, lik_t, gp_x,
                                  h_target.transpose(0, 1), num_data=b)
        gp_mean, _ = _t_posterior(gp_t, gp_x)
        x_pred = dec([h_pred, skip])                     # train.py:227-232
        x_target_pred = dec([h_target, skip])
        x_pred_gp = dec([gp_mean.transpose(0, 1), skip])
        mse = mse + crit(x_pred, xt[i])
        ae_mse = ae_mse + crit(x_target_pred, xt[i])
        mse_gp = mse_gp + crit(x_pred_gp, xt[i])
    joint_loss = (1000 * ae_mse + 0.001 * mse + 0.01 * mse_latent
                  + 0.001 * mse_gp + 0.0001 * max_ll.sum())
    joint_loss.backward()
    opt_fp.step(), opt_enc.step(), opt_dec.step(), opt_gp.step()

    # ---- pass 2: train_frame_predictor (train.py:175-198) -----------------
    fp.zero_grad()
    fp.hidden = fp.init_hidden()
    ft_latent = 0
    for i in range(1, t):
        h_full = enc(xt[i - 1])
        h_target = enc(xt[i])[0]
        h = h_full[0]
        h_pred = fp(h)
        ft_latent = ft_latent + crit(h_pred, h_target)
    ft_latent.backward()
    opt_fp.step()

    # ---- pass 3: train_GP_Frame_predictor (train.py:146-172) --------------
    opt_gp.zero_grad()
    fp.hidden = fp.init_hidden()                          # set, never used
    max_ll2 = torch.zeros(g_dim, dtype=torch.float64)
    for i in range(1, t):
        h_full = enc(xt[i - 1])
        h_target = enc(xt[i])[0].detach()                 # train.py:156
        h = h_full[0]     # train.py:161's h.detach() is a no-op (unassigned)
        max_ll2 = max_ll2 - _t_elbo(gp_t, lik_t, _gp_in(h, g_dim, b),
                                    h_target.transpose(0, 1), num_data=b)
    gp_loss = max_ll2.sum()
    gp_loss.backward()
    opt_gp.step()

    return SimpleNamespace(
        enc=enc, dec=dec, fp=fp, gp=gp_t, lik=lik_t,
        joint_loss=float(joint_loss), ft_latent=float(ft_latent),
        gp_loss=float(gp_loss), mse_latent=float(mse_latent))


def _perturb_gp(params, scale=0.2):
    """Move the GP off its pristine init to a generic point.

    At the exact reference init (mean_const = 0, var_mean = 0, L_S = I) the
    GP posterior mean is identically zero, so the x_pred_gp decode feeds an
    all-zero latent into the decoder head: its ConvTranspose output is a
    per-channel constant and the train-mode BatchNorm sees batch variance
    EXACTLY 0. At that measure-zero point torch's BatchNorm backward emits a
    gradient that disagrees with the finite-difference limit of torch's own
    forward (verified: fd→-0.00252943 for eps→1e-8 while torch autograd
    returns -0.00084315; JAX matches the fd limit). Also, with L_S = I the
    q-covariance correction cancels k_diag exactly, so z/lengthscale
    gradients vanish identically. A small generic perturbation avoids the
    degenerate point and makes every GP parameter's update nonzero."""
    k = jax.random.split(jax.random.PRNGKey(7), 5)
    gp = dict(params["gp"])
    gp["mean_const"] = 0.05 * jax.random.normal(k[0], gp["mean_const"].shape)
    gp["var_mean"] = scale * jax.random.normal(k[1], gp["var_mean"].shape)
    gp["var_chol"] = gp["var_chol"] + 0.1 * jnp.tril(
        jax.random.normal(k[2], gp["var_chol"].shape))
    gp["raw_lengthscale"] = gp["raw_lengthscale"] + 0.3 * jax.random.normal(
        k[3], gp["raw_lengthscale"].shape)
    gp["raw_outputscale"] = gp["raw_outputscale"] + 0.3 * jax.random.normal(
        k[4], gp["raw_outputscale"].shape)
    return dict(params, gp=gp)


def test_one_train_step_update_parity(ref):
    """Post-step PARAMETER parity for one full train step from fresh state:
    torch reference loop (Adam x4, exact detach/zero_grad placements) vs one
    make_train_step_fn step — encoder, decoder, LSTM, GP group, and the BN
    running stats, all in float64."""
    model, params, stats = _jax_model()
    params = _perturb_gp(params)
    x64 = _clip().astype(np.float64)

    # reference init_hidden builds raw torch.zeros (lstm.py:24-25); make them
    # float64 to match the doubled modules
    prev_dt = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        res = _torch_reference_step(ref, CFG, params, stats, x64)
    finally:
        torch.set_default_dtype(prev_dt)

    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        f64 = lambda tree: jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a, np.float64)), tree)
        params64, stats64 = f64(params), f64(stats)
        opts = make_optimizers(CFG)
        groups = split_params(params64)
        opt_states = {name: getattr(opts, name).init(groups[name])
                      for name in groups}
        state = S.TrainState(params64, stats64, opt_states,
                             jnp.zeros((), jnp.int32))
        step_fn = S.make_train_step_fn(model, CFG, opts)
        new_state, metrics = step_fn(state, jnp.asarray(x64))
        j_params = jax.tree.map(np.asarray, new_state.params)
        j_stats = jax.tree.map(np.asarray, new_state.stats)
        j_metrics = {k: float(v) for k, v in metrics.items()}
    finally:
        jax.config.update("jax_enable_x64", prev)

    # ---- per-pass loss parity ---------------------------------------------
    np.testing.assert_allclose(j_metrics["loss"], res.joint_loss, rtol=1e-9)
    np.testing.assert_allclose(j_metrics["ft_mse_latent"], res.ft_latent,
                               rtol=1e-9)
    np.testing.assert_allclose(j_metrics["ft_gp_nll"], res.gp_loss,
                               rtol=1e-8)
    # the printed epoch metric (train.py:363: epoch_mse += mse_ctrl +
    # temp_loss, where mse_ctrl = Σmse_latent/T at train.py:248 and
    # temp_loss = Σft_latent/T + Σgp_nll/T at train.py:172,198,252-255) —
    # exactly the combination cli/train.py accumulates per step
    T = CFG.seq_len_train
    np.testing.assert_allclose(
        j_metrics["mse_latent_per_frame"]
        + (j_metrics["ft_mse_latent"] + j_metrics["ft_gp_nll"]) / T,
        (res.mse_latent + res.ft_latent + res.gp_loss) / T, rtol=1e-9)

    # ---- conv/LSTM parameter updates (read back through the f32 bridge).
    # atol 1e-5: ≫ f32 readback rounding (~1e-7) and ≫ Adam's noise
    # amplification at near-eps gradients (g/(|g|+1e-8) turns f64
    # accumulation noise ~1e-11 into ~3e-6 update jitter on params whose
    # gradient is itself ~1e-8), but ≪ one Adam step (2e-3) — a wrong
    # detach/zero_grad/optimizer semantics shifts updates at that scale. ---
    def close(jt, tt, atol=1e-5):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-5, atol=atol), jt, tt)

    enc_p, enc_s = IT.dcgan_encoder_t2j(res.enc)
    dec_p, dec_s = IT.dcgan_decoder_t2j(res.dec)
    close(j_params["encoder"], enc_p)
    close(j_params["decoder"], dec_p)
    close(j_params["frame_predictor"], IT.lstm_t2j(res.fp))

    # ---- GP group updates, float64 end-to-end -----------------------------
    for k in j_params["gp"]:
        np.testing.assert_allclose(
            j_params["gp"][k], res.gp[k].detach().numpy(),
            rtol=1e-7, atol=1e-8, err_msg=f"gp param {k}")
    np.testing.assert_allclose(
        j_params["likelihood"]["raw_noise"],
        res.lik["raw_noise"].detach().numpy(), rtol=1e-7, atol=1e-8)

    # ---- BN running stats after all three passes (passes 2-3 re-encode
    # with pass-1's post-step params, so the accepted ~3e-6 Adam jitter on
    # near-eps-gradient params propagates ~2e-6 into the batch stats) ------
    close(j_stats["encoder"], enc_s, atol=1e-5)
    close(j_stats["decoder"], dec_s, atol=1e-5)

    # sanity: the step actually moved the parameters
    moved = np.abs(np.asarray(j_params["encoder"]["head"]["conv"]["w"])
                   - np.asarray(params["encoder"]["head"]["conv"]["w"],
                                np.float64)).max()
    assert moved > 1e-4


def test_import_checkpoint_from_verbatim_reference_pickle(ref, tmp_path):
    """torch.save a checkpoint through the VERBATIM reference classes (their
    __module__ really is models.dcgan_64 / models.lstm, so the pickle's
    class paths are exactly what reference train.py:380-388 writes) and run
    it through import_checkpoint: the shim-based unpickler + weight
    converters must produce a native model.ckpt whose encoder equals a
    direct transplant-back."""
    model, params, stats = _jax_model()
    enc, dec, fp = _verbatim_modules(ref, CFG, params, stats, "dcgan")
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
    import argparse
    opt = argparse.Namespace(
        dataset="smmnist", channels=1, image_width=64, batch_size=2,
        n_past=2, n_future=2, n_eval=6, g_dim=d, rnn_size=32,
        model="dcgan", last_frame_skip=False, log_dir="x", data_root="y")
    pth = str(tmp_path / "model.pth")
    assert enc.__class__.__module__ == "models.dcgan_64"   # the real deal
    assert fp.__class__.__module__ == "models.lstm"
    torch.save({"encoder": enc, "decoder": dec, "frame_predictor": fp,
                "likelihood": lik_sd, "gp_layer": gp_sd,
                "gp_layer_optimizer": {}, "opt": opt}, pth)

    out = IT.import_checkpoint(pth, str(tmp_path / "imported"))
    from dvg_tpu.train.checkpoint import load_checkpoint
    cfg2, payload = load_checkpoint(out)
    assert (cfg2.g_dim, cfg2.model, cfg2.image_width) == (d, "dcgan", 64)
    enc_p, _ = IT.dcgan_encoder_t2j(enc)
    from flax import serialization
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-7),
        payload["params"]["encoder"], serialization.to_state_dict(enc_p))
    np.testing.assert_allclose(
        payload["params"]["gp"]["z"],
        gp_sd["variational_strategy.inducing_points"].numpy().reshape(
            d, m, 1))
