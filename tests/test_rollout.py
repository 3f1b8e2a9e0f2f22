"""Generation-engine tests: shapes, fork schedules, the metrics/select
consistency invariants, and the GP-trigger path (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvg_tpu.config import DVGConfig
from dvg_tpu.generate.rollout import best_of_n, make_rollout_fns
from dvg_tpu.models.dvg import DVGModel
from dvg_tpu.ops import ssim as ssim_ops


@pytest.fixture(scope="module")
def setup():
    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=3, n_past=2, n_future=3, n_eval=5,
                    g_dim=8, rnn_size=16, num_inducing_points=4, nsample=4)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    cache = model.gp_cache(params)
    fns = make_rollout_fns(model, cfg, nsample=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 3, 64, 64, 1))
    return cfg, model, params, stats, cache, fns, x


def test_posterior_shape_and_context(setup):
    cfg, model, params, stats, cache, fns, x = setup
    out = fns.posterior(params, stats, cache, x)
    assert out.shape == x.shape
    np.testing.assert_array_equal(np.asarray(out[:cfg.n_past]),
                                  np.asarray(x[:cfg.n_past]))


def test_diverse_shapes_and_determinism(setup):
    cfg, model, params, stats, cache, fns, x = setup
    key = jax.random.PRNGKey(7)
    gen1 = fns.diverse(params, stats, cache, x, key)
    gen2 = fns.diverse(params, stats, cache, x, key)
    assert gen1.shape == (4, 5, 3, 64, 64, 1)
    np.testing.assert_array_equal(np.asarray(gen1), np.asarray(gen2))
    # n_eval=5 → free steps 2..4 contain NO i%15==0 fork → the rollout is
    # key-independent, matching the reference's deterministic non-fork path
    gen3 = fns.diverse(params, stats, cache, x, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(gen1), np.asarray(gen3))


def test_metrics_match_frames(setup):
    """diverse_metrics (in-scan SSIM) must equal metrics computed from the
    materialized diverse frames — same keys, same math."""
    cfg, model, params, stats, cache, fns, x = setup
    key = jax.random.PRNGKey(9)
    gen = fns.diverse(params, stats, cache, x, key)       # (S, T, B, ...)
    met = fns.diverse_metrics(params, stats, cache, x, key)
    gt = x[cfg.n_past:]

    def frame_ssim(g, p):                                  # (H, W, C) pair
        return jnp.mean(jax.vmap(ssim_ops.ssim, in_axes=(2, 2))(g, p))

    for s in range(2):
        for t in range(3):
            for b in range(3):
                ref = float(frame_ssim(gt[t, b], gen[s, cfg.n_past + t, b]))
                np.testing.assert_allclose(
                    float(met["ssim"][s, t, b]), ref, rtol=1e-4, atol=1e-5)


def test_select_reproduces_scored_futures(setup):
    """diverse_select on a batch-row slice must reproduce EXACTLY the frames
    of the full-batch diverse rollout for the chosen sample/row."""
    cfg, model, params, stats, cache, fns, x = setup
    key = jax.random.PRNGKey(11)
    gen = fns.diverse(params, stats, cache, x, key)       # (S, T, B, ...)
    row = 1
    ids = jnp.asarray([2, 0])
    sel = fns.diverse_select(params, stats, cache, x[:, row:row + 1], key,
                             ids, jnp.asarray([row]))
    np.testing.assert_allclose(np.asarray(sel[0, :, 0]),
                               np.asarray(gen[2, :, row]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel[1, :, 0]),
                               np.asarray(gen[0, :, row]), rtol=1e-4,
                               atol=1e-5)


def test_fork_schedule_creates_diversity(setup):
    """Samples agree before the first fork step and diverge after it."""
    cfg, model, params, stats, cache, fns, x = setup
    # n_past=2, n_eval=5 → free steps i=2,3,4; no i%15==0 → no divergence.
    gen = fns.diverse(params, stats, cache, x, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(gen[0]), np.asarray(gen[1]),
                               rtol=1e-5, atol=1e-6)
    # with fork at i==2 (plot_samples forks at i==10; emulate via n_eval>10)
    cfg2 = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                     batch_size=2, n_past=2, n_future=13, n_eval=15,
                     g_dim=8, rnn_size=16, num_inducing_points=4)
    fns2 = make_rollout_fns(model, cfg2, nsample=2)
    x2 = jax.random.uniform(jax.random.PRNGKey(4), (15, 2, 64, 64, 1))
    gen2 = fns2.plot_samples(params, stats, cache, x2, jax.random.PRNGKey(5))
    pre = np.asarray(gen2[:, :10])       # frames before fork step 10
    np.testing.assert_allclose(pre[0], pre[1], rtol=1e-5, atol=1e-6)
    # the GP-sampled fork frame itself must differ across samples (with
    # untrained contracting weights later frames may re-converge)
    fork_frame = np.asarray(gen2[:, 10])
    assert np.abs(fork_frame[0] - fork_frame[1]).max() > 1e-4


def test_gp_trigger_path(setup):
    cfg, model, params, stats, cache, fns, x = setup
    cfg3 = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                     batch_size=3, n_past=2, n_future=13, n_eval=15,
                     g_dim=8, rnn_size=16, num_inducing_points=4)
    fns3 = make_rollout_fns(model, cfg3, nsample=2)
    x3 = jax.random.uniform(jax.random.PRNGKey(6), (15, 3, 64, 64, 1))
    frames, diag = fns3.gp_trigger(params, stats, cache, x3,
                                   jax.random.PRNGKey(7))
    assert frames.shape == (15, 3, 64, 64, 1)
    assert diag["triggers"].shape == (3, 3)   # (steps after warmup, B)
    assert diag["values"].shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(frames)))


def test_trigger_margin_forces_forks(setup):
    """cfg.trigger_margin (sensitivity knob, default 0.0 = reference-exact
    threshold): a margin ≫ the variance signal makes EVERY post-warmup
    step fork — the deterministic way to drive the trigger branch, since a
    σ-relative threshold can never fire on a constant signal (window
    std = 0 ⇒ threshold == value)."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg3 = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                     batch_size=3, n_past=2, n_future=13, n_eval=15,
                     g_dim=8, rnn_size=16, num_inducing_points=4)
    x3 = jax.random.uniform(jax.random.PRNGKey(6), (15, 3, 64, 64, 1))
    key = jax.random.PRNGKey(7)
    fns_m = make_rollout_fns(model, cfg3.replace(trigger_margin=1e6),
                             nsample=2)
    frames, diag = fns_m.gp_trigger(params, stats, cache, x3, key)
    assert np.asarray(diag["triggers"]).all()
    assert np.all(np.isfinite(np.asarray(frames)))
    # (the default-margin law is pinned against the torch-executed
    # reference in test_gp_trigger_matches_python_reference and the
    # trained-model verbatim test)


def test_best_of_n():
    m = jnp.asarray(np.random.RandomState(0).rand(4, 6, 5))   # (B, S, T)
    idx, best = best_of_n(m)
    ref = np.argmax(np.asarray(m).mean(-1), axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), ref)
    # exact ties resolve to the LAST max index — the reference sorts with
    # stable np.argsort and takes ordered[-1] (generate_frames.py:188-189)
    t = np.zeros((2, 4, 3), np.float32)
    t[0, 1] = t[0, 3] = 0.7          # rows of identical mean
    t[1, 0] = 0.2
    idx_t, best_t = best_of_n(jnp.asarray(t))
    np.testing.assert_array_equal(np.asarray(idx_t), [3, 0])
    np.testing.assert_allclose(np.asarray(best_t), [0.7, 0.2], rtol=1e-6)


def test_finn_metric_option(setup):
    """cfg.eval_metric='finn' routes the in-scan metrics through the
    Finn-variant math (reference utils.py:237-301)."""
    cfg, model, params, stats, cache, fns, x = setup
    from dvg_tpu.ops import ssim as S
    cfg_f = cfg.replace(eval_metric="finn")
    fns_f = make_rollout_fns(model, cfg_f, nsample=4)
    key = jax.random.PRNGKey(21)
    met = fns_f.diverse_metrics(params, stats, cache, x, key)
    # frames are metric-independent: reuse the setup fns' (cached) diverse
    gen = fns.diverse(params, stats, cache, x, key)
    gt = x[cfg.n_past:]
    s_ref, _ = S.finn_ssim_psnr_batch(gt[0], gen[0, cfg.n_past])
    np.testing.assert_allclose(np.asarray(met["ssim"][0, 0]),
                               np.asarray(s_ref), rtol=1e-4, atol=1e-5)


def test_last_frame_skip_refreshes_skip(setup):
    """--last_frame_skip (generate_frames.py:116-119): skip features refresh
    every step → outputs must differ from the frozen-skip rollout, context
    frames stay identical, and the in-scan metrics path must stay
    frame-exact with the materializing path under the flag."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg_l = cfg.replace(last_frame_skip=True)
    fns_l = make_rollout_fns(model, cfg_l, nsample=4)
    key = jax.random.PRNGKey(13)

    post = fns.posterior(params, stats, cache, x)
    post_l = fns_l.posterior(params, stats, cache, x)
    np.testing.assert_array_equal(np.asarray(post_l[:cfg.n_past]),
                                  np.asarray(x[:cfg.n_past]))
    # the first free frame uses the same skip either way (both refreshed at
    # the context boundary... flag-on re-encodes x[n_past-1] vs frozen
    # n_past-2) → outputs must diverge from the very first generated frame
    assert np.abs(np.asarray(post_l[cfg.n_past])
                  - np.asarray(post[cfg.n_past])).max() > 1e-5

    gen_l = fns_l.diverse(params, stats, cache, x, key)
    met_l = fns_l.diverse_metrics(params, stats, cache, x, key)
    gt = x[cfg.n_past:]

    def frame_ssim(g, p):
        return jnp.mean(jax.vmap(ssim_ops.ssim, in_axes=(2, 2))(g, p))

    ref = float(frame_ssim(gt[1, 2], gen_l[1, cfg.n_past + 1, 2]))
    np.testing.assert_allclose(float(met_l["ssim"][1, 1, 2]), ref,
                               rtol=1e-4, atol=1e-5)


def test_gp_trigger_matches_python_reference(setup):
    """The scanned GP-trigger rollout must equal a straightforward Python
    re-implementation of GPtrigger_gen's control flow (warmup window, rolling
    threshold, per-step fork decision) using the same model functions."""
    from dvg_tpu.models import gp as G
    cfg, model, params, stats, cache, fns, x = setup
    cfg3 = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                     batch_size=2, n_past=2, n_future=13, n_eval=15,
                     g_dim=8, rnn_size=16, num_inducing_points=4)
    fns3 = make_rollout_fns(model, cfg3, nsample=2)
    x3 = jax.random.uniform(jax.random.PRNGKey(31), (15, 2, 64, 64, 1))
    key = jax.random.PRNGKey(32)
    frames, diag = fns3.gp_trigger(params, stats, cache, x3, key)

    # ---- python reference ------------------------------------------------
    b = 2
    warmup, total = 12, 15
    keys = jax.random.split(key, total)

    def enc(xt):
        (h, sk), _ = model.encode(params, stats, xt, train=False)
        return h, sk

    def var_norm(h):
        v = G.cached_variance(cache, model.to_gp_layout(h))
        return np.linalg.norm(np.asarray(v, np.float32), axis=0)

    hidden = model.lstm_hidden_init(b)
    x_in = x3[0]
    window = []
    ref_frames = []
    skip = None
    for i in range(warmup):
        h, sk = enc(x_in)
        if i < 5:
            skip = sk
        window.append(var_norm(h))
        h_pred, hidden = model.predict_latent(params, hidden, h)
        x_in, _ = model.decode(params, stats, h_pred, skip, train=False)
        ref_frames.append(np.asarray(x_in))
    window = np.stack(window)                       # (12, B)
    ref_trigs, ref_vals = [], []
    for i in range(warmup, total):
        h, _ = enc(x_in)
        value = var_norm(h)
        window = np.concatenate([window[1:], value[None]], axis=0)
        thresh = window.mean(0) + 2.01 * window.std(0)
        h_pred, hidden_new = model.predict_latent(params, hidden, h)
        sample = model.from_gp_layout(G.cached_rsample(
            cache, model.to_gp_layout(h), keys[i]))
        trig = value > thresh
        # triggered rows skip the frame_predictor in the reference
        # (generate_frames.py:286-291) — their hidden stays stale
        tb = jnp.asarray(trig)[None, :, None]
        hidden = jax.tree.map(
            lambda old, new: jnp.where(tb, old, new), hidden, hidden_new)
        latent = jnp.where(jnp.asarray(trig)[:, None], sample, h_pred)
        x_in, _ = model.decode(params, stats, latent, skip, train=False)
        ref_frames.append(np.asarray(x_in))
        ref_trigs.append(trig)
        ref_vals.append(value)

    np.testing.assert_array_equal(np.asarray(diag["triggers"]),
                                  np.stack(ref_trigs))
    np.testing.assert_allclose(np.asarray(diag["values"]),
                               np.stack(ref_vals), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(frames), np.stack(ref_frames),
                               rtol=1e-5, atol=1e-6)


def test_select_pairs_reproduces_scored_futures(setup):
    """diverse_select_pairs: ONE K-batch rollout replays K (sample, row)
    pairs exactly — across a real fork step so per-pair key replay is
    actually exercised."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg2 = cfg.replace(n_past=2, n_future=14, n_eval=16)   # fork at i=15
    fns2 = make_rollout_fns(model, cfg2, nsample=4)
    x2 = jax.random.uniform(jax.random.PRNGKey(20), (16, 3, 64, 64, 1))
    key = jax.random.PRNGKey(21)
    gen = fns2.diverse(params, stats, cache, x2, key)      # (4, 16, 3, ...)

    pairs = [(2, 1), (0, 2), (3, 0), (2, 0)]               # (sample, row)
    sample_ids = jnp.asarray([p[0] for p in pairs])
    rows = jnp.asarray([p[1] for p in pairs])
    base_keys = jnp.take(jax.random.split(key, 4), sample_ids, axis=0)
    out = fns2.diverse_select_pairs(params, stats, cache, x2[:, rows],
                                    base_keys, rows)
    assert out.shape == (16, 4, 64, 64, 1)
    for k, (s, r) in enumerate(pairs):
        np.testing.assert_allclose(np.asarray(out[:, k]),
                                   np.asarray(gen[s, :, r]),
                                   rtol=1e-4, atol=1e-5)


def test_full_cov_sampling_end_to_end(setup):
    """--full_cov: forked steps draw the reference's batch-correlated
    .rsample() (generate_frames.py:170). The draws differ from the marginal
    mode, the in-scan metrics agree with the materialized frames, and the
    full-batch keyed re-roll reproduces the scored futures exactly."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg_fc = cfg.replace(n_past=2, n_future=14, n_eval=16,
                         full_cov_sampling=True)
    fns_fc = make_rollout_fns(model, cfg_fc, nsample=3)
    fns_mg = make_rollout_fns(model,
                              cfg_fc.replace(full_cov_sampling=False),
                              nsample=3)
    x2 = jax.random.uniform(jax.random.PRNGKey(30), (16, 3, 64, 64, 1))
    key = jax.random.PRNGKey(31)
    gen_fc = fns_fc.diverse(params, stats, cache, x2, key)
    gen_mg = fns_mg.diverse(params, stats, cache, x2, key)
    # identical until the fork, different sampling law at it
    np.testing.assert_allclose(np.asarray(gen_fc[:, :15]),
                               np.asarray(gen_mg[:, :15]),
                               rtol=1e-5, atol=1e-6)
    assert np.abs(np.asarray(gen_fc[:, 15]) -
                  np.asarray(gen_mg[:, 15])).max() > 1e-5

    # in-scan metrics under full_cov == metrics of the materialized frames
    met = fns_fc.diverse_metrics(params, stats, cache, x2, key)
    gt = np.asarray(x2[cfg_fc.n_past:])
    for s in range(3):
        mse_frames = ((np.asarray(gen_fc[s, 2:]) - gt) ** 2
                      ).mean(axis=(2, 3, 4))            # (n_free, B)
        np.testing.assert_allclose(np.asarray(met["mse"][s]), mse_frames,
                                   rtol=1e-3, atol=1e-5)

    # full-batch keyed re-roll reproduces sample 1 exactly
    base_keys = jax.random.split(key, 3)[1:2]
    re = fns_fc.diverse_rollout_with_keys(params, stats, cache, x2,
                                          base_keys, jnp.arange(3))
    np.testing.assert_allclose(np.asarray(re[0]), np.asarray(gen_fc[1]),
                               rtol=1e-4, atol=1e-5)

    # the subset/pair re-roll surfaces cannot reproduce a batch-correlated
    # draw — they must refuse loudly, not render silently-different frames
    with pytest.raises(ValueError, match="whole batch"):
        fns_fc.diverse_select(params, stats, cache, x2[:, :1], key,
                              jnp.asarray([1]), jnp.asarray([0]))
    with pytest.raises(ValueError, match="MARGINAL"):
        fns_fc.diverse_select_pairs(params, stats, cache, x2[:, :1],
                                    base_keys, jnp.asarray([0]))


def test_gp_trigger_short_horizon_raises(setup):
    """n_eval <= the reference's fixed 12-step warmup cannot honor the
    requested horizon — the trigger path must refuse instead of returning
    12 frames for a shorter request."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg_s = cfg.replace(n_past=2, n_future=8, n_eval=10,
                        gp_trigger_flag=True)
    fns_s = make_rollout_fns(model, cfg_s, nsample=2)
    with pytest.raises(ValueError, match="warmup"):
        fns_s.gp_trigger(params, stats, cache, x[:10],
                         jax.random.PRNGKey(0))


def test_gp_trigger_full_cov_untriggered_identity(setup):
    """--full_cov reaches the GP-trigger scan (the reference's trigger
    branch draws the batch-correlated .rsample(), generate_frames.py:292).
    At init-scale weights no trigger ever fires (seed-swept), so both laws
    must produce IDENTICAL frames and diagnostics — the correlated branch
    must not perturb the untriggered path (guards dtype-promotion
    regressions like the bf16 jnp.eye bug). The firing path is pinned on
    trained weights in test_trained_model_parity.py::
    test_trained_gp_trigger_full_cov_wiring."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg3 = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                     batch_size=2, n_past=2, n_future=13, n_eval=15,
                     g_dim=8, rnn_size=16, num_inducing_points=4)
    fns_mg = make_rollout_fns(model, cfg3, nsample=2)
    fns_fc = make_rollout_fns(model, cfg3.replace(full_cov_sampling=True),
                              nsample=2)
    x3 = jax.random.uniform(jax.random.PRNGKey(31), (15, 2, 64, 64, 1))
    key = jax.random.PRNGKey(32)
    fr_mg, d_mg = fns_mg.gp_trigger(params, stats, cache, x3, key)
    fr_fc, d_fc = fns_fc.gp_trigger(params, stats, cache, x3, key)
    assert not np.asarray(d_mg["triggers"]).any()
    np.testing.assert_array_equal(np.asarray(d_fc["triggers"]),
                                  np.asarray(d_mg["triggers"]))
    np.testing.assert_allclose(np.asarray(fr_fc), np.asarray(fr_mg),
                               rtol=1e-5, atol=1e-6)


def test_full_cov_sampling_bfloat16(setup):
    """The bf16 serving path with --full_cov: the f32 default of jnp.eye
    used to promote the covariance — and the whole rollout tail — to f32,
    crashing bf16 with dtype-mismatched convs (fixed in
    gp.cached_rsample_fullcov: factorize f32, cast the sample back).
    The bf16 rollout must run, stay finite, and track the f32 rollout."""
    cfg, model, params, stats, cache, fns, x = setup
    cfg_bf = cfg.replace(n_past=2, n_future=14, n_eval=16,
                         full_cov_sampling=True, dtype="bfloat16")
    fns_bf = make_rollout_fns(model, cfg_bf, nsample=3)
    fns_f32 = make_rollout_fns(model, cfg_bf.replace(dtype="float32"),
                               nsample=3)
    x2 = jax.random.uniform(jax.random.PRNGKey(30), (16, 3, 64, 64, 1))
    key = jax.random.PRNGKey(31)
    met_bf = jax.tree.map(np.asarray,
                          fns_bf.diverse_metrics(params, stats, cache,
                                                 x2, key))
    met_f32 = jax.tree.map(np.asarray,
                           fns_f32.diverse_metrics(params, stats, cache,
                                                   x2, key))
    for k in met_bf:
        assert np.isfinite(met_bf[k]).all(), k
        # same keyed draws (eps is f32 both ways), bf16 compute tolerance
        np.testing.assert_allclose(met_bf[k], met_f32[k],
                                   rtol=0.1, atol=0.05, err_msg=k)


def test_full_cov_bf16_uses_f32_cache(setup, monkeypatch):
    """The bf16 rollout must feed the FULL-COV draw the uncast f32 cache:
    a bf16-rounded cache makes w/v2 inconsistent with the kernel, the
    kxx − a·aᵀ cancellation leaves residuals above noise+jitter, and the
    (D,B,B) Cholesky goes NaN on trained-scale GPs (see
    tests/test_gp.py::test_cached_fullcov_bf16_inputs_survive_cancellation).
    Recorded at trace time in both the diverse scan and the trigger scan."""
    from dvg_tpu.models import gp as G

    cfg, model, params, stats, cache, fns, x = setup
    seen = []
    real = G.cached_rsample_fullcov

    def spy(cache_in, xin, key):
        seen.append((cache_in.w.dtype, xin.dtype))
        return real(cache_in, xin, key)

    monkeypatch.setattr(G, "cached_rsample_fullcov", spy)
    cfg_bf = cfg.replace(n_past=2, n_future=14, n_eval=16,
                         full_cov_sampling=True, dtype="bfloat16")
    fns_bf = make_rollout_fns(model, cfg_bf, nsample=2)
    x2 = jax.random.uniform(jax.random.PRNGKey(30), (16, 3, 64, 64, 1))
    key = jax.random.PRNGKey(31)
    fns_bf.diverse_metrics(params, stats, cache, x2, key)
    fns_bf.gp_trigger(params, stats, cache, x2, key)
    assert seen, "full-cov branch never reached"
    for cache_dtype, x_dtype in seen:
        assert cache_dtype == jnp.float32, "fullcov got the CAST cache"
        assert x_dtype == jnp.bfloat16      # latents stay in compute dtype
