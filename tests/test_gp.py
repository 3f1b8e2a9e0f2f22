"""SVGP correctness: against closed-form GP regression, gradient checks, and
ELBO sanity (SURVEY.md §4 unit-test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dvg_tpu.models import gp as G


def _toy_params(key, num_tasks=3, num_inducing=12):
    return G.gp_init(key, num_tasks, num_inducing)


def test_shapes():
    key = jax.random.PRNGKey(0)
    p = _toy_params(key)
    lik = G.likelihood_init(3)
    x = jax.random.uniform(key, (3, 7, 1))
    post = G.posterior(p, x)
    assert post.mean.shape == (3, 7)
    assert post.var.shape == (3, 7)
    e = G.elbo(p, lik, x, jnp.zeros((3, 7)), num_data=7)
    assert e.shape == (3,)
    s = G.rsample(p, lik, x, key)
    assert s.shape == (3, 7)
    s_full = G.rsample(p, lik, x, key, full_cov=True)
    assert s_full.shape == (3, 7)


def test_prior_matches_kernel():
    """With q(v)=N(0,I) (the init), the whitened predictive equals the GP
    prior: mean = const, var = outputscale."""
    key = jax.random.PRNGKey(1)
    p = _toy_params(key)
    x = jax.random.uniform(key, (3, 9, 1))
    post = G.posterior(p, x)
    # A A^T cancels against A L_S (L_S=I) → var == k_diag, mean == const
    np.testing.assert_allclose(np.asarray(post.var),
                               np.asarray(G.kernel_diag(p, 9)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(post.mean), 0.0, atol=1e-5)
    # KL of the init variational distribution is exactly 0
    np.testing.assert_allclose(np.asarray(G.kl_divergence(p)), 0.0, atol=1e-6)


def test_svgp_matches_exact_gp_regression():
    """With Z = X (inducing at the data) and the variational dist optimized,
    SVGP predictive should approach exact GP regression on the data."""
    key = jax.random.PRNGKey(2)
    n = 16
    x_np = np.linspace(0, 1, n)[None, :, None].astype(np.float32)
    f = np.sin(6 * x_np[..., 0])
    rng = np.random.RandomState(0)
    y = (f + 0.05 * rng.randn(1, n)).astype(np.float32)

    params = G.gp_init(key, num_tasks=1, num_inducing=n)
    params["z"] = jnp.asarray(x_np)
    lik = G.likelihood_init(1)
    x = jnp.asarray(x_np)
    y_j = jnp.asarray(y)

    # optimize ONLY the variational parameters (hypers fixed) so the optimum
    # is the analytic posterior of the fixed-hyper GP
    var_p = {"var_mean": params["var_mean"], "var_chol": params["var_chol"]}

    def loss(vp):
        full = dict(params, **vp)
        return -jnp.sum(G.elbo(full, lik, x, y_j, num_data=n))

    opt = optax.adam(0.05)
    state = opt.init(var_p)
    step = jax.jit(lambda vp, st: (lambda g: opt.update(g, st, vp))(
        jax.grad(loss)(vp)))
    for _ in range(500):
        updates, state = step(var_p, state)
        var_p = optax.apply_updates(var_p, updates)

    full = dict(params, **var_p)
    post = G.posterior(full, x)

    # closed-form GP regression with the same kernel/noise
    kxx = np.asarray(G.rbf_cross(params, x, x))[0]
    noise = float(np.asarray(G.noise_variance(lik))[0])
    k_noisy = kxx + noise * np.eye(n)
    exact_mean = kxx @ np.linalg.solve(k_noisy, y[0])
    exact_cov = kxx - kxx @ np.linalg.solve(k_noisy, kxx)

    np.testing.assert_allclose(np.asarray(post.mean)[0], exact_mean,
                               atol=0.02, rtol=0.05)
    np.testing.assert_allclose(np.asarray(post.var)[0], np.diag(exact_cov),
                               atol=0.02, rtol=0.25)


def test_elbo_gradients_finite_diff():
    key = jax.random.PRNGKey(3)
    p = _toy_params(key, num_tasks=2, num_inducing=6)
    lik = G.likelihood_init(2)
    x = jax.random.uniform(key, (2, 5, 1))
    y = jax.random.normal(jax.random.PRNGKey(4), (2, 5))

    def loss_fn(raw_ls):
        p2 = dict(p, raw_lengthscale=raw_ls)
        return jnp.sum(G.elbo(p2, lik, x, y, num_data=5))

    g = jax.grad(loss_fn)(p["raw_lengthscale"])
    eps = 1e-3
    for i in range(2):
        e = jnp.zeros_like(p["raw_lengthscale"]).at[i].set(eps)
        fd = (loss_fn(p["raw_lengthscale"] + e)
              - loss_fn(p["raw_lengthscale"] - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-2, atol=1e-4)


def test_cache_matches_posterior():
    key = jax.random.PRNGKey(5)
    p = _toy_params(key, num_tasks=4, num_inducing=10)
    # make it non-trivial
    p["var_mean"] = jax.random.normal(key, p["var_mean"].shape) * 0.3
    p["var_chol"] = p["var_chol"] + 0.05 * jnp.tril(
        jax.random.normal(key, p["var_chol"].shape))
    lik = G.likelihood_init(4)
    x = jax.random.uniform(key, (4, 6, 1))
    post = G.posterior(p, x)
    cache = G.build_cache(p, lik)
    mean_c, var_c = G.cached_mean_var(cache, x)
    np.testing.assert_allclose(np.asarray(mean_c), np.asarray(post.mean),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_c), np.asarray(post.var),
                               rtol=1e-3, atol=1e-5)
    v = G.predictive_variance(p, lik, x)
    v_c = G.cached_variance(cache, x)
    np.testing.assert_allclose(np.asarray(v_c), np.asarray(v),
                               rtol=1e-3, atol=1e-5)


def test_rsample_statistics():
    """Marginal rsample mean/std match the predictive distribution."""
    key = jax.random.PRNGKey(6)
    p = _toy_params(key, num_tasks=1, num_inducing=8)
    lik = G.likelihood_init(1)
    x = jax.random.uniform(key, (1, 4, 1))
    post = G.posterior(p, x)
    noise = G.noise_variance(lik)[:, None]
    keys = jax.random.split(jax.random.PRNGKey(7), 4000)
    samples = jax.vmap(lambda k: G.rsample(p, lik, x, k))(keys)  # (S, 1, 4)
    mean = jnp.mean(samples, axis=0)
    std = jnp.std(samples, axis=0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(post.mean),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(std),
                               np.asarray(jnp.sqrt(post.var + noise)),
                               rtol=0.1)


def test_cached_fullcov_matches_params_rsample():
    """cached_rsample_fullcov (GPCache route) must equal
    rsample(full_cov=True) (params route) for the same key — the
    reference-exact correlated draw of generate_frames.py:170."""
    key = jax.random.PRNGKey(0)
    d, m, b = 6, 5, 7
    params = G.gp_init(jax.random.PRNGKey(1), d, m)
    params["var_mean"] = 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                                 (d, m))
    params["var_chol"] = params["var_chol"] + 0.1 * jnp.tril(
        jax.random.normal(jax.random.PRNGKey(3), (d, m, m)))
    lik = G.likelihood_init(d)
    x = jax.random.uniform(jax.random.PRNGKey(4), (d, b, 1))
    a = G.rsample(params, lik, x, key, full_cov=True)
    cache = G.build_cache(params, lik)
    c = G.cached_rsample_fullcov(cache, x, key)
    # the two routes factorize float-wise different (but equal) covariance
    # matrices; the Cholesky amplifies the ~1e-7 cov noise a few-fold
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               rtol=1e-4, atol=5e-6)


def test_cached_fullcov_bf16_inputs_survive_cancellation():
    """cov = kxx − a·aᵀ + a_ls·a_lsᵀ cancels catastrophically when the
    eval points sit on the inducing set with a large outputscale and tiny
    noise. The rollout contract is: bf16 INPUTS (latents) against the f32
    cache — the whole covariance path upcasts to f32, stays PSD, and
    tracks the all-f32 draw. (A bf16-ROUNDED cache is unfixable — rounding
    w/v2 makes them inconsistent with the kernel and the residual exceeds
    noise+jitter, which is why rollout.py's prep feeds the fullcov branch
    the uncast cache; verified NaN when this test was written.)"""
    d, m, b = 4, 16, 8
    p = G.gp_init(jax.random.PRNGKey(1), d, m)
    p["raw_outputscale"] = jnp.full((d,), 25.0)       # outputscale ≈ 25
    p["var_chol"] = 0.05 * p["var_chol"]              # tiny posterior var
    p["var_mean"] = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (d, m))
    lik = {"raw_noise": jnp.full((d,), -12.0)}        # noise ≈ 6e-6
    cache = G.build_cache(p, lik)
    x = cache.z[:, :b]                                # exactly on inducing
    key = jax.random.PRNGKey(0)
    s32 = G.cached_rsample_fullcov(cache, x, key)
    assert bool(jnp.isfinite(s32).all())
    s_bf = G.cached_rsample_fullcov(cache, x.astype(jnp.bfloat16), key)
    assert s_bf.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(s_bf).all()), (
        "bf16-input fullcov draw went NaN — covariance path not f32")
    # the draw itself matches the f32 route to bf16-rounding accuracy
    np.testing.assert_allclose(np.asarray(s_bf.astype(jnp.float32)),
                               np.asarray(s32), rtol=0.05, atol=0.05)
