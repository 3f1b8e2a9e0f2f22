"""Batched whitened sparse variational GP (SVGP) — from scratch, no gpytorch.

Replaces /root/reference/models/gp_models.py:10-24 (GPRegressionLayer1): a
batch of `num_tasks` (= g_dim = 90) INDEPENDENT 1-D GPs, each with
`num_inducing` (= 40) learned inducing locations (init U[0,1], gp_models.py:13),
a constant mean, a scaled RBF kernel, and a whitened Cholesky-parameterized
variational distribution q(v) = N(m, S), S = L_S L_S^T (init m=0, L_S=I).

Whitened parameterization (gpytorch's WhitenedVariationalStrategy): with
L = chol(K_ZZ), the inducing values are u = mu_Z + L v, so the predictive at
inputs X is

    A      = K_XZ L^{-T}
    mean_f = mu_X + A m
    cov_f  = K_XX - A A^T + (A L_S)(A L_S)^T
    KL(q(v) || N(0, I)) = 0.5 (tr(S) + m^T m - M - logdet S)

Everything is vmapped over the task axis: one batched (90, 40, 40) Cholesky +
triangular solves — exact, instead of gpytorch's Lanczos/CG approximations
(the reference caps CG at 45 iterations, train.py:340; TPU prefers the exact
dense factorization, which is tiny at 40x40).

The Gaussian likelihood (gpytorch GaussianLikelihood(batch_size=90),
reference train.py:102) is a per-task noise: sigma_n^2 = softplus(raw) + 1e-4.

ELBO matches gpytorch's VariationalELBO(num_data=batch_size, combine_terms=
True) (train.py:112): per task,  mean_i E_q[log p(y_i | f_i)] - KL/num_data.

Shapes follow the reference convention: inputs x are (D, B, 1) — per-task
scalar latents across the batch (train.py:225) — targets y are (D, B).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

JITTER = 1e-4
NOISE_FLOOR = 1e-4
LOG_2PI = math.log(2.0 * math.pi)


def _softplus(x):
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def gp_init(key, num_tasks: int = 90, num_inducing: int = 40) -> Dict:
    kz, = jax.random.split(key, 1)
    eye = jnp.broadcast_to(jnp.eye(num_inducing), (num_tasks, num_inducing, num_inducing))
    return {
        # inducing locations, U[0,1] init (gp_models.py:13 torch.rand)
        "z": jax.random.uniform(kz, (num_tasks, num_inducing, 1)),
        # whitened variational distribution q(v) = N(m, L_S L_S^T)
        "var_mean": jnp.zeros((num_tasks, num_inducing)),
        "var_chol": eye,                       # lower triangle used
        # ConstantMean (gp_models.py:16)
        "mean_const": jnp.zeros((num_tasks,)),
        # ScaleKernel(RBFKernel) raw params, softplus transform (gpytorch default)
        "raw_outputscale": jnp.zeros((num_tasks,)),
        "raw_lengthscale": jnp.zeros((num_tasks,)),
    }


def likelihood_init(num_tasks: int = 90) -> Dict:
    return {"raw_noise": jnp.zeros((num_tasks,))}


def noise_variance(lik_params) -> jnp.ndarray:
    return _softplus(lik_params["raw_noise"]) + NOISE_FLOOR


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _rbf(outputscale, lengthscale, x1, x2):
    """Scaled RBF from explicit (D,) hyperparams — the ONE kernel formula;
    every path (raw params, rollout cache, full-cov cache) routes through
    it so a kernel change cannot silently miss a copy.
    x1: (D,N,1), x2: (D,M,1) → (D,N,M)."""
    diff = x1[..., :, 0][..., :, None] - x2[..., :, 0][..., None, :]
    sq = (diff / lengthscale[:, None, None]) ** 2
    return outputscale[:, None, None] * jnp.exp(-0.5 * sq)


def rbf_cross(params, x1, x2):
    """Scaled RBF cross-covariance. x1: (D,N,1), x2: (D,M,1) → (D,N,M)."""
    return _rbf(_softplus(params["raw_outputscale"]),
                _softplus(params["raw_lengthscale"]), x1, x2)


def kernel_diag(params, n: int) -> jnp.ndarray:
    """k(x,x) for the scaled RBF is the outputscale, independent of x. (D,N)."""
    os_ = _softplus(params["raw_outputscale"])
    return jnp.broadcast_to(os_[:, None], (os_.shape[0], n))


def _tril(mat):
    return jnp.tril(mat)


def _kzz_chol(params):
    z = params["z"]
    kzz = rbf_cross(params, z, z)
    m = z.shape[1]
    kzz = kzz + JITTER * jnp.eye(m)
    return jnp.linalg.cholesky(kzz)


# ---------------------------------------------------------------------------
# predictive posterior
# ---------------------------------------------------------------------------

class GPPosterior(NamedTuple):
    """Predictive q(f(X)) per task: mean (D,B); var (D,B); and the pieces
    needed for a full-covariance sample (A, A L_S, k_diag)."""
    mean: jnp.ndarray
    var: jnp.ndarray
    a: jnp.ndarray          # (D, B, M)
    a_ls: jnp.ndarray       # (D, B, M)
    k_diag: jnp.ndarray     # (D, B)


def posterior(params, x) -> GPPosterior:
    """x: (D, B, 1) → predictive distribution of f (noise NOT included)."""
    l_k = _kzz_chol(params)                                   # (D, M, M)
    kxz = rbf_cross(params, x, params["z"])                   # (D, B, M)
    # A = K_XZ L^{-T}  ⇔  A^T = L^{-1} K_ZX
    at = lax.linalg.triangular_solve(l_k, jnp.swapaxes(kxz, 1, 2),
                                     left_side=True, lower=True)
    a = jnp.swapaxes(at, 1, 2)                                # (D, B, M)
    mean = params["mean_const"][:, None] + jnp.einsum(
        "dbm,dm->db", a, params["var_mean"])
    l_s = _tril(params["var_chol"])
    a_ls = jnp.einsum("dbm,dmn->dbn", a, l_s)
    k_diag = kernel_diag(params, x.shape[1])
    var = k_diag - jnp.sum(a * a, axis=-1) + jnp.sum(a_ls * a_ls, axis=-1)
    var = jnp.maximum(var, 1e-10)
    return GPPosterior(mean, var, a, a_ls, k_diag)


def predictive_variance(params, lik_params, x) -> jnp.ndarray:
    """variance of likelihood(gp(x)) — diag(cov_f) + sigma_n^2, (D, B).
    This is the reference's diversity-trigger signal
    (generate_frames.py:229-230, 273-275)."""
    post = posterior(params, x)
    return post.var + noise_variance(lik_params)[:, None]


def posterior_full_cov(params, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full (D, B, B) predictive covariance (for exact correlated rsample,
    matching gpytorch MultivariateNormal.rsample on a batch of inputs).

    Computed — and returned — in at least f32 (low-precision inputs are
    PROMOTED; f64 callers keep f64): cov = kxx − A·Aᵀ + (A L_S)(A L_S)ᵀ
    is a catastrophic cancellation (kxx ≈ A·Aᵀ near the inducing set), so
    assembling it in bf16 loses the digits before any later cast can
    recover them; the residual can exceed noise+jitter, turning cov
    indefinite and the downstream Cholesky NaN (same hazard
    cached_rsample_fullcov documents and avoids)."""
    ct = jnp.promote_types(jnp.result_type(x), jnp.float32)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, ct), params)
    xf = jnp.asarray(x, ct)
    post = posterior(params, xf)
    kxx = rbf_cross(params, xf, xf)
    cov = (kxx - jnp.einsum("dbm,dcm->dbc", post.a, post.a)
           + jnp.einsum("dbm,dcm->dbc", post.a_ls, post.a_ls))
    return post.mean, cov


def rsample(params, lik_params, x, key, full_cov: bool = False) -> jnp.ndarray:
    """Reparameterized sample of likelihood(gp(x)), shape (D, B).

    The reference draws one correlated sample across the batch from the full
    B x B posterior covariance plus noise (generate_frames.py:170: .rsample()
    on a gpytorch MultivariateNormal). `full_cov=True` reproduces that
    exactly; the default `full_cov=False` samples from the marginal
    mean/variance per batch element — the batch elements are independent
    videos, so the marginal sample is the statistically-intended behavior and
    avoids a (90, B, B) Cholesky per triggered frame in the hot rollout.
    """
    noise = noise_variance(lik_params)[:, None]
    if full_cov:
        # posterior_full_cov computes in promote(input, f32) — see its
        # docstring; draw in that dtype, cast back to the input's at the end
        mean, cov = posterior_full_cov(params, x)
        ct = mean.dtype
        b = x.shape[1]
        cov = cov + (jnp.asarray(noise, ct)[..., None] + JITTER) * jnp.eye(b, dtype=ct)
        l = jnp.linalg.cholesky(cov)
        eps = jax.random.normal(key, mean.shape, ct)
        return (mean + jnp.einsum("dbc,dc->db", l, eps)).astype(x.dtype)
    post = posterior(params, x)
    eps = jax.random.normal(key, post.mean.shape, post.mean.dtype)
    return post.mean + jnp.sqrt(post.var + noise) * eps


# ---------------------------------------------------------------------------
# ELBO (gpytorch VariationalELBO parity, reference train.py:112)
# ---------------------------------------------------------------------------

def kl_divergence(params) -> jnp.ndarray:
    """KL(q(v) || N(0, I)) per task, (D,)."""
    m = params["var_mean"]
    l_s = _tril(params["var_chol"])
    num_inducing = m.shape[-1]
    diag = jnp.diagonal(l_s, axis1=-2, axis2=-1)
    tr_s = jnp.sum(l_s * l_s, axis=(-2, -1))
    logdet_s = 2.0 * jnp.sum(jnp.log(jnp.abs(diag) + 1e-20), axis=-1)
    mtm = jnp.sum(m * m, axis=-1)
    return 0.5 * (tr_s + mtm - num_inducing - logdet_s)


def expected_log_prob(mean_f, var_f, y, noise) -> jnp.ndarray:
    """E_{q(f)}[log N(y | f, sigma_n^2)] per point. All (D, B)."""
    return -0.5 * (LOG_2PI + jnp.log(noise)
                   + ((y - mean_f) ** 2 + var_f) / noise)


def elbo(params, lik_params, x, y, num_data: int) -> jnp.ndarray:
    """Per-task ELBO, (D,):  mean_i E[log p(y_i|f_i)] - KL / num_data.

    Matches gpytorch _ApproximateMarginalLogLikelihood.forward with
    combine_terms=True: the log-likelihood term is divided by the minibatch
    length and the KL by num_data (reference passes num_data=batch_size, so
    both scale factors coincide at B=50).
    """
    post = posterior(params, x)
    noise = noise_variance(lik_params)[:, None]
    ll = expected_log_prob(post.mean, post.var, y, noise)
    return jnp.mean(ll, axis=-1) - kl_divergence(params) / num_data


# ---------------------------------------------------------------------------
# frozen-hyperparameter fast path for generation rollouts
# ---------------------------------------------------------------------------

class GPCache(NamedTuple):
    """Precomputed quantities for repeated prediction with fixed params.

    With W = L^{-T} (explicit 40x40 triangular inverse, exact):
      A      = K_XZ W
      mean   = mu + K_XZ v1,         v1 = W m
      var    = k_diag - rowsum(A^2) + rowsum((K_XZ v2)^2),  v2 = W L_S
    so each rollout step is one (B,M) kernel row + three small matmuls —
    no solves in the scanned hot loop.
    """
    w: jnp.ndarray           # (D, M, M)
    v1: jnp.ndarray          # (D, M)
    v2: jnp.ndarray          # (D, M, M)
    z: jnp.ndarray           # (D, M, 1)
    mean_const: jnp.ndarray  # (D,)
    lengthscale: jnp.ndarray # (D,)
    outputscale: jnp.ndarray # (D,)
    noise: jnp.ndarray       # (D,)


def build_cache(params, lik_params) -> GPCache:
    l_k = _kzz_chol(params)
    m = l_k.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(m), l_k.shape)
    l_inv = lax.linalg.triangular_solve(l_k, eye, left_side=True, lower=True)
    w = jnp.swapaxes(l_inv, 1, 2)                     # L^{-T}
    v1 = jnp.einsum("dmn,dn->dm", w, params["var_mean"])
    v2 = jnp.einsum("dmn,dnk->dmk", w, _tril(params["var_chol"]))
    return GPCache(
        w=w, v1=v1, v2=v2, z=params["z"],
        mean_const=params["mean_const"],
        lengthscale=_softplus(params["raw_lengthscale"]),
        outputscale=_softplus(params["raw_outputscale"]),
        noise=noise_variance(lik_params),
    )


def cached_mean_var(cache: GPCache, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x: (D, B, 1) → (mean (D,B), var-of-f (D,B)) using the cache."""
    kxz = _rbf(cache.outputscale, cache.lengthscale, x, cache.z)  # (D,B,M)
    a = jnp.einsum("dbm,dmn->dbn", kxz, cache.w)
    mean = cache.mean_const[:, None] + jnp.einsum("dbm,dm->db", kxz, cache.v1)
    a_ls = jnp.einsum("dbm,dmn->dbn", kxz, cache.v2)
    var = (cache.outputscale[:, None]
           - jnp.sum(a * a, axis=-1) + jnp.sum(a_ls * a_ls, axis=-1))
    return mean, jnp.maximum(var, 1e-10)


def cached_rsample(cache: GPCache, x, key, row_ids=None) -> jnp.ndarray:
    """Marginal reparameterized sample of likelihood(gp(x)) via the cache.

    With `row_ids` (shape (B,) int32), the noise for batch row b derives
    from fold_in(key, row_ids[b]) — so a rollout over any SUBSET of batch
    rows reproduces exactly the draws of the full-batch rollout (the
    re-roll-selected-samples generation protocol relies on this)."""
    mean, var = cached_mean_var(cache, x)
    if row_ids is None:
        eps = jax.random.normal(key, mean.shape, mean.dtype)
    else:
        row_keys = jax.vmap(lambda r: jax.random.fold_in(key, r))(row_ids)
        eps_bd = jax.vmap(
            lambda k: jax.random.normal(k, (mean.shape[0],), mean.dtype)
        )(row_keys)                                   # (B, D)
        eps = eps_bd.T
    return mean + jnp.sqrt(var + cache.noise[:, None]) * eps


def cached_variance(cache: GPCache, x) -> jnp.ndarray:
    mean, var = cached_mean_var(cache, x)
    return var + cache.noise[:, None]


def cached_rsample_pairs(cache: GPCache, x, keys_row, row_ids) -> jnp.ndarray:
    """Marginal rsample where every batch position carries its OWN step key.

    x: (D, K, 1); keys_row: (K,) PRNG keys (position k's step key);
    row_ids: (K,) global row ids. Position k draws
    eps = normal(fold_in(keys_row[k], row_ids[k]), (D,)) — exactly the draw
    that position's (sample, row) pair saw inside the full diverse rollout
    (cached_rsample with a shared step key + row folding), so a single
    K-batch re-rollout reproduces K different (sample, row) futures at
    once."""
    mean, var = cached_mean_var(cache, x)
    row_keys = jax.vmap(jax.random.fold_in)(keys_row, jnp.asarray(row_ids))
    eps_kd = jax.vmap(
        lambda k: jax.random.normal(k, (mean.shape[0],), mean.dtype)
    )(row_keys)                                   # (K, D)
    return mean + jnp.sqrt(var + cache.noise[:, None]) * eps_kd.T


def cached_rsample_fullcov(cache: GPCache, x, key) -> jnp.ndarray:
    """Reference-exact batch-correlated sample via the cache.

    Reproduces gpytorch's `.rsample()` on a batch of inputs
    (/root/reference/generate_frames.py:170): one draw from the FULL
    (D, B, B) posterior covariance plus noise, correlated across batch
    rows. Numerically equal to `rsample(params, lik, x, key, full_cov=True)`
    for the cache built from the same params (tested in tests/test_gp.py).
    Costs a (D, B, B) Cholesky per call — the `--full_cov` parity knob, not
    the default hot path (batch rows are independent videos; see rsample).

    The whole covariance path runs in f32 FROM THE INPUTS, not just the
    factorization: cov = kxx − a·aᵀ + a_ls·a_lsᵀ is a catastrophic
    cancellation (kxx ≈ a·aᵀ near the inducing set), so assembling it in
    bf16 loses the digits before any later cast can recover them — the
    residual can exceed noise+jitter, turning cov indefinite and the
    Cholesky NaN. Computed in f32 from the (possibly bf16-rounded) inputs
    the formula is the exact posterior covariance of a GP with those
    inputs, PSD by construction. f32 also avoids jnp.eye's dtype-default
    promoting the rollout tail (the bf16-serving crash this fixed)."""
    f32 = jnp.float32
    xf = x.astype(f32)
    outputscale = cache.outputscale.astype(f32)
    lengthscale = cache.lengthscale.astype(f32)
    kxz = _rbf(outputscale, lengthscale, xf, cache.z.astype(f32))  # (D,B,M)
    a = jnp.einsum("dbm,dmn->dbn", kxz, cache.w.astype(f32))
    mean = (cache.mean_const.astype(f32)[:, None]
            + jnp.einsum("dbm,dm->db", kxz, cache.v1.astype(f32)))
    a_ls = jnp.einsum("dbm,dmn->dbn", kxz, cache.v2.astype(f32))
    kxx = _rbf(outputscale, lengthscale, xf, xf)                   # (D,B,B)
    cov = (kxx - jnp.einsum("dbm,dcm->dbc", a, a)
           + jnp.einsum("dbm,dcm->dbc", a_ls, a_ls))
    b = x.shape[1]
    cov = cov + ((cache.noise.astype(f32)[:, None, None] + JITTER)
                 * jnp.eye(b, dtype=f32))
    l = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(key, mean.shape, f32)
    return (mean + jnp.einsum("dbc,dc->db", l, eps)).astype(x.dtype)
