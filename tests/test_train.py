"""Training-layer tests: step mechanics, BN EMA folding math, GP LR
schedule, checkpoint roundtrip + resume (SURVEY.md §4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvg_tpu.config import DVGConfig
from dvg_tpu.models import layers as L
from dvg_tpu.train import optim as O
from dvg_tpu.train import step as S
from dvg_tpu.train.checkpoint import load_checkpoint, save_checkpoint


def tiny_cfg(**kw):
    base = dict(dataset="smmnist", channels=1, image_width=64, batch_size=2,
                n_past=2, n_future=1, n_eval=4, g_dim=8, rnn_size=16,
                num_inducing_points=4, epoch_size=3, ft=True)
    base.update(kw)
    return DVGConfig(**base)


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_cfg()
    model, state, opts = S.init_train_state(cfg, jax.random.PRNGKey(0))
    # the step donates its input state; snapshot to host first
    before = jax.tree.map(np.asarray, {"params": state.params,
                                       "stats": state.stats})
    step = S.make_train_step(model, cfg, opts)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 2, 64, 64, 1))
    new_state, metrics = step(state, x)
    return cfg, model, before, new_state, metrics, opts


def test_step_updates_everything(trained):
    cfg, model, before, new_state, metrics, _ = trained
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # every param group changed
    for group in ("encoder", "decoder", "frame_predictor", "gp"):
        b = jax.tree_util.tree_leaves(before["params"][group])
        a = jax.tree_util.tree_leaves(new_state.params[group])
        assert any(not np.allclose(x, y) for x, y in zip(b, a)), group
    # BN stats moved
    sb = jax.tree_util.tree_leaves(before["stats"])
    sa = jax.tree_util.tree_leaves(new_state.stats)
    assert any(not np.allclose(x, y) for x, y in zip(sb, sa))


def test_checkpoint_roundtrip(trained, tmp_path):
    cfg, model, _, state, _, opts = trained
    path = save_checkpoint(str(tmp_path), cfg, state)
    _, skeleton, _ = S.init_train_state(cfg, jax.random.PRNGKey(42))
    cfg2, restored = load_checkpoint(path, target_state=skeleton)
    assert cfg2.g_dim == cfg.g_dim
    for b, a in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    for b, a in zip(jax.tree_util.tree_leaves(state.opt_states),
                    jax.tree_util.tree_leaves(restored.opt_states)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert int(restored.step) == int(state.step)


def test_save_checkpoint_path_contract(trained, tmp_path):
    """.ckpt/.msgpack basename → explicit FILE; anything else (including
    dotted run names like 'runs/v1.5'), an existing dir, or a trailing
    slash → directory (writes model.ckpt inside) — checkpoint.py's
    extension-allowlist disambiguation rule."""
    cfg, _, _, state, _, _ = trained
    p1 = save_checkpoint(str(tmp_path / "final.msgpack"), cfg, state)
    assert p1.endswith("final.msgpack") and os.path.isfile(p1)
    cfg2, _ = load_checkpoint(p1)           # loadable from the file path
    assert cfg2.g_dim == cfg.g_dim
    # trailing separator forces the directory branch even with a dot
    p2 = save_checkpoint(str(tmp_path / "run.v2") + os.sep, cfg, state)
    assert p2.endswith("model.ckpt") and os.path.isdir(
        str(tmp_path / "run.v2"))
    # an existing dotted directory stays a directory
    d3 = tmp_path / "v1.5"
    d3.mkdir()
    p3 = save_checkpoint(str(d3), cfg, state)
    assert p3 == str(d3 / "model.ckpt") and os.path.isfile(p3)
    # a NOT-yet-existing dotted run name is a directory too (the dot is
    # not a checkpoint extension) — downstream `--model_dir runs/v1.5`
    # readers join model.ckpt onto it
    p4 = save_checkpoint(str(tmp_path / "v2.5"), cfg, state)
    assert p4 == str(tmp_path / "v2.5" / "model.ckpt") and os.path.isfile(p4)


def test_generation_override_contract():
    cfg = tiny_cfg()
    g = cfg.generation_override()
    assert (g.n_eval, g.n_future, g.batch_size) == (105, 100, 50)
    assert g.n_past == cfg.n_past           # everything else preserved


def test_gp_lr_schedule_torch_semantics():
    """MultiStepLR([3,5], 0.1) stepped BEFORE each epoch (train.py:347):
    decay effective during 0-based epochs 2 and 4."""
    cfg = tiny_cfg(epoch_size=10, gp_lr_milestones=(3, 5))
    sched = O.gp_lr_schedule(cfg)
    lrs = [float(sched(e * 10)) for e in range(6)]
    np.testing.assert_allclose(lrs[0], 0.002)
    np.testing.assert_allclose(lrs[1], 0.002)
    np.testing.assert_allclose(lrs[2], 0.0002, rtol=1e-6)
    np.testing.assert_allclose(lrs[3], 0.0002, rtol=1e-6)
    np.testing.assert_allclose(lrs[4], 2e-05, rtol=1e-6)
    np.testing.assert_allclose(lrs[5], 2e-05, rtol=1e-6)


def test_ema_fold_matches_sequential():
    """The closed-form running-stat fold must equal torch's sequential
    r ← (1-m)r + m·s_k over the interleaved encode order."""
    rng = np.random.RandomState(0)
    seq_len, m = 5, L.BN_MOMENTUM
    old = rng.rand(7).astype(np.float32)
    per_frame = rng.rand(seq_len, 7).astype(np.float32)

    order = [0]
    for i in range(1, seq_len):
        order.extend([i, i] if i < seq_len - 1 else [i])
    ref = old.copy()
    for j in order:
        ref = (1 - m) * ref + m * per_frame[j]

    w, decay = S._ema_weights(order, seq_len, m)
    # feed per-frame NEW stats (what batchnorm_apply returns), not raw batch
    per_frame_new = (1 - m) * old + m * per_frame
    folded = S._fold_stats(old, jnp.asarray(per_frame_new), w, decay)
    np.testing.assert_allclose(np.asarray(folded), ref, rtol=1e-5, atol=1e-6)


def test_skip_gather_indices():
    skips = [jnp.arange(6)[:, None]]
    out = S.skip_gather(skips, seq_len=6, n_past=3, last_frame_skip=False)
    # steps i=1..5 use frame i-1 while i<3, then frozen at n_past-2=1
    np.testing.assert_array_equal(np.asarray(out[0][:, 0]), [0, 1, 1, 1, 1])
    out2 = S.skip_gather(skips, seq_len=6, n_past=3, last_frame_skip=True)
    np.testing.assert_array_equal(np.asarray(out2[0][:, 0]), [0, 1, 2, 3, 4])


def test_sharded_loss_and_grads_match_single_device():
    """shard_map DP over 2 virtual devices must reproduce the single-device
    joint loss and its gradients (pmean'd losses + global-batch BN make the
    math identical; only reduction-order float noise remains).

    Post-optimizer comparisons are deliberately NOT asserted: Adam's first
    step is ~sign(g)·lr, so float-reassociation noise on near-zero gradient
    coordinates flips update signs — an optimizer property, not a sharding
    bug."""
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    cfg = tiny_cfg(batch_size=4)
    model, state, opts = S.init_train_state(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 4, 64, 64, 1))

    def loss_and_grad_single(params, stats, xx):
        (l, aux), g = jax.value_and_grad(S.joint_loss, has_aux=True)(
            params, stats, xx, model, cfg)
        return l, g

    def loss_and_grad_local(params, stats, xx):
        (l, aux), g = jax.value_and_grad(S.joint_loss, has_aux=True)(
            params, stats, xx, model, cfg, "data")
        # each device's grad = global grad + a deviation that cancels
        # across the axis; pmean recovers the global-batch gradient
        # (make_train_step_fn does the same before the optimizer)
        return l, jax.lax.pmean(g, "data")

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    sharded = jax.jit(shard_map(
        loss_and_grad_local, mesh=mesh,
        in_specs=(P(), P(), P(None, "data")), out_specs=(P(), P()),
        check_vma=False))

    l1, g1 = jax.jit(loss_and_grad_single)(state.params, state.stats, x)
    l2, g2 = sharded(state.params, state.stats, x)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    # compare per-leaf against the leaf's own gradient scale: reduction-order
    # float noise is proportional to the leaf norm, and conv-bias-before-BN
    # leaves have mathematically-zero gradients (pure cancellation noise)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), np.abs(b).max())
        assert np.abs(a - b).max() <= 1e-2 * scale + 5e-3, \
            (np.abs(a - b).max(), scale)

def test_bf16_mixed_precision_loss():
    """cfg.dtype='bfloat16': loss stays f32 and finite; params/grads remain
    f32 masters (the conv compute runs bf16 internally)."""
    cfg = tiny_cfg(dtype="bfloat16")
    model, state, opts = S.init_train_state(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 2, 64, 64, 1))
    (loss, aux), grads = jax.value_and_grad(S.joint_loss, has_aux=True)(
        state.params, state.stats, x, model, cfg)
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
    # loss close to the f32 path (bf16 conv rounding tolerance)
    cfg32 = tiny_cfg()
    loss32, _ = S.joint_loss(state.params, state.stats, x, model, cfg32)
    np.testing.assert_allclose(float(loss), float(loss32), rtol=2e-2)


@pytest.mark.parametrize("backbone", ["dcgan", "vgg"])
def test_grouped_decoder_matches_generic_variant_decode(backbone):
    """decoder_apply_grouped (shared-skip split convs, dcgan.py/vgg.py)
    must reproduce the generic tile+concat+vmap decode — frames AND the
    per-call BN stats the EMA fold consumes."""
    from dvg_tpu.models.dvg import DVGModel

    cfg = DVGConfig(dataset="smmnist", channels=1, image_width=64,
                    batch_size=2, n_past=3, n_future=3, n_eval=8,
                    g_dim=8, rnn_size=16, num_inducing_points=4,
                    model=backbone)
    model = DVGModel(cfg)
    params, stats = model.init(jax.random.PRNGKey(0))
    t = cfg.seq_len_train
    x = jax.random.uniform(jax.random.PRNGKey(1), (t, 2, 64, 64, 1))
    h_all, skips, _ = S.encode_frames(model, params, stats, x)
    latents = jax.random.uniform(jax.random.PRNGKey(2),
                                 (3, t - 1, 2, cfg.g_dim), minval=-1)
    idx = S.skip_index(t, cfg.n_past, False)
    assert len(np.unique(idx)) == cfg.n_past - 1   # the sharing premise

    frames_g, stats_g = S.decode_variants(model, params, stats, latents,
                                          skips, idx)

    # generic path: gathered skips tiled over variants, one vmapped decode
    v, tm1 = 3, t - 1
    skips_sel = [s[jnp.asarray(idx)] for s in skips]
    lat_flat = latents.reshape((v * tm1,) + latents.shape[2:])
    skips_flat = [jnp.broadcast_to(s[None], (v,) + s.shape)
                  .reshape((v * tm1,) + s.shape[1:]) for s in skips_sel]

    def dec(h, *sk):
        return model.decode(params, stats, h, list(sk), train=True)

    frames_ref, per_call_ref = jax.vmap(dec)(lat_flat, *skips_flat)
    frames_ref = frames_ref.reshape((v, tm1) + frames_ref.shape[1:])

    np.testing.assert_allclose(np.asarray(frames_g), np.asarray(frames_ref),
                               rtol=2e-5, atol=2e-6)
    # the per-call BN statistics feed the running-stat EMA fold — compare
    # them leaf-for-leaf against the generic path. decode_variants already
    # folded frames_g's per-call stats, so re-derive the grouped per-call
    # stats directly
    grouped = model.backbone.decoder_apply_grouped
    uniq, inv = np.unique(idx, return_inverse=True)
    skips_u = [s[jnp.asarray(uniq)] for s in skips]
    gi = jnp.asarray(np.tile(inv, v).astype(np.int32))
    _, per_call_g = grouped(params["decoder"], stats["decoder"], lat_flat,
                            skips_u, gi, train=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        per_call_g, per_call_ref)
