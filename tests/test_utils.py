"""Visualization + logging utilities (reference utils.py:104-199 contracts)
and CLI flag surface."""

import json
import os

import numpy as np

from dvg_tpu.utils.viz import (add_border, draw_text_on, image_grid,
                               save_gif, save_gif_with_text, save_image)
from dvg_tpu.utils.logging import MetricLogger


def test_image_grid_layouts():
    """Reference image_tensor orientation (utils.py:104-154): a flat list
    concatenates HORIZONTALLY; a list of lists stacks rows VERTICALLY;
    gutters are `padding` px of WHITE (torch.ones), default padding=1."""
    img = np.ones((8, 8, 3), np.float32) * 0.5
    flat = image_grid([img, img], padding=2)        # horizontal strip
    assert flat.shape == (8, 18, 3)
    assert float(flat[0, 8, 0]) == 1.0              # white gutter
    # padding applies at the OUTER level only; nested rows are composed
    # with the reference's default padding=1 (utils.py:110 recurses with
    # no padding argument): rows are 8+1+8=17 wide, stacked 8+2+8=18 tall
    grid = image_grid([[img, img], [img, img]], padding=2)
    assert grid.shape == (18, 17, 3)                # 2 rows x 2 cols
    assert image_grid([img, img]).shape == (8, 17, 3)   # default padding=1
    gray = image_grid(np.ones((8, 8), np.float32))
    assert gray.shape == (8, 8, 3)


def test_add_border_shapes_and_colors():
    img = np.zeros((16, 16, 1), np.float32)
    red = add_border(img, "red")
    green = add_border(img, "green")
    assert red.shape == (16 + 2 + 30, 16 + 2, 3)
    assert red[0, 0, 0] == np.float32(0.7) and red[0, 0, 1] == 0
    assert green[0, 0, 1] == np.float32(0.7) and green[0, 0, 0] == 0


def test_writers(tmp_path):
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    save_image(str(tmp_path / "a.png"), [[img, img]])
    save_gif(str(tmp_path / "a.gif"), [img, img, img])
    save_gif_with_text(str(tmp_path / "b.gif"),
                       [[img, img]] * 3, [["a", "b"]] * 3)
    for f in ("a.png", "a.gif", "b.gif"):
        assert (tmp_path / f).stat().st_size > 0
    # captions draw INTO the tile's 30-px bottom strip in black
    # (reference draw_text_tensor at (4, 64) on 96-px bordered tiles)
    tile = add_border(np.ones((64, 64, 1), np.float32), "green")
    cap = draw_text_on(tile, "hello")
    assert cap.shape == tile.shape                       # no extra strip
    strip_before = tile[-30:]
    strip_after = cap[-30:]
    assert (strip_after < strip_before).any()            # black text drawn
    assert np.allclose(cap[:8], tile[:8], atol=1/255)    # top untouched


def test_save_gif_keeps_inner_row_gutters(tmp_path):
    """save_gif's padding=0 removes only the OUTER gutters: nested rows
    keep the default 1-px white inner gutters, like the reference's
    image_tensor recursion (utils.py:110 recurses with default padding)."""
    img = np.zeros((8, 8, 3), np.float32)
    frame = image_grid([[img, img, img]], padding=0)   # one 3-tile row
    assert frame.shape == (8, 3 * 8 + 2, 3)            # 2 inner gutters
    assert frame[:, 8, :].min() == 1.0                  # white gutter
    # flat list at padding=0: no gutters at the applied level
    flat = image_grid([img, img], padding=0)
    assert flat.shape == (8, 16, 3)
    # stacked ndarray batch accepted as a flat list
    batch = image_grid(np.zeros((4, 8, 8, 3), np.float32))
    assert batch.shape == (8, 4 * 8 + 3, 3)


def test_metric_logger(tmp_path):
    lg = MetricLogger(str(tmp_path), echo=False)
    lg.log(1, {"loss": 2.0, "note": "x"})
    lg.log(2, {"loss": 1.5}, kind="eval")
    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert recs[0]["loss"] == 2.0 and recs[1]["kind"] == "eval"
    p = lg.save_arrays("arrs", a=np.ones((2, 2)))
    assert np.load(p)["a"].sum() == 4


def test_cli_flag_surface():
    """Both CLIs accept the reference's full flag set; --model/--image_width
    are honored for real (dead in the reference, SURVEY.md §5.6)."""
    from dvg_tpu.cli.train import build_parser as train_parser
    from dvg_tpu.cli.generate import build_parser as gen_parser
    from dvg_tpu.config import DVGConfig

    a = train_parser().parse_args([
        "--dataset", "bair", "--model", "vgg", "--image_width", "128",
        "--channels", "3", "--n_past", "2", "--n_future", "28",
        "--batch_size", "7", "--lr", "0.001", "--no_ft"])
    cfg = DVGConfig(**{k: v for k, v in vars(a).items()
                       if k in DVGConfig.__dataclass_fields__})
    assert (cfg.model, cfg.image_width, cfg.ft) == ("vgg", 128, False)
    from dvg_tpu.models.registry import get_backbone
    assert get_backbone(cfg.model, cfg.image_width).num_skips == 5

    g = gen_parser().parse_args(["--model_dir", "/x", "--gp_trigger_flag"])
    assert g.gp_trigger_flag is True and g.nsample == 100


def test_step_timer_and_trace_context(tmp_path):
    """Profiling hooks (SURVEY.md §5.1 — the reference has none): timer
    warmup/means and the trace_context no-op + real-trace paths."""
    import os
    import time as _time

    import jax.numpy as jnp

    from dvg_tpu.utils.profiling import StepTimer, trace_context

    t = StepTimer(warmup=1)
    for _ in range(3):
        t.start()
        _time.sleep(0.01)
        t.stop(jnp.ones(()))
    assert len(t.times) == 2          # warmup step excluded
    assert t.mean >= 0.01 and t.best >= 0.01

    with trace_context(None):         # no-op path
        pass
    d = str(tmp_path / "trace")
    with trace_context(d):
        jnp.sum(jnp.arange(8)).block_until_ready()
    assert os.path.isdir(d)           # trace dump written


def test_sync_fence_spans_multiple_programs():
    """sync_fence must depend on EVERY leaf: a (live, artifact) tuple spans
    two dispatched programs, and fencing only the first leaf would let the
    second program's work bleed into the next timing window on tunneled
    platforms (bench.py's serve block). Also: mixed dtypes must combine."""
    import jax
    import jax.numpy as jnp

    from dvg_tpu.utils.profiling import sync_fence

    a = jnp.ones((4, 3)) * 2.0
    b = (jnp.arange(6, dtype=jnp.bfloat16), jnp.zeros((2,), jnp.int32))
    out = sync_fence((a, b))
    assert out[0] is a and out[1] is b        # passthrough, not a copy
    single = sync_fence(a)                    # 1-leaf fast path
    assert single is a
