"""Visualization: tensor-grid compositing, PNG/GIF writers, annotations.

Host-side numpy + PIL/imageio equivalents of /root/reference/utils.py:
  * `image_grid`       — `image_tensor` (utils.py:104-154): nested lists of
    (H, W, C) images → one tiled image with `padding` white gutters
    (nested lists stack vertically as rows, flat lists concatenate
    horizontally — the reference's orientation).
  * `save_image`       — `save_tensors_image`/`make_image` (utils.py:186-199).
  * `save_gif`         — utils.py:156-165 (imageio mimsave, duration arg).
  * `save_gif_with_text` — utils.py:167-184: captions drawn INTO each
    tile's 30-px bottom strip (black, reference draw_text_tensor), tiles
    concatenated with no outer gutters.
  * `add_border`       — generate_frames.py:306-319: pad a frame inside a
    red ('red') or green ('green') 0.7-intensity border, with a 30-px tail
    strip for the caption area.

All functions take float arrays in [0, 1], channel-last (H, W, C) or
(H, W) — the framework's native layout (the reference is CHW torch)."""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np


def _to_hwc(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img


def image_grid(inputs, padding: int = 1) -> np.ndarray:
    """Nested lists of images → tiled (H, W, 3) image.

    The recursive contract of the reference's `image_tensor`
    (utils.py:104-154): a list of LISTS stacks its sub-grids VERTICALLY
    (one grid row per entry, utils.py:121-127 concatenates along the
    height axis), while a flat list of images concatenates HORIZONTALLY
    (utils.py:143-149, the width axis). Gutters are `padding` px WHITE
    (`torch.ones`), default padding=1 like the reference.

    `padding` applies to THIS level only: nested sub-grids are composed
    with the default padding=1, exactly like the reference's recursion
    (utils.py:110 calls `image_tensor(x)` with no padding argument) — so
    `save_gif`'s padding=0 removes only the outer gutters while rows keep
    their 1-px inner gutters.

    A stacked (N, H, W, C) ndarray batch is accepted as a flat list."""
    if isinstance(inputs, np.ndarray) and inputs.ndim == 4:
        inputs = list(inputs)
    if isinstance(inputs, (list, tuple)):
        tiles = [image_grid(e) for e in inputs]
        h = max(t.shape[0] for t in tiles)
        w = max(t.shape[1] for t in tiles)
        tiles = [_pad_to(t, h, w) for t in tiles]
        # list-of-lists → this level stacks sub-grids vertically (rows);
        # a flat list of images concatenates horizontally
        vert = (isinstance(inputs[0], (list, tuple))
                or (isinstance(inputs[0], np.ndarray)
                    and inputs[0].ndim == 4))
        axis = 0 if vert else 1
        gut_shape = ((padding, w, 3) if vert else (h, padding, 3))
        gutter = np.ones(gut_shape, np.float32)
        out: List[np.ndarray] = []
        for i, t in enumerate(tiles):
            if i:
                out.append(gutter)
            out.append(t)
        return np.concatenate(out, axis=axis)
    return _to_hwc(inputs)


def _pad_to(img: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = h - img.shape[0], w - img.shape[1]
    return np.pad(img, ((0, ph), (0, pw), (0, 0)))


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_image(path: str, grid) -> None:
    """Reference save_tensors_image (utils.py:197-199): padding=1."""
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, _to_uint8(image_grid(grid, padding=1)))


def save_gif(path: str, frames: Sequence, duration: float = 0.25) -> None:
    """frames: sequence over time; each entry is an image or a nested grid
    (reference save_gif, utils.py:175-182: image_tensor(..., padding=0) —
    GIF frames carry no gutters)."""
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [_to_uint8(image_grid(f, padding=0)) for f in frames]
    imageio.mimsave(path, imgs, duration=duration, loop=0)


def draw_text_on(img: np.ndarray, text: str) -> np.ndarray:
    """Draw caption text INTO an (H, W, C) float tile in black
    (reference draw_text_tensor, utils.py:168-175: uint8 roundtrip through
    PIL, text at (4, 64) on the 96-px 64-width tiles — i.e. the top of
    `add_border`'s 30-px bottom strip; generalized as (4, H-32) so larger
    image widths keep the caption in the strip rather than mid-frame)."""
    from PIL import Image, ImageDraw
    img = _to_hwc(np.asarray(img))
    pil = Image.fromarray(np.uint8(img * 255))
    d = ImageDraw.Draw(pil)
    d.text((4, img.shape[0] - 32), text, fill=(0, 0, 0))
    return np.asarray(pil, np.float32) / 255.0


def save_gif_with_text(path: str, gifs: Sequence[Sequence],
                       texts: Sequence[Sequence[str]],
                       duration: float = 0.25) -> None:
    """gifs[t][k] = image, texts[t][k] = caption. Per frame, each caption
    is drawn INTO its tile's bottom strip and the tiles concatenate
    horizontally with no gutters (reference save_gif_with_text,
    utils.py:181-188: image_tensor(draw_text_tensor(...), padding=0))."""
    frames = []
    for row_imgs, row_txts in zip(gifs, texts):
        tiles = [draw_text_on(img, txt)
                 for img, txt in zip(row_imgs, row_txts)]
        frames.append(np.concatenate(tiles, axis=1))
    import imageio.v2 as imageio
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, [_to_uint8(f) for f in frames], duration=duration,
                    loop=0)


def add_border(img: np.ndarray, color: str, pad: int = 1) -> np.ndarray:
    """Pad an (H, W, C) frame inside a colored border + 30-px bottom strip
    (reference add_border, generate_frames.py:306-319: red/green at 0.7)."""
    img = _to_hwc(np.asarray(img))
    h, w = img.shape[:2]
    out = np.zeros((h + 2 * pad + 30, w + 2 * pad, 3), np.float32)
    if color == "red":
        out[..., 0] = 0.7
    elif color == "green":
        out[..., 1] = 0.7
    out[pad:h + pad, pad:w + pad, :] = img
    return out
