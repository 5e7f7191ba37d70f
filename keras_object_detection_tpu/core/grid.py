"""SxS grid-target encoding and decoding (parity targets:
ref yolo_v1/dataset.py:88-112 ``_get_labels`` and ref utils.py:152-277
``decode_predictions`` / ``decode_predictions_numpy``).

Both directions are fixed-shape, fully vectorized ``jnp`` — no Python loops,
no ``TensorArray`` analogues — so they fuse under ``jit`` and run on-device
(the reference encodes labels on the host in Python and decodes with
graph-looped TF).

Cell layout along the last axis (depth ``C + 5*B``):
``[class one-hot (C)] [conf_0, x, y, w, h] [conf_1, x, y, w, h] ...``
where ``x = S*cx - col`` and ``y = S*cy - row`` are cell-relative offsets.
Only box slot 0 is ever populated by the encoder (ref dataset.py:109 writes a
single slot; slot 1 stays zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def encode_grid(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
    num_boxes: int = 2,
    grid: int = 7,
) -> jnp.ndarray:
    """Encode padded YOLO boxes into an ``(S, S, C + 5B)`` target grid.

    Args:
      boxes: ``(N, 5)`` float array of ``[cx, cy, w, h, class_id]`` in image
        ratios (YOLO txt format), padded to a static ``N``.
      valid: ``(N,)`` bool/0-1 mask of real (non-padding) rows.
      num_classes: C.
      num_boxes: B (only slot 0 is written, matching the reference).
      grid: S.

    First-box-wins semantics (ref dataset.py:107): if two valid boxes land in
    the same cell, the earlier row in ``boxes`` claims the cell. Implemented
    as a ``segment_min`` over box indices keyed by flat cell id — a single
    scatter-min instead of the reference's sequential Python loop.
    """
    n = boxes.shape[0]
    depth = num_classes + 5 * num_boxes
    valid = valid.astype(bool)

    cx, cy = boxes[:, 0], boxes[:, 1]
    # Cell coordinates: int() truncation in the reference equals floor for
    # coords in [0, 1); clip guards the degenerate cx == 1.0 edge.
    col = jnp.clip(jnp.floor(grid * cx).astype(jnp.int32), 0, grid - 1)
    row = jnp.clip(jnp.floor(grid * cy).astype(jnp.int32), 0, grid - 1)
    cell = row * grid + col  # (N,) flat cell id

    # Winner per cell = smallest box index among valid boxes in that cell.
    box_idx = jnp.arange(n, dtype=jnp.int32)
    seg_ids = jnp.where(valid, cell, grid * grid)  # park padding out of range
    winner = jax.ops.segment_min(
        box_idx, seg_ids, num_segments=grid * grid + 1, indices_are_sorted=False
    )[: grid * grid]
    has_box = winner < n  # (S*S,) cells that received a box
    winner = jnp.where(has_box, winner, 0)

    wboxes = boxes[winner]  # (S*S, 5) winning box per cell (garbage if empty)
    wcx, wcy, ww, wh = wboxes[:, 0], wboxes[:, 1], wboxes[:, 2], wboxes[:, 3]
    wcls = wboxes[:, 4].astype(jnp.int32)

    cell_col = jnp.arange(grid * grid, dtype=jnp.int32) % grid
    cell_row = jnp.arange(grid * grid, dtype=jnp.int32) // grid
    x_off = grid * wcx - cell_col.astype(wcx.dtype)
    y_off = grid * wcy - cell_row.astype(wcy.dtype)

    fmask = has_box.astype(boxes.dtype)[:, None]
    class_part = jax.nn.one_hot(wcls, num_classes, dtype=boxes.dtype) * fmask
    box_part = jnp.stack([x_off, y_off, ww, wh], axis=-1) * fmask
    conf_part = fmask

    out = jnp.zeros((grid * grid, depth), dtype=boxes.dtype)
    out = out.at[:, :num_classes].set(class_part)
    out = out.at[:, num_classes : num_classes + 1].set(conf_part)
    out = out.at[:, num_classes + 1 : num_classes + 5].set(box_part)
    return out.reshape(grid, grid, depth)


def decode_grid(
    predictions: jnp.ndarray,
    num_classes: int,
    num_boxes: int = 2,
    grid: int = 7,
) -> jnp.ndarray:
    """Decode ``(batch, S, S, C + 5B)`` model output to ``(batch, S*S, 6)``
    boxes ``[class_idx, confidence, cx, cy, w, h]`` in image ratios.

    Parity twin of ref utils.py:152-218: per cell, class = argmax over the C
    class logits; the reported box/confidence come from the box slot with the
    highest confidence (argmax ties break to the lower slot index, same as
    ``tf.argmax``); cell offsets convert back via ``cx = (x + col) / S``.
    Fully vectorized — the reference's ``TensorArray`` loop over B becomes a
    reshape + ``take_along_axis``.
    """
    p = predictions
    b = p.shape[0]

    class_idx = jnp.argmax(p[..., :num_classes], axis=-1).astype(p.dtype)  # (b,S,S)

    rest = p[..., num_classes:].reshape(b, grid, grid, num_boxes, 5)
    confs = rest[..., 0]  # (b,S,S,B)
    best = jnp.argmax(confs, axis=-1)  # (b,S,S) first-max tie-break
    onehot = jax.nn.one_hot(best, num_boxes, dtype=p.dtype)  # (b,S,S,B)
    # Multiply-sum selection mirrors the reference's one-hot accumulation
    # (ref utils.py:189-197) for exact arithmetic parity.
    best_conf = jnp.sum(onehot * confs, axis=-1)  # (b,S,S)
    best_box = jnp.sum(onehot[..., None] * rest[..., 1:5], axis=-2)  # (b,S,S,4)

    cols = jnp.arange(grid, dtype=p.dtype)[None, None, :]  # (1,1,S)
    rows = jnp.arange(grid, dtype=p.dtype)[None, :, None]  # (1,S,1)
    cx = (best_box[..., 0] + cols) / grid
    cy = (best_box[..., 1] + rows) / grid

    out = jnp.stack([class_idx, best_conf, cx, cy, best_box[..., 2], best_box[..., 3]], axis=-1)
    return out.reshape(b, grid * grid, 6)
