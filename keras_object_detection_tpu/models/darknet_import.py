"""Original Darknet ``.weights`` import/export for the DarknetBackbone.

Net-new migration capability (no reference counterpart — the reference's
only pretrained path is Keras ``weights='imagenet'`` for VGG16, ref
model.py:178; models/pretrained.py covers that). This module reads the
binary format produced by pjreddie/AlexeyAB darknet — the distribution
format of the official YOLOv2/v3 pretrained backbones (``darknet19.conv.23``,
``darknet53.conv.74``) — directly into the flax parameter tree, so a user
migrating from darknet can start from the paper's ImageNet weights.

Format (darknet src/parser.c ``save_weights_upto`` / ``load_weights_upto``):

- header: int32 major, int32 minor, int32 revision, then ``seen`` (images
  trained on) as int64 when ``major*10 + minor >= 2`` else int32,
- per convolutional layer, in network order:
  - with batch_normalize: beta[n], gamma[n], rolling_mean[n],
    rolling_var[n], conv weights[n*c*k*k] in (out, in, kh, kw) order,
  - without: bias[n], conv weights — (our ConvBlocks always carry BN),
  all little-endian float32.

Two semantic gaps are folded exactly rather than approximated:

- **epsilon**: darknet normalizes with eps=1e-5, our Keras-style BN with
  1e-3 (models/layers.py ConvBlock). On load the BN scale is rescaled by
  ``sqrt((var + ours) / (var + theirs))`` so the eval-mode normalizer
  ``scale / sqrt(var + eps)`` is bit-for-bit the same function; on save the
  inverse rescale is applied.
- **conv bias**: darknet BN convs have none, ours do (use_bias=True). On
  load the bias is zeroed; on save it is folded into the rolling mean
  (``mean - bias`` — a conv bias shifts the BN input, which is exactly a
  mean shift), so save -> load round-trips to the identical function.

Partial files (darknet's ``.conv.NN`` backbone prefixes) load the first NN
conv layers and leave the rest at their initialization, mirroring
darknet's own partial loading; ``strict=True`` demands an exact-length file.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

HEADER_MAJOR, HEADER_MINOR, HEADER_REVISION = 0, 2, 0


def _find_backbone_key(params: Dict[str, Any]) -> str:
    keys = [k for k in params if k.startswith("DarknetBackbone")]
    if len(keys) != 1:
        raise ValueError(
            f"expected exactly one DarknetBackbone subtree, found {keys}; "
            "pass backbone_key explicitly")
    return keys[0]


def _conv_blocks(tree: Dict[str, Any]) -> list:
    """ConvBlock_i keys in network order (flax auto-naming is call order)."""
    keys = [k for k in tree if k.startswith("ConvBlock_")]
    return sorted(keys, key=lambda k: int(k.split("_")[-1]))


class _Reader:
    def __init__(self, buf: bytes, offset: int):
        self.buf, self.off = buf, offset

    def remaining(self) -> int:
        return len(self.buf) - self.off

    def floats(self, n: int) -> np.ndarray:
        end = self.off + 4 * n
        if end > len(self.buf):
            raise EOFError(f"need {4 * n} bytes, have {self.remaining()}")
        out = np.frombuffer(self.buf, dtype="<f4", count=n, offset=self.off)
        self.off = end
        return out


def load_darknet_backbone(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weights_path: str,
    *,
    backbone_key: Optional[str] = None,
    strict: bool = False,
    bn_eps: float = 1e-3,
    darknet_eps: float = 1e-5,
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Load a darknet ``.weights`` / ``.conv.NN`` file into the backbone
    subtree of ``params`` / ``batch_stats``. Returns new trees (inputs are
    not mutated) plus an info dict (``loaded_convs``, ``total_convs``,
    ``seen``, ``leftover_bytes``)."""
    key = backbone_key or _find_backbone_key(params)
    with open(weights_path, "rb") as f:
        buf = f.read()
    if len(buf) < 12:
        raise ValueError(f"{weights_path}: too short for a darknet header")
    major, minor, revision = struct.unpack_from("<3i", buf, 0)
    if not (0 <= major <= 1000 and 0 <= minor <= 1000):
        raise ValueError(
            f"{weights_path}: implausible header version {major}.{minor} — "
            "not a darknet weights file?")
    if major * 10 + minor >= 2:
        (seen,) = struct.unpack_from("<q", buf, 12)
        rd = _Reader(buf, 20)
    else:
        (seen,) = struct.unpack_from("<i", buf, 12)
        rd = _Reader(buf, 16)

    new_params = {k: dict(v) if k == key else v for k, v in params.items()}
    new_stats = {k: dict(v) if k == key else v
                 for k, v in batch_stats.items()}
    blocks = _conv_blocks(params[key])
    loaded = 0
    for blk in blocks:
        kshape = np.shape(params[key][blk]["Conv_0"]["kernel"])
        kh, kw, cin, cout = kshape
        need = 4 * cout + kh * kw * cin * cout
        if rd.remaining() < 4 * need:
            if strict:
                raise EOFError(
                    f"{weights_path}: file ends inside/before {blk} "
                    f"(loaded {loaded}/{len(blocks)} convs)")
            if rd.remaining() != 0:
                raise ValueError(
                    f"{weights_path}: {rd.remaining()} trailing bytes do "
                    f"not align with {blk}'s {4 * need}-byte record — "
                    "architecture mismatch?")
            break
        beta = rd.floats(cout).copy()
        gamma = rd.floats(cout).copy()
        mean = rd.floats(cout).copy()
        var = rd.floats(cout).copy()
        w = rd.floats(kh * kw * cin * cout).reshape(cout, cin, kh, kw)
        # exact eps fold: scale/sqrt(var+ours) == gamma/sqrt(var+theirs)
        gamma = gamma * np.sqrt((var + bn_eps) / (var + darknet_eps))
        new_params[key][blk] = {
            "Conv_0": {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "bias": jnp.zeros((cout,), jnp.float32),
            },
            "BatchNorm_0": {
                "scale": jnp.asarray(gamma),
                "bias": jnp.asarray(beta),
            },
        }
        new_stats[key][blk] = {
            "BatchNorm_0": {
                "mean": jnp.asarray(mean),
                "var": jnp.asarray(var),
            },
        }
        loaded += 1
    leftover = rd.remaining()
    if leftover and loaded == len(blocks):
        raise ValueError(
            f"{weights_path}: {leftover} bytes remain after all "
            f"{len(blocks)} backbone convs — the file holds a bigger "
            "network (head layers?); expected a backbone-prefix "
            "(.conv.NN) file")
    info = {"loaded_convs": loaded, "total_convs": len(blocks),
            "seen": int(seen), "leftover_bytes": leftover,
            "version": f"{major}.{minor}.{revision}",
            "backbone_key": key}
    return new_params, new_stats, info


def save_darknet_backbone(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weights_path: str,
    *,
    backbone_key: Optional[str] = None,
    num_convs: Optional[int] = None,
    seen: int = 0,
    bn_eps: float = 1e-3,
    darknet_eps: float = 1e-5,
) -> Dict[str, Any]:
    """Write the backbone (or its first ``num_convs`` convs — darknet's
    ``.conv.NN`` convention) as a darknet ``.weights`` file. The conv bias
    is folded into the rolling mean and the BN-eps rescale inverted, so
    ``save -> load`` reproduces the identical eval-mode function."""
    key = backbone_key or _find_backbone_key(params)
    blocks = _conv_blocks(params[key])
    if num_convs is not None:
        blocks = blocks[:num_convs]
    out = [struct.pack("<3iq", HEADER_MAJOR, HEADER_MINOR, HEADER_REVISION,
                       seen)]
    for blk in blocks:
        conv = params[key][blk]["Conv_0"]
        bn = params[key][blk]["BatchNorm_0"]
        st = batch_stats[key][blk]["BatchNorm_0"]
        gamma = np.asarray(bn["scale"], np.float32)
        beta = np.asarray(bn["bias"], np.float32)
        mean = np.asarray(st["mean"], np.float32)
        var = np.asarray(st["var"], np.float32)
        bias = np.asarray(conv["bias"], np.float32)
        kern = np.asarray(conv["kernel"], np.float32)  # (kh, kw, in, out)
        gamma = gamma * np.sqrt((var + darknet_eps) / (var + bn_eps))
        mean = mean - bias  # fold conv bias (a BN-input shift) into mean
        out.append(beta.tobytes())
        out.append(gamma.tobytes())
        out.append(mean.tobytes())
        out.append(var.tobytes())
        out.append(np.ascontiguousarray(
            kern.transpose(3, 2, 0, 1)).tobytes())
    with open(weights_path, "wb") as f:
        f.write(b"".join(out))
    return {"saved_convs": len(blocks), "backbone_key": key,
            "bytes": sum(len(b) for b in out)}
