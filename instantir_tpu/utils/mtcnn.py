"""MTCNN face detection (P-Net / R-Net / O-Net cascade) for IDLoss.

The reference detects faces with ``facenet_pytorch.MTCNN`` (``losses/losses.py:199-200``,
``mtcnn.forward = mtcnn.detect``) and only consumes the 5-point landmarks
(``utils/utils.py:17-28``). This module provides the full TPU-native
equivalent: the three cascade CNNs in Flax (NHWC) with a converter from the
published ``facenet_pytorch`` checkpoints (``pnet.pt``/``rnet.pt``/``onet.pt``
state dicts, or one dict with ``pnet.``/``rnet.``/``onet.`` prefixes), and the
detection cascade re-derived from the MTCNN paper's published semantics
(image pyramid → dense P-Net proposals → NMS → R-Net refine → O-Net landmarks).

The cascade is host-side numpy by design: it is data-dependent control flow
(variable box counts per stage) over three sub-millisecond networks, run once
per training batch as preprocessing — exactly like the reference's eager
MTCNN pass. The differentiable part of the face path (cp2tform similarity
solve + warp-crop) lives in ``utils/face.py`` and runs under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _prelu(x: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    a = a.astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _max_pool_ceil(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """torch ``MaxPool2d(kernel, stride, ceil_mode=True)`` on NHWC: pad the
    trailing edge with -inf up to the ceil-mode extent, then pool."""
    n, h, w, c = x.shape
    out_h = -(-(h - kernel) // stride) + 1
    out_w = -(-(w - kernel) // stride) + 1
    pad_h = (out_h - 1) * stride + kernel - h
    pad_w = (out_w - 1) * stride + kernel - w
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (kernel, kernel), strides=(stride, stride))


class _PReLUConv(nn.Module):
    features: int
    kernel: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="VALID",
                    dtype=self.dtype, name="conv")(x)
        a = self.param("prelu", nn.initializers.constant(0.25), (self.features,))
        return _prelu(x, a)


class PNet(nn.Module):
    """Proposal net: fully convolutional, 12×12 receptive field, stride 2.
    Input [B,H,W,3] → (bbox reg [B,h,w,4], face prob [B,h,w,2] softmaxed)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _PReLUConv(10, 3, self.dtype, name="layer1")(x)
        x = _max_pool_ceil(x, 2, 2)
        x = _PReLUConv(16, 3, self.dtype, name="layer2")(x)
        x = _PReLUConv(32, 3, self.dtype, name="layer3")(x)
        reg = nn.Conv(4, (1, 1), dtype=self.dtype, name="conv4_2")(x)
        cls = nn.Conv(2, (1, 1), dtype=self.dtype, name="conv4_1")(x)
        return reg, nn.softmax(cls, axis=-1)


def _matlab_flatten(x: jnp.ndarray) -> jnp.ndarray:
    """The checkpoints' Caffe/Matlab-order dense input: flatten (W, H, C)
    fastest-last (torch ``x.permute(0, 3, 2, 1)`` from NCHW then flatten)."""
    n = x.shape[0]
    return x.transpose(0, 2, 1, 3).reshape(n, -1)


class RNet(nn.Module):
    """Refine net on 24² crops → (bbox reg [B,4], face prob [B,2])."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _PReLUConv(28, 3, self.dtype, name="layer1")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = _PReLUConv(48, 3, self.dtype, name="layer2")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = _PReLUConv(64, 2, self.dtype, name="layer3")(x)
        x = nn.Dense(128, dtype=self.dtype, name="dense4")(_matlab_flatten(x))
        x = _prelu(x, self.param("prelu4", nn.initializers.constant(0.25), (128,)))
        reg = nn.Dense(4, dtype=self.dtype, name="dense5_2")(x)
        cls = nn.Dense(2, dtype=self.dtype, name="dense5_1")(x)
        return reg, nn.softmax(cls, axis=-1)


class ONet(nn.Module):
    """Output net on 48² crops → (bbox reg [B,4], landmarks [B,10], prob [B,2])."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _PReLUConv(32, 3, self.dtype, name="layer1")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = _PReLUConv(64, 3, self.dtype, name="layer2")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = _PReLUConv(64, 3, self.dtype, name="layer3")(x)
        x = _max_pool_ceil(x, 2, 2)
        x = _PReLUConv(128, 2, self.dtype, name="layer4")(x)
        x = nn.Dense(256, dtype=self.dtype, name="dense5")(_matlab_flatten(x))
        x = _prelu(x, self.param("prelu5", nn.initializers.constant(0.25), (256,)))
        reg = nn.Dense(4, dtype=self.dtype, name="dense6_2")(x)
        pts = nn.Dense(10, dtype=self.dtype, name="dense6_3")(x)
        cls = nn.Dense(2, dtype=self.dtype, name="dense6_1")(x)
        return reg, pts, nn.softmax(cls, axis=-1)


# ---------------------------------------------------------------------------
# Checkpoint conversion (facenet_pytorch naming)
# ---------------------------------------------------------------------------


def _conv(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    # torch [out, in, kh, kw] → flax [kh, kw, in, out]
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{key}.bias"]}


def _dense(sd: Dict[str, np.ndarray], key: str) -> Dict[str, np.ndarray]:
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T), "bias": sd[f"{key}.bias"]}


def convert_pnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p = {}
    for i in (1, 2, 3):
        p[f"layer{i}"] = {"conv": _conv(sd, f"conv{i}"), "prelu": sd[f"prelu{i}.weight"]}
    p["conv4_1"] = _conv(sd, "conv4_1")
    p["conv4_2"] = _conv(sd, "conv4_2")
    return {"params": p}


def convert_rnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p = {}
    for i in (1, 2, 3):
        p[f"layer{i}"] = {"conv": _conv(sd, f"conv{i}"), "prelu": sd[f"prelu{i}.weight"]}
    p["dense4"] = _dense(sd, "dense4")
    p["prelu4"] = sd["prelu4.weight"]
    p["dense5_1"] = _dense(sd, "dense5_1")
    p["dense5_2"] = _dense(sd, "dense5_2")
    return {"params": p}


def convert_onet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    p = {}
    for i in (1, 2, 3, 4):
        p[f"layer{i}"] = {"conv": _conv(sd, f"conv{i}"), "prelu": sd[f"prelu{i}.weight"]}
    p["dense5"] = _dense(sd, "dense5")
    p["prelu5"] = sd["prelu5.weight"]
    for h in ("dense6_1", "dense6_2", "dense6_3"):
        p[h] = _dense(sd, h)
    return {"params": p}


def convert_mtcnn(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """One flat dict with ``pnet.``/``rnet.``/``onet.`` prefixes → params."""
    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    return {"pnet": convert_pnet(sub("pnet.")), "rnet": convert_rnet(sub("rnet.")),
            "onet": convert_onet(sub("onet."))}


# ---------------------------------------------------------------------------
# Cascade (host-side numpy; data-dependent box counts)
# ---------------------------------------------------------------------------


def nms(boxes: np.ndarray, scores: np.ndarray, threshold: float, mode: str = "union") -> np.ndarray:
    """Greedy non-max suppression; ``mode='min'`` divides the intersection by
    the smaller box area (the cascade's last stage)."""
    if len(boxes) == 0:
        return np.zeros((0,), np.int64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1 + 1) * np.maximum(0.0, yy2 - yy1 + 1)
        if mode == "min":
            iou = inter / np.minimum(area[i], area[order[1:]])
        else:
            iou = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][iou <= threshold]
    return np.asarray(keep, np.int64)


def _resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Adaptive average pooling (= torch ``interpolate(mode='area')`` for
    downscale, the pyramid's resampler). img: [H, W, C] float."""
    h, w, _ = img.shape
    if (h, w) == (out_h, out_w):
        return img

    def pool_axis(x, n_in, n_out, axis):
        starts = (np.arange(n_out) * n_in) // n_out
        ends = -(-(np.arange(1, n_out + 1) * n_in) // n_out)
        cs = np.cumsum(np.moveaxis(x, axis, 0), axis=0, dtype=np.float64)
        cs = np.concatenate([np.zeros_like(cs[:1]), cs], axis=0)
        out = (cs[ends] - cs[starts]) / (ends - starts).reshape((-1,) + (1,) * (x.ndim - 1))
        return np.moveaxis(out, 0, axis)

    return pool_axis(pool_axis(img, h, out_h, 0), w, out_w, 1).astype(np.float32)


def _bbreg(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + reg[:, 0] * w
    out[:, 1] = boxes[:, 1] + reg[:, 1] * h
    out[:, 2] = boxes[:, 2] + reg[:, 2] * w
    out[:, 3] = boxes[:, 3] + reg[:, 3] * h
    return out


def _rerec(boxes: np.ndarray) -> np.ndarray:
    """Square each box around its center (the cascade crops squares)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + w * 0.5 - side * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def _crop_resize(img: np.ndarray, boxes: np.ndarray, size: int) -> np.ndarray:
    """Zero-padded square crops area-resized to size². img [H,W,3] 0..255."""
    h, w, _ = img.shape
    out = np.zeros((len(boxes), size, size, 3), np.float32)
    for i, (x1, y1, x2, y2) in enumerate(boxes[:, :4].astype(np.int64)):
        cw, ch = x2 - x1 + 1, y2 - y1 + 1
        if cw <= 0 or ch <= 0:  # degenerate regressed box → zero crop
            continue
        patch = np.zeros((ch, cw, 3), np.float32)
        sx1, sy1 = max(x1, 0), max(y1, 0)
        sx2, sy2 = min(x2 + 1, w), min(y2 + 1, h)
        if sx2 > sx1 and sy2 > sy1:
            patch[sy1 - y1:sy2 - y1, sx1 - x1:sx2 - x1] = img[sy1:sy2, sx1:sx2]
        out[i] = _resize_area(patch, size, size)
    return out


def _norm(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray((x - 127.5) * 0.0078125, jnp.float32)


@dataclasses.dataclass(frozen=True)
class MTCNNConfig:
    min_face_size: int = 20
    thresholds: Tuple[float, float, float] = (0.6, 0.7, 0.7)
    factor: float = 0.709  # pyramid scale step (√0.5)


class MTCNN:
    """The assembled detector. ``params`` = {"pnet", "rnet", "onet"} trees
    (from ``convert_mtcnn`` or fresh ``init``)."""

    def __init__(self, params: Dict[str, Any], config: MTCNNConfig = MTCNNConfig()):
        self.params = params
        self.config = config
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()

    def _stage1(self, img: np.ndarray) -> np.ndarray:
        h, w, _ = img.shape
        cfg = self.config
        m = 12.0 / cfg.min_face_size
        scale, minl = m, min(h, w) * m
        all_boxes: List[np.ndarray] = []
        while minl >= 12:
            hs, ws = int(h * scale + 1), int(w * scale + 1)
            reg, prob = self.pnet.apply(self.params["pnet"], _norm(_resize_area(img, hs, ws))[None])
            reg, score = np.asarray(reg[0]), np.asarray(prob[0, :, :, 1])
            ys, xs = np.nonzero(score >= cfg.thresholds[0])
            if len(ys):
                stride, cell = 2, 12
                q1 = np.stack([(stride * xs + 1), (stride * ys + 1)], axis=1) / scale
                q2 = np.stack([(stride * xs + cell), (stride * ys + cell)], axis=1) / scale
                boxes = np.concatenate(
                    [q1, q2, score[ys, xs, None], reg[ys, xs]], axis=1).astype(np.float32)
                boxes = boxes[nms(boxes[:, :4], boxes[:, 4], 0.5)]
                all_boxes.append(boxes)
            scale *= cfg.factor
            minl *= cfg.factor
        if not all_boxes:
            return np.zeros((0, 9), np.float32)
        boxes = np.concatenate(all_boxes, axis=0)
        boxes = boxes[nms(boxes[:, :4], boxes[:, 4], 0.7)]
        boxes[:, :4] = _rerec(_bbreg(boxes[:, :4], boxes[:, 5:9]))
        return boxes

    def detect(self, img: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """img: [H, W, 3] uint8/float 0..255 → (boxes [N,4], probs [N],
        landmarks [N,5,2] xy), sorted largest-area first (the reference's
        ``select_largest`` ordering)."""
        img = np.asarray(img, np.float32)
        cfg = self.config
        boxes = self._stage1(img)
        empty = (np.zeros((0, 4), np.float32), np.zeros((0,), np.float32),
                 np.zeros((0, 5, 2), np.float32))
        if not len(boxes):
            return empty

        reg, prob = self.rnet.apply(self.params["rnet"], _norm(_crop_resize(img, boxes, 24)))
        reg, score = np.asarray(reg), np.asarray(prob[:, 1])
        keep = score >= cfg.thresholds[1]
        boxes, reg, score = boxes[keep], reg[keep], score[keep]
        if not len(boxes):
            return empty
        keep = nms(boxes[:, :4], score, 0.7)
        boxes, reg, score = boxes[keep], reg[keep], score[keep]
        boxes[:, :4] = _rerec(_bbreg(boxes[:, :4], reg))

        reg, pts, prob = self.onet.apply(self.params["onet"], _norm(_crop_resize(img, boxes, 48)))
        reg, pts, score = np.asarray(reg), np.asarray(pts), np.asarray(prob[:, 1])
        w = boxes[:, 2] - boxes[:, 0] + 1
        h = boxes[:, 3] - boxes[:, 1] + 1
        lm_x = w[:, None] * pts[:, 0:5] + boxes[:, 0:1] - 1
        lm_y = h[:, None] * pts[:, 5:10] + boxes[:, 1:2] - 1
        landmarks = np.stack([lm_x, lm_y], axis=-1)
        keep = score >= cfg.thresholds[2]
        boxes, score, landmarks = boxes[keep], score[keep], landmarks[keep]
        if not len(boxes):
            return empty
        boxes[:, :4] = _bbreg(boxes[:, :4], reg[keep])
        keep = nms(boxes[:, :4], score, 0.7, mode="min")
        boxes, score, landmarks = boxes[keep, :4], score[keep], landmarks[keep]
        order = np.argsort(-(boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
        return boxes[order], score[order], landmarks[order]

    def init_params(self, key) -> Dict[str, Any]:
        """Fresh (random) parameter trees with the checkpoint shapes."""
        import jax

        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "pnet": self.pnet.init(k1, jnp.zeros((1, 12, 12, 3))),
            "rnet": self.rnet.init(k2, jnp.zeros((1, 24, 24, 3))),
            "onet": self.onet.init(k3, jnp.zeros((1, 48, 48, 3))),
        }


def load_mtcnn(weights_path: str, config: MTCNNConfig = MTCNNConfig()) -> MTCNN:
    from instantir_tpu.convert.torch_to_flax import load_torch_state_dict

    return MTCNN(convert_mtcnn(load_torch_state_dict(weights_path)), config)


def build_detect_fn(mtcnn: MTCNN):
    """IDLoss ``detect_fn`` contract: [B,H,W,3] images in [-1,1] →
    (landmarks [B,5,2] float32, invalid_indices list). Per-image host loop,
    strongest face per image (reference ``detect_face`` ``utils/utils.py:17-28``
    takes ``landmarks[0]``)."""

    def detect_fn(images) -> Tuple[np.ndarray, List[int]]:
        arr = np.asarray(images, np.float32)
        arr = (arr * 0.5 + 0.5) * 255.0
        lms, invalid = [], []
        for i, img in enumerate(arr):
            _, _, landmarks = mtcnn.detect(img)
            if len(landmarks) == 0:
                invalid.append(i)
                lms.append(np.zeros((5, 2), np.float32))
            else:
                lms.append(landmarks[0].astype(np.float32))
        return np.stack(lms), invalid

    return detect_fn
