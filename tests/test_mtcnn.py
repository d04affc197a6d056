"""MTCNN cascade vs torch oracles (random weights).

The three nets are compared against in-test torch implementations of the
``facenet_pytorch`` architecture (conv/PReLU/ceil-mode-pool wiring, the
Caffe-order dense flatten) through the checkpoint converter; the box utilities
against brute-force references; and the assembled cascade is smoke-run
end-to-end with thresholds at 0 so proposals flow through every stage.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from instantir_tpu.utils.mtcnn import (
    MTCNN,
    MTCNNConfig,
    ONet,
    PNet,
    RNet,
    _resize_area,
    build_detect_fn,
    convert_mtcnn,
    convert_onet,
    convert_pnet,
    convert_rnet,
    nms,
)


# ---------------------------------------------------------------------------
# torch oracles: the facenet_pytorch module layout, written independently here
# ---------------------------------------------------------------------------


class TorchPNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 10, 3)
        self.prelu1 = nn.PReLU(10)
        self.pool1 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(10, 16, 3)
        self.prelu2 = nn.PReLU(16)
        self.conv3 = nn.Conv2d(16, 32, 3)
        self.prelu3 = nn.PReLU(32)
        self.conv4_1 = nn.Conv2d(32, 2, 1)
        self.conv4_2 = nn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.prelu1(self.conv1(x))
        x = self.pool1(x)
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        return self.conv4_2(x), torch.softmax(self.conv4_1(x), dim=1)


class TorchRNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 28, 3)
        self.prelu1 = nn.PReLU(28)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(28, 48, 3)
        self.prelu2 = nn.PReLU(48)
        self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = nn.Conv2d(48, 64, 2)
        self.prelu3 = nn.PReLU(64)
        self.dense4 = nn.Linear(576, 128)
        self.prelu4 = nn.PReLU(128)
        self.dense5_1 = nn.Linear(128, 2)
        self.dense5_2 = nn.Linear(128, 4)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
        x = self.prelu4(self.dense4(x))
        return self.dense5_2(x), torch.softmax(self.dense5_1(x), dim=1)


class TorchONet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(3, 32, 3)
        self.prelu1 = nn.PReLU(32)
        self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = nn.Conv2d(32, 64, 3)
        self.prelu2 = nn.PReLU(64)
        self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = nn.Conv2d(64, 64, 3)
        self.prelu3 = nn.PReLU(64)
        self.pool3 = nn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = nn.Conv2d(64, 128, 2)
        self.prelu4 = nn.PReLU(128)
        self.dense5 = nn.Linear(1152, 256)
        self.prelu5 = nn.PReLU(256)
        self.dense6_1 = nn.Linear(256, 2)
        self.dense6_2 = nn.Linear(256, 4)
        self.dense6_3 = nn.Linear(256, 10)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = x.permute(0, 3, 2, 1).contiguous().view(x.shape[0], -1)
        x = self.prelu5(self.dense5(x))
        return self.dense6_2(x), self.dense6_3(x), torch.softmax(self.dense6_1(x), dim=1)


def _randomized_sd(model, rng):
    sd = model.state_dict()
    for k in sd:
        sd[k] = torch.from_numpy(rng.normal(size=tuple(sd[k].shape)).astype(np.float32) * 0.3)
    model.load_state_dict(sd)
    return {k: v.numpy() for k, v in sd.items()}


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def test_pnet_matches_torch(rng):
    oracle = TorchPNet().eval()
    sd = _randomized_sd(oracle, rng)
    x = rng.uniform(-1, 1, size=(2, 3, 37, 29)).astype(np.float32)  # odd dims hit ceil-mode
    with torch.no_grad():
        reg_t, prob_t = oracle(torch.from_numpy(x))
    reg, prob = PNet().apply(convert_pnet(sd), _nhwc(x))
    np.testing.assert_allclose(np.asarray(reg).transpose(0, 3, 1, 2), reg_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob).transpose(0, 3, 1, 2), prob_t.numpy(), rtol=1e-4, atol=1e-5)


def test_rnet_matches_torch(rng):
    oracle = TorchRNet().eval()
    sd = _randomized_sd(oracle, rng)
    x = rng.uniform(-1, 1, size=(3, 3, 24, 24)).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = oracle(torch.from_numpy(x))
    reg, prob = RNet().apply(convert_rnet(sd), _nhwc(x))
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy(), rtol=1e-4, atol=1e-5)


def test_onet_matches_torch(rng):
    oracle = TorchONet().eval()
    sd = _randomized_sd(oracle, rng)
    x = rng.uniform(-1, 1, size=(3, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        reg_t, pts_t, prob_t = oracle(torch.from_numpy(x))
    reg, pts, prob = ONet().apply(convert_onet(sd), _nhwc(x))
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), pts_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy(), rtol=1e-4, atol=1e-5)


def test_convert_mtcnn_prefixed(rng):
    sd = {}
    for prefix, oracle in (("pnet.", TorchPNet()), ("rnet.", TorchRNet()), ("onet.", TorchONet())):
        sd.update({prefix + k: v for k, v in _randomized_sd(oracle, rng).items()})
    params = convert_mtcnn(sd)
    assert set(params) == {"pnet", "rnet", "onet"}
    reg, prob = PNet().apply(params["pnet"], jnp.zeros((1, 12, 12, 3)))
    assert reg.shape == (1, 1, 1, 4) and prob.shape == (1, 1, 1, 2)


# ---------------------------------------------------------------------------
# box utilities
# ---------------------------------------------------------------------------


def test_nms_brute_force(rng):
    boxes = rng.uniform(0, 80, size=(40, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + rng.uniform(5, 40, size=(40, 2))], axis=1)
    scores = rng.uniform(size=40).astype(np.float32)

    def brute(mode):
        x1, y1, x2, y2 = boxes.T
        area = (x2 - x1 + 1) * (y2 - y1 + 1)
        order = list(np.argsort(-scores))
        keep = []
        while order:
            i = order.pop(0)
            keep.append(i)
            remain = []
            for j in order:
                iw = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]) + 1)
                ih = max(0.0, min(y2[i], y2[j]) - max(y1[i], y1[j]) + 1)
                inter = iw * ih
                denom = min(area[i], area[j]) if mode == "min" else area[i] + area[j] - inter
                if inter / denom <= 0.4:
                    remain.append(j)
            order = remain
        return keep

    for mode in ("union", "min"):
        np.testing.assert_array_equal(nms(boxes, scores, 0.4, mode=mode), brute(mode))


def test_resize_area_matches_torch(rng):
    img = rng.uniform(0, 255, size=(37, 53, 3)).astype(np.float32)
    got = _resize_area(img, 24, 24)
    with torch.no_grad():
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(img.transpose(2, 0, 1))[None], (24, 24)
        )[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# cascade end-to-end
# ---------------------------------------------------------------------------


def test_cascade_smoke_and_detect_fn(rng):
    det = MTCNN({}, MTCNNConfig(min_face_size=20, thresholds=(0.0, 0.0, 0.0)))
    det.params = det.init_params(jax.random.PRNGKey(0))
    img = rng.uniform(0, 255, size=(64, 48, 3)).astype(np.float32)
    boxes, probs, landmarks = det.detect(img)
    assert boxes.shape[1:] == (4,) and landmarks.shape[1:] == (5, 2)
    assert len(boxes) == len(probs) == len(landmarks)
    if len(boxes) > 1:  # select_largest ordering
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        assert np.all(np.diff(areas) <= 1e-3)

    detect_fn = build_detect_fn(det)
    batch = rng.uniform(-1, 1, size=(2, 64, 48, 3)).astype(np.float32)
    lms, invalid = detect_fn(batch)
    assert lms.shape == (2, 5, 2)
    assert all(0 <= i < 2 for i in invalid)


def test_cascade_high_threshold_returns_empty(rng):
    det = MTCNN({}, MTCNNConfig(thresholds=(0.999, 0.999, 0.999)))
    det.params = det.init_params(jax.random.PRNGKey(1))
    boxes, probs, landmarks = det.detect(rng.uniform(0, 255, size=(50, 50, 3)).astype(np.float32))
    # random weights rarely clear 0.999 at every stage; whatever happens the
    # contract (aligned empty-or-not triple) must hold
    assert len(boxes) == len(probs) == len(landmarks)
    lms, invalid = build_detect_fn(det)(rng.uniform(-1, 1, size=(1, 50, 50, 3)).astype(np.float32))
    assert lms.shape == (1, 5, 2)
