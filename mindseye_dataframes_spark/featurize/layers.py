"""Minimal numpy layer calculus — the MLP + loss graph surface the
reference builds from MindsEye layers (`Trainer.scala:150-168`):
``[FC, Bias, ReLU] ×2 → FC → Bias → Softmax`` with entropy loss and
batch-mean reduction (M5). Forward/backward run inside Arrow-batched
``mapInPandas`` on executors; parameters live in the broadcast
ModelContext and gradients are returned keyed by param id.

Each layer is a spec (no state): ``forward(params, x) -> (y, cache)``
and ``backward(params, grad_y, cache) -> (grad_x, {key: grad})``.
Parameter init is deterministic via the HMAC-seed scheme (F5).
"""

from __future__ import annotations

import numpy as np

from mindseye_dataframes_spark.functions.hashing import seeded_unit_rms_tensor


class Layer:
    def param_shapes(self) -> dict[str, tuple[int, ...]]:
        return {}

    def init_params(self) -> dict[str, np.ndarray]:
        out = {}
        for key, shape in self.param_shapes().items():
            n = int(np.prod(shape))
            out[key] = (seeded_unit_rms_tensor(key, n) / np.sqrt(shape[0])).reshape(shape)
        return out

    def forward(self, params, x):
        raise NotImplementedError

    def backward(self, params, grad_y, cache):
        raise NotImplementedError


class Dense(Layer):
    """FullyConnected + Bias (reference pairs them; fused here)."""

    def __init__(self, name: str, d_in: int, d_out: int):
        self.w_key = f"layer/{name}/W"
        self.b_key = f"layer/{name}/b"
        self.d_in, self.d_out = d_in, d_out

    def param_shapes(self):
        return {self.w_key: (self.d_in, self.d_out), self.b_key: (1, self.d_out)}

    def init_params(self):
        out = super().init_params()
        out[self.b_key] = np.zeros((1, self.d_out))
        return out

    def forward(self, params, x):
        return x @ params[self.w_key] + params[self.b_key], x

    def backward(self, params, grad_y, x):
        grads = {
            self.w_key: x.T @ grad_y,
            self.b_key: grad_y.sum(axis=0, keepdims=True),
        }
        return grad_y @ params[self.w_key].T, grads


class ReLU(Layer):
    def forward(self, params, x):
        return np.maximum(x, 0.0), x

    def backward(self, params, grad_y, x):
        return grad_y * (x > 0), {}


class SoftmaxCrossEntropy(Layer):
    """Softmax → clipped entropy loss vs one-hot target, mean over the
    batch (reference: Softmax → BoundedActivation → EntropyLoss →
    AvgMeta, `Trainer.scala:158-166`; bounding is expressed as prob
    clipping here). ``forward`` needs the target attached to cache by
    the caller; emits per-batch mean loss."""

    def __init__(self, eps: float = 1e-9):
        self.eps = eps

    def forward_loss(self, logits: np.ndarray, target: np.ndarray):
        z = logits - logits.max(axis=1, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=1, keepdims=True)
        pc = np.clip(p, self.eps, 1.0)
        loss = float(-(target * np.log(pc)).sum(axis=1).mean())
        grad_logits = (p - target) / logits.shape[0]
        return loss, p, grad_logits


class Network:
    """Sequential layers + softmax-entropy head."""

    def __init__(self, layers: list[Layer], head: SoftmaxCrossEntropy | None = None):
        self.layers = layers
        self.head = head or SoftmaxCrossEntropy()

    def init_params(self) -> dict[str, np.ndarray]:
        out = {}
        for layer in self.layers:
            out.update(layer.init_params())
        return out

    def forward(self, params, x):
        caches = []
        for layer in self.layers:
            x, cache = layer.forward(params, x)
            caches.append(cache)
        return x, caches

    def loss_and_grads(self, params, x, target):
        logits, caches = self.forward(params, x)
        loss, probs, grad = self.head.forward_loss(logits, target)
        grads: dict[str, np.ndarray] = {}
        for layer, cache in zip(reversed(self.layers), reversed(caches)):
            grad, layer_grads = layer.backward(params, grad, cache)
            grads.update(layer_grads)
        return loss, grads, grad  # grad is d(loss)/d(input features)


def mlp(name: str, d_in: int, hidden: list[int], d_out: int) -> Network:
    """The reference's classifier shape (`Trainer.scala:150-159`):
    input → FC[200] → ReLU → FC[200] → ReLU → FC[classes] → softmax."""
    dims = [d_in, *hidden, d_out]
    layers: list[Layer] = []
    for i, (a, b) in enumerate(zip(dims, dims[1:])):
        layers.append(Dense(f"{name}/fc{i}", a, b))
        if i < len(dims) - 2:
            layers.append(ReLU())
    return Network(layers)
