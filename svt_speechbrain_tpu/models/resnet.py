"""Visual frontend: Conv3D + per-frame ResNet-18 over lip-ROI video.

TPU-native rebuild of the AV-HuBERT visual encoder's frontend
(reference ``N20EMv2/video_only/resnet.py``; framework twin
``speechbrain/lobes/models/resnet.py``):

- ``frontend3D``: Conv3d(1→64, k=(5,7,7), s=(1,2,2), pad=(2,3,3), no bias) +
  BatchNorm3d + PReLU + MaxPool3d(k=(1,3,3), s=(1,2,2)) — time length
  preserved, spatial /4 (``resnet.py:139-143``);
- per-frame ResNet-18 trunk (BasicBlock [2,2,2,2], PReLU, 1×1-conv+BN
  downsampling) with time folded into the batch axis
  (``resnet.py:158-171``), global average pool → 512-d per frame.

Layouts are channel-last throughout — video (B, T, H, W, C) — which is what
XLA tiles onto the MXU. BatchNorm running statistics are an explicit state
pytree threaded by the caller (``init_state()`` / ``(y, state) = call``);
under a data-parallel mesh pass ``axis_name`` for cross-replica (SyncBN)
statistics.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs
from svt_speechbrain_tpu.nnet.cnn import Conv2d, Conv3d
from svt_speechbrain_tpu.nnet.normalization import BatchNorm2d, BatchNorm3d
from svt_speechbrain_tpu.nnet.activations import PReLU


def _conv_normal_init(rng, shape):
    """torch resnet init: normal(0, sqrt(2/n)), n = k*k*out (reference
    ``resnet.py:95-98``). shape = (*kernel, in, out)."""
    kernel = shape[:-2]
    n = int(np.prod(kernel)) * shape[-1]
    return jax.random.normal(rng, shape, jnp.float32) * np.sqrt(2.0 / n)


class BasicBlock(Module):
    """ResNet basic block with PReLU (reference ``resnet.py:37-76``)."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, has_downsample=False, relu_type="prelu"):
        self.inplanes = inplanes
        self.planes = planes
        self.stride = stride
        self.has_downsample = has_downsample
        self.relu_type = relu_type
        self.conv1 = Conv2d(planes, 3, inplanes, stride=stride, padding="same", bias=False)
        self.conv2 = Conv2d(planes, 3, planes, stride=1, padding="same", bias=False)
        self.bn1 = BatchNorm2d(planes)
        self.bn2 = BatchNorm2d(planes)
        if has_downsample:
            self.down_conv = Conv2d(planes, 1, inplanes, stride=stride, padding="valid", bias=False)
            self.down_bn = BatchNorm2d(planes)
        if relu_type == "prelu":
            self.relu1 = PReLU(planes)
            self.relu2 = PReLU(planes)

    def init(self, rng):
        keys = split_rngs(rng, 6)
        params = {
            "conv1": {"w": _conv_normal_init(keys[0], (3, 3, self.inplanes, self.planes))},
            "bn1": self.bn1.init(None),
            "conv2": {"w": _conv_normal_init(keys[1], (3, 3, self.planes, self.planes))},
            "bn2": self.bn2.init(None),
        }
        if self.relu_type == "prelu":
            params["relu1"] = self.relu1.init(None)
            params["relu2"] = self.relu2.init(None)
        if self.has_downsample:
            params["down_conv"] = {"w": _conv_normal_init(keys[2], (1, 1, self.inplanes, self.planes))}
            params["down_bn"] = self.down_bn.init(None)
        return params

    def init_state(self):
        state = {"bn1": self.bn1.init_state(), "bn2": self.bn2.init_state()}
        if self.has_downsample:
            state["down_bn"] = self.down_bn.init_state()
        return state

    def _act(self, params_key, params, x):
        if self.relu_type == "prelu":
            return (self.relu1 if params_key == "relu1" else self.relu2)(params[params_key], x)
        return jax.nn.relu(x)

    def __call__(self, params, state, x, train=False, axis_name=None):
        residual = x
        out = self.conv1(params["conv1"], x)
        out, bn1 = self.bn1(params["bn1"], state["bn1"], out, train=train, axis_name=axis_name)
        out = self._act("relu1", params, out)
        out = self.conv2(params["conv2"], out)
        out, bn2 = self.bn2(params["bn2"], state["bn2"], out, train=train, axis_name=axis_name)
        new_state = {"bn1": bn1, "bn2": bn2}
        if self.has_downsample:
            residual = self.down_conv(params["down_conv"], x)
            residual, dbn = self.down_bn(params["down_bn"], state["down_bn"], residual,
                                         train=train, axis_name=axis_name)
            new_state["down_bn"] = dbn
        out = out + residual
        out = self._act("relu2", params, out)
        return out, new_state


class ResNetTrunk(Module):
    """ResNet-18 trunk without stem (reference ``resnet.py:79-131``):
    layers [2,2,2,2] at 64/128/256/512, global average pool."""

    def __init__(self, layers=(2, 2, 2, 2), relu_type="prelu"):
        self.blocks = []
        inplanes = 64
        for stage, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if stage == 0 else 2
            stage_blocks = [BasicBlock(inplanes, planes, stride,
                                       has_downsample=(stride != 1 or inplanes != planes),
                                       relu_type=relu_type)]
            inplanes = planes
            for _ in range(1, n_blocks):
                stage_blocks.append(BasicBlock(inplanes, planes, relu_type=relu_type))
            self.blocks.append(stage_blocks)

    def init(self, rng):
        params = {}
        flat = [b for stage in self.blocks for b in stage]
        keys = split_rngs(rng, len(flat))
        i = 0
        for s, stage in enumerate(self.blocks):
            for b, block in enumerate(stage):
                params[f"layer{s + 1}_{b}"] = block.init(keys[i])
                i += 1
        return params

    def init_state(self):
        state = {}
        for s, stage in enumerate(self.blocks):
            for b, block in enumerate(stage):
                state[f"layer{s + 1}_{b}"] = block.init_state()
        return state

    def __call__(self, params, state, x, train=False, axis_name=None):
        new_state = {}
        for s, stage in enumerate(self.blocks):
            for b, block in enumerate(stage):
                key = f"layer{s + 1}_{b}"
                x, new_state[key] = block(params[key], state[key], x,
                                          train=train, axis_name=axis_name)
        x = jnp.mean(x, axis=(1, 2))  # global average pool → (N, 512)
        return x, new_state


class ResEncoder(Module):
    """Conv3D frontend + per-frame ResNet trunk (reference ``resnet.py:133-171``).

    Input (B, T, H, W, 1) grayscale lip ROIs → output (B, T, 512).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = ResEncoder()
    >>> params = enc.init(jax.random.PRNGKey(0))
    >>> out, new_state = enc(params, enc.init_state(),
    ...                      jnp.ones((1, 2, 32, 32, 1)))
    >>> out.shape
    (1, 2, 512)
    """

    def __init__(self, relu_type="prelu", weights=None):
        self.frontend_nout = 64
        self.backend_out = 512
        self.relu_type = relu_type
        self.frontend_conv = Conv3d(64, (5, 7, 7), 1, stride=(1, 2, 2),
                                    padding="same", bias=False)
        self.frontend_bn = BatchNorm3d(64)
        self.frontend_act = PReLU(64) if relu_type == "prelu" else None
        self.trunk = ResNetTrunk(relu_type=relu_type)
        self.weights = weights

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        params = {
            "frontend_conv": {"w": _conv_normal_init(k1, (5, 7, 7, 1, 64))},
            "frontend_bn": self.frontend_bn.init(None),
            "trunk": self.trunk.init(k3),
        }
        if self.frontend_act is not None:
            params["frontend_act"] = self.frontend_act.init(None)
        return params

    def init_state(self):
        return {"frontend_bn": self.frontend_bn.init_state(),
                "trunk": self.trunk.init_state()}

    def __call__(self, params, state, x, train=False, axis_name=None):
        b, t = x.shape[0], x.shape[1]
        x = self.frontend_conv(params["frontend_conv"], x)
        x, fbn = self.frontend_bn(params["frontend_bn"], state["frontend_bn"], x,
                                  train=train, axis_name=axis_name)
        if self.frontend_act is not None:
            x = self.frontend_act(params["frontend_act"], x)
        else:
            x = jax.nn.relu(x)
        # MaxPool3d k=(1,3,3) s=(1,2,2) pad=(0,1,1)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        # fold time into batch for the 2-D trunk (reference ``threeD_to_2D``)
        h, w, c = x.shape[2], x.shape[3], x.shape[4]
        x = x.reshape(b * t, h, w, c)
        x, trunk_state = self.trunk(params["trunk"], state["trunk"], x,
                                    train=train, axis_name=axis_name)
        x = x.reshape(b, t, self.backend_out)
        return x, {"frontend_bn": fbn, "trunk": trunk_state}


def conv3x3(out_planes, in_planes, stride=1):
    """3×3 conv, channel-last (reference ``resnet.py:conv3x3``)."""
    from svt_speechbrain_tpu.nnet.cnn import Conv2d

    return Conv2d(out_planes, 3, in_planes, stride=stride, padding="same",
                  bias=False)


def downsample_basic_block(out_planes, in_planes, stride=1):
    """1×1-conv + BN downsample shortcut (reference
    ``resnet.py:downsample_basic_block``)."""
    from svt_speechbrain_tpu.nnet.cnn import Conv2d
    from svt_speechbrain_tpu.nnet.normalization import BatchNorm2d

    return (Conv2d(out_planes, 1, in_planes, stride=stride, padding="valid",
                   bias=False),
            BatchNorm2d(out_planes))


def downsample_basic_block_v2(out_planes, in_planes, stride=1):
    """AvgPool + 1×1-conv downsample variant (reference
    ``resnet.py:downsample_basic_block_v2``); returns (pool_stride, conv,
    bn) — the caller average-pools with ``pool_stride`` first."""
    conv, bn = downsample_basic_block(out_planes, in_planes, stride=1)
    return stride, conv, bn


# Reference public name: the torch lobe calls the trunk ``ResNet``
ResNet = ResNetTrunk
