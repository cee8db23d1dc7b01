"""ResNet-50 dilated FCN semantic segmentation model (Flax).

TPU-native replacement for the reference's ONNX Runtime CUDA session
(utils/onnx_utils.py:7-49, model ``semseg_rn50_160k_cm.onnx`` per
README.md:32-34 — an mmsegmentation-style FCN head on a dilated ResNet-50
v1c backbone, 19 Cityscapes trainId classes).

Design notes:
  * NHWC layout, channels-last — XLA TPU's native conv layout;
  * output stride 8 (stage 3 dilation 2, stage 4 dilation 4) like the
    mmseg dilated backbone, FCN head 3x3x512 + 1x1 classifier, bilinear
    upsample to input resolution;
  * ``compute_dtype=bfloat16`` keeps convs on the MXU at full throughput
    with float32 params/statistics;
  * batched over images: the 6 NuScenes cameras run as one forward instead
    of 6 serial session.run calls (nuscenes_oracle_sem_pc_accum.py:461).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_CLASSES = 19
# torchvision ImageNet normalization (utils/onnx_utils.py:27-30).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess(images: jax.Array) -> jax.Array:
    """uint8/float [0,255] (B,H,W,3) -> normalized float32, matching
    ToTensor + Normalize (onnx_utils.py:27-30, :35-36)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


class Bottleneck(nn.Module):
    """ResNet v1 bottleneck with optional stride/dilation."""
    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = norm('bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    padding=[(self.dilation,) * 2] * 2, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = norm('bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name='conv3')(y)
        y = norm('bn3')(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='downsample_conv')(x)
            residual = norm('downsample_bn')(residual)
        return nn.relu(y + residual)


class ResNet50DilatedFCN(nn.Module):
    """Dilated ResNet-50 v1c backbone + FCN head, output stride 8."""
    num_classes: int = NUM_CLASSES
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images, train: bool = False):
        """images: (B,H,W,3) raw [0,255]. Returns (B,H,W,num_classes)
        float32 logits at input resolution."""
        x = preprocess(images).astype(self.dtype)
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        # v1c deep stem: 3x 3x3 convs.
        for i, (f, s) in enumerate(((32, 2), (32, 1), (64, 1))):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype,
                        name=f'stem_conv{i + 1}')(x)
            x = norm(f'stem_bn{i + 1}')(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        stage_cfg = (  # (features, first_stride, dilation)
            (64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4))
        for si, (feats, stride, dil) in enumerate(stage_cfg):
            for bi in range(self.stage_sizes[si]):
                x = Bottleneck(feats,
                               stride=stride if bi == 0 else 1,
                               dilation=dil,
                               downsample=(bi == 0),
                               dtype=self.dtype,
                               name=f'layer{si + 1}_block{bi + 1}')(
                                   x, train=train)

        # FCN head: 3x3 conv 512 + dropout-free 1x1 classifier.
        y = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name='head_conv')(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name='head_bn')(y)
        y = nn.relu(y)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name='classifier')(y)
        # Bilinear upsample to input resolution (the ONNX graph resizes
        # before argmax so callers get full-res class maps).
        b, h, w, c = images.shape[0], images.shape[1], images.shape[2], \
            self.num_classes
        logits = jax.image.resize(logits.astype(jnp.float32), (b, h, w, c),
                                  method='bilinear')
        return logits


def init_params(model: ResNet50DilatedFCN, rng, img_hw=(64, 128)):
    # Param shapes are spatial-size agnostic; init small to keep the init
    # trace cheap, and jit it — unjitted init dispatches hundreds of tiny
    # ops, each a device round-trip.
    x = jnp.zeros((1, img_hw[0], img_hw[1], 3), jnp.float32)
    init = jax.jit(lambda rng, x: model.init(rng, x, train=False))
    return init(rng, x)
