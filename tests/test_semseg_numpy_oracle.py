"""Independent numpy-oracle forward of the semseg architecture.

Cross-validates every architecture choice of ResNet50DilatedFCN — v1c stem,
maxpool geometry, stage strides/dilations (output-stride 8), BatchNorm
epsilon, FCN head, and the half-pixel bilinear upsample — against a
from-scratch numpy implementation that consumes the torch-named OIHW
tensors from models.onnx_port.export_named_tensors. This de-risks the
half of the ONNX-port fidelity question that is testable without the
`onnx` package (reference: /root/reference/utils/onnx_utils.py:32-44 —
the reference's model is an mmseg dilated-ResNet50 FCN; parity of our
Flax graph with a literal reading of that architecture is what keeps a
converted checkpoint's class maps aligned).
"""
import numpy as np
import pytest


def conv2d(x, w_oihw, stride=1, dilation=1, pad=0, bias=None):
    """Direct conv, x (H,W,Cin), w OIHW -> (H',W',O). SAME-by-pad only."""
    w = np.transpose(w_oihw, (2, 3, 1, 0)).astype(np.float32)  # kh,kw,I,O
    kh, kw = w.shape[:2]
    xp = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    H = (xp.shape[0] - (kh - 1) * dilation - 1) // stride + 1
    W = (xp.shape[1] - (kw - 1) * dilation - 1) // stride + 1
    out = np.zeros((H, W, w.shape[3]), np.float32)
    for i in range(kh):
        for j in range(kw):
            xs = xp[i * dilation:i * dilation + (H - 1) * stride + 1:stride,
                    j * dilation:j * dilation + (W - 1) * stride + 1:stride]
            out += xs @ w[i, j]
    if bias is not None:
        out = out + bias
    return out


def batchnorm(x, t, prefix, eps=1e-5):
    return ((x - t[f'{prefix}.running_mean'])
            / np.sqrt(t[f'{prefix}.running_var'] + eps)
            * t[f'{prefix}.weight'] + t[f'{prefix}.bias'])


def maxpool_3x3_s2_p1(x):
    xp = np.pad(x, ((1, 1), (1, 1), (0, 0)), constant_values=-np.inf)
    H = (xp.shape[0] - 3) // 2 + 1
    W = (xp.shape[1] - 3) // 2 + 1
    out = np.full((H, W, x.shape[2]), -np.inf, np.float32)
    for i in range(3):
        for j in range(3):
            out = np.maximum(
                out, xp[i:i + (H - 1) * 2 + 1:2, j:j + (W - 1) * 2 + 1:2])
    return out


def bilinear_resize(x, out_hw):
    """Half-pixel-center bilinear upsample with edge clamp — the
    jax.image.resize(method='bilinear') convention (align_corners=False)."""
    H, W, C = x.shape
    oh, ow = out_hw

    def axis_coords(n_in, n_out):
        src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        lo = np.clip(np.floor(src).astype(int), 0, n_in - 1)
        hi = np.clip(lo + 1, 0, n_in - 1)
        frac = np.clip(src - np.floor(src), 0.0, 1.0)
        frac = np.where(src < 0, 0.0, np.where(src > n_in - 1, 1.0, frac))
        return lo, hi, frac.astype(np.float32)

    ylo, yhi, yf = axis_coords(H, oh)
    xlo, xhi, xf = axis_coords(W, ow)
    top = x[ylo][:, xlo] * (1 - xf)[None, :, None] \
        + x[ylo][:, xhi] * xf[None, :, None]
    bot = x[yhi][:, xlo] * (1 - xf)[None, :, None] \
        + x[yhi][:, xhi] * xf[None, :, None]
    return top * (1 - yf)[:, None, None] + bot * yf[:, None, None]


def bottleneck(x, t, prefix, stride, dilation, downsample):
    y = conv2d(x, t[f'{prefix}.conv1.weight'])
    y = np.maximum(batchnorm(y, t, f'{prefix}.bn1'), 0)
    y = conv2d(y, t[f'{prefix}.conv2.weight'], stride=stride,
               dilation=dilation, pad=dilation)
    y = np.maximum(batchnorm(y, t, f'{prefix}.bn2'), 0)
    y = conv2d(y, t[f'{prefix}.conv3.weight'])
    y = batchnorm(y, t, f'{prefix}.bn3')
    if downsample:
        r = conv2d(x, t[f'{prefix}.downsample.0.weight'], stride=stride)
        r = batchnorm(r, t, f'{prefix}.downsample.1')
    else:
        r = x
    return np.maximum(y + r, 0)


def numpy_forward(t, image, stage_sizes=(3, 4, 6, 3)):
    """Full oracle forward: raw uint8 (H,W,3) -> (H,W,19) f32 logits."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (image.astype(np.float32) / 255.0 - mean) / std
    for i in range(3):
        x = conv2d(x, t[f'backbone.stem.{3 * i}.weight'],
                   stride=2 if i == 0 else 1, pad=1)
        x = np.maximum(batchnorm(x, t, f'backbone.stem.{3 * i + 1}'), 0)
    x = maxpool_3x3_s2_p1(x)
    stage_cfg = ((1, 1), (2, 1), (1, 2), (1, 4))  # (first_stride, dilation)
    for si, (stride, dil) in enumerate(stage_cfg):
        for bi in range(stage_sizes[si]):
            x = bottleneck(x, t, f'backbone.layer{si + 1}.{bi}',
                           stride=stride if bi == 0 else 1, dilation=dil,
                           downsample=(bi == 0))
    y = conv2d(x, t['decode_head.convs.0.conv.weight'], pad=1)
    y = np.maximum(batchnorm(y, t, 'decode_head.convs.0.bn'), 0)
    logits = conv2d(y, t['decode_head.conv_seg.weight'],
                    bias=t['decode_head.conv_seg.bias'])
    return bilinear_resize(logits, image.shape[:2])


@pytest.mark.parametrize('img_hw', [(32, 64)])
def test_flax_semseg_matches_numpy_oracle(rng, img_hw):
    import jax
    import jax.numpy as jnp

    from pc_accumulation_lib_tpu.models.onnx_port import export_named_tensors
    from pc_accumulation_lib_tpu.models.resnet_semseg import (
        ResNet50DilatedFCN, init_params)

    model = ResNet50DilatedFCN(dtype=jnp.float32)
    variables = init_params(model, jax.random.PRNGKey(0), img_hw=(16, 32))
    # Random BN statistics/affines so the norm path is actually exercised
    # (init gives mean=0/var=1/scale=1 which would hide eps/stat wiring).
    def jitter(path, leaf):
        name = getattr(path[-1], 'key', str(path[-1]))
        arr = np.asarray(leaf)
        if name == 'var':
            return jnp.asarray(rng.uniform(0.25, 2.0, arr.shape),
                               jnp.float32)
        if name in ('mean', 'scale', 'bias'):
            return jnp.asarray(arr + rng.normal(0, 0.3, arr.shape),
                               jnp.float32)
        return leaf
    variables = jax.tree_util.tree_map_with_path(jitter, variables)

    img = rng.integers(0, 256, size=(1, *img_hw, 3)).astype(np.uint8)
    # precision HIGHEST: the TPU-default matmul truncation would make the
    # comparison about arithmetic, not architecture (CLAUDE.md gotcha).
    with jax.default_matmul_precision('highest'):
        flax_logits = np.asarray(
            model.apply(variables, jnp.asarray(img), train=False),
            np.float32)[0]
    oracle_logits = numpy_forward(export_named_tensors(variables), img[0])

    assert flax_logits.shape == oracle_logits.shape
    np.testing.assert_allclose(flax_logits, oracle_logits, atol=2e-2,
                               rtol=2e-2)
    agree = np.mean(flax_logits.argmax(-1) == oracle_logits.argmax(-1))
    assert agree == 1.0, f'argmax parity {agree}'
