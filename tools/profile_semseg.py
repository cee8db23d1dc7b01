"""Attribute the full-resolution semseg forward cost on the real TPU.

The fused integrate measures ~75 ms/frame at 376x1408 while the ResNet-50
OS8 FLOP bound is ~1-2 ms — this times the pieces (backbone logits,
bilinear upsample, argmax, preprocess) to find where it goes.
Run: python tools/profile_semseg.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

from pc_accumulation_lib_tpu.models.resnet_semseg import (
    ResNet50DilatedFCN, init_params, preprocess)


def timeit(label, fn, n=8):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f'{label:56s} {dt*1e3:8.2f} ms', flush=True)
    return dt


def main():
    H, W = 376, 1408
    model = ResNet50DilatedFCN()
    variables = init_params(model, jax.random.PRNGKey(0), img_hw=(64, 128))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, size=(1, H, W, 3), dtype=np.uint8))

    @jax.jit
    def rtt(x):
        return x + 1
    x0 = jnp.zeros(())
    t_rtt = timeit('RTT floor', lambda: np.asarray(rtt(x0)))

    import flax.linen as nn

    class NoResize(ResNet50DilatedFCN):
        # identical graph up to the head; skip the upsample+full-res tail
        @nn.compact
        def __call__(self, images, train=False):  # noqa: D102
            x = preprocess(images).astype(self.dtype)
            norm = lambda name: nn.BatchNorm(   # noqa: E731
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name)
            for i, (f, s) in enumerate(((32, 2), (32, 1), (64, 1))):
                x = nn.Conv(f, (3, 3), strides=(s, s),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, name=f'stem_conv{i + 1}')(x)
                x = norm(f'stem_bn{i + 1}')(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)])
            from pc_accumulation_lib_tpu.models.resnet_semseg import (
                Bottleneck)
            stage_cfg = ((64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4))
            for si, (feats, stride, dil) in enumerate(stage_cfg):
                for bi in range(self.stage_sizes[si]):
                    x = Bottleneck(feats, stride=stride if bi == 0 else 1,
                                   dilation=dil, downsample=(bi == 0),
                                   dtype=self.dtype,
                                   name=f'layer{si + 1}_block{bi + 1}')(
                                       x, train=False)
            y = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype, name='head_conv')(x)
            y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name='head_bn')(y)
            y = nn.relu(y)
            return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                           name='classifier')(y)

    backbone = NoResize()

    @jax.jit
    def fwd_backbone(v, im):
        return backbone.apply(v, im).sum()

    @jax.jit
    def fwd_full_argmax(v, im):
        logits = model.apply(v, im, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32).sum()

    @jax.jit
    def fwd_small_argmax(v, im):
        # argmax at OS8 then upsample the CLASS MAP with nearest — the
        # candidate cheap tail if the full-res bilinear is the cost.
        logits = backbone.apply(v, im)
        cls = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        up = jax.image.resize(cls, (1, H, W), method='nearest')
        return up.sum()

    def corr(label, fn):
        t = timeit(label, fn)
        print(f'  -> compute ~{(t - t_rtt)*1e3:7.2f} ms', flush=True)

    corr('backbone logits only (OS8, no resize)',
         lambda: np.asarray(fwd_backbone(variables, img)))
    corr('full forward + bilinear resize + argmax',
         lambda: np.asarray(fwd_full_argmax(variables, img)))
    corr('backbone + argmax@OS8 + nearest upsample',
         lambda: np.asarray(fwd_small_argmax(variables, img)))


if __name__ == '__main__':
    main()
