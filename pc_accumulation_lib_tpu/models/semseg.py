"""Semantic-segmentation inference wrapper.

Drop-in replacement for SemSegONNX (utils/onnx_utils.py:7-49): callable
object mapping an RGB image to a class-index map, with the forward pass
jitted on TPU and batched multi-camera support.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pc_accumulation_lib_tpu.models.resnet_semseg import (
    ResNet50DilatedFCN, init_params)


class SemSegTPU:
    """pred(rgb) -> (1,1,H,W) int class map, parity with SemSegONNX.pred
    (onnx_utils.py:32-44); __call__(rgb) -> (H,W) for the accumulator
    pipeline; pred_batch(imgs (B,H,W,3)) -> (B,H,W) for multi-camera
    frames."""

    def __init__(self, variables=None, seed: int = 0, stage_sizes=None,
                 dtype=None):
        if dtype is None:
            # bf16 convs on the MXU; f32 on CPU where bf16 is emulated.
            dtype = (jnp.bfloat16 if jax.default_backend() == 'tpu'
                     else jnp.float32)
        kwargs = {} if stage_sizes is None else {'stage_sizes': stage_sizes}
        self.model = ResNet50DilatedFCN(dtype=dtype, **kwargs)
        if variables is None:
            variables = init_params(self.model, jax.random.PRNGKey(seed))
        self.variables = variables

        def _forward(variables, images):
            logits = self.model.apply(variables, images, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        self._forward = jax.jit(_forward)

    def pred_batch(self, images) -> np.ndarray:
        """(B,H,W,3) uint8/float -> (B,H,W) int32 class maps; one jitted
        forward for all cameras (vs 6 serial session.run calls at
        nuscenes_oracle_sem_pc_accum.py:461)."""
        images = jnp.asarray(np.asarray(images))
        return np.asarray(self._forward(self.variables, images))

    def __call__(self, rgb) -> np.ndarray:
        arr = np.asarray(rgb)[..., :3]
        return self.pred_batch(arr[None])[0]

    def pred(self, rgb) -> np.ndarray:
        """(1,1,H,W) shaped output for reference API parity — callers index
        [0,0] (kitti360_sem_pc_accum.py:131)."""
        return self(rgb)[None, None]


def load_semseg_model(path: Optional[str] = None, seed: int = 0) -> SemSegTPU:
    """Load a semseg model.

    * ``path`` ending in .onnx with the onnx package available: convert the
      reference checkpoint's weights (models/onnx_port.py).
    * ``path`` ending in .msgpack/.bin: restore serialized Flax variables.
    * otherwise: randomly initialized model (documented — useful for
      benchmarks and pipeline tests without the checkpoint).
    """
    if path and os.path.exists(path) and path.endswith('.onnx'):
        from pc_accumulation_lib_tpu.models.onnx_port import (
            load_onnx_variables)
        return SemSegTPU(variables=load_onnx_variables(path))
    if path and os.path.exists(path):
        import flax.serialization as ser
        model = SemSegTPU(seed=seed)
        with open(path, 'rb') as f:
            model.variables = ser.from_bytes(model.variables, f.read())
        return model
    if path:
        print(f'WARNING: semseg checkpoint {path!r} not found; '
              'using randomly initialized weights.')
    return SemSegTPU(seed=seed)
