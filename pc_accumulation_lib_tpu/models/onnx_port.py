"""ONNX -> Flax weight conversion for the reference semseg checkpoint.

The reference loads ``semseg_rn50_160k_cm.onnx`` into ONNX Runtime
(utils/onnx_utils.py:20-24) — an mmsegmentation FCN head on a dilated
ResNet-50 v1c backbone. Here the same weights port into the Flax
ResNet50DilatedFCN (SURVEY.md section 7 decision 6, hard part 4:
"argmax-exact or painting diverges").

Mapping is BY NAME, not by shape order: every Flax parameter leaf has a
deterministic mmseg/torch state-dict name (``_torch_name``), and the
matching ONNX initializer is found by exact or unique-suffix match (ONNX
exporters keep torch parameter names, sometimes behind a prefix). Shape
agreement is then an assertion, never the matching criterion — BatchNorm
scale/bias/mean/var all share shape (C,), so shape-order matching can
silently scramble them.

The name map itself is exercised without the ``onnx`` package by
``export_named_tensors`` (Flax -> torch-named tensors) and a
reconstruction-roundtrip test (tests/test_onnx_port.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

_BN_LEAF = {'scale': 'weight', 'bias': 'bias',
            'mean': 'running_mean', 'var': 'running_var'}


def _conv_hwio_from_oihw(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv_oihw_from_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def _torch_name(path_parts: Tuple[str, ...]) -> str:
    """Canonical mmseg/torch state-dict name for one Flax variable leaf.

    Flax tree (models/resnet_semseg.py) -> torch names:
      stem_conv{i}/kernel          backbone.stem.{3(i-1)}.weight
      stem_bn{i}/<bn>              backbone.stem.{3(i-1)+1}.<bn>
      layer{s}_block{b}/conv{k}    backbone.layer{s}.{b-1}.conv{k}.weight
      layer{s}_block{b}/bn{k}      backbone.layer{s}.{b-1}.bn{k}.<bn>
      .../downsample_conv|bn       backbone.layer{s}.{b-1}.downsample.0|1
      head_conv|head_bn            decode_head.convs.0.conv|bn
      classifier                   decode_head.conv_seg.weight|bias
    """
    parts = [p for p in path_parts]
    _, mod, *rest = parts  # drop collection ('params'/'batch_stats')
    leaf = rest[-1]
    if mod.startswith('stem_conv'):
        return f'backbone.stem.{3 * (int(mod[-1]) - 1)}.weight'
    if mod.startswith('stem_bn'):
        return (f'backbone.stem.{3 * (int(mod[-1]) - 1) + 1}.'
                f'{_BN_LEAF[leaf]}')
    if mod.startswith('layer'):
        stage, block = mod.replace('layer', '').split('_block')
        prefix = f'backbone.layer{stage}.{int(block) - 1}'
        sub = rest[0]
        if sub == 'downsample_conv':
            return f'{prefix}.downsample.0.weight'
        if sub == 'downsample_bn':
            return f'{prefix}.downsample.1.{_BN_LEAF[leaf]}'
        if sub.startswith('conv'):
            return f'{prefix}.{sub}.weight'
        if sub.startswith('bn'):
            return f'{prefix}.{sub}.{_BN_LEAF[leaf]}'
    if mod == 'head_conv':
        return 'decode_head.convs.0.conv.weight'
    if mod == 'head_bn':
        return f'decode_head.convs.0.bn.{_BN_LEAF[leaf]}'
    if mod == 'classifier':
        return ('decode_head.conv_seg.weight' if leaf == 'kernel'
                else 'decode_head.conv_seg.bias')
    raise KeyError(f'No torch-name rule for Flax path {path_parts}')


def _path_strs(path_keys) -> Tuple[str, ...]:
    return tuple(getattr(k, 'key', str(k)) for k in path_keys)


def convert_named_tensors(named: Dict[str, np.ndarray], model=None,
                          variables=None):
    """Build the Flax variables pytree from torch-named tensors.

    Args:
      named: state-dict-style {torch name: OIHW/1-D numpy tensor} (e.g.
        ONNX graph initializers).
      model/variables: optionally a pre-built model or variables template;
        defaults to a fresh ResNet50DilatedFCN init.

    Raises ValueError naming the Flax parameter on a missing source tensor,
    an ambiguous suffix match, or a shape mismatch.
    """
    import jax
    if variables is None:
        from pc_accumulation_lib_tpu.models.resnet_semseg import (
            ResNet50DilatedFCN, init_params)
        model = model or ResNet50DilatedFCN()
        variables = init_params(model, jax.random.PRNGKey(0))
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)

    def lookup(tname: str, flax_path) -> np.ndarray:
        if tname in named:
            return named[tname]
        # Exporters may prefix (e.g. 'model.backbone...'): unique suffix.
        hits = [k for k in named if k.endswith('.' + tname)
                or k.endswith(tname)]
        if len(hits) == 1:
            return named[hits[0]]
        kind = 'No' if not hits else f'{len(hits)} ambiguous'
        raise ValueError(
            f'{kind} source tensor(s) named like {tname!r} for Flax '
            f'parameter {flax_path}')

    new_leaves = []
    for path_keys, leaf in flat:
        fpath = _path_strs(path_keys)
        src = np.asarray(lookup(_torch_name(fpath), fpath))
        if src.ndim == 4:
            src = _conv_hwio_from_oihw(src)
        if tuple(src.shape) != tuple(leaf.shape):
            raise ValueError(
                f'Shape mismatch for {fpath} <- {_torch_name(fpath)}: '
                f'source {tuple(src.shape)} vs target {tuple(leaf.shape)}')
        new_leaves.append(src.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def export_named_tensors(variables) -> Dict[str, np.ndarray]:
    """Inverse of convert_named_tensors: Flax variables -> torch-named
    OIHW tensors. Round-trips exactly; also usable to hand a trained Flax
    model to torch/ONNX consumers."""
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(variables)
    out = {}
    for path_keys, leaf in flat:
        arr = np.asarray(leaf)
        if arr.ndim == 4:
            arr = _conv_oihw_from_hwio(arr)
        out[_torch_name(_path_strs(path_keys))] = arr
    return out


def load_onnx_variables(path: str, model=None,
                        variables: Optional[dict] = None):
    """Port the reference ONNX checkpoint into Flax variables.

    Uses the ``onnx`` package when present; otherwise falls back to the
    built-in minimal ModelProto reader (models/onnx_pb.py) — the port
    only needs the graph initializers, so the conversion works in
    environments without ``onnx`` (exercised end-to-end against a real
    torch-exported graph in tests/test_onnx_port.py)."""
    try:
        import onnx
        from onnx import numpy_helper
        graph = onnx.load(path).graph
        named = {init.name: numpy_helper.to_array(init)
                 for init in graph.initializer}
    except ImportError:
        from pc_accumulation_lib_tpu.models import onnx_pb
        named = onnx_pb.read_initializers(path)
    return convert_named_tensors(named, model=model, variables=variables)
