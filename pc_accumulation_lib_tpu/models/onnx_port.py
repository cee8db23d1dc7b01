"""ONNX -> Flax weight conversion for the reference semseg checkpoint.

The reference loads ``semseg_rn50_160k_cm.onnx`` into ONNX Runtime
(utils/onnx_utils.py:20-24); here the same weights are ported into the Flax
ResNet50DilatedFCN (SURVEY.md section 7 decision 6). Gated on the ``onnx``
package and checkpoint availability (neither ships in this environment), so
the mapping is by tensor-shape matching in topological order:

  * Conv weights: OIHW -> HWIO transpose;
  * BatchNorm: (scale, bias, mean, var) tuples follow each conv initializer;
  * the converter validates that every target parameter receives exactly one
    source tensor of matching shape and raises otherwise — argmax-level
    output fidelity must then be confirmed with tests/test_model.py's
    consistency checks on real data (SURVEY.md hard part 4).
"""
from __future__ import annotations

import numpy as np


def _conv_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_onnx_variables(path: str):
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:  # pragma: no cover - env without onnx
        raise ImportError(
            'onnx package unavailable: cannot convert the reference '
            'checkpoint. Serialize Flax variables instead (see '
            'models/semseg.load_semseg_model).') from e

    import jax
    from pc_accumulation_lib_tpu.models.resnet_semseg import (
        ResNet50DilatedFCN, init_params)

    graph = onnx.load(path).graph
    tensors = [(init.name, numpy_helper.to_array(init))
               for init in graph.initializer]

    model = ResNet50DilatedFCN()
    variables = init_params(model, jax.random.PRNGKey(0))
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)

    # Order source tensors as (conv_w, bn_scale, bn_bias, bn_mean, bn_var)*
    # and match against target leaves by shape in traversal order.
    src = [(n, t) for n, t in tensors]
    used = [False] * len(src)
    new_leaves = []
    for path_keys, leaf in flat:
        shape = tuple(leaf.shape)
        found = None
        for i, (name, t) in enumerate(src):
            if used[i]:
                continue
            ts = tuple(t.shape)
            if len(ts) == 4 and _conv_to_hwio(t).shape == shape:
                found = _conv_to_hwio(t)
            elif ts == shape:
                found = t
            if found is not None:
                used[i] = True
                break
        if found is None:
            raise ValueError(
                f'No ONNX tensor found for parameter {path_keys} '
                f'shape {shape}')
        new_leaves.append(found.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
