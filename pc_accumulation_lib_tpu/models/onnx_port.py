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


def structural_torch_names(named: Dict[str, np.ndarray],
                           nodes) -> Dict[str, str]:
    """Recover canonical mmseg/torch state-dict names for a ResNet
    bottleneck FCN graph's initializers from DATAFLOW alone.

    Some exporter pipelines rename every initializer (`onnx::Conv_123`,
    bare numerics after constant folding), defeating name matching. The
    architecture itself is unambiguous, though: the walker follows the
    activation dataflow — stem conv-bn-relu chain up to the MaxPool,
    then bottleneck blocks (a block with a downsample conv starts a new
    stage, exactly ResNet's layout), then the FCN head conv-bn-relu and
    the biased classifier conv. Within a block the two convs consuming
    the block input are told apart by out-channels (conv1 reduces to
    C_mid, the downsample expands to C_out = 4*C_mid), never by name or
    node order.

    Args:
      named: {initializer name: ndarray} (values used only for shapes).
      nodes: [(op_type, inputs, outputs)] in topological (file) order —
        ``onnx_pb.read_graph`` output or an adapted ``graph.node``.

    Returns {initializer name: torch state-dict name} for every weight
    the port consumes (preprocessing constants etc. are left unnamed).
    Raises ValueError with the failing tensor when the graph does not
    parse as this architecture (e.g. BN folded into convs — such an
    export cannot be ported and must fail loudly).
    """
    consumers: Dict[str, list] = {}
    for n in nodes:
        for t in n[1]:
            consumers.setdefault(t, []).append(n)

    def data_consumers(t, op):
        # Consumers of activation t through a DATA input (not weights):
        # input[0] for unary/Conv/BN; either of the first two for Add.
        k = 2 if op == 'Add' else 1
        return [n for n in consumers.get(t, ())
                if n[0] == op and t in n[1][:k]]

    def step(t, op):
        hits = data_consumers(t, op)
        if len(hits) != 1:
            raise ValueError(
                f'structural port: expected exactly one {op} consumer of '
                f'{t!r}, found {len(hits)} — graph is not a plain ResNet '
                'bottleneck FCN')
        return hits[0]

    names: Dict[str, str] = {}

    def name_conv(conv, base):
        if len(conv[1]) < 2:
            raise ValueError(f'structural port: Conv for {base} has no '
                             'weight input')
        names[conv[1][1]] = f'{base}.weight'
        if len(conv[1]) > 2:
            names[conv[1][2]] = f'{base}.bias'

    def name_bn(bn, base):
        if len(bn[1]) < 5:
            raise ValueError(f'structural port: BatchNormalization for '
                             f'{base} is missing scale/bias/mean/var')
        for tensor, leaf in zip(bn[1][1:5], ('weight', 'bias',
                                             'running_mean',
                                             'running_var')):
            names[tensor] = f'{base}.{leaf}'

    def conv_bn(t, conv_base, bn_base):
        conv = step(t, 'Conv')
        bn = step(conv[2][0], 'BatchNormalization')
        name_conv(conv, conv_base)
        name_bn(bn, bn_base)
        return bn[2][0]

    # --- stem: first Conv in topo order anchors the walk (anything
    # before it is preprocessing: Sub/Div/Resize, no convs). ---
    first_conv = next((n for n in nodes if n[0] == 'Conv'), None)
    if first_conv is None:
        raise ValueError('structural port: graph contains no Conv nodes')
    t = first_conv[1][0]
    i = 1
    while True:
        bout = conv_bn(t, f'backbone.stem.{3 * (i - 1)}',
                       f'backbone.stem.{3 * (i - 1) + 1}')
        t = step(bout, 'Relu')[2][0]
        pools = data_consumers(t, 'MaxPool')
        if pools:
            t = pools[0][2][0]
            break
        i += 1
        if i > 4:
            raise ValueError('structural port: no MaxPool after 4 stem '
                             'conv-bn-relu links — not a ResNet stem')

    # --- bottleneck stages; head parse ends the loop. ---
    stage = block = 0
    while True:
        cs = data_consumers(t, 'Conv')
        if len(cs) == 1:
            # Either a no-downsample bottleneck or the FCN head: probe
            # for the bottleneck's Add before committing names.
            try:
                c1 = cs[0]
                b1 = step(c1[2][0], 'BatchNormalization')
                r1 = step(b1[2][0], 'Relu')
                c2 = step(r1[2][0], 'Conv')
                b2 = step(c2[2][0], 'BatchNormalization')
                r2 = step(b2[2][0], 'Relu')
                c3 = step(r2[2][0], 'Conv')
                b3 = step(c3[2][0], 'BatchNormalization')
                add = step(b3[2][0], 'Add')
            except ValueError:
                break                        # head, parsed below
            if t not in add[1][:2]:
                raise ValueError(
                    'structural port: bottleneck Add does not consume the '
                    'block input as identity')
            block += 1
            prefix = f'backbone.layer{stage}.{block - 1}'
            for c, b, k in ((c1, b1, 1), (c2, b2, 2), (c3, b3, 3)):
                name_conv(c, f'{prefix}.conv{k}')
                name_bn(b, f'{prefix}.bn{k}')
            t = step(add[2][0], 'Relu')[2][0]
            continue
        if len(cs) != 2:
            raise ValueError(
                f'structural port: activation {t!r} feeds {len(cs)} convs '
                '(expected 1-2; auxiliary heads are not supported)')
        wa = named.get(cs[0][1][1])
        wb = named.get(cs[1][1][1])
        if wa is None or wb is None or wa.shape[0] == wb.shape[0]:
            raise ValueError(
                'structural port: cannot tell conv1 from the downsample '
                'conv (missing weights or equal out-channels)')
        conv1, down = (cs[0], cs[1]) if wa.shape[0] < wb.shape[0] \
            else (cs[1], cs[0])
        stage += 1
        block = 1
        prefix = f'backbone.layer{stage}.0'
        bout = step(conv1[2][0], 'BatchNormalization')
        name_conv(conv1, f'{prefix}.conv1')
        name_bn(bout, f'{prefix}.bn1')
        cur = step(bout[2][0], 'Relu')[2][0]
        for k in (2, 3):
            conv = step(cur, 'Conv')
            bn = step(conv[2][0], 'BatchNormalization')
            name_conv(conv, f'{prefix}.conv{k}')
            name_bn(bn, f'{prefix}.bn{k}')
            cur = step(bn[2][0], 'Relu')[2][0] if k == 2 else bn[2][0]
        dbn = step(down[2][0], 'BatchNormalization')
        name_conv(down, f'{prefix}.downsample.0')
        name_bn(dbn, f'{prefix}.downsample.1')
        add = step(cur, 'Add')
        if dbn[2][0] not in add[1][:2]:
            raise ValueError(
                'structural port: downsample output is not the Add '
                'identity input')
        t = step(add[2][0], 'Relu')[2][0]

    if stage == 0:
        raise ValueError('structural port: found no bottleneck stages')
    # --- FCN head: conv-bn-relu, then the biased classifier conv. ---
    bout = conv_bn(t, 'decode_head.convs.0.conv', 'decode_head.convs.0.bn')
    t = step(bout, 'Relu')[2][0]
    name_conv(step(t, 'Conv'), 'decode_head.conv_seg')
    return names


def _nodes_from_onnx_graph(graph):
    """Adapt an ``onnx`` package GraphProto to the (op, ins, outs) tuple
    list ``structural_torch_names`` consumes."""
    return [(n.op_type, list(n.input), list(n.output)) for n in graph.node]


def load_onnx_variables(path: str, model=None,
                        variables: Optional[dict] = None):
    """Port the reference ONNX checkpoint into Flax variables.

    Uses the ``onnx`` package when present; otherwise falls back to the
    built-in minimal ModelProto reader (models/onnx_pb.py) — the port
    only needs the graph initializers and node topology, so the
    conversion works in environments without ``onnx`` (exercised
    end-to-end against a real torch-exported graph in
    tests/test_onnx_port.py).

    Matching is by state-dict name first; if the exporter renamed the
    initializers (name-drift: `onnx::Conv_123`, numeric names), the
    structural dataflow matcher recovers every tensor's role from graph
    topology and the port proceeds — only a graph that is genuinely not
    this architecture (or has BN folded away) still fails, loudly."""
    try:
        import onnx
        from onnx import numpy_helper
        graph = onnx.load(path).graph
        named = {init.name: numpy_helper.to_array(init)
                 for init in graph.initializer}
        nodes = _nodes_from_onnx_graph(graph)
    except ImportError:
        from pc_accumulation_lib_tpu.models import onnx_pb
        named, nodes = onnx_pb.read_graph(path)
    try:
        return convert_named_tensors(named, model=model,
                                     variables=variables)
    except ValueError as name_err:
        try:
            mapping = structural_torch_names(named, nodes)
            renamed = {tn: named[src] for src, tn in mapping.items()}
            return convert_named_tensors(renamed, model=model,
                                         variables=variables)
        except ValueError as struct_err:
            raise ValueError(
                f'ONNX port failed by name ({name_err}) and by structure '
                f'({struct_err})') from struct_err
