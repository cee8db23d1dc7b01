"""Name-based weight-port correctness (SURVEY.md hard part 4).

The converter maps Flax leaves to mmseg/torch state-dict names; shape is
an assertion, never the matching key. BatchNorm scale/bias/mean/var all
share shape (C,), so these tests would catch any order-based scrambling:
the roundtrip must reconstruct the exact tree, and forward outputs must
be bit-identical."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pc_accumulation_lib_tpu.models import onnx_port
from pc_accumulation_lib_tpu.models.resnet_semseg import (ResNet50DilatedFCN,
                                                          init_params)


@pytest.fixture(scope='module')
def tiny():
    model = ResNet50DilatedFCN(stage_sizes=(1, 1, 1, 1))
    variables = init_params(model, jax.random.PRNGKey(3), img_hw=(32, 64))
    # Make every leaf distinct so any mis-assignment changes values.
    flat, treedef = jax.tree_util.tree_flatten(variables)
    flat = [np.asarray(l) + 0.01 * (i + 1) for i, l in enumerate(flat)]
    return model, jax.tree_util.tree_unflatten(treedef, flat)


def test_roundtrip_reconstructs_exact_tree(tiny):
    model, variables = tiny
    named = onnx_port.export_named_tensors(variables)
    # All torch names follow the mmseg convention.
    assert all(k.startswith(('backbone.', 'decode_head.')) for k in named)
    assert 'backbone.stem.0.weight' in named
    assert 'backbone.layer1.0.downsample.1.running_var' in named
    assert 'decode_head.conv_seg.bias' in named
    rec = onnx_port.convert_named_tensors(named, variables=variables)
    jax.tree_util.tree_map(np.testing.assert_array_equal, variables, rec)


def test_roundtrip_forward_bit_identical(tiny):
    model, variables = tiny
    rec = onnx_port.convert_named_tensors(
        onnx_port.export_named_tensors(variables), variables=variables)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (1, 32, 64, 3)),
        jnp.float32)
    a = model.apply(variables, x, train=False)
    b = model.apply(rec, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.array_equal(np.argmax(a, -1), np.argmax(b, -1))


def test_exporter_prefix_resolved_by_suffix(tiny):
    model, variables = tiny
    named = {'model.' + k: v
             for k, v in onnx_port.export_named_tensors(variables).items()}
    rec = onnx_port.convert_named_tensors(named, variables=variables)
    jax.tree_util.tree_map(np.testing.assert_array_equal, variables, rec)


def test_missing_tensor_names_the_parameter(tiny):
    model, variables = tiny
    named = onnx_port.export_named_tensors(variables)
    named.pop('backbone.layer2.0.bn2.running_mean')
    with pytest.raises(ValueError, match='layer2_block1.*bn2.*mean'):
        onnx_port.convert_named_tensors(named, variables=variables)


def test_shape_mismatch_raises(tiny):
    model, variables = tiny
    named = onnx_port.export_named_tensors(variables)
    named['decode_head.conv_seg.weight'] = \
        named['decode_head.conv_seg.weight'][:, :8]
    with pytest.raises(ValueError, match='Shape mismatch'):
        onnx_port.convert_named_tensors(named, variables=variables)


def test_bn_stats_not_scrambled(tiny):
    """Swap two same-shaped BN tensors in the source: the by-name
    converter must place them back under their own names (i.e. the swap
    must be visible in the result — a shape-order matcher would be
    insensitive to which went where)."""
    model, variables = tiny
    named = onnx_port.export_named_tensors(variables)
    a, b = 'backbone.layer1.0.bn1.weight', 'backbone.layer1.0.bn1.bias'
    named[a], named[b] = named[b], named[a]
    rec = onnx_port.convert_named_tensors(named, variables=variables)
    p = rec['params']['layer1_block1']['bn1']
    np.testing.assert_array_equal(np.asarray(p['scale']), named[a])
    np.testing.assert_array_equal(np.asarray(p['bias']), named[b])


def _find_onnx_proto_utils():
    """Locate torch's private onnx_proto_utils across 2.x layouts (the
    module has moved); returns the module or None. Capability-probed —
    never version-pinned."""
    import importlib
    import pkgutil
    for name in ('torch.onnx._internal.torchscript_exporter.'
                 'onnx_proto_utils',
                 'torch.onnx._internal.onnx_proto_utils'):
        try:
            m = importlib.import_module(name)
        except ImportError:
            continue
        if hasattr(m, '_add_onnxscript_fn'):
            return m
    try:                                  # last resort: walk the package
        import torch.onnx._internal as base
        for info in pkgutil.walk_packages(base.__path__,
                                          base.__name__ + '.'):
            try:
                m = importlib.import_module(info.name)
            except Exception:
                continue
            if hasattr(m, '_add_onnxscript_fn'):
                return m
    except Exception:
        pass
    return None


def _export_twin_onnx(twin, img, path):
    """Export the torch twin with the REAL legacy ONNX exporter in this
    onnx-less environment.

    The exporter only needs the onnx package for an onnxscript post-pass
    that is a no-op without custom ops. Preferred shim: replace the
    private ``_add_onnxscript_fn`` (located by capability probe across
    torch 2.x layouts). Fallback if the function ever moves again: inject
    a minimal fake ``onnx`` module satisfying exactly that post-pass
    (load_model_from_string -> empty graph, so it finds no custom
    functions and returns the bytes unchanged) — no torch-version-
    conditional skip either way."""
    import sys
    import types

    import torch
    u = _find_onnx_proto_utils()
    if u is not None:
        orig = u._add_onnxscript_fn
        u._add_onnxscript_fn = lambda model_bytes, _: model_bytes
        try:
            torch.onnx.export(twin, torch.from_numpy(img), path,
                              opset_version=11, dynamo=False,
                              do_constant_folding=False)
        finally:
            u._add_onnxscript_fn = orig
        return
    if 'onnx' in sys.modules:             # a real onnx exists: no shim
        torch.onnx.export(twin, torch.from_numpy(img), path,
                          opset_version=11, dynamo=False,
                          do_constant_folding=False)
        return
    fake = types.ModuleType('onnx')

    class _G:
        node = ()

    class _M:
        graph = _G()
        functions = []

    fake.load_model_from_string = lambda b: _M()
    sys.modules['onnx'] = fake
    try:
        torch.onnx.export(twin, torch.from_numpy(img), path,
                          opset_version=11, dynamo=False,
                          do_constant_folding=False)
    finally:
        del sys.modules['onnx']


def test_torch_export_parse_port_forward_parity(tmp_path):
    """Hermetic end-to-end port of a REAL exporter-named ONNX graph,
    without the onnx package: an independent torch implementation of the
    same architecture (tests/torch_semseg_twin.py, mmseg state-dict
    names) is exported with torch's legacy ONNX exporter, read back with
    the package's own ModelProto reader (models/onnx_pb.py), converted by
    name into Flax variables, and the two frameworks' forwards must agree
    — the hermetic version of porting the reference checkpoint
    (utils/onnx_utils.py:20-24)."""
    torch = pytest.importorskip('torch')
    from tests.torch_semseg_twin import TorchResNet50DilatedFCN, randomize_

    twin = TorchResNet50DilatedFCN(stage_sizes=(1, 1, 1, 1))
    twin.eval()
    randomize_(twin, seed=4)
    H, W = 48, 96
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (1, H, W, 3)).astype(np.float32)

    path = str(tmp_path / 'twin.onnx')
    _export_twin_onnx(twin, img, path)

    # Reader sees the real exporter names, bit-exact tensor values.
    from pc_accumulation_lib_tpu.models import onnx_pb
    named = onnx_pb.read_initializers(path)
    assert 'backbone.stem.0.weight' in named
    assert 'backbone.layer4.0.bn3.running_var' in named
    sd = twin.state_dict()
    for k, v in sd.items():
        if 'num_batches_tracked' in k:
            continue
        hits = [n for n in named if n == k or n.endswith('.' + k)]
        assert len(hits) == 1, (k, hits)
        np.testing.assert_array_equal(named[hits[0]], v.numpy())

    # Port into Flax by name (load_onnx_variables takes the onnx_pb
    # fallback here) and compare forwards.
    model = ResNet50DilatedFCN(stage_sizes=(1, 1, 1, 1),
                               dtype=jnp.float32)
    template = init_params(model, jax.random.PRNGKey(0), img_hw=(H, W))
    variables = onnx_port.load_onnx_variables(path, variables=template)
    with torch.no_grad():
        t_logits = twin(torch.from_numpy(img)).numpy()
    # TPU-default matmul truncation would mask real porting bugs.
    with jax.default_matmul_precision('highest'):
        f_logits = np.asarray(model.apply(variables, jnp.asarray(img),
                                          train=False))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-2, rtol=0)
    agree = np.mean(f_logits.argmax(-1) == t_logits.argmax(-1))
    assert agree >= 0.998, f'argmax parity {agree}'


def test_onnx_pb_truncated_and_unpacked(tmp_path):
    """The minimal ModelProto reader must (a) raise a clear ValueError on
    truncated files instead of IndexError/short-view misparses, and (b)
    accept UNPACKED repeated typed data (one record per element), which
    the protobuf spec requires parsers to handle alongside packed."""
    import struct
    from pc_accumulation_lib_tpu.models import onnx_pb

    # (a) field 7 (graph), wire 2, declared length 127, one byte present.
    bad = tmp_path / 'bad.onnx'
    bad.write_bytes(bytes([0x3A, 0x7F, 0x01]))
    with pytest.raises(ValueError, match='truncated'):
        onnx_pb.read_initializers(str(bad))

    # (b) TensorProto with dims=[2], float dtype, float_data as two
    # UNPACKED (field 4, wire 5) records.
    tensor = (bytes([0x08, 0x02])            # dims: field 1 varint 2
              + bytes([0x10, 0x01])          # data_type: field 2 = FLOAT
              + bytes([0x42, 0x01]) + b'w'   # name: field 8 = 'w'
              + bytes([0x25]) + struct.pack('<f', 1.5)
              + bytes([0x25]) + struct.pack('<f', -2.0))
    graph = bytes([0x2A, len(tensor)]) + tensor   # field 5 initializer
    model = bytes([0x3A, len(graph)]) + graph     # field 7 graph
    good = tmp_path / 'unpacked.onnx'
    good.write_bytes(model)
    named = onnx_pb.read_initializers(str(good))
    np.testing.assert_array_equal(named['w'],
                                  np.array([1.5, -2.0], np.float32))


def test_onnx_graph_port(tmp_path):
    """Full real-graph ONNX path, hermetic: synthesize a ModelProto file
    with onnx_pb.write_initializers (the reader's inverse — no ``onnx``
    package needed), then parse -> port -> exact tree reconstruction.
    When the onnx package IS present, its own parser cross-validates the
    writer's bytes (reference consumer: utils/onnx_utils.py:20-24)."""
    from pc_accumulation_lib_tpu.models import onnx_pb
    model = ResNet50DilatedFCN(stage_sizes=(1, 1, 1, 1))
    variables = init_params(model, jax.random.PRNGKey(0), img_hw=(32, 64))
    named = onnx_port.export_named_tensors(variables)
    for encoding in ('raw', 'typed'):
        path = str(tmp_path / f'm_{encoding}.onnx')
        onnx_pb.write_initializers(path, named, encoding=encoding)
        rec = onnx_port.load_onnx_variables(path, variables=variables)
        jax.tree_util.tree_map(np.testing.assert_array_equal, variables,
                               rec)
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        return
    m = onnx.load(str(tmp_path / 'm_raw.onnx'))
    ext = {t.name: numpy_helper.to_array(t) for t in m.graph.initializer}
    assert set(ext) == set(named)
    for k in named:
        np.testing.assert_array_equal(ext[k], np.asarray(named[k]))


def test_onnx_writer_typed_negatives_and_aliases(tmp_path):
    """The writer's typed encoding must sign-extend negative varints to
    64 bits like protoc (the reader masks them back down), across int32/
    int64/int16/int8/uint8/bool/float16; Identity alias nodes must be
    resolved to their source tensors (exporter weight deduplication)."""
    from pc_accumulation_lib_tpu.models import onnx_pb
    named = {
        'i32': np.array([-1, -2147483648, 2147483647, 0], np.int32),
        'i64': np.array([-1, -(1 << 62), (1 << 62), 7], np.int64),
        'i16': np.array([[-5, 300], [7, -32768]], np.int16),
        'i8': np.array([-128, 127, -1], np.int8),
        'u8': np.array([0, 255, 17], np.uint8),
        'b': np.array([True, False, True], np.bool_),
        'f16': np.array([1.5, -2.25, 65504.0], np.float16),
        'f32': np.arange(6, dtype=np.float32).reshape(2, 3) - 2.5,
        'f64': np.array([1e-300, -3.25], np.float64),
    }
    for encoding in ('raw', 'typed'):
        path = str(tmp_path / f't_{encoding}.onnx')
        onnx_pb.write_initializers(
            path, named, identities=[('f32', 'f32_alias'),
                                     ('f32_alias', 'f32_alias2')],
            encoding=encoding)
        got = onnx_pb.read_initializers(path)
        assert set(got) == set(named) | {'f32_alias', 'f32_alias2'}
        for k, v in named.items():
            assert got[k].dtype == v.dtype, (encoding, k)
            np.testing.assert_array_equal(got[k], v, err_msg=f'{encoding}:{k}')
        np.testing.assert_array_equal(got['f32_alias'], named['f32'])
        # Alias chains resolve through intermediate aliases (nodes are
        # topologically sorted, one pass).
        np.testing.assert_array_equal(got['f32_alias2'], named['f32'])


def test_structural_port_survives_name_mangling(tmp_path):
    """Name-drift-proof port (the residual checkpoint-fidelity risk):
    exporter pipelines that rename every initializer (`onnx::Conv_123`,
    bare numerics after folding) defeat name matching. The REAL torch
    export is re-read, every initializer renamed to an opaque t{i} (node
    inputs rewritten to match), and the structural dataflow matcher must
    recover every role — pinned by exact equality with the name-based
    port AND forward parity vs torch. stage_sizes=(2,1,1,1) includes a
    no-downsample bottleneck (layer1.1), the walker's other block shape."""
    torch = pytest.importorskip('torch')
    from tests.torch_semseg_twin import TorchResNet50DilatedFCN, randomize_

    twin = TorchResNet50DilatedFCN(stage_sizes=(2, 1, 1, 1))
    twin.eval()
    randomize_(twin, seed=9)
    H, W = 32, 64
    img = np.random.default_rng(2).integers(
        0, 255, (1, H, W, 3)).astype(np.float32)
    path = str(tmp_path / 'twin.onnx')
    _export_twin_onnx(twin, img, path)

    from pc_accumulation_lib_tpu.models import onnx_pb
    named, nodes = onnx_pb.read_graph(path)
    ren = {k: f't{i}' for i, k in enumerate(sorted(named))}
    mangled = {ren[k]: v for k, v in named.items()}
    mnodes = [(op, [ren.get(x, x) for x in ins], outs)
              for op, ins, outs in nodes]

    model = ResNet50DilatedFCN(stage_sizes=(2, 1, 1, 1), dtype=jnp.float32)
    template = init_params(model, jax.random.PRNGKey(0), img_hw=(H, W))
    with pytest.raises(ValueError):
        onnx_port.convert_named_tensors(mangled, variables=template)

    mapping = onnx_port.structural_torch_names(mangled, mnodes)
    # The recovered mapping must agree with the untouched exporter names
    # tensor-for-tensor (values compared, not just names).
    for src, tname in mapping.items():
        hits = [k for k in named if k == tname or k.endswith('.' + tname)]
        assert len(hits) == 1, (tname, hits)
        np.testing.assert_array_equal(mangled[src], named[hits[0]])
    renamed = {tn: mangled[src] for src, tn in mapping.items()}
    variables = onnx_port.convert_named_tensors(renamed,
                                                variables=template)
    with torch.no_grad():
        t_logits = twin(torch.from_numpy(img)).numpy()
    with jax.default_matmul_precision('highest'):
        f_logits = np.asarray(model.apply(variables, jnp.asarray(img),
                                          train=False))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-2, rtol=0)
    agree = np.mean(f_logits.argmax(-1) == t_logits.argmax(-1))
    assert agree >= 0.998, f'argmax parity {agree}'


def test_load_onnx_variables_structural_fallback(tmp_path):
    """load_onnx_variables itself must take the structural path when the
    file's initializer names are garbage: the mangled graph is written
    back out with the package's own writer (initializers + the original
    node topology via Identity-free node records are not writable, so
    the graph is rebuilt through onnx_pb primitives) and ported."""
    torch = pytest.importorskip('torch')
    from tests.torch_semseg_twin import TorchResNet50DilatedFCN, randomize_

    twin = TorchResNet50DilatedFCN(stage_sizes=(1, 1, 1, 1))
    twin.eval()
    randomize_(twin, seed=11)
    H, W = 32, 64
    img = np.random.default_rng(3).integers(
        0, 255, (1, H, W, 3)).astype(np.float32)
    path = str(tmp_path / 'twin.onnx')
    _export_twin_onnx(twin, img, path)

    # Mangle the names INSIDE the file: byte-patch each initializer's
    # name record to an equal-length opaque string so the file stays a
    # valid ModelProto with the original node topology.
    from pc_accumulation_lib_tpu.models import onnx_pb
    named, nodes = onnx_pb.read_graph(path)
    blob = open(path, 'rb').read()
    for i, k in enumerate(sorted(named, key=len, reverse=True)):
        enc = k.encode()
        repl = (b'z%d' % i).ljust(len(enc), b'_')[:len(enc)]
        assert blob.count(enc) >= 1, k
        blob = blob.replace(enc, repl)
    mpath = str(tmp_path / 'mangled.onnx')
    open(mpath, 'wb').write(blob)
    m_named, m_nodes = onnx_pb.read_graph(mpath)
    assert not any(n in m_named for n in named), 'mangling failed'
    assert [op for op, _, _ in m_nodes] == [op for op, _, _ in nodes]

    model = ResNet50DilatedFCN(stage_sizes=(1, 1, 1, 1), dtype=jnp.float32)
    template = init_params(model, jax.random.PRNGKey(0), img_hw=(H, W))
    variables = onnx_port.load_onnx_variables(mpath, variables=template)
    ref_vars = onnx_port.load_onnx_variables(path, variables=template)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(ref_vars)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _to_dynamo_universe(named, nodes):
    """Rewrite a torchscript-exporter graph into the dynamo (FX/
    torch.export) exporter's characteristic shape — the second graph
    universe the structural matcher must survive:

      * initializers renamed to the lifted-placeholder convention
        (``p_backbone_layer1_0_conv1_weight`` for params,
        ``b_..._running_mean`` for buffers — FQN dots to underscores),
      * every activation renamed to SSA ``val_N``,
      * a DIFFERENT (still valid) topological node order — Kahn's
        algorithm emitting the ready node that appeared LATEST in the
        original file, which reverses branch interleave (dynamo emits
        residual downsample branches in a different order than
        torchscript),
      * flipped Add operand order (identity operand position differs
        between the two exporters).
    """
    ren = {k: (('b_' if 'running_' in k else 'p_')
               + k.replace('.', '_').replace('::', '_'))
           for k in named}
    acts = {}

    def act(t):
        if t in ren:
            return ren[t]
        if t not in acts:
            acts[t] = f'val_{len(acts)}'
        return acts[t]

    renamed_nodes = [(op, [act(t) for t in ins], [act(t) for t in outs])
                     for op, ins, outs in nodes]
    # Alternative topological order.
    produced = {}
    for i, (_, _, outs) in enumerate(renamed_nodes):
        for o in outs:
            produced[o] = i
    deps = [set(produced[t] for t in ins if t in produced)
            for _, ins, _ in renamed_nodes]
    users = [[] for _ in renamed_nodes]
    for i, d in enumerate(deps):
        for j in d:
            users[j].append(i)
    pend = [len(d) for d in deps]
    ready = sorted(i for i, p in enumerate(pend) if p == 0)
    order = []
    while ready:
        i = ready.pop()                      # latest-in-file first
        order.append(i)
        for j in users[i]:
            pend[j] -= 1
            if pend[j] == 0:
                import bisect
                bisect.insort(ready, j)
    assert len(order) == len(renamed_nodes), 'cycle?'
    out_nodes = []
    for i in order:
        op, ins, outs = renamed_nodes[i]
        if op == 'Add':
            ins = list(reversed(ins))
        out_nodes.append((op, ins, outs))
    return {ren[k]: v for k, v in named.items()}, out_nodes


def test_structural_port_dynamo_exporter_universe(tmp_path):
    """The structural matcher on a SECOND exporter universe: the real
    torchscript export is rewritten into the dynamo exporter's
    characteristic graph shape (lifted p_/b_ initializer names, val_N SSA
    activations, different topological node order with reversed branch
    interleave, flipped Add operands — the dynamo exporter itself needs
    the absent onnxscript package, so its topology is synthesized from
    the real graph with the package's own writer, onnx_pb.write_graph),
    written back out hermetically, and ported end-to-end through
    load_onnx_variables with forward parity vs torch
    (/root/reference/utils/onnx_utils.py:20-24 is the consumer being
    hardened)."""
    torch = pytest.importorskip('torch')
    from tests.torch_semseg_twin import TorchResNet50DilatedFCN, randomize_

    twin = TorchResNet50DilatedFCN(stage_sizes=(2, 1, 1, 1))
    twin.eval()
    randomize_(twin, seed=21)
    H, W = 32, 64
    img = np.random.default_rng(5).integers(
        0, 255, (1, H, W, 3)).astype(np.float32)
    path = str(tmp_path / 'twin.onnx')
    _export_twin_onnx(twin, img, path)

    from pc_accumulation_lib_tpu.models import onnx_pb
    named, nodes = onnx_pb.read_graph(path)
    d_named, d_nodes = _to_dynamo_universe(named, nodes)
    # It IS a different universe: no original name survives, the node
    # op sequence differs from file order, Adds are flipped.
    assert not (set(d_named) & set(named))
    assert [op for op, _, _ in d_nodes] != [op for op, _, _ in nodes]
    dpath = str(tmp_path / 'twin_dynamo.onnx')
    onnx_pb.write_graph(dpath, d_named, d_nodes)

    # Round-trips through the reader.
    r_named, r_nodes = onnx_pb.read_graph(dpath)
    assert set(r_named) == set(d_named)
    assert r_nodes == [(op, list(i), list(o)) for op, i, o in d_nodes]

    model = ResNet50DilatedFCN(stage_sizes=(2, 1, 1, 1), dtype=jnp.float32)
    template = init_params(model, jax.random.PRNGKey(0), img_hw=(H, W))
    variables = onnx_port.load_onnx_variables(dpath, variables=template)
    with torch.no_grad():
        t_logits = twin(torch.from_numpy(img)).numpy()
    with jax.default_matmul_precision('highest'):
        f_logits = np.asarray(model.apply(variables, jnp.asarray(img),
                                          train=False))
    np.testing.assert_allclose(f_logits, t_logits, atol=2e-2, rtol=0)
    agree = np.mean(f_logits.argmax(-1) == t_logits.argmax(-1))
    assert agree >= 0.998, f'argmax parity {agree}'
