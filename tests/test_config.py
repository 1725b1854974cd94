"""Config / graph-IR tests: every examples/ pbtxt must parse and
shape-infer (reference test strategy analog: SURVEY.md §4 item (b))."""

import glob
import os

import pytest

from convnet_tpu import config
from convnet_tpu.graph import LOSS, build_graph, conv_out_size

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE_PBTXTS = sorted(glob.glob(os.path.join(REPO, "examples", "*", "*.pbtxt")))
# model pbtxts only — data configs (DatasetConfig) contain "data_config {"
MODEL_PBTXTS = [
    p for p in EXAMPLE_PBTXTS if "data_config" not in open(p).read()
]


def test_examples_exist():
    assert MODEL_PBTXTS, "no example model pbtxts found"


@pytest.mark.parametrize("path", MODEL_PBTXTS, ids=os.path.basename)
def test_example_parses_and_builds(path):
    model = config.read_model(path)
    g = build_graph(model)
    assert g.input_layers and g.output_layers
    # every layer got a shape
    for l in g.layers:
        assert l.name in g.shapes
    # topo property: an edge's source shape is known before the edge runs
    seen = {l.name for l in g.input_layers}
    for e in g.edges:
        assert e.source in seen or any(
            x.dest == e.source for x in g.edges[: g.edges.index(e)]
        )
        seen.add(e.dest)


def test_conv_out_size_cuda_convnet_convention():
    # AlexNet conv1: 224, k11, s4, p0 -> 55 (requires ceil semantics)
    assert conv_out_size(224, 11, 4, 0) == 55
    # overlapping pool: 55, k3, s2 -> 27
    assert conv_out_size(55, 3, 2, 0) == 27
    # CIFAR pool: 32, k3, s2 -> 16 (ceil; floor would give 15)
    assert conv_out_size(32, 3, 2, 0) == 16
    # same-pad conv: 28, k5, s1, p2 -> 28
    assert conv_out_size(28, 5, 1, 2) == 28


def test_mnist_shapes():
    g = build_graph(config.read_model(os.path.join(REPO, "examples/mnist/mnist_lenet.pbtxt")))
    assert g.shapes["input"] == (28, 28, 1)
    assert g.shapes["conv1"] == (28, 28, 16)
    assert g.shapes["pool1"] == (14, 14, 16)
    assert g.shapes["pool2"] == (7, 7, 32)
    assert g.shapes["fc1"] == (1, 1, 128)
    assert g.shapes["output"] == (1, 1, 10)


def test_alexnet_shapes():
    g = build_graph(config.read_model(os.path.join(REPO, "examples/imagenet/alexnet.pbtxt")))
    assert g.shapes["conv1"] == (55, 55, 96)
    assert g.shapes["pool1"] == (27, 27, 96)
    assert g.shapes["conv2"] == (27, 27, 256)
    assert g.shapes["pool2"] == (13, 13, 256)
    assert g.shapes["conv5"] == (13, 13, 256)
    assert g.shapes["pool5"] == (6, 6, 256)
    assert g.shapes["fc6"] == (1, 1, 4096)
    assert g.compute_dtype == "bfloat16"
    assert g.parallel_data == 8


def test_output_layer_loss_inferred_from_activation():
    m = config.parse_model(
        """
        name: "t"
        layer { name: "in" is_input: true num_channels: 4 }
        layer { name: "out" is_output: true num_channels: 3 activation: SOFTMAX }
        edge { source: "in" dest: "out" edge_type: FC }
        """
    )
    g = build_graph(m)
    assert g.layer("out").loss_function == LOSS.CROSS_ENTROPY_MULTINOMIAL


def test_rejects_unknown_source():
    m = config.parse_model(
        """
        name: "t"
        layer { name: "in" is_input: true }
        layer { name: "out" is_output: true num_channels: 2 activation: SOFTMAX }
        edge { source: "nope" dest: "out" edge_type: FC }
        """
    )
    with pytest.raises(ValueError, match="unknown source"):
        build_graph(m)


def test_rejects_cycle():
    m = config.parse_model(
        """
        name: "t"
        layer { name: "in" is_input: true num_channels: 2 }
        layer { name: "a" num_channels: 2 }
        layer { name: "b" num_channels: 2 }
        layer { name: "out" is_output: true num_channels: 2 activation: SOFTMAX }
        edge { source: "in" dest: "out" edge_type: FC }
        edge { source: "a" dest: "b" edge_type: FC }
        edge { source: "b" dest: "a" edge_type: FC }
        """
    )
    with pytest.raises(ValueError, match="cycle|unreachable"):
        build_graph(m)


def test_rejects_channel_mismatch():
    m = config.parse_model(
        """
        name: "t"
        layer { name: "in" is_input: true num_channels: 3 image_size: 8 }
        layer { name: "c" num_channels: 7 }
        layer { name: "out" is_output: true num_channels: 2 activation: SOFTMAX }
        edge { source: "in" dest: "c" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
        edge { source: "c" dest: "out" edge_type: FC }
        """
    )
    with pytest.raises(ValueError, match="num_channels"):
        build_graph(m)


def test_multi_input_sum_shapes_must_agree():
    m = config.parse_model(
        """
        name: "t"
        layer { name: "in" is_input: true num_channels: 4 }
        layer { name: "h" num_channels: 8 activation: RECTIFIED_LINEAR }
        layer { name: "out" is_output: true num_channels: 8 activation: SOFTMAX }
        edge { source: "in" dest: "h" edge_type: FC }
        edge { source: "in" dest: "out" edge_type: FC }
        edge { source: "h" dest: "out" edge_type: FC }
        """
    )
    g = build_graph(m)
    assert len(g.incoming("out")) == 2
    assert g.shapes["out"] == (1, 1, 8)


def test_graph_is_hashable():
    g = build_graph(config.read_model(os.path.join(REPO, "examples/mnist/mnist_lenet.pbtxt")))
    hash(g)  # must be usable as a jit static arg
    assert g == build_graph(config.read_model(os.path.join(REPO, "examples/mnist/mnist_lenet.pbtxt")))


def test_gpu_ids_derive_parallel_model(capsys):
    """A reference-style pbtxt that splits the model via gpu_id pins must
    not silently run single-device: parallel.model derives from the number
    of distinct gpu_ids when no parallel{} block is given."""
    from convnet_tpu.graph import build_graph

    text = """
        name: "split"
        layer { name: "input" is_input: true num_channels: 1 gpu_id: 0 }
        layer { name: "h" num_channels: 8 activation: RECTIFIED_LINEAR gpu_id: 0 }
        layer { name: "out" is_output: true num_channels: 4 activation: SOFTMAX
                data_field: "labels" gpu_id: 1 }
        edge { source: "input" dest: "h" edge_type: FC gpu_id: 0 }
        edge { source: "h" dest: "out" edge_type: FC gpu_id: 1 }
    """
    g = build_graph(config.parse_model(text), {"input": 4})
    assert g.parallel_model == 2
    assert "deriving parallel.model = 2" in capsys.readouterr().out
    # explicit parallel{} wins
    g2 = build_graph(
        config.parse_model(text + "\nparallel { model: 1 }"), {"input": 4}
    )
    assert g2.parallel_model == 1


def test_strict_mode_rejects_unknown_fields(tmp_path):
    """--strict / CONVNET_STRICT_PBTXT: unknown fields fail loudly
    instead of the lenient warn-and-continue default."""
    import pytest
    from google.protobuf import text_format

    from convnet_tpu import config

    bad = tmp_path / "bad.pbtxt"
    bad.write_text('name: "m"\nfuture_field_xyz: 3\n'
                   'layer { name: "input" is_input: true num_channels: 1 image_size: 4 }\n')
    # lenient default: parses with a warning
    m = config.read_model(str(bad))
    assert m.name == "m"
    config.set_strict(True)
    try:
        with pytest.raises(text_format.ParseError):
            config.read_model(str(bad))
    finally:
        config.set_strict(False)


def test_invalid_edge_geometry_fails_loudly():
    import pytest

    from convnet_tpu import config
    from convnet_tpu.graph import build_graph

    tpl = """
    name: "bad"
    layer {{ name: "input" is_input: true num_channels: 3 image_size: 8 }}
    layer {{ name: "c" num_channels: 4 }}
    layer {{ name: "output" is_output: true num_channels: 2 activation: SOFTMAX data_field: "labels" }}
    edge {{ source: "input" dest: "c" edge_type: CONV {geom} initialization: DENSE_GAUSSIAN init_wt: 0.1 }}
    edge {{ source: "c" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }}
    """
    for geom, msg in [
        ("kernel_size: 3 stride: 0 padding: 1", "stride"),
        ("kernel_size: 0 stride: 1 padding: 1", "kernel_size"),
        ("kernel_size: 3 stride: 1 padding: -1", "padding"),
    ]:
        with pytest.raises(ValueError, match=msg):
            build_graph(config.parse_model(tpl.format(geom=geom)))


def test_invalid_dropprob_fails_loudly():
    import pytest

    from convnet_tpu import config
    from convnet_tpu.graph import build_graph

    with pytest.raises(ValueError, match="dropprob"):
        build_graph(config.parse_model("""
        name: "b"
        layer { name: "input" is_input: true num_channels: 3 image_size: 8 }
        layer { name: "f" num_channels: 4 dropprob: 1.5 }
        layer { name: "output" is_output: true num_channels: 2 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "f" edge_type: FC initialization: DENSE_GAUSSIAN init_wt: 0.1 }
        edge { source: "f" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """))


DATA_PBTXTS = [p for p in EXAMPLE_PBTXTS if "data_config" in open(p).read()]


@pytest.mark.parametrize("path", DATA_PBTXTS, ids=os.path.basename)
def test_example_data_config_parses(path):
    """Every examples/ data-config template (train AND val) parses as a
    DatasetConfig with at least one named stream; val templates must be
    deterministic (no shuffle, no jitter)."""
    cfg = config.read_dataset_config(path)
    assert cfg.data_config, path
    for sc in cfg.data_config:
        assert sc.layer_name
    if "_val" in os.path.basename(path):
        assert not cfg.randomize_cpu and not cfg.randomize_gpu
        for sc in cfg.data_config:
            assert not sc.can_translate and not sc.can_flip
