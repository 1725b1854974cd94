"""HDF5 checkpoint layout: save/load round-trip, latest(), PRETRAINED init
(reference: ConvNet::Save/Load [U]; format parity is a BASELINE requirement)."""

import numpy as np
import h5py

from convnet_tpu import checkpoint as ckpt
from convnet_tpu import config, model as model_lib
from convnet_tpu.graph import build_graph


def _params():
    return {
        "a:b": {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(3, np.float32)},
        "b:c": {"w": np.full((3, 4), 0.5, np.float32), "b": np.zeros(4, np.float32)},
    }


def test_round_trip_exact(tmp_path):
    params = _params()
    moms = {k: {n: v * 0.1 for n, v in d.items()} for k, d in params.items()}
    path = ckpt.save(str(tmp_path), "m", params, moms, step=42, timestamp="20260101000000")
    p2, m2, step = ckpt.load(path)
    assert step == 42
    for k in params:
        np.testing.assert_array_equal(p2[k]["w"], params[k]["w"])
        np.testing.assert_array_equal(m2[k]["b"], moms[k]["b"])


def test_layout_is_edge_named_groups(tmp_path):
    path = ckpt.save(str(tmp_path), "m", _params(), step=1, timestamp="20260101000000")
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {"a:b", "b:c"}
        assert set(f["a:b"].keys()) == {"w", "b"}
        assert f.attrs["model_name"] == "m"
        assert f.attrs["step"] == 1


def test_latest_picks_newest(tmp_path):
    ckpt.save(str(tmp_path), "m", _params(), timestamp="20260101000000")
    p2 = ckpt.save(str(tmp_path), "m", _params(), timestamp="20260102000000")
    ckpt.save(str(tmp_path), "other", _params(), timestamp="20260103000000")
    assert ckpt.latest(str(tmp_path), "m") == p2
    assert ckpt.latest(str(tmp_path), "missing") is None
    assert ckpt.latest("/nonexistent-dir", "m") is None


def test_pretrained_initialization(tmp_path):
    donor = {
        "input:output": {
            "w": np.random.RandomState(0).randn(6, 3).astype(np.float32),
            "b": np.arange(3, dtype=np.float32),
        }
    }
    path = ckpt.save(str(tmp_path), "donor", donor, timestamp="20260101000000")
    m = config.parse_model(
        f"""
        name: "recv"
        layer {{ name: "input" is_input: true num_channels: 6 }}
        layer {{ name: "output" is_output: true num_channels: 3 activation: SOFTMAX }}
        edge {{ source: "input" dest: "output" edge_type: FC
               initialization: PRETRAINED pretrained_model: "{path}" }}
        """
    )
    g = build_graph(m)
    params = model_lib.init_params(g)
    np.testing.assert_array_equal(np.asarray(params["input:output"]["w"]), donor["input:output"]["w"])
    np.testing.assert_array_equal(np.asarray(params["input:output"]["b"]), donor["input:output"]["b"])


def test_wrong_checkpoint_yields_clear_error(tmp_path):
    from convnet_tpu import config as cfg, model as model_lib
    from convnet_tpu.graph import build_graph
    import jax.numpy as jnp
    import pytest

    g = build_graph(cfg.parse_model(
        """
        name: "m"
        layer { name: "input" is_input: true num_channels: 4 }
        layer { name: "output" is_output: true num_channels: 2 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "output" edge_type: FC }
        """
    ))
    with pytest.raises(ValueError, match="wrong checkpoint"):
        model_lib.apply_fn(g, {"other:edge": {"w": jnp.zeros((4, 2)), "b": jnp.zeros(2)}},
                           {"input": jnp.ones((2, 1, 1, 4))})


# ---------------------------------------------------------------------------
# layout-variant auto-detection (docs/checkpoint_format.md): the upstream
# byte layout is unverifiable while the reference mount is empty, so load()
# must accept the plausible variants
# ---------------------------------------------------------------------------


def _shapes():
    return {
        "a:b": {"w": (2, 3), "b": (3,)},
        "b:c": {"w": (3, 4), "b": (4,)},
    }


def test_load_aliased_group_variant(tmp_path):
    """Variant B: weight/bias dataset names instead of w/b."""
    params = _params()
    path = str(tmp_path / "alias.h5")
    with h5py.File(path, "w") as f:
        f.attrs["step"] = 7
        for name, l in params.items():
            g = f.create_group(name)
            g.create_dataset("weight", data=l["w"])
            g.create_dataset("bias", data=l["b"])
            g.create_dataset("weight_mom", data=l["w"] * 0.1)
            g.create_dataset("bias_mom", data=l["b"] * 0.1)
    p2, m2, step = ckpt.load(path, expected_shapes=_shapes())
    assert step == 7
    for k in params:
        np.testing.assert_array_equal(p2[k]["w"], params[k]["w"])
        np.testing.assert_allclose(m2[k]["w"], params[k]["w"] * 0.1)


def test_load_flat_dataset_variant(tmp_path):
    """Variant C: /<edge> is the weight dataset; bias at /<edge>_bias."""
    params = _params()
    path = str(tmp_path / "flat.h5")
    with h5py.File(path, "w") as f:
        f.attrs["step"] = 3
        for name, l in params.items():
            f.create_dataset(name, data=l["w"])
            f.create_dataset(name + "_bias", data=l["b"])
    p2, m2, step = ckpt.load(path, expected_shapes=_shapes())
    assert step == 3 and m2 is None
    for k in params:
        np.testing.assert_array_equal(p2[k]["w"], params[k]["w"])
        np.testing.assert_array_equal(p2[k]["b"], params[k]["b"])


def test_load_transposed_weights(tmp_path):
    """2D weights stored transposed are coerced back via expected_shapes."""
    params = _params()
    path = str(tmp_path / "t.h5")
    with h5py.File(path, "w") as f:
        for name, l in params.items():
            g = f.create_group(name)
            g.create_dataset("w", data=l["w"].T)
            g.create_dataset("b", data=l["b"])
    p2, _, _ = ckpt.load(path, expected_shapes=_shapes())
    for k in params:
        np.testing.assert_array_equal(p2[k]["w"], params[k]["w"])


def test_load_cudaconvnet_flattened_conv_filters(tmp_path):
    """(out_c, k*k*in_c)-flattened conv filters reshape/permute to HWIO."""
    w = np.random.RandomState(0).randn(5, 5, 3, 16).astype(np.float32)  # HWIO
    flat = w.transpose(3, 0, 1, 2).reshape(16, -1)  # (out_c, k*k*in_c)
    path = str(tmp_path / "c.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("input:conv1")
        g.create_dataset("w", data=flat)
        g.create_dataset("b", data=np.zeros(16, np.float32))
    shapes = {"input:conv1": {"w": (5, 5, 3, 16), "b": (16,)}}
    p2, _, _ = ckpt.load(path, expected_shapes=shapes)
    np.testing.assert_array_equal(p2["input:conv1"]["w"], w)


def test_load_missing_bias_zeros(tmp_path):
    path = str(tmp_path / "nb.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("a:b", data=np.ones((2, 3), np.float32))
    p2, _, _ = ckpt.load(path, expected_shapes=_shapes())
    np.testing.assert_array_equal(p2["a:b"]["b"], np.zeros(3, np.float32))


def test_incompatible_shape_raises(tmp_path):
    path = str(tmp_path / "bad.h5")
    with h5py.File(path, "w") as f:
        g = f.create_group("a:b")
        g.create_dataset("w", data=np.ones((7, 9), np.float32))
        g.create_dataset("b", data=np.zeros(3, np.float32))
    import pytest

    with pytest.raises(ValueError, match="incompatible"):
        ckpt.load(path, expected_shapes=_shapes())


def test_resume_from_flat_variant_end_to_end(tmp_path):
    """Trainer resume accepts a variant-layout checkpoint (shapes from the
    live graph)."""
    model = config.parse_model(
        """
        name: "vr"
        seed: 1
        layer { name: "input" is_input: true num_channels: 1 }
        layer { name: "out" is_output: true num_channels: 4 activation: SOFTMAX
                data_field: "labels" }
        edge { source: "input" dest: "out" edge_type: FC }
        batch_size: 8
        max_iter: 2
        """
    )
    graph = build_graph(model, {"input": 6})
    params = model_lib.init_params(graph)
    # write the flat variant by hand at step 5
    path = str(tmp_path / "vr_20260101000000.h5")
    with h5py.File(path, "w") as f:
        f.attrs["step"] = 5
        f.create_dataset("input:out", data=np.asarray(params["input:out"]["w"]).T)
        f.create_dataset("input:out_bias", data=np.asarray(params["input:out"]["b"]))
    from convnet_tpu.model import param_shapes

    p2, _, step = ckpt.load(path, expected_shapes=param_shapes(graph))
    assert step == 5
    np.testing.assert_array_equal(p2["input:out"]["w"], np.asarray(params["input:out"]["w"]))


def test_released_digits_checkpoint_loads_and_classifies():
    """The SHIPPED pretrained checkpoint (examples/digits/) must load
    through the public path and classify real digits — this pins the
    on-disk checkpoint format across rounds with real bytes, and is
    the rebuild's analog of the reference's released pretrained net."""
    import os

    import numpy as np
    from sklearn.datasets import load_digits

    from convnet_tpu import config
    from convnet_tpu.graph import build_graph
    from convnet_tpu.predictor import Predictor

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = config.read_model(os.path.join(here, "examples/digits/digits.pbtxt"))
    graph = build_graph(model, {"input": 8})

    d = load_digits()
    images = (d.images * (255.0 / 16.0)).astype(np.uint8)[..., None]
    labels = d.target
    # the released net's held-out split (seed 0, rows 1500:)
    order = np.random.RandomState(0).permutation(len(images))
    va = order[1500:]
    x = images[va].astype(np.float32) * (1.0 / 255.0)
    p = Predictor.from_checkpoint(
        graph,
        os.path.join(here, "examples/digits/digits_pretrained.h5"),
        batch_size=128,
    )
    preds = []
    for i in range(0, len(va), 128):
        preds.append(p.predict_labels({"input": x[i : i + 128]}))
    err = float(np.mean(np.concatenate(preds) != labels[va]))
    assert err < 0.05, f"released digits net error {err:.3f}"
