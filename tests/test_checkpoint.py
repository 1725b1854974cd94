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
