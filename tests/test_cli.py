"""CLI surface tests (reference CLIs: train_convnet /
extract_representation / grad_check [U]) — run in-process on the CPU
backend from conftest."""

import glob
import os

import h5py
import numpy as np
import pytest

from convnet_tpu.cli import extract, grad_check, train

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MNIST = os.path.join(REPO, "examples/mnist/mnist_lenet.pbtxt")
DTRAIN = os.path.join(REPO, "examples/mnist/mnist_dummy_train.pbtxt")
DVAL = os.path.join(REPO, "examples/mnist/mnist_dummy_val.pbtxt")


def test_train_then_extract_roundtrip(tmp_path):
    out = str(tmp_path / "run")
    rc = train.main([MNIST, DTRAIN, DVAL, "--output-dir", out, "--max-iter", "4",
                     "--batch-size", "16"])
    assert rc == 0
    ckpts = glob.glob(os.path.join(out, "*.h5"))
    assert len(ckpts) == 1
    log = os.path.join(out, "mnist_lenet_train_log.txt")
    assert os.path.exists(log)

    feats = str(tmp_path / "feats.h5")
    rc = extract.main([MNIST, DVAL, "--checkpoint", ckpts[0], "--output", feats,
                       "--layers", "fc1", "--batch-size", "64"])
    assert rc == 0
    with h5py.File(feats) as f:
        assert f["fc1"].shape == (1024, 128)
        assert np.isfinite(f["fc1"][...]).all()


def test_train_resumes_from_checkpoint(tmp_path):
    out = str(tmp_path / "run")
    train.main([MNIST, DTRAIN, "--output-dir", out, "--max-iter", "3",
                "--batch-size", "16"])
    first = glob.glob(os.path.join(out, "*.h5"))
    assert first
    # second invocation resumes (log line) and continues to 6
    rc = train.main([MNIST, DTRAIN, "--output-dir", out, "--max-iter", "6",
                     "--batch-size", "16"])
    assert rc == 0
    with h5py.File(sorted(glob.glob(os.path.join(out, "*.h5")))[-1]) as f:
        assert f.attrs["step"] == 6


def test_grad_check_cli_passes_on_tiny_model(tmp_path):
    model = tmp_path / "tiny.pbtxt"
    model.write_text(
        """
        name: "t"
        layer { name: "input" is_input: true num_channels: 4 image_size: 6 }
        layer { name: "h" num_channels: 8 activation: TANH }
        layer { name: "output" is_output: true num_channels: 3 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "h" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.2 }
        edge { source: "h" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    )
    rc = grad_check.main([str(model), "--samples", "5", "--batch-size", "4"])
    assert rc == 0


def test_extract_rejects_unknown_layer(tmp_path):
    out = str(tmp_path / "run")
    train.main([MNIST, DTRAIN, "--output-dir", out, "--max-iter", "1",
                "--batch-size", "16"])
    ckpt = glob.glob(os.path.join(out, "*.h5"))[0]
    with pytest.raises(KeyError):
        extract.main([MNIST, DVAL, "--checkpoint", ckpt,
                      "--output", str(tmp_path / "x.h5"), "--layers", "nope"])
