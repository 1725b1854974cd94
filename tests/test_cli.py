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


def test_extract_over_sliding_windows(tmp_path):
    """Dense patchwise eval: SLIDING_WINDOW stream -> extract CLI -> HDF5
    (the reference's SlidingWindowIterator workflow [U])."""
    from PIL import Image
    import numpy as np

    rng = np.random.RandomState(0)
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    paths = []
    for i in range(2):
        arr = rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
        p = str(imgs / f"im{i}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p)
    (imgs / "list.txt").write_text("\n".join(paths))

    model = tmp_path / "m.pbtxt"
    model.write_text(
        """
        name: "win"
        checkpoint_after: 1
        layer { name: "input" is_input: true num_channels: 3 image_size: 16 }
        layer { name: "conv1" num_channels: 8 activation: RECTIFIED_LINEAR }
        layer { name: "pool" num_channels: 8 }
        layer { name: "output" is_output: true num_channels: 4 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.1 }
        edge { source: "conv1" dest: "pool" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
        edge { source: "pool" dest: "output" edge_type: FC initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0 }
        """
    )
    data = tmp_path / "d.pbtxt"
    data.write_text(
        f"""
        name: "wins"
        batch_size: 8
        pipeline_loads: false
        data_config {{ layer_name: "input" data_type: SLIDING_WINDOW
                      file_pattern: "{imgs / 'list.txt'}"
                      image_size: 16 window_stride: 8 num_colors: 3 }}
        """
    )
    # make a checkpoint by initializing params and saving directly
    from convnet_tpu import checkpoint as ckpt, config, model as model_lib
    from convnet_tpu.graph import build_graph
    import jax

    g = build_graph(config.read_model(str(model)))
    params = jax.device_get(model_lib.init_params(g))
    cpath = ckpt.save(str(tmp_path), "win", params, timestamp="20260101000000")

    out = str(tmp_path / "winfeats.h5")
    rc = extract.main([str(model), str(data), "--checkpoint", cpath,
                       "--output", out, "--layers", "pool"])
    assert rc == 0
    import h5py

    with h5py.File(out) as f:
        n = f["pool"].shape[0]
        assert f["pool"].shape[1] == 8 * 8 * 8
        # 2 images, 4x4 window grid each at stride 8 on 40px -> 32 windows,
        # ALL extracted (final partial batch padded then trimmed)
        assert n == 2 * 16


def test_train_cli_data_parallel_mesh(tmp_path):
    """Train through the CLI over a 4-way data-parallel virtual mesh."""
    out = str(tmp_path / "dp")
    rc = train.main([MNIST, DTRAIN, "--output-dir", out, "--max-iter", "4",
                     "--batch-size", "32", "--data-parallel", "4"])
    assert rc == 0
    ckpts = glob.glob(os.path.join(out, "*.h5"))
    assert ckpts, "no checkpoint written by DP training"
    with h5py.File(ckpts[0]) as f:
        assert f.attrs["step"] == 4


def test_extract_with_feature_extractor_config(tmp_path):
    """--config FeatureExtractorConfig.pbtxt supplies output/layers/batch
    (reference: extract_representation run config [U])."""
    out = str(tmp_path / "run")
    train.main([MNIST, DTRAIN, "--output-dir", out, "--max-iter", "2",
                "--batch-size", "16"])
    ckpt = glob.glob(os.path.join(out, "*.h5"))[0]
    feats = str(tmp_path / "fe.h5")
    fecfg = tmp_path / "fe.pbtxt"
    fecfg.write_text(
        f'output_file: "{feats}"\nlayer: "fc1"\nbatch_size: 64\n'
    )
    rc = extract.main([MNIST, DVAL, "--checkpoint", ckpt, "--config", str(fecfg)])
    assert rc == 0
    with h5py.File(feats) as f:
        assert f["fc1"].shape == (1024, 128)


def test_extract_pads_batch_to_mesh_divisible(tmp_path):
    """An indivisible batch size on a meshed model is rounded UP (every row
    still extracted once), never silently degraded to single-device."""
    model = tmp_path / "m.pbtxt"
    with open(MNIST) as f:
        text = f.read()
    model.write_text(text + "\nparallel { data: 4 }")
    out = str(tmp_path / "run")
    train.main([str(model), DTRAIN, "--output-dir", out, "--max-iter", "2",
                "--batch-size", "16"])
    ckpt = glob.glob(os.path.join(out, "*.h5"))[0]
    feats = str(tmp_path / "feats.h5")
    rc = extract.main([str(model), DVAL, "--checkpoint", ckpt, "--output", feats,
                       "--layers", "fc1", "--batch-size", "30"])  # 30 % 4 != 0
    assert rc == 0
    with h5py.File(feats) as f:
        assert f["fc1"].shape == (1024, 128)
        assert np.isfinite(f["fc1"][...]).all()
