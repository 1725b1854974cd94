"""End-to-end convergence smoke: synthetic 10-class image task through
the full stack — HDF5 shards from our tools, mean file, jitter, train
CLI, validation — must reach high accuracy (SURVEY.md §4 implication
(c): the reference validated behavior by training examples to expected
error)."""

import os
import sys

import h5py

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_synthetic_task_converges(tmp_path):
    from tools.make_synth_dataset import generate

    from convnet_tpu import config
    from convnet_tpu.data.datahandler import DataHandler
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import Trainer

    # build shards with the real tools' layout
    for name, rows, seed in [("train", 2048, 0), ("val", 512, 1)]:
        data, labels = generate(rows, 24, seed)
        with h5py.File(str(tmp_path / f"{name}.h5"), "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("labels", data=labels)
    # mean/std file via the real tool
    from tools.compute_mean import main as mean_main

    mean_main([str(tmp_path / "train.h5"), str(tmp_path / "mean.h5"), "--per-channel"])

    def data_cfg(split, randomize):
        return config.parse_dataset_config(
            f"""
            name: "{split}"
            batch_size: 64
            randomize_cpu: {randomize}
            pipeline_loads: true
            data_config {{ layer_name: "input" data_type: HDF5
                          file_pattern: "{tmp_path / (split + '.h5')}"
                          dataset_name: "data" image_size: 22 raw_image_size: 24
                          num_colors: 3 can_translate: true can_flip: true
                          mean_file: "{tmp_path / 'mean.h5'}" normalize: true }}
            data_config {{ layer_name: "labels" data_type: HDF5
                          file_pattern: "{tmp_path / (split + '.h5')}"
                          dataset_name: "labels" }}
            """
        )

    model = config.parse_model(
        """
        name: "synth"
        seed: 5
        batch_size: 64
        max_iter: 400
        display_after: 100
        layer { name: "input" is_input: true num_channels: 3 }
        layer { name: "conv1" num_channels: 16 activation: RECTIFIED_LINEAR }
        layer { name: "pool1" num_channels: 16 }
        layer { name: "rnorm1" num_channels: 16 }
        layer { name: "conv2" num_channels: 32 activation: RECTIFIED_LINEAR }
        layer { name: "pool2" num_channels: 32 }
        layer { name: "fc1" num_channels: 64 activation: RECTIFIED_LINEAR dropprob: 0.25 }
        layer { name: "output" is_output: true num_channels: 10 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 5 stride: 1 padding: 2
               initialization: DENSE_GAUSSIAN init_wt: 0.05
               weight_optimizer { base_epsilon: 0.02 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.0005 }
               bias_optimizer { base_epsilon: 0.04 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 } }
        edge { source: "conv1" dest: "pool1" edge_type: MAXPOOL kernel_size: 3 stride: 2 }
        edge { source: "pool1" dest: "rnorm1" edge_type: RESPONSE_NORM
               add_scale: 0.0001 pow_scale: 0.75 frac_of_filters_response_norm: 0.25 }
        edge { source: "rnorm1" dest: "conv2" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.05
               weight_optimizer { base_epsilon: 0.02 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.0005 }
               bias_optimizer { base_epsilon: 0.04 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 } }
        edge { source: "conv2" dest: "pool2" edge_type: MAXPOOL kernel_size: 3 stride: 2 }
        edge { source: "pool2" dest: "fc1" edge_type: FC
               initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
               weight_optimizer { base_epsilon: 0.02 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.001 }
               bias_optimizer { base_epsilon: 0.04 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 } }
        edge { source: "fc1" dest: "output" edge_type: FC
               initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
               weight_optimizer { base_epsilon: 0.02 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.001 }
               bias_optimizer { base_epsilon: 0.04 epsilon_decay: INVERSE_T epsilon_decay_timescale: 250 initial_momentum: 0.9 final_momentum: 0.9 } }
        """
    )
    train_data = DataHandler(data_cfg("train", "true"), seed=0)
    val_data = DataHandler(data_cfg("val", "false"), randomize=False)
    graph = build_graph(model, train_data.input_image_sizes())
    tr = Trainer(graph, train_data, val_data, checkpoint_dir=str(tmp_path / "out"),
                 log_fn=lambda *_: None)
    tr.train()
    err, loss = tr.validate()
    train_data.close()
    val_data.close()
    assert err < 0.20, f"validation error {err:.3f} (loss {loss:.3f}) — failed to learn"


def test_real_digits_converge(tmp_path):
    """Train on REAL images (sklearn's 8x8 handwritten digits, shipped
    in-package — the only real dataset available offline) through the
    full stack: HDF5 shards -> DataHandler -> Trainer -> validate.
    The reference validated itself exactly this way: train an example
    config to expected error (SURVEY.md §4.3)."""
    import numpy as np
    from sklearn.datasets import load_digits

    from convnet_tpu import config
    from convnet_tpu.data.datahandler import DataHandler
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import Trainer

    d = load_digits()
    images = (d.images * (255.0 / 16.0)).astype(np.uint8)[..., None]  # (N,8,8,1)
    labels = d.target.astype(np.int64)
    rng = np.random.RandomState(0)
    order = rng.permutation(len(images))
    tr_idx, va_idx = order[:1500], order[1500:]
    for name, idx in [("train", tr_idx), ("val", va_idx)]:
        with h5py.File(str(tmp_path / f"{name}.h5"), "w") as f:
            f.create_dataset("data", data=images[idx])
            f.create_dataset("labels", data=labels[idx])

    def data_cfg(split, randomize):
        return config.parse_dataset_config(
            f"""
            name: "{split}"
            batch_size: 64
            randomize_cpu: {randomize}
            pipeline_loads: true
            data_config {{ layer_name: "input" data_type: HDF5
                          file_pattern: "{tmp_path / (split + '.h5')}"
                          dataset_name: "data" image_size: 8
                          num_colors: 1 scale: 0.00392156862 }}
            data_config {{ layer_name: "labels" data_type: HDF5
                          file_pattern: "{tmp_path / (split + '.h5')}"
                          dataset_name: "labels" }}
            """
        )

    model = config.parse_model(
        """
        name: "digits"
        seed: 3
        batch_size: 64
        max_iter: 400
        display_after: 200
        layer { name: "input" is_input: true num_channels: 1 image_size: 8 }
        layer { name: "conv1" num_channels: 16 activation: RECTIFIED_LINEAR }
        layer { name: "pool1" num_channels: 16 }
        layer { name: "fc1" num_channels: 64 activation: RECTIFIED_LINEAR dropprob: 0.2 }
        layer { name: "output" is_output: true num_channels: 10 activation: SOFTMAX data_field: "labels" }
        edge { source: "input" dest: "conv1" edge_type: CONV kernel_size: 3 stride: 1 padding: 1
               initialization: DENSE_GAUSSIAN init_wt: 0.1
               weight_optimizer { base_epsilon: 0.05 epsilon_decay: INVERSE_T epsilon_decay_timescale: 300 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.0005 }
               bias_optimizer { base_epsilon: 0.1 initial_momentum: 0.9 final_momentum: 0.9 } }
        edge { source: "conv1" dest: "pool1" edge_type: MAXPOOL kernel_size: 2 stride: 2 }
        edge { source: "pool1" dest: "fc1" edge_type: FC
               initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
               weight_optimizer { base_epsilon: 0.05 epsilon_decay: INVERSE_T epsilon_decay_timescale: 300 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.001 }
               bias_optimizer { base_epsilon: 0.1 initial_momentum: 0.9 final_momentum: 0.9 } }
        edge { source: "fc1" dest: "output" edge_type: FC
               initialization: DENSE_GAUSSIAN_SQRT_FAN_IN init_wt: 1.0
               weight_optimizer { base_epsilon: 0.05 epsilon_decay: INVERSE_T epsilon_decay_timescale: 300 initial_momentum: 0.9 final_momentum: 0.9 l2_decay: 0.001 }
               bias_optimizer { base_epsilon: 0.1 initial_momentum: 0.9 final_momentum: 0.9 } }
        """
    )
    train = DataHandler(data_cfg("train", "true"), seed=0)
    val = DataHandler(data_cfg("val", "false"), randomize=False)
    graph = build_graph(model, train.input_image_sizes())
    tr = Trainer(graph, train, val, checkpoint_dir=str(tmp_path / "out"),
                 log_fn=lambda *_: None)
    tr.train()
    err, loss = tr.validate()
    train.close()
    val.close()
    # real handwritten digits: a tiny convnet gets well under 10% error
    assert err < 0.10, f"digits validation error {err:.3f} (loss {loss:.3f})"
