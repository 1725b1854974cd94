"""Reproduce examples/digits/digits_pretrained.h5 (the released net).

Trains the digits classifier on sklearn's 8x8 handwritten digits (the
only real image dataset available offline) and copies the final
checkpoint into examples/digits/. ~1 minute on CPU.

    python tools/train_digits_release.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_TPL = """name: "%s"
batch_size: 64
randomize_cpu: %s
pipeline_loads: true
data_config { layer_name: "input" data_type: HDF5
              file_pattern: "%s"
              dataset_name: "data" image_size: 8
              num_colors: 1 scale: 0.00392156862 }
data_config { layer_name: "labels" data_type: HDF5
              file_pattern: "%s"
              dataset_name: "labels" }
"""


def write_shards(outdir: str):
    """Deterministic 1500/297 split of the sklearn digits (seed 0)."""
    from sklearn.datasets import load_digits

    d = load_digits()
    images = (d.images * (255.0 / 16.0)).astype(np.uint8)[..., None]
    labels = d.target.astype(np.int64)
    order = np.random.RandomState(0).permutation(len(images))
    paths = {}
    for name, idx in [("train", order[:1500]), ("val", order[1500:])]:
        p = os.path.join(outdir, f"{name}.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("data", data=images[idx])
            f.create_dataset("labels", data=labels[idx])
        paths[name] = p
    return paths


def main():
    from convnet_tpu import config
    from convnet_tpu.data.datahandler import DataHandler
    from convnet_tpu.graph import build_graph
    from convnet_tpu.trainer import Trainer

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        paths = write_shards(tmp)
        train = DataHandler(
            config.parse_dataset_config(
                DATA_TPL % ("train", "true", paths["train"], paths["train"])
            ),
            seed=0,
        )
        val = DataHandler(
            config.parse_dataset_config(
                DATA_TPL % ("val", "false", paths["val"], paths["val"])
            ),
            randomize=False,
        )
        model = config.read_model(os.path.join(here, "examples/digits/digits.pbtxt"))
        graph = build_graph(model, train.input_image_sizes())
        out = os.path.join(tmp, "out")
        tr = Trainer(graph, train, val, checkpoint_dir=out, log_fn=print)
        tr.train()
        err, loss = tr.validate()
        print(f"final val err {err:.4f} loss {loss:.4f}")
        ck = sorted(glob.glob(os.path.join(out, "digits_*.h5")))[-1]
        dest = os.path.join(here, "examples/digits/digits_pretrained.h5")
        shutil.copy(ck, dest)
        print("shipped", dest)
        train.close()
        val.close()


if __name__ == "__main__":
    main()
