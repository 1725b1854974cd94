"""Compute the mean/std statistics file consumed by DataStreamConfig.mean_file.

Reference counterpart: the mean-file computation helper in the
reference's data-prep scripts [U]. Streams over an HDF5 image dataset
and writes "mean" and "std" datasets, either full-pixel
(size, size, colors) or per-channel (--per-channel).

Usage:
    python tools/compute_mean.py DATA.h5 MEAN.h5 [--dataset data] [--per-channel]
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--dataset", default="data")
    p.add_argument("--per-channel", action="store_true")
    p.add_argument("--chunk", type=int, default=1024)
    args = p.parse_args(argv)

    with h5py.File(args.input, "r") as f:
        ds = f[args.dataset]
        n = ds.shape[0]
        acc = None
        acc2 = None
        for start in range(0, n, args.chunk):
            block = ds[start : start + args.chunk].astype(np.float64)
            if args.per_channel:
                block = block.reshape(-1, block.shape[-1])
                s, s2 = block.sum(0), (block**2).sum(0)
                count = block.shape[0]
            else:
                s, s2 = block.sum(0), (block**2).sum(0)
                count = block.shape[0]
            if acc is None:
                acc, acc2, total = s, s2, count
            else:
                acc += s
                acc2 += s2
                total += count
        mean = acc / total
        std = np.sqrt(np.maximum(acc2 / total - mean**2, 1e-12))

    with h5py.File(args.output, "w") as f:
        f.create_dataset("mean", data=mean.astype(np.float32))
        f.create_dataset("std", data=std.astype(np.float32))
    print(f"wrote {args.output}: mean shape {mean.shape}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
