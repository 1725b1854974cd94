"""Convert an HDF5 dataset to the memory-mapped raw cache format
(DataStreamConfig.data_type: RAW_CACHE) consumed by the native C++
gather core — the high-throughput training input path.

Usage:
    python tools/make_raw_cache.py IN.h5 DATASET OUT.cache
"""

from __future__ import annotations

import argparse

import h5py
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input")
    p.add_argument("dataset")
    p.add_argument("output")
    p.add_argument("--chunk", type=int, default=4096)
    args = p.parse_args(argv)

    import json
    import struct

    from convnet_tpu.data.native import write_raw_cache

    with h5py.File(args.input, "r") as f:
        ds = f[args.dataset]
        n = ds.shape[0]
        if n * ds.dtype.itemsize * int(np.prod(ds.shape[1:])) < 1 << 30:
            write_raw_cache(args.output, ds[...])
        else:  # stream big datasets
            row_bytes = ds.dtype.itemsize * int(np.prod(ds.shape[1:]))
            with open(args.output, "wb") as out:
                out.write(b"CNTC")
                out.write(struct.pack("<I", 1))
                out.write(struct.pack("<Q", row_bytes))
                for s in range(0, n, args.chunk):
                    np.ascontiguousarray(ds[s : s + args.chunk]).tofile(out)
            with open(args.output + ".json", "w") as f2:
                json.dump({"dtype": ds.dtype.name, "shape": list(ds.shape[1:])}, f2)
    print(f"wrote {args.output}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
