"""HDF5 checkpoints.

Reference counterpart: ConvNet::Save / ConvNet::Load
(src/convnet.cc [U]) — timestamped HDF5 snapshots, one weight dataset
per weighted edge (named by the edge), written every
`checkpoint_after` steps; resume restores weights + momentum state +
the step counter. Checkpoint *format* parity is an explicit rebuild
requirement (BASELINE.json north_star: "checkpoint formats are
preserved"): layout is one group per edge name ("source:dest") holding
"w", "b", "w_mom", "b_mom" float32 datasets, with file-level attrs
"step", "model_name", "timestamp".
"""

from __future__ import annotations

import datetime
import os
from typing import Dict, Optional, Tuple

import h5py
import numpy as np


def _timestamp() -> str:
    return datetime.datetime.now().strftime("%Y%m%d%H%M%S")


def checkpoint_path(directory: str, model_name: str, timestamp: str) -> str:
    return os.path.join(directory, f"{model_name}_{timestamp}.h5")


def save(
    directory: str,
    model_name: str,
    params: Dict,
    moms: Optional[Dict] = None,
    step: int = 0,
    timestamp: Optional[str] = None,
) -> str:
    """Write a timestamped checkpoint; returns the file path."""
    os.makedirs(directory, exist_ok=True)
    ts = timestamp or _timestamp()
    path = checkpoint_path(directory, model_name, ts)
    # second-resolution timestamps can collide (fast tests, rapid saves);
    # suffixed names still sort after the base name lexically
    i = 0
    while timestamp is None and os.path.exists(path):
        i += 1
        path = checkpoint_path(directory, model_name, f"{ts}_{i}")
    with h5py.File(path, "w") as f:
        f.attrs["step"] = int(step)
        f.attrs["model_name"] = model_name
        f.attrs["timestamp"] = ts
        for edge_name, leaves in params.items():
            grp = f.create_group(edge_name)
            grp.create_dataset("w", data=np.asarray(leaves["w"], np.float32))
            grp.create_dataset("b", data=np.asarray(leaves["b"], np.float32))
            if moms is not None:
                grp.create_dataset("w_mom", data=np.asarray(moms[edge_name]["w"], np.float32))
                grp.create_dataset("b_mom", data=np.asarray(moms[edge_name]["b"], np.float32))
    return path


def load(path: str) -> Tuple[Dict, Optional[Dict], int]:
    """Read (params, moms_or_None, step) from a checkpoint file."""
    params: Dict = {}
    moms: Dict = {}
    have_moms = False
    with h5py.File(path, "r") as f:
        step = int(f.attrs.get("step", 0))
        for edge_name, grp in f.items():
            params[edge_name] = {"w": grp["w"][...], "b": grp["b"][...]}
            if "w_mom" in grp:
                have_moms = True
                moms[edge_name] = {"w": grp["w_mom"][...], "b": grp["b_mom"][...]}
    return params, (moms if have_moms else None), step


def load_edge(path: str, edge_name: str) -> Dict:
    """Read one edge's weights (PRETRAINED initialization)."""
    with h5py.File(path, "r") as f:
        if edge_name not in f:
            raise KeyError(f"edge {edge_name!r} not in checkpoint {path}")
        grp = f[edge_name]
        return {"w": grp["w"][...], "b": grp["b"][...]}


def latest(directory: str, model_name: str) -> Optional[str]:
    """Most recent checkpoint for a model (timestamps sort lexically)."""
    if not os.path.isdir(directory):
        return None
    prefix = f"{model_name}_"
    files = [
        f
        for f in os.listdir(directory)
        if f.startswith(prefix) and f.endswith(".h5")
    ]
    if not files:
        return None
    return os.path.join(directory, sorted(files)[-1])
