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


# Dataset-name aliases across plausible upstream layouts (the reference
# mount is unavailable — see docs/checkpoint_format.md; auto-detection
# keeps parity a config change, not a rewrite, once the real layout is
# verifiable).
_W_NAMES = ("w", "weight", "weights")
_B_NAMES = ("b", "bias", "biases")
_WM_NAMES = ("w_mom", "weight_mom", "w_momentum", "dw_history")
_BM_NAMES = ("b_mom", "bias_mom", "b_momentum", "db_history")
_FLAT_B_SUFFIXES = ("_bias", "_b")
_FLAT_WM_SUFFIXES = ("_w_mom", "_weight_mom", "_mom")
_FLAT_BM_SUFFIXES = ("_b_mom", "_bias_mom")


def _pick(grp, names):
    for n in names:
        if n in grp:
            return grp[n][...]
    return None


def _strip_suffix(name: str, suffixes) -> Optional[str]:
    for s in suffixes:
        if name.endswith(s):
            return name[: -len(s)]
    return None


def _coerce_weight(arr: np.ndarray, expected: Optional[Tuple[int, ...]]) -> np.ndarray:
    """Fix transposed / flattened weight layouts against the model's
    expected shape. 2D transposes and (out, k*k*in)-style flattenings of
    4D conv filters are the plausible upstream variants."""
    if expected is None or tuple(arr.shape) == tuple(expected):
        return arr
    expected = tuple(expected)
    if arr.ndim == 2 and len(expected) == 2 and arr.shape == expected[::-1]:
        return arr.T
    if arr.size == int(np.prod(expected)) and len(expected) == 4:
        k1, k2, cin, cout = expected
        if arr.ndim == 2 and arr.shape[0] == cout:
            # (cout, k*k*cin) row-major -> HWIO
            return arr.reshape(cout, k1, k2, cin).transpose(1, 2, 3, 0)
        if arr.ndim == 2 and arr.shape[1] == cout:
            # (k*k*cin, cout) -> HWIO
            return arr.reshape(k1, k2, cin, cout)
    if arr.size == int(np.prod(expected)):
        return arr.reshape(expected)
    raise ValueError(
        f"checkpoint weight shape {arr.shape} incompatible with model shape {expected}"
    )


def load(
    path: str, expected_shapes: Optional[Dict] = None
) -> Tuple[Dict, Optional[Dict], int]:
    """Read (params, moms_or_None, step) from a checkpoint file.

    Accepts, by auto-detection (see docs/checkpoint_format.md):
      A. this framework's layout — one group per edge with w/b(/w_mom/b_mom);
      B. group-per-edge with aliased dataset names (weight/bias/...);
      C. flat layout — f["src:dst"] a weight dataset, bias at
         f["src:dst_bias"] (momentum via _mom-suffixed datasets).
    When ``expected_shapes`` ({edge: {"w": shape, "b": shape}}) is given,
    transposed/flattened weight matrices are coerced to the model layout.
    """
    params: Dict = {}
    moms: Dict = {}
    have_moms = False

    def exp(edge, key):
        if expected_shapes and edge in expected_shapes:
            v = expected_shapes[edge].get(key)
            return tuple(np.shape(v)) if not isinstance(v, tuple) else v
        return None

    with h5py.File(path, "r") as f:
        step = int(f.attrs.get("step", 0))
        flat_w: Dict[str, np.ndarray] = {}
        flat_other: Dict[str, np.ndarray] = {}
        for name, item in f.items():
            if isinstance(item, h5py.Group):
                w = _pick(item, _W_NAMES)
                b = _pick(item, _B_NAMES)
                if w is None:
                    raise ValueError(
                        f"checkpoint {path}: group {name!r} has no weight dataset "
                        f"(looked for {_W_NAMES})"
                    )
                params[name] = {
                    "w": _coerce_weight(w, exp(name, "w")),
                    "b": b if b is not None else None,
                }
                wm, bm = _pick(item, _WM_NAMES), _pick(item, _BM_NAMES)
                if wm is not None:
                    have_moms = True
                    moms[name] = {
                        "w": _coerce_weight(wm, exp(name, "w")),
                        "b": bm,
                    }
            else:  # flat dataset layout
                base = _strip_suffix(name, _FLAT_B_SUFFIXES + _FLAT_WM_SUFFIXES + _FLAT_BM_SUFFIXES)
                if base is None:
                    flat_w[name] = item[...]
                else:
                    flat_other[name] = item[...]
        for name, w in flat_w.items():
            b = next(
                (flat_other[name + s] for s in _FLAT_B_SUFFIXES if name + s in flat_other),
                None,
            )
            params[name] = {"w": _coerce_weight(w, exp(name, "w")), "b": b}
            wm = next(
                (flat_other[name + s] for s in _FLAT_WM_SUFFIXES if name + s in flat_other),
                None,
            )
            if wm is not None:
                have_moms = True
                bm = next(
                    (flat_other[name + s] for s in _FLAT_BM_SUFFIXES if name + s in flat_other),
                    None,
                )
                moms[name] = {"w": _coerce_weight(wm, exp(name, "w")), "b": bm}
    # normalize missing biases/momenta to zeros of the right shape
    for name, leaves in params.items():
        if leaves["b"] is None:
            e = exp(name, "b")
            leaves["b"] = np.zeros(e if e else (leaves["w"].shape[-1],), np.float32)
    for name, leaves in moms.items():
        if leaves.get("b") is None:
            leaves["b"] = np.zeros_like(params[name]["b"])
    return params, (moms if have_moms else None), step


def load_edge(path: str, edge_name: str, expected_shape=None) -> Dict:
    """Read one edge's weights (PRETRAINED initialization). Accepts the
    same layout variants as load()."""
    with h5py.File(path, "r") as f:
        if edge_name not in f:
            raise KeyError(f"edge {edge_name!r} not in checkpoint {path}")
        item = f[edge_name]
        if isinstance(item, h5py.Group):
            w = _pick(item, _W_NAMES)
            b = _pick(item, _B_NAMES)
        else:
            w = item[...]
            b = next(
                (f[edge_name + s][...] for s in _FLAT_B_SUFFIXES if edge_name + s in f),
                None,
            )
        w = _coerce_weight(w, expected_shape)
        if b is None:
            b = np.zeros((w.shape[-1],), np.float32)
        return {"w": w, "b": b}


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
