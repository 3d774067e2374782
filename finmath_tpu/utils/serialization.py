"""Checkpoint / restore of calibrated models.

The reference's only serialization story is the ATM test round-tripping a
calibrated LMM through Java serialization and asserting identical
revaluation to 1e-12 (LIBORMarketModelCalibrationATMTest.java:404-448);
the device class itself is NOT serializable (device pointers). Here model
state is parameter pytrees + plain-data config, so checkpointing is
trivially exact: save as .npz (self-describing, dependency-free), restore,
and revaluation is bit-identical because valuation is a deterministic
function of (parameters, seed, shapes).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np


def save_checkpoint(path: str, parameters: np.ndarray,
                    metadata: Dict[str, Any] = None) -> None:
    """Save a calibrated parameter vector + JSON-serializable metadata."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        path,
        parameters=np.asarray(parameters, dtype=np.float64),
        metadata=json.dumps(metadata or {}),
    )


def load_checkpoint(path: str):
    """Returns (parameters float64 array, metadata dict)."""
    # append .npz exactly like np.savez does on save — NOT with_suffix,
    # which would REPLACE a dotted name segment ("model.v2" -> "model.npz")
    p = str(path) if str(path).endswith(".npz") else str(path) + ".npz"
    with np.load(p, allow_pickle=False) as data:
        params = data["parameters"]
        metadata = json.loads(str(data["metadata"]))
    return params, metadata
