"""Checkpoint/resume for the streaming scan and kinship accumulation.

The reference has NO in-process checkpointing (SURVEY.md §5): a crashed
stage restarts from zero. Here both long-running streams are resumable:

  * scan: the carried TopKState + the next table row to read
  * kinship: the int64 host accumulator + row counter + next row

State is written atomically (tmp + os.replace) as an .npz beside the output
so a killed multi-hour 1001G run restarts from the last saved batch boundary.
"""
from __future__ import annotations

import os

import numpy as np

from ..ops import topk as topk_ops


def _atomic_savez(path: str, **arrays) -> None:
    path = str(path)
    if not path.endswith(".npz"):
        path += ".npz"
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _norm(path: str) -> str:
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_scan_state(path: str, state: topk_ops.TopKState, next_row: int,
                    n_tested: int, stream: str = "table") -> None:
    """`stream` tags what `next_row` indexes: "table" = absolute .table row,
    "dtable" = row in the device-native cache. A resume only applies when
    the stream kind matches (the two row spaces differ after MAC filtering)."""
    _atomic_savez(path, scores=np.asarray(state.scores),
                  row_lo=np.asarray(state.row_lo),
                  row_hi=np.asarray(state.row_hi),
                  next_row=np.int64(next_row), n_tested=np.int64(n_tested),
                  stream=np.array(stream))


def load_scan_state(path: str):
    """-> (TopKState, next_row, n_tested, stream) or None if absent."""
    if not os.path.exists(_norm(path)):
        return None
    import jax.numpy as jnp
    z = np.load(_norm(path))
    state = topk_ops.TopKState(scores=jnp.asarray(z["scores"]),
                               row_lo=jnp.asarray(z["row_lo"]),
                               row_hi=jnp.asarray(z["row_hi"]))
    stream = str(z["stream"]) if "stream" in z.files else "table"
    return state, int(z["next_row"]), int(z["n_tested"]), stream


def save_kinship_state(path: str, total: np.ndarray, n_rows: int,
                       next_row: int, stream: str = "table") -> None:
    """`stream` tags which row numbering next_row refers to ("table" rows
    or "dtable" cache rows) so a resume never mixes the two."""
    _atomic_savez(path, total=total, n_rows=np.int64(n_rows),
                  next_row=np.int64(next_row),
                  stream=np.bytes_(stream.encode()))


def load_kinship_state(path: str, stream: str = "table"):
    if not os.path.exists(_norm(path)):
        return None
    z = np.load(_norm(path))
    tag = bytes(z["stream"]).decode() if "stream" in z else "table"
    if tag != stream:
        return None               # checkpoint from the other stream route
    return z["total"], int(z["n_rows"]), int(z["next_row"])
