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
                    n_tested: int, stream: str = "table",
                    meta: dict | None = None) -> None:
    """`stream` tags what `next_row` indexes: "table" = absolute .table row,
    "dtable" = row in the device-native cache. A resume only applies when
    the stream kind matches (the two row spaces differ after MAC filtering).
    `meta`: config fingerprint (see save_kinship_state) — a resume under a
    conflicting fingerprint is refused."""
    _atomic_savez(path, scores=np.asarray(state.scores),
                  row_lo=np.asarray(state.row_lo),
                  row_hi=np.asarray(state.row_hi),
                  next_row=np.int64(next_row), n_tested=np.int64(n_tested),
                  stream=np.array(stream), **meta_arrays(meta))


def load_scan_state(path: str, meta: dict | None = None):
    """-> (TopKState, next_row, n_tested, stream) or None if absent."""
    if not os.path.exists(_norm(path)):
        return None
    import jax.numpy as jnp
    z = np.load(_norm(path))
    check_meta(z, meta, _norm(path))
    state = topk_ops.TopKState(scores=jnp.asarray(z["scores"]),
                               row_lo=jnp.asarray(z["row_lo"]),
                               row_hi=jnp.asarray(z["row_hi"]))
    stream = str(z["stream"]) if "stream" in z.files else "table"
    return state, int(z["next_row"]), int(z["n_tested"]), stream


def save_kinship_state(path: str, total: np.ndarray, n_rows: int,
                       next_row: int, stream: str = "table",
                       meta: dict | None = None) -> None:
    """`stream` tags which row numbering next_row refers to ("table" rows
    or "dtable" cache rows) so a resume never mixes the two.

    `meta`: topology/config fingerprint (int-valued dict, e.g. n_proc, the
    owned span bounds, table n_rows). Stored alongside the state; a resume
    that passes a different fingerprint is REFUSED (see load_kinship_state)
    — resuming a span checkpoint under a different partitioning would
    silently double- or under-count rows."""
    extra = {}
    if meta:
        extra["meta_keys"] = np.array(sorted(meta), dtype="U32")
        extra["meta_vals"] = np.array([int(meta[k]) for k in sorted(meta)],
                                      dtype=np.int64)
    _atomic_savez(path, total=total, n_rows=np.int64(n_rows),
                  next_row=np.int64(next_row),
                  stream=np.bytes_(stream.encode()), **extra)


def meta_arrays(meta: dict | None) -> dict:
    """Topology fingerprint dict -> npz-storable arrays (see
    save_kinship_state); {} when meta is None/empty."""
    if not meta:
        return {}
    return {"meta_keys": np.array(sorted(meta), dtype="U32"),
            "meta_vals": np.array([int(meta[k]) for k in sorted(meta)],
                                  dtype=np.int64)}


def check_meta(z, meta: dict | None, path: str) -> None:
    """Raise if a checkpoint's stored fingerprint conflicts with `meta`.
    A checkpoint that carries NO fingerprint while the caller expects one is
    also refused: a pre-fingerprint file written under a different
    topology/table could otherwise resume silently mis-spanned — exactly the
    failure fingerprints exist to prevent (ADVICE r4). Loads that pass no
    meta skip the check."""
    if not meta:
        return
    if "meta_keys" not in getattr(z, "files", ()):
        raise ValueError(
            f"checkpoint {path} carries no topology fingerprint but this "
            f"run requires one ({sorted(meta)}); refusing to resume — "
            f"delete the checkpoint files to restart clean")
    stored = dict(zip((str(k) for k in z["meta_keys"]),
                      (int(v) for v in z["meta_vals"])))
    bad = {k: (stored[k], int(v)) for k, v in meta.items()
           if k in stored and stored[k] != int(v)}
    if bad:
        detail = ", ".join(f"{k}: checkpoint={a} run={b}"
                           for k, (a, b) in bad.items())
        raise ValueError(
            f"checkpoint {path} was written under a different "
            f"topology/config ({detail}); refusing to resume — delete the "
            f"checkpoint files to restart clean")


def load_kinship_state(path: str, stream: str = "table",
                       meta: dict | None = None):
    if not os.path.exists(_norm(path)):
        return None
    z = np.load(_norm(path))
    tag = bytes(z["stream"]).decode() if "stream" in z else "table"
    if tag != stream:
        return None               # checkpoint from the other stream route
    check_meta(z, meta, _norm(path))
    return z["total"], int(z["n_rows"]), int(z["next_row"])
