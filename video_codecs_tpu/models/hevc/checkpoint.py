"""Encoder checkpoint/resume (SURVEY.md §5).

The reference has no checkpointing; its complete resumable encoder state at
a picture boundary is {DPB planes, POC/RPS state, rate-control model
parameters} (TComSlice + TEncRateCtrl state).  This module serializes
exactly that, so a low-delay encode can stop after picture k and resume
elsewhere producing the byte-identical remainder of the stream.
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np


@dataclasses.dataclass
class EncoderState:
    poc: int
    ref: tuple[np.ndarray, np.ndarray, np.ndarray] | None
    rc: dict | None  # rate-controller __dict__ (plain floats/ints)


def capture(poc: int, ref, rate_control=None) -> EncoderState:
    rc = None
    if rate_control is not None:
        rc = {k: v for k, v in vars(rate_control).items()
              if isinstance(v, (int, float))}
        rc["__class__"] = type(rate_control).__name__
    return EncoderState(poc=poc,
                        ref=tuple(np.asarray(p).copy() for p in ref)
                        if ref is not None else None,
                        rc=rc)


def save(state: EncoderState, path: str) -> None:
    buf: dict = {"poc": np.int64(state.poc)}
    if state.ref is not None:
        buf["ref_y"], buf["ref_u"], buf["ref_v"] = state.ref
    if state.rc is not None:
        keys = [k for k in state.rc if k != "__class__"]
        buf["rc_keys"] = np.array(keys)
        buf["rc_vals"] = np.array([float(state.rc[k]) for k in keys])
        buf["rc_class"] = np.array([state.rc["__class__"]])
    np.savez(path, **buf)


def load(path: str) -> EncoderState:
    z = np.load(path, allow_pickle=False)
    ref = None
    if "ref_y" in z:
        ref = (z["ref_y"], z["ref_u"], z["ref_v"])
    rc = None
    if "rc_keys" in z:
        rc = {str(k): float(v) for k, v in zip(z["rc_keys"], z["rc_vals"])}
        rc["__class__"] = str(z["rc_class"][0])
    return EncoderState(poc=int(z["poc"]), ref=ref, rc=rc)


def restore_rc(state: EncoderState, rate_control) -> None:
    if state.rc is None or rate_control is None:
        return
    assert state.rc["__class__"] == type(rate_control).__name__
    for k, v in state.rc.items():
        if k == "__class__":
            continue
        cur = getattr(rate_control, k, None)
        setattr(rate_control, k,
                int(v) if isinstance(cur, int) else v)
