"""Session-scoped scratch storage for staging layouts and sinks.

Several operators materialize intermediate layouts (chunk-partitioned
corpora, clustered copies, streaming checkpoints/sinks). Earlier rounds
gave each invocation its own ``tempfile.mkdtemp`` and never removed it,
so repeated bench/parity/driver runs accumulated unbounded /tmp usage.
All scratch now lives under ONE per-process root that is removed at
interpreter exit:

  - ``scratch_dir(label)``        — deterministic per-label dir, reused
    across invocations in the same process (for content-addressed
    layouts that can be rebuilt-or-reused, e.g. a16's clustered copy);
  - ``scratch_dir_unique(label)`` — fresh dir per call (for streaming
    checkpoints/sinks, where reuse would resume prior state), still
    under the auto-cleaned root.

On a real cluster the root would be a job-scoped path on shared storage
(HDFS/S3) supplied by the orchestrator; every operator that stages data
takes a ``work_dir`` override for exactly that reason.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_SCRATCH_ROOT: str | None = None


def scratch_root() -> str:
    """The per-process scratch root; created lazily, removed atexit."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="spark_graft_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return _SCRATCH_ROOT


def scratch_dir(label: str) -> str:
    """Deterministic per-label scratch dir (reused within the process)."""
    path = os.path.join(scratch_root(), label)
    os.makedirs(path, exist_ok=True)
    return path


def scratch_dir_unique(label: str) -> str:
    """Fresh scratch dir per call, under the auto-cleaned root."""
    return tempfile.mkdtemp(prefix=f"{label}_", dir=scratch_root())
