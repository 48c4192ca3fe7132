"""Data path resolution.

Raw dataset files are searched across a list of roots so the bundled
reference data (read-only at /root/reference) works out of the box while
user-provided copies take precedence.  Override with ``ACMGNN_DATA_PATH``
(colon-separated roots).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_ROOTS = [
    Path(os.environ.get("ACMGNN_DATA_HOME", Path.cwd() / "data")),
    Path("/root/reference"),
]


def data_roots() -> list[Path]:
    env = os.environ.get("ACMGNN_DATA_PATH")
    if env:
        return [Path(p) for p in env.split(":") if p]
    return _DEFAULT_ROOTS


def find_data_file(*relparts: str) -> Path:
    """Resolve a data file across the search roots; raises with guidance."""
    rel = Path(*relparts)
    tried = []
    for root in data_roots():
        cand = root / rel
        tried.append(str(cand))
        if cand.exists():
            return cand
    raise FileNotFoundError(
        f"dataset file {rel} not found; searched: {tried}. "
        "Place the file under one of these roots or set ACMGNN_DATA_PATH."
    )
