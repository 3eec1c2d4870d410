"""Fingerprint-keyed staged builds — the ONE protocol behind every
derived layout the engine materializes beside the warehouse (streaming
stores, JSONL/two-vintage copies, the z-ordered table).

Protocol: a staged root holds a ``_SOURCE`` marker carrying the source
file's fingerprint. A matching marker short-circuits to the staged
output (build is REFRESH cost, repeat queries reuse it); a missing or
stale marker wipes the root and rebuilds from scratch. The marker is
written only AFTER the build completes, so a crashed build can never
be mistaken for a finished one — the next call rebuilds.

Centralized here because the protocol used to be copy-pasted across
seven ensure_* functions and a fix to it (marker atomicity, recovery
ordering, locking) must land in exactly one place.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable


def parquet_fingerprint(sf_dir: str, filename: str) -> str:
    """size:mtime_ns of one source parquet — cheap, and the driver
    regenerates fixtures in place so mtime moves when content does."""
    st = os.stat(os.path.join(sf_dir, filename))
    return f"{st.st_size}:{st.st_mtime_ns}"


def ensure_staged(
    root_base: str,
    sf_dir: str,
    fp: str,
    out_subpath: str,
    build: Callable[[str], None],
) -> str:
    """Return the staged output under ``root_base/<sf-name>/
    <out_subpath>``, rebuilding via ``build(root)`` when the
    ``_SOURCE`` marker is missing or does not match ``fp``.

    ``build`` receives the wiped per-sf root and must create
    everything beneath it (including the output subpath); the marker
    is stamped only after it returns.
    """
    name = os.path.basename(os.path.normpath(sf_dir)) or "root"
    root = os.path.join(root_base, name)
    marker = os.path.join(root, "_SOURCE")
    out = os.path.join(root, out_subpath)
    try:
        with open(marker, encoding="utf-8") as f:
            if f.read() == fp:
                return out
    except OSError:
        pass
    shutil.rmtree(root, ignore_errors=True)
    build(root)
    os.makedirs(root, exist_ok=True)  # empty-input builds write no files
    with open(marker, "w", encoding="utf-8") as f:
        f.write(fp)
    return out
