"""Transcript-lake reader (reference S1/S14 analogue,
/root/reference/src/pdf_processor.py:21-33, src/cli.py:203-216).

Reads only the columns the pipeline needs (prune at the read) and
exposes the conv-partitioned file layout for manifest-based resume.
"""

from __future__ import annotations

import os

import ray.data


def lake_files(lake_path: str) -> list[str]:
    """Sorted parquet files of the lake (stable partition order)."""
    if os.path.isfile(lake_path):
        return [lake_path]
    return sorted(
        os.path.join(lake_path, f)
        for f in os.listdir(lake_path)
        if f.endswith(".parquet")
    )


def read_transcripts(
    paths: str | list[str],
    columns: tuple[str, ...] = ("conv_id", "turn_idx", "text", "tool", "ts"),
) -> ray.data.Dataset:
    """``read_parquet`` with column pruning (role is not needed by the
    extraction pipeline and is dropped at the scan)."""
    if isinstance(paths, str):
        paths = lake_files(paths)
    return ray.data.read_parquet(list(paths), columns=list(columns))
