"""Transcript-lake reader (reference S1/S14 analogue,
/root/reference/src/pdf_processor.py:21-33, src/cli.py:203-216).

Reads only the columns the pipeline needs (prune at the read) and
exposes the conv-partitioned file layout for manifest-based resume.
"""

from __future__ import annotations

import ray.data

from .scan import parquet_files, scan_parquet

lake_files = parquet_files  # stable partition order; kept as public alias


def read_transcripts(
    paths: str | list[str],
    columns: tuple[str, ...] = ("conv_id", "turn_idx", "text", "tool", "ts"),
) -> ray.data.Dataset:
    """``read_parquet`` with column pruning (role is not needed by the
    extraction pipeline and is dropped at the scan) and a metadata-free
    declared schema (sources/scan.py) so block schemas stay hashable."""
    return scan_parquet(paths, columns=columns)
