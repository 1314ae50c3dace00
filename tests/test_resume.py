"""Manifest-based resume: the six scenarios of the reference's manual
resume workflow (/root/reference/test_resume_workflow.md:11-141)
re-expressed as partition-granular assertions."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from pdf_extractor_ray.pipelines.extract import (
    read_extracted,
    run_with_checkpoint,
)
from pdf_extractor_ray.state import manifest as mf


def _collect(out_dir: str) -> pa.Table:
    t = pa.concat_tables(
        list(read_extracted(out_dir).iter_batches(batch_format="pyarrow")),
        promote_options="permissive",
    )
    return t.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending"), ("unit_id", "ascending")]
    ).select(["conv_id", "turn_idx", "unit_id", "extracted_text"])


@pytest.mark.usefixtures("ray_session")
def test_resume_scenarios(small_lake, tmp_path):
    out = str(tmp_path / "out")

    # Scenario 4 (no checkpoint): fresh run processes everything.
    stats = run_with_checkpoint(small_lake, out, num_partitions=3)
    assert stats["skipped"] == [] and stats["ran"] == [0, 1, 2]
    golden = _collect(out)
    manifests = mf.load_manifests(out)
    assert len(manifests) == 3
    assert sum(m.row_count for m in manifests.values()) == golden.num_rows

    # Scenario 1 (basic resume): simulate a crash that lost partition 2
    # (output dir + manifest gone); resume reruns ONLY partition 2.
    import shutil

    shutil.rmtree(mf.partition_dir(out, 2))
    os.remove(mf.manifest_path(out, 2))
    stats = run_with_checkpoint(small_lake, out, num_partitions=3)
    assert stats["skipped"] == [0, 1] and stats["ran"] == [2]
    assert _collect(out).equals(golden)  # identical to single-run output

    # Scenario: completed run resumes as a no-op (zero reprocessing).
    stats = run_with_checkpoint(small_lake, out, num_partitions=3)
    assert stats["ran"] == [] and stats["skipped"] == [0, 1, 2]

    # Scenario 5 (wrong-input detection): manifest for different inputs
    # must NOT be trusted — lineage id mismatch forces a rerun.
    m = mf.load_manifests(out)[1]
    m.lineage_id = "deadbeef00000000"
    mf.write_manifest(out, m)
    stats = run_with_checkpoint(small_lake, out, num_partitions=3)
    assert 1 in stats["ran"]
    assert _collect(out).equals(golden)

    # Corrupt manifest: warned + ignored → partition reruns, output intact.
    with open(mf.manifest_path(out, 0), "w") as f:
        f.write("{not json")
    stats = run_with_checkpoint(small_lake, out, num_partitions=3)
    assert 0 in stats["ran"]
    assert _collect(out).equals(golden)

    # Scenario 2 (force restart): everything reruns from scratch.
    stats = run_with_checkpoint(small_lake, out, num_partitions=3, force_restart=True)
    assert stats["ran"] == [0, 1, 2] and stats["skipped"] == []
    assert _collect(out).equals(golden)


@pytest.mark.usefixtures("ray_session")
def test_manifest_records_are_complete(small_lake, tmp_path):
    out = str(tmp_path / "out2")
    run_with_checkpoint(small_lake, out, num_partitions=2)
    for m in mf.load_manifests(out).values():
        assert m.row_count > 0
        assert m.bytes_out > 0
        assert m.wall_ms > 0
        assert m.input_files
        # manifest JSON is small (the reference's <1% overhead target,
        # /root/reference/CHECKPOINT_IMPLEMENTATION.md:184-187)
        assert os.path.getsize(mf.manifest_path(out, m.partition_id)) < 4096
        data = json.load(open(mf.manifest_path(out, m.partition_id)))
        assert data["lineage_id"] == m.lineage_id
