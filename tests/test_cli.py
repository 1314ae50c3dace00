"""CLI surface: extract → evaluate → review → latex round-trip."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_cli_roundtrip(small_lake, tmp_path, capsys):
    from pdf_extractor_ray.cli import main
    from pdf_extractor_ray.oracle import oracle_extract

    out = str(tmp_path / "out")
    assert main(["extract", "--lake", small_lake, "--out", out, "--partitions", "2"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["ran"] == [0, 1]

    # golden for this lake via the oracle
    import glob

    import pyarrow as pa

    transcripts = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(os.path.join(small_lake, "*.parquet")))]
    )
    golden_path = str(tmp_path / "golden.parquet")
    pq.write_table(oracle_extract(transcripts), golden_path)

    assert main(["evaluate", "--out", out, "--golden", golden_path]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["report"]["failed"] == 0 and rep["report"]["missing"] == 0
    assert rep["flags"]["n"] == rep["report"]["total"]

    assert main(["review", "--out", out, "--rate", "0.05"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(lines) <= 20

    tex_dir = str(tmp_path / "tex")
    assert main(["latex", "--out", out, "--tex", tex_dir]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["documents"] > 0 and res["render_ok"] == res["documents"]

    img_dir = str(tmp_path / "imgs")
    assert main(["pages", "--lake", small_lake, "--images", img_dir, "--zoom", "0.25"]) == 0
    pg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pg["pages"] > 0 and pg["bytes"] > 0
    pngs = [
        os.path.join(r, f)
        for r, _, fs in os.walk(img_dir)
        for f in fs
        if f.endswith(".png")
    ]
    assert len(pngs) == pg["pages"]
    with open(pngs[0], "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_cli_query(tmp_path):
    """query subcommand: --list enumerates, a run prints rows + a JSON
    tail, --out writes parquet, unknown names exit 1."""
    import pyarrow.parquet as pq

    from pdf_extractor_ray.cli import main

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["query", "--list"]) == 0
    assert "weighted_avg" in buf.getvalue()

    out = str(tmp_path / "wavg.parquet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert (
            main(
                [
                    "query",
                    "weighted_avg",
                    "--sf-dir",
                    "/root/testdata/sf0.001",
                    "--out",
                    out,
                ]
            )
            == 0
        )
    t = pq.read_table(out)
    assert t.num_rows > 0 and "wavg_discount" in t.column_names

    assert main(["query", "definitely_not_a_query"]) == 1
