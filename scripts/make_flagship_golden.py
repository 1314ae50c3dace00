"""Freeze per-sf flagship goldens for the driver's DuckDB oracles.

The flagship trio (``extract_transcripts``, ``review_priority``,
``page_render``) runs over the deterministic transcript lake
(datagen seed=42, conv count keyed to the sf-dir basename), so its
output is a pure function of the scale factor.  This script computes
that output SEQUENTIALLY — single-threaded ``oracle_extract`` (the
same obviously-correct reference loop the golden pytest suite uses,
mirroring /root/reference/src/pipeline.py:214-256) plus the pure
per-batch routing/render kernels applied to the whole table in one
process, NO Ray involved — and freezes it as parquet.  The driver's
``oracle_sql`` entries then read these files, so what the driver's
hash-compare verifies is exactly the distributed orchestration
(shuffle, salted-shard stitching, group ordering).

Each file carries an ``_sf`` tag column; the oracle SQL picks the
slice matching the sf dir under test by sniffing the row count of
the registered ``orders`` view (1.5k / 15k / 150k at the three
driver scale factors).

Run once, commit the output: ``python scripts/make_flagship_golden.py``.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extractor_ray.oracle import oracle_extract  # noqa: E402
from pdf_extractor_ray.pipelines.evaluate import priority_batch  # noqa: E402
from pdf_extractor_ray.pipelines.queries import transcripts_path_for  # noqa: E402
from pdf_extractor_ray.stages.page_render import PageRenderer  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)
SFS = ("sf0.001", "sf0.01", "sf0.1")


def _lake_table(sf: str) -> pa.Table:
    lake = transcripts_path_for(f"/root/testdata/{sf}")
    files = sorted(glob.glob(os.path.join(lake, "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def _tag(t: pa.Table, sf: str) -> pa.Table:
    return t.append_column("_sf", pa.array([sf] * t.num_rows, pa.string()))


def main() -> None:
    extracted, reviews, pages = [], [], []
    for sf in SFS:
        lake = _lake_table(sf)
        seq = oracle_extract(lake)

        extracted.append(
            _tag(seq.select(["conv_id", "turn_idx", "unit_id", "extracted_text"]), sf)
        )

        # review_priority: identical pure routing kernel, then a plain
        # count-by-priority (the Ray query's groupby/Count twin)
        pri = priority_batch(seq)
        counts = (
            pa.table({"review_priority": pri.column("review_priority")})
            .group_by("review_priority")
            .aggregate([("review_priority", "count")])
            .rename_columns(["review_priority", "n"])
        )
        reviews.append(_tag(counts, sf))

        # page_render: sequential render of every pdf turn at the
        # query's zoom=0.25, then per-conversation inventory
        rendered = PageRenderer(zoom=0.25)(
            lake.select(["conv_id", "turn_idx", "tool", "text"])
        )
        inv = (
            pa.table(
                {
                    "conv_id": rendered.column("conv_id"),
                    "n_bytes": pc.binary_length(rendered.column("image")).cast(
                        pa.int64()
                    ),
                }
            )
            .group_by("conv_id")
            .aggregate([("n_bytes", "count"), ("n_bytes", "sum")])
            .rename_columns(["conv_id", "n_pages", "png_bytes"])
        )
        inv = inv.set_column(
            inv.schema.get_field_index("n_pages"),
            "n_pages",
            inv.column("n_pages").cast(pa.int64()),
        )
        pages.append(_tag(inv, sf))
        print(
            f"{sf}: {seq.num_rows} extracted rows, "
            f"{counts.num_rows} priority buckets, {inv.num_rows} conv inventories"
        )

    pq.write_table(
        pa.concat_tables(extracted),
        os.path.join(GOLDEN_DIR, "flagship_extracted.parquet"),
    )
    pq.write_table(
        pa.concat_tables(reviews),
        os.path.join(GOLDEN_DIR, "flagship_review_priority.parquet"),
    )
    pq.write_table(
        pa.concat_tables(pages),
        os.path.join(GOLDEN_DIR, "flagship_page_render.parquet"),
    )
    print("wrote 3 flagship golden parquet files to", GOLDEN_DIR)


if __name__ == "__main__":
    main()
