"""Driver-contract query pipelines + DuckDB oracle SQL.

One entry per implemented operator family (SURVEY §2 + the
training-data extras), each expressed Ray-Data-first over the driver's
testdata tables and — where ANSI-SQL-expressible — paired with an
equivalent DuckDB oracle (same column NAMES, floats rounded, *ts*
columns cast to epoch microseconds for engine-neutral hashing).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet  # noqa: F401 — registers pa.parquet (read_metadata)
import ray
import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..functions.textstats import detect_language, quality_score
from ..sources.scan import scan_parquet
from ..stages import dedup as dd
from ..stages import similarity as sim
from ..stages.multimodal import featurize_media
from ..stages.text_analysis import TextAnalyzer

# Token pattern — IDENTICAL semantics in Python (functions.textstats
# .TOKEN_RE) and DuckDB regexp_extract_all.
TOKEN_SQL_RE = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")



def _read_pq(path: str, **kwargs) -> ray.data.Dataset:
    """Drop-in ``read_parquet`` that strips writer metadata at the scan
    (see sources/scan.py — unhashable schemas break Ray's schema-dedup
    fast paths inside the read task itself) and applies the size-aware
    shuffle strategy to the dataset's context: any groupby/sort derived
    from this read uses the hash exchange once the input outgrows
    ``conversation.HASH_SHUFFLE_MIN_BYTES`` (the 10× lake measured
    sort 405.8 s vs hash 146.9 s — see stages/conversation.py)."""
    from ..stages.conversation import _prefer_hash_shuffle

    ds = scan_parquet(path, **kwargs)
    try:
        _prefer_hash_shuffle(ds, os.path.getsize(path))
    except OSError:
        pass
    return ds


def _to_table(ds: ray.data.Dataset) -> pa.Table:
    # batch_size=None yields entire blocks — the default (256 rows)
    # re-slices every block and measured 464 s of pure driver overhead
    # collecting a 167M-row sorted result (654k tiny batches); whole
    # blocks collect the same result in seconds
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        # preserve the schema even for empty results
        schema = ds.schema()
        arrow_schema = getattr(schema, "base_schema", None)
        if arrow_schema is not None:
            return arrow_schema.empty_table()
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def _to_table_s(ds: ray.data.Dataset, schema: pa.Schema) -> pa.Table:
    """``_to_table`` with a DECLARED schema fallback.

    A fully-empty pipeline (zero output blocks — legitimate under
    predicate pushdown at 100 TB: some partitions / date ranges hold
    no matching rows) loses its schema inside a groupby/aggregate, so
    downstream ``.column(...)`` post-processing KeyErrors.  Queries
    whose final exchange can go empty declare the output schema here."""
    t = _to_table(ds)
    if t.num_rows == 0 and t.num_columns == 0:
        return schema.empty_table()
    return t


def _money_i4(price, disc=None) -> pa.Array:
    """Exact int64 ten-thousandths of ``price × (1 − disc)``.

    A 2-decimal price times a 2-decimal (1−discount) has EXACTLY 4
    decimals, so ×10⁴ round-to-int is the true rational value — every
    partial sum is then summation-order-proof (int64), where the
    float64 version flips a cent whenever the exchange regroups the
    partials (observed on tpch_q9 at sf0.001).  Oracles apply the
    matching ``CAST(round(expr * 10000) AS BIGINT)``.
    """
    v = price if disc is None else pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
    return pa.array(
        np.rint(v.to_numpy(zero_copy_only=False) * 1e4).astype(np.int64), pa.int64()
    )


# the matching oracle-side expression (DuckDB), parameterized on the
# qualified column names so aliased queries can reuse it
def _sql_rev_i4(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return f"CAST(round({price} * (1 - {disc}) * 10000) AS BIGINT)"


def _i4_to_money(v) -> np.ndarray:
    """×10⁴ int money units → 2-decimal float64, half AWAY from zero.

    numpy/Python round() are half-to-even while SQL round() is
    half-away — with exact integer sums a x.xx5 total would disagree
    deterministically (observed: 326565.745 → 326565.74 vs .75).
    Integer arithmetic on both engines (`_sql_i4_money` is the oracle
    twin) removes the float round entirely."""
    v = np.asarray(v, dtype=np.int64)
    cents = np.sign(v) * ((np.abs(v) + 50) // 100)
    return cents.astype(np.float64) / 100.0


def _sql_i4_money(sum_expr: str) -> str:
    """Oracle twin of ``_i4_to_money`` for a NON-NEGATIVE i4 sum."""
    return f"(({sum_expr} + 50) // 100) / 100.0"


# --------------------------------------------------------------------------
# flagship: transcript extraction (rows-only check; goldens cover equality)
# --------------------------------------------------------------------------

_SF_CONVS = {"sf0.001": 16, "sf0.01": 48, "sf0.1": 160}


def transcripts_path_for(sf_dir: str) -> str:
    """Deterministic transcript lake cached per scale factor."""
    from ..datagen import write_lake

    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = _SF_CONVS.get(sf, 48)
    out = f"/tmp/graft_transcripts/{sf}_n{n}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        write_lake(out, n_convs=n, seed=42, convs_per_file=8, mega_every=max(8, n // 2))
        open(marker, "w").write("ok")
    return out


def q_extract_transcripts(sf_dir: str):
    from .extract import extraction_pipeline

    lake = transcripts_path_for(sf_dir)
    ds = extraction_pipeline(lake)
    return _to_table(ds.select_columns(["conv_id", "turn_idx", "unit_id", "extracted_text"]))


def q_review_priority(sf_dir: str):
    """Per-row review routing counts (reference QAEvaluation
    review_priority, evaluator.py:216-292) over the extraction output —
    rows-only (the priorities derive from this engine's own extraction,
    not a SQL-expressible input)."""
    from ray.data.aggregate import Count

    from .evaluate import review_priorities
    from .extract import extraction_pipeline

    lake = transcripts_path_for(sf_dir)
    pri = review_priorities(extraction_pipeline(lake))
    out = pri.groupby("review_priority").aggregate(Count(alias_name="n"))
    return _to_table(out)


def q_page_render(sf_dir: str):
    """S3/S5: render every PDF page of the lake to PNG (stubbed
    rasterizer, real container/zoom math — stages/page_render.py;
    reference pdf_processor.py:35-102) and roll up a per-conversation
    page inventory.  Rows-only check: the payloads are this engine's
    own transcript lake, not a SQL view.  Image bytes never reach the
    driver — only (conv_id, n_pages, png_bytes) aggregates do."""
    from ray.data.aggregate import Count, Sum

    from ..sources.transcripts import read_transcripts
    from ..stages.page_render import PageRenderer

    lake = transcripts_path_for(sf_dir)
    ds = read_transcripts(lake, columns=("conv_id", "turn_idx", "tool", "text"))
    # zoom 0.25 keeps the bench honest but cheap (the raster cost is
    # quadratic in zoom; production uses DEFAULT_ZOOM=2.0)
    pages = ds.map_batches(
        PageRenderer(zoom=0.25), batch_format="pyarrow", batch_size=32
    )

    def meta_only(batch: pa.Table) -> pa.Table:
        sizes = pc.binary_length(batch.column("image")).cast(pa.int64())
        return batch.drop_columns(["image"]).append_column("n_bytes", sizes)

    out = (
        pages.map_batches(meta_only, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Count(alias_name="n_pages"), Sum("n_bytes", alias_name="png_bytes"))
    )
    return _to_table(out.sort("conv_id"))


# --------------------------------------------------------------------------
# stitch analogue on events: per-user ordered sessionization (A1/O1)
# --------------------------------------------------------------------------

_GROUP_BUCKETS = 32


def _bucketed(ds: ray.data.Dataset, key: str, per_bucket) -> ray.data.Dataset:
    """Hash-bucket groupby: ONE map_groups call per bucket, entities
    iterated inside with a vectorized pandas groupby — the same
    per-group-overhead elimination as the stitch stage (a map_groups
    call per entity costs ~ms; thousands of entities make that the
    dominant term)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_bucket", pa.array((ids % _GROUP_BUCKETS).astype("int32"))
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_GROUP_BUCKETS)
        .map_groups(per_bucket, batch_format="pandas")
    )


def q_events_sessionize(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["user_id", "ts", "event_id"])
        b["ts_us"] = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        agg = b.groupby("user_id", sort=False).agg(
            n_events=("ts_us", "size"),
            first_ts_us=("ts_us", "min"),
            last_ts_us=("ts_us", "max"),
            event_path=("event_type", "->".join),
        )
        return agg.reset_index()[
            ["user_id", "n_events", "first_ts_us", "last_ts_us", "event_path"]
        ]

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_EVENTS_SESSIONIZE = """
SELECT user_id,
       count(*)                                        AS n_events,
       epoch_us(min(ts))                               AS first_ts_us,
       epoch_us(max(ts))                               AS last_ts_us,
       string_agg(event_type, '->' ORDER BY ts, event_id) AS event_path
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# filter + projection with predicate pushdown (S8)
# --------------------------------------------------------------------------

def q_filter_project(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read_pq(
        _t(sf_dir, "documents"),
        columns=["doc_id", "source", "lang", "n_chars"],
        filter=(pads.field("lang") == "en") & (pads.field("n_chars") >= 200),
    )
    return _to_table(ds.select_columns(["doc_id", "source", "n_chars"]))


SQL_FILTER_PROJECT = """
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars >= 200
"""


# --------------------------------------------------------------------------
# aggregate rollup (A4)
# --------------------------------------------------------------------------

def q_agg_rollup(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
    )
    t = _to_table_s(
        out,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("sum_value", pa.float64()),
                ("avg_value", pa.float64()),
            ]
        ),
    )
    return t.set_column(
        t.schema.get_field_index("sum_value"),
        "sum_value",
        pc.round(t.column("sum_value"), ndigits=4),
    ).set_column(
        t.schema.get_field_index("avg_value"),
        "avg_value",
        pc.round(t.column("avg_value"), ndigits=4),
    )


SQL_AGG_ROLLUP = """
SELECT event_type, count(*) AS n,
       round(sum(value), 4) AS sum_value,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# broadcast join (J2): orders ⋈ customer (small side via ray.put)
# --------------------------------------------------------------------------

def q_join_broadcast(sf_dir: str):
    cust = pa.parquet.read_table(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_by_key = dict(
        zip(cust.column("c_custkey").to_pylist(), cust.column("c_mktsegment").to_pylist())
    )
    seg_ref = ray.put(seg_by_key)

    def add_segment(batch: pa.Table) -> pa.Table:
        seg = ray.get(seg_ref)  # local object-store hit after first fetch
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        segs = pd.Series(keys).map(seg)  # vectorized hash lookup
        out = batch.append_column("c_mktsegment", pa.array(segs, pa.string()))
        # drop unmatched keys — inner-join semantics, same as the
        # oracle (dict.get's None would silently make this a left join)
        return out.filter(pc.is_valid(out.column("c_mktsegment")))

    ds = _read_pq(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"]
    ).map_batches(add_segment, batch_format="pyarrow", zero_copy_batch=True)

    out = ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="revenue")
    )
    t = _to_table_s(
        out,
        pa.schema(
            [
                ("c_mktsegment", pa.string()),
                ("n_orders", pa.int64()),
                ("revenue", pa.float64()),
            ]
        ),
    )
    return t.set_column(
        t.schema.get_field_index("revenue"),
        "revenue",
        pc.round(t.column("revenue"), ndigits=4),
    )


SQL_JOIN_BROADCAST = """
SELECT c.c_mktsegment, count(*) AS n_orders,
       round(sum(o.o_totalprice), 4) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


# --------------------------------------------------------------------------
# distributed hash join, both sides large (J1 general form)
# --------------------------------------------------------------------------

def q_join_hash(sf_dir: str):
    orders = _read_pq(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        batch = batch.append_column("rev", rev)
        # per-batch combiner: TPC-H lineitems cluster by orderkey, so
        # collapsing to (orderkey, sum_rev, n) BEFORE the exchange
        # shrinks the join input ~6x (rows per order) at any scale —
        # pure Arrow group_by, no Python per row
        part = batch.group_by("l_orderkey").aggregate(
            [("rev", "sum"), ("rev", "count")]
        )
        return part.rename_columns(["l_orderkey", "rev", "n"])

    # Partition count measured on this box (32 CPUs, sf0.1): 8→7.1s,
    # 16→7.7s, 32→10.3s, 64→129s — Ray 2.49's JoinOperator spawns an
    # aggregator ACTOR pool sized to partitions, and actors beyond
    # ~CPUs/4 thrash a single node.  cpus//4 keeps ~1 aggregator per 4
    # cores and grows with the cluster (a 256-node cluster gets
    # thousands of partitions, which is what bounds per-partition
    # memory at 100 TB).
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    schema = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("n_items", pa.int64()),
            ("revenue", pa.float64()),
        ]
    )
    # Ray's JoinOperator rejects a schema-less side, and an all-empty
    # map_batches stream loses its schema — a legitimate state under
    # predicate pushdown at scale.  schema() costs one block prefix on
    # the hot path, nothing next to the join exchange itself.
    left = lineitem.map_batches(revenue, batch_format="pyarrow")
    if left.schema() is None or orders.schema() is None:
        return schema.empty_table()
    joined = left.join(
        orders,
        join_type="inner",
        num_partitions=max(8, cpus // 4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = joined.groupby("o_orderpriority").aggregate(
        Sum("n", alias_name="n_items"), Sum("rev", alias_name="revenue")
    )
    t = _to_table_s(out, schema)
    return t.set_column(
        t.schema.get_field_index("revenue"),
        "revenue",
        pc.round(t.column("revenue"), ndigits=2),
    )


SQL_JOIN_HASH = """
SELECT o.o_orderpriority, count(*) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q3 shape — the three-table plan: predicate pushdown at every
# read, broadcast SEMI-join for the dimension side (segment-filtered
# customer keys via ray.put — the small-side lookup pattern; the
# shuffle set-minus in q_anti_join_shuffle is the fallback when the
# keyset outgrows the driver), one large-large hash join, grouped
# revenue, distributed top-k on a rounded total order.
# --------------------------------------------------------------------------

_Q3_CUTOFF = "1997-06-15"


def q_tpch_q3(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    cutoff = _dt.datetime(1997, 6, 15)
    cust = _read_pq(
        _t(sf_dir, "customer"),
        columns=["c_custkey"],
        filter=pads.field("c_mktsegment") == "BUILDING",
    )
    ct = _to_table(cust)
    keys = ray.put(
        ct.column("c_custkey").combine_chunks()
        if "c_custkey" in ct.column_names
        else pa.array([], pa.int64())  # schema-less all-empty filtered read
    )
    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pads.field("o_orderdate") < cutoff,
    ).materialize()
    lineitem = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > cutoff,
    )

    # SIZE GATE (the q7/q8/q18 pattern): the date-filtered orders slice
    # is a 4-column projection; under the cap its (orderkey → date,
    # priority) map broadcasts and the query is ONE lineitem pass with
    # per-batch revenue combining, per-bucket top-10, and a ≤(buckets ×
    # 10)-row driver finish.  Above the cap (a real lake) the
    # large-large hash join below runs instead.
    # GRAFT_JOIN_BROADCAST_MAX=0 forces the join path (pinned by test
    # against the same oracle).
    q3_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("o_date_us", pa.int64()),
            ("o_orderpriority", pa.string()),
            ("revenue", pa.float64()),
        ]
    )
    cap = int(os.environ.get("GRAFT_JOIN_BROADCAST_MAX", _JOIN_BROADCAST_MAX))
    if (orders.size_bytes() or 0) <= cap:
        ot = _to_table(orders)
        if "o_custkey" not in ot.column_names:  # schema-less all-empty read
            return q3_schema.empty_table()
        ot = ot.filter(pc.is_in(ot.column("o_custkey"), value_set=ray.get(keys)))
        odf = pd.DataFrame(
            {
                "o_date_us": ot.column("o_orderdate")
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False),
                # raw ndarray, NOT to_pandas(): a Series would align its
                # own RangeIndex against the explicit orderkey index
                "o_orderpriority": ot.column("o_orderpriority").to_numpy(
                    zero_copy_only=False
                ),
            },
            index=ot.column("o_orderkey").to_numpy(zero_copy_only=False),
        )
        okref = ray.put(ot.column("o_orderkey").combine_chunks())
        omref = ray.put(odf)

        def li_bcast(b: pa.Table) -> pa.Table:
            f = b.filter(pc.is_in(b.column("l_orderkey"), value_set=ray.get(okref)))
            part = (
                pa.table(
                    {
                        "l_orderkey": f.column("l_orderkey"),
                        "rev": _money_i4(
                            f.column("l_extendedprice"), f.column("l_discount")
                        ),
                    }
                )
                .group_by("l_orderkey")
                .aggregate([("rev", "sum")])
            )
            return part.rename_columns(["l_orderkey", "rev"])

        def bucket_top10(df: pd.DataFrame) -> pa.Table:
            g = df.groupby("l_orderkey", sort=False, as_index=False)["rev"].sum()
            om = ray.get(omref).loc[g["l_orderkey"].to_numpy()]
            g["revenue"] = _i4_to_money(g["rev"].to_numpy())
            g["o_date_us"] = om["o_date_us"].to_numpy()
            g["o_orderpriority"] = om["o_orderpriority"].to_numpy()
            # top-10 is bucket-combinable: partial-sum buckets hold ALL
            # partials of each orderkey, so a local (revenue DESC,
            # l_orderkey ASC) head-10 can never drop a global winner
            g = g.sort_values(
                ["revenue", "l_orderkey"], ascending=[False, True]
            ).head(10)
            return pa.table(
                {
                    "l_orderkey": pa.array(g["l_orderkey"].to_numpy(), pa.int64()),
                    "o_date_us": pa.array(g["o_date_us"].to_numpy(), pa.int64()),
                    "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
                    "revenue": pa.array(g["revenue"].to_numpy(), pa.float64()),
                }
            )

        merged = _merge_partials(
            lineitem.map_batches(
                li_bcast, batch_format="pyarrow", zero_copy_batch=True
            ),
            "l_orderkey",
            bucket_top10,
            input_schema=pa.schema([("l_orderkey", pa.int64()), ("rev", pa.int64())]),
        )
        fin = (
            merged.to_pandas()
            .sort_values(["revenue", "l_orderkey"], ascending=[False, True])
            .head(10)
            .reset_index(drop=True)
        )
        return pa.Table.from_pandas(fin, preserve_index=False)

    def semi_cust(batch: pa.Table) -> pa.Table:
        k = ray.get(keys)  # object-store local after first fetch
        batch = batch.filter(pc.is_in(batch.column("o_custkey"), value_set=k))
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey"),
                "o_date_us": batch.column("o_orderdate").cast(pa.int64()),
                "o_orderpriority": batch.column("o_orderpriority"),
            }
        )

    def revenue(batch: pa.Table) -> pa.Table:
        # per-batch combiner (see q_join_hash): partial-sum rev by
        # orderkey before the join exchange — safe because the final
        # grouping key includes l_orderkey
        part = (
            batch.append_column(
                "rev",
                _money_i4(batch.column("l_extendedprice"), batch.column("l_discount")),
            )
            .group_by("l_orderkey")
            .aggregate([("rev", "sum")])
        )
        return part.rename_columns(["l_orderkey", "rev"])

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    left = lineitem.map_batches(revenue, batch_format="pyarrow")
    right = orders.map_batches(semi_cust, batch_format="pyarrow")
    if left.schema() is None or right.schema() is None:
        # an all-empty map_batches stream is schema-less and the
        # JoinOperator rejects it (legitimate under pushdown at scale)
        return q3_schema.empty_table()
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=max(8, cpus // 4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def rounded(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("revenue"),
            "revenue",
            pa.array(
                _i4_to_money(
                    batch.column("revenue").to_numpy(zero_copy_only=False)
                ),
                pa.float64(),
            ),
        )

    out = (
        joined.groupby(["l_orderkey", "o_date_us", "o_orderpriority"])
        .aggregate(Sum("rev", alias_name="revenue"))
        .map_batches(rounded, batch_format="pyarrow")
        # (revenue DESC, l_orderkey ASC) is a total order: l_orderkey is
        # unique per group row, and both engines sort the ROUNDED value
        .sort(["revenue", "l_orderkey"], descending=[True, False])
        .limit(10)
    )
    return _to_table(out)


SQL_TPCH_Q3 = f"""
SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS o_date_us, o.o_orderpriority,
       {_sql_i4_money(f"sum({_sql_rev_i4('l.l_extendedprice', 'l.l_discount')})")}
         AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H Q5 shape — five-way join: every dimension becomes a broadcast
# int-array lookup (region→nation→supplier/customer built once on the
# driver from dimension-scale tables, shipped via ray.put), leaving
# exactly ONE large-large hash join (lineitem ⨝ orders).  The Q5
# c_nationkey == s_nationkey co-location constraint is a vectorized
# int compare post-join.  nation/region are constant-size and supplier
# is ~SF·10k rows by TPC-H construction; customer is the largest
# broadcast — when its keyset outgrows a worker, swap that lookup for
# the shuffle pattern of q_join_hash / q_anti_join_shuffle (documented
# scale boundary).
# --------------------------------------------------------------------------


def q_tpch_q5(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)

    reg = pq.read_table(_t(sf_dir, "region"))
    asia = {
        rk
        for rk, rn in zip(
            reg.column("r_regionkey").to_pylist(), reg.column("r_name").to_pylist()
        )
        if rn == "ASIA"
    }
    nat = pq.read_table(_t(sf_dir, "nation"))
    nation_name = {
        nk: nn
        for nk, nn, nr in zip(
            nat.column("n_nationkey").to_pylist(),
            nat.column("n_name").to_pylist(),
            nat.column("n_regionkey").to_pylist(),
        )
        if nr in asia
    }

    def _lookup_array(table: pa.Table, key: str, val: str) -> np.ndarray:
        """Dense int-key → value array with -1 for absent keys (TPC-H
        keys are 1..N, so this is O(max_key) ints, not a Python dict)."""
        k = table.column(key).to_numpy(zero_copy_only=False)
        v = table.column(val).to_numpy(zero_copy_only=False)
        arr = np.full(int(k.max()) + 1 if len(k) else 1, -1, dtype=np.int64)
        arr[k] = v
        return arr

    sup_nat = ray.put(
        _lookup_array(
            pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"]),
            "s_suppkey",
            "s_nationkey",
        )
    )
    cust_table = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    cust_lut = _lookup_array(cust_table, "c_custkey", "c_nationkey")
    cust_nat = ray.put(cust_lut)
    asia_keys = np.array(sorted(nation_name), dtype=np.int64)

    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    ).materialize()

    def tag_customer_nation(batch: pa.Table) -> pa.Table:
        lut = ray.get(cust_nat)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        cn = lut[ck]
        keep = np.isin(cn, asia_keys)
        return pa.table(
            {
                "o_orderkey": pa.array(
                    batch.column("o_orderkey").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "c_nat": pa.array(cn[keep], pa.int64()),
            }
        )

    lineitem = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def tag_supplier_nation(batch: pa.Table) -> pa.Table:
        lut = ray.get(sup_nat)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        sn = lut[sk]
        keep = np.isin(sn, asia_keys)
        rev = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * (1.0 - batch.column("l_discount").to_numpy(zero_copy_only=False))
            * 1e4
        ).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch.column("l_orderkey").to_numpy(zero_copy_only=False)[keep],
                    pa.int64(),
                ),
                "s_nat": pa.array(sn[keep], pa.int64()),
                "rev": pa.array(rev[keep], pa.int64()),
            }
        )

    q5_schema = pa.schema([("nation", pa.string()), ("revenue", pa.float64())])

    # SIZE GATE (the q3/outer_join pattern): the date-filtered orders
    # slice is a 2-int-column projection; under the cap its
    # (orderkey → customer-nation) map broadcasts as a pair of sorted
    # numpy arrays (searchsorted lookup, no Python dict) and the whole
    # query is ONE lineitem pass emitting ≤|ASIA nations| (s_nat, rev)
    # partial rows per batch — the join exchange disappears, which
    # measured 6.2 s → ~1 s at sf0.1 (the JoinOperator pays ~4 s of
    # aggregator-pool startup regardless of input size).  Above the cap
    # the large-large hash join below runs; GRAFT_JOIN_BROADCAST_MAX=0
    # forces it (pinned by test_tpch_join_exchange_path_matches_broadcast).
    cap = int(os.environ.get("GRAFT_JOIN_BROADCAST_MAX", _JOIN_BROADCAST_MAX))
    if (orders.size_bytes() or 0) <= cap:
        ot = _to_table(orders)
        if "o_custkey" not in ot.column_names or len(asia_keys) == 0:
            return q5_schema.empty_table()
        ok = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
        ck = ot.column("o_custkey").to_numpy(zero_copy_only=False)
        cn = cust_lut[np.minimum(ck, len(cust_lut) - 1)]
        keep = np.isin(cn, asia_keys)
        ok, cn = ok[keep], cn[keep]
        order = np.argsort(ok)
        omref = ray.put((ok[order], cn[order].astype(np.int64)))
        ak = asia_keys

        def li_bcast(b: pa.Table) -> pa.Table:
            lut = ray.get(sup_nat)
            sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
            sn = lut[np.minimum(sk, len(lut) - 1)]
            keep = np.isin(sn, ak)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)[keep]
            sn = sn[keep]
            rev = np.rint(
                b.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep]
                * (1.0 - b.column("l_discount").to_numpy(zero_copy_only=False)[keep])
                * 1e4
            ).astype(np.int64)
            oks, cns = ray.get(omref)
            if len(oks):
                pos = np.minimum(np.searchsorted(oks, lk), len(oks) - 1)
                hit = (oks[pos] == lk) & (cns[pos] == sn)
            else:
                hit = np.zeros(len(lk), dtype=bool)
            sn, rev = sn[hit], rev[hit]
            # ≤|ASIA| exact int sums per batch (5 masked reductions)
            sums = np.array([rev[sn == k].sum() for k in ak], dtype=np.int64)
            cnts = np.array([(sn == k).sum() for k in ak], dtype=np.int64)
            nz = cnts > 0
            return pa.table(
                {
                    "s_nat": pa.array(ak[nz], pa.int64()),
                    "rev": pa.array(sums[nz], pa.int64()),
                }
            )

        agg_t = _sum_partials(
            lineitem.map_batches(
                li_bcast, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["s_nat"],
            ["rev"],
            pa.schema([("s_nat", pa.int64()), ("rev", pa.int64())]),
        )
        return pa.table(
            {
                "nation": pa.array(
                    [nation_name[k] for k in agg_t.column("s_nat").to_pylist()],
                    pa.string(),
                ),
                "revenue": pa.array(
                    _i4_to_money(
                        agg_t.column("rev").to_numpy(zero_copy_only=False)
                    ),
                    pa.float64(),
                ),
            }
        ).sort_by([("revenue", "descending")])

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    left = lineitem.map_batches(tag_supplier_nation, batch_format="pyarrow")
    right = orders.map_batches(tag_customer_nation, batch_format="pyarrow")
    if left.schema() is None or right.schema() is None:
        return q5_schema.empty_table()
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=max(8, cpus // 4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def colocated(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("c_nat"), batch.column("s_nat"))
        return batch.filter(keep).select(["s_nat", "rev"])

    agg = (
        joined.map_batches(colocated, batch_format="pyarrow")
        .groupby("s_nat")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    t = _to_table_s(
        agg, pa.schema([("s_nat", pa.int64()), ("revenue", pa.int64())])
    )
    names = pa.array(
        [nation_name[k] for k in t.column("s_nat").to_pylist()], pa.string()
    )
    t = pa.table(
        {
            "nation": names,
            "revenue": pa.array(
                _i4_to_money(t.column("revenue").to_numpy(zero_copy_only=False)),
                pa.float64(),
            ),
        }
    )
    return t.sort_by([("revenue", "descending")])


SQL_TPCH_Q5 = f"""
SELECT n.n_name AS nation,
       {_sql_i4_money(f"sum({_sql_rev_i4('l.l_extendedprice', 'l.l_discount')})")}
         AS revenue
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01' AND o.o_orderdate < DATE '1997-01-01'
GROUP BY 1 ORDER BY revenue DESC
"""


# --------------------------------------------------------------------------
# sort + top-k (O1/O3)
# --------------------------------------------------------------------------

def q_sort_topk(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    out = ds.sort([("n_chars"), ("doc_id")], descending=[True, False]).limit(10)
    return _to_table(out)


SQL_SORT_TOPK = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# exact dedup (D1)
# --------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return _to_table(dd.exact_dedup(ds))


SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
"""


# --------------------------------------------------------------------------
# newest-wins dedup (D1, reviewer merge semantics)
# --------------------------------------------------------------------------

def q_dedup_latest(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "event_id", "ts"]
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(["ts", "event_id"], ascending=[False, False])
        b = b.drop_duplicates(["user_id", "event_type"], keep="first")
        return pd.DataFrame(
            {
                "user_id": b["user_id"].values,
                "event_type": b["event_type"].values,
                "event_id": b["event_id"].values,
                "ts_us": b["ts"].to_numpy().astype("datetime64[us]").astype("int64"),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_DEDUP_LATEST = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
"""


# --------------------------------------------------------------------------
# regex reference scan (M10) — vectorized arrow kernels
# --------------------------------------------------------------------------

def q_refs_regex(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["source", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "source": batch.column("source"),
                "has_spark": pc.match_substring_regex(text, "spark"),
                "has_joinagg": pc.match_substring_regex(text, "join|agg"),
            }
        )

    out = (
        ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("has_spark", alias_name="n_spark"),
            Sum("has_joinagg", alias_name="n_joinagg"),
        )
    )
    t = _to_table_s(
        out,
        pa.schema(
            [
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("n_spark", pa.int64()),
                ("n_joinagg", pa.int64()),
            ]
        ),
    )
    return t.set_column(
        t.schema.get_field_index("n_spark"), "n_spark", t.column("n_spark").cast(pa.int64())
    ).set_column(
        t.schema.get_field_index("n_joinagg"), "n_joinagg", t.column("n_joinagg").cast(pa.int64())
    )


SQL_REFS_REGEX = """
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(text, 'spark') THEN 1 ELSE 0 END) AS BIGINT) AS n_spark,
       CAST(sum(CASE WHEN regexp_matches(text, 'join|agg') THEN 1 ELSE 0 END) AS BIGINT) AS n_joinagg
FROM documents GROUP BY source
"""
# DuckDB sum() over an int CASE returns HUGEINT/int128, whose hash
# bytes differ from the engine's int64 even when values match — the
# CASTs above align the dtypes (same for token_count/window_session).


# --------------------------------------------------------------------------
# token counting (text analysis)
# --------------------------------------------------------------------------

def q_token_count(sf_dir: str):
    # TextAnalyzer is instantiated ONCE on the driver and shipped as a
    # tiny closure — stateless tasks, module-level regex state warms
    # per worker (an actor pool here measured +3.4 s of startup at
    # sf0.1 for state that is one compiled regex).
    analyzer = TextAnalyzer(text_col="text", features=("tokens",))
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])
    analyzed = ds.map_batches(
        lambda b: analyzer(b), batch_format="pyarrow", zero_copy_batch=True
    )
    return _to_table(
        analyzed.select_columns(["lang", "n_tokens"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_tokens", alias_name="total_tokens"))
    )


SQL_TOKEN_COUNT = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{TOKEN_SQL_RE}'))) AS BIGINT) AS total_tokens
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# deterministic sample (O2 surrogate)
# --------------------------------------------------------------------------

def q_sample_det(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )
    def pick(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 20 == 3))

    return _to_table(ds.map_batches(pick, batch_format="pyarrow"))


SQL_SAMPLE_DET = """
SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 20 = 3
"""


# --------------------------------------------------------------------------
# tumbling window (streaming-shaped, ray_guide pattern)
# --------------------------------------------------------------------------

def q_window_tumbling(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        # (user, hour) keys are nearly as numerous as events here, so a
        # per-batch partial would not compress; one hash exchange on
        # user buckets + a vectorized in-task groupby is the cheap plan
        # (user_id ⊇ the aggregate key → bucket-local is exact).
        b["hour_bucket"] = (
            b["ts"].to_numpy().astype("datetime64[us]").astype("int64") // 3_600_000_000
        )
        agg = b.groupby(["user_id", "hour_bucket"], sort=False).agg(
            n=("value", "size"), sum_value=("value", "sum")
        )
        agg["sum_value"] = agg["sum_value"].round(4)
        return agg.reset_index()[["user_id", "hour_bucket", "n", "sum_value"]]

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_WINDOW_TUMBLING = """
SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events GROUP BY user_id, hour_bucket
"""


# --------------------------------------------------------------------------
# session windows (gap-based; the ray_guide streaming pattern —
# groupby(key) + in-group ts-ordered windowing in pandas)
# --------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000


def q_window_session(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"]
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        if b.empty:
            return pd.DataFrame(
                columns=["user_id", "sid", "session_start_us", "n_events", "sum_value"]
            )
        b = b.sort_values(["user_id", "ts", "event_id"])
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uid = b["user_id"].to_numpy()
        new_user = np.empty(len(b), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(b), dtype=bool)
        gap[0] = False
        gap[1:] = (ts_us[1:] - ts_us[:-1]) > _SESSION_GAP_US
        sid_global = np.cumsum(new_user | gap)  # distinct per (user, session)
        out = pd.DataFrame(
            {"user_id": uid, "g": sid_global, "ts_us": ts_us, "value": b["value"].values}
        )
        agg = out.groupby(["user_id", "g"], sort=False).agg(
            session_start_us=("ts_us", "min"),
            n_events=("ts_us", "size"),
            sum_value=("value", "sum"),
        )
        agg["sum_value"] = agg["sum_value"].round(4)
        agg = agg.reset_index()
        # per-user 0-based session index (matches the SQL sid)
        agg["sid"] = agg.groupby("user_id", sort=False).cumcount()
        return agg[["user_id", "sid", "session_start_us", "n_events", "sum_value"]]

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_WINDOW_SESSION = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM marked
)
SELECT user_id, sid, epoch_us(min(ts)) AS session_start_us,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# sliding window (2h windows advancing hourly: each event lands in two
# hour-buckets — flat_map fan-out + the same bucketed aggregate)
# --------------------------------------------------------------------------

def q_window_sliding(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def fan_out(batch: pa.Table) -> pa.Table:
        ts_us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts_us // 3_600_000_000
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        fanned = pa.table(
            {
                "user_id": pa.array(np.concatenate([uid, uid]), pa.int64()),
                "w": pa.array(np.concatenate([hour, hour + 1]), pa.int64()),
                "value": pa.array(np.concatenate([val, val]), pa.float64()),
            }
        )
        # per-batch combiner: events arrive roughly time-ordered, so a
        # batch holds few distinct (user, window) cells per user —
        # partial (n, sum) collapses the 2x fan-out before the shuffle
        part = fanned.group_by(["user_id", "w"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return part.rename_columns(["user_id", "w", "n", "sum_value"])

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        agg = b.groupby(["user_id", "w"], sort=False).agg(
            n=("n", "sum"), sum_value=("sum_value", "sum")
        )
        agg["sum_value"] = agg["sum_value"].round(4)
        return agg.reset_index()[["user_id", "w", "n", "sum_value"]]

    fanned = ds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(_bucketed(fanned, "user_id", per_bucket))


SQL_WINDOW_SLIDING = """
SELECT user_id, w, count(*) AS n, round(sum(value), 4) AS sum_value
FROM (
  SELECT user_id, value, epoch_us(ts) // 3600000000 AS w FROM events
  UNION ALL
  SELECT user_id, value, epoch_us(ts) // 3600000000 + 1 AS w FROM events
) GROUP BY user_id, w
"""


# --------------------------------------------------------------------------
# multi-level rollup (GROUPING SETS): (lang, source) / (lang) / () —
# three grouped aggregates over one pass-pruned read, unioned with an
# 'ALL' sentinel (engine-neutral alternative to SQL NULL grouping keys)
# --------------------------------------------------------------------------

def q_rollup_multi(sf_dir: str):
    """ONE distributed pass computes the finest (lang, source) level;
    the coarser rollup levels are exact sums over that small result
    table on the driver — no re-scan of the input per level."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source", "n_chars"])
    fine_schema = pa.schema(
        [
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n", pa.int64()),
            ("sum_chars", pa.int64()),
        ]
    )
    fine = _to_table_s(
        ds.groupby(["lang", "source"]).aggregate(
            Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars")
        ),
        fine_schema,
    ).select(["lang", "source", "n", "sum_chars"])
    if fine.num_rows == 0:
        # GROUP BY ROLLUP of an empty input still emits the grand-total
        # row: count 0, NULL sum — the oracle's exact semantics
        return pa.table(
            {
                "lang": pa.array(["ALL"], pa.string()),
                "source": pa.array(["ALL"], pa.string()),
                "n": pa.array([0], pa.int64()),
                "sum_chars": pa.array([None], pa.int64()),
            }
        )

    df = fine.to_pandas()
    by_lang = df.groupby("lang", as_index=False)[["n", "sum_chars"]].sum()
    by_lang["source"] = "ALL"
    total = pd.DataFrame(
        {
            "lang": ["ALL"],
            "source": ["ALL"],
            "n": [int(df["n"].sum())],
            "sum_chars": [int(df["sum_chars"].sum())],
        }
    )
    cols = ["lang", "source", "n", "sum_chars"]
    coarse = pa.Table.from_pandas(
        pd.concat([by_lang[cols], total[cols]], ignore_index=True),
        preserve_index=False,
    ).cast(fine.schema)
    return pa.concat_tables([fine, coarse])


SQL_ROLLUP_MULTI = """
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


# --------------------------------------------------------------------------
# ANN: brute-force cosine top-k (SQL-checkable as neighbor sets)
# --------------------------------------------------------------------------

_ANN_QUERY_IDS = [0, 1, 2]
_ANN_K = 10


def _query_vectors(sf_dir: str) -> dict[int, list[float]]:
    t = pa.parquet.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    wanted = {}
    ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    for i, v in zip(ids, vecs):
        if i in _ANN_QUERY_IDS:
            wanted[i] = v
    return wanted


def q_ann_bruteforce(sf_dir: str):
    qv = _query_vectors(sf_dir)
    if not qv:  # empty lake → no query vectors exist
        return pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64())]
        ).empty_table()
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = sim.brute_force_topk(ds, qv, k=_ANN_K)
    return _to_table(out).select(["query_id", "vec_id"])


SQL_ANN_BRUTEFORCE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id IN (0, 1, 2))
SELECT query_id, vec_id FROM (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(e.embedding, q.qe) AS cos,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC,
                                     e.vec_id ASC) AS rk
  FROM embeddings e CROSS JOIN q)
WHERE rk <= {_ANN_K}
"""


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed approximate variant (no SQL oracle: approximate by
    construction — driver records rows-only)."""
    qv = _query_vectors(sf_dir)
    if not qv:  # empty lake → no query vectors exist
        return pa.schema(
            [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cosine", pa.float64())]
        ).empty_table()
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = sim.ivf_topk(ds, qv, k=_ANN_K)
    return _to_table(out).select(["query_id", "vec_id", "cosine"])


# --------------------------------------------------------------------------
# multimodal plumbing (binary payloads; fake codec, real schema)
# --------------------------------------------------------------------------

def q_multimodal_meta(sf_dir: str):
    docs = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_media(batch: pa.Table) -> pa.Table:
        # string→binary cast is zero-copy (UTF-8 bytes reinterpreted)
        payloads = pc.cast(batch.column("text"), pa.binary())
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "kind": pa.array(["image"] * batch.num_rows, pa.string()),
                "payload": payloads,
            }
        )

    media = docs.map_batches(to_media, batch_format="pyarrow", batch_size=64)
    feats = featurize_media(media, batch_size=32)
    return _to_table(feats.select_columns(["media_id", "n_bytes"]))


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id, strlen(text) AS n_bytes FROM documents
"""


def q_multimodal_frames(sf_dir: str):
    """Frame-sampling plumbing check: synthesize video media whose
    duration derives deterministically from the document (10 ms per
    char), sample a frame every 500 ms (one output row per frame —
    flat-map fan-out), count frames per media.  The frame COUNT is
    SQL-derivable from the duration rule, so the whole fan-out is
    oracle-checked even though the frame payloads are fake."""
    from ray.data.aggregate import Count

    from ..stages.multimodal import MEDIA_SCHEMA, sample_frames

    docs = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_video(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = [(t or "").encode("utf-8") for t in texts]
        # duration from BYTE length — DuckDB strlen counts bytes, so
        # multibyte text keeps engine and oracle frame counts equal
        metas = pa.array(
            [
                {"width": 0, "height": 0, "duration_ms": len(p) * 10}
                for p in payloads
            ],
            MEDIA_SCHEMA.field("meta").type,
        )
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "kind": pa.array(["video"] * len(payloads), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": metas,
            }
        )

    media = docs.map_batches(to_video, batch_format="pyarrow", batch_size=64)
    frames = sample_frames(media, every_ms=500, batch_size=16)
    return _to_table(
        frames.groupby("media_id").aggregate(Count(alias_name="n_frames"))
    )


SQL_MULTIMODAL_FRAMES = """
SELECT doc_id AS media_id, CAST(strlen(text) * 10 // 500 AS BIGINT) AS n_frames
FROM documents WHERE strlen(text) * 10 // 500 > 0
"""


# --------------------------------------------------------------------------
# classic analytics breadth: TPC-H-style rollup, distinct, top-k/group
# --------------------------------------------------------------------------

def q_tpch_q1(sf_dir: str):
    """TPC-H Q1-shaped rollup over lineitem (pruned read, vectorized
    derived columns, grouped aggregate)."""
    import datetime

    ds = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def derive(batch: pa.Table) -> pa.Table:
        keep = pc.less_equal(
            batch.column("l_shipdate"),
            pa.scalar(datetime.datetime(1998, 9, 2)),
        )
        batch = batch.filter(keep)
        # money columns as exact scaled int64 (see _money_i4): cents
        # for 2dp columns, ten-thousandths for price×(1−disc) — sums
        # become summation-order-proof; quantities are integer-valued
        # doubles whose float sum is already exact below 2^53
        base_i2 = pa.array(
            np.rint(
                batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64),
            pa.int64(),
        )
        disc_i2 = pa.array(
            np.rint(
                batch.column("l_discount").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64),
            pa.int64(),
        )
        return (
            batch.append_column(
                "disc_price_i4",
                _money_i4(batch.column("l_extendedprice"), batch.column("l_discount")),
            )
            .append_column("base_i2", base_i2)
            .append_column("disc_i2", disc_i2)
        )

    out = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_i2", alias_name="sum_base_i2"),
            Sum("disc_price_i4", alias_name="sum_disc_i4"),
            Sum("disc_i2", alias_name="sum_disc_pct_i2"),
            Count(alias_name="count_order"),
        )
    )
    t = _to_table_s(
        out,
        pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.float64()),
                ("sum_base_i2", pa.int64()),
                ("sum_disc_i4", pa.int64()),
                ("sum_disc_pct_i2", pa.int64()),
                ("count_order", pa.int64()),
            ]
        ),
    )
    n = t.column("count_order").to_numpy(zero_copy_only=False).astype(np.float64)
    t = pa.table(
        {
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "sum_qty": pc.round(t.column("sum_qty"), ndigits=2),
            "sum_base_price": pa.array(
                np.round(
                    t.column("sum_base_i2").to_numpy(zero_copy_only=False) / 100.0, 2
                ),
                pa.float64(),
            ),
            "sum_disc_price": pa.array(
                _i4_to_money(t.column("sum_disc_i4").to_numpy(zero_copy_only=False)),
                pa.float64(),
            ),
            "avg_disc": pa.array(
                np.round(
                    t.column("sum_disc_pct_i2").to_numpy(zero_copy_only=False)
                    / 100.0
                    / n,
                    2,
                ),
                pa.float64(),
            ),
            "count_order": t.column("count_order"),
        }
    )
    return t


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0, 2)
         AS sum_base_price,
       ((sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50)
        // 100) / 100.0 AS sum_disc_price,
       round(sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*), 2)
         AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_distinct_sources(sf_dir: str):
    """DISTINCT via Dataset.unique (a shuffle)."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["source"])
    # Dataset.unique returns None (not []) when the input is all-empty
    values = sorted(ds.unique("source") or [])
    return pa.table({"source": pa.array(values, pa.string())})


SQL_DISTINCT_SOURCES = "SELECT DISTINCT source FROM documents"


# --------------------------------------------------------------------------
# exact grouped COUNT(DISTINCT) — the two-level-aggregate shape.  A
# per-batch combiner dedups (key, value) pairs vectorized, so the one
# exchange moves near-distinct pairs (bounded by |keys|×|values|, not by
# row count); the second "aggregate" is a per-group distinct count over
# already-unique pairs, done inside the same bucketed group call.  At
# 100 TB the shuffle volume is O(distinct pairs), never O(rows).
# --------------------------------------------------------------------------

def q_distinct_per_group(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(dedup_pairs, batch_format="pyarrow", zero_copy_batch=True)

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": pd.Series([g["event_type"].iloc[0]], dtype="object"),
                "n_users": pd.Series([g["user_id"].nunique()], dtype="int64"),
            }
        )

    return _to_table(
        pairs.groupby("event_type").map_groups(count_distinct, batch_format="pandas")
    )


SQL_DISTINCT_PER_GROUP = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""


def q_topk_per_group(sf_dir: str):
    """Top-3 docs by n_chars per language (deterministic id tiebreak) —
    COMBINER shape: each batch emits its own per-lang top-3, so the
    exchange moves ≤ 3 rows per (batch, lang) and the final per-lang
    merge group is O(3 × batches) regardless of language size.  (lang
    is low-cardinality; a whole-group map_groups would put ~half a
    100-TB corpus in one task.)  Top-k is trivially combinable:
    top3(A ∪ B) = top3(top3(A) ∪ top3(B))."""
    ds = _read_pq(
        _t(sf_dir, "documents"), columns=["lang", "doc_id", "n_chars"]
    )

    def top3(b: pd.DataFrame) -> pa.Table:
        t = (
            b.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .groupby("lang", sort=False)
            .head(3)
        )
        return pa.table(
            {
                "lang": pa.array(t["lang"], pa.string()),
                "doc_id": pa.array(t["doc_id"].to_numpy(), pa.int64()),
                "n_chars": pa.array(t["n_chars"].to_numpy(), pa.int64()),
            }
        )

    partials = ds.map_batches(top3, batch_format="pandas")
    return _merge_partials(
        partials,
        key="lang",
        per_bucket=top3,
        input_schema=pa.schema(
            [("lang", pa.string()), ("doc_id", pa.int64()), ("n_chars", pa.int64())]
        ),
    )


SQL_TOPK_PER_GROUP = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents)
WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# anti-join (semi/anti via broadcast key set — ray_guide joins section)
# --------------------------------------------------------------------------

def q_anti_join(sf_dir: str):
    """Orders with no lineitems — BROADCAST anti-join variant for a
    small key side: the key column is read pruned, deduped, broadcast
    once via ray.put, and each batch drops members with a vectorized
    ``pc.is_in`` mask (no shuffle).  For a key side too big for the
    driver, use ``q_anti_join_shuffle``."""
    keys = np.unique(
        pa.parquet.read_table(_t(sf_dir, "lineitem"), columns=["l_orderkey"])
        .column("l_orderkey")
        .to_numpy(zero_copy_only=False)
    )
    kref = ray.put(pa.array(keys))  # broadcast the ARROW array once

    def keep_itemless(batch: pa.Table) -> pa.Table:
        k = ray.get(kref)  # local object-store hit after first fetch
        mask = pc.invert(pc.is_in(batch.column("o_orderkey"), value_set=k))
        return batch.filter(mask)

    ds = _read_pq(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"]
    )
    return _to_table(
        ds.map_batches(keep_itemless, batch_format="pyarrow", zero_copy_batch=True)
    )


_ANTI_BUCKETS = 32


def q_anti_join_shuffle(sf_dir: str):
    """SHUFFLE anti-join variant — the 100-TB path when the key side's
    distinct set does not fit the driver: hash-partition BOTH sides on
    the key (one exchange), per-bucket vectorized set-minus in pandas.
    Lineitem keys are pre-deduped per batch (combiner) so only unique
    (key, bucket) rows cross the shuffle."""
    orders = _read_pq(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"]
    )
    lineitem = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey"])

    def orders_keyed(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": batch.column("o_orderkey").cast(pa.int64()),
                "o_orderstatus": batch.column("o_orderstatus"),
                "probe": pa.array(np.zeros(len(k), dtype=np.int8), pa.int8()),
                "_bucket": pa.array((k % _ANTI_BUCKETS).astype("int32")),
            }
        )

    def lineitem_keyed(batch: pa.Table) -> pa.Table:
        k = np.unique(batch.column("l_orderkey").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "key": pa.array(k.astype("int64"), pa.int64()),
                "o_orderstatus": pa.array([""] * len(k), pa.string()),
                "probe": pa.array(np.ones(len(k), dtype=np.int8), pa.int8()),
                "_bucket": pa.array((k % _ANTI_BUCKETS).astype("int32")),
            }
        )

    both = orders.map_batches(orders_keyed, batch_format="pyarrow").union(
        lineitem.map_batches(lineitem_keyed, batch_format="pyarrow")
    )

    def set_minus(b: pd.DataFrame) -> pd.DataFrame:
        build = b.loc[b["probe"] == 1, "key"]
        probe = b.loc[b["probe"] == 0]
        out = probe.loc[~probe["key"].isin(build)]
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series(out["key"].to_numpy(), dtype="int64"),
                # explicit StringDtype: an EMPTY object column converts
                # to Arrow `null`, destabilizing block schemas (the
                # round-1 embed_neardup disease)
                "o_orderstatus": pd.Series(
                    out["o_orderstatus"].to_numpy(), dtype="string"
                ),
            }
        )

    out = (
        both.groupby("_bucket", num_partitions=_ANTI_BUCKETS)
        .map_groups(set_minus, batch_format="pandas")
    )
    # Strip the pandas-extension schema metadata the StringDtype blocks
    # carry, so to_pandas() yields plain object strings like every
    # other query (the driver hash is dtype-sensitive).
    return _to_table(out).replace_schema_metadata(None)


SQL_ANTI_JOIN = """
SELECT o_orderkey, o_orderstatus FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


def q_semi_join(sf_dir: str):
    """Orders WITH lineitems — broadcast semi-join (the EXISTS dual of
    ``q_anti_join``): deduped key column broadcast once, vectorized
    ``pc.is_in`` keep-mask per batch, no shuffle."""
    keys = np.unique(
        pa.parquet.read_table(_t(sf_dir, "lineitem"), columns=["l_orderkey"])
        .column("l_orderkey")
        .to_numpy(zero_copy_only=False)
    )
    kref = ray.put(pa.array(keys))  # broadcast the ARROW array once

    def keep_with_items(batch: pa.Table) -> pa.Table:
        k = ray.get(kref)
        return batch.filter(pc.is_in(batch.column("o_orderkey"), value_set=k))

    ds = _read_pq(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"]
    )
    return _to_table(
        ds.map_batches(keep_with_items, batch_format="pyarrow", zero_copy_batch=True)
    )


SQL_SEMI_JOIN = """
SELECT o_orderkey, o_orderstatus FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


# --------------------------------------------------------------------------
# as-of join (an operator Ray Data lacks — composed per the brief's
# recipe: hash-partition on the entity key, ordered in-bucket probe)
# --------------------------------------------------------------------------

def q_asof_join(sf_dir: str):
    """For every click, the most recent purchase by the same user at or
    before the click (ties on ts broken by larger event_id; -1 when no
    prior purchase).  Partitioning assumption (documented): the as-of
    probe is entity-local, so ONE hash exchange on user_id co-locates
    each user's timeline; inside the bucket a sorted ``searchsorted``
    probe is O((clicks+purchases)·log)."""
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type"]
    )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out_click, out_user, out_ts, out_prior = [], [], [], []
        for uid, g in b.groupby("user_id", sort=False):
            p = g.loc[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
            c = g.loc[g["event_type"] == "click"].sort_values(["ts", "event_id"])
            if c.empty:
                continue
            c_ts = c["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            if p.empty:
                prior = np.full(len(c), -1, dtype=np.int64)
            else:
                p_ts = p["ts"].to_numpy().astype("datetime64[us]").astype("int64")
                p_id = p["event_id"].to_numpy()
                # rightmost purchase with ts <= click ts; within equal
                # ts the array is event_id-ascending, so "rightmost"
                # IS the larger event_id — matching the SQL tiebreak
                idx = np.searchsorted(p_ts, c_ts, side="right") - 1
                prior = np.where(idx >= 0, p_id[np.maximum(idx, 0)], -1)
            out_click.extend(c["event_id"].to_list())
            out_user.extend([uid] * len(c))
            out_ts.extend(c_ts.tolist())
            out_prior.extend(prior.tolist())
        return pd.DataFrame(
            {
                "click_id": pd.Series(out_click, dtype="int64"),
                "user_id": pd.Series(out_user, dtype="int64"),
                "ts_us": pd.Series(out_ts, dtype="int64"),
                "prior_purchase_id": pd.Series(out_prior, dtype="int64"),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_ASOF_JOIN = """
SELECT a.event_id AS click_id, a.user_id, epoch_us(a.ts) AS ts_us,
       COALESCE((SELECT b.event_id FROM events b
                 WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
                   AND b.ts <= a.ts
                 ORDER BY b.ts DESC, b.event_id DESC LIMIT 1), -1)
           AS prior_purchase_id
FROM events a WHERE a.event_type = 'click'
"""


# --------------------------------------------------------------------------
# range (band) join — an operator Ray Data lacks natively.  The small
# side is an IRREGULAR interval dimension (half-open [lo, hi) bands),
# defined once here and mirrored verbatim in the SQL oracle's VALUES
# list.  Scale path: the dimension is tiny and sorted by lo, so this is
# a broadcast range join — the band edges ship with the task closure,
# each batch matches via one binary search (np.searchsorted), and a
# per-batch combiner collapses output to one row per band, so the only
# exchange is the final O(bands)-row aggregate.  The fact table never
# shuffles at any scale.
# --------------------------------------------------------------------------

_PRICE_BANDS = (
    ("budget", 0.0, 75_000.0),
    ("mid", 75_000.0, 150_000.0),
    ("upper", 150_000.0, 240_000.0),
    ("premium", 240_000.0, 360_000.0),
    ("luxury", 360_000.0, 1e9),
)


def q_range_join(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "orders"), columns=["o_totalprice"])
    edges = np.array([b[1] for b in _PRICE_BANDS], dtype=np.float64)
    names = [b[0] for b in _PRICE_BANDS]

    def tag_and_combine(batch: pa.Table) -> pa.Table:
        price = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        # rightmost band with lo <= price; hi is the next band's lo so
        # the intervals are half-open [lo, hi) exactly like the SQL
        idx = np.searchsorted(edges, price, side="right") - 1
        # prices at/above the last band's hi fall outside every band
        # (the SQL's `< hi` predicate); negatives already map to -1
        idx[price >= _PRICE_BANDS[-1][2]] = -1
        out_band, out_n, out_sum = [], [], []
        for i, name in enumerate(names):
            mask = idx == i
            n = int(mask.sum())
            if n:
                out_band.append(name)
                out_n.append(n)
                out_sum.append(float(price[mask].sum()))
        return pa.table(
            {
                "band": pa.array(out_band, pa.string()),
                "n_orders": pa.array(out_n, pa.int64()),
                "sum_price": pa.array(out_sum, pa.float64()),
            }
        )

    out = (
        ds.map_batches(tag_and_combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("band")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("sum_price", alias_name="sum_price"),
        )
    )
    t = _to_table_s(
        out,
        pa.schema(
            [
                ("band", pa.string()),
                ("n_orders", pa.int64()),
                ("sum_price", pa.float64()),
            ]
        ),
    )
    return t.set_column(
        t.schema.get_field_index("sum_price"),
        "sum_price",
        pc.round(t.column("sum_price"), ndigits=2),
    )


SQL_RANGE_JOIN = """
SELECT b.band, CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS sum_price
FROM orders o
JOIN (VALUES ('budget', 0.0, 75000.0),
             ('mid', 75000.0, 150000.0),
             ('upper', 150000.0, 240000.0),
             ('premium', 240000.0, 360000.0),
             ('luxury', 360000.0, 1e9)) AS b(band, lo, hi)
  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
"""


# --------------------------------------------------------------------------
# exact grouped percentiles — two BOUNDED passes, no whole-group
# materialization.  ``lang`` is low-cardinality (at 100 TB one language
# is ~half the corpus), so the old ``groupby(lang).map_groups(sort)``
# was an unsplittable single-task OOM.  Instead:
#   pass 1: the mergeable (lang, bin, cnt) histogram (same combiner as
#           q_approx_percentiles) locates each quantile's bin and its
#           local rank — exchange volume O(langs × bins), independent
#           of corpus size;
#   pass 2: per-batch (lang, value) counts restricted to the LOCATED
#           bins (≤ 3 bins × bin-width distinct integer values per
#           lang) — the exact order statistic is read off the summed
#           value counts.  DuckDB quantile_disc rule: sorted[⌈q·n⌉-1].
# --------------------------------------------------------------------------

_STAT_BUCKETS = 8


_DRIVER_MERGE_MAX_ROWS = 65_536  # partial-stream size below which one
# in-process reduce beats an exchange (size-aware, like the shuffle
# strategy: partials are O(blocks × keys × bins), so a small lake's
# stream is a few thousand rows and the ~1 s exchange setup dominates;
# a 100-TB lake's stream is billions of rows and takes the bucketed
# exchange below)


def _merge_partials(partials, key: str, per_bucket, input_schema: pa.Schema | None = None):
    """Merge tiny per-batch combiner outputs.  ``per_bucket`` must be
    an explicit-schema Arrow-returning merge over a frame holding ALL
    partials of each key it sees (it always handles many keys — buckets
    do too).

    Size-aware (the partial stream is materialized first — that's what
    the exchange would do anyway): at or below
    ``_DRIVER_MERGE_MAX_ROWS`` the merge runs as one in-process
    ``per_bucket`` call (zero exchanges); above, ONE bucketed exchange —
    ``Dataset.groupby().aggregate()`` pays ~5 s fixed setup per
    exchange even on a few-thousand-row partial stream (measured:
    set_ops 15.2 s → 5.3 s through the bucket shape), and the bucket
    hash runs over combiner OUTPUT (O(groups) rows/batch), never over
    the data."""
    mat = partials.materialize()
    n_rows = mat.count()
    if n_rows <= _DRIVER_MERGE_MAX_ROWS:
        if n_rows == 0 and input_schema is not None:
            # an all-empty partial stream can surface as zero blocks —
            # to_pandas() then loses the columns and per_bucket KeyErrors
            df = input_schema.empty_table().to_pandas()
        else:
            df = mat.to_pandas()
        return per_bucket(df)

    # bucket count scales with the partial stream (~2M rows/bucket
    # target) so a 167M-row exchange doesn't serialize into 32 pandas
    # tasks; only run-internal determinism is needed of the hash
    n_buckets = max(_STAT_BUCKETS, min(1024, n_rows // 2_000_000))

    def add_bucket(batch: pa.Table) -> pa.Table:
        col = batch.column(key)
        if pa.types.is_integer(col.type):
            from ..functions.sketches import _splitmix64

            h = _splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            # vectorized cython path (per-value zlib.crc32 measured as
            # the dominant cost of the 167M-row winnow exchange)
            h = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
        b = (h % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b, pa.int32()))

    return _to_table(
        mat.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=n_buckets)
        .map_groups(per_bucket, batch_format="pandas")
    )


def _sum_partials(partials, keys: list[str], sum_cols: list[str], schema: pa.Schema):
    """``_merge_partials`` specialization: grouped SUM of the partials."""

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(keys, sort=False, as_index=False)[sum_cols].sum()
        return pa.table({f.name: pa.array(g[f.name], type=f.type) for f in schema})

    # a _sum_partials input frame has exactly the output columns
    return _merge_partials(partials, keys[0], per_bucket, input_schema=schema)


def _lang_hist(sf_dir: str) -> pd.DataFrame:
    """Summed per-(lang, n_chars-bin) histogram of the documents table
    — the shared mergeable partial under q_percentiles / q_ntile /
    q_approx_percentiles.  Returns a (lang, bin, cnt) frame sorted by
    (lang, bin); size O(langs × bins) regardless of corpus size."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "lang": b["lang"].to_numpy(),
                    "bin": b["n_chars"].to_numpy() // _HIST_BIN,
                }
            )
            .groupby(["lang", "bin"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "bin": pa.array(g["bin"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    hist = _sum_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["lang", "bin"],
        sum_cols=["cnt"],
        schema=pa.schema(
            [("lang", pa.string()), ("bin", pa.int64()), ("cnt", pa.int64())]
        ),
    )
    return hist.to_pandas().sort_values(["lang", "bin"]).reset_index(drop=True)


def _grouped_order_stats(ds_factory, key: str, value_of, ranks_for):
    """EXACT per-key order statistics of a derived int64 value at
    requested 1-indexed ranks without materializing any key group —
    two bounded histogram passes whose exchanges carry O(keys × bins)
    rows regardless of corpus size.

    ``ds_factory() -> Dataset`` (called once per pass — a fresh lazy
    scan each time, nothing is pinned); ``value_of(pa.Table) ->
    np.int64 array``; ``ranks_for(n) -> dict[label, rank]`` (ranks < 1
    are skipped).  ``key`` must be a string column.  Returns ``{key:
    {"n": n, "stats": {label: (value, k_within, cnt_at_value)}}}``
    where ``value`` is the rank-th smallest, ``k_within`` its 1-indexed
    rank among rows tied at that value, and ``cnt_at_value`` the tie
    count."""

    def hist_partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "key": b.column(key).to_numpy(zero_copy_only=False),
                    "bin": value_of(b) // _HIST_BIN,
                }
            )
            .groupby(["key", "bin"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "key": pa.array(g["key"], pa.string()),
                "bin": pa.array(g["bin"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    hist = (
        _sum_partials(
            ds_factory().map_batches(hist_partial, batch_format="pyarrow"),
            keys=["key", "bin"],
            sum_cols=["cnt"],
            schema=pa.schema(
                [("key", pa.string()), ("bin", pa.int64()), ("cnt", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["key", "bin"])
    )

    # locate each rank's bin + local rank (driver work over the tiny
    # histogram only)
    want: dict[str, dict] = {}
    needed_bins: set[tuple[str, int]] = set()
    for k, g in hist.groupby("key", sort=False):
        cnt = g["cnt"].to_numpy()
        bins = g["bin"].to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        locs = {}
        for label, rank in ranks_for(n).items():
            if rank < 1:
                continue
            i = int(np.searchsorted(cum, rank))
            local = int(rank - (cum[i - 1] if i else 0))
            locs[label] = (int(bins[i]), local)
            needed_bins.add((k, int(bins[i])))
        want[k] = {"n": n, "locs": locs}

    # pass 2: exact value counts inside the located bins only
    needed_df = pd.DataFrame(sorted(needed_bins), columns=["key", "bin"])

    def val_partial(b: pa.Table) -> pa.Table:
        v = value_of(b)
        t = pd.DataFrame(
            {
                "key": b.column(key).to_numpy(zero_copy_only=False),
                "bin": v // _HIST_BIN,
                "val": v,
            }
        ).merge(needed_df, on=["key", "bin"])
        g = t.groupby(["key", "val"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "key": pa.array(g["key"], pa.string()),
                "val": pa.array(g["val"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    vals = (
        _sum_partials(
            ds_factory().map_batches(val_partial, batch_format="pyarrow"),
            keys=["key", "val"],
            sum_cols=["cnt"],
            schema=pa.schema(
                [("key", pa.string()), ("val", pa.int64()), ("cnt", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["key", "val"])
    )

    out: dict[str, dict] = {}
    for k, info in want.items():
        v = vals[vals["key"] == k]
        vv = v["val"].to_numpy()
        vc = v["cnt"].to_numpy()
        vbin = vv // _HIST_BIN
        stats = {}
        for label, (b, local) in info["locs"].items():
            m = vbin == b
            bv, bc = vv[m], vc[m]
            cum = np.cumsum(bc)
            i = int(np.searchsorted(cum, local))
            k_within = int(local - (cum[i - 1] if i else 0))
            stats[label] = (int(bv[i]), k_within, int(bc[i]))
        out[k] = {"n": info["n"], "stats": stats}
    return out


def _lang_nchars_order_stats(sf_dir: str, ranks_for, ds_factory=None):
    """Per-language exact order statistics of ``n_chars`` (the
    documents-table specialization of ``_grouped_order_stats``).

    ``ds_factory`` lets a multi-pass caller (q_ntile) hand in ONE
    pinned materialized scan shared by every pass instead of
    launching a fresh read pipeline per pass — at bench scale each
    extra pipeline launch costs ~0.5 s of pure scheduling."""
    return _grouped_order_stats(
        ds_factory
        or (lambda: _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])),
        "lang",
        lambda b: b.column("n_chars").to_numpy(zero_copy_only=False),
        ranks_for,
    )


def q_percentiles(sf_dir: str):
    stats = _lang_nchars_order_stats(
        sf_dir,
        lambda n: {
            "p50": int(np.ceil(0.5 * n)),
            "p90": int(np.ceil(0.9 * n)),
            "p99": int(np.ceil(0.99 * n)),
        },
    )
    langs = sorted(stats)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n": pa.array([stats[l]["n"] for l in langs], pa.int64()),
            "p50": pa.array([stats[l]["stats"]["p50"][0] for l in langs], pa.int64()),
            "p90": pa.array([stats[l]["stats"]["p90"][0] for l in langs], pa.int64()),
            "p99": pa.array([stats[l]["stats"]["p99"][0] for l in langs], pa.int64()),
        }
    )


SQL_PERCENTILES = """
SELECT lang, count(*) AS n,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
       CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# corpus vocabulary top-k — the canonical COMBINER pattern: each batch
# pre-aggregates token counts fully vectorized (Arrow split + value_counts),
# so only near-distinct (word, partial_count) rows cross the shuffle; the
# final groupby-sum runs over a bounded-vocabulary table regardless of
# corpus size.  Heavy-hitter ("the") skew lands on the combiner, not the
# exchange — at 100 TB the shuffle volume is O(vocab × num_batches).
# --------------------------------------------------------------------------

def q_vocab_topk(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "word"], descending=[True, False])
        .limit(50)
    )
    return _to_table(agg)


# (cnt DESC, word ASC) is a total order — the top-50 *set* is
# deterministic even with count ties at the cutoff.
SQL_VOCAB_TOPK = """
SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
  FROM documents)
WHERE word <> '' GROUP BY word
ORDER BY cnt DESC, word LIMIT 50
"""


# --------------------------------------------------------------------------
# conversion funnel — first click → first purchase per user.  Same
# combiner shape: per-batch pandas groupby-min collapses each batch to
# one row per (user, batch), so the user-key exchange moves O(users)
# rows.  Sentinel int64 (not NaN) keeps epoch-microsecond timestamps
# exact — float64 loses integer precision above 2^53.
# --------------------------------------------------------------------------

_FUNNEL_SENT = np.int64(2**62)


def q_funnel(sf_dir: str):
    from ray.data.aggregate import Min

    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "event_type", "ts"]
    )

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native combiner (round-3 kernel swap): pc.if_else +
        # TableGroupBy.min measured 3.0× the pandas groupby version
        # (4.2 vs 12.6 ms per 200k-row batch, to_pandas included) and
        # skips the pandas copy entirely; the output is a plain Arrow
        # table (hashable schema across the shuffle).
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        et = b.column("event_type")
        sent = pa.scalar(int(_FUNNEL_SENT), pa.int64())
        g = pa.TableGroupBy(
            pa.table(
                {
                    "user_id": b.column("user_id"),
                    "c": pc.if_else(pc.equal(et, "click"), t, sent),
                    "p": pc.if_else(pc.equal(et, "purchase"), t, sent),
                }
            ),
            "user_id",
        ).aggregate([("c", "min"), ("p", "min")])
        return g.rename_columns(["user_id", "c", "p"])

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("first_click_us")
        p = batch.column("first_purchase_us")
        keep = pc.and_(
            pc.and_(
                pc.not_equal(c, int(_FUNNEL_SENT)),
                pc.not_equal(p, int(_FUNNEL_SENT)),
            ),
            pc.greater(p, c),
        )
        return batch.filter(keep)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(
            Min("c", alias_name="first_click_us"),
            Min("p", alias_name="first_purchase_us"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )
    return _to_table(agg)


SQL_FUNNEL = """
SELECT user_id,
       epoch_us(min(CASE WHEN event_type = 'click' THEN ts END)) AS first_click_us,
       epoch_us(min(CASE WHEN event_type = 'purchase' THEN ts END)) AS first_purchase_us
FROM events GROUP BY user_id
HAVING first_click_us IS NOT NULL AND first_purchase_us IS NOT NULL
   AND first_purchase_us > first_click_us
"""


# --------------------------------------------------------------------------
# HyperLogLog approximate distinct (mergeable sketch; rows-only —
# approximate by construction, accuracy pinned by pytest instead)
# --------------------------------------------------------------------------

def q_approx_distinct(sf_dir: str):
    from ..functions.sketches import (
        hash_values,
        hll_add_hashes,
        hll_estimate,
        hll_merge,
        hll_new,
    )

    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        reg = hll_new()
        hll_add_hashes(
            reg, hash_values(batch.column("user_id").to_numpy(zero_copy_only=False))
        )
        return pa.table({"sketch": pa.array([reg.tobytes()], pa.binary())})

    import numpy as np

    merged = hll_new()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for s in b.column("sketch").to_pylist():
            merged = hll_merge(merged, np.frombuffer(s, dtype=np.uint8))
    return pa.table(
        {"approx_distinct_users": pa.array([int(round(hll_estimate(merged)))], pa.int64())}
    )


def q_approx_distinct_grouped(sf_dir: str):
    """Per-group HLL: one tiny mergeable sketch per (batch, group)
    crosses the exchange (4 KB each), merged per group by elementwise
    max — the scale shape for COUNT(DISTINCT high-cardinality) BY key
    when the exact pair-dedup exchange of ``q:distinct_per_group``
    is itself too large.  Approximate by construction (no SQL oracle);
    accuracy vs exact is pinned by ``test_grouped_hll_accuracy``."""
    from ..functions.sketches import (
        hash_values,
        hll_add_hashes,
        hll_estimate,
        hll_merge,
        hll_new,
    )

    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        types, sketches = [], []
        df = batch.to_pandas()
        for etype, g in df.groupby("event_type", sort=False):
            reg = hll_new()
            hll_add_hashes(reg, hash_values(g["user_id"].to_numpy()))
            types.append(etype)
            sketches.append(reg.tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "sketch": pa.array(sketches, pa.binary()),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = hll_new()
        for s in g["sketch"]:
            merged = hll_merge(merged, np.frombuffer(s, dtype=np.uint8))
        return pd.DataFrame(
            {
                "event_type": pd.Series([g["event_type"].iloc[0]], dtype="object"),
                "approx_users": pd.Series(
                    [int(round(hll_estimate(merged)))], dtype="int64"
                ),
            }
        )

    return _to_table(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge_group, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# text-analysis heuristics (language id / quality scoring)
#
# Both are deterministic enough to mirror in ANSI SQL: the corpus is
# ASCII + CJK, where Python's unicode word regex degenerates to
# [a-z]+ / CJK runs and both engines compute the identical IEEE-754
# doubles (no rounding anywhere, so the driver's value hash matches
# bit-for-bit).  The stopword profiles are injected from the single
# source of truth in functions/textstats.py.
# --------------------------------------------------------------------------

def _sw_sql(lang: str) -> str:
    from pdf_extractor_ray.functions.textstats import _STOPWORDS

    return ", ".join("'%s'" % w for w in sorted(_STOPWORDS[lang]))


def q_langid(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def lid(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(
                    [detect_language(t or "") for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )

    return _to_table(ds.map_batches(lid, batch_format="pyarrow", zero_copy_batch=True))


# Mirrors textstats.detect_language: CJK-share short-circuit over the
# first 400 chars, then a stopword-profile vote over the first 300
# words with sorted-language tie-break and a max(2, n_words // 50)
# confidence floor.  The word class [a-z + CJK] equals Python's
# unicode \p{L} tokenizer on this corpus's alphabet.
SQL_LANGID = """
WITH w AS (
  SELECT doc_id, length(text) AS n,
         len(regexp_extract_all(substr(text, 1, 400), '[\\x{4E00}-\\x{9FFF}]')) AS cjk,
         (regexp_extract_all(lower(text), '[a-z\\x{4E00}-\\x{9FFF}]+'))[1:300] AS words
  FROM documents
), h AS (
  SELECT doc_id, n, cjk, len(words) AS nw,
    len(list_filter(words, x -> x IN (%(de)s))) AS h_de,
    len(list_filter(words, x -> x IN (%(en)s))) AS h_en,
    len(list_filter(words, x -> x IN (%(es)s))) AS h_es,
    len(list_filter(words, x -> x IN (%(fr)s))) AS h_fr,
    len(list_filter(words, x -> x IN (%(zh)s))) AS h_zh
  FROM w
)
SELECT doc_id,
  CASE
    WHEN n = 0 THEN 'und'
    WHEN cjk > least(n, 400) * 0.2 THEN 'zh'
    WHEN nw = 0 THEN 'und'
    WHEN greatest(h_de, h_en, h_es, h_fr, h_zh) < greatest(2, nw // 50) THEN 'und'
    WHEN h_de = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'de'
    WHEN h_en = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'en'
    WHEN h_es = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'es'
    WHEN h_fr = greatest(h_de, h_en, h_es, h_fr, h_zh) THEN 'fr'
    ELSE 'zh'
  END AS pred_lang
FROM h
"""

# label × prediction cross-tab; the langid replica runs as a subquery
# (keeps the %-placeholders, formatted once in ORACLES)
SQL_LANG_CONFUSION = (
    "SELECT d.lang AS label, p.pred_lang AS pred, CAST(count(*) AS BIGINT) AS n\n"
    "FROM documents d JOIN (" + SQL_LANGID + ") p USING (doc_id)\n"
    "GROUP BY 1, 2 ORDER BY 1, 2"
)


# --------------------------------------------------------------------------
# Language-ID confusion matrix — the labeler-vs-metadata QA check:
# cross-tabulate the stored `lang` column against detect_language's
# prediction.  Per-batch (label, pred, n) count partials → one
# O(langs²) sum exchange; the oracle reuses the full SQL_LANGID
# replica as a subquery so both sides run the SAME classifier.
# --------------------------------------------------------------------------


def q_lang_confusion(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        pred = [detect_language(t or "") for t in b.column("text").to_pylist()]
        g = (
            pd.DataFrame(
                {"label": b.column("lang").to_numpy(zero_copy_only=False), "pred": pred}
            )
            .groupby(["label", "pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "label": pa.array(g["label"], pa.string()),
                "pred": pa.array(g["pred"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    out = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["label", "pred"],
            sum_cols=["n"],
            schema=pa.schema(
                [("label", pa.string()), ("pred", pa.string()), ("n", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["label", "pred"])
    )
    return pa.table(
        {
            "label": pa.array(out["label"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
        }
    )


def q_quality(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def qual(batch: pa.Table) -> pa.Table:
        scores = [quality_score(t or "") for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                # unrounded: both engines derive these from the same
                # integer counts via one double division, so the
                # driver's value hash matches bit-for-bit
                "quality": pa.array([s["quality"] for s in scores], pa.float64()),
                "stop_ratio": pa.array([s["stop_ratio"] for s in scores], pa.float64()),
            }
        )

    return _to_table(ds.map_batches(qual, batch_format="pyarrow", zero_copy_batch=True))


# Mirrors textstats.quality_score exactly — same counters, same
# left-to-right double products of the frozen threshold constants.
SQL_QUALITY = """
WITH w AS (
  SELECT doc_id, length(text) AS n,
         regexp_extract_all(lower(text), '[a-z]+') AS words,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 \t\n\f\r\x0b]')) AS punct
  FROM documents
), f AS (
  SELECT doc_id, n, len(words) AS nw, punct,
    CASE WHEN len(words) > 0
         THEN len(list_filter(words, x -> x IN (%(en)s)))::DOUBLE / len(words)
         ELSE 0.0 END AS stop_ratio,
    CASE WHEN len(words) > 0
         THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words)
         ELSE 0.0 END AS mwl,
    CASE WHEN n > 0 THEN punct::DOUBLE / n ELSE 0.0 END AS punct_ratio
  FROM w
)
SELECT doc_id,
  CASE WHEN n = 0 THEN 0.0 ELSE
    (((CASE WHEN n < 50 THEN 0.5::DOUBLE ELSE 1.0::DOUBLE END)
      * (CASE WHEN stop_ratio < 0.05::DOUBLE THEN 0.6::DOUBLE ELSE 1.0::DOUBLE END))
      * (CASE WHEN punct_ratio > 0.3::DOUBLE THEN 0.4::DOUBLE ELSE 1.0::DOUBLE END))
      * (CASE WHEN mwl >= 2.0::DOUBLE AND mwl <= 12.0::DOUBLE
              THEN 1.0::DOUBLE ELSE 0.7::DOUBLE END)
  END AS quality,
  stop_ratio
FROM f
"""


_PLANT_OFFSET = 1_000_000


def _docs_with_planted_neardups(sf_dir: str, n: int = 20) -> ray.data.Dataset:
    """documents ∪ {near-copies of the first n docs} (deterministic) —
    the synthetic corpus has no natural near-dups, so the near-dup
    operators are exercised against planted ones whose expected pairs
    are known: (i, i + 1_000_000).

    The base corpus stays DISTRIBUTED (pruned ``_read_pq``, which also
    seeds the size-aware shuffle strategy for every exchange derived
    from it); only the n seed docs are read driver-side, row-group
    pruned — the old version ``read_table``'d the whole table onto the
    driver, a 100-TB non-starter.  The union is ``materialize()``d
    (object-store pin, spillable, NOT driver memory) because every
    consumer is a multi-pass algorithm — signatures + text join-back +
    CC rounds would otherwise re-run the read+union per pass (measured
    2–3× on minhash_dedup/embed_dedup at sf0.1)."""
    base = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    seeds = pa.parquet.read_table(
        _t(sf_dir, "documents"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "<", n)],
    )
    dups = pa.table(
        {
            "doc_id": pa.array(
                [i + _PLANT_OFFSET for i in seeds.column("doc_id").to_pylist()],
                pa.int64(),
            ),
            "text": pa.array(
                [(t or "") + " tail" for t in seeds.column("text").to_pylist()],
                pa.string(),
            ),
        }
    )
    return _compact_pin(
        base.union(ray.data.from_arrow(dups)),
        os.path.getsize(_t(sf_dir, "documents")),
    )


def _compact_pin(ds: ray.data.Dataset, est_bytes: int) -> ray.data.Dataset:
    """Materialize a multi-pass input at a sane block count.  A pruned
    parquet read splits on row groups — at bench scale that's ~65
    blocks of ~80 rows, so every downstream pass schedules 65 near-empty
    tasks and every exchange shuffles 65 block stubs (measured: the
    dedup family spent more wall on task dispatch than kernels).
    Target ≈ one block per 64 MB compressed, floor 8 — at 100 TB the
    same rule yields ~1.5 M blocks, i.e. it only ever COMPACTS
    over-split small inputs, never under-splits big ones."""
    target = max(8, int(est_bytes) // (64 << 20))
    mat = ds.materialize()
    if mat.num_blocks() > 4 * target:
        mat = mat.repartition(target).materialize()
    return mat


def q_minhash_pairs(sf_dir: str):
    ds = _docs_with_planted_neardups(sf_dir)
    out = dd.minhash_candidate_pairs(ds, est_threshold=0.5)
    return _to_table_s(
        out,
        pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("est_jaccard", pa.float64())]
        ),
    ).select(["id_a", "id_b", "est_jaccard"])


def q_minhash_dedup(sf_dir: str):
    ds = _docs_with_planted_neardups(sf_dir)
    out = dd.minhash_dedup(ds, jaccard_threshold=0.8)
    return _to_table(out).select(["doc_id"])


def q_simhash_pairs(sf_dir: str):
    ds = _docs_with_planted_neardups(sf_dir)
    return _to_table(dd.simhash_pairs(ds, max_hamming=3))


_NGRAM_PAIRS_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
)


def q_ngram_jaccard_pairs(sf_dir: str):
    """n-gram Jaccard verification of MinHash candidates (the exact
    similarity surface of the est_jaccard candidates).  Distributed:
    candidate texts are attached via ``dd.pair_texts`` (broadcast
    candidate set + distributed ``pc.is_in`` corpus filter — the full
    corpus is never materialized on the driver) and the verify kernel
    runs inside ``map_batches``."""
    from ..functions.hashing import ngram_jaccard

    ds = _docs_with_planted_neardups(sf_dir)
    pairs = dd.minhash_candidate_pairs(ds, est_threshold=0.5).materialize()
    with_text = dd.pair_texts(ds, pairs)
    if with_text is None:
        return _NGRAM_PAIRS_SCHEMA.empty_table()

    def verify(batch: pa.Table) -> pa.Table:
        jac = [
            round(ngram_jaccard(a or "", b or ""), 6)
            for a, b in zip(
                batch.column("text_a").to_pylist(), batch.column("text_b").to_pylist()
            )
        ]
        return pa.table(
            {
                "id_a": batch.column("id_a").cast(pa.int64()),
                "id_b": batch.column("id_b").cast(pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return _to_table(with_text.map_batches(verify, batch_format="pyarrow"))


def q_embed_dedup(sf_dir: str):
    """Embedding near-dup SURVIVORS: hyperplane-LSH pairs → distributed
    connected components → drop cluster losers (min vec_id wins) —
    the ``minhash_dedup`` shape over the embedding column.  Rows-only
    (approximate recall by construction); the planted near-copies are
    the expected losers."""
    import ray as _ray

    ds = _embeddings_with_planted_neardups(sf_dir)
    pairs = dd.embedding_neardup_pairs(ds, cos_threshold=0.95).materialize()
    if pairs.count() == 0:
        return _to_table(ds.select_columns(["vec_id"]))
    labels = dd.connected_components(pairs)

    def losers_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch.column("node"), batch.column("label")))

    loser_tbl = _to_table(
        labels.map_batches(losers_only, batch_format="pyarrow").select_columns(["node"])
    )
    lref = _ray.put(loser_tbl.column("node").combine_chunks())

    def drop(batch: pa.Table) -> pa.Table:
        drop_ids = _ray.get(lref)
        return batch.filter(
            pc.invert(pc.is_in(batch.column("vec_id"), value_set=drop_ids))
        )

    return _to_table(
        ds.map_batches(drop, batch_format="pyarrow").select_columns(["vec_id"])
    )


def _embeddings_with_planted_neardups(sf_dir: str) -> ray.data.Dataset:
    """Distributed base (pruned read + size-aware shuffle context) ∪ a
    tiny driver-built table of near-copies of the first 20 vectors —
    same no-driver-materialization shape as
    ``_docs_with_planted_neardups``."""
    base = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    seeds = pa.parquet.read_table(
        _t(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 20)],
    )
    dups = pa.table(
        {
            "vec_id": pa.array(
                [i + _PLANT_OFFSET for i in seeds.column("vec_id").to_pylist()],
                pa.int64(),
            ),
            "embedding": pa.array(
                [
                    [x * 1.001 + 0.0005 for x in v]
                    for v in seeds.column("embedding").to_pylist()
                ],
                seeds.schema.field("embedding").type,
            ),
        }
    )
    # compacted + materialized for the same multi-pass-consumer reason
    # as _docs_with_planted_neardups
    return _compact_pin(
        base.union(ray.data.from_arrow(dups)),
        os.path.getsize(_t(sf_dir, "embeddings")),
    )


def q_embed_neardup(sf_dir: str):
    ds = _embeddings_with_planted_neardups(sf_dir)
    return _to_table(dd.embedding_neardup_pairs(ds, cos_threshold=0.95))


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# grouped Pearson correlation — the distributed-statistics shape: each
# batch collapses to ONE row of mergeable moments (n, Σx, Σy, Σx², Σy²,
# Σxy) per group, the exchange moves O(groups × batches) tiny rows, and
# the closed-form finalize runs on the driver-side result table.  Inputs
# are shifted by fixed constants before squaring (corr is shift-
# invariant) so the n·Σx² − (Σx)² cancellation keeps ~14 significant
# digits at any row count.
# --------------------------------------------------------------------------

_CORR_SHIFT_X = 25.0  # ≈ mean(l_quantity)
_CORR_SHIFT_Y = 38_000.0  # ≈ mean(l_extendedprice)


def q_corr_stats(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        x = b["l_quantity"].to_numpy() - _CORR_SHIFT_X
        y = b["l_extendedprice"].to_numpy() - _CORR_SHIFT_Y
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": b["l_returnflag"].to_numpy(),
                    "n": np.ones(len(x), dtype=np.int64),
                    "sx": x,
                    "sy": y,
                    "sxx": x * x,
                    "syy": y * y,
                    "sxy": x * y,
                }
            )
            .groupby("l_returnflag", sort=False)
            .sum()
            .reset_index()
        )
        cols = {"l_returnflag": pa.array(g["l_returnflag"], pa.string())}
        cols["n"] = pa.array(g["n"].to_numpy(), pa.int64())
        for c in ("sx", "sy", "sxx", "syy", "sxy"):
            cols[c] = pa.array(g[c].to_numpy(), pa.float64())
        return pa.table(cols)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            *[Sum(c, alias_name=c) for c in ("sx", "sy", "sxx", "syy", "sxy")],
        )
    )
    t = _to_table_s(
        agg,
        pa.schema(
            [("l_returnflag", pa.string()), ("n", pa.int64())]
            + [(c, pa.float64()) for c in ("sx", "sy", "sxx", "syy", "sxy")]
        ),
    )
    n = t.column("n").to_numpy().astype(np.float64)
    sx = t.column("sx").to_numpy()
    sy = t.column("sy").to_numpy()
    cov = n * t.column("sxy").to_numpy() - sx * sy
    varx = n * t.column("sxx").to_numpy() - sx * sx
    vary = n * t.column("syy").to_numpy() - sy * sy
    corr = cov / np.sqrt(varx * vary)
    return pa.table(
        {
            "l_returnflag": t.column("l_returnflag"),
            "n": t.column("n"),
            "corr_qty_price": pa.array(np.round(corr, 6), pa.float64()),
        }
    )


SQL_CORR_STATS = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(corr(l_extendedprice, l_quantity), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# pivot — events pivoted to one fixed wide row per day.  The pivot
# column set is DECLARED (not discovered), so every batch collapses to
# O(days-in-batch) wide rows inside map_batches and the exchange is a
# plain per-day Sum over 5 int columns — no dynamic schema, no
# second pass, no driver-side crosstab.
# --------------------------------------------------------------------------

_PIVOT_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
_DAY_US = 86_400_000_000


def q_pivot_events(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[us]").astype("int64") // _DAY_US
        et = b["event_type"].to_numpy()
        frame = {"day_bucket": day}
        for t in _PIVOT_EVENT_TYPES:
            frame[f"n_{t}"] = (et == t).astype(np.int64)
        g = pd.DataFrame(frame).groupby("day_bucket", sort=False).sum().reset_index()
        return pa.table(
            {
                "day_bucket": pa.array(g["day_bucket"].to_numpy(), pa.int64()),
                **{
                    f"n_{t}": pa.array(g[f"n_{t}"].to_numpy(), pa.int64())
                    for t in _PIVOT_EVENT_TYPES
                },
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day_bucket")
        .aggregate(
            *[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_EVENT_TYPES]
        )
    )
    return _to_table(agg)


SQL_PIVOT_EVENTS = """
SELECT epoch_us(ts) // 86400000000 AS day_bucket,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY day_bucket
"""


# --------------------------------------------------------------------------
# tf-idf term weighting — the two-aggregate-one-pass shape.  Term count
# and document frequency are BOTH per-word sums of per-batch partials
# (a document is one row, so it lives in exactly one batch and the
# per-batch distinct-(doc,word) count sums to the exact global df).
# Only (word, cnt, df) partial rows cross the exchange — O(vocab) per
# batch, never O(tokens) — and idf needs just the scalar corpus size,
# read from parquet metadata without a scan.
# --------------------------------------------------------------------------

def q_tfidf_topk(sf_dir: str):
    path = _t(sf_dir, "documents")
    n_docs = pa.parquet.read_metadata(path).num_rows
    ds = _read_pq(path, columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        doc = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        pairs = pa.table({"doc": doc.filter(mask), "word": flat.filter(mask)})
        cnt = pairs.group_by("word").aggregate([("doc", "count")])
        df = (
            pairs.group_by(["doc", "word"])
            .aggregate([])
            .group_by("word")
            .aggregate([("doc", "count")])
        )
        zeros_c = np.zeros(len(cnt), dtype=np.int64)
        zeros_d = np.zeros(len(df), dtype=np.int64)
        return pa.table(
            {
                "word": pa.concat_arrays(
                    [cnt.column("word").combine_chunks(), df.column("word").combine_chunks()]
                ),
                "cnt": pa.array(
                    np.concatenate(
                        [cnt.column("doc_count").to_numpy(), zeros_d]
                    ),
                    pa.int64(),
                ),
                "df": pa.array(
                    np.concatenate(
                        [zeros_c, df.column("doc_count").to_numpy()]
                    ),
                    pa.int64(),
                ),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy().astype(np.float64)
        df = batch.column("df").to_numpy().astype(np.float64)
        tfidf = np.round(cnt * np.log(float(n_docs) / df), 6)
        return pa.table(
            {
                "word": batch.column("word"),
                "cnt": batch.column("cnt"),
                "df": batch.column("df"),
                "tfidf": pa.array(tfidf, pa.float64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"), Sum("df", alias_name="df"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(["tfidf", "word"], descending=[True, False])
        .limit(20)
    )
    return _to_table(agg)


# ordered by the ROUNDED score on both sides (DuckDB resolves the
# ORDER BY alias to the rounded select expression) with a word
# tie-break, so the top-20 set is deterministic across engines.
SQL_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
  FROM documents
), t2 AS (
  SELECT doc_id, word FROM toks WHERE word <> ''
), stats AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM t2 GROUP BY word
)
SELECT word, cnt, df,
       round(cnt * ln((SELECT count(*) FROM documents)::DOUBLE / df), 6) AS tfidf
FROM stats ORDER BY tfidf DESC, word LIMIT 20
"""


# --------------------------------------------------------------------------
# Bloom-filter semi-join — the sub-linear broadcast structure for a
# build side whose raw key set is too big to ship per task: the filter
# is built DISTRIBUTED (each build batch emits a partial bitmap, OR-
# reduced on the driver to m/8 bytes), broadcast once via ray.put, and
# each probe batch tests 2 splitmix64-derived bit positions
# vectorized.  Bloom survivors (members + ~0.1% false positives at
# 10 bits/key) then pass an exact pc.is_in verify, so results are
# exact while the expensive membership structure stays O(bits) not
# O(keys × 8 bytes).
# --------------------------------------------------------------------------

_BLOOM_BITS = 1 << 17  # 16 KB bitmap — ≥10 bits/key for the filtered dimension


def _bloom_positions(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    from ..functions.sketches import hash_values

    h = hash_values(keys).view(np.uint64)
    return (h % _BLOOM_BITS).astype(np.int64), (
        (h >> np.uint64(32)) % _BLOOM_BITS
    ).astype(np.int64)


def q_bloom_semi_join(sf_dir: str):
    # build side: the filtered part dimension (p_size >= 40)
    build = _read_pq(_t(sf_dir, "part"), columns=["p_partkey", "p_size"])

    def build_partial(batch: pa.Table) -> pa.Table:
        keys = (
            batch.filter(pc.greater_equal(batch.column("p_size"), 40))
            .column("p_partkey")
            .to_numpy(zero_copy_only=False)
        )
        bits = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
        for pos in _bloom_positions(keys):
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table(
            {
                "bits": pa.array([bits.tobytes()], pa.binary()),
                "keys": pa.array([keys.astype(np.int64).tobytes()], pa.binary()),
            }
        )

    bloom = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    exact_parts = []
    for b in build.map_batches(build_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for row_bits, row_keys in zip(
            b.column("bits").to_pylist(), b.column("keys").to_pylist()
        ):
            bloom |= np.frombuffer(row_bits, dtype=np.uint8)
            exact_parts.append(np.frombuffer(row_keys, dtype=np.int64))
    bloom_schema = pa.schema(
        [("l_returnflag", pa.string()), ("n", pa.int64()), ("revenue", pa.float64())]
    )
    if not exact_parts:  # empty build side → inner semi-join is empty
        return bloom_schema.empty_table()
    bloom_ref = ray.put(bloom)
    exact_ref = ray.put(np.unique(np.concatenate(exact_parts)))

    probe = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def probe_batch(batch: pa.Table) -> pa.Table:
        bits = ray.get(bloom_ref)  # object-store local after first fetch
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        p1, p2 = _bloom_positions(pk)
        maybe = (
            ((bits[p1 >> 3] >> (p1 & 7).astype(np.uint8)) & 1)
            & ((bits[p2 >> 3] >> (p2 & 7).astype(np.uint8)) & 1)
        ).astype(bool)
        cand = batch.filter(pa.array(maybe))
        # exact verify on the (few) Bloom survivors only
        ok = pc.is_in(
            cand.column("l_partkey"),
            value_set=pa.array(ray.get(exact_ref), pa.int64()),
        )
        hit = cand.filter(ok)
        return (
            pa.table(
                {
                    "l_returnflag": hit.column("l_returnflag"),
                    "revenue": _money_i4(
                        hit.column("l_extendedprice"), hit.column("l_discount")
                    ),
                }
            )
            .group_by("l_returnflag")
            .aggregate([("revenue", "count"), ("revenue", "sum")])
        )

    agg = (
        probe.map_batches(probe_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(
            Sum("revenue_count", alias_name="n"),
            Sum("revenue_sum", alias_name="revenue"),
        )
    )
    t = _to_table_s(
        agg,
        pa.schema(
            [("l_returnflag", pa.string()), ("n", pa.int64()), ("revenue", pa.int64())]
        ),
    )
    return t.set_column(
        t.schema.get_field_index("revenue"),
        "revenue",
        pa.array(
            _i4_to_money(t.column("revenue").to_numpy(zero_copy_only=False)),
            pa.float64(),
        ),
    )


SQL_BLOOM_SEMI_JOIN = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       {_sql_i4_money(f'sum({_sql_rev_i4()})')} AS revenue
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# cohort retention — per-user first-activity day → (cohort, offset)
# distinct-user counts.  Combiner-first: each batch collapses to its
# distinct (user_id, day) pairs before the user-key exchange; the
# bucketed per-user pass computes cohort=min(day) and pre-counts
# (cohort, offset) inside the bucket, so the final exchange is the tiny
# days×days retention grid, never user rows.
# --------------------------------------------------------------------------

def q_cohort_retention(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def distinct_pairs(b: pd.DataFrame) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[us]").astype("int64") // _DAY_US
        g = (
            pd.DataFrame({"user_id": b["user_id"].to_numpy(), "day": day})
            .drop_duplicates()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.drop_duplicates(["user_id", "day"])  # across-batch dups
        cohort = b.groupby("user_id", sort=False)["day"].transform("min")
        g = (
            pd.DataFrame(
                {"cohort_day": cohort.to_numpy(), "day_offset": b["day"].to_numpy() - cohort.to_numpy()}
            )
            .groupby(["cohort_day", "day_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        return pa.table(
            {
                "cohort_day": pa.array(g["cohort_day"].to_numpy(), pa.int64()),
                "day_offset": pa.array(g["day_offset"].to_numpy(), pa.int64()),
                "n_users": pa.array(g["n_users"].to_numpy(), pa.int64()),
            }
        )

    pairs = ds.map_batches(distinct_pairs, batch_format="pandas")
    grid = _bucketed(pairs, "user_id", per_bucket)
    agg = grid.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )
    return _to_table(agg)


SQL_COHORT_RETENTION = """
WITH uw AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
fw AS (SELECT user_id, min(day) AS cohort_day FROM uw GROUP BY user_id)
SELECT cohort_day, day - cohort_day AS day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN fw USING (user_id)
GROUP BY cohort_day, day_offset
"""


# --------------------------------------------------------------------------
# approximate grouped percentiles via a mergeable fixed-bin histogram
# sketch — the scale path for `percentiles` when groups are too large
# for the per-group exact sort: each batch collapses to (lang, bin,
# cnt) partials (O(langs×bins) per batch regardless of rows), the
# exchange sums them, and the finalize walks the ≤(langs×bins) summed
# histogram.  The estimate — the upper edge of the first bin whose
# cumulative count reaches ceil(q·n) — is a DETERMINISTIC function of
# the data, so unlike most sketches it gets a full value-hash oracle;
# the error bound (≤ one bin width vs exact quantile_disc) is pinned in
# tests/test_aux_stages.py.
# --------------------------------------------------------------------------

_HIST_BIN = 64


def q_approx_percentiles(sf_dir: str):
    df = _lang_hist(sf_dir)  # shared mergeable histogram partials
    out = {"lang": [], "n": [], "p50_est": [], "p90_est": [], "p99_est": []}
    for lang, g in df.groupby("lang", sort=True):
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        edges = ((g["bin"].to_numpy() + 1) * _HIST_BIN).astype("int64")
        out["lang"].append(lang)
        out["n"].append(n)
        for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
            rank = int(np.ceil(q * n))
            out[col].append(int(edges[np.searchsorted(cum, rank)]))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n": pa.array(out["n"], pa.int64()),
            "p50_est": pa.array(out["p50_est"], pa.int64()),
            "p90_est": pa.array(out["p90_est"], pa.int64()),
            "p99_est": pa.array(out["p99_est"], pa.int64()),
        }
    )


SQL_APPROX_PERCENTILES = f"""
WITH h AS (SELECT lang, n_chars // {_HIST_BIN} AS bin, count(*) AS cnt
           FROM documents GROUP BY lang, bin),
c AS (SELECT lang, bin, sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY lang) AS total FROM h)
SELECT lang, CAST(max(total) AS BIGINT) AS n,
  CAST(min(CASE WHEN cum >= ceil(0.5*total) THEN (bin+1)*{_HIST_BIN} END) AS BIGINT) AS p50_est,
  CAST(min(CASE WHEN cum >= ceil(0.9*total) THEN (bin+1)*{_HIST_BIN} END) AS BIGINT) AS p90_est,
  CAST(min(CASE WHEN cum >= ceil(0.99*total) THEN (bin+1)*{_HIST_BIN} END) AS BIGINT) AS p99_est
FROM c GROUP BY lang
"""


# --------------------------------------------------------------------------
# distributed k-means over the embeddings table (semantic clustering
# for data curation — SemDeDup-style).  Iterative, so no SQL oracle
# (rows-only driver check); cluster purity on planted clusters is
# pinned in tests/test_aux_stages.py.
# --------------------------------------------------------------------------

def q_kmeans(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    from ..stages.similarity import kmeans_assign, kmeans_fit

    path = _t(sf_dir, "embeddings")
    ds = _read_pq(path, columns=["vec_id", "embedding"])
    # row count from parquet metadata — saves kmeans_fit a count() pass
    n_total = pa.parquet.read_metadata(path).num_rows
    kschema = pa.schema(
        [("cluster", pa.int64()), ("n_vecs", pa.int64()), ("mean_cos", pa.float64())]
    )
    if n_total == 0:  # nothing to fit
        return kschema.empty_table()
    cent = kmeans_fit(ds, k=8, max_iters=8, seed=3, n_total=n_total)
    assigned = kmeans_assign(ds, cent)
    out = assigned.groupby("cluster").aggregate(
        Count(alias_name="n_vecs"),
        Mean("cos_to_centroid", alias_name="mean_cos"),
    )
    t = _to_table_s(out, kschema)
    return t.set_column(
        t.schema.get_field_index("mean_cos"),
        "mean_cos",
        pc.round(t.column("mean_cos"), ndigits=4),
    )


# --------------------------------------------------------------------------
# PII redaction — the training-data scrub stage.  The corpus carries no
# PII, so each row's text is AUGMENTED with deterministic doc_id-derived
# PII (email/IP/SSN/phone) before redaction — both engines construct
# the identical augmented string, so the oracle exercises every pattern
# on every row instead of vacuously matching nothing.  One vectorized
# replace_substring_regex pass per pattern (RE2 on both sides); the
# full redacted text is value-hashed.
# --------------------------------------------------------------------------

def q_pii_redact(sf_dir: str):
    from ..functions.textstats import redact_pii_array

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def redact(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        id_s = pc.cast(d, pa.string())
        ip_s = pc.cast(pc.subtract(d, pc.multiply(pc.divide(d, 256), 256)), pa.string())
        tel_s = pc.cast(
            pc.add(pc.subtract(d, pc.multiply(pc.divide(d, 9000), 9000)), 1000),
            pa.string(),
        )
        aug = pc.binary_join_element_wise(
            batch.column("text"),
            " contact u",
            id_s,
            "@ex-mail.org ip 10.0.",
            ip_s,
            ".7 ssn 123-45-6789 tel 555-",
            tel_s,
            "",
        )
        return pa.table({"doc_id": d, "redacted": redact_pii_array(aug)})

    return _to_table(ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True))


SQL_PII_REDACT = r"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    text || ' contact u' || doc_id || '@ex-mail.org ip 10.0.'
         || (doc_id % 256) || '.7 ssn 123-45-6789 tel 555-' || (1000 + doc_id % 9000),
    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
    '\b\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
FROM documents
"""


# --------------------------------------------------------------------------
# document chunking — explode each document into fixed-size overlapping
# character windows (size 128, stride 96), the LLM-training chunker.
# Vectorized explode: one utf8_slice_codeunits kernel pass PER CHUNK
# INDEX over the whole batch (not per row) — kernel calls scale with
# max-chunks-per-doc (~6 here), not row count.  Corpus is ASCII so
# Arrow codeunit slicing == DuckDB character substr; for general UTF-8
# lakes switch to a byte-offset chunker.
# --------------------------------------------------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 128, 96


def q_chunk_docs(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch.column("text"))
        max_len = pc.max(n).as_py() or 0
        parts = []
        i = 0
        while i * _CHUNK_STRIDE < max_len:  # chunk i exists iff start < len
            start = i * _CHUNK_STRIDE
            sub = batch.filter(pc.greater(n, start))
            parts.append(
                pa.table(
                    {
                        "doc_id": sub.column("doc_id"),
                        "chunk_idx": pa.array(
                            np.full(sub.num_rows, i, dtype=np.int64), pa.int64()
                        ),
                        "chunk": pc.utf8_slice_codeunits(
                            sub.column("text"), start=start, stop=start + _CHUNK_SIZE
                        ),
                    }
                )
            )
            i += 1
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "chunk": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)

    return _to_table(ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True))


# n_chunks = ceil(len/stride): emits ZERO chunks for an empty text,
# matching the Ray side's start < len rule ((len-1)//stride + 1 would
# emit one empty chunk at len=0 under DuckDB's truncating //)
SQL_CHUNK_DOCS = f"""
SELECT doc_id, u AS chunk_idx, substr(text, u*{_CHUNK_STRIDE}+1, {_CHUNK_SIZE}) AS chunk
FROM (SELECT doc_id, text,
             unnest(range(0, (len(text) + {_CHUNK_STRIDE - 1})//{_CHUNK_STRIDE})) AS u
      FROM documents)
"""


# --------------------------------------------------------------------------
# benchmark decontamination — flag training documents containing any
# eval-set snippet.  The eval set here is derived from the lake itself
# (docs with doc_id % 83 == 0; snippet = chars 9..48), standing in for
# an external benchmark table — so it is HARD-CAPPED at the
# _DECON_MAX_SNIPPETS lowest doc_ids to stay genuinely fixed-size (a
# %-based selection alone grows linearly with the lake, making the
# flag pass O(rows × snippets) ≈ quadratic).  The capped set is pulled
# once to the driver and broadcast via ray.put; the scan side streams,
# one vectorized match_substring kernel pass per snippet per batch.
# n_hits counts how many eval snippets the doc contains (duplicate
# snippets count separately, mirroring the SQL join).
# --------------------------------------------------------------------------

_DECON_MAX_SNIPPETS = 256


def q_decontaminate(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def eval_side(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        mask = pc.equal(pc.subtract(d, pc.multiply(pc.divide(d, 83), 83)), 0)
        return batch.filter(mask).select(["doc_id", "text"])

    ev = (
        _to_table_s(
            ds.map_batches(eval_side, batch_format="pyarrow", zero_copy_batch=True),
            pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        )
        .sort_by("doc_id")
        .slice(0, _DECON_MAX_SNIPPETS)
    )
    snippets = [t[8 : 8 + 40] for t in ev.column("text").to_pylist()]
    snips_ref = ray.put(snippets)

    def flag(batch: pa.Table) -> pa.Table:
        snips = ray.get(snips_ref)
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        text = batch.column("text")
        for s in snips:
            hits += pc.match_substring(text, s).to_numpy(zero_copy_only=False)
        keep = hits > 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_hits": pa.array(hits[keep], pa.int64()),
            }
        )

    return _to_table_s(
        ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())]),
    )


SQL_DECONTAMINATE = f"""
WITH ev AS (SELECT substr(text, 9, 40) AS snip FROM documents
            WHERE doc_id % 83 = 0 ORDER BY doc_id LIMIT {_DECON_MAX_SNIPPETS})
SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM documents d JOIN ev ON contains(d.text, ev.snip)
GROUP BY d.doc_id
"""


# --------------------------------------------------------------------------
# rank / lag window functions — per-user row_number and value delta
# under (ts, event_id) ordering, via the one-exchange _bucketed shape
# (vectorized pandas cumcount/shift inside the bucket).
# --------------------------------------------------------------------------

def q_rank_window(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = b.groupby("user_id", sort=False)
        rn = (g.cumcount() + 1).to_numpy()
        delta = (b["value"] - g["value"].shift(1)).fillna(0.0).to_numpy()
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(b["user_id"].to_numpy(), pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                "delta": pa.array(np.round(delta, 6), pa.float64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_RANK_WINDOW = """
SELECT event_id, user_id,
  CAST(row_number() OVER w AS BIGINT) AS rn,
  round(coalesce(value - lag(value) OVER w, 0), 6) AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# deterministic stratified sampling — per-stratum keep rates (en 50%,
# rest 20%) decided by a pure function of doc_id so every worker,
# every retry, and the SQL oracle select the identical sample; one
# combiner pass emits per-(batch, lang) integer partials, one tiny
# Sum exchange finalizes.  All-integer output → exact value hash.
# --------------------------------------------------------------------------

def q_sample_stratified(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pa.Table:
        lang = b["lang"].to_numpy()
        rate = np.where(lang == "en", 50, 20)
        keep = (b["doc_id"].to_numpy() % 100) < rate
        g = (
            pd.DataFrame(
                {
                    "lang": lang,
                    "n_total": np.ones(len(b), dtype=np.int64),
                    "n_kept": keep.astype(np.int64),
                    "kept_chars": np.where(keep, b["n_chars"].to_numpy(), 0),
                }
            )
            .groupby("lang", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_total": pa.array(g["n_total"].to_numpy(), pa.int64()),
                "n_kept": pa.array(g["n_kept"].to_numpy(), pa.int64()),
                "kept_chars": pa.array(g["kept_chars"].to_numpy(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_total", alias_name="n_total"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("kept_chars", alias_name="kept_chars"),
        )
    )
    return _to_table(out)


SQL_SAMPLE_STRATIFIED = """
SELECT lang, CAST(count(*) AS BIGINT) AS n_total,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM (SELECT lang, n_chars,
             (doc_id % 100) < (CASE WHEN lang = 'en' THEN 50 ELSE 20 END) AS keep
      FROM documents)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# repetition stats — Gopher/C4-style duplicate-word signal per document
# (n_words vs n_distinct_words).  Vectorized explode: pandas str.split
# + explode + per-doc nunique inside the batch; integer-only output so
# the value hash is exact (a dup RATIO would hit round-half divergence
# between numpy half-even and DuckDB half-away on x/2^k values).
# --------------------------------------------------------------------------

def q_repetition(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(b: pd.DataFrame) -> pa.Table:
        b = b.dropna(subset=["text"])  # mirror the oracle's WHERE text IS NOT NULL
        words = b.set_index("doc_id")["text"].str.split(" ").explode()
        g = words.groupby(level=0).agg(["size", "nunique"])
        return pa.table(
            {
                "doc_id": pa.array(g.index.to_numpy(), pa.int64()),
                "n_words": pa.array(g["size"].to_numpy(), pa.int64()),
                "n_distinct": pa.array(g["nunique"].to_numpy(), pa.int64()),
            }
        )

    return _to_table(ds.map_batches(stats, batch_format="pandas"))


SQL_REPETITION = """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
FROM documents WHERE text IS NOT NULL
"""


# --------------------------------------------------------------------------
# per-group z-score normalization — the aggregate-then-broadcast-back
# shape: one combiner pass emits (lang, n, sum, sumsq) moment partials,
# the tiny summed moment table (≤ #langs rows) is broadcast via
# ray.put, and a second map pass standardizes every row against its
# group's population mean/std.  No per-row exchange ever happens — the
# wide data crosses NO shuffle.
# --------------------------------------------------------------------------

def q_zscore(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def moments(b: pd.DataFrame) -> pa.Table:
        x = b["n_chars"].to_numpy(dtype=np.float64)
        g = (
            pd.DataFrame({"lang": b["lang"].to_numpy(), "n": 1, "s": x, "ss": x * x})
            .groupby("lang", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "s": pa.array(g["s"].to_numpy(), pa.float64()),
                "ss": pa.array(g["ss"].to_numpy(), pa.float64()),
            }
        )

    mom = _to_table(
        ds.map_batches(moments, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
    ).to_pandas()
    stats = {
        r.lang: (r.s / r.n, float(np.sqrt(max(r.ss / r.n - (r.s / r.n) ** 2, 0.0))))
        for r in mom.itertuples()
    }
    stats_ref = ray.put(stats)

    def standardize(b: pd.DataFrame) -> pa.Table:
        st = ray.get(stats_ref)
        mean = b["lang"].map(lambda l: st[l][0]).to_numpy(dtype=np.float64)
        std = b["lang"].map(lambda l: st[l][1]).to_numpy(dtype=np.float64)
        z = (b["n_chars"].to_numpy(dtype=np.float64) - mean) / std
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"].to_numpy(), pa.int64()),
                "lang": pa.array(b["lang"].to_numpy(), pa.string()),
                "z": pa.array(np.round(z, 3), pa.float64()),
            }
        )

    return _to_table(ds.map_batches(standardize, batch_format="pandas"))


SQL_ZSCORE = """
SELECT doc_id, lang,
  round((n_chars - avg(n_chars) OVER (PARTITION BY lang))
        / stddev_pop(n_chars) OVER (PARTITION BY lang), 3) AS z
FROM documents
"""


# --------------------------------------------------------------------------
# ordered group-concat — per-user event-type path under (ts, event_id)
# ordering (the classic clickstream export), via the one-exchange
# _bucketed shape with a vectorized str-join inside the bucket.
# --------------------------------------------------------------------------

def q_group_concat(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = b.groupby("user_id", sort=False)["event_type"].agg(
            path=">".join, n_events="size"
        )
        return pa.table(
            {
                "user_id": pa.array(g.index.to_numpy(), pa.int64()),
                "path": pa.array(g["path"], pa.string()),
                "n_events": pa.array(g["n_events"].to_numpy(), pa.int64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_GROUP_CONCAT = """
SELECT user_id,
  string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
  CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# SemDeDup-style semantic dedup — k-means clusters bound the pairwise
# cosine to within-cluster work (the published sub-quadratic
# construction).  Iterative fit → no SQL oracle (rows-only check);
# the planted-near-dup behavior is pinned in tests.
# --------------------------------------------------------------------------

def q_semdedup(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from ..stages.similarity import semantic_dedup

    # same planted near-dups as q_embed_neardup (the raw table has
    # none above the threshold), same 0.95 verify threshold — the two
    # queries agree on what counts as a near-duplicate
    sd_schema = pa.schema(
        [("cluster", pa.int64()), ("n_vecs", pa.int64()), ("n_dropped", pa.int64())]
    )
    if pa.parquet.read_metadata(_t(sf_dir, "embeddings")).num_rows == 0:
        return sd_schema.empty_table()
    ds = _embeddings_with_planted_neardups(sf_dir)
    flagged = semantic_dedup(ds, k=8, threshold=0.95)

    def dup_int(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("is_dup"),
            "n_dropped",
            pc.cast(batch.column("is_dup"), pa.int64()),
        )

    out = (
        flagged.map_batches(dup_int, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Count(alias_name="n_vecs"), Sum("n_dropped", alias_name="n_dropped"))
    )
    return _to_table_s(out, sd_schema)


# --------------------------------------------------------------------------
# left-outer join — customers that never ordered survive with null
# order columns; the aggregate then separates matched from unmatched
# rows per segment.  Uses Ray's distributed hash JoinOperator with the
# same cpus//4 partition sizing as q_join_hash (its aggregator actor
# pool thrashes past ~CPUs/4 on one node).
# --------------------------------------------------------------------------

def q_outer_join(sf_dir: str):
    oj_schema = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("n_rows", pa.int64()),
            ("n_orders", pa.int64()),
            ("n_orderless", pa.int64()),
        ]
    )
    customer = _read_pq(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])
    orders = _read_pq(_t(sf_dir, "orders"), columns=["o_custkey", "o_orderkey"])
    if pa.parquet.read_metadata(_t(sf_dir, "customer")).num_rows == 0:
        return oj_schema.empty_table()
    if pa.parquet.read_metadata(_t(sf_dir, "orders")).num_rows == 0:
        # LEFT OUTER with an empty right side: every customer survives
        # unmatched — one grouped count, no join needed (the
        # JoinOperator also rejects a schema-less side)
        counts = customer.groupby("c_mktsegment").aggregate(Count(alias_name="n_rows"))
        t = _to_table_s(
            counts, pa.schema([("c_mktsegment", pa.string()), ("n_rows", pa.int64())])
        )
        zero = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
        return pa.table(
            {
                "c_mktsegment": t.column("c_mktsegment"),
                "n_rows": t.column("n_rows"),
                "n_orders": zero,
                "n_orderless": t.column("n_rows"),
            }
        )
    # SIZE GATE (the q3/q7/q8 pattern): the customer side is a slim
    # 2-column projection — under the cap its custkey→segment map
    # broadcasts and the whole query is ONE orders pass of (custkey, n)
    # combiner partials + a driver finish over O(custkeys) rows, which
    # measured 8.6 s → ~1 s at sf0.1 (the JoinOperator's aggregator
    # actor pool costs ~6 s of startup regardless of input size).
    # Above the cap the distributed LEFT OUTER hash join below runs;
    # GRAFT_JOIN_BROADCAST_MAX=0 forces it (pinned by test).
    cap = int(os.environ.get("GRAFT_JOIN_BROADCAST_MAX", _JOIN_BROADCAST_MAX))
    cust_mat = customer.materialize()
    if (cust_mat.size_bytes() or 0) <= cap:
        ct = _to_table_s(
            cust_mat,
            pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
        )
        seg = pd.Series(
            ct.column("c_mktsegment").to_numpy(zero_copy_only=False),
            index=ct.column("c_custkey").to_numpy(zero_copy_only=False),
        )
        segref = ray.put(ct.column("c_custkey").combine_chunks())

        def o_cnt(b: pa.Table) -> pa.Table:
            k = b.column("o_custkey")
            f = pc.is_in(k, value_set=ray.get(segref))
            kept = k.filter(f).to_numpy(zero_copy_only=False)
            u, c = np.unique(kept, return_counts=True)
            return pa.table(
                {
                    "k": pa.array(u, pa.int64()),
                    "n": pa.array(c.astype(np.int64), pa.int64()),
                }
            )

        percust = _sum_partials(
            orders.map_batches(o_cnt, batch_format="pyarrow", zero_copy_batch=True),
            ["k"],
            ["n"],
            pa.schema([("k", pa.int64()), ("n", pa.int64())]),
        ).to_pandas()
        percust["seg"] = percust["k"].map(seg)
        g = percust.groupby("seg").agg(n_orders=("n", "sum"), matched=("k", "size"))
        all_segs = seg.groupby(seg).size()  # customers per segment
        n_orders = g["n_orders"].reindex(all_segs.index).fillna(0).astype(np.int64)
        matched = g["matched"].reindex(all_segs.index).fillna(0).astype(np.int64)
        orderless = (all_segs - matched).astype(np.int64)
        return pa.table(
            {
                "c_mktsegment": pa.array(all_segs.index.to_numpy(), pa.string()),
                "n_rows": pa.array(
                    (n_orders + orderless).to_numpy(), pa.int64()
                ),
                "n_orders": pa.array(n_orders.to_numpy(), pa.int64()),
                "n_orderless": pa.array(orderless.to_numpy(), pa.int64()),
            }
        )

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = customer.join(
        orders,
        join_type="left_outer",
        num_partitions=max(8, cpus // 4),
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        matched = pc.cast(pc.is_valid(batch.column("o_orderkey")), pa.int64())
        t = pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "n_rows": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "n_orders": matched,
                "n_orderless": pc.subtract(pa.scalar(1, pa.int64()), matched),
            }
        )
        return t.group_by("c_mktsegment").aggregate(
            [("n_rows", "sum"), ("n_orders", "sum"), ("n_orderless", "sum")]
        ).rename_columns(["c_mktsegment", "n_rows", "n_orders", "n_orderless"])

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_orderless", alias_name="n_orderless"),
        )
    )
    return _to_table_s(out, oj_schema)


SQL_OUTER_JOIN = """
SELECT c.c_mktsegment,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderless
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment
"""


# --------------------------------------------------------------------------
# CUBE grouping sets — all four (lang, source) rollup levels in ONE
# combiner pass: each batch emits its partials for every grouping set
# (with 'ALL' sentinels instead of SQL's NULLs — engine-neutral
# hashing), so the exchange still moves only aggregate rows and the
# final groupby is a plain Sum.
# --------------------------------------------------------------------------

def q_cube(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pa.Table:
        frames = []
        for keys in ((["lang", "source"]), (["lang"]), (["source"]), ([])):
            if keys:
                g = b.groupby(keys, sort=False).agg(
                    n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
                ).reset_index()
            else:
                g = pd.DataFrame(
                    {"n_docs": [len(b)], "total_chars": [b["n_chars"].sum()]}
                )
            for col in ("lang", "source"):
                if col not in g:
                    g[col] = "ALL"
            frames.append(g[["lang", "source", "n_docs", "total_chars"]])
        m = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "lang": pa.array(m["lang"], pa.string()),
                "source": pa.array(m["source"], pa.string()),
                "n_docs": pa.array(m["n_docs"].to_numpy(), pa.int64()),
                "total_chars": pa.array(m["total_chars"].to_numpy(), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
    )
    t = _to_table_s(
        out,
        pa.schema(
            [
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_docs", pa.int64()),
                ("total_chars", pa.int64()),
            ]
        ),
    )
    if t.num_rows == 0:
        # CUBE of an empty input still emits the grand-total grouping
        # set: count 0, NULL sum — the oracle's exact semantics
        return pa.table(
            {
                "lang": pa.array(["ALL"], pa.string()),
                "source": pa.array(["ALL"], pa.string()),
                "n_docs": pa.array([0], pa.int64()),
                "total_chars": pa.array([None], pa.int64()),
            }
        )
    return t


SQL_CUBE = """
SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


# --------------------------------------------------------------------------
# deterministic export shuffle — the pre-training global shuffle, as a
# SORT by a pseudorandom permutation key (Lehmer LCG of doc_id) rather
# than random_shuffle: same data movement (one all-to-all), but
# deterministic across workers/retries/engines, so the oracle can
# verify the ORDER itself via an order-sensitive LIMIT.  At 100 TB the
# sort-by-key shuffle is also the resumable form — re-running a failed
# output partition reproduces identical bytes.
# --------------------------------------------------------------------------

# Lehmer/MINSTD.  h is injective only for doc_id < 2^31-1; above that,
# key collisions are possible — so the sort key is the COMPOSITE
# (h, doc_id), which is deterministic and engine-independent for ALL
# ids regardless of collisions.  Hard bound: doc_id*48271 must fit
# int64 (checked-multiply on both engines), i.e. doc_id < 2^63/48271
# ≈ 1.9e14 — four orders of magnitude above a 100-TB lake's ~2e10 docs.
_LCG_A, _LCG_M = 48271, 2147483647


def q_shuffle_export(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def add_key(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id")
        h = pc.subtract(
            pc.multiply(d, _LCG_A),
            pc.multiply(
                pc.divide(pc.multiply(d, _LCG_A), _LCG_M), pa.scalar(_LCG_M, pa.int64())
            ),
        )
        return batch.append_column("h", pc.cast(h, pa.int64()))

    out = (
        ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["h", "doc_id"])
        .limit(50)
    )
    return _to_table(out)


SQL_SHUFFLE_EXPORT = f"""
SELECT doc_id, lang, (doc_id * {_LCG_A}) % {_LCG_M} AS h
FROM documents ORDER BY h, doc_id LIMIT 50
"""


# --------------------------------------------------------------------------
# heavy hitters via Count-Min sketch — frequent-token detection with a
# FIXED-size mergeable partial: each batch emits one row (flattened
# depth×width counter array + its local top candidates), the driver
# sums the ≤blocks small arrays and estimates only the candidate
# union.  No oracle (a sketch), but deterministic: blake2b word hashes
# and (count desc, word asc) tie-break; the CMS overcount bound is
# pinned in tests.  Scale note: per-batch partial is 64 KB regardless
# of rows; past ~10^5 blocks insert one tree-combine map stage.
# --------------------------------------------------------------------------

_HH_TOPK, _HH_CAND = 20, 64


def q_heavy_hitters(sf_dir: str):
    from ..functions.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_add,
        cms_estimate,
        cms_new,
        hash_values,
    )

    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pa.Table:
        counts = b["text"].str.split(" ").explode().value_counts()
        words = counts.index.to_numpy()
        cnts = counts.to_numpy()
        cms = cms_new()
        cms_add(cms, hash_values(words), cnts)
        cand = words[:_HH_CAND]  # value_counts is count-desc already
        return pa.table(
            {
                "cms": pa.array([cms.reshape(-1)], pa.list_(pa.int64())),
                "cands": pa.array([list(map(str, cand))], pa.list_(pa.string())),
            }
        )

    rows = _to_table_s(
        ds.map_batches(partial, batch_format="pandas"),
        pa.schema(
            [("cms", pa.list_(pa.int64())), ("cands", pa.list_(pa.string()))]
        ),
    )
    if rows.num_rows == 0:
        return pa.schema(
            [("word", pa.string()), ("est_count", pa.int64())]
        ).empty_table()
    # vectorized merge: flatten the list column once and sum the
    # (blocks, depth*width) matrix — no per-row as_py conversion
    flat = (
        rows.column("cms")
        .combine_chunks()
        .flatten()
        .to_numpy(zero_copy_only=False)
        .reshape(rows.num_rows, CMS_DEPTH * CMS_WIDTH)
    )
    merged = flat.sum(axis=0, dtype=np.int64)
    cands: set[str] = set()
    for i in range(rows.num_rows):
        cands.update(rows.column("cands")[i].as_py())
    cms = merged.reshape(CMS_DEPTH, CMS_WIDTH)
    cand_list = sorted(cands)
    est = cms_estimate(cms, hash_values(np.array(cand_list, dtype=object)))
    order = sorted(range(len(cand_list)), key=lambda i: (-int(est[i]), cand_list[i]))
    top = order[:_HH_TOPK]
    return pa.table(
        {
            "word": pa.array([cand_list[i] for i in top], pa.string()),
            "est_count": pa.array([int(est[i]) for i in top], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# ntile — per-lang quartile assignment by (n_chars, doc_id) order,
# completing the rank family (row_number/lag live in q_rank_window).
# SQL ntile semantics: the first (n % 4) buckets get the extra row.
#
# Scale shape (round-3 rebuild — lang is LOW-cardinality, so the old
# whole-group map_groups held ~half the corpus in one task at 100 TB):
# quartile BOUNDARY rows are exact order statistics at ranks c1..c3 of
# the (n_chars, doc_id) order.  The two-pass histogram machinery
# (_lang_nchars_order_stats) yields each boundary's exact n_chars value
# v and its residual rank k among rows tied at v; when 0 < k <
# cnt_at_v the boundary DOC_ID is resolved with two more bounded
# passes (doc_id-bin counts at v → collect the ≤ _NTILE_DBIN unique
# doc_ids of one bin).  Tiles are then assigned MAP-SIDE against the
# broadcast boundary pairs — no task ever holds a language group, and
# every exchange is O(langs × bins).  (doc_id, n_chars) is a strict
# total order (ids unique), so the assignment is exact, not
# tie-approximate.
# --------------------------------------------------------------------------

_NTILE_DBIN = 4096  # doc_id-bin width for boundary-tie resolution
_NTILE_INF = 2**62  # sentinel: beyond any real doc_id / n_chars


def q_ntile(sf_dir: str):
    def ranks_for(n: int) -> dict[str, int]:
        base, extra = divmod(n, 4)
        sizes = [base + (1 if i < extra else 0) for i in range(4)]
        c = np.cumsum(sizes)
        return {f"b{j}": int(c[j - 1]) for j in (1, 2, 3)}

    # up to 5 bounded passes share ONE pinned scan (r3 lesson: the
    # de-skew rebuild paid a fresh read-pipeline launch per pass —
    # 2.97 s for quartiles over 212k rows, all scheduling)
    path = _t(sf_dir, "documents")
    pinned = _compact_pin(
        _read_pq(path, columns=["lang", "n_chars", "doc_id"]), os.path.getsize(path)
    )
    stats = _lang_nchars_order_stats(sf_dir, ranks_for, ds_factory=lambda: pinned)

    # boundary doc_id resolution: only ties straddling a boundary need it
    needs = []  # (lang, j, v, k)
    for lang, info in stats.items():
        for label, (v, k, cnt) in info["stats"].items():
            if 0 < k < cnt:
                needs.append((lang, int(label[1]), v, k))
    dstar: dict[tuple[str, int], int] = {}
    if needs:
        need_df = pd.DataFrame(needs, columns=["lang", "j", "val", "k"])

        def c1_partial(b: pd.DataFrame) -> pa.Table:
            t = pd.DataFrame(
                {
                    "lang": b["lang"].to_numpy(),
                    "val": b["n_chars"].to_numpy(),
                    "dbin": b["doc_id"].to_numpy() // _NTILE_DBIN,
                }
            ).merge(need_df[["lang", "j", "val"]], on=["lang", "val"])
            g = t.groupby(["lang", "j", "dbin"], sort=False).size().reset_index(name="cnt")
            return pa.table(
                {
                    "lang": pa.array(g["lang"], pa.string()),
                    "j": pa.array(g["j"].to_numpy(), pa.int64()),
                    "dbin": pa.array(g["dbin"].to_numpy(), pa.int64()),
                    "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
                }
            )

        c1 = (
            _sum_partials(
                pinned.map_batches(c1_partial, batch_format="pandas"),
                keys=["lang", "j", "dbin"],
                sum_cols=["cnt"],
                schema=pa.schema(
                    [
                        ("lang", pa.string()),
                        ("j", pa.int64()),
                        ("dbin", pa.int64()),
                        ("cnt", pa.int64()),
                    ]
                ),
            )
            .to_pandas()
            .sort_values(["lang", "j", "dbin"])
        )
        targets = []  # (lang, j, val, dbin, local_rank)
        for (lang, j, v, k) in needs:
            g = c1[(c1["lang"] == lang) & (c1["j"] == j)]
            cum = g["cnt"].cumsum().to_numpy()
            i = int(np.searchsorted(cum, k))
            targets.append(
                (lang, j, v, int(g["dbin"].to_numpy()[i]), k - (int(cum[i - 1]) if i else 0))
            )
        tgt_df = pd.DataFrame(
            targets, columns=["lang", "j", "val", "dbin", "r"]
        )

        def c2_partial(b: pd.DataFrame) -> pa.Table:
            t = pd.DataFrame(
                {
                    "lang": b["lang"].to_numpy(),
                    "val": b["n_chars"].to_numpy(),
                    "dbin": b["doc_id"].to_numpy() // _NTILE_DBIN,
                    "doc_id": b["doc_id"].to_numpy(),
                }
            ).merge(tgt_df[["lang", "j", "val", "dbin"]], on=["lang", "val", "dbin"])
            return pa.table(
                {
                    "lang": pa.array(t["lang"], pa.string()),
                    "j": pa.array(t["j"].to_numpy(), pa.int64()),
                    "doc_id": pa.array(t["doc_id"].to_numpy(), pa.int64()),
                }
            )

        # ≤ _NTILE_DBIN unique doc_ids per (lang, j) — tiny by bound
        c2 = (
            _to_table(pinned.map_batches(c2_partial, batch_format="pandas"))
            .to_pandas()
            .sort_values(["lang", "j", "doc_id"])
        )
        for (lang, j, v, dbin, r) in targets:
            ids = c2[(c2["lang"] == lang) & (c2["j"] == j)]["doc_id"].to_numpy()
            dstar[(lang, j)] = int(ids[r - 1])

    # per-lang boundary pairs (v, d) — tile = 1 + #{boundaries < row}
    boundaries: dict[str, list[tuple[int, int]]] = {}
    for lang, info in stats.items():
        bs = []
        for j in (1, 2, 3):
            label = f"b{j}"
            if label not in info["stats"]:  # rank 0 → empty leading tile
                bs.append((-_NTILE_INF, -_NTILE_INF))
                continue
            v, k, cnt = info["stats"][label]
            d = dstar.get((lang, j), _NTILE_INF if k >= cnt else None)
            assert d is not None
            bs.append((v, d))
        boundaries[lang] = bs

    def assign(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tile = np.ones(len(lang), dtype=np.int64)
        for lg, bs in boundaries.items():
            m = lang == lg
            if not m.any():
                continue
            for (v, d) in bs:
                tile[m] += ((nc[m] > v) | ((nc[m] == v) & (did[m] > d))).astype(
                    np.int64
                )
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "lang": pa.array(lang, pa.string()),
                "quartile": pa.array(tile, pa.int64()),
            }
        )

    return _to_table(
        pinned.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    )


SQL_NTILE = """
SELECT doc_id, lang,
  CAST(ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT) AS quartile
FROM documents
"""


# --------------------------------------------------------------------------
# event-transition matrix — per-user (prev_event_type → event_type)
# bigram counts under (ts, event_id) ordering, the sequence-mining /
# Markov-chain estimation primitive.  One user-key exchange via
# _bucketed; the per-bucket pandas shift+groupby is vectorized and the
# final exchange moves only the tiny (from, to, n) matrix.
# --------------------------------------------------------------------------

def q_transitions(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = b.groupby("user_id", sort=False)["event_type"].shift(1)
        m = pd.DataFrame({"from_type": prev, "to_type": b["event_type"]}).dropna(
            subset=["from_type"]
        )
        g = m.groupby(["from_type", "to_type"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "from_type": pa.array(g["from_type"], pa.string()),
                "to_type": pa.array(g["to_type"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    out = (
        _bucketed(ds, "user_id", per_bucket)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return _to_table(out)


SQL_TRANSITIONS = """
WITH seq AS (SELECT event_type AS to_type,
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS from_type
             FROM events)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
"""


# --------------------------------------------------------------------------
# set operations — INTERSECT / EXCEPT semantics as one combiner pass:
# per-batch (user, in_first_half, in_second_half) bool partials, one
# Max exchange per user, then a pure projection to 'both' /
# 'only_first' / 'only_second'.  No distinct-shuffle of raw events —
# only one row per (batch, user) crosses.
# --------------------------------------------------------------------------

_SETOPS_SPLIT_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z in epoch µs


def q_set_ops(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pa.Table:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = (
            pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(),
                    "in_a": (us < _SETOPS_SPLIT_US).astype("int64"),
                    "in_b": (us >= _SETOPS_SPLIT_US).astype("int64"),
                }
            )
            .groupby("user_id", sort=False)
            .max()
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "in_a": pa.array(g["in_a"].to_numpy(), pa.int64()),
                "in_b": pa.array(g["in_b"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        # merge partials + project to status in ONE bucketed pass —
        # Ray's aggregate exchange costs ~5 s of fixed setup for this
        # tiny input; the _bucketed shape measured 15.2 → 5.3 s
        g = b.groupby("user_id", sort=False).max().reset_index()
        a = g["in_a"].to_numpy() > 0
        bb = g["in_b"].to_numpy() > 0
        st = np.where(a & bb, "both", np.where(a, "only_first", "only_second"))
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "status": pa.array(st, pa.string()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    return _to_table(_bucketed(partials, "user_id", per_bucket))


SQL_SET_OPS = f"""
SELECT user_id,
  CASE WHEN in_a AND in_b THEN 'both'
       WHEN in_a THEN 'only_first' ELSE 'only_second' END AS status
FROM (SELECT user_id,
             max(epoch_us(ts) <  {_SETOPS_SPLIT_US}) AS in_a,
             max(epoch_us(ts) >= {_SETOPS_SPLIT_US}) AS in_b
      FROM events GROUP BY user_id)
"""


# --------------------------------------------------------------------------
# semi-structured extraction — pull a typed field out of the JSON
# `props` column with ONE vectorized RE2 kernel pass (Arrow has no JSON
# kernel; for flat single-key props a regex extract is exact), then a
# plain grouped aggregate.  The DuckDB oracle uses its real JSON
# extractor, so the comparison also validates the regex against a true
# JSON parser.
# --------------------------------------------------------------------------

def q_props_extract(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": batch.column("event_type"), "k": k})

    out = (
        ds.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("k", alias_name="k_total"),
        )
    )
    return _to_table(out)


SQL_PROPS_EXTRACT = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# grouped mode — each user's most frequent event type, with an explicit
# deterministic tie-break (count DESC, then event_type ASC) so both
# engines agree where SQL's mode() would be arbitrary.  Combiner-first:
# per-batch (user, type, n) partials collapse the event stream before
# the user-key exchange; the bucketed pass merges partials and picks
# the argmax vectorized.
# --------------------------------------------------------------------------

def q_grouped_mode(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (
            b.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        m = (
            b.groupby(["user_id", "event_type"], sort=False)["n"]
            .sum()
            .reset_index()
            .sort_values(["user_id", "n", "event_type"], ascending=[True, False, True])
            .drop_duplicates("user_id")
        )
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(), pa.int64()),
                "mode_type": pa.array(m["event_type"], pa.string()),
                "n": pa.array(m["n"].to_numpy(), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    return _to_table(_bucketed(partials, "user_id", per_bucket))


SQL_GROUPED_MODE = """
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
FROM (SELECT user_id, event_type, count(*) AS n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY count(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# sequence packing — GPT-style training-data packing: documents
# concatenated in doc_id order and chopped into fixed-length packs,
# each doc assigned to the pack where its first char lands
# (pack_id = exclusive-prefix-sum(n_chars) // _PACK_LEN).  The
# distributed primitive is an ORDERED GLOBAL PREFIX SUM in two bounded
# passes:
#   1. per-batch (range, sum) partials over contiguous doc_id ranges
#      (range = doc_id // _PACK_RANGE, ≤ _PACK_RANGE rows each by id
#      uniqueness — a skew-free partition key) → tiny exchange →
#      exclusive per-range global offsets on the driver (O(ranges));
#   2. ONE bucketed exchange co-locates each range; inside, the
#      within-range exclusive cumsum is a vectorized pandas
#      groupby-cumsum plus the broadcast range offset.
# No task ever holds more than a bucket of ≤65k-row ranges; the first
# exchange moves one row per (batch, range).
# --------------------------------------------------------------------------

_PACK_LEN = 2048  # pack capacity in chars (token proxy)
_PACK_RANGE = 65536  # doc_id range width = prefix-sum partition


def q_pack_sequences(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        rng = pc.divide(b.column("doc_id"), _PACK_RANGE)
        g = pa.TableGroupBy(
            pa.table({"range": rng, "n_chars": b.column("n_chars")}), "range"
        ).aggregate([("n_chars", "sum")])
        return g.rename_columns(["range", "total"])

    sums = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["range"],
        sum_cols=["total"],
        schema=pa.schema([("range", pa.int64()), ("total", pa.int64())]),
    ).to_pandas().sort_values("range")
    offsets = dict(
        zip(
            sums["range"].to_numpy(),
            np.concatenate([[0], np.cumsum(sums["total"].to_numpy())[:-1]]),
        )
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["_range", "doc_id"], kind="mergesort")
        local = b.groupby("_range", sort=False)["n_chars"].cumsum() - b["n_chars"]
        start = local.to_numpy() + b["_range"].map(offsets).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"].to_numpy(), pa.int64()),
                "start_off": pa.array(start.astype("int64"), pa.int64()),
                "pack_id": pa.array((start // _PACK_LEN).astype("int64"), pa.int64()),
            }
        )

    def add_keys(batch: pa.Table) -> pa.Table:
        rng = batch.column("doc_id").to_numpy(zero_copy_only=False) // _PACK_RANGE
        return batch.append_column("_range", pa.array(rng, pa.int64())).append_column(
            "_bucket", pa.array((rng % _STAT_BUCKETS).astype("int32"))
        )

    return _to_table(
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_STAT_BUCKETS)
        .map_groups(per_bucket, batch_format="pandas")
    )


SQL_PACK_SEQUENCES = f"""
SELECT doc_id,
  CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS start_off,
  CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       // {_PACK_LEN} AS BIGINT) AS pack_id
FROM documents
"""


# --------------------------------------------------------------------------
# quantile-threshold filter — the curation gate "drop the shortest
# decile per language", built on the SAME bounded two-pass exact order
# statistics as q_percentiles (no whole-group materialization), then a
# map-side broadcast filter (one mask per language per batch).
# --------------------------------------------------------------------------

def q_quantile_filter(sf_dir: str):
    stats = _lang_nchars_order_stats(
        sf_dir, lambda n: {"p10": int(np.ceil(0.1 * n))}
    )
    thresh = {lang: info["stats"]["p10"][0] for lang, info in stats.items()}

    def filt(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(lang), dtype=bool)
        for lg, p10 in thresh.items():  # few langs, vectorized inside
            m = lang == lg
            keep[m] = nc[m] >= p10
        return batch.filter(pa.array(keep))

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
    return _to_table(ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True))


SQL_QUANTILE_FILTER = """
WITH t AS (SELECT lang, quantile_disc(n_chars, 0.1) AS p10
           FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN t USING (lang)
WHERE d.n_chars >= t.p10
"""


# --------------------------------------------------------------------------
# per-group Shannon entropy — diversity of the source mix within each
# language (the corpus-balance diagnostic a curation pipeline runs
# before mixing).  Pure combiner shape: per-batch (lang, source, cnt)
# partials → one tiny exchange of O(langs × sources) rows → the log/sum
# arithmetic runs over that bounded table only.  Float note: terms are
# summed in sorted-source order and rounded to 6 digits, matching the
# oracle's rounding (sub-ulp libm ln() differences wash out at 1e-6).
# --------------------------------------------------------------------------

def q_group_entropy(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, ["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    counts = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["lang", "source"],
            sum_cols=["cnt"],
            schema=pa.schema(
                [("lang", pa.string()), ("source", pa.string()), ("cnt", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["lang", "source"])
    )
    rows = []
    for lang, g in counts.groupby("lang", sort=True):
        cnt = g["cnt"].to_numpy(dtype=np.float64)
        p = cnt / cnt.sum()
        rows.append((lang, len(g), round(float(-(p * np.log(p)).sum()), 6)))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "n_sources": pa.array([r[1] for r in rows], pa.int64()),
            "entropy": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


SQL_GROUP_ENTROPY = """
WITH c AS (SELECT lang, source, count(*) AS cnt
           FROM documents GROUP BY lang, source),
     t AS (SELECT lang, sum(cnt) AS tot FROM c GROUP BY lang)
SELECT c.lang, CAST(count(*) AS BIGINT) AS n_sources,
       round(-sum((CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))
                  * ln(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE))), 6) AS entropy
FROM c JOIN t USING (lang) GROUP BY c.lang
"""


# --------------------------------------------------------------------------
# deterministic train/val/test split — the standard corpus split as a
# pure function of the row key (Lehmer LCG, the q_shuffle_export
# permutation), so the assignment is identical across workers, retries,
# resumes and engines; per-split counts/char totals come back through
# the same mergeable-partial exchange (3 rows total cross it).
# --------------------------------------------------------------------------

def q_train_split(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        s = (d * _LCG_A) % _LCG_M % 10
        split = np.where(s < 8, "train", np.where(s == 8, "val", "test"))
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        g = (
            pd.DataFrame({"split": split, "n_docs": 1, "sum_chars": nc})
            .groupby("split", sort=False, as_index=False)
            .sum()
        )
        return pa.table(
            {
                "split": pa.array(g["split"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                "sum_chars": pa.array(g["sum_chars"].to_numpy(), pa.int64()),
            }
        )

    out = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["split"],
        sum_cols=["n_docs", "sum_chars"],
        schema=pa.schema(
            [("split", pa.string()), ("n_docs", pa.int64()), ("sum_chars", pa.int64())]
        ),
    )
    return out.sort_by("split")


SQL_TRAIN_SPLIT = f"""
SELECT CASE WHEN (doc_id * {_LCG_A}) % {_LCG_M} % 10 < 8 THEN 'train'
            WHEN (doc_id * {_LCG_A}) % {_LCG_M} % 10 = 8 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1 ORDER BY split
"""


# --------------------------------------------------------------------------
# winsorized mean — per-language outlier-robust mean of n_chars with
# tails clamped to [p10, p90].  The cut points are exact order
# statistics from the bounded two-pass histogram machinery
# (_lang_nchars_order_stats — no whole-group materialization); the
# clamp + sum is map-side against the broadcast cut table, so the only
# exchange is the O(langs) partial-sum merge.  wmean is ONE division of
# exact int64s on both sides (then round 6) — bit-stable.
# --------------------------------------------------------------------------

def q_winsorize(sf_dir: str):
    stats = _lang_nchars_order_stats(
        sf_dir,
        lambda n: {"p10": int(np.ceil(0.1 * n)), "p90": int(np.ceil(0.9 * n))},
    )
    cuts = {
        lang: (info["stats"]["p10"][0], info["stats"]["p90"][0])
        for lang, info in stats.items()
    }

    def partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False).copy()
        for lg, (lo, hi) in cuts.items():  # few langs; clamp vectorized
            m = lang == lg
            nc[m] = np.clip(nc[m], lo, hi)
        g = (
            pd.DataFrame({"lang": lang, "n": 1, "wsum": nc})
            .groupby("lang", sort=False, as_index=False)
            .sum()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "wsum": pa.array(g["wsum"].to_numpy(), pa.int64()),
            }
        )

    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])
    agg = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["lang"],
        sum_cols=["n", "wsum"],
        schema=pa.schema(
            [("lang", pa.string()), ("n", pa.int64()), ("wsum", pa.int64())]
        ),
    ).to_pandas().sort_values("lang")
    agg["wmean"] = (agg["wsum"] / agg["n"]).round(6)
    return pa.Table.from_pandas(agg.reset_index(drop=True))


SQL_WINSORIZE = """
WITH t AS (SELECT lang, quantile_disc(n_chars, 0.1) AS lo,
                  quantile_disc(n_chars, 0.9) AS hi
           FROM documents GROUP BY lang)
SELECT d.lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(least(greatest(d.n_chars, t.lo), t.hi)) AS BIGINT) AS wsum,
       round(CAST(sum(least(greatest(d.n_chars, t.lo), t.hi)) AS DOUBLE)
             / count(*), 6) AS wmean
FROM documents d JOIN t USING (lang) GROUP BY d.lang
"""


# --------------------------------------------------------------------------
# global time-ordered running total — cumulative revenue over the whole
# event stream, SUM(...) OVER (ORDER BY ts, event_id).  The TIMESTAMP
# flavor of the q_pack_sequences two-pass distributed prefix sum: the
# partition key is the time RANGE (1h slices — rows tied on ts share a
# range, so the order key never straddles partitions):
#   1. per-batch (range, sum) partials → tiny exchange → exclusive
#      per-range global offsets on the driver (O(ranges));
#   2. one bucketed exchange co-locates each range; inside, a
#      vectorized within-range cumsum + the broadcast offset.
# Values are 2-decimal doubles → ×100 int64 cents make the cumsum EXACT
# (a float running sum could never hash-match the oracle over 10^5
# adds).  np.rint and the oracle's round() agree because value*100 is
# always within ~1e-9 of an integer, never near a .5 tie.
# --------------------------------------------------------------------------

_RT_RANGE_US = 3_600_000_000  # 1-hour prefix-sum partition


def q_running_total(sf_dir: str):
    import zlib

    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = pa.TableGroupBy(
            pa.table({"range": pc.divide(t, _RT_RANGE_US), "cents": cents}), "range"
        ).aggregate([("cents", "sum")])
        return g.rename_columns(["range", "total"])

    sums = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["range"],
            sum_cols=["total"],
            schema=pa.schema([("range", pa.int64()), ("total", pa.int64())]),
        )
        .to_pandas()
        .sort_values("range")
    )
    offsets = dict(
        zip(
            sums["range"].to_numpy(),
            np.concatenate([[0], np.cumsum(sums["total"].to_numpy())[:-1]]),
        )
    )

    def add_keys(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        rng = pc.divide(t, _RT_RANGE_US)
        bucket = pa.array(
            [zlib.crc32(str(v).encode()) % _STAT_BUCKETS for v in rng.to_pylist()],
            pa.int32(),
        )
        return (
            batch.append_column("_ts_us", t)
            .append_column("_range", rng)
            .append_column("_bucket", bucket)
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["_range", "_ts_us", "event_id"], kind="mergesort")
        cents = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        b = b.assign(_cents=cents)
        cum = b.groupby("_range", sort=False)["_cents"].cumsum()
        total = cum.to_numpy() + b["_range"].map(offsets).to_numpy()
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy(), pa.int64()),
                "cum_cents": pa.array(total.astype("int64"), pa.int64()),
            }
        )

    return _to_table(
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_STAT_BUCKETS)
        .map_groups(per_bucket, batch_format="pandas")
    )


SQL_RUNNING_TOTAL = """
SELECT event_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            OVER (ORDER BY ts, event_id) AS BIGINT) AS cum_cents
FROM events
"""


# --------------------------------------------------------------------------
# median absolute deviation — the robust spread statistic, composed
# from TWO bounded order-statistic passes (median of n_chars, then
# median of |n_chars − median|) via the generalized
# _grouped_order_stats; the per-lang medians ride along as a broadcast
# dict, so four O(langs × bins) exchanges total and no group ever
# materializes.
# --------------------------------------------------------------------------

def q_mad(sf_dir: str):
    med_stats = _lang_nchars_order_stats(
        sf_dir, lambda n: {"m": int(np.ceil(0.5 * n))}
    )
    med = {lang: info["stats"]["m"][0] for lang, info in med_stats.items()}

    def dev_of(b: pa.Table) -> np.ndarray:
        lang = pd.Series(b.column("lang").to_numpy(zero_copy_only=False))
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        return np.abs(nc - lang.map(med).to_numpy()).astype(np.int64)

    dev_stats = _grouped_order_stats(
        lambda: _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"]),
        "lang",
        dev_of,
        lambda n: {"m": int(np.ceil(0.5 * n))},
    )
    langs = sorted(dev_stats)
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "med": pa.array([med[l] for l in langs], pa.int64()),
            "mad": pa.array(
                [dev_stats[l]["stats"]["m"][0] for l in langs], pa.int64()
            ),
        }
    )


SQL_MAD = """
WITH m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med
           FROM documents GROUP BY lang)
SELECT d.lang, CAST(any_value(m.med) AS BIGINT) AS med,
       CAST(quantile_disc(abs(d.n_chars - m.med), 0.5) AS BIGINT) AS mad
FROM documents d JOIN m USING (lang) GROUP BY d.lang
"""


# --------------------------------------------------------------------------
# IQR outlier detection — Tukey's fences per event_type over the
# 2-decimal value column, in EXACT integer cents (value×100) so the
# fence comparison 2c > 2q3 + 3(q3−q1) never touches a float: the cut
# points come from the bounded order-statistic machinery, the flagging
# is a map-side broadcast filter.
# --------------------------------------------------------------------------

def _event_cents(b: pa.Table) -> np.ndarray:
    return np.rint(
        b.column("value").to_numpy(zero_copy_only=False) * 100
    ).astype(np.int64)


def q_iqr_outliers(sf_dir: str):
    st = _grouped_order_stats(
        lambda: _read_pq(_t(sf_dir, "events"), columns=["event_type", "value"]),
        "event_type",
        _event_cents,
        lambda n: {"q1": int(np.ceil(0.25 * n)), "q3": int(np.ceil(0.75 * n))},
    )
    fence = {
        et: (info["stats"]["q1"][0], info["stats"]["q3"][0])
        for et, info in st.items()
    }

    def filt(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        c = _event_cents(b)
        keep = np.zeros(len(c), dtype=bool)
        for t, (q1, q3) in fence.items():  # few types; vectorized inside
            m = et == t
            iqr3 = 3 * (q3 - q1)
            keep[m] = (2 * c[m] > 2 * q3 + iqr3) | (2 * c[m] < 2 * q1 - iqr3)
        return b.filter(pa.array(keep))

    ds = _read_pq(
        _t(sf_dir, "events"), columns=["event_id", "event_type", "value"]
    )
    return _to_table(ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True))


SQL_IQR_OUTLIERS = """
WITH c AS (SELECT event_id, event_type, value,
                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
     t AS (SELECT event_type, quantile_disc(cents, 0.25) AS q1,
                  quantile_disc(cents, 0.75) AS q3 FROM c GROUP BY event_type)
SELECT c.event_id, c.event_type, c.value
FROM c JOIN t USING (event_type)
WHERE 2 * c.cents > 2 * t.q3 + 3 * (t.q3 - t.q1)
   OR 2 * c.cents < 2 * t.q1 - 3 * (t.q3 - t.q1)
"""


# --------------------------------------------------------------------------
# consecutive-duplicate collapse — the streaming dedup that keeps an
# event only when its type differs from the SAME user's previous event
# (sensor/retry-squash semantics).  One user-bucketed exchange, then a
# vectorized shift-compare inside each bucket — the _bucketed shape,
# same as rank_window.
# --------------------------------------------------------------------------

def q_dedup_consecutive(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev = b.groupby("user_id", sort=False)["event_type"].shift(1)
        k = b[prev.isna() | (b["event_type"].to_numpy() != prev.to_numpy())]
        return pa.table(
            {
                "event_id": pa.array(k["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(k["user_id"].to_numpy(), pa.int64()),
                "event_type": pa.array(k["event_type"], pa.string()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_DEDUP_CONSECUTIVE = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
WHERE prev IS NULL OR event_type <> prev
"""


# --------------------------------------------------------------------------
# weighted deterministic sampling — keep each document with probability
# n_chars/10000, decided by the Lehmer permutation key (pure function
# of doc_id): importance sampling that is identical across workers,
# retries, resumes and engines.  Pure map-side filter, no exchange.
# --------------------------------------------------------------------------

def q_sample_weighted(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def filt(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        keep = (d * _LCG_A) % _LCG_M % 10000 < np.minimum(nc, 10000)
        return b.filter(pa.array(keep))

    return _to_table(ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True))


SQL_SAMPLE_WEIGHTED = f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE (doc_id * {_LCG_A}) % {_LCG_M} % 10000 < least(n_chars, 10000)
"""


# --------------------------------------------------------------------------
# bigram top-k — word co-occurrence counts, the q_vocab_topk combiner
# shape over PAIRS: per-batch the token lists flatten once and the
# bigram extraction is pure offset arithmetic over the flat values
# (mark each list's last token as a non-start, shift by one) — no
# per-row loop; only (bigram, partial_count) rows cross the exchange.
# --------------------------------------------------------------------------

def q_bigram_topk(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        ).combine_chunks()
        offs = np.asarray(toks.offsets)
        vals = toks.values.to_numpy(zero_copy_only=False)
        vals = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        n = len(vals)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        start_ok = np.ones(n - 1, dtype=bool)
        lasts = offs[1:] - 1  # each list's final token cannot start a bigram
        lasts = lasts[(lasts >= 0) & (lasts <= n - 2)]
        start_ok[lasts] = False
        w1, w2 = vals[:-1][start_ok], vals[1:][start_ok]
        m = (w1 != "") & (w2 != "")
        vc = (pd.Series(w1[m]) + " " + pd.Series(w2[m])).value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "bigram"], descending=[True, False])
        .limit(25)
    )
    return _to_table(agg)


SQL_BIGRAM_TOPK = """
WITH w AS (SELECT string_split_regex(lower(text), '[^a-z]+') AS ws
           FROM documents),
     p AS (SELECT unnest(ws[1:len(ws)-1]) AS w1,
                  unnest(ws[2:len(ws)]) AS w2 FROM w)
SELECT w1 || ' ' || w2 AS bigram, CAST(count(*) AS BIGINT) AS cnt
FROM p WHERE w1 <> '' AND w2 <> ''
GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 25
"""


# --------------------------------------------------------------------------
# TPC-H Q6 — the forecasting-revenue-change filter-aggregate: pruned
# 4-column read, one vectorized mask + product per batch, a scalar Sum.
# The simplest possible shape; here mostly as read-pushdown evidence.
# --------------------------------------------------------------------------

def q_tpch_q6(sf_dir: str):
    import datetime

    ds = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def derive(batch: pa.Table) -> pa.Table:
        d = batch.column("l_shipdate")
        disc = batch.column("l_discount")
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(d, pa.scalar(datetime.datetime(1996, 1, 1))),
                pc.less(d, pa.scalar(datetime.datetime(1997, 1, 1))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, pa.scalar(0.05)),
                    pc.less_equal(disc, pa.scalar(0.07)),
                ),
                pc.less(batch.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        batch = batch.filter(keep)
        # price (2dp) × discount (2dp) = exact 4dp → ×10⁴ int64 sum
        rev_i4 = np.rint(
            batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
            * batch.column("l_discount").to_numpy(zero_copy_only=False)
            * 1e4
        ).astype(np.int64)
        return pa.table({"rev": pa.array(rev_i4, pa.int64())})

    agg = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True).sum(
        "rev"
    )
    # Dataset.sum of an all-empty stream is None — SQL's sum() of no
    # rows is NULL, and the global aggregate still emits its one row
    rev = float(_i4_to_money(int(agg))) if agg is not None else None
    return pa.table({"revenue": pa.array([rev], pa.float64())})


SQL_TPCH_Q6 = f"""
SELECT {_sql_i4_money('sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))')}
  AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# activity-histogram (aggregate OF an aggregate) — distribution of
# distinct active days per user.  Stage 1 collapses each batch to its
# distinct (user, day) pairs (O(users × days) rows cross the exchange,
# never raw events); stage 2 counts days per user INSIDE the user
# bucket and emits that bucket's (n_days → n_users) partial histogram;
# the ≤ buckets × days partials sum on the driver.
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_active_days_dist(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        g = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "day": pc.divide(t, _DAY_US).to_numpy(),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        days = (
            b.drop_duplicates(["user_id", "day"]).groupby("user_id", sort=False).size()
        )
        h = days.value_counts()
        return pa.table(
            {
                "n_days": pa.array(h.index.to_numpy(), pa.int64()),
                "n_users": pa.array(h.to_numpy(), pa.int64()),
            }
        )

    parts = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        per_bucket,
        input_schema=pa.schema([("user_id", pa.int64()), ("day", pa.int64())]),
    ).to_pandas()
    out = (
        parts.groupby("n_days", as_index=False)["n_users"].sum().sort_values("n_days")
    )
    return pa.table(
        {
            "n_days": pa.array(out["n_days"].to_numpy(), pa.int64()),
            "n_users": pa.array(out["n_users"].to_numpy(), pa.int64()),
        }
    )


SQL_ACTIVE_DAYS_DIST = f"""
SELECT n_days, CAST(count(*) AS BIGINT) AS n_users FROM (
  SELECT user_id,
         CAST(count(DISTINCT epoch_us(ts) // {_DAY_US}) AS BIGINT) AS n_days
  FROM events GROUP BY user_id)
GROUP BY n_days ORDER BY n_days
"""


# --------------------------------------------------------------------------
# per-row percentile rank — percent_rank() OVER (PARTITION BY lang
# ORDER BY n_chars) WITHOUT a per-row shuffle: the per-lang exact
# value-count CDF (bounded: n_chars has a capped domain, so the CDF is
# O(langs × distinct_values)) is built by one mergeable-partial
# exchange, broadcast, and each row's rank-1 / (n-1) is a map-side
# searchsorted.  Both engines divide the same two exact ints → the
# doubles are bit-identical, no rounding needed.
# --------------------------------------------------------------------------

def q_percentile_rank(sf_dir: str):
    ds_cdf = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "lang": b.column("lang").to_numpy(zero_copy_only=False),
                    "val": b.column("n_chars").to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["lang", "val"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "val": pa.array(g["val"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    cdf = (
        _sum_partials(
            ds_cdf.map_batches(partial, batch_format="pyarrow"),
            keys=["lang", "val"],
            sum_cols=["cnt"],
            schema=pa.schema(
                [("lang", pa.string()), ("val", pa.int64()), ("cnt", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["lang", "val"])
    )
    lut = {}
    for lang, g in cdf.groupby("lang", sort=False):
        vals = g["val"].to_numpy()
        cnt = g["cnt"].to_numpy()
        below = np.concatenate([[0], np.cumsum(cnt)[:-1]])  # rank-1 (min rank)
        lut[lang] = (vals, below, int(cnt.sum()))

    def rank_map(b: pa.Table) -> pa.Table:
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        pr = np.zeros(len(nc), dtype=np.float64)
        for lg, (vals, below, n) in lut.items():
            m = lang == lg
            if n > 1:
                pr[m] = below[np.searchsorted(vals, nc[m])] / (n - 1)
        return b.append_column("pr", pa.array(pr, pa.float64()))

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])
    return _to_table(
        ds.map_batches(rank_map, batch_format="pyarrow", zero_copy_batch=True)
    )


SQL_PERCENTILE_RANK = """
SELECT doc_id, lang, n_chars,
       percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
FROM documents
"""


# --------------------------------------------------------------------------
# inter-event gap statistics — per-user count/sum/mean of the gaps
# between consecutive events.  One user-bucketed exchange; each user
# lives entirely in its bucket, so the per-user aggregation completes
# in-bucket (no second exchange).  Gaps are exact epoch-µs int64
# diffs; the mean is one int÷int division on both sides.
# --------------------------------------------------------------------------

def q_gap_stats(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = b["ts"].astype("datetime64[us]").astype("int64")
        gap = ts - ts.groupby(b["user_id"].to_numpy()).shift(1)
        k = pd.DataFrame({"user_id": b["user_id"].to_numpy(), "gap": gap.to_numpy()})
        k = k.dropna()
        g = k.groupby("user_id", as_index=False)["gap"].agg(["count", "sum"])
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_gaps": pa.array(g["count"].to_numpy().astype("int64"), pa.int64()),
                "sum_gap_us": pa.array(g["sum"].to_numpy().astype("int64"), pa.int64()),
                "avg_gap_us": pa.array(
                    np.round(g["sum"].to_numpy() / g["count"].to_numpy(), 6),
                    pa.float64(),
                ),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_GAP_STATS = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS avg_gap_us
FROM (SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events)
WHERE gap IS NOT NULL GROUP BY user_id
"""


# --------------------------------------------------------------------------
# distinct users per time window — windowed COUNT DISTINCT: each batch
# collapses to its distinct (window, user) pairs, so the exchange
# carries O(windows × active_users), never raw events; the per-window
# distinct count finishes inside the window's bucket.
# --------------------------------------------------------------------------

_WD_WIN_US = 21_600_000_000  # 6-hour tumbling window


def q_window_distinct(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        g = pd.DataFrame(
            {
                "w": pc.divide(t, _WD_WIN_US).to_numpy(),
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "w": pa.array(g["w"].to_numpy(), pa.int64()),
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = (
            b.drop_duplicates(["w", "user_id"])
            .groupby("w", sort=False)
            .size()
            .reset_index(name="dau")
        )
        return pa.table(
            {
                "w": pa.array(g["w"].to_numpy(), pa.int64()),
                "dau": pa.array(g["dau"].to_numpy(), pa.int64()),
            }
        )

    out = (
        _merge_partials(
            ds.map_batches(partial, batch_format="pyarrow"),
            "w",
            per_bucket,
            input_schema=pa.schema([("w", pa.int64()), ("user_id", pa.int64())]),
        )
        .to_pandas()
        .sort_values("w")
    )
    return pa.table(
        {
            "w": pa.array(out["w"].to_numpy(), pa.int64()),
            "dau": pa.array(out["dau"].to_numpy(), pa.int64()),
        }
    )


SQL_WINDOW_DISTINCT = f"""
SELECT w, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM
(SELECT epoch_us(ts) // {_WD_WIN_US} AS w, user_id FROM events)
GROUP BY w ORDER BY w
"""


# --------------------------------------------------------------------------
# per-user moving average — 3-event rolling mean under (ts, event_id)
# order, in exact integer cents (the frame SUM is exact; the single
# int÷int division is bit-identical on both sides, no rounding).  One
# user-bucketed exchange, vectorized pandas rolling inside.
# --------------------------------------------------------------------------

def q_moving_avg(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = pd.Series(
            np.rint(b["value"].to_numpy() * 100).astype(np.int64),
            index=b.index,
        )
        g = cents.groupby(b["user_id"].to_numpy(), sort=False)
        ma = g.rolling(3, min_periods=1).sum().reset_index(drop=True).to_numpy()
        n = g.rolling(3, min_periods=1).count().reset_index(drop=True).to_numpy()
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(b["user_id"].to_numpy(), pa.int64()),
                "ma_cents": pa.array(ma / n, pa.float64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_MOVING_AVG = """
SELECT event_id, user_id,
       avg(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ma_cents
FROM events
"""


# --------------------------------------------------------------------------
# first/last event per user — the ARGMIN/ARGMAX combiner: each batch
# emits one (user, first-candidate, last-candidate) row per user seen,
# the bucketed merge reduces candidates by lexicographic (ts, event_id)
# min/max.  Only O(users) rows per batch cross the exchange.
# --------------------------------------------------------------------------

def q_first_last(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"]
    )

    def partial(b: pa.Table) -> pa.Table:
        d = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "ts": b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(),
                "event_id": b.column("event_id").to_numpy(zero_copy_only=False),
                "event_type": b.column("event_type").to_numpy(zero_copy_only=False),
            }
        ).sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = d.groupby("user_id", sort=False)
        f, l = g.head(1), g.tail(1)
        m = f.rename(
            columns={"ts": "fts", "event_id": "feid", "event_type": "first_type"}
        ).merge(
            l.rename(
                columns={"ts": "lts", "event_id": "leid", "event_type": "last_type"}
            ),
            on="user_id",
        )
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(), pa.int64()),
                "fts": pa.array(m["fts"].to_numpy(), pa.int64()),
                "feid": pa.array(m["feid"].to_numpy(), pa.int64()),
                "first_type": pa.array(m["first_type"], pa.string()),
                "lts": pa.array(m["lts"].to_numpy(), pa.int64()),
                "leid": pa.array(m["leid"].to_numpy(), pa.int64()),
                "last_type": pa.array(m["last_type"], pa.string()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        first = (
            b.sort_values(["user_id", "fts", "feid"], kind="stable")
            .groupby("user_id", sort=False)
            .head(1)[["user_id", "first_type"]]
        )
        last = (
            b.sort_values(["user_id", "lts", "leid"], kind="stable")
            .groupby("user_id", sort=False)
            .tail(1)[["user_id", "last_type"]]
        )
        m = first.merge(last, on="user_id")
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(), pa.int64()),
                "first_type": pa.array(m["first_type"], pa.string()),
                "last_type": pa.array(m["last_type"], pa.string()),
            }
        )

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        per_bucket,
        input_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("fts", pa.int64()),
                ("feid", pa.int64()),
                ("first_type", pa.string()),
                ("lts", pa.int64()),
                ("leid", pa.int64()),
                ("last_type", pa.string()),
            ]
        ),
    )


SQL_FIRST_LAST = """
SELECT DISTINCT user_id,
  first_value(event_type) OVER w AS first_type,
  last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --------------------------------------------------------------------------
# exact-substring duplicate spans — the fixed-window form of the
# Lee et al. 2021 "Deduplicating Training Data Makes Language Models
# Better" exact-substring scan.  Every stride-S window of W chars is
# hashed (blake2b-128 — collision odds 2^-128, so hash-grouping is
# exact for all practical corpus sizes); a window whose content occurs
# in >=2 DISTINCT documents marks each of its positions as a
# duplicated span.  Scale shape: the text never crosses an exchange —
# per-batch Arrow combiner collapses windows to (h128, doc_id, n_pos)
# partials, exchange 1 buckets by window hash (distinct-doc sieve
# inside one map_groups per bucket), exchange 2 sums spans per doc.
# --------------------------------------------------------------------------

_SPAN_W, _SPAN_S = 40, 20


# two fixed 16-byte siphash keys → two independent keyed 64-bit hashes
# per window = a 128-bit identity (collision odds ~2^-128 per pair);
# pandas hash_array runs them in C over the whole window column
_SPAN_KEY1, _SPAN_KEY2 = "dupspan-sip-key1", "dupspan-sip-key2"


def q_dup_spans(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def win_partial(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nchars = np.nan_to_num(
            pc.utf8_length(text).to_numpy(zero_copy_only=False), nan=0
        ).astype(np.int64)
        max_pos = int(max(0, (nchars.max() - _SPAN_W) // _SPAN_S + 1)) if len(
            nchars
        ) else 0
        h1_parts, h2_parts, id_parts = [], [], []
        # one VECTORIZED slice+hash pass per window OFFSET (≤ maxlen/S
        # kernel calls per batch, each over the whole column) — never a
        # per-row Python loop
        for p in range(max_pos):
            start = p * _SPAN_S
            keep = nchars >= start + _SPAN_W
            if not keep.any():
                break
            wins = pc.utf8_slice_codeunits(
                text.filter(pa.array(keep)), start, start + _SPAN_W
            ).to_numpy(zero_copy_only=False)
            h1_parts.append(pd.util.hash_array(wins, hash_key=_SPAN_KEY1))
            h2_parts.append(pd.util.hash_array(wins, hash_key=_SPAN_KEY2))
            id_parts.append(ids[keep])
        if not h1_parts:
            return pa.table(
                {
                    "h1": pa.array([], pa.int64()),
                    "h2": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_pos": pa.array([], pa.int64()),
                }
            )
        tb = pa.table(
            {
                "h1": pa.array(
                    np.concatenate(h1_parts).view(np.int64), pa.int64()
                ),
                "h2": pa.array(
                    np.concatenate(h2_parts).view(np.int64), pa.int64()
                ),
                "doc_id": pa.array(np.concatenate(id_parts), pa.int64()),
                "one": pa.array(
                    np.ones(sum(len(x) for x in id_parts), dtype=np.int64)
                ),
            }
        )
        g = tb.group_by(["h1", "h2", "doc_id"]).aggregate([("one", "sum")])
        return pa.table(
            {
                "h1": g.column("h1"),
                "h2": g.column("h2"),
                "doc_id": g.column("doc_id"),
                "n_pos": g.column("one_sum"),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        ndocs = b.groupby(["h1", "h2"], sort=False)["doc_id"].transform("nunique")
        dup = b[ndocs >= 2]
        out = dup.groupby("doc_id", sort=False)["n_pos"].sum().reset_index()
        return pd.DataFrame(
            {
                "doc_id": out["doc_id"].to_numpy(dtype="int64"),
                "n_dup_windows": out["n_pos"].to_numpy(dtype="int64"),
            }
        )

    sieved = _bucketed(
        ds.map_batches(win_partial, batch_format="pyarrow"), "h1", per_bucket
    )
    # a doc's windows land in many hash buckets → per-doc partials per
    # bucket; the size-aware merge (O(docs) rows) collapses them — a
    # plain Dataset groupby+Sum here measured 73 s on 540k partials vs
    # 3 s through this path (50k-doc near-dup lake, 32 CPUs)
    out = _sum_partials(
        sieved,
        ["doc_id"],
        ["n_dup_windows"],
        pa.schema([("doc_id", pa.int64()), ("n_dup_windows", pa.int64())]),
    )
    return out.sort_by("doc_id")


SQL_DUP_SPANS = """
WITH w AS (
  SELECT doc_id, substr(text, CAST(p*20+1 AS INT), 40) AS win
  FROM documents,
       LATERAL (SELECT unnest(range(0, CAST((length(text)-40)//20 AS BIGINT)+1)) AS p) ps
  WHERE length(text) >= 40
),
dup AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
FROM w JOIN dup USING (win) GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# grouped linear regression — slope/intercept of extendedprice on
# quantity per returnflag from the same shifted mergeable moments as
# q_corr_stats (sums of x, y, xy, x² after a constant shift; slope is
# shift-invariant, the intercept re-adds the shifts).  One tiny
# exchange of 5 float partials per (batch, group).
# --------------------------------------------------------------------------

def q_grouped_regression(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        x = b["l_quantity"].to_numpy() - _CORR_SHIFT_X
        y = b["l_extendedprice"].to_numpy() - _CORR_SHIFT_Y
        g = (
            pd.DataFrame(
                {
                    "l_returnflag": b["l_returnflag"].to_numpy(),
                    "n": np.ones(len(x), dtype=np.int64),
                    "sx": x,
                    "sy": y,
                    "sxx": x * x,
                    "sxy": x * y,
                }
            )
            .groupby("l_returnflag", sort=False)
            .sum()
            .reset_index()
        )
        cols = {"l_returnflag": pa.array(g["l_returnflag"], pa.string())}
        cols["n"] = pa.array(g["n"].to_numpy(), pa.int64())
        for c in ("sx", "sy", "sxx", "sxy"):
            cols[c] = pa.array(g[c].to_numpy(), pa.float64())
        return pa.table(cols)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            *[Sum(c, alias_name=c) for c in ("sx", "sy", "sxx", "sxy")],
        )
    )
    t = _to_table_s(
        agg,
        pa.schema(
            [("l_returnflag", pa.string()), ("n", pa.int64())]
            + [(c, pa.float64()) for c in ("sx", "sy", "sxx", "sxy")]
        ),
    )
    n = t.column("n").to_numpy().astype(np.float64)
    sx = t.column("sx").to_numpy()
    sy = t.column("sy").to_numpy()
    slope = (n * t.column("sxy").to_numpy() - sx * sy) / (
        n * t.column("sxx").to_numpy() - sx * sx
    )
    intercept = (sy / n + _CORR_SHIFT_Y) - slope * (sx / n + _CORR_SHIFT_X)
    out = pa.table(
        {
            "l_returnflag": t.column("l_returnflag"),
            "n": t.column("n"),
            "slope": pa.array(np.round(slope, 6), pa.float64()),
            "intercept": pa.array(np.round(intercept, 4), pa.float64()),
        }
    )
    return out.sort_by("l_returnflag")


SQL_GROUPED_REGRESSION = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# normalization-aware exact dedup — casefold + whitespace-collapse +
# trim, then the existing hash-partitioned keep-min-id dedup
# (stages/dedup.py exact_dedup).  Both engines run RE2, so the \\s
# class is byte-for-byte identical.
# --------------------------------------------------------------------------

def q_dedup_normalized(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def normalize(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column("text")), r"\s+", " "
            )
        )
        return batch.set_column(batch.schema.get_field_index("text"), "text", txt)

    return _to_table(
        dd.exact_dedup(ds.map_batches(normalize, batch_format="pyarrow"))
    )


SQL_DEDUP_NORMALIZED = r"""
SELECT min(doc_id) AS doc_id FROM documents
GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
"""


# --------------------------------------------------------------------------
# TPC-H Q4 analogue — orders in a half-year window with at least one
# lineitem shipped >60 days after the order date.  The EXISTS predicate
# references BOTH sides, so it cannot be a key-only semi-join: the
# scale-correct plan collapses lineitem per-batch to (orderkey,
# max_ship) partials (~6x — exists ⟺ max(ship) beats the bound) and
# joins them to the date-filtered orders REDUCE-SIDE as one bucketed
# groupby (the `connected_components`/`pair_texts` shape): a tagged
# union of the two slim streams, ONE exchange on the order key, and a
# vectorized in-bucket merge.  Measured 7.0 s → ~1.5 s vs Ray's
# JoinOperator at sf0.1 (no aggregator actor pool to spin up), and
# immune to its empty-first-block schema caveat (SCALE.md).
# --------------------------------------------------------------------------

_SIXTY_DAYS_US = 60 * 86_400_000_000


def q_exists_join(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1996, 7, 1)
    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch.column("o_orderkey"),
                "ship_us": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64), pa.int64()
                ),
                "od_us": batch.column("o_orderdate").cast(pa.int64()),
                "pri": batch.column("o_orderpriority"),
            }
        )

    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def maxship(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch.column("l_orderkey"),
                "ship_us": batch.column("l_shipdate").cast(pa.int64()),
            }
        )
        g = t.group_by("k").aggregate([("ship_us", "max")])
        n = g.num_rows
        return pa.table(
            {
                "k": g.column("k"),
                "ship_us": g.column("ship_us_max"),
                "od_us": pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
                "pri": pa.array([""] * n, pa.string()),
            }
        )

    both = li.map_batches(maxship, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["pri"].to_numpy() != ""
        ords = b[is_order]
        gmax = (
            b[~is_order].groupby("k", sort=False)["ship_us"].max().rename("max_ship")
        )
        m = ords.merge(gmax, left_on="k", right_index=True, how="inner")
        late = m[m["max_ship"].to_numpy() > m["od_us"].to_numpy() + _SIXTY_DAYS_US]
        cnt = late.groupby("pri", sort=False).size()
        return pa.table(
            {
                "o_orderpriority": pa.array(cnt.index.to_numpy(), pa.string()),
                "order_count": pa.array(cnt.to_numpy(), pa.int64()),
            }
        )

    partials = _bucketed(both, "k", per_bucket)
    out = _sum_partials(
        partials,
        ["o_orderpriority"],
        ["order_count"],
        pa.schema([("o_orderpriority", pa.string()), ("order_count", pa.int64())]),
    )
    return out.sort_by("o_orderpriority")


SQL_EXISTS_JOIN = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q12 analogue — per ship-year counts of lineitems on
# high-priority vs other orders.  Per-batch combiner collapses
# lineitem to (orderkey, ship_year, n) before the exchange (orderkey ×
# year pairs ≈ order count); the orders side ships only (key,
# priority).  Same reduce-side bucketed-join shape as q_exists_join —
# ONE order-key exchange, no JoinOperator actor pool — then the
# in-bucket classification collapses to (year, hi, lo) partials merged
# size-aware (O(years) rows).
# --------------------------------------------------------------------------

_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q_ship_priority(sf_dir: str):
    orders = _read_pq(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_shipdate"])

    def year_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "k": batch.column("l_orderkey"),
                "ship_year": pc.year(batch.column("l_shipdate")).cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = t.group_by(["k", "ship_year"]).aggregate([("one", "sum")])
        n = g.num_rows
        return pa.table(
            {
                "k": g.column("k"),
                "ship_year": g.column("ship_year"),
                "n": g.column("one_sum"),
                "pri": pa.array([""] * n, pa.string()),
            }
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        zeros = pa.array(np.zeros(n, dtype=np.int64), pa.int64())
        return pa.table(
            {
                "k": batch.column("o_orderkey"),
                "ship_year": zeros,
                "n": zeros,
                "pri": batch.column("o_orderpriority"),
            }
        )

    both = li.map_batches(year_partial, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["pri"].to_numpy() != ""
        pri_map = b[is_order][["k", "pri"]]
        m = b[~is_order].drop(columns=["pri"]).merge(pri_map, on="k", how="inner")
        hi = m["pri"].isin(_HIGH_PRIORITIES).to_numpy()
        n = m["n"].to_numpy()
        g = (
            pd.DataFrame(
                {
                    "ship_year": m["ship_year"].to_numpy(),
                    "high_line_count": np.where(hi, n, 0),
                    "low_line_count": np.where(hi, 0, n),
                }
            )
            .groupby("ship_year", sort=False)
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "ship_year": pa.array(g["ship_year"].to_numpy(), pa.int64()),
                "high_line_count": pa.array(
                    g["high_line_count"].to_numpy(), pa.int64()
                ),
                "low_line_count": pa.array(g["low_line_count"].to_numpy(), pa.int64()),
            }
        )

    partials = _bucketed(both, "k", per_bucket)
    out = _sum_partials(
        partials,
        ["ship_year"],
        ["high_line_count", "low_line_count"],
        pa.schema(
            [
                ("ship_year", pa.int64()),
                ("high_line_count", pa.int64()),
                ("low_line_count", pa.int64()),
            ]
        ),
    )
    return out.sort_by("ship_year")


SQL_SHIP_PRIORITY = """
SELECT year(l_shipdate) AS ship_year,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# BM25 top-k retrieval — the classic Okapi/Lucene relevance score for
# a fixed 3-term query.  Two bounded passes: (1) one-row-per-batch
# corpus-stats partials (total token count + per-term document
# frequencies) Sum-exchanged to the driver — O(batches) rows; (2)
# map-side scoring against the broadcast stats with a per-batch top-k
# combiner, so the final sort sees ≤k rows per batch.  The idf uses
# the Lucene formulation ln((N-df+0.5)/(df+0.5)+1) ≥ 0.
# --------------------------------------------------------------------------

_BM25_TERMS = ("hash", "merge", "window")
_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 10


def q_bm25_topk(sf_dir: str):
    path = _t(sf_dir, "documents")
    n_docs = pa.parquet.read_metadata(path).num_rows
    if n_docs == 0:  # avgdl is undefined on an empty corpus
        return pa.schema([("doc_id", pa.int64()), ("bm25", pa.float64())]).empty_table()
    ds = _read_pq(path, columns=["doc_id", "text"])

    def _tok(batch: pa.Table):
        toks = pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = flat != ""
        return flat[keep], parent[keep]

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _tok(batch)
        dfs = {}
        for t in _BM25_TERMS:
            dfs[f"df_{t}"] = pa.array(
                [int(len(np.unique(parent[flat == t])))], pa.int64()
            )
        return pa.table(
            {"sum_dl": pa.array([int(len(flat))], pa.int64()), **dfs}
        )

    # O(batches) one-row partials — summing them on the driver is the
    # bounded reduce (same contract as the sketch family)
    stats = _to_table(ds.map_batches(stats_partial, batch_format="pyarrow"))
    avgdl = float(pc.sum(stats.column("sum_dl")).as_py()) / float(n_docs)
    idf = {}
    for t in _BM25_TERMS:
        df_t = float(pc.sum(stats.column(f"df_{t}")).as_py())
        idf[t] = float(np.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0))

    def score_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _tok(batch)
        n = batch.num_rows
        dl = np.bincount(parent, minlength=n).astype(np.float64)
        denom_dl = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        score = np.zeros(n, dtype=np.float64)
        any_tf = np.zeros(n, dtype=bool)
        for t in _BM25_TERMS:
            tf = np.bincount(parent[flat == t], minlength=n).astype(np.float64)
            any_tf |= tf > 0
            score += idf[t] * tf * (_BM25_K1 + 1.0) / (tf + denom_dl)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        score = np.round(score, 6)
        # per-batch top-k combiner: (-score, doc_id) lexicographic
        cand = np.flatnonzero(any_tf)
        order = np.lexsort((ids[cand], -score[cand]))[: _BM25_K]
        sel = cand[order]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel], pa.int64()),
                "bm25": pa.array(score[sel], pa.float64()),
            }
        )

    out = (
        ds.map_batches(score_partial, batch_format="pyarrow")
        .sort(["bm25", "doc_id"], descending=[True, False])
        .limit(_BM25_K)
    )
    return _to_table(out)


SQL_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
  FROM documents
), t2 AS (
  SELECT doc_id, w FROM toks WHERE w <> ''
), dl AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM t2 GROUP BY doc_id
), corpus AS (
  SELECT (SELECT sum(dl) FROM dl) / (SELECT count(*) FROM documents) AS avgdl,
         (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n
), tf AS (
  SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf FROM t2
  WHERE w IN ('hash', 'merge', 'window') GROUP BY doc_id, w
), df AS (
  SELECT w, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM t2
  WHERE w IN ('hash', 'merge', 'window') GROUP BY w
)
SELECT d.doc_id,
       round(sum( ln((n - df + 0.5) / (df + 0.5) + 1)
                  * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) ), 6)
         AS bm25
FROM tf d JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus
GROUP BY d.doc_id
ORDER BY bm25 DESC, doc_id LIMIT 10
"""


# --------------------------------------------------------------------------
# salted hot-key join — the skew-buster pattern as a first-class
# query.  events.user_id has ~150 distinct values at any scale, so a
# plain hash join degenerates to ≤150 effective partitions with
# arbitrarily large probe groups; salting the fact key with
# event_id % S and replicating the dimension S× bounds every join
# partition at the cost of an S× copy of the SMALL side only.  Result
# is provably identical to the unsalted join (the oracle).
# --------------------------------------------------------------------------

_JOIN_SALT = 8


def q_join_salted(sf_dir: str):
    cust = _read_pq(_t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"])

    def replicate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch.column("c_custkey").to_numpy(zero_copy_only=False)
        seg = batch.column("c_mktsegment")
        salted = (
            np.repeat(keys * _JOIN_SALT, _JOIN_SALT)
            + np.tile(np.arange(_JOIN_SALT, dtype=np.int64), n)
        )
        idx = np.repeat(np.arange(n, dtype=np.int64), _JOIN_SALT)
        return pa.table(
            {
                "salted_key": pa.array(salted, pa.int64()),
                "c_mktsegment": seg.take(pa.array(idx)),
            }
        )

    events = _read_pq(_t(sf_dir, "events"), columns=["user_id", "event_id", "value"])

    def salt_fact(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        eid = batch.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "salted_key": pa.array(
                    uid * _JOIN_SALT + eid % _JOIN_SALT, pa.int64()
                ),
                "value": batch.column("value"),
            }
        )

    js_schema = pa.schema(
        [
            ("c_mktsegment", pa.string()),
            ("n_events", pa.int64()),
            ("total_cents", pa.int64()),
        ]
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    left = events.map_batches(salt_fact, batch_format="pyarrow")
    right = cust.map_batches(replicate, batch_format="pyarrow")
    if left.schema() is None or right.schema() is None:
        return js_schema.empty_table()
    joined = left.join(
        right,
        join_type="inner",
        num_partitions=max(8, cpus // 4),
        on=("salted_key",),
    )

    def seg_partial(batch: pa.Table) -> pa.Table:
        # values are 2-decimal doubles → per-row ×100 int64 cents make
        # the sum EXACT across any reduce order (running_total pattern)
        cents = np.rint(
            batch.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = (
            batch.append_column("one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
            .append_column("cents", pa.array(cents, pa.int64()))
            .group_by("c_mktsegment")
            .aggregate([("one", "sum"), ("cents", "sum")])
        )
        return pa.table(
            {
                "c_mktsegment": g.column("c_mktsegment"),
                "n_events": g.column("one_sum"),
                "total_cents": g.column("cents_sum"),
            }
        )

    out = (
        joined.map_batches(seg_partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )
    return _to_table_s(out.sort("c_mktsegment"), js_schema)


SQL_JOIN_SALTED = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# source quota — domain-balanced sampling: keep at most _QUOTA_N docs
# per source, picked by a deterministic pseudorandom order (the
# shuffle_export LCG key, doc_id tie-break) so both engines agree on
# the winners.  Per-source top-N is COMBINABLE: each batch emits its
# local top-N per source (≤ N×sources rows), the size-aware merge
# finishes — document text never crosses an exchange, and the partial
# stream is O(batches × sources × N) regardless of corpus size.  This
# is the per-domain quota step of a web-scale curation pipeline
# (cap any one domain's share of the training mix).
# --------------------------------------------------------------------------

_QUOTA_N = 50


def q_source_quota(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "source"])

    def _top(f: pd.DataFrame) -> pd.DataFrame:
        return (
            f.sort_values(["source", "h", "doc_id"])
            .groupby("source", sort=False)
            .head(_QUOTA_N)
        )

    def partial(b: pd.DataFrame) -> pa.Table:
        d = b["doc_id"].to_numpy()
        f = pd.DataFrame(
            {"source": b["source"].to_numpy(), "doc_id": d, "h": (d * _LCG_A) % _LCG_M}
        )
        top = _top(f)
        return pa.table(
            {
                "source": pa.array(top["source"], pa.string()),
                "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
                "h": pa.array(top["h"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        top = _top(b)
        return pa.table(
            {
                "source": pa.array(top["source"], pa.string()),
                "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    out = _merge_partials(
        partials,
        "source",
        per_bucket,
        input_schema=pa.schema(
            [("source", pa.string()), ("doc_id", pa.int64()), ("h", pa.int64())]
        ),
    )
    return out if isinstance(out, pa.Table) else _to_table(out)


SQL_SOURCE_QUOTA = f"""
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY (doc_id * {_LCG_A}) % {_LCG_M}, doc_id) AS rn
  FROM documents) WHERE rn <= {_QUOTA_N}
"""


# --------------------------------------------------------------------------
# duplicate-cluster-size distribution — "how duplicated is this lake?"
# (the first diagnostic run before choosing a dedup strategy).  Two
# bounded aggregation levels: per-batch (fp64, n) partials collapse the
# text stream to O(distinct-per-batch) rows; the size-aware merge
# co-locates each fingerprint and each bucket emits its LOCAL
# (cluster_size → n_clusters) histogram (every fp lives wholly in one
# bucket, so local histograms are exact); the final cross-bucket sum is
# O(distinct sizes × buckets) — always driver-safe.  Same 64-bit
# content fingerprint as exact_dedup (collision odds ≪ corpus²/2⁶⁴
# assumption shared with the green dedup_exact oracle).
# --------------------------------------------------------------------------

def q_dup_count_dist(sf_dir: str):
    from ..functions.textstats import fingerprint_exact

    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text").to_pylist()
        fps = np.fromiter(
            (fingerprint_exact(t or "") for t in txt), dtype=np.int64, count=len(txt)
        )
        g = pd.Series(fps).value_counts()
        return pa.table(
            {
                "fp64": pa.array(g.index.to_numpy(), pa.int64()),
                "n": pa.array(g.to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        dist = b.groupby("fp64", sort=False)["n"].sum().value_counts()
        return pa.table(
            {
                "cluster_size": pa.array(dist.index.to_numpy(), pa.int64()),
                "n_clusters": pa.array(dist.to_numpy(), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    dist = _merge_partials(
        partials,
        "fp64",
        per_bucket,
        input_schema=pa.schema([("fp64", pa.int64()), ("n", pa.int64())]),
    )
    if not isinstance(dist, pa.Table):
        dist = _to_table(dist)
    df = (
        dist.to_pandas()
        .groupby("cluster_size", as_index=False)["n_clusters"]
        .sum()
        .sort_values("cluster_size")
    )
    return pa.table(
        {
            "cluster_size": pa.array(df["cluster_size"].to_numpy(), pa.int64()),
            "n_clusters": pa.array(df["n_clusters"].to_numpy(), pa.int64()),
        }
    )


SQL_DUP_COUNT_DIST = """
SELECT CAST(cnt AS BIGINT) AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM (SELECT count(*) AS cnt FROM documents GROUP BY text)
GROUP BY cnt
"""


# --------------------------------------------------------------------------
# grouped skewness / excess kurtosis — per-language shape statistics of
# the document-length distribution from MERGEABLE raw power sums
# (n, Σx, Σx², Σx³, Σx⁴ per batch → one tiny keyed sum → closed-form
# central-moment finish).  Both engines evaluate the IDENTICAL raw-
# moment algebra in IEEE double (population m₂/m₃/m₄, skew = m₃/m₂^1.5,
# excess kurt = m₄/m₂² − 3), so after round(…,6) they agree; DuckDB's
# builtin skewness()/kurtosis() apply sample-bias corrections and are
# deliberately NOT used.  The exchange moves 6 numbers per (batch,
# lang) — corpus-size-independent.
# --------------------------------------------------------------------------

def q_skew_kurt(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pa.Table:
        x = b["n_chars"].to_numpy().astype(np.float64)
        f = pd.DataFrame(
            {
                "lang": b["lang"].to_numpy(),
                "n": np.ones_like(x),
                "s1": x,
                "s2": x * x,
                "s3": x**3,
                "s4": x**4,
            }
        )
        g = f.groupby("lang", sort=False, as_index=False).sum()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                **{
                    c: pa.array(g[c].to_numpy(), pa.float64())
                    for c in ("n", "s1", "s2", "s3", "s4")
                },
            }
        )

    sums = _sum_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["lang"],
        sum_cols=["n", "s1", "s2", "s3", "s4"],
        schema=pa.schema(
            [("lang", pa.string())]
            + [(c, pa.float64()) for c in ("n", "s1", "s2", "s3", "s4")]
        ),
    )
    df = sums.to_pandas() if isinstance(sums, pa.Table) else sums.to_pandas()
    n = df["n"].to_numpy()
    mu = df["s1"].to_numpy() / n
    m2 = df["s2"].to_numpy() / n - mu**2
    m3 = df["s3"].to_numpy() / n - 3 * mu * (df["s2"].to_numpy() / n) + 2 * mu**3
    m4 = (
        df["s4"].to_numpy() / n
        - 4 * mu * (df["s3"].to_numpy() / n)
        + 6 * mu**2 * (df["s2"].to_numpy() / n)
        - 3 * mu**4
    )
    return pa.table(
        {
            "lang": pa.array(df["lang"], pa.string()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "mean_chars": pa.array(np.round(mu, 6), pa.float64()),
            "skew": pa.array(np.round(m3 / m2**1.5, 6), pa.float64()),
            "kurt": pa.array(np.round(m4 / m2**2 - 3.0, 6), pa.float64()),
        }
    )


SQL_SKEW_KURT = """
WITH s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         sum(CAST(n_chars AS DOUBLE)) AS s1,
         sum(pow(CAST(n_chars AS DOUBLE), 2)) AS s2,
         sum(pow(CAST(n_chars AS DOUBLE), 3)) AS s3,
         sum(pow(CAST(n_chars AS DOUBLE), 4)) AS s4
  FROM documents GROUP BY lang),
m AS (
  SELECT lang, n, s1/n AS mu,
         s2/n - pow(s1/n, 2) AS m2,
         s3/n - 3*(s1/n)*(s2/n) + 2*pow(s1/n, 3) AS m3,
         s4/n - 4*(s1/n)*(s3/n) + 6*pow(s1/n, 2)*(s2/n) - 3*pow(s1/n, 4) AS m4
  FROM s)
SELECT lang, n, round(mu, 6) AS mean_chars,
       round(m3 / pow(m2, 1.5), 6) AS skew,
       round(m4 / pow(m2, 2) - 3, 6) AS kurt
FROM m
"""


# --------------------------------------------------------------------------
# keep-longest dedup — within each NORMALIZED-text cluster keep the
# version with the most original characters (tie → smallest doc_id):
# the "keep the richest variant" policy real curation pipelines use
# where exact_dedup's min-id is arbitrary.  Argmax is combinable: each
# batch keeps its local best per fingerprint, the merge keeps the
# global best — only (fp64, doc_id, n_chars) rows move.  Normalization
# = the dedup_normalized kernel (lower, collapse whitespace, trim),
# identical pyarrow/DuckDB pair already oracle-green there.
# --------------------------------------------------------------------------

def q_dedup_keep_longest(sf_dir: str):
    from ..functions.textstats import fingerprint_exact

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text", "n_chars"])

    def _best(f: pd.DataFrame) -> pd.DataFrame:
        return f.sort_values(
            ["fp64", "n_chars", "doc_id"], ascending=[True, False, True]
        ).drop_duplicates("fp64")

    def partial(batch: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(batch.column("text")), r"\s+", " "
            )
        ).to_pylist()
        fps = np.fromiter(
            (fingerprint_exact(t or "") for t in norm), dtype=np.int64, count=len(norm)
        )
        best = _best(
            pd.DataFrame(
                {
                    "fp64": fps,
                    "doc_id": batch.column("doc_id").to_numpy(),
                    "n_chars": batch.column("n_chars").to_numpy(),
                }
            )
        )
        return pa.table(
            {
                c: pa.array(best[c].to_numpy(), pa.int64())
                for c in ("fp64", "doc_id", "n_chars")
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        best = _best(b)
        return pa.table(
            {
                c: pa.array(best[c].to_numpy(), pa.int64())
                for c in ("doc_id", "n_chars")
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = _merge_partials(
        partials,
        "fp64",
        per_bucket,
        input_schema=pa.schema(
            [("fp64", pa.int64()), ("doc_id", pa.int64()), ("n_chars", pa.int64())]
        ),
    )
    return out if isinstance(out, pa.Table) else _to_table(out)


SQL_DEDUP_KEEP_LONGEST = r"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         row_number() OVER (
           PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
           ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# period-over-period change — lag over an AGGREGATED time series: daily
# revenue cents per event_type, then Δ vs the type's previous observed
# day.  The heavy part (the event stream) collapses to per-batch
# (type, day, cents) partials before one tiny keyed sum; the lag runs
# driver-side over the O(types × days) aggregate — a few thousand rows
# at ANY corpus size, which is the honest place for a window whose
# input is already reduced.  Integer cents keep both engines bit-exact;
# day_id = epoch_us // day (the green tumbling-window idiom).
# --------------------------------------------------------------------------

def q_dod_change(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        us = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        f = pd.DataFrame(
            {
                "event_type": b.column("event_type").to_numpy(zero_copy_only=False),
                "day_id": us // _DAY_US,
                "cents": _event_cents(b),
            }
        )
        g = f.groupby(["event_type", "day_id"], sort=False, as_index=False).sum()
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "day_id": pa.array(g["day_id"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    daily = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["event_type", "day_id"],
        sum_cols=["cents"],
        schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("day_id", pa.int64()),
                ("cents", pa.int64()),
            ]
        ),
    )
    df = daily.to_pandas().sort_values(["event_type", "day_id"])
    df["lag_cents"] = df.groupby("event_type")["cents"].shift(1)
    df = df[df["lag_cents"].notna()].copy()
    df["lag_cents"] = df["lag_cents"].astype(np.int64)
    df["delta_cents"] = df["cents"].to_numpy() - df["lag_cents"].to_numpy()
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "day_id": pa.array(df["day_id"].to_numpy(), pa.int64()),
            "cents": pa.array(df["cents"].to_numpy(), pa.int64()),
            "lag_cents": pa.array(df["lag_cents"].to_numpy(), pa.int64()),
            "delta_cents": pa.array(df["delta_cents"].to_numpy(), pa.int64()),
        }
    )


SQL_DOD_CHANGE = """
WITH m AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, day_id)
SELECT event_type, day_id, cents,
       CAST(lag_cents AS BIGINT) AS lag_cents,
       CAST(cents - lag_cents AS BIGINT) AS delta_cents
FROM (SELECT *, lag(cents) OVER (PARTITION BY event_type
                                 ORDER BY day_id) AS lag_cents FROM m)
WHERE lag_cents IS NOT NULL
"""


# --------------------------------------------------------------------------
# graph connected components — the distributed min-label-propagation
# primitive (stages/dedup.connected_components, until now validated
# only by planted-cluster tests) put under a FULL SQL oracle: DuckDB's
# recursive-CTE transitive closure computes the same (node, min
# reachable id) labels.  Graph = the bipartite supplier–part graph of
# quantity-1 lineitems (predicate pushed to the read; part ids offset
# into a disjoint node space).  Edge extraction is pure map-side —
# batch-local distinct only, the CC rounds handle multiplicity — so
# the only all-to-alls are CC's own bucketed label exchanges, O(edges)
# rows each, diameter-bounded round count.
# --------------------------------------------------------------------------

_GRAPH_PART_OFFSET = 1_000_000


def q_graph_components(sf_dir: str):
    import pyarrow.dataset as pads

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey"],
        filter=pads.field("l_quantity") == 1.0,
    )

    def edges(b: pa.Table) -> pa.Table:
        f = pd.DataFrame(
            {
                "id_a": b.column("l_suppkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "id_b": b.column("l_partkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                + _GRAPH_PART_OFFSET,
            }
        ).drop_duplicates()
        return pa.table(
            {
                "id_a": pa.array(f["id_a"].to_numpy(), pa.int64()),
                "id_b": pa.array(f["id_b"].to_numpy(), pa.int64()),
            }
        )

    labels = dd.connected_components(li.map_batches(edges, batch_format="pyarrow"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {"node": b.column("node"), "component": b.column("label")}
        )

    return _to_table(labels.map_batches(rename, batch_format="pyarrow"))


SQL_GRAPH_COMPONENTS = f"""
WITH RECURSIVE
e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
             CAST(l_partkey + {_GRAPH_PART_OFFSET} AS BIGINT) AS b
      FROM lineitem WHERE l_quantity = 1),
u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
n AS (SELECT DISTINCT a AS node FROM u),
reach(node, r) AS (
  SELECT node, node FROM n
  UNION
  SELECT rr.node, u.b FROM reach rr JOIN u ON u.a = rr.r)
SELECT node, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY node
"""


# --------------------------------------------------------------------------
# TPC-H Q14-shaped promo-revenue ratio — a JOIN that never joins: the
# promo side of the part dimension collapses to a KEY SET (331 of 2000
# parts), broadcast once via ray.put, and each lineitem batch reduces
# to ONE (promo_rev, total_rev) row with a vectorized is_in mask — the
# exchange is O(batches), the month predicate is pushed to the read.
# --------------------------------------------------------------------------

def q_tpch_q14(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo, hi = _dt.datetime(1996, 3, 1), _dt.datetime(1996, 4, 1)
    part = pa.parquet.read_table(
        _t(sf_dir, "part"), columns=["p_partkey", "p_type"]
    )
    promo_keys = part.filter(pc.equal(part.column("p_type"), "PROMO")).column(
        "p_partkey"
    ).combine_chunks()
    kref = ray.put(promo_keys)

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(b: pa.Table) -> pa.Table:
        rev = _money_i4(b.column("l_extendedprice"), b.column("l_discount"))
        is_promo = pc.is_in(b.column("l_partkey"), value_set=ray.get(kref))
        promo = pc.sum(pc.if_else(is_promo, rev, pa.scalar(0, pa.int64()))).as_py() or 0
        total = pc.sum(rev).as_py() or 0
        return pa.table(
            {
                "promo_rev": pa.array([promo], pa.int64()),
                "total_rev": pa.array([total], pa.int64()),
            }
        )

    t = _to_table(li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    if t.num_rows == 0:
        promo = total = 0
    else:
        promo = pc.sum(t.column("promo_rev")).as_py() or 0
        total = pc.sum(t.column("total_rev")).as_py() or 0
    # a global aggregate always returns one row; NULL ratio on an
    # empty/zero-revenue month — exactly the oracle's division-by-zero.
    # numerator/denominator are exact int64 (×10⁴ money units), so the
    # single float division matches the oracle's bit for bit.
    pct = round(100.0 * float(promo) / float(total), 4) if total else None
    return pa.table({"promo_pct": pa.array([pct], pa.float64())})


SQL_TPCH_Q14 = f"""
SELECT round(
  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                   THEN {_sql_rev_i4()} ELSE 0 END) AS DOUBLE)
        / CAST(sum({_sql_rev_i4()}) AS DOUBLE), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --------------------------------------------------------------------------
# TPC-H Q18-shaped large-volume orders — groupby-HAVING feeding a
# multiway join, in the scale-correct order: the BIG side (lineitem)
# collapses first (per-batch Arrow group-sum combiner → Sum exchange of
# O(orders) rows → distributed HAVING filter), and only the ~dozens of
# surviving keys touch orders/customer, as key-set-pruned reads — the
# two dimension joins cost one broadcast filter each, never a shuffle.
# --------------------------------------------------------------------------

_Q18_MIN_QTY = 300.0


def q_tpch_q18(sf_dir: str):
    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])

    def qty_partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table(
                {"l_orderkey": b.column("l_orderkey"), "q": b.column("l_quantity")}
            ),
            "l_orderkey",
        ).aggregate([("q", "sum")])
        return g.rename_columns(["l_orderkey", "q"])

    def bucket_k(b: pa.Table) -> pa.Table:
        k = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_bucket", pa.array((k % _GROUP_BUCKETS).astype("int32"))
        )

    def sum_having(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("l_orderkey", sort=False, as_index=False)["q"].sum()
        g = g[g["q"] > _Q18_MIN_QTY]
        return pa.table(
            {
                "l_orderkey": pa.array(g["l_orderkey"].to_numpy(), pa.int64()),
                "total_qty": pa.array(g["q"].to_numpy(), pa.float64()),
            }
        )

    # bucketed map_groups, NOT Dataset.groupby().aggregate(): the
    # sort-based aggregate measured 8.0 s on this very stage at sf0.1
    # (71 s of AggregateMap remote time for a 580k-row partial stream)
    # vs 1.3 s through the bucket shape — same distributed exchange,
    # none of the per-block sort overhead.  HAVING runs per bucket, so
    # only survivors (~0.3% of orders) leave the exchange.
    big = (
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(bucket_k, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_GROUP_BUCKETS)
        .map_groups(sum_having, batch_format="pandas")
        .materialize()
    )  # survivors are small, but GROW with the lake, so the orders
    # join must be SIZE-GATED (the pair_texts pattern): survivors
    # under the broadcast cap semi-filter orders map-side (no second
    # exchange); above it, fall back to the reduce-side join below.

    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    if (big.size_bytes() or 0) <= _Q18_BROADCAST_MAX:
        big_tbl = _to_table(big)
        if big_tbl.num_rows == 0:  # no HAVING survivors anywhere
            return _q18_finish(sf_dir, pd.DataFrame())
        kref = ray.put(big_tbl.column("l_orderkey").combine_chunks())

        def semi(b: pa.Table) -> pa.Table:
            return b.filter(
                pc.is_in(b.column("o_orderkey"), value_set=ray.get(kref))
            )

        hits = _to_table(
            orders.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)
        ).to_pandas()  # 1:1 with survivors — same bound as the broadcast
        joined = hits.merge(
            big_tbl.to_pandas(), left_on="o_orderkey", right_on="l_orderkey"
        )
        joined["o_totalprice"] = joined["o_totalprice"].round(2)
        joined["o_orderdate_us"] = joined["o_orderdate"].astype("int64")
        joined = joined[
            ["o_orderkey", "total_qty", "o_custkey", "o_orderdate_us", "o_totalprice"]
        ]
    else:
        joined = _q18_exchange_join(big, orders)

    joined = joined.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(100)
    return _q18_finish(sf_dir, joined)


_Q18_BROADCAST_MAX = 64 << 20


def _q18_exchange_join(big, orders):
    """Reduce-side join survivors ⋈ orders (tag + union + bucketed
    groupby — the house no-JoinOperator pattern) with a per-bucket
    TOP-100 partial, so only ≤100 rows per bucket reach the driver:
    the LIMIT, not the HAVING selectivity, bounds the collect."""
    def qty_keyed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": b.column("l_orderkey"),
                "total_qty": b.column("total_qty"),
                "o_custkey": pa.nulls(n, pa.int64()),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_totalprice": pa.nulls(n, pa.float64()),
                "_src": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
            }
        )

    def orders_keyed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "total_qty": pa.nulls(n, pa.float64()),
                "o_custkey": b.column("o_custkey"),
                "o_orderdate": b.column("o_orderdate").cast(pa.timestamp("us")),
                "o_totalprice": b.column("o_totalprice"),
                "_src": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    def bucket(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        return b.append_column(
            "_bucket", pa.array((k % _GROUP_BUCKETS).astype("int32"))
        )

    def join_top100(df: pd.DataFrame) -> pa.Table:
        left = df.loc[df["_src"] == 0, ["k", "total_qty"]]
        right = df.loc[
            df["_src"] == 1, ["k", "o_custkey", "o_orderdate", "o_totalprice"]
        ]
        m = left.merge(right, on="k", how="inner")
        # round BEFORE the top-100 cut — the oracle's ORDER BY sees the
        # rounded alias, so the cutoff must compare the same values
        m["o_totalprice"] = m["o_totalprice"].round(2)
        m = m.sort_values(
            ["o_totalprice", "k"], ascending=[False, True], kind="mergesort"
        ).head(100)
        return pa.table(
            {
                "o_orderkey": pa.array(m["k"].to_numpy(), pa.int64()),
                "total_qty": pa.array(m["total_qty"].to_numpy(), pa.float64()),
                "o_custkey": pa.array(
                    m["o_custkey"].to_numpy().astype(np.int64), pa.int64()
                ),
                "o_orderdate_us": pa.array(
                    m["o_orderdate"].astype("int64").to_numpy(), pa.int64()
                ),
                "o_totalprice": pa.array(m["o_totalprice"].to_numpy(), pa.float64()),
            }
        )

    return _to_table(
        big.map_batches(qty_keyed, batch_format="pyarrow")
        .union(orders.map_batches(orders_keyed, batch_format="pyarrow"))
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_GROUP_BUCKETS)
        .map_groups(join_top100, batch_format="pandas")
    ).to_pandas()


def _q18_finish(sf_dir: str, joined: pd.DataFrame) -> pa.Table:
    if joined.empty:
        return pa.schema(
            [
                ("c_name", pa.string()),
                ("c_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("o_orderdate_us", pa.int64()),
                ("o_totalprice", pa.float64()),
                ("total_qty", pa.int64()),
            ]
        ).empty_table()

    ckeys = list(set(joined["o_custkey"].tolist()))  # ≤100 by construction
    cust = pa.parquet.read_table(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_name"],
        filters=[("c_custkey", "in", ckeys)],
    )
    m = joined.merge(cust.to_pandas(), left_on="o_custkey", right_on="c_custkey")
    m["o_totalprice"] = m["o_totalprice"].round(2)
    m = m.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    )
    return pa.table(
        {
            "c_name": pa.array(m["c_name"], pa.string()),
            "c_custkey": pa.array(m["c_custkey"].to_numpy(), pa.int64()),
            "o_orderkey": pa.array(m["o_orderkey"].to_numpy(), pa.int64()),
            "o_orderdate_us": pa.array(
                m["o_orderdate_us"].to_numpy().astype(np.int64), pa.int64()
            ),
            "o_totalprice": pa.array(m["o_totalprice"].to_numpy(), pa.float64()),
            "total_qty": pa.array(
                m["total_qty"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


SQL_TPCH_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_MIN_QTY})
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS o_orderdate_us,
       round(o_totalprice, 2) AS o_totalprice,
       CAST(big.qty AS BIGINT) AS total_qty
FROM big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# --------------------------------------------------------------------------
# interpolated percentiles (percentile_cont semantics) — the exact
# distributed order-statistics machinery (_grouped_order_stats: two
# bounded histogram passes, O(keys × bins) exchanges) extended to
# LINEAR INTERPOLATION: each quantile q needs the two order statistics
# bracketing position (n-1)·q; both ranks ride the same two passes.
# --------------------------------------------------------------------------

_PCONT_QS = (("p25", 0.25), ("p50", 0.5), ("p75", 0.75))


def q_percentile_cont(sf_dir: str):
    def ranks_for(n: int) -> dict[str, int]:
        out = {}
        for label, q in _PCONT_QS:
            pos = (n - 1) * q
            out[f"{label}_lo"] = int(np.floor(pos)) + 1
            out[f"{label}_hi"] = min(int(np.floor(pos)) + 2, n)
        return out

    stats = _lang_nchars_order_stats(sf_dir, ranks_for)
    langs = sorted(stats)
    cols: dict[str, list] = {"lang": langs}
    vals: dict[str, list[float]] = {label: [] for label, _ in _PCONT_QS}
    for lang in langs:
        n = stats[lang]["n"]
        s = stats[lang]["stats"]
        for label, q in _PCONT_QS:
            pos = (n - 1) * q
            frac = pos - np.floor(pos)
            v_lo = float(s[f"{label}_lo"][0])
            v_hi = float(s[f"{label}_hi"][0])
            vals[label].append(round(v_lo + frac * (v_hi - v_lo), 4))
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            **{
                label: pa.array(vals[label], pa.float64())
                for label, _ in _PCONT_QS
            },
        }
    )


SQL_PERCENTILE_CONT = """
SELECT lang,
       round(quantile_cont(n_chars, 0.25), 4) AS p25,
       round(quantile_cont(n_chars, 0.5), 4)  AS p50,
       round(quantile_cont(n_chars, 0.75), 4) AS p75
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# edit-distance near-dup (blocking + banded verify) — the classic
# entity-resolution shape: a cheap deterministic BLOCKING key (24-char
# text prefix) co-locates candidates in one bucketed exchange, then a
# banded Levenshtein (functions.textstats.levenshtein, byte semantics
# = DuckDB's) verifies only within blocks.  All-pairs work is bounded
# by the block-size distribution, the standard (documented) blocking
# assumption; the full SQL oracle is a self-join + levenshtein().
# --------------------------------------------------------------------------

_EDIT_PREFIX, _EDIT_MAX_DIST = 24, 6


def q_edit_dedup(sf_dir: str):
    from ..functions.textstats import levenshtein

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyed(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "bk": pa.array(b["text"].str.slice(0, _EDIT_PREFIX), pa.string()),
                "doc_id": pa.array(b["doc_id"].to_numpy(), pa.int64()),
                "text": pa.array(b["text"], pa.string()),
            }
        )

    def verify_block(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values("doc_id")
        ids = df["doc_id"].to_numpy()
        txts = [t.encode("utf-8") for t in df["text"]]  # byte semantics
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = levenshtein(txts[i], txts[j], _EDIT_MAX_DIST)
                if d is not None:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[j]))
                    out_d.append(d)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    out = (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("bk")
        .map_groups(verify_block, batch_format="pandas")
    )
    return _to_table(out)


SQL_EDIT_DEDUP = f"""
SELECT d1.doc_id AS id_a, d2.doc_id AS id_b,
       CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS dist
FROM documents d1 JOIN documents d2
  ON substr(d1.text, 1, {_EDIT_PREFIX}) = substr(d2.text, 1, {_EDIT_PREFIX})
 AND d1.doc_id < d2.doc_id
WHERE levenshtein(d1.text, d2.text) <= {_EDIT_MAX_DIST}
"""


# --------------------------------------------------------------------------
# unigram log-probability quality score (the CCNet-style LM filter,
# order-0): pass 1 builds the corpus unigram table with the vocab_topk
# combiner (O(vocab × batches) exchange), pass 2 broadcasts the
# (sorted-vocab, log-prob) arrays once via ray.put and scores each doc
# map-side with searchsorted + segment means — no per-row Python, no
# second exchange.  Bottom-k = the most improbable (lowest-quality)
# docs; both engines sort the ROUNDED score so float summation-order
# drift cannot reorder the cutoff.
# --------------------------------------------------------------------------

_ULP_BOTTOM_K = 25
_ULP_MAX_VOCAB = 2_000_000


def q_unigram_logprob(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def vocab_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    vocab = _to_table(
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    if vocab.num_rows == 0:  # empty corpus → empty result, stable schema
        return pa.schema(
            [("doc_id", pa.int64()), ("logprob", pa.float64())]
        ).empty_table()
    if vocab.num_rows > _ULP_MAX_VOCAB:
        # Web-scale corpora have unbounded long-tail vocabularies; the
        # broadcast-(vocab, logp) design assumes the table fits a
        # worker heap (~2M words ≈ 50 MB).  Make the assumption
        # audible rather than silently shipping gigabytes per actor —
        # the scale path is a min-count floor applied in the combiner
        # (which changes the score model, so it is opt-in, not a
        # silent fallback that would break oracle parity).
        import warnings

        warnings.warn(
            f"unigram_logprob vocabulary has {vocab.num_rows} entries "
            f"(> {_ULP_MAX_VOCAB}); the broadcast table is large — "
            "apply a min-count floor upstream for web-scale corpora",
            RuntimeWarning,
            stacklevel=2,
        )
    words = vocab.column("word").to_numpy(zero_copy_only=False)
    cnts = vocab.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.argsort(words)
    words, cnts = words[order], cnts[order]
    total = cnts.sum()
    # ln(c / t) per vocab entry, precomputed once — identical to the
    # per-token ln(c/t) the oracle evaluates (same two correctly
    # rounded ops on the same doubles)
    logp = np.log(cnts / total)
    vref = ray.put((words, logp))

    def score(batch: pa.Table) -> pa.Table:
        w, lp = ray.get(vref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        )
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        parents = pc.list_parent_indices(toks).filter(keep)
        tok_np = flat.filter(keep).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(w, tok_np)  # every token is in-vocab
        tok_lp = lp[idx]
        par = parents.to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        sums = np.zeros(n_rows)
        counts = np.zeros(n_rows)
        np.add.at(sums, par, tok_lp)
        np.add.at(counts, par, 1.0)
        has = counts > 0
        mean = np.full(n_rows, np.nan)
        mean[has] = sums[has] / counts[has]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logprob": pa.array(np.round(mean, 6), pa.float64()),
            }
        ).filter(pa.array(has))

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["logprob", "doc_id"])
        .limit(_ULP_BOTTOM_K)
    )
    return _to_table(out)


SQL_UNIGRAM_LOGPROB = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
  FROM documents),
tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
freq AS (SELECT w, count(*) AS c FROM tok2 GROUP BY w),
tot AS (SELECT sum(c) AS t FROM freq)
SELECT doc_id, round(avg(ln(c / t)), 6) AS logprob
FROM tok2 JOIN freq USING (w) CROSS JOIN tot
GROUP BY doc_id
ORDER BY logprob, doc_id LIMIT {_ULP_BOTTOM_K}
"""


# --------------------------------------------------------------------------
# temperature-balanced language resampling — the pretraining
# source-mixing operator (keep-probability ∝ n^(α-1), α=0.5, rarest
# language kept in full), made exactly reproducible across engines:
# the keep decision is an INTEGER compare of a Lehmer hash against a
# per-language threshold floor(M·√(n_min/n_lang)) — every float op in
# the threshold (divide, sqrt, multiply, floor) is correctly rounded
# IEEE, so numpy and DuckDB compute the same int64.  Two tiny
# exchanges: per-language counts, then per-language kept counts.
# --------------------------------------------------------------------------

def q_lang_balance(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def cnt_partial(b: pa.Table) -> pa.Table:
        vc = b.column("lang").value_counts()
        return pa.table(
            {
                "lang": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = _to_table(
        ds.map_batches(cnt_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n_docs"))
    )
    if counts.num_rows == 0:  # empty corpus → empty result, stable schema
        return pa.schema(
            [("lang", pa.string()), ("n_docs", pa.int64()), ("n_kept", pa.int64())]
        ).empty_table()
    langs = counts.column("lang").to_pylist()
    n_docs = counts.column("n_docs").to_numpy(zero_copy_only=False)
    n_min = float(n_docs.min())
    thresh = {
        lang: int(np.floor(_LCG_M * np.sqrt(n_min / float(n))))
        for lang, n in zip(langs, n_docs)
    }

    def kept_partial(b: pa.Table, thresh=thresh) -> pa.Table:
        h = (
            b.column("doc_id").to_numpy(zero_copy_only=False) * _LCG_A
        ) % _LCG_M
        th = np.array(
            [thresh[lang] for lang in b.column("lang").to_pylist()],
            dtype=np.int64,
        )
        kept = b.filter(pa.array(h < th)).column("lang").value_counts()
        return pa.table(
            {
                "lang": kept.field("values"),
                "k": kept.field("counts").cast(pa.int64()),
            }
        )

    kept = _to_table(
        ds.map_batches(kept_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("k", alias_name="n_kept"))
    )
    kmap = dict(
        zip(kept.column("lang").to_pylist(), kept.column("n_kept").to_pylist())
    )
    order = np.argsort(np.asarray(langs, dtype=object))
    return pa.table(
        {
            "lang": pa.array([langs[i] for i in order], pa.string()),
            "n_docs": pa.array(
                [int(n_docs[i]) for i in order], pa.int64()
            ),
            "n_kept": pa.array(
                [int(kmap.get(langs[i], 0)) for i in order], pa.int64()
            ),
        }
    )


SQL_LANG_BALANCE = f"""
WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
m AS (SELECT min(n_docs) AS nm FROM c),
t AS (SELECT lang, n_docs,
             CAST(floor({_LCG_M} * sqrt(CAST(nm AS DOUBLE) / n_docs)) AS BIGINT) AS th
      FROM c CROSS JOIN m)
SELECT t.lang, t.n_docs,
       CAST(count(*) FILTER (WHERE (d.doc_id * {_LCG_A}) % {_LCG_M} < t.th) AS BIGINT)
         AS n_kept
FROM documents d JOIN t ON d.lang = t.lang
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# per-user drawdown (running-max minus current) — the cummax window
# sibling of moving_avg: same hash-bucketed exchange (_bucketed — one
# map_groups per bucket, users iterated vectorized inside), values in
# exact integer cents so the running max is engine-independent.
# --------------------------------------------------------------------------

def q_drawdown(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cents = pd.Series(
            np.rint(b["value"].to_numpy() * 100).astype(np.int64), index=b.index
        )
        cmax = (
            cents.groupby(b["user_id"].to_numpy(), sort=False).cummax().to_numpy()
        )
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(b["user_id"].to_numpy(), pa.int64()),
                "drawdown_cents": pa.array(cmax - cents.to_numpy(), pa.int64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_DRAWDOWN = """
SELECT event_id, user_id,
       max(CAST(round(value * 100) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       - CAST(round(value * 100) AS BIGINT) AS drawdown_cents
FROM events
"""


# --------------------------------------------------------------------------
# unpivot / melt — wide→long over the FACT table (not a driver-side
# reshape): each batch emits its rows twice, once per metric, as a
# zero-copy column concat; the operator is embarrassingly map-side.
# --------------------------------------------------------------------------

def q_unpivot_events(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "value", "props"])

    def melt(b: pa.Table) -> pa.Table:
        eid = b.column("event_id")
        cents = pa.array(
            np.rint(
                b.column("value").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64),
            pa.int64(),
        )
        k = pc.cast(
            pc.struct_field(
                pc.extract_regex(b.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)'),
                "k",
            ),
            pa.int64(),
        )
        n = b.num_rows
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "event_id": eid,
                        "metric": pa.array(["value_cents"] * n, pa.string()),
                        "val": cents,
                    }
                ),
                pa.table(
                    {
                        "event_id": eid,
                        "metric": pa.array(["prop_k"] * n, pa.string()),
                        "val": k,
                    }
                ),
            ]
        )

    return _to_table(ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True))


SQL_UNPIVOT_EVENTS = """
SELECT event_id, 'value_cents' AS metric, CAST(round(value * 100) AS BIGINT) AS val
FROM events
UNION ALL
SELECT event_id, 'prop_k' AS metric, CAST(json_extract(props, '$.k') AS BIGINT) AS val
FROM events
"""


# --------------------------------------------------------------------------
# embedding norm statistics per label — the list<float> column under a
# FULL SQL oracle (DuckDB list_transform/list_sum lambdas): per-batch
# the fixed-width list column reshapes zero-copy to (n, d) float64,
# norms vectorize in one numpy pass, and (sum, max, count) partials
# per label make the exchange O(labels × batches).
# --------------------------------------------------------------------------

def q_embed_norms(sf_dir: str):
    from ray.data.aggregate import Max

    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(flat) // b.num_rows
        norms = np.sqrt((flat.reshape(b.num_rows, d) ** 2).sum(axis=1))
        t = pa.table(
            {
                "label": pc.cast(b.column("label"), pa.int64()),
                "s": pa.array(norms, pa.float64()),
                "m": pa.array(norms, pa.float64()),
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, "label").aggregate(
            [("s", "sum"), ("m", "max"), ("one", "sum")]
        )
        return g.rename_columns(["label", "s", "m", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(
            Sum("s", alias_name="s"),
            Max("m", alias_name="max_norm"),
            Sum("n", alias_name="n"),
        )
    )
    t = _to_table(agg)
    if t.num_rows == 0:
        return pa.schema(
            [
                ("label", pa.int64()),
                ("n", pa.int64()),
                ("avg_norm", pa.float64()),
                ("max_norm", pa.float64()),
            ]
        ).empty_table()
    avg = pc.round(
        pc.divide(t.column("s"), pc.cast(t.column("n"), pa.float64())), ndigits=6
    )
    return pa.table(
        {
            "label": t.column("label"),
            "n": t.column("n"),
            "avg_norm": avg,
            "max_norm": pc.round(t.column("max_norm"), ndigits=6),
        }
    )


SQL_EMBED_NORMS = """
WITH nrm AS (
  SELECT CAST(label AS BIGINT) AS label,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nn
  FROM embeddings)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       round(avg(nn), 6) AS avg_norm,
       round(max(nn), 6) AS max_norm
FROM nrm GROUP BY label
"""


# --------------------------------------------------------------------------
# pareto frontier (skyline) — parts not dominated on (p_size ↑ better,
# p_retailprice ↓ better).  The frontier is ASSOCIATIVELY COMBINABLE
# (frontier(A∪B) = frontier(frontier(A) ∪ frontier(B))), so each batch
# emits its local frontier (≤ distinct sizes rows) and one tiny final
# pass merges them — no all-pairs, no shuffle of the fact table.
# Dominance compares UNROUNDED prices (identical doubles on both
# engines); rounding is output-only.
# --------------------------------------------------------------------------

def _pareto_frontier(df: pd.DataFrame) -> pd.DataFrame:
    """Rows (s, p, …) not dominated by any row with s'≥s, p'≤p and one
    strict.  Keep iff p == min(p | same s) AND p < min(p | s' > s);
    duplicates of a frontier point all survive (they don't dominate
    each other under the one-strict rule) — matching the SQL oracle."""
    gmin = df.groupby("p_size")["p_retailprice"].min()
    sizes = np.sort(gmin.index.to_numpy())[::-1]  # descending
    mins = gmin.reindex(sizes).to_numpy()
    run = np.concatenate([[np.inf], np.minimum.accumulate(mins)[:-1]])
    # min price among strictly larger sizes, joined back vectorized
    run_larger = pd.Series(run, index=sizes)
    p = df["p_retailprice"].to_numpy()
    s = df["p_size"].to_numpy()
    keep = (p == gmin.reindex(s).to_numpy()) & (p < run_larger.reindex(s).to_numpy())
    return df.loc[keep]


def q_pareto_front(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "part"), columns=["p_partkey", "p_size", "p_retailprice"]
    )

    def local_frontier(b: pd.DataFrame) -> pa.Table:
        f = _pareto_frontier(b)
        return pa.table(
            {
                "p_partkey": pa.array(f["p_partkey"].to_numpy(), pa.int64()),
                "p_size": pa.array(
                    f["p_size"].to_numpy().astype(np.int64), pa.int64()
                ),
                "p_retailprice": pa.array(
                    f["p_retailprice"].to_numpy(), pa.float64()
                ),
            }
        )

    partials = _to_table(
        ds.map_batches(local_frontier, batch_format="pandas")
    ).to_pandas()  # bounded: ≤ distinct-sizes rows per batch
    if partials.empty:
        return pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_size", pa.int64()),
                ("p_retailprice", pa.float64()),
            ]
        ).empty_table()
    f = _pareto_frontier(partials)
    f = f.sort_values(["p_size", "p_retailprice", "p_partkey"])
    return pa.table(
        {
            "p_partkey": pa.array(f["p_partkey"].to_numpy(), pa.int64()),
            "p_size": pa.array(f["p_size"].to_numpy(), pa.int64()),
            "p_retailprice": pa.array(
                np.round(f["p_retailprice"].to_numpy(), 2), pa.float64()
            ),
        }
    )


SQL_PARETO_FRONT = """
SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
       round(p_retailprice, 2) AS p_retailprice
FROM part p1
WHERE NOT EXISTS (
  SELECT 1 FROM part p2
  WHERE p2.p_size >= p1.p_size AND p2.p_retailprice <= p1.p_retailprice
    AND (p2.p_size > p1.p_size OR p2.p_retailprice < p1.p_retailprice))
"""


# --------------------------------------------------------------------------
# interval union (sweep-line coverage) — overlapping per-user event
# intervals merged into islands; returns per-user island count and
# total covered time.  The derived duration is exact integer µs so
# island boundaries are engine-independent.  Same hash-bucketed
# exchange as the other per-user windows; inside a bucket the sweep is
# one vectorized pandas pass (sorted cummax-shift island detection).
# --------------------------------------------------------------------------

def q_interval_union(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        s = b["ts"].astype("int64").to_numpy()
        dur_us = (
            (np.rint(b["value"].to_numpy() * 100).astype(np.int64) % 600) + 60
        ) * 1_000_000
        e = s + dur_us
        f = pd.DataFrame({"u": b["user_id"].to_numpy(), "s": s, "e": e})
        f = f.sort_values(["u", "s", "e"], kind="mergesort")
        g = f.groupby("u", sort=False)
        prev_max = g["e"].transform(lambda x: x.cummax().shift())
        new_island = prev_max.isna() | (f["s"] > prev_max)
        f["grp"] = new_island.groupby(f["u"].to_numpy(), sort=False).cumsum()
        isl = f.groupby(["u", "grp"], sort=False).agg(
            s0=("s", "min"), e1=("e", "max")
        )
        isl["cov"] = isl["e1"] - isl["s0"]
        out = isl.groupby(level=0, sort=False).agg(
            n_intervals=("cov", "size"), covered_us=("cov", "sum")
        )
        return pa.table(
            {
                "user_id": pa.array(out.index.to_numpy().astype(np.int64)),
                "n_intervals": pa.array(
                    out["n_intervals"].to_numpy().astype(np.int64), pa.int64()
                ),
                "covered_us": pa.array(
                    out["covered_us"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_INTERVAL_UNION = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s,
         epoch_us(ts) + (((CAST(round(value * 100) AS BIGINT) % 600) + 60)
                         * 1000000) AS e
  FROM events),
w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv),
g AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING)
           AS grp
  FROM w),
isl AS (SELECT user_id, grp, min(s) AS s0, max(e) AS e1
        FROM g GROUP BY user_id, grp)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(e1 - s0) AS BIGINT) AS covered_us
FROM isl GROUP BY user_id
"""


# --------------------------------------------------------------------------
# weighted average — quantity-weighted mean discount per return flag:
# the ratio-of-sums form is exactly combinable ((Σwx, Σw) partials per
# batch), unlike a mean-of-means; one tiny exchange, division at the
# very end on the collected O(flags) rows.
# --------------------------------------------------------------------------

def q_weighted_avg(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_discount", "l_quantity"],
    )

    def partial(b: pa.Table) -> pa.Table:
        wx = pc.multiply(b.column("l_discount"), b.column("l_quantity"))
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "wx": wx,
                "w": b.column("l_quantity"),
            }
        )
        g = pa.TableGroupBy(t, "l_returnflag").aggregate(
            [("wx", "sum"), ("w", "sum")]
        )
        return g.rename_columns(["l_returnflag", "wx", "w"])

    t = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["l_returnflag"],
        sum_cols=["wx", "w"],
        schema=pa.schema(
            [("l_returnflag", pa.string()), ("wx", pa.float64()), ("w", pa.float64())]
        ),
    )
    return pa.table(
        {
            "l_returnflag": t.column("l_returnflag"),
            "wavg_discount": pc.round(
                pc.divide(t.column("wx"), t.column("w")), ndigits=6
            ),
        }
    )


SQL_WEIGHTED_AVG = """
SELECT l_returnflag,
       round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_discount
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# 2-D histogram (hour-of-day × value decile bin) — the heatmap
# aggregate: both bins derive vectorized, the per-batch combiner emits
# O(24 × bins) rows, and the exchange is bounded by the grid size
# regardless of corpus size.
# --------------------------------------------------------------------------

def q_histogram_2d(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        h = pc.hour(b.column("ts")).cast(pa.int64())
        vb = pa.array(
            np.floor(b.column("value").to_numpy(zero_copy_only=False) / 10.0).astype(
                np.int64
            )
        )
        t = pa.table(
            {"hour": h, "vbin": vb, "one": pa.array(np.ones(b.num_rows, np.int64))}
        )
        g = pa.TableGroupBy(t, ["hour", "vbin"]).aggregate([("one", "sum")])
        return g.rename_columns(["hour", "vbin", "cnt"])

    return _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["hour", "vbin"],
        sum_cols=["cnt"],
        schema=pa.schema(
            [("hour", pa.int64()), ("vbin", pa.int64()), ("cnt", pa.int64())]
        ),
    )


SQL_HISTOGRAM_2D = """
SELECT CAST(hour(ts) AS BIGINT) AS hour,
       CAST(floor(value / 10.0) AS BIGINT) AS vbin,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# PageRank (fixed-iteration power method) on the supplier–part graph —
# the iterative-algorithm demo next to kmeans/CC.  Same size-gate as
# connected_components: the edge set is materialized anyway, so under
# the gate the 5 iterations run as vectorized numpy (one np.add.at
# scatter per round); above it, each round is the house bucketed
# reduce-side join (ranks flow along edges keyed on src, contributions
# partial-sum per batch, one bucketed exchange per round).  The oracle
# unrolls the 5 iterations as chained CTEs (aggregates are illegal in
# a recursive member).  Output: top-20 by ROUNDED rank (both engines
# sort the rounded value; float drift across 5 iterations is ~1e-14,
# invisible at 6 decimals).
# --------------------------------------------------------------------------

_PR_D, _PR_ITERS, _PR_TOPK = 0.85, 5, 20
_PR_LOCAL_MAX_BYTES = 64 << 20


def _pr_local(edges: pa.Table) -> pa.Table:
    """Vectorized power iteration on a driver-resident (src, dst)
    table.  Node ids compacted via sorted unique; contributions
    scattered with np.add.at."""
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    i_src = np.searchsorted(nodes, src)
    i_dst = np.searchsorted(nodes, dst)
    n = len(nodes)
    deg = np.zeros(n)
    np.add.at(deg, i_src, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        contrib = r[i_src] / deg[i_src]
        nxt = np.full(n, (1.0 - _PR_D) / n)
        np.add.at(nxt, i_dst, _PR_D * contrib)
        r = nxt
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "rank": pa.array(np.round(r, 6), pa.float64()),
        }
    )


def q_pagerank(sf_dir: str):
    import pyarrow.dataset as pads

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey"],
        filter=pads.field("l_quantity") == 1.0,
    )

    def edges(b: pa.Table) -> pa.Table:
        # directed both ways (undirected graph), batch-local distinct
        f = pd.DataFrame(
            {
                "a": b.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64),
                "b": b.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
                + _GRAPH_PART_OFFSET,
            }
        ).drop_duplicates()
        a, bb = f["a"].to_numpy(), f["b"].to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, bb]), pa.int64()),
                "dst": pa.array(np.concatenate([bb, a]), pa.int64()),
            }
        )

    e = li.map_batches(edges, batch_format="pyarrow").materialize()
    empty = pa.schema([("node", pa.int64()), ("rank", pa.float64())]).empty_table()
    # Batch-local distinct is not global distinct: dedup the edge set
    # exactly (an edge seen in two batches must count once in outdeg).
    if (e.size_bytes() or 0) <= _PR_LOCAL_MAX_BYTES:
        tbl = dd._collect(e)
        if tbl.num_rows == 0:
            return empty
        df = tbl.to_pandas().drop_duplicates()
        ranks = _pr_local(pa.Table.from_pandas(df, preserve_index=False))
    else:
        ranks = _pagerank_distributed(e)
    out = (
        ranks.to_pandas()
        .sort_values(["rank", "node"], ascending=[False, True], kind="mergesort")
        .head(_PR_TOPK)
    )
    return pa.table(
        {
            "node": pa.array(out["node"].to_numpy(), pa.int64()),
            "rank": pa.array(out["rank"].to_numpy(), pa.float64()),
        }
    )


def _pagerank_distributed(e) -> pa.Table:
    """Distributed power iteration: exact global edge dedup + outdeg
    via one bucketed exchange, then per round ranks join edges on src
    (tag + union + bucketed groupby), contributions partial-sum per
    bucket keyed on dst, one more bucketed sum — O(edges) rows per
    exchange, ``_PR_ITERS`` rounds.  Returns the collected (node,
    rank) table (callers top-k it).  Tested via the forced-gate unit
    test; the sf oracles exercise the local path."""
    import zlib

    def bucket_on(col):
        def f(b: pa.Table) -> pa.Table:
            k = b.column(col).to_numpy(zero_copy_only=False)
            return b.append_column(
                "_bucket", pa.array((k % _GROUP_BUCKETS).astype("int32"))
            )

        return f

    # exact dedup + outdeg per src bucket
    def dedup_deg(df: pd.DataFrame) -> pa.Table:
        f = df[["src", "dst"]].drop_duplicates()
        degs = f.groupby("src", sort=False)["dst"].transform("size")
        return pa.table(
            {
                "src": pa.array(f["src"].to_numpy(), pa.int64()),
                "dst": pa.array(f["dst"].to_numpy(), pa.int64()),
                "deg": pa.array(degs.to_numpy().astype(np.float64), pa.float64()),
            }
        )

    ed = (
        e.map_batches(bucket_on("src"), batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_GROUP_BUCKETS)
        .map_groups(dedup_deg, batch_format="pandas")
        .materialize()
    )
    nodes = dd._collect(
        ed.map_batches(
            lambda b: pa.table(
                {"node": pc.unique(b.column("src"))}
            ),
            batch_format="pyarrow",
        )
    )
    node_arr = np.unique(nodes.column("node").to_numpy(zero_copy_only=False))
    n = len(node_arr)
    ranks_df = pd.DataFrame({"node": node_arr, "r": np.full(n, 1.0 / n)})

    for _ in range(_PR_ITERS):
        rref = ray.put(dict(zip(ranks_df["node"], ranks_df["r"])))

        def contrib(b: pa.Table) -> pa.Table:
            rm = ray.get(rref)
            src = b.column("src").to_numpy(zero_copy_only=False)
            r = pd.Series(src).map(rm).to_numpy()
            c = _PR_D * r / b.column("deg").to_numpy(zero_copy_only=False)
            f = (
                pd.DataFrame(
                    {"node": b.column("dst").to_numpy(zero_copy_only=False), "c": c}
                )
                .groupby("node", sort=False, as_index=False)["c"]
                .sum()
            )
            return pa.table(
                {
                    "node": pa.array(f["node"].to_numpy(), pa.int64()),
                    "c": pa.array(f["c"].to_numpy(), pa.float64()),
                }
            )

        summed = _sum_partials(
            ed.map_batches(contrib, batch_format="pyarrow"),
            keys=["node"],
            sum_cols=["c"],
            schema=pa.schema([("node", pa.int64()), ("c", pa.float64())]),
        ).to_pandas()
        ranks_df = pd.DataFrame({"node": node_arr}).merge(summed, on="node", how="left")
        ranks_df["r"] = (1.0 - _PR_D) / n + ranks_df["c"].fillna(0.0)
        ranks_df = ranks_df[["node", "r"]]

    return pa.table(
        {
            "node": pa.array(ranks_df["node"].to_numpy(), pa.int64()),
            "rank": pa.array(np.round(ranks_df["r"].to_numpy(), 6), pa.float64()),
        }
    )


def _pr_sql() -> str:
    base = f"""
WITH e0 AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
                   CAST(l_partkey + {_GRAPH_PART_OFFSET} AS BIGINT) AS b
            FROM lineitem WHERE l_quantity = 1),
u AS (SELECT a AS src, b AS dst FROM e0 UNION SELECT b, a FROM e0),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM u GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
pr0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(
            f"""
pr{i} AS (
  SELECT u.dst AS node,
         (1 - {_PR_D}) / (SELECT n FROM nn)
         + {_PR_D} * sum(p.r / deg.d) AS r
  FROM u JOIN pr{i - 1} p ON p.node = u.src JOIN deg ON deg.src = u.src
  GROUP BY u.dst)"""
        )
    return (
        base
        + ","
        + ",".join(steps)
        + f"""
SELECT node, round(r, 6) AS rank FROM pr{_PR_ITERS}
ORDER BY round(r, 6) DESC, node LIMIT {_PR_TOPK}
"""
    )


SQL_PAGERANK = _pr_sql()


# --------------------------------------------------------------------------
# time-weighted average — the mean of a step function between events
# (the metrics-system semantic, not the row mean): per-user sorted
# scan, each value weighted by its holding duration; last event drops
# (no duration).  Exact integer cents × µs products; the final ratio
# is float (relative drift ~1e-16 ≪ the 6-decimal round).
# --------------------------------------------------------------------------

def q_time_weighted_avg(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t = b["ts"].astype("int64").to_numpy()
        cents = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        u = b["user_id"].to_numpy()
        t2 = np.roll(t, -1)
        last = np.concatenate([u[1:] != u[:-1], [True]])  # per-user last row
        gap = np.where(last, 0, t2 - t).astype(np.float64)
        f = pd.DataFrame({"u": u, "num": cents * gap, "den": gap})
        g = f.groupby("u", sort=False, as_index=False)[["num", "den"]].sum()
        g = g[g["den"] > 0]
        return pa.table(
            {
                "user_id": pa.array(g["u"].to_numpy().astype(np.int64), pa.int64()),
                "twa_cents": pa.array(
                    np.round(g["num"].to_numpy() / g["den"].to_numpy(), 6),
                    pa.float64(),
                ),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_TIME_WEIGHTED_AVG = """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS t2
  FROM events)
SELECT user_id,
       round(sum(cents * (t2 - t)) / CAST(sum(t2 - t) AS DOUBLE), 6) AS twa_cents
FROM o WHERE t2 IS NOT NULL
GROUP BY user_id HAVING sum(t2 - t) > 0
"""


# --------------------------------------------------------------------------
# TPC-H Q13-shaped order-count distribution.  The classic LEFT-JOIN +
# double-groupby collapses to combiner algebra: per-batch value_counts
# on o_custkey (O(customers-in-batch) rows leave each batch), ONE
# custkey-bucketed merge where each bucket sums its customers' counts
# AND folds them straight into (c_count → custdist) partials, then a
# tiny O(buckets × distinct-counts) driver sum.  The zero-order bucket
# never scans customer at all — parquet row-count metadata minus the
# distinct-custkey total (valid because o_custkey is an FK into the
# unique c_custkey, the same invariant the oracle's LEFT JOIN uses).
# --------------------------------------------------------------------------


def q_tpch_q13(sf_dir: str):
    orders = _read_pq(_t(sf_dir, "orders"), columns=["o_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        vc = b.column("o_custkey").combine_chunks().value_counts()
        return pa.table(
            {
                "custkey": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        per_cust = df.groupby("custkey", sort=False)["cnt"].sum()
        dist = per_cust.value_counts()
        return pa.table(
            {
                "c_count": pa.array(dist.index.to_numpy().astype(np.int64), pa.int64()),
                "custdist": pa.array(dist.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    parts = _merge_partials(
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "custkey",
        per_bucket,
        input_schema=pa.schema([("custkey", pa.int64()), ("cnt", pa.int64())]),
    )
    df = parts.to_pandas().groupby("c_count", as_index=False)["custdist"].sum()
    n_cust = pa.parquet.read_metadata(_t(sf_dir, "customer")).num_rows
    zero = int(n_cust) - int(df["custdist"].sum())
    if zero > 0:
        df = pd.concat(
            [df, pd.DataFrame({"c_count": [0], "custdist": [zero]})], ignore_index=True
        )
    df = df.sort_values(["custdist", "c_count"], ascending=[False, False])
    return pa.table(
        {
            "c_count": pa.array(df["c_count"].to_numpy(), pa.int64()),
            "custdist": pa.array(df["custdist"].to_numpy(), pa.int64()),
        }
    )


SQL_TPCH_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q17-shaped small-quantity revenue: parts of one brand whose
# lineitems fall below 20% of that part's average quantity.  The
# correlated-subquery semantic needs two passes over lineitem, both
# column-pruned: pass 1 builds per-partkey (Σqty, n) combiner partials
# for the brand's keys only (brand keyset broadcast once via ray.put —
# O(|brand| × 8B), ~4% of part); pass 2 maps each row against the
# broadcast per-partkey threshold and sums revenue.  Quantities are
# integers ≤ 50, so Σqty is exact in float64 at any scale and the
# 0.2 × (Σ/n) threshold is bit-identical to the oracle's avg() —
# no summation-order hazard (rounded to 6 anyway as a belt).
# --------------------------------------------------------------------------

_Q17_BRAND = "Brand#23"


def q_tpch_q17(sf_dir: str):
    part = pa.parquet.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    keys = (
        part.filter(pc.equal(part.column("p_brand"), _Q17_BRAND))
        .column("p_partkey")
        .combine_chunks()
    )
    kref = ray.put(keys)

    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_quantity"])

    def qty_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b.column("l_partkey"), value_set=ray.get(kref)))
        t = pa.table(
            {
                "k": f.column("l_partkey"),
                "q": f.column("l_quantity"),
                "n": pa.array(np.ones(f.num_rows, np.int64), pa.int64()),
            }
        )
        g = t.group_by("k").aggregate([("q", "sum"), ("n", "sum")])
        return pa.table(
            {"k": g.column("k"), "q": g.column("q_sum"), "n": g.column("n_sum")}
        )

    sums = _sum_partials(
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["k"],
        sum_cols=["q", "n"],
        schema=pa.schema([("k", pa.int64()), ("q", pa.float64()), ("n", pa.int64())]),
    ).to_pandas()
    thr = dict(
        zip(
            sums["k"],
            np.round(0.2 * (sums["q"].to_numpy() / sums["n"].to_numpy()), 6),
        )
    )
    tref = ray.put(thr)

    li2 = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        t = pd.Series(b.column("l_partkey").to_numpy(zero_copy_only=False)).map(
            ray.get(tref)
        )
        keep = b.column("l_quantity").to_numpy(zero_copy_only=False) < t.to_numpy()
        # exact int64 cents (2dp prices) — order-proof partial sums
        rev = int(
            np.rint(
                b.column("l_extendedprice").to_numpy(zero_copy_only=False)[keep] * 100
            )
            .astype(np.int64)
            .sum()
        )
        return pa.table(
            {
                "rev": pa.array([rev], pa.int64()),
                "n": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    t = _to_table(
        li2.map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    n_kept = int(pc.sum(t.column("n")).as_py() or 0) if t.num_rows else 0
    if n_kept == 0:
        # SQL sum() over zero rows is NULL — keep the oracle's semantics
        return pa.table({"avg_yearly": pa.array([None], pa.float64())})
    total = float(pc.sum(t.column("rev")).as_py() or 0) / 100.0
    return pa.table({"avg_yearly": pa.array([round(total / 7.0, 2)], pa.float64())})


SQL_TPCH_Q17 = f"""
SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0, 2)
  AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = '{_Q17_BRAND}'
  AND l_quantity < (SELECT round(0.2 * avg(l2.l_quantity), 6)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


# --------------------------------------------------------------------------
# TPC-H Q10-shaped returned-item revenue (top 20 customers).  The
# orders-quarter ⋈ returned-lineitem join is LARGE × LARGE at scale,
# so it runs reduce-side: lineitem collapses per batch to (orderkey,
# Σrev) partials, unions with (orderkey, custkey) order rows, ONE
# orderkey-bucketed exchange resolves the join and re-collapses to
# per-custkey revenue partials — then a SECOND tiny merge on custkey
# takes per-bucket top-20s, so the driver sees O(buckets × 20) rows,
# never O(customers).  Only the 20 surviving custkeys touch the
# customer table (key-pruned point read) and nation is a broadcast
# dict — no customer-side shuffle at any scale.
# --------------------------------------------------------------------------

_Q10_TOPN = 20


def q_tpch_q10(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo, hi = _dt.datetime(1995, 10, 1), _dt.datetime(1996, 1, 1)
    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "cust": b.column("o_custkey"),
                "rev": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }
        )

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    )

    def li_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "k": b.column("l_orderkey"),
                    "rev": _money_i4(
                        b.column("l_extendedprice"), b.column("l_discount")
                    ),
                }
            )
            .group_by("k")
            .aggregate([("rev", "sum")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "cust": pa.array(np.full(g.num_rows, -1, np.int64), pa.int64()),
                "rev": g.column("rev_sum"),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["cust"].to_numpy() >= 0
        revs = b[~is_order].groupby("k", sort=False)["rev"].sum().rename("orev")
        m = b[is_order].merge(revs, left_on="k", right_index=True, how="inner")
        g = m.groupby("cust", sort=False, as_index=False)["orev"].sum()
        return pa.table(
            {
                "custkey": pa.array(g["cust"].to_numpy(), pa.int64()),
                "revenue": pa.array(g["orev"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    partials = _bucketed(both, "k", join_bucket)

    def top_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("custkey", sort=False, as_index=False)["revenue"].sum()
        g["revenue"] = _i4_to_money(g["revenue"].to_numpy())
        g = g.sort_values(["revenue", "custkey"], ascending=[False, True]).head(
            _Q10_TOPN
        )
        return pa.table(
            {
                "custkey": pa.array(g["custkey"].to_numpy(), pa.int64()),
                "revenue": pa.array(g["revenue"].to_numpy(), pa.float64()),
            }
        )

    merged = _merge_partials(
        partials,
        "custkey",
        top_bucket,
        input_schema=pa.schema([("custkey", pa.int64()), ("revenue", pa.int64())]),
    ).to_pandas()
    top = merged.sort_values(["revenue", "custkey"], ascending=[False, True]).head(
        _Q10_TOPN
    )
    out_schema = pa.schema(
        [
            ("c_custkey", pa.int64()),
            ("c_name", pa.string()),
            ("revenue", pa.float64()),
            ("c_acctbal", pa.float64()),
            ("n_name", pa.string()),
        ]
    )
    if top.empty:
        return out_schema.empty_table()

    cust = pa.parquet.read_table(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", top["custkey"].tolist())],
    ).to_pandas()
    nation = pa.parquet.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = top.merge(cust, left_on="custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.sort_values(["revenue", "custkey"], ascending=[False, True])
    return pa.table(
        {
            "c_custkey": pa.array(out["custkey"].to_numpy(), pa.int64()),
            "c_name": pa.array(out["c_name"], pa.string()),
            "revenue": pa.array(out["revenue"].to_numpy(), pa.float64()),
            "c_acctbal": pa.array(out["c_acctbal"].to_numpy(), pa.float64()),
            "n_name": pa.array(out["n_name"], pa.string()),
        }
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name,
       {_sql_i4_money(f'sum({_sql_rev_i4()})')} AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT {_Q10_TOPN}
"""


# --------------------------------------------------------------------------
# TPC-H Q22-shaped dormant high-balance customers: above-average
# balance (within two segments) and NO order since a cutoff date.  The
# scalar subquery is a two-int combiner (Σcents, n — balances as exact
# integer cents, so the threshold is bit-identical across engines
# regardless of summation order); the NOT EXISTS is the reduce-side
# anti-join: recent orders collapse per batch to distinct custkeys,
# union with eligible customer rows, ONE custkey-bucketed exchange
# keeps customers whose bucket holds no order row, emitting O(segments)
# partials per bucket.
# --------------------------------------------------------------------------

_Q22_SEGS = ("AUTOMOBILE", "MACHINERY")
_Q22_SINCE = "2000-06-01"


def q_tpch_q22(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    cust = _read_pq(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
        filter=pads.field("c_mktsegment").isin(list(_Q22_SEGS)),
    )

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table(
            {
                "s": pa.array([int(pos.sum())], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    bt = _to_table_s(
        cust.map_batches(bal_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("s", pa.int64()), ("n", pa.int64())]),
    )
    s = int(pc.sum(bt.column("s")).as_py() or 0)
    n = int(pc.sum(bt.column("n")).as_py() or 0)
    thr_cents = s / n if n else float("inf")

    def cust_rows(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        keep = cents > thr_cents
        f = b.filter(pa.array(keep))
        return pa.table(
            {
                "k": f.column("c_custkey"),
                "seg": f.column("c_mktsegment"),
                "cents": pa.array(cents[keep], pa.int64()),
            }
        )

    recent = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_custkey"],
        filter=pads.field("o_orderdate") >= _dt.datetime(2000, 6, 1),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        u = pc.unique(b.column("o_custkey"))
        return pa.table(
            {
                "k": u,
                "seg": pa.array([""] * len(u), pa.string()),
                "cents": pa.array(np.zeros(len(u), np.int64), pa.int64()),
            }
        )

    both = cust.map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        recent.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def anti_bucket(b: pd.DataFrame) -> pa.Table:
        seg = b["seg"].to_numpy()
        has_order = set(b.loc[seg == "", "k"].to_numpy())
        c = b[seg != ""]
        c = c[~c["k"].isin(has_order)]
        g = c.groupby("seg", sort=False).agg(
            numcust=("k", "size"), cents=("cents", "sum")
        )
        return pa.table(
            {
                "segment": pa.array(g.index.to_numpy(), pa.string()),
                "numcust": pa.array(g["numcust"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    partials = _bucketed(both, "k", anti_bucket)
    out = _sum_partials(
        partials,
        ["segment"],
        ["numcust", "cents"],
        pa.schema(
            [("segment", pa.string()), ("numcust", pa.int64()), ("cents", pa.int64())]
        ),
    ).to_pandas()
    out = out.sort_values("segment")
    return pa.table(
        {
            "segment": pa.array(out["segment"], pa.string()),
            "numcust": pa.array(out["numcust"].to_numpy(), pa.int64()),
            "totacctbal": pa.array(
                np.round(out["cents"].to_numpy() / 100.0, 2), pa.float64()
            ),
        }
    )


SQL_TPCH_Q22 = f"""
WITH eligible AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
  WHERE c_mktsegment IN ('{_Q22_SEGS[0]}', '{_Q22_SEGS[1]}'))
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(cents) / 100.0, 2) AS totacctbal
FROM eligible
WHERE cents > (SELECT avg(cents) FROM eligible WHERE cents > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = eligible.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{_Q22_SINCE}')
GROUP BY c_mktsegment ORDER BY segment
"""


# --------------------------------------------------------------------------
# TPC-H Q9-shaped profit rollup by (supplier nation, ship year) for one
# part family.  Part filter is a broadcast keyset (selective, int64
# keys only); the supplier→nation attribution runs reduce-side —
# lineitem collapses per batch to (suppkey, year, Σprofit), unions with
# (suppkey, nationkey) supplier rows, ONE suppkey-bucketed exchange
# resolves the join into (nationkey, year, Σprofit) partials, then an
# O(nations × years) merge.  Supplier is never broadcast (it scales
# with the lake); nation (25 rows) is.
# --------------------------------------------------------------------------

_Q9_NAME_PREFIX = "red "


def q_tpch_q9(sf_dir: str):
    part = pa.parquet.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    keys = (
        part.filter(pc.starts_with(part.column("p_name"), _Q9_NAME_PREFIX))
        .column("p_partkey")
        .combine_chunks()
    )
    kref = ray.put(keys)

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def li_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b.column("l_partkey"), value_set=ray.get(kref)))
        g = (
            pa.table(
                {
                    "k": f.column("l_suppkey"),
                    "year": pc.year(f.column("l_shipdate")),
                    "profit": _money_i4(
                        f.column("l_extendedprice"), f.column("l_discount")
                    ),
                }
            )
            .group_by(["k", "year"])
            .aggregate([("profit", "sum")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "year": g.column("year"),
                "profit": g.column("profit_sum"),
                "nk": pa.array(np.full(g.num_rows, -1, np.int32), pa.int32()),
            }
        )

    supp = _read_pq(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])

    def supp_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("s_suppkey"),
                "year": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "profit": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "nk": b.column("s_nationkey"),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        supp.map_batches(supp_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def join_bucket(b: pd.DataFrame) -> pa.Table:
        is_supp = b["nk"].to_numpy() >= 0
        nk = b[is_supp].set_index("k")["nk"]
        m = b[~is_supp].merge(nk, left_on="k", right_index=True, how="inner")
        g = m.groupby(["nk_y", "year"], sort=False, as_index=False)["profit"].sum()
        return pa.table(
            {
                "nationkey": pa.array(g["nk_y"].to_numpy().astype(np.int32), pa.int32()),
                "o_year": pa.array(g["year"].to_numpy(), pa.int64()),
                "profit": pa.array(g["profit"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    partials = _bucketed(both, "k", join_bucket)

    def merge_fn(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["nationkey", "o_year"], sort=False, as_index=False)[
            "profit"
        ].sum()
        return pa.table(
            {
                "nationkey": pa.array(g["nationkey"].to_numpy(), pa.int32()),
                "o_year": pa.array(g["o_year"].to_numpy(), pa.int64()),
                "profit": pa.array(g["profit"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    out = _merge_partials(
        partials,
        "nationkey",
        merge_fn,
        input_schema=pa.schema(
            [("nationkey", pa.int32()), ("o_year", pa.int64()), ("profit", pa.int64())]
        ),
    ).to_pandas()
    nation = pa.parquet.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = out.merge(nation, left_on="nationkey", right_on="n_nationkey")
    out = out.sort_values(["n_name", "o_year"], ascending=[True, False])
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "o_year": pa.array(out["o_year"].to_numpy(), pa.int64()),
            "sum_profit": pa.array(
                _i4_to_money(out["profit"].to_numpy()), pa.float64()
            ),
        }
    )


SQL_TPCH_Q9 = f"""
SELECT n_name, year(l_shipdate) AS o_year,
       {_sql_i4_money(f'sum({_sql_rev_i4()})')} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '{_Q9_NAME_PREFIX}%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# --------------------------------------------------------------------------
# Inverted-index build: term → capped, sorted posting list + document
# frequency.  Per batch, documents explode to DISTINCT (term, doc_id)
# pairs (the list_flatten / np.repeat explode, then an in-batch dedup
# — a doc's rows never span batches); the pair stream takes ONE
# term-bucketed exchange (exactly the MinHash-band shape) where each
# bucket owns its terms end-to-end: df = pair count, postings = first
# _INVIDX_CAP doc_ids ascending.  Output is O(vocab) rows with bounded
# strings — the cap, not the corpus, bounds every posting cell.
# --------------------------------------------------------------------------

_INVIDX_MIN_DF, _INVIDX_CAP = 5, 20


def q_inverted_index(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(b.column("text")), "[^a-z]+")
        n_per = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "term": pc.list_flatten(toks).to_pandas(),
                "doc_id": np.repeat(
                    b.column("doc_id").to_numpy(zero_copy_only=False), n_per
                ),
            }
        )
        df = df[df["term"] != ""].drop_duplicates()
        return pa.table(
            {
                "term": pa.array(df["term"], pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            # groupby.apply on an empty frame yields a float-dtyped
            # Series that Arrow rejects as a string column
            return pa.schema(
                [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
            ).empty_table()
        df = df.sort_values(["term", "doc_id"])
        g = df.groupby("term", sort=False)["doc_id"]
        dfreq = g.size()
        posting = g.apply(
            lambda s: ",".join(str(v) for v in s.iloc[: _INVIDX_CAP])
        )
        keep = dfreq >= _INVIDX_MIN_DF
        return pa.table(
            {
                "term": pa.array(dfreq.index[keep].to_numpy(), pa.string()),
                "df": pa.array(dfreq[keep].to_numpy().astype(np.int64), pa.int64()),
                "postings": pa.array(posting[keep].to_numpy(), pa.string()),
            }
        )

    out = _merge_partials(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        "term",
        per_bucket,
        input_schema=pa.schema([("term", pa.string()), ("doc_id", pa.int64())]),
    )
    return out.sort_by("term")


SQL_INVERTED_INDEX = f"""
WITH td AS (
  SELECT DISTINCT term, doc_id FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term, doc_id
    FROM documents)
  WHERE term <> '')
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(
         list_slice(list(CAST(doc_id AS VARCHAR) ORDER BY doc_id),
                    1, {_INVIDX_CAP}), ',') AS postings
FROM td GROUP BY term HAVING count(*) >= {_INVIDX_MIN_DF} ORDER BY term
"""


# --------------------------------------------------------------------------
# PMI collocations: pointwise mutual information for every bigram seen
# ≥ _PMI_MIN times.  Both count families are per-batch combiner
# partials (the q_bigram_topk / q_vocab_topk kernels); the bigram
# stream merges through ONE crc32-bucketed exchange where the ≥min
# filter runs per bucket, so the driver only ever sees qualifying
# bigrams (O(qualifying)) plus the unigram vocabulary (bounded — the
# same ≤2M-entry assumption q_unigram_logprob documents).  The PMI
# arithmetic is an exact-integer-ratio ln, associativity matched
# term-for-term with the SQL so the float is bit-identical before the
# 6-decimal round.
# --------------------------------------------------------------------------

_PMI_MIN = 25


def q_pmi_bigrams(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def bigram_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        ).combine_chunks()
        offs = np.asarray(toks.offsets)
        vals = toks.values.to_numpy(zero_copy_only=False)
        vals = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        n = len(vals)
        if n < 2:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        start_ok = np.ones(n - 1, dtype=bool)
        lasts = offs[1:] - 1
        lasts = lasts[(lasts >= 0) & (lasts <= n - 2)]
        start_ok[lasts] = False
        w1, w2 = vals[:-1][start_ok], vals[1:][start_ok]
        m = (w1 != "") & (w2 != "")
        vc = (pd.Series(w1[m]) + " " + pd.Series(w2[m])).value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    def qualifying(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("bigram", sort=False, as_index=False)["cnt"].sum()
        g = g[g["cnt"] >= _PMI_MIN]
        return pa.table(
            {
                "bigram": pa.array(g["bigram"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    big = _merge_partials(
        ds.map_batches(bigram_partial, batch_format="pyarrow", zero_copy_batch=True),
        "bigram",
        qualifying,
        input_schema=pa.schema([("bigram", pa.string()), ("cnt", pa.int64())]),
    ).to_pandas()
    # total bigram occurrences must count ALL bigrams, not just
    # qualifying ones — a second scalar combiner over the same stream
    # would re-tokenize; instead carry totals from the partials
    uni = _sum_partials(
        ds.map_batches(uni_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["word"],
        sum_cols=["cnt"],
        schema=pa.schema([("word", pa.string()), ("cnt", pa.int64())]),
    ).to_pandas()

    n_uni = int(uni["cnt"].sum())
    # total bigrams = Σ_docs max(tokens_in_doc - 1, 0); derive it the
    # cheap exact way: Σ unigrams − n_docs-with-≥1-token is wrong for
    # empty docs, so count it directly with a tiny scalar combiner.
    def nbig_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        ).combine_chunks()
        offs = np.asarray(toks.offsets)
        vals = toks.values.to_numpy(zero_copy_only=False)
        vals = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        if len(offs) <= 1:
            return pa.table({"nb": pa.array([0], pa.int64())})
        # non-empty tokens are contiguous ('+' collapses delimiter runs,
        # empties only at the list edges), so adjacent non-empty pairs
        # per doc = max(non-empty count − 1, 0)
        nz = (vals != "").astype(np.int64)
        pad = np.concatenate([nz, np.zeros(1, np.int64)])
        cnt = np.add.reduceat(pad, offs[:-1])
        cnt = np.where(offs[1:] > offs[:-1], cnt, 0)
        nb = int(np.maximum(cnt - 1, 0).sum())
        return pa.table({"nb": pa.array([nb], pa.int64())})

    nbt = _to_table_s(
        ds.map_batches(nbig_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema([("nb", pa.int64())]),
    )
    n_big = int(pc.sum(nbt.column("nb")).as_py() or 0)

    if not len(big):  # no qualifying bigrams (e.g. empty corpus)
        return pa.schema(
            [("bigram", pa.string()), ("cnt", pa.int64()), ("pmi", pa.float64())]
        ).empty_table()
    ucnt = dict(zip(uni["word"], uni["cnt"]))
    w = big["bigram"].str.split(" ", n=1, expand=True)
    c_a = w[0].map(ucnt).to_numpy(dtype=np.float64)
    c_b = w[1].map(ucnt).to_numpy(dtype=np.float64)
    c_ab = big["cnt"].to_numpy()
    num = c_ab.astype(np.float64) * float(n_uni) * float(n_uni)
    den = float(n_big) * c_a * c_b
    pmi = np.round(np.log(num / den), 6)
    out = pd.DataFrame({"bigram": big["bigram"], "cnt": c_ab, "pmi": pmi})
    out = out.sort_values("bigram")
    return pa.table(
        {
            "bigram": pa.array(out["bigram"], pa.string()),
            "cnt": pa.array(out["cnt"].to_numpy(), pa.int64()),
            "pmi": pa.array(out["pmi"].to_numpy(), pa.float64()),
        }
    )


SQL_PMI_BIGRAMS = f"""
WITH w AS (SELECT string_split_regex(lower(text), '[^a-z]+') AS ws
           FROM documents),
     p AS (SELECT unnest(ws[1:len(ws)-1]) AS w1,
                  unnest(ws[2:len(ws)]) AS w2 FROM w),
     b AS (SELECT w1, w2, count(*) AS cnt FROM p
           WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2),
     u AS (SELECT word, count(*) AS cnt FROM (
             SELECT unnest(ws) AS word FROM w) WHERE word <> ''
           GROUP BY word),
     nu AS (SELECT sum(cnt) AS n FROM u),
     nb AS (SELECT sum(cnt) AS n FROM b)
SELECT b.w1 || ' ' || b.w2 AS bigram, b.cnt,
       round(ln((CAST(b.cnt AS DOUBLE) * (SELECT n FROM nu) * (SELECT n FROM nu))
                / (CAST((SELECT n FROM nb) AS DOUBLE) * ua.cnt * ub.cnt)), 6) AS pmi
FROM b JOIN u ua ON ua.word = b.w1 JOIN u ub ON ub.word = b.w2
WHERE b.cnt >= {_PMI_MIN}
ORDER BY bigram
"""


# --------------------------------------------------------------------------
# Sentence statistics: per document, the number of sentences and the
# average trimmed sentence length.  Pure map-side (each row is one
# document; no exchange at any scale) — the list-offset reduceat
# pattern keeps the per-batch kernel fully vectorized.
# --------------------------------------------------------------------------

_SENT_SPLIT_RE = r"[.!?]+"
_TRIM_CHARS = " \t\n\r"


def q_sentence_stats(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        segs = pc.split_pattern_regex(
            batch.column("text"), _SENT_SPLIT_RE
        ).combine_chunks()
        offs = np.asarray(segs.offsets)
        trimmed = pc.utf8_trim(segs.values, characters=_TRIM_CHARS)
        lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False).astype(np.int64)
        lens = lens[offs[0] : offs[-1]]
        nz = (lens > 0).astype(np.int64)
        base = offs - offs[0]
        pad_n = np.concatenate([nz, [0]])
        pad_l = np.concatenate([np.where(nz > 0, lens, 0), [0]])
        n_sent = np.add.reduceat(pad_n, base[:-1])
        sum_len = np.add.reduceat(pad_l, base[:-1])
        empty = base[1:] <= base[:-1]
        n_sent = np.where(empty, 0, n_sent)
        sum_len = np.where(empty, 0, sum_len)
        keep = n_sent > 0
        avg = np.round(
            sum_len[keep].astype(np.float64) / n_sent[keep].astype(np.float64), 4
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "n_sent": pa.array(n_sent[keep], pa.int64()),
                "avg_len": pa.array(avg, pa.float64()),
            }
        )

    return _to_table(ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True))


SQL_SENTENCE_STATS = f"""
WITH s AS (
  SELECT doc_id, trim(seg, ' ' || chr(9) || chr(10) || chr(13)) AS seg
  FROM (SELECT doc_id, unnest(string_split_regex(text, '{_SENT_SPLIT_RE}')) AS seg
        FROM documents))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sent,
       round(sum(CAST(len(seg) AS DOUBLE)) / count(*), 4) AS avg_len
FROM s WHERE seg <> '' GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# TPC-H Q21-shaped sole-late-supplier blame: orders served by ≥2
# suppliers where EXACTLY ONE shipped >60 days after the order date —
# count such orders per blamed supplier.  lineitem collapses per batch
# to (orderkey, suppkey, max ship) partials, unions with (orderkey,
# orderdate) rows, ONE orderkey-bucketed exchange owns each order's
# whole supplier group (the EXISTS + NOT-EXISTS pair becomes two
# vectorized per-order counts), emitting per-suppkey blame partials;
# the supplier-name hydration is a key-pruned point read of the
# surviving suppliers only.
# --------------------------------------------------------------------------

_Q21_LATE_US = 60 * 24 * 3600 * 1_000_000


def q_tpch_q21(sf_dir: str):
    li = _read_pq(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )

    def li_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "k": b.column("l_orderkey"),
                    "s": b.column("l_suppkey"),
                    "ship_us": b.column("l_shipdate").cast(pa.int64()),
                }
            )
            .group_by(["k", "s"])
            .aggregate([("ship_us", "max")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "s": g.column("s"),
                "ship_us": g.column("ship_us_max"),
                "od_us": pa.array(np.full(g.num_rows, -1, np.int64), pa.int64()),
            }
        )

    orders = _read_pq(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderdate"])

    def order_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "s": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "ship_us": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "od_us": b.column("o_orderdate").cast(pa.int64()),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def blame_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["s"].to_numpy() < 0
        od = b[is_order].set_index("k")["od_us"]
        li_rows = b[~is_order].copy()
        # cross-batch duplicate (k, s) partials: keep the max ship
        li_rows = li_rows.groupby(["k", "s"], sort=False, as_index=False)[
            "ship_us"
        ].max()
        li_rows["od"] = li_rows["k"].map(od)
        li_rows = li_rows[li_rows["od"].notna()]
        li_rows["late"] = li_rows["ship_us"] > li_rows["od"] + _Q21_LATE_US
        per_order = li_rows.groupby("k", sort=False).agg(
            n_supp=("s", "size"), n_late=("late", "sum")
        )
        blamed = per_order[(per_order["n_supp"] >= 2) & (per_order["n_late"] == 1)]
        late_rows = li_rows[li_rows["late"] & li_rows["k"].isin(blamed.index)]
        cnt = late_rows.groupby("s", sort=False).size()
        return pa.table(
            {
                "suppkey": pa.array(cnt.index.to_numpy(), pa.int64()),
                "numwait": pa.array(cnt.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    partials = _bucketed(both, "k", blame_bucket)
    out = _sum_partials(
        partials,
        ["suppkey"],
        ["numwait"],
        pa.schema([("suppkey", pa.int64()), ("numwait", pa.int64())]),
    ).to_pandas()
    if out.empty:
        return pa.schema(
            [("s_name", pa.string()), ("numwait", pa.int64())]
        ).empty_table()
    supp = pa.parquet.read_table(
        _t(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", out["suppkey"].tolist())],
    ).to_pandas()
    out = out.merge(supp, left_on="suppkey", right_on="s_suppkey")
    out = out.sort_values(["numwait", "s_name"], ascending=[False, True])
    return pa.table(
        {
            "s_name": pa.array(out["s_name"], pa.string()),
            "numwait": pa.array(out["numwait"].to_numpy(), pa.int64()),
        }
    )


SQL_TPCH_Q21 = """
WITH ls AS (SELECT l_orderkey AS k, l_suppkey AS s, max(l_shipdate) AS md
            FROM lineitem GROUP BY 1, 2),
     j AS (SELECT ls.k, ls.s,
                  (ls.md > o.o_orderdate + INTERVAL 60 DAY) AS late
           FROM ls JOIN orders o ON ls.k = o.o_orderkey),
     g AS (SELECT k FROM j GROUP BY k
           HAVING count(*) >= 2
              AND sum(CASE WHEN late THEN 1 ELSE 0 END) = 1)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM j JOIN g USING (k) JOIN supplier ON s_suppkey = j.s
WHERE j.late GROUP BY s_name ORDER BY numwait DESC, s_name
"""


# --------------------------------------------------------------------------
# TPC-H Q7-shaped bi-nation trade volume: revenue shipped between two
# nations by (supplier nation, customer nation, year).  The supplier
# side is a filtered broadcast (suppkeys of 2-of-25 nations — the
# documented dimension-broadcast bound, same as tpch_q5; the
# reduce-side alternative is a third exchange on suppkey, the tpch_q9
# shape).  The order→customer attribution runs reduce-side twice:
# lineitem collapses per batch to (orderkey, supp_nation, year, Σrev),
# exchange A on orderkey joins orders' custkey, exchange B on custkey
# joins the nation-filtered customer rows — each exchange carries only
# combiner output, and the final merge is O(2 × 2 × years).
# --------------------------------------------------------------------------

_Q7_NATIONS = ("NATION_3", "NATION_7")

# broadcast cap for the q7/q8 size gate (override with
# GRAFT_JOIN_BROADCAST_MAX; 0 forces the reduce-side exchanges)
_JOIN_BROADCAST_MAX = 64 << 20

_Q7_PARTIAL_SCHEMA = pa.schema(
    [
        ("supp_nation", pa.string()),
        ("cust_nation", pa.string()),
        ("l_year", pa.int64()),
        ("revenue", pa.int64()),  # exact ×10⁴ money units (see _money_i4)
    ]
)


def _q7_merge_fn(df: pd.DataFrame) -> pa.Table:
    g = df.groupby(
        ["supp_nation", "cust_nation", "l_year"], sort=False, as_index=False
    )["revenue"].sum()
    return pa.table(
        {
            "supp_nation": pa.array(g["supp_nation"], pa.string()),
            "cust_nation": pa.array(g["cust_nation"], pa.string()),
            "l_year": pa.array(g["l_year"].to_numpy(), pa.int64()),
            "revenue": pa.array(_i4_to_money(g["revenue"].to_numpy()), pa.float64()),
        }
    )


def q_tpch_q7(sf_dir: str):
    import pyarrow.dataset as pads

    nation = pa.parquet.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    )
    nmap = dict(
        zip(
            nation.column("n_nationkey").to_pylist(),
            nation.column("n_name").to_pylist(),
        )
    )
    nkeys = [k for k, v in nmap.items() if v in _Q7_NATIONS]

    supp = pa.parquet.read_table(
        _t(sf_dir, "supplier"),
        columns=["s_suppkey", "s_nationkey"],
        filters=[("s_nationkey", "in", nkeys)],
    )
    smap = dict(
        zip(
            supp.column("s_suppkey").to_pylist(),
            (nmap[k] for k in supp.column("s_nationkey").to_pylist()),
        )
    )
    sref = ray.put(smap)

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    # SIZE GATE (the q18 pattern): both join sides are slim two-column
    # projections that measure in the low MB at bench scale — under the
    # cap they broadcast and the whole query is ONE lineitem pass plus
    # a tiny merge; above it (a real lake) the reduce-side double
    # exchange below runs instead.  GRAFT_JOIN_BROADCAST_MAX=0 forces
    # the exchange path (tests pin it against the same oracle).
    cap = int(os.environ.get("GRAFT_JOIN_BROADCAST_MAX", _JOIN_BROADCAST_MAX))
    orders_slim = _read_pq(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).materialize()
    cust_slim = _read_pq(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_nationkey"],
        filter=pads.field("c_nationkey").isin(nkeys),
    ).materialize()
    if (orders_slim.size_bytes() or 0) <= cap and (
        cust_slim.size_bytes() or 0
    ) <= cap:
        ot = _to_table_s(
            orders_slim,
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        )
        ct = _to_table_s(
            cust_slim,
            pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
        )
        o_ser = pd.Series(
            ot.column("o_custkey").to_numpy(zero_copy_only=False),
            index=ot.column("o_orderkey").to_numpy(zero_copy_only=False),
        )
        c_ser = pd.Series(
            [nmap[k] for k in ct.column("c_nationkey").to_pylist()],
            index=ct.column("c_custkey").to_numpy(zero_copy_only=False),
        )
        oref, cref = ray.put(o_ser), ray.put(c_ser)

        def li_map(b: pa.Table) -> pa.Table:
            sn = pd.Series(
                b.column("l_suppkey").to_numpy(zero_copy_only=False)
            ).map(ray.get(sref))
            keep = sn.notna().to_numpy()
            f = b.filter(pa.array(keep))
            cust = (
                pd.Series(f.column("l_orderkey").to_numpy(zero_copy_only=False))
                .map(ray.get(oref))
                .to_numpy()
            )
            c_nat = pd.Series(cust).map(ray.get(cref))
            ok = c_nat.notna().to_numpy()
            s_nat = sn[keep].to_numpy()[ok]
            m = s_nat != c_nat[ok].to_numpy()
            f2 = f.filter(pa.array(ok))
            rev = (
                _money_i4(f2.column("l_extendedprice"), f2.column("l_discount"))
                .to_numpy(zero_copy_only=False)[m]
            )
            g = (
                pd.DataFrame(
                    {
                        "supp_nation": s_nat[m],
                        "cust_nation": c_nat[ok].to_numpy()[m],
                        "l_year": pc.year(f2.column("l_shipdate"))
                        .to_numpy(zero_copy_only=False)[m],
                        "revenue": rev,
                    }
                )
                .groupby(
                    ["supp_nation", "cust_nation", "l_year"],
                    sort=False,
                    as_index=False,
                )["revenue"]
                .sum()
            )
            return pa.table(
                {
                    "supp_nation": pa.array(g["supp_nation"], pa.string()),
                    "cust_nation": pa.array(g["cust_nation"], pa.string()),
                    "l_year": pa.array(g["l_year"].to_numpy(), pa.int64()),
                    "revenue": pa.array(
                        g["revenue"].to_numpy().astype(np.int64), pa.int64()
                    ),
                }
            )

        out = _merge_partials(
            li.map_batches(li_map, batch_format="pyarrow", zero_copy_batch=True),
            "supp_nation",
            _q7_merge_fn,
            input_schema=_Q7_PARTIAL_SCHEMA,
        )
        return out.sort_by(
            [
                ("supp_nation", "ascending"),
                ("cust_nation", "ascending"),
                ("l_year", "ascending"),
            ]
        )

    def li_partial(b: pa.Table) -> pa.Table:
        sn = pd.Series(b.column("l_suppkey").to_numpy(zero_copy_only=False)).map(
            ray.get(sref)
        )
        keep = sn.notna().to_numpy()
        f = b.filter(pa.array(keep))
        g = (
            pa.table(
                {
                    "k": f.column("l_orderkey"),
                    "s_nat": pa.array(sn[keep].to_numpy(), pa.string()),
                    "year": pc.year(f.column("l_shipdate")),
                    "rev": _money_i4(
                        f.column("l_extendedprice"), f.column("l_discount")
                    ),
                }
            )
            .group_by(["k", "s_nat", "year"])
            .aggregate([("rev", "sum")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "s_nat": g.column("s_nat"),
                "year": g.column("year"),
                "rev": g.column("rev_sum"),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "s_nat": pa.array([""] * b.num_rows, pa.string()),
                "year": b.column("o_custkey"),  # custkey rides the year slot
                "rev": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders_slim.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_a(b: pd.DataFrame) -> pa.Table:
        is_order = b["s_nat"].to_numpy() == ""
        cust = b[is_order].set_index("k")["year"].rename("custkey")
        m = b[~is_order].merge(cust, left_on="k", right_index=True, how="inner")
        g = m.groupby(["custkey", "s_nat", "year"], sort=False, as_index=False)[
            "rev"
        ].sum()
        return pa.table(
            {
                "custkey": pa.array(g["custkey"].to_numpy(), pa.int64()),
                "s_nat": pa.array(g["s_nat"], pa.string()),
                "year": pa.array(g["year"].to_numpy(), pa.int64()),
                "rev": pa.array(g["rev"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    stage_a = _bucketed(both, "k", bucket_a)

    def cust_rows(b: pa.Table) -> pa.Table:
        cn = pd.Series(b.column("c_nationkey").to_pylist()).map(nmap)
        return pa.table(
            {
                "custkey": b.column("c_custkey"),
                "s_nat": pa.array([""] * b.num_rows, pa.string()),
                "year": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "rev": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "c_nat": pa.array(cn.to_numpy(), pa.string()),
            }
        )

    def tag_li(b: pa.Table) -> pa.Table:
        return b.append_column("c_nat", pa.array([""] * b.num_rows, pa.string()))

    both_b = stage_a.map_batches(tag_li, batch_format="pyarrow").union(
        cust_slim.map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_b(b: pd.DataFrame) -> pa.Table:
        is_cust = b["c_nat"].to_numpy() != ""
        cn = b[is_cust].set_index("custkey")["c_nat"]
        m = b[~is_cust].merge(cn, left_on="custkey", right_index=True, how="inner")
        m = m[m["s_nat"] != m["c_nat_y"]]  # cross-nation flows only
        g = m.groupby(["s_nat", "c_nat_y", "year"], sort=False, as_index=False)[
            "rev"
        ].sum()
        return pa.table(
            {
                "supp_nation": pa.array(g["s_nat"], pa.string()),
                "cust_nation": pa.array(g["c_nat_y"], pa.string()),
                "l_year": pa.array(g["year"].to_numpy(), pa.int64()),
                "revenue": pa.array(g["rev"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    partials = _bucketed(both_b, "custkey", bucket_b)

    out = _merge_partials(
        partials,
        "supp_nation",
        _q7_merge_fn,
        input_schema=_Q7_PARTIAL_SCHEMA,
    )
    return out.sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"), ("l_year", "ascending")]
    )


SQL_TPCH_Q7 = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_sql_i4_money(f'sum({_sql_rev_i4()})')} AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name IN ('{_Q7_NATIONS[0]}', '{_Q7_NATIONS[1]}')
  AND cn.n_name IN ('{_Q7_NATIONS[0]}', '{_Q7_NATIONS[1]}')
  AND sn.n_name <> cn.n_name
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# TPC-H Q16-shaped supplier-diversity count: distinct suppliers per
# (brand, type, size) over a filtered part family, from observed
# lineitem supply pairs.  Two bucketed exchanges, both over combiner
# output: exchange A on partkey dedups (partkey, suppkey) pairs and
# attaches part attributes reduce-side (part rows union-tagged, never
# broadcast — part scales with the lake); exchange B re-dedups
# (brand, type, size, suppkey) across parts — a supplier serving many
# parts of one group must count once — then counts.  No count-distinct
# ever materializes a group in one task.
# --------------------------------------------------------------------------

_Q16_EXCL_BRAND = "Brand#5"
_Q16_SIZES = (1, 4, 7, 10, 13, 16, 19, 22)


def _q16_count_bucket(b: pd.DataFrame) -> pa.Table:
    """Per-gkey-bucket distinct-supplier count (all rows of a group
    land in one bucket, so the cross-batch dedup here is exact)."""
    u = b.drop_duplicates(subset=["brand", "ptype", "size", "s"])
    g = (
        u.groupby(["brand", "ptype", "size"], sort=False)
        .size()
        .reset_index(name="supplier_cnt")
    )
    return pa.table(
        {
            "p_brand": pa.array(g["brand"], pa.string()),
            "p_type": pa.array(g["ptype"], pa.string()),
            "p_size": pa.array(g["size"].to_numpy().astype(np.int32), pa.int32()),
            "supplier_cnt": pa.array(
                g["supplier_cnt"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


def q_tpch_q16(sf_dir: str):
    import pyarrow.dataset as pads

    part = _read_pq(
        _t(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=(pads.field("p_brand") != _Q16_EXCL_BRAND)
        & (pads.field("p_size").isin(list(_Q16_SIZES))),
    )

    def part_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("p_partkey"),
                "s": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "brand": b.column("p_brand"),
                "ptype": b.column("p_type"),
                "size": b.column("p_size").cast(pa.int32()),
            }
        )

    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        t = (
            pa.table({"k": b.column("l_partkey"), "s": b.column("l_suppkey")})
            .group_by(["k", "s"])
            .aggregate([])
        )
        n = t.num_rows
        return pa.table(
            {
                "k": t.column("k"),
                "s": t.column("s"),
                "brand": pa.array([""] * n, pa.string()),
                "ptype": pa.array([""] * n, pa.string()),
                "size": pa.array(np.zeros(n, np.int32), pa.int32()),
            }
        )

    # SIZE GATE (the q3/q7/q8 pattern): the filtered part family is
    # ~13% of part; under the cap its partkey→(brand,type,size) map
    # broadcasts and the query is ONE lineitem pass (keyset filter +
    # map-side attribute attach on deduped pairs) feeding the single
    # group-dedup exchange — exchange A (partkey attach) disappears.
    # Above the cap, the two-exchange reduce-side path below runs.
    # GRAFT_JOIN_BROADCAST_MAX=0 forces that path (pinned by test).
    cap = int(os.environ.get("GRAFT_JOIN_BROADCAST_MAX", _JOIN_BROADCAST_MAX))
    part_mat = part.materialize()
    if (part_mat.size_bytes() or 0) <= cap:
        import zlib

        pt = _to_table_s(
            part_mat,
            pa.schema(
                [
                    ("p_partkey", pa.int64()),
                    ("p_brand", pa.string()),
                    ("p_type", pa.string()),
                    ("p_size", pa.int32()),
                ]
            ),
        )
        attrs = pd.DataFrame(
            {
                "brand": pt.column("p_brand").to_numpy(zero_copy_only=False),
                "ptype": pt.column("p_type").to_numpy(zero_copy_only=False),
                "size": pt.column("p_size")
                .to_numpy(zero_copy_only=False)
                .astype(np.int32),
            },
            index=pt.column("p_partkey").to_numpy(zero_copy_only=False),
        )
        kref = ray.put(pt.column("p_partkey").combine_chunks())
        aref = ray.put(attrs)

        def pair_bcast(b: pa.Table) -> pa.Table:
            f = b.filter(pc.is_in(b.column("l_partkey"), value_set=ray.get(kref)))
            t = (
                pa.table({"k": f.column("l_partkey"), "s": f.column("l_suppkey")})
                .group_by(["k", "s"])
                .aggregate([])
            )
            a = ray.get(aref).loc[t.column("k").to_numpy(zero_copy_only=False)]
            df = pd.DataFrame(
                {
                    "brand": a["brand"].to_numpy(),
                    "ptype": a["ptype"].to_numpy(),
                    "size": a["size"].to_numpy(),
                    "s": t.column("s").to_numpy(zero_copy_only=False),
                }
            ).drop_duplicates()
            gk = [
                zlib.crc32(f"{br}|{ty}|{sz}".encode())
                for br, ty, sz in zip(df["brand"], df["ptype"], df["size"])
            ]
            return pa.table(
                {
                    "brand": pa.array(df["brand"], pa.string()),
                    "ptype": pa.array(df["ptype"], pa.string()),
                    "size": pa.array(df["size"].to_numpy().astype(np.int32), pa.int32()),
                    "s": pa.array(df["s"].to_numpy(), pa.int64()),
                    "gkey": pa.array(gk, pa.int64()),
                }
            )

        out = _merge_partials(
            li.map_batches(pair_bcast, batch_format="pyarrow", zero_copy_batch=True),
            "gkey",
            lambda df: _q16_count_bucket(df),
            input_schema=pa.schema(
                [
                    ("brand", pa.string()),
                    ("ptype", pa.string()),
                    ("size", pa.int32()),
                    ("s", pa.int64()),
                    ("gkey", pa.int64()),
                ]
            ),
        )
        return out.sort_by(
            [
                ("supplier_cnt", "descending"),
                ("p_brand", "ascending"),
                ("p_type", "ascending"),
                ("p_size", "ascending"),
            ]
        )

    both = li.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        part_mat.map_batches(part_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach_bucket(b: pd.DataFrame) -> pa.Table:
        is_part = b["s"].to_numpy() < 0
        attrs = b[is_part].set_index("k")[["brand", "ptype", "size"]]
        pairs = b[~is_part][["k", "s"]].drop_duplicates()
        m = pairs.merge(attrs, left_on="k", right_index=True, how="inner")
        m = m[["brand", "ptype", "size", "s"]].drop_duplicates()
        return pa.table(
            {
                "brand": pa.array(m["brand"], pa.string()),
                "ptype": pa.array(m["ptype"], pa.string()),
                "size": pa.array(m["size"].to_numpy().astype(np.int32), pa.int32()),
                "s": pa.array(m["s"].to_numpy(), pa.int64()),
            }
        )

    tagged = _bucketed(both, "k", attach_bucket)

    def add_gkey(b: pa.Table) -> pa.Table:
        import zlib

        gk = [
            zlib.crc32(f"{br}|{ty}|{sz}".encode())
            for br, ty, sz in zip(
                b.column("brand").to_pylist(),
                b.column("ptype").to_pylist(),
                b.column("size").to_pylist(),
            )
        ]
        return b.append_column("gkey", pa.array(gk, pa.int64()))

    out = _merge_partials(
        tagged.map_batches(add_gkey, batch_format="pyarrow"),
        "gkey",
        lambda df: _q16_count_bucket(df),
        input_schema=pa.schema(
            [
                ("brand", pa.string()),
                ("ptype", pa.string()),
                ("size", pa.int32()),
                ("s", pa.int64()),
                ("gkey", pa.int64()),
            ]
        ),
    )
    return out.sort_by(
        [
            ("supplier_cnt", "descending"),
            ("p_brand", "ascending"),
            ("p_type", "ascending"),
            ("p_size", "ascending"),
        ]
    )


SQL_TPCH_Q16 = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> '{_Q16_EXCL_BRAND}'
  AND p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# TPC-H Q2-shaped cheapest-supplier-per-part: among the suppliers
# observed (via lineitem) for each part of one size, the one with the
# minimum account balance (suppkey-ascending tie-break).  The size
# keyset broadcasts (selective); the supplier-attribute attach runs
# reduce-side on suppkey (supplier scales with the lake), and the
# per-part argmin runs reduce-side on partkey — both exchanges carry
# only deduped (part, supp) combiner pairs.
# --------------------------------------------------------------------------

_Q2_SIZE = 10


def q_tpch_q2(sf_dir: str):
    part = pa.parquet.read_table(
        _t(sf_dir, "part"),
        columns=["p_partkey", "p_size"],
        filters=[("p_size", "=", _Q2_SIZE)],
    )
    keys = part.column("p_partkey").combine_chunks()
    kref = ray.put(keys)

    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b.column("l_partkey"), value_set=ray.get(kref)))
        t = (
            pa.table({"p": f.column("l_partkey"), "k": f.column("l_suppkey")})
            .group_by(["p", "k"])
            .aggregate([])
        )
        return pa.table(
            {
                "p": t.column("p"),
                "k": t.column("k"),
                "bal": pa.array(np.full(t.num_rows, np.nan), pa.float64()),
                "name": pa.array([""] * t.num_rows, pa.string()),
            }
        )

    supp = _read_pq(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name", "s_acctbal"])

    def supp_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "k": b.column("s_suppkey"),
                "bal": b.column("s_acctbal"),
                "name": b.column("s_name"),
            }
        )

    both = li.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        supp.map_batches(supp_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def attach_bucket(b: pd.DataFrame) -> pa.Table:
        is_supp = b["p"].to_numpy() < 0
        attrs = b[is_supp].set_index("k")[["bal", "name"]]
        pairs = b[~is_supp][["p", "k"]].drop_duplicates()
        m = pairs.merge(attrs, left_on="k", right_index=True, how="inner")
        return pa.table(
            {
                "p": pa.array(m["p"].to_numpy(), pa.int64()),
                "k": pa.array(m["k"].to_numpy(), pa.int64()),
                "bal": pa.array(m["bal"].to_numpy(), pa.float64()),
                "name": pa.array(m["name"], pa.string()),
            }
        )

    tagged = _bucketed(both, "k", attach_bucket)

    def argmin_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.drop_duplicates(subset=["p", "k"])
        b = b.sort_values(["p", "bal", "k"], kind="mergesort")
        first = b.groupby("p", sort=False).head(1)
        return pa.table(
            {
                "p_partkey": pa.array(first["p"].to_numpy(), pa.int64()),
                "s_suppkey": pa.array(first["k"].to_numpy(), pa.int64()),
                "s_name": pa.array(first["name"], pa.string()),
                "s_acctbal": pa.array(first["bal"].to_numpy(), pa.float64()),
            }
        )

    def argmin_merge(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["p", "bal", "k"], kind="mergesort")
        first = df.groupby("p", sort=False).head(1)
        return pa.table(
            {
                "p_partkey": pa.array(first["p"].to_numpy(), pa.int64()),
                "s_suppkey": pa.array(first["k"].to_numpy(), pa.int64()),
                "s_name": pa.array(first["name"], pa.string()),
                "s_acctbal": pa.array(first["bal"].to_numpy(), pa.float64()),
            }
        )

    out = _merge_partials(
        tagged,
        "p",
        argmin_merge,
        input_schema=pa.schema(
            [
                ("p", pa.int64()),
                ("k", pa.int64()),
                ("bal", pa.float64()),
                ("name", pa.string()),
            ]
        ),
    )
    return out.sort_by("p_partkey")


SQL_TPCH_Q2 = f"""
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS k
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_size = {_Q2_SIZE}),
     j AS (SELECT p, k, s_acctbal, s_name
           FROM ps JOIN supplier ON s_suppkey = k),
     r AS (SELECT p, k, s_acctbal, s_name,
                  row_number() OVER (PARTITION BY p
                                     ORDER BY s_acctbal, k) AS rn
           FROM j)
SELECT p AS p_partkey, k AS s_suppkey, s_name, s_acctbal
FROM r WHERE rn = 1 ORDER BY p_partkey
"""


# --------------------------------------------------------------------------
# TPC-H Q8-shaped market share: one supplier nation's share of the
# revenue flowing to one region's customers, by order year.  The
# target-nation suppkey set broadcasts (1-of-25 — documented bound,
# reduce-side suppkey exchange as the named fallback, the tpch_q9
# shape); lineitem collapses per batch to (orderkey, Σrev, Σrev_target)
# and joins the date-filtered orders reduce-side on orderkey, then the
# region-filtered customer semi-join runs reduce-side on custkey.  The
# final merge is O(years); share = target / total per year.
# --------------------------------------------------------------------------

_Q8_REGION = "EUROPE"

_Q8_PARTIAL_SCHEMA = pa.schema(
    # exact ×10⁴ money units (see _money_i4) — the share ratio is then
    # ONE float division of two exact ints on both engines
    [("o_year", pa.int64()), ("rev", pa.int64()), ("rev_t", pa.int64())]
)


def _q8_merge_fn(df: pd.DataFrame) -> pa.Table:
    g = df.groupby("o_year", sort=False, as_index=False)[["rev", "rev_t"]].sum()
    g = g.sort_values("o_year")
    share = np.round(
        g["rev_t"].to_numpy().astype(np.float64)
        / g["rev"].to_numpy().astype(np.float64),
        6,
    )
    return pa.table(
        {
            "o_year": pa.array(g["o_year"].to_numpy(), pa.int64()),
            "mkt_share": pa.array(share, pa.float64()),
        }
    )


def q_tpch_q8(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    nation = pa.parquet.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    region = pa.parquet.read_table(
        _t(sf_dir, "region"), columns=["r_regionkey", "r_name"]
    ).to_pandas()
    q8_schema = pa.schema([("o_year", pa.int64()), ("mkt_share", pa.float64())])
    sel = region.loc[region["r_name"] == _Q8_REGION, "r_regionkey"]
    if not len(sel):  # empty region table → no target region exists
        return q8_schema.empty_table()
    rkey = int(sel.iloc[0])
    region_nkeys = nation.loc[nation["n_regionkey"] == rkey, "n_nationkey"].tolist()
    # target = the region's lowest-numbered nation (deterministic)
    target_nk = min(region_nkeys)

    supp = pa.parquet.read_table(
        _t(sf_dir, "supplier"),
        columns=["s_suppkey"],
        filters=[("s_nationkey", "=", target_nk)],
    )
    tkeys = supp.column("s_suppkey").combine_chunks()
    tref = ray.put(tkeys)

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    lo, hi = _dt.datetime(1995, 1, 1), _dt.datetime(1997, 1, 1)
    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    ).materialize()
    cust_slim = _read_pq(
        _t(sf_dir, "customer"),
        columns=["c_custkey"],
        filter=pads.field("c_nationkey").isin(region_nkeys),
    ).materialize()

    # SIZE GATE (the q7/q18 pattern): under the cap the date-filtered
    # orders map and region custkey set broadcast, and the whole query
    # is ONE lineitem pass + an O(years) merge; above it the two
    # reduce-side exchanges below run.  GRAFT_JOIN_BROADCAST_MAX=0
    # forces the exchange path (pinned by test against the oracle).
    cap = int(os.environ.get("GRAFT_JOIN_BROADCAST_MAX", _JOIN_BROADCAST_MAX))
    if (orders.size_bytes() or 0) <= cap and (cust_slim.size_bytes() or 0) <= cap:
        ot = _to_table_s(
            orders,
            pa.schema(
                [
                    ("o_orderkey", pa.int64()),
                    ("o_custkey", pa.int64()),
                    ("o_orderdate", pa.timestamp("us")),
                ]
            ),
        )
        ct = _to_table_s(cust_slim, pa.schema([("c_custkey", pa.int64())]))
        in_region = set(ct.column("c_custkey").to_numpy(zero_copy_only=False))
        ok = pd.Series(ot.column("o_custkey").to_numpy(zero_copy_only=False)).isin(
            in_region
        ).to_numpy()
        o_keys = ot.column("o_orderkey").to_numpy(zero_copy_only=False)[ok]
        o_year = (
            pc.year(ot.column("o_orderdate")).to_numpy(zero_copy_only=False)[ok]
        )
        yref = ray.put(pd.Series(o_year, index=o_keys))

        def li_map(b: pa.Table) -> pa.Table:
            yr = pd.Series(
                b.column("l_orderkey").to_numpy(zero_copy_only=False)
            ).map(ray.get(yref))
            keep = yr.notna().to_numpy()
            f = b.filter(pa.array(keep))
            rev = _money_i4(
                f.column("l_extendedprice"), f.column("l_discount")
            ).to_numpy(zero_copy_only=False)
            is_t = pc.is_in(
                f.column("l_suppkey"), value_set=ray.get(tref)
            ).to_numpy(zero_copy_only=False)
            g = (
                pd.DataFrame(
                    {
                        "o_year": yr[keep].to_numpy().astype(np.int64),
                        "rev": rev,
                        "rev_t": np.where(is_t, rev, 0),
                    }
                )
                .groupby("o_year", sort=False, as_index=False)[["rev", "rev_t"]]
                .sum()
            )
            return pa.table(
                {
                    "o_year": pa.array(g["o_year"].to_numpy(), pa.int64()),
                    "rev": pa.array(g["rev"].to_numpy().astype(np.int64), pa.int64()),
                    "rev_t": pa.array(
                        g["rev_t"].to_numpy().astype(np.int64), pa.int64()
                    ),
                }
            )

        out = _merge_partials(
            li.map_batches(li_map, batch_format="pyarrow", zero_copy_batch=True),
            "o_year",
            _q8_merge_fn,
            input_schema=_Q8_PARTIAL_SCHEMA,
        )
        return out.sort_by("o_year")

    def li_partial(b: pa.Table) -> pa.Table:
        rev = _money_i4(b.column("l_extendedprice"), b.column("l_discount"))
        is_t = pc.is_in(b.column("l_suppkey"), value_set=ray.get(tref))
        rev_t = pc.if_else(is_t, rev, pa.scalar(0, pa.int64()))
        g = (
            pa.table({"k": b.column("l_orderkey"), "rev": rev, "rev_t": rev_t})
            .group_by("k")
            .aggregate([("rev", "sum"), ("rev_t", "sum")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "cust": pa.array(np.full(g.num_rows, -1, np.int64), pa.int64()),
                "year": pa.array(np.full(g.num_rows, -1, np.int64), pa.int64()),
                "rev": g.column("rev_sum"),
                "rev_t": g.column("rev_t_sum"),
            }
        )

    def order_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "cust": b.column("o_custkey"),
                "year": pc.year(b.column("o_orderdate")),
                "rev": pa.array(np.full(b.num_rows, -1, np.int64), pa.int64()),
                "rev_t": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_a(b: pd.DataFrame) -> pa.Table:
        is_order = b["cust"].to_numpy() >= 0
        ords = b[is_order].set_index("k")[["cust", "year"]]
        m = b[~is_order].merge(ords, left_on="k", right_index=True, how="inner")
        g = m.groupby(["cust_y", "year_y"], sort=False, as_index=False)[
            ["rev", "rev_t"]
        ].sum()
        return pa.table(
            {
                "custkey": pa.array(g["cust_y"].to_numpy(), pa.int64()),
                "year": pa.array(g["year_y"].to_numpy(), pa.int64()),
                "rev": pa.array(g["rev"].to_numpy().astype(np.int64), pa.int64()),
                "rev_t": pa.array(g["rev_t"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    stage_a = _bucketed(both, "k", bucket_a)

    def cust_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "custkey": b.column("c_custkey"),
                "year": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "rev": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "rev_t": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    both_b = stage_a.union(
        cust_slim.map_batches(cust_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_b(b: pd.DataFrame) -> pa.Table:
        is_cust = b["year"].to_numpy() < 0
        in_region = set(b.loc[is_cust, "custkey"].to_numpy())
        m = b[~is_cust]
        m = m[m["custkey"].isin(in_region)]
        g = m.groupby("year", sort=False, as_index=False)[["rev", "rev_t"]].sum()
        return pa.table(
            {
                "o_year": pa.array(g["year"].to_numpy(), pa.int64()),
                "rev": pa.array(g["rev"].to_numpy().astype(np.int64), pa.int64()),
                "rev_t": pa.array(g["rev_t"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    partials = _bucketed(both_b, "custkey", bucket_b)

    out = _merge_partials(
        partials,
        "o_year",
        _q8_merge_fn,
        input_schema=_Q8_PARTIAL_SCHEMA,
    )
    return out.sort_by("o_year")


def _q8_sql() -> str:
    return f"""
WITH tn AS (SELECT min(n_nationkey) AS nk FROM nation
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = '{_Q8_REGION}')
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CASE WHEN s_nationkey = (SELECT nk FROM tn)
                      THEN {_sql_rev_i4()} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_sql_rev_i4()}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE r_name = '{_Q8_REGION}'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY o_year ORDER BY o_year
"""


SQL_TPCH_Q8 = _q8_sql()


# --------------------------------------------------------------------------
# TPC-H Q15-shaped top supplier: the supplier(s) with maximum quarter
# revenue.  Per-suppkey revenue partials merge through one bucketed
# exchange where each bucket emits ONLY its max-revenue row(s) (global
# max ≥ every bucket max, so candidates suffice) — the driver sees
# O(buckets) rows, takes the global max, and hydrates the winners via
# a key-pruned supplier point read.  Revenue is rounded to cents
# BEFORE the max compare on both engines, making the argmax set
# deterministic.
# --------------------------------------------------------------------------


def q_tpch_q15(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1996, 4, 1)
    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "k": b.column("l_suppkey"),
                    "rev": _money_i4(
                        b.column("l_extendedprice"), b.column("l_discount")
                    ),
                }
            )
            .group_by("k")
            .aggregate([("rev", "sum")])
        )
        return pa.table({"k": g.column("k"), "rev": g.column("rev_sum")})

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("k", sort=False, as_index=False)["rev"].sum()
        g["rev"] = _i4_to_money(g["rev"].to_numpy())
        mx = g["rev"].max()
        g = g[g["rev"] == mx]
        return pa.table(
            {
                "k": pa.array(g["k"].to_numpy(), pa.int64()),
                "rev": pa.array(g["rev"].to_numpy(), pa.float64()),
            }
        )

    cand = _merge_partials(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "k",
        per_bucket,
        input_schema=pa.schema([("k", pa.int64()), ("rev", pa.int64())]),
    ).to_pandas()
    out_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()), ("total_rev", pa.float64())]
    )
    if cand.empty:
        return out_schema.empty_table()
    mx = cand["rev"].max()
    win = cand[cand["rev"] == mx].sort_values("k")
    supp = pa.parquet.read_table(
        _t(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", win["k"].tolist())],
    ).to_pandas()
    m = win.merge(supp, left_on="k", right_on="s_suppkey").sort_values("k")
    return pa.table(
        {
            "s_suppkey": pa.array(m["k"].to_numpy(), pa.int64()),
            "s_name": pa.array(m["s_name"], pa.string()),
            "total_rev": pa.array(m["rev"].to_numpy(), pa.float64()),
        }
    )


SQL_TPCH_Q15 = f"""
WITH r AS (SELECT l_suppkey AS k,
                  {_sql_i4_money(f'sum({_sql_rev_i4()})')} AS rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
SELECT k AS s_suppkey, s_name, rev AS total_rev
FROM r JOIN supplier ON s_suppkey = k
WHERE rev = (SELECT max(rev) FROM r) ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
# (brand, size-range, quantity-range) branches.  Each branch's part
# predicate compiles to a broadcast keyset (selective — brand is 1-of-25
# and the size band prunes further; the reduce-side partkey join is the
# named fallback); the per-batch kernel is three vectorized masks and
# one masked sum — a scalar combiner, no exchange.
# --------------------------------------------------------------------------

_Q19_BRANCHES = (
    ("Brand#1", 1, 5, 1.0, 11.0),
    ("Brand#2", 1, 10, 10.0, 20.0),
    ("Brand#3", 1, 15, 20.0, 30.0),
)


def q_tpch_q19(sf_dir: str):
    part = pa.parquet.read_table(
        _t(sf_dir, "part"), columns=["p_partkey", "p_brand", "p_size"]
    )
    refs = []
    for brand, slo, shi, _, _ in _Q19_BRANCHES:
        mask = pc.and_(
            pc.equal(part.column("p_brand"), brand),
            pc.and_(
                pc.greater_equal(part.column("p_size"), slo),
                pc.less_equal(part.column("p_size"), shi),
            ),
        )
        refs.append(ray.put(part.filter(mask).column("p_partkey").combine_chunks()))

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        qty = b.column("l_quantity")
        keep = pa.array(np.zeros(b.num_rows, bool))
        for (brand, _, _, qlo, qhi), ref in zip(_Q19_BRANCHES, refs):
            m = pc.and_(
                pc.is_in(b.column("l_partkey"), value_set=ray.get(ref)),
                pc.and_(
                    pc.greater_equal(qty, pa.scalar(qlo)),
                    pc.less_equal(qty, pa.scalar(qhi)),
                ),
            )
            keep = pc.or_(keep, m)
        rev = _money_i4(b.column("l_extendedprice"), b.column("l_discount"))
        total = pc.sum(pc.if_else(keep, rev, pa.scalar(0, pa.int64()))).as_py() or 0
        n = int(pc.sum(keep.cast(pa.int64())).as_py() or 0)
        return pa.table(
            {
                "rev": pa.array([total], pa.int64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    t = _to_table(li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
    n = int(pc.sum(t.column("n")).as_py() or 0) if t.num_rows else 0
    if n == 0:
        return pa.table({"revenue": pa.array([None], pa.float64())})
    total = int(pc.sum(t.column("rev")).as_py() or 0)
    return pa.table(
        {"revenue": pa.array([float(_i4_to_money(total))], pa.float64())}
    )


def _q19_sql() -> str:
    branches = []
    for brand, slo, shi, qlo, qhi in _Q19_BRANCHES:
        branches.append(
            f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi}"
            f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        )
    return f"""
SELECT {_sql_i4_money(f'sum({_sql_rev_i4()})')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {" OR ".join(branches)}
"""


SQL_TPCH_Q19 = _q19_sql()


# --------------------------------------------------------------------------
# TPC-H Q20-shaped heavy-supplier semi-join: suppliers whose shipped
# quantity of one part family in one year exceeds 2× the per-supplier
# mean.  The same materialized per-suppkey partial stream feeds two
# merges: a scalar (Σqty, n-suppliers) pass that fixes the threshold
# (integer quantities ⇒ exact at any summation order), then a
# filter-in-bucket pass so only qualifying suppliers reach the driver.
# Names hydrate via a key-pruned point read.
# --------------------------------------------------------------------------


def q_tpch_q20(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    part = pa.parquet.read_table(_t(sf_dir, "part"), columns=["p_partkey", "p_name"])
    keys = (
        part.filter(pc.starts_with(part.column("p_name"), _Q9_NAME_PREFIX))
        .column("p_partkey")
        .combine_chunks()
    )
    kref = ray.put(keys)

    lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)
    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_in(b.column("l_partkey"), value_set=ray.get(kref)))
        g = (
            pa.table({"k": f.column("l_suppkey"), "qty": f.column("l_quantity")})
            .group_by("k")
            .aggregate([("qty", "sum")])
        )
        return pa.table({"k": g.column("k"), "qty": g.column("qty_sum")})

    partials = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def scalar_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("k", sort=False, as_index=False)["qty"].sum()
        return pa.table(
            {
                "s": pa.array([float(g["qty"].sum())], pa.float64()),
                "n": pa.array([len(g)], pa.int64()),
            }
        )

    stats = _merge_partials(
        partials,
        "k",
        scalar_bucket,
        input_schema=pa.schema([("k", pa.int64()), ("qty", pa.float64())]),
    ).to_pandas()
    s, n = float(stats["s"].sum()), int(stats["n"].sum())
    out_schema = pa.schema(
        [("s_suppkey", pa.int64()), ("s_name", pa.string()), ("qty", pa.float64())]
    )
    if n == 0:
        return out_schema.empty_table()
    thr = 2.0 * (s / n)

    def filter_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("k", sort=False, as_index=False)["qty"].sum()
        g = g[g["qty"] > thr]
        return pa.table(
            {
                "k": pa.array(g["k"].to_numpy(), pa.int64()),
                "qty": pa.array(g["qty"].to_numpy(), pa.float64()),
            }
        )

    heavy = _merge_partials(
        partials,
        "k",
        filter_bucket,
        input_schema=pa.schema([("k", pa.int64()), ("qty", pa.float64())]),
    ).to_pandas()
    if heavy.empty:
        return out_schema.empty_table()
    supp = pa.parquet.read_table(
        _t(sf_dir, "supplier"),
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", heavy["k"].tolist())],
    ).to_pandas()
    m = heavy.merge(supp, left_on="k", right_on="s_suppkey").sort_values("k")
    return pa.table(
        {
            "s_suppkey": pa.array(m["k"].to_numpy(), pa.int64()),
            "s_name": pa.array(m["s_name"], pa.string()),
            "qty": pa.array(m["qty"].to_numpy(), pa.float64()),
        }
    )


SQL_TPCH_Q20 = f"""
WITH sq AS (SELECT l_suppkey AS k, sum(l_quantity) AS qty
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE '{_Q9_NAME_PREFIX}%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey)
SELECT k AS s_suppkey, s_name, qty
FROM sq JOIN supplier ON s_suppkey = k
WHERE qty > (SELECT 2.0 * (sum(qty) / count(*)) FROM sq)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Prefix-duplicate rate per source — the "which crawl is dirtiest"
# boilerplate diagnostic: a document is a prefix-dup if its first
# _PREFIX_LEN characters match another document's (the cheap
# template/boilerplate detector).  Per-batch (fp64, source, n)
# combiner partials take ONE fp-bucketed exchange (every copy of a
# prefix lands in one bucket), where the >1-copy test and the
# per-source fold both run.  Text never crosses; the 64-bit prefix
# fingerprint rides the dedup_exact GROUP-BY-equivalence contract.
# --------------------------------------------------------------------------


_PREFIX_LEN = 40


def q_dup_rate_by_source(sf_dir: str):
    from ..functions.textstats import fingerprint_exact

    ds = _read_pq(_t(sf_dir, "documents"), columns=["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text").to_pylist()
        fps = np.fromiter(
            (fingerprint_exact((t or "")[:_PREFIX_LEN]) for t in txt),
            dtype=np.int64,
            count=len(txt),
        )
        g = (
            pd.DataFrame({"fp64": fps, "source": batch.column("source").to_pandas()})
            .groupby(["fp64", "source"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "fp64": pa.array(g["fp64"].to_numpy(), pa.int64()),
                "source": pa.array(g["source"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["fp64", "source"], sort=False, as_index=False)["n"].sum()
        totals = g.groupby("fp64", sort=False)["n"].sum()
        dup_fps = set(totals[totals > 1].index)
        g["is_dup"] = g["fp64"].isin(dup_fps)
        s = g.groupby("source", sort=False).agg(
            n_docs=("n", "sum"),
            n_dup=("n", lambda x: int(x[g.loc[x.index, "is_dup"]].sum())),
        )
        return pa.table(
            {
                "source": pa.array(s.index.to_numpy(), pa.string()),
                "n_docs": pa.array(s["n_docs"].to_numpy().astype(np.int64), pa.int64()),
                "n_dup": pa.array(s["n_dup"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    # the bucketed merge already returns O(sources × buckets) rows —
    # the final per-source fold is a tiny driver-side sum
    out = (
        _merge_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            "fp64",
            per_bucket,
            input_schema=pa.schema(
                [("fp64", pa.int64()), ("source", pa.string()), ("n", pa.int64())]
            ),
        )
        .to_pandas()
        .groupby("source", as_index=False)[["n_docs", "n_dup"]]
        .sum()
        .sort_values("source")
    )
    rate = np.round(
        out["n_dup"].to_numpy().astype(np.float64)
        / out["n_docs"].to_numpy().astype(np.float64),
        6,
    )
    return pa.table(
        {
            "source": pa.array(out["source"], pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy(), pa.int64()),
            "n_dup": pa.array(out["n_dup"].to_numpy(), pa.int64()),
            "dup_rate": pa.array(rate, pa.float64()),
        }
    )


SQL_DUP_RATE_BY_SOURCE = f"""
WITH d AS (SELECT source,
                  count(*) OVER (PARTITION BY substr(text, 1, {_PREFIX_LEN})) AS c
           FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(sum(CASE WHEN c > 1 THEN 1.0 ELSE 0.0 END) / count(*), 6) AS dup_rate
FROM d GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Zipf slope of the vocabulary: ln-cnt vs ln-rank regression over the
# top-K words — the one-number "is this corpus natural language"
# check.  Vocabulary counts are the q_vocab_topk combiner exchange;
# the regression runs driver-side over exactly K rows with the
# closed-form sums written identically in both engines (regr_slope's
# streaming accumulator deliberately unused).
# --------------------------------------------------------------------------

_ZIPF_TOPK = 200


def q_zipf_slope(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
        )
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    uni = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["word"],
        sum_cols=["cnt"],
        schema=pa.schema([("word", pa.string()), ("cnt", pa.int64())]),
    ).to_pandas()
    if uni.empty:
        return pa.table(
            {
                "zipf_slope": pa.array([None], pa.float64()),
                "n_ranks": pa.array([0], pa.int64()),
            }
        )
    uni = uni.sort_values(["cnt", "word"], ascending=[False, True]).head(_ZIPF_TOPK)
    n = len(uni)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(uni["cnt"].to_numpy(dtype=np.float64))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    return pa.table(
        {
            "zipf_slope": pa.array([slope], pa.float64()),
            "n_ranks": pa.array([n], pa.int64()),
        }
    )


SQL_ZIPF_SLOPE = f"""
WITH u AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
             SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
             FROM documents) WHERE word <> ''
           GROUP BY word),
     r AS (SELECT row_number() OVER (ORDER BY cnt DESC, word) AS rank, cnt
           FROM u ORDER BY cnt DESC, word LIMIT {_ZIPF_TOPK}),
     s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                  sum(ln(rank)) AS sx, sum(ln(cnt)) AS sy,
                  sum(ln(rank) * ln(cnt)) AS sxy,
                  sum(ln(rank) * ln(rank)) AS sxx,
                  CAST(count(*) AS BIGINT) AS n_ranks
           FROM r)
SELECT round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       n_ranks
FROM s
"""


# --------------------------------------------------------------------------
# Cross-source duplicate overlap: for every source pair, how many
# distinct _PREFIX_LEN-char prefixes appear in BOTH — the
# contamination matrix between crawls (prefix key, as above).
# Distinct (fp, source) pairs take the fp-bucketed exchange;
# the per-fp pair expansion is bounded by the source count (≤ sources²
# rows per fp), and the final merge is O(source-pairs).
# --------------------------------------------------------------------------


def q_source_overlap(sf_dir: str):
    from ..functions.textstats import fingerprint_exact

    ds = _read_pq(_t(sf_dir, "documents"), columns=["text", "source"])

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch.column("text").to_pylist()
        fps = np.fromiter(
            (fingerprint_exact((t or "")[:_PREFIX_LEN]) for t in txt),
            dtype=np.int64,
            count=len(txt),
        )
        g = pd.DataFrame(
            {"fp64": fps, "source": batch.column("source").to_pandas()}
        ).drop_duplicates()
        return pa.table(
            {
                "fp64": pa.array(g["fp64"].to_numpy(), pa.int64()),
                "source": pa.array(g["source"], pa.string()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        u = b.drop_duplicates()
        m = u.merge(u, on="fp64")
        m = m[m["source_x"] < m["source_y"]]
        g = m.groupby(["source_x", "source_y"], sort=False).size()
        gi = g.reset_index(name="n_shared")
        return pa.table(
            {
                "s1": pa.array(gi["source_x"], pa.string()),
                "s2": pa.array(gi["source_y"], pa.string()),
                "n_shared": pa.array(
                    gi["n_shared"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    pairs = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "fp64",
        per_bucket,
        input_schema=pa.schema([("fp64", pa.int64()), ("source", pa.string())]),
    )
    # a source pair spans many fp buckets — one final tiny sum
    # (O(source-pairs) rows) folds the per-bucket partials
    df = (
        pairs.to_pandas()
        .groupby(["s1", "s2"], as_index=False)["n_shared"]
        .sum()
        .sort_values(["s1", "s2"])
    )
    return pa.table(
        {
            "s1": pa.array(df["s1"], pa.string()),
            "s2": pa.array(df["s2"], pa.string()),
            "n_shared": pa.array(df["n_shared"].to_numpy(), pa.int64()),
        }
    )


SQL_SOURCE_OVERLAP = f"""
WITH ds AS (SELECT DISTINCT substr(text, 1, {_PREFIX_LEN}) AS p, source
            FROM documents)
SELECT a.source AS s1, b.source AS s2, CAST(count(*) AS BIGINT) AS n_shared
FROM ds a JOIN ds b ON a.p = b.p AND a.source < b.source
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# TPC-H Q11-shaped important stock: parts whose shipped value exceeds
# a multiple of the mean per-part shipped value (partsupp is absent
# from the lake, so value derives from lineitem price × quantity —
# same plan shape: grouped sum, scalar subquery threshold, filtered
# output).
# Exact integer cents make the threshold summation-order-proof; the
# same materialized per-partkey partial stream feeds the scalar pass
# and the in-bucket filter pass, so only qualifying parts reach the
# driver (the q20 two-merge pattern).
# --------------------------------------------------------------------------

_Q11_FACTOR = 1.5  # keep parts above 1.5× the mean per-part value


def q_tpch_q11(sf_dir: str):
    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_quantity"],
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64) * b.column("l_quantity").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"k": b.column("l_partkey").to_numpy(zero_copy_only=False), "v": cents}
            )
            .groupby("k", sort=False, as_index=False)["v"]
            .sum()
        )
        return pa.table(
            {
                "k": pa.array(g["k"].to_numpy(), pa.int64()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
            }
        )

    partials = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def scalar_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("k", sort=False)["v"].sum()
        return pa.table(
            {
                "s": pa.array([int(g.sum())], pa.int64()),
                "n": pa.array([len(g)], pa.int64()),
            }
        )

    stats = _merge_partials(
        partials,
        "k",
        scalar_bucket,
        input_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
    ).to_pandas()
    total = int(stats["s"].sum())
    n_parts = int(stats["n"].sum())
    if n_parts == 0:
        return pa.schema(
            [("p_partkey", pa.int64()), ("value", pa.float64())]
        ).empty_table()
    # exact int sums; the ÷ then × ordering matches the SQL expression
    thr = _Q11_FACTOR * (total / n_parts)

    def filter_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("k", sort=False, as_index=False)["v"].sum()
        g = g[g["v"] > thr]
        return pa.table(
            {
                "k": pa.array(g["k"].to_numpy(), pa.int64()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
            }
        )

    heavy = _merge_partials(
        partials,
        "k",
        filter_bucket,
        input_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
    ).to_pandas()
    heavy = heavy.sort_values(["v", "k"], ascending=[False, True])
    return pa.table(
        {
            "p_partkey": pa.array(heavy["k"].to_numpy(), pa.int64()),
            "value": pa.array(
                np.round(heavy["v"].to_numpy() / 100.0, 2), pa.float64()
            ),
        }
    )


SQL_TPCH_Q11 = f"""
WITH pv AS (SELECT l_partkey AS k,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS v
            FROM lineitem GROUP BY l_partkey)
SELECT k AS p_partkey, round(v / 100.0, 2) AS value
FROM pv
WHERE v > {_Q11_FACTOR} * (SELECT sum(v) / count(*) FROM pv)
ORDER BY v DESC, k
"""


# --------------------------------------------------------------------------
# Label-centroid cosine-similarity matrix: per-label mean embedding,
# then pairwise cosine between centroids — the "are my clusters /
# sources semantically distinct" diagnostic.  Per-batch combiner emits
# (label, dim, Σv, n) long rows (O(labels × dims) per batch, never
# O(vectors)); one tiny keyed sum merges them and the pairwise cosine
# runs driver-side over the labels² ≪ corpus matrix.  The same
# dot/‖·‖ expression is written term-for-term in the SQL twin.
# --------------------------------------------------------------------------


def q_label_centroid_sim(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        emb = b.column("embedding")
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
        n_rows = b.num_rows
        if n_rows == 0 or len(flat) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int32()),
                    "dim": pa.array([], pa.int32()),
                    "s": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        d = len(flat) // n_rows
        M = flat.reshape(n_rows, d)
        lab = b.column("label").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"label": lab})
        df["n"] = 1
        cnt = df.groupby("label", sort=False)["n"].sum()
        sums = (
            pd.DataFrame(M, index=lab).groupby(level=0, sort=False).sum()
        )  # labels × dims
        labels = sums.index.to_numpy()
        out_lab = np.repeat(labels, d).astype(np.int32)
        out_dim = np.tile(np.arange(d, dtype=np.int32), len(labels))
        out_s = sums.to_numpy().ravel()
        out_n = np.repeat(cnt.loc[labels].to_numpy(), d).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(out_lab, pa.int32()),
                "dim": pa.array(out_dim, pa.int32()),
                "s": pa.array(out_s, pa.float64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    agg = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["label", "dim"],
        sum_cols=["s", "n"],
        schema=pa.schema(
            [
                ("label", pa.int32()),
                ("dim", pa.int32()),
                ("s", pa.float64()),
                ("n", pa.int64()),
            ]
        ),
    ).to_pandas()
    if agg.empty:
        return pa.schema(
            [("l1", pa.int32()), ("l2", pa.int32()), ("cos_sim", pa.float64())]
        ).empty_table()
    agg = agg.sort_values(["label", "dim"])
    labels = np.sort(agg["label"].unique())
    d = int(agg["dim"].max()) + 1
    C = {}
    for lb in labels:
        rows = agg[agg["label"] == lb]
        C[lb] = rows["s"].to_numpy() / rows["n"].to_numpy()
    out = {"l1": [], "l2": [], "cos_sim": []}
    for i, a in enumerate(labels):
        for bl in labels[i + 1 :]:
            va, vb = C[a], C[bl]
            cos = float(
                np.round(
                    (va * vb).sum()
                    / (np.sqrt((va * va).sum()) * np.sqrt((vb * vb).sum())),
                    6,
                )
            )
            out["l1"].append(int(a))
            out["l2"].append(int(bl))
            out["cos_sim"].append(cos)
    _ = d
    return pa.table(
        {
            "l1": pa.array(out["l1"], pa.int32()),
            "l2": pa.array(out["l2"], pa.int32()),
            "cos_sim": pa.array(out["cos_sim"], pa.float64()),
        }
    )


# generate_series only takes constants in this DuckDB — the embedding
# dim is fixed at 64 across every testdata lake (min=max=64 verified)
SQL_LABEL_CENTROID_SIM = """
WITH c AS (SELECT label, i, avg(CAST(embedding[i] AS DOUBLE)) AS v
           FROM embeddings, generate_series(1, 64) t(i)
           GROUP BY label, i),
     dots AS (SELECT a.label AS l1, b.label AS l2, sum(a.v * b.v) AS dot
              FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
              GROUP BY 1, 2),
     norms AS (SELECT label, sqrt(sum(v * v)) AS nrm FROM c GROUP BY label)
SELECT l1, l2, round(dot / (n1.nrm * n2.nrm), 6) AS cos_sim
FROM dots JOIN norms n1 ON n1.label = l1 JOIN norms n2 ON n2.label = l2
ORDER BY l1, l2
"""


# --------------------------------------------------------------------------
# Per-language KL divergence from the corpus unigram distribution —
# the "which slice drifts from the mix" curation diagnostic.  One
# (lang, word, c) combiner stream merges through a word-bucketed
# exchange (vocab-bounded, the unigram_logprob assumption); the KL
# fold runs driver-side over the O(langs × vocab) table with every
# term derived from exact integer counts and the p/q expression
# written identically in both engines before the 6-decimal round.
# Restricting each language's sum to its own support (c_lw > 0) makes
# the sum well-defined with no smoothing constant to keep in sync.
# --------------------------------------------------------------------------


def q_lang_kl(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b.column("text")), "[^a-z]+"
        ).combine_chunks()
        offs = np.asarray(toks.offsets)
        vals = toks.values.to_numpy(zero_copy_only=False)
        vals = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        lang = np.repeat(
            b.column("lang").to_numpy(zero_copy_only=False), offs[1:] - offs[:-1]
        )
        m = vals != ""
        g = (
            pd.DataFrame({"lang": lang[m], "w": vals[m]})
            .groupby(["lang", "w"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "w": pa.array(g["w"], pa.string()),
                "c": pa.array(g["c"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["lang", "w"], sort=False, as_index=False)["c"].sum()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "w": pa.array(g["w"], pa.string()),
                "c": pa.array(g["c"].to_numpy(), pa.int64()),
            }
        )

    lw = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "w",
        per_bucket,
        input_schema=pa.schema(
            [("lang", pa.string()), ("w", pa.string()), ("c", pa.int64())]
        ),
    ).to_pandas()
    if lw.empty:
        return pa.schema(
            [("lang", pa.string()), ("n_tokens", pa.int64()), ("kl", pa.float64())]
        ).empty_table()
    lt = lw.groupby("lang")["c"].sum()
    wt = lw.groupby("w")["c"].sum()
    tot = float(lt.sum())
    p = lw["c"].to_numpy(dtype=np.float64) / lw["lang"].map(lt).to_numpy(
        dtype=np.float64
    )
    q = lw["w"].map(wt).to_numpy(dtype=np.float64) / tot
    term = p * np.log(p / q)
    kl = (
        pd.DataFrame({"lang": lw["lang"], "t": term})
        .groupby("lang", sort=True)["t"]
        .sum()
    )
    langs = kl.index.to_numpy()
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_tokens": pa.array(
                lt.loc[langs].to_numpy().astype(np.int64), pa.int64()
            ),
            "kl": pa.array(np.round(kl.to_numpy(), 6), pa.float64()),
        }
    )


SQL_LANG_KL = """
WITH t AS (SELECT lang,
                  unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
           FROM documents),
     lw AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
            FROM t WHERE w <> '' GROUP BY 1, 2),
     lt AS (SELECT lang, CAST(sum(c) AS DOUBLE) AS n FROM lw GROUP BY 1),
     wt AS (SELECT w, CAST(sum(c) AS DOUBLE) AS c FROM lw GROUP BY 1),
     tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM wt)
SELECT lw.lang,
       CAST(lt.n AS BIGINT) AS n_tokens,
       round(sum((lw.c / lt.n)
                 * ln((lw.c / lt.n) / (wt.c / (SELECT n FROM tot)))), 6) AS kl
FROM lw JOIN lt USING (lang) JOIN wt USING (w)
GROUP BY lw.lang, lt.n ORDER BY lang
"""


# --------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
# — the MOSS construction): base-31 polynomial hash over every K-gram
# of code points, then per window of W consecutive grams keep the
# minimum hash (rightmost on ties); the distinct selected (pos, hash)
# set is the document's fingerprint.  Guarantee: any shared substring
# of length ≥ K+W-1 yields at least one shared fingerprint.
#
# Map-only — every document fingerprints independently inside its
# batch, so there is NO exchange at any scale; at 100 TB this stage
# streams straight into a partitioned sink.  The outer per-document
# loop is the unit of work (variable-length docs), with the gram hash
# and the window-min both vectorized numpy over the whole document.
# K=8/W=4 keeps the polynomial exact in int64 (max code point 0x10FFFF
# × 31^7 × 8 < 2^63) so the SQL oracle reproduces identical hashes.
# --------------------------------------------------------------------------

_WIN_K, _WIN_W = 8, 4
_WIN_POW = (31 ** np.arange(_WIN_K - 1, -1, -1)).astype(np.int64)


def _winnow_batch(batch: pa.Table) -> pa.Table:
    """Per-batch winnowing kernel → (doc_id, pos, fp) rows.  The outer
    per-document loop is the unit of work (variable-length docs); the
    gram hash and the window-min are vectorized numpy per document."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    o_id, o_pos, o_fp = [], [], []
    for did, t in zip(ids, texts):
        t = t or ""
        if len(t) < _WIN_K + _WIN_W - 1:
            continue  # no full window → no fingerprints (matches SQL)
        # utf-32-le gives the code-point array vectorized — the same
        # values SQL's unicode(substr(text, i, 1)) sees
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        grams = np.lib.stride_tricks.sliding_window_view(codes, _WIN_K)
        h = grams @ _WIN_POW
        sw = np.lib.stride_tricks.sliding_window_view(h, _WIN_W)
        # rightmost min: argmin scans the reversed window, returning
        # the FIRST minimum there = the LAST in the original order
        idx = _WIN_W - 1 - np.argmin(sw[:, ::-1], axis=1)
        pos = np.unique(np.arange(sw.shape[0]) + idx)
        o_id.append(np.full(len(pos), did, np.int64))
        o_pos.append(pos + 1)  # 1-based, matches SQL substr indexing
        o_fp.append(h[pos])
    if not o_id:
        return pa.schema(
            [("doc_id", pa.int64()), ("pos", pa.int64()), ("fp", pa.int64())]
        ).empty_table()
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(o_id), pa.int64()),
            "pos": pa.array(np.concatenate(o_pos), pa.int64()),
            "fp": pa.array(np.concatenate(o_fp), pa.int64()),
        }
    )


def q_winnow_fingerprints(sf_dir: str):
    # output ~0.4 rows per input char, so the ordering is a DISTRIBUTED
    # sort (Ray's range-partitioned exchange, spillable) — a driver-side
    # pandas sort here measured >9 min on a 1M-doc lake (167M rows)
    # while the whole map stage streamed in 11.6 s; _to_table then
    # concatenates the globally-sorted blocks in order
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    fps = ds.map_batches(_winnow_batch, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(fps.sort(["doc_id", "pos"]))


def _gram_hash_sql() -> str:
    return " + ".join(
        f"CAST(unicode(substr(text, i + {j}, 1)) AS BIGINT) * {31 ** (_WIN_K - 1 - j)}"
        for j in range(_WIN_K)
    )


_WINNOW_CTES = f"""d AS (SELECT doc_id, text, length(text) AS n FROM documents),
     g AS (SELECT doc_id, unnest(generate_series(1, n - {_WIN_K - 1})) AS i, text
           FROM d WHERE n >= {_WIN_K + _WIN_W - 1}),
     gh AS (SELECT doc_id, i, {_gram_hash_sql()} AS h FROM g),
     w AS (SELECT doc_id, i AS s,
                  min(h) OVER fr AS wmin,
                  count(*) OVER fr AS wn
           FROM gh
           WINDOW fr AS (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)),
     sel AS (SELECT w.doc_id, max(gh.i) AS pos
             FROM w JOIN gh ON gh.doc_id = w.doc_id
                           AND gh.i BETWEEN w.s AND w.s + {_WIN_W - 1}
                           AND gh.h = w.wmin
             WHERE w.wn = {_WIN_W}
             GROUP BY w.doc_id, w.s)"""

SQL_WINNOW_FINGERPRINTS = f"""
WITH {_WINNOW_CTES}
SELECT DISTINCT sel.doc_id AS doc_id, sel.pos AS pos, gh.h AS fp
FROM sel JOIN gh ON gh.doc_id = sel.doc_id AND gh.i = sel.pos
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# MOSS-style near-duplicate PAIR detection on winnowed fingerprints:
# two documents are flagged when they share ≥ _WD_MIN_SHARED distinct
# fingerprint hashes, fingerprints appearing in > _WD_MAX_DF documents
# first dropped as stop-fingerprints (the standard MOSS noise filter —
# and the bound that keeps the per-fingerprint pair expansion ≤
# _WD_MAX_DF² at any corpus size).  Shape: map-only fingerprinting →
# distinct (fp, doc) per batch → ONE fp-bucketed exchange where the
# exact df test and the bounded pair expansion run (every copy of a
# fingerprint lands in one bucket) → O(qualifying-pairs) final fold.
# --------------------------------------------------------------------------

_WD_MAX_DF, _WD_MIN_SHARED = 20, 10


def _winnow_pairs(sf_dir: str) -> pd.DataFrame:
    """Qualifying MOSS pairs (doc_a < doc_b, n_shared ≥ threshold) as a
    driver frame — O(qualifying pairs), shared by q_winnow_dup_pairs
    and q_winnow_dedup."""
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        t = _winnow_batch(batch)
        df = (
            pd.DataFrame(
                {
                    "fp": t.column("fp").to_numpy(zero_copy_only=False),
                    "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False),
                }
            )
            .drop_duplicates()
        )
        return pa.table(
            {
                "fp": pa.array(df["fp"].to_numpy(), pa.int64()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        u = b.drop_duplicates()
        df = u.groupby("fp", sort=False)["doc_id"].nunique()
        ok = set(df[(df >= 2) & (df <= _WD_MAX_DF)].index)
        u = u[u["fp"].isin(ok)]
        m = u.merge(u, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        g = (
            m.groupby(["doc_id_x", "doc_id_y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "doc_a": pa.array(g["doc_id_x"].to_numpy(), pa.int64()),
                "doc_b": pa.array(g["doc_id_y"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    pairs = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "fp",
        per_bucket,
        input_schema=pa.schema([("fp", pa.int64()), ("doc_id", pa.int64())]),
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "n_shared": []}).astype(
            {"doc_a": np.int64, "doc_b": np.int64, "n_shared": np.int64}
        )
    # a doc pair spans many fp buckets — one final tiny sum, then the
    # threshold (which can only be applied AFTER the cross-bucket sum)
    g = (
        pairs.groupby(["doc_a", "doc_b"], as_index=False)["n"]
        .sum()
        .query(f"n >= {_WD_MIN_SHARED}")
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .rename(columns={"n": "n_shared"})
    )
    return g


def q_winnow_dup_pairs(sf_dir: str):
    g = _winnow_pairs(sf_dir)
    return pa.table(
        {
            "doc_a": pa.array(g["doc_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(g["doc_b"].to_numpy(), pa.int64()),
            "n_shared": pa.array(g["n_shared"].to_numpy(), pa.int64()),
        }
    )


SQL_WINNOW_DUP_PAIRS = f"""
WITH {_WINNOW_CTES},
     fp AS (SELECT DISTINCT gh.h AS fp, sel.doc_id AS doc_id
            FROM sel JOIN gh ON gh.doc_id = sel.doc_id AND gh.i = sel.pos),
     ok AS (SELECT fp FROM fp GROUP BY fp
            HAVING count(*) BETWEEN 2 AND {_WD_MAX_DF}),
     p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared
           FROM fp a JOIN fp b USING (fp) JOIN ok USING (fp)
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, n_shared FROM p
WHERE n_shared >= {_WD_MIN_SHARED} ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# Full MOSS dedup: winnow → qualifying pairs → distributed connected
# components (stages/dedup.connected_components — min-label
# propagation, no driver union-find) → keep each cluster's minimum
# doc_id.  The oracle closes the same pipeline in SQL: the dup-pair
# CTEs feed a recursive-CTE transitive closure (the graph_components
# pattern) and survivors are NOT IN (cluster losers).
# --------------------------------------------------------------------------


def q_winnow_dedup(sf_dir: str):
    pairs = _winnow_pairs(sf_dir)
    docs = _read_pq(_t(sf_dir, "documents"), columns=["doc_id"])
    if pairs.empty:
        out = _to_table(docs)
        return out.sort_by("doc_id")
    edges = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(pairs["doc_a"].to_numpy(), pa.int64()),
                "id_b": pa.array(pairs["doc_b"].to_numpy(), pa.int64()),
            }
        )
    )
    labels = dd.connected_components(edges)

    def losers_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b.column("node"), b.column("label")))

    loser_tbl = _to_table(labels.map_batches(losers_only, batch_format="pyarrow"))
    lref = ray.put(loser_tbl.column("node").combine_chunks())

    def drop(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.invert(pc.is_in(b.column("doc_id"), value_set=ray.get(lref)))
        )

    return _to_table(docs.map_batches(drop, batch_format="pyarrow")).sort_by("doc_id")


SQL_WINNOW_DEDUP = f"""
WITH RECURSIVE {_WINNOW_CTES},
     fp AS (SELECT DISTINCT gh.h AS fp, sel.doc_id AS doc_id
            FROM sel JOIN gh ON gh.doc_id = sel.doc_id AND gh.i = sel.pos),
     ok AS (SELECT fp FROM fp GROUP BY fp
            HAVING count(*) BETWEEN 2 AND {_WD_MAX_DF}),
     p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
           FROM fp a JOIN fp b USING (fp) JOIN ok USING (fp)
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
     e AS (SELECT doc_a AS a, doc_b AS b FROM p
           WHERE n_shared >= {_WD_MIN_SHARED}),
     u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
     nn AS (SELECT DISTINCT a AS node FROM u),
     reach(node, r) AS (
       SELECT node, node FROM nn
       UNION
       SELECT rr.node, u.b FROM reach rr JOIN u ON u.a = rr.r),
     lbl AS (SELECT node, min(r) AS label FROM reach GROUP BY node)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM lbl WHERE node <> label)
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Exact per-language Gini coefficient of document lengths — the
# length-inequality curation diagnostic.  n_chars is discrete, so the
# exact rank sum Σ rank·x folds from a (lang, value, count) table:
# for each value v (ascending) with count c and cumulative-before C,
# Σ ranks over its tie block = c·C + c(c+1)/2 regardless of intra-tie
# order.  Per-batch value-count partials → one keyed-sum exchange →
# driver finish over O(langs × distinct-values) rows in PYTHON ints
# (no float64 overflow of c·C at 10^10-doc scale); both engines
# evaluate the identical 2·Sr/(n·T) − (n+1)/n expression before the
# 6-decimal round.
# --------------------------------------------------------------------------


def q_gini_by_lang(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "v": pc.cast(g.column("n_chars"), pa.int64()),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    vc = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "v"],
        ["c"],
        pa.schema([("lang", pa.string()), ("v", pa.int64()), ("c", pa.int64())]),
    ).to_pandas()
    if vc.empty:
        return pa.schema(
            [("lang", pa.string()), ("n_docs", pa.int64()), ("gini", pa.float64())]
        ).empty_table()
    out_lang, out_n, out_g = [], [], []
    for lang, grp in vc.sort_values(["lang", "v"]).groupby("lang", sort=True):
        n = t = sr = cb = 0  # python ints: exact at any scale
        for v, c in zip(grp["v"].tolist(), grp["c"].tolist()):
            sr += v * (c * cb + c * (c + 1) // 2)
            t += v * c
            n += c
            cb += c
        out_lang.append(lang)
        out_n.append(n)
        out_g.append(round(2.0 * sr / (n * t) - (n + 1.0) / n, 6))
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "n_docs": pa.array(out_n, pa.int64()),
            "gini": pa.array(out_g, pa.float64()),
        }
    )


SQL_GINI_BY_LANG = """
WITH vc AS (SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1, 2),
     cw AS (SELECT lang, v, c,
                   coalesce(sum(c) OVER (PARTITION BY lang ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) AS cb
            FROM vc),
     agg AS (SELECT lang, sum(c) AS n, sum(v * c) AS t,
                    sum(v * (c * cb + (c * (c + 1)) // 2)) AS sr
             FROM cw GROUP BY 1)
SELECT lang, CAST(n AS BIGINT) AS n_docs,
       round(2.0 * sr / (n * t) - (n + 1.0) / n, 6) AS gini
FROM agg ORDER BY lang
"""


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov statistic between the two LARGEST
# sources' document-length distributions — the "did crawl B drift
# from crawl A" distribution test.  n_chars is discrete, so the exact
# D = max|CDF₁−CDF₂| folds from per-(source, value) counts: one
# keyed-sum exchange, then a driver finish over O(distinct values)
# rows with the CDF difference computed from exact integer counts.
# Deterministic source pick: (count DESC, source ASC).
# --------------------------------------------------------------------------


def q_ks_sources(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "n_chars"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "v": pc.cast(g.column("n_chars"), pa.int64()),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    vc = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "v"],
        ["c"],
        pa.schema([("source", pa.string()), ("v", pa.int64()), ("c", pa.int64())]),
    ).to_pandas()
    if vc.empty or vc["source"].nunique() < 2:
        return pa.schema(
            [
                ("s1", pa.string()),
                ("s2", pa.string()),
                ("n1", pa.int64()),
                ("n2", pa.int64()),
                ("ks", pa.float64()),
            ]
        ).empty_table()
    totals = (
        vc.groupby("source")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "source"], ascending=[False, True])
    )
    s1, s2 = totals["source"].iloc[0], totals["source"].iloc[1]
    n1, n2 = int(totals["c"].iloc[0]), int(totals["c"].iloc[1])
    grid = np.sort(vc[vc["source"].isin([s1, s2])]["v"].unique())

    def cdf(src: str, n: int) -> np.ndarray:
        g = vc[vc["source"] == src].sort_values("v")
        cum = np.zeros(len(grid), dtype=np.int64)
        idx = np.searchsorted(grid, g["v"].to_numpy())
        cum[idx] = g["c"].to_numpy()
        return np.cumsum(cum) / float(n)

    d = float(np.max(np.abs(cdf(s1, n1) - cdf(s2, n2))))
    return pa.table(
        {
            "s1": pa.array([s1], pa.string()),
            "s2": pa.array([s2], pa.string()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "ks": pa.array([round(d, 6)], pa.float64()),
        }
    )


SQL_KS_SOURCES = """
WITH top2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (ORDER BY count(*) DESC, source) AS r
              FROM documents GROUP BY 1),
     s1 AS (SELECT source, n FROM top2 WHERE r = 1),
     s2 AS (SELECT source, n FROM top2 WHERE r = 2),
     vc AS (SELECT n_chars AS v,
                   CAST(sum(CASE WHEN source = (SELECT source FROM s1)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                   CAST(sum(CASE WHEN source = (SELECT source FROM s2)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c2
            FROM documents
            WHERE source IN ((SELECT source FROM s1), (SELECT source FROM s2))
            GROUP BY 1),
     cw AS (SELECT v,
                   sum(c1) OVER (ORDER BY v) AS k1,
                   sum(c2) OVER (ORDER BY v) AS k2
            FROM vc)
SELECT (SELECT source FROM s1) AS s1, (SELECT source FROM s2) AS s2,
       (SELECT n FROM s1) AS n1, (SELECT n FROM s2) AS n2,
       round(max(abs(CAST(k1 AS DOUBLE) / (SELECT n FROM s1)
                     - CAST(k2 AS DOUBLE) / (SELECT n FROM s2))), 6) AS ks
FROM cw
HAVING count(*) > 0
"""
# HAVING on the ungrouped aggregate drops the single NULL row when cw
# is empty (no two sources exist → no KS statistic), matching the
# engine's empty-table semantics; non-empty lakes are unaffected.


# --------------------------------------------------------------------------
# Type-token ratio per language — the vocabulary-richness curation
# stat.  Distinct (lang, word) pairs dedup per batch, merge through
# ONE word-bucketed exchange (vocab-bounded, the unigram_logprob
# assumption) carrying per-pair token counts, so types and tokens
# fold from the same stream; ratio rounded identically both engines.
# --------------------------------------------------------------------------


def q_ttr_by_lang(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b.column("text")), "[^a-z]+"
        ).combine_chunks()
        offs = np.asarray(toks.offsets)
        vals = toks.values.to_numpy(zero_copy_only=False)
        vals = vals[offs[0] : offs[-1]]
        offs = offs - offs[0]
        lang = np.repeat(
            b.column("lang").to_numpy(zero_copy_only=False), offs[1:] - offs[:-1]
        )
        m = vals != ""
        g = (
            pd.DataFrame({"lang": lang[m], "w": vals[m]})
            .groupby(["lang", "w"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "w": pa.array(g["w"], pa.string()),
                "c": pa.array(g["c"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["lang", "w"], sort=False, as_index=False)["c"].sum()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "w": pa.array(g["w"], pa.string()),
                "c": pa.array(g["c"].to_numpy(), pa.int64()),
            }
        )

    lw = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "w",
        per_bucket,
        input_schema=pa.schema(
            [("lang", pa.string()), ("w", pa.string()), ("c", pa.int64())]
        ),
    ).to_pandas()
    if lw.empty:
        return pa.schema(
            [
                ("lang", pa.string()),
                ("n_types", pa.int64()),
                ("n_tokens", pa.int64()),
                ("ttr", pa.float64()),
            ]
        ).empty_table()
    g = lw.groupby("lang", sort=True).agg(
        n_types=("w", "size"), n_tokens=("c", "sum")
    )
    return pa.table(
        {
            "lang": pa.array(g.index.to_numpy(), pa.string()),
            "n_types": pa.array(g["n_types"].to_numpy().astype(np.int64), pa.int64()),
            "n_tokens": pa.array(
                g["n_tokens"].to_numpy().astype(np.int64), pa.int64()
            ),
            "ttr": pa.array(
                np.round(
                    g["n_types"].to_numpy().astype(np.float64)
                    / g["n_tokens"].to_numpy().astype(np.float64),
                    6,
                ),
                pa.float64(),
            ),
        }
    )


SQL_TTR_BY_LANG = """
WITH t AS (SELECT lang,
                  unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
           FROM documents),
     lw AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
            FROM t WHERE w <> '' GROUP BY 1, 2)
SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS ttr
FROM lw GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Boilerplate shared-prefix detector — web-scale corpora are full of
# template headers; groups of documents sharing their first 16 chars
# are the cheap first-pass signal.  Per-batch Arrow group_by partial
# (prefix → count, min doc) → merged exchange over combiner OUTPUT →
# top-20 driver finish on the ≤|prefixes| merged frame.
# --------------------------------------------------------------------------

_BP_PREFIX_LEN = 16


def q_boilerplate_prefixes(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "prefix": pc.utf8_slice_codeunits(
                        b.column("text"), 0, _BP_PREFIX_LEN
                    ),
                    "doc_id": b.column("doc_id"),
                }
            )
            .group_by("prefix")
            .aggregate([("doc_id", "count"), ("doc_id", "min")])
        )
        return pa.table(
            {
                "prefix": g.column("prefix"),
                "n_docs": pc.cast(g.column("doc_id_count"), pa.int64()),
                "min_doc": g.column("doc_id_min"),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("prefix", sort=False, as_index=False).agg(
            n_docs=("n_docs", "sum"), min_doc=("min_doc", "min")
        )
        return pa.table(
            {
                "prefix": pa.array(g["prefix"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                "min_doc": pa.array(g["min_doc"].to_numpy(), pa.int64()),
            }
        )

    merged = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "prefix",
        per_bucket,
        input_schema=pa.schema(
            [("prefix", pa.string()), ("n_docs", pa.int64()), ("min_doc", pa.int64())]
        ),
    ).to_pandas()
    top = (
        merged[merged["n_docs"] > 1]
        .sort_values(["n_docs", "prefix"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "prefix": pa.array(top["prefix"], pa.string()),
            "n_docs": pa.array(top["n_docs"].to_numpy(), pa.int64()),
            "min_doc": pa.array(top["min_doc"].to_numpy(), pa.int64()),
        }
    )


SQL_BOILERPLATE_PREFIXES = f"""
SELECT substr(text, 1, {_BP_PREFIX_LEN}) AS prefix,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(doc_id) AS min_doc
FROM documents GROUP BY 1 HAVING count(*) > 1
ORDER BY n_docs DESC, prefix LIMIT 20
"""


# --------------------------------------------------------------------------
# Mutual information between the lang and source columns — the "does
# my sampling key leak my stratification key" curation diagnostic.
# One (lang, source) count exchange over combiner partials; the MI
# fold runs driver-side over the O(langs × sources) contingency table
# with exact integer counts, the expression written identically in
# both engines before the 6-decimal round.
# --------------------------------------------------------------------------


def q_lang_source_mi(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    ls = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "source"],
        ["c"],
        pa.schema([("lang", pa.string()), ("source", pa.string()), ("c", pa.int64())]),
    ).to_pandas()
    if ls.empty:
        return pa.schema(
            [("n_docs", pa.int64()), ("mi", pa.float64())]
        ).empty_table()
    n = float(ls["c"].sum())
    cl = ls.groupby("lang")["c"].sum()
    cs = ls.groupby("source")["c"].sum()
    c = ls["c"].to_numpy(dtype=np.float64)
    term = (c / n) * np.log(
        c * n / (ls["lang"].map(cl).to_numpy() * ls["source"].map(cs).to_numpy())
    )
    return pa.table(
        {
            "n_docs": pa.array([int(n)], pa.int64()),
            "mi": pa.array([round(float(term.sum()), 6)], pa.float64()),
        }
    )


SQL_LANG_SOURCE_MI = """
WITH ls AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1, 2),
     l AS (SELECT lang, CAST(sum(c) AS DOUBLE) AS cl FROM ls GROUP BY 1),
     s AS (SELECT source, CAST(sum(c) AS DOUBLE) AS cs FROM ls GROUP BY 1),
     n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM ls)
SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
       round(sum((c / (SELECT n FROM n))
                 * ln(c * (SELECT n FROM n) / (l.cl * s.cs))), 6) AS mi
FROM ls JOIN l USING (lang) JOIN s USING (source)
HAVING count(*) > 0
"""
# HAVING drops the NULL row of the empty-input global aggregate (MI of
# nothing is undefined, the engine returns no rows); non-empty lakes
# are unaffected.


# --------------------------------------------------------------------------
# Per-language Herfindahl-Hirschman concentration of source shares —
# "is this language slice dominated by one crawl source".  Same
# (lang, source) count exchange as the MI query; per-lang finish is
# O(langs × sources) driver-side.
# --------------------------------------------------------------------------


def q_hhi_concentration(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    ls = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["lang", "source"],
        ["c"],
        pa.schema([("lang", pa.string()), ("source", pa.string()), ("c", pa.int64())]),
    ).to_pandas()
    if ls.empty:
        return pa.schema(
            [("lang", pa.string()), ("n_docs", pa.int64()), ("hhi", pa.float64())]
        ).empty_table()
    nl = ls.groupby("lang")["c"].sum()
    share = ls["c"].to_numpy(dtype=np.float64) / ls["lang"].map(nl).to_numpy(
        dtype=np.float64
    )
    hhi = (
        pd.DataFrame({"lang": ls["lang"], "t": share * share})
        .groupby("lang", sort=True)["t"]
        .sum()
    )
    langs = hhi.index.to_numpy()
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_docs": pa.array(nl.loc[langs].to_numpy().astype(np.int64), pa.int64()),
            "hhi": pa.array(np.round(hhi.to_numpy(), 6), pa.float64()),
        }
    )


SQL_HHI_CONCENTRATION = """
WITH ls AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1, 2),
     l AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM ls GROUP BY 1)
SELECT ls.lang, l.n AS n_docs,
       round(sum((CAST(c AS DOUBLE) / l.n) * (CAST(c AS DOUBLE) / l.n)), 6) AS hhi
FROM ls JOIN l USING (lang) GROUP BY 1, 2 ORDER BY lang
"""


# --------------------------------------------------------------------------
# Distributed PCA over the embedding column (top-2 principal values +
# explained-variance ratio).  The classic moment-accumulation shape:
# each batch emits ONE row holding (count, Σx, flattened Σxxᵀ) — d=64
# so a partial is 4096+64+1 doubles regardless of batch size — the
# partial stream driver-reduces (O(#batches) rows), and the d×d eigen
# solve runs once on the driver.  No oracle: DuckDB has no
# eigendecomposition; pinned against numpy's direct covariance eig in
# tests instead.
# --------------------------------------------------------------------------


def q_embed_pca(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("embedding").combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        x = flat.reshape(len(col), -1)
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
                "g": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
            }
        )

    parts = _to_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    if parts.num_rows == 0:
        return pa.schema(
            [
                ("component", pa.int32()),
                ("eigenvalue", pa.float64()),
                ("explained", pa.float64()),
            ]
        ).empty_table()
    n = int(pc.sum(parts.column("n")).as_py())
    s = np.sum([np.asarray(v) for v in parts.column("s").to_pylist()], axis=0)
    g = np.sum([np.asarray(v) for v in parts.column("g").to_pylist()], axis=0)
    d = len(s)
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    ev = np.linalg.eigvalsh(cov)[::-1]  # descending
    tr = float(ev.sum())
    return pa.table(
        {
            "component": pa.array([1, 2], pa.int32()),
            "eigenvalue": pa.array(np.round(ev[:2], 6), pa.float64()),
            "explained": pa.array(np.round(ev[:2] / tr, 6), pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Column profiler — the data-quality operator every ingest pipeline
# runs first: per column count / nulls / exact distinct / min / max,
# values canonicalized to strings so one schema covers all types.
# count/min/max are trivial per-batch combiners (4 rows per batch);
# the exact distinct count is the distinct_per_group shape — each
# batch dedups its (col, val) pairs vectorized, the one exchange moves
# near-distinct pairs, and each value-bucket counts its pairs exactly
# (a value lands in exactly one bucket).  At 100 TB the shuffle volume
# is O(distinct values), never O(rows).
# --------------------------------------------------------------------------

_PROFILE_COLS = ("doc_id", "lang", "n_chars", "source")


def q_profile_columns(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=list(_PROFILE_COLS))

    def stats_partial(b: pa.Table) -> pa.Table:
        rows = {"col": [], "n": [], "n_null": [], "min_val": [], "max_val": []}
        for name in _PROFILE_COLS:
            col = b.column(name)
            valid = len(col) - col.null_count
            mm = pc.min_max(col)
            rows["col"].append(name)
            rows["n"].append(valid)
            rows["n_null"].append(col.null_count)
            # canonical string form == DuckDB CAST(x AS VARCHAR) for
            # int64 and varchar columns
            rows["min_val"].append(
                None if valid == 0 else str(mm["min"].as_py())
            )
            rows["max_val"].append(
                None if valid == 0 else str(mm["max"].as_py())
            )
        return pa.table(
            {
                "col": pa.array(rows["col"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "n_null": pa.array(rows["n_null"], pa.int64()),
                "min_val": pa.array(rows["min_val"], pa.string()),
                "max_val": pa.array(rows["max_val"], pa.string()),
            }
        )

    sdf = _to_table_s(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        pa.schema(
            [
                ("col", pa.string()),
                ("n", pa.int64()),
                ("n_null", pa.int64()),
                ("min_val", pa.string()),
                ("max_val", pa.string()),
            ]
        ),
    ).to_pandas()
    rows = []
    for name in _PROFILE_COLS:
        sub = sdf[sdf["col"] == name]
        mn, mx = sub["min_val"].dropna(), sub["max_val"].dropna()
        numeric = name in ("doc_id", "n_chars")
        # per-batch minima were stringified for the unified schema —
        # numeric columns must reduce numerically, not lexicographically
        rows.append(
            (
                name,
                int(sub["n"].sum()),
                int(sub["n_null"].sum()),
                (str(min(int(v) for v in mn)) if numeric else min(mn))
                if len(mn)
                else None,
                (str(max(int(v) for v in mx)) if numeric else max(mx))
                if len(mx)
                else None,
            )
        )
    stats = pd.DataFrame(rows, columns=["col", "n", "n_null", "min_val", "max_val"])

    def distinct_partial(b: pa.Table) -> pa.Table:
        cols, vals = [], []
        for name in _PROFILE_COLS:
            u = pc.unique(pc.cast(b.column(name).drop_null(), pa.string()))
            cols.extend([name] * len(u))
            vals.append(u)
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "val": pa.concat_arrays(vals),
            }
        )

    def count_bucket(df: pd.DataFrame) -> pa.Table:
        g = (
            df.drop_duplicates(subset=["col", "val"])
            .groupby("col", sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "col": pa.array(g["col"], pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    nd = (
        _merge_partials(
            _read_pq(_t(sf_dir, "documents"), columns=list(_PROFILE_COLS)).map_batches(
                distinct_partial, batch_format="pyarrow"
            ),
            key="val",
            per_bucket=count_bucket,
            input_schema=pa.schema([("col", pa.string()), ("val", pa.string())]),
        )
        .to_pandas()
        .groupby("col", as_index=False)["cnt"]
        .sum()
    )
    # left join: a column absent from the distinct stream (possible
    # only on an all-empty lake) profiles as n_distinct = 0, exactly
    # count(DISTINCT col) of no rows
    out = stats.merge(nd, on="col", how="left").sort_values("col")
    out["cnt"] = out["cnt"].fillna(0).astype(np.int64)
    return pa.table(
        {
            "col": pa.array(out["col"], pa.string()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
            "n_null": pa.array(out["n_null"].to_numpy(), pa.int64()),
            "n_distinct": pa.array(out["cnt"].to_numpy(), pa.int64()),
            "min_val": pa.array(out["min_val"], pa.string()),
            "max_val": pa.array(out["max_val"], pa.string()),
        }
    )


def _profile_sql() -> str:
    parts = [
        f"""SELECT '{c}' AS col, count({c}) AS n,
           count(*) - count({c}) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_val,
           CAST(max({c}) AS VARCHAR) AS max_val FROM documents"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col"


SQL_PROFILE_COLUMNS = _profile_sql()


# --------------------------------------------------------------------------
# Pearson chi-squared independence test between lang and source — the
# categorical drift detector (is the language mix the same across
# sources?).  One mergeable (lang, source, count) exchange of
# O(langs × sources) rows; the statistic folds on the driver with the
# integer numerator (o·n − rt·ct)² so every per-cell term is the same
# float64 on both engines (zero cells included via the cross join).
# --------------------------------------------------------------------------


def q_chi2_lang_source(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source"])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["lang", "source"], sort=False).size().reset_index(name="c")
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "source": pa.array(g["source"], pa.string()),
                "c": pa.array(g["c"].to_numpy(), pa.int64()),
            }
        )

    counts = _sum_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["lang", "source"],
        sum_cols=["c"],
        schema=pa.schema(
            [("lang", pa.string()), ("source", pa.string()), ("c", pa.int64())]
        ),
    ).to_pandas()
    if counts.empty:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "dof": pa.array([0], pa.int64()),
                "chi2": pa.array([None], pa.float64()),
            }
        )
    obs = counts.pivot_table(
        index="lang", columns="source", values="c", aggfunc="sum", fill_value=0
    )
    o = obs.to_numpy().astype(object)  # python ints — exact products
    rt = o.sum(axis=1, keepdims=True)
    ct = o.sum(axis=0, keepdims=True)
    n = int(o.sum())
    # per-cell: ((o·n − rt·ct)² / (rt·ct)) / n with the SAME float ops
    # as the oracle; numerators are exact python ints (no int64
    # overflow at any scale)
    num = (o * n - rt * ct) ** 2
    terms = np.array(
        [
            float(num[i, j]) / float(rt[i, 0] * ct[0, j]) / n
            for i in range(o.shape[0])
            for j in range(o.shape[1])
        ]
    )
    dof = (o.shape[0] - 1) * (o.shape[1] - 1)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2": pa.array([round(float(terms.sum()), 6)], pa.float64()),
        }
    )


SQL_CHI2_LANG_SOURCE = """
WITH c AS (SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
     r AS (SELECT lang, sum(o) AS rt FROM c GROUP BY 1),
     s AS (SELECT source, sum(o) AS ct FROM c GROUP BY 1),
     t AS (SELECT sum(o) AS n FROM c),
     g AS (SELECT r.lang, s.source, r.rt, s.ct, t.n,
                  coalesce(cc.o, 0) AS o
           FROM r CROSS JOIN s CROSS JOIN t
           LEFT JOIN c cc ON cc.lang = r.lang AND cc.source = s.source)
SELECT CAST(max(n) AS BIGINT) AS n,
       (count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1) AS dof,
       round(sum(CAST((o*n - rt*ct) * (o*n - rt*ct) AS DOUBLE)
                 / CAST(rt*ct AS DOUBLE) / n), 6) AS chi2
FROM g
"""


# --------------------------------------------------------------------------
# Benford first-digit profile of the event amounts — the classic
# anomaly screen for invented numbers.  Amounts become exact integer
# cents per batch (2-decimal doubles), the leading digit is one
# vectorized Arrow cast + slice, and a 9-row mergeable count exchange
# finishes; the share is integer round-half-up ppm so both engines
# agree on exact halves.
# --------------------------------------------------------------------------


def q_benford_digits(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        cents = cents[cents >= 1]
        digit = pc.cast(
            pc.utf8_slice_codeunits(
                pc.cast(pa.array(cents, pa.int64()), pa.string()), 0, 1
            ),
            pa.int64(),
        )
        vc = digit.value_counts()
        return pa.table(
            {
                "digit": vc.field("values"),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["digit"],
            sum_cols=["cnt"],
            schema=pa.schema([("digit", pa.int64()), ("cnt", pa.int64())]),
        )
        .to_pandas()
        .sort_values("digit")
    )
    n = int(counts["cnt"].sum())
    c = counts["cnt"].to_numpy()
    ppm = (2 * c * 1_000_000 + n) // (2 * n) if n else c * 0
    return pa.table(
        {
            "digit": pa.array(counts["digit"].to_numpy(), pa.int64()),
            "cnt": pa.array(c, pa.int64()),
            "ppm": pa.array(ppm, pa.int64()),
        }
    )


SQL_BENFORD_DIGITS = """
WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
           WHERE CAST(round(value * 100) AS BIGINT) >= 1),
     d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM c),
     t AS (SELECT count(*) AS n FROM d)
SELECT digit, count(*) AS cnt,
       (2 * count(*) * 1000000 + max(t.n)) // (2 * max(t.n)) AS ppm
FROM d CROSS JOIN t GROUP BY digit ORDER BY digit
"""


# --------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily event volume — the seasonality /
# burstiness diagnostic for a time-partitioned lake.  Days reduce
# through one mergeable (day, count) exchange (O(days) rows — the only
# data that ever reaches the driver); the correlation folds from SIX
# exact integer sums so the single float evaluation matches the
# oracle's lag-window formulation bit for bit.
# --------------------------------------------------------------------------


def q_autocorr_daily(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False) // (
            86_400_000_000
        )
        u, c = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    days = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["day"],
            sum_cols=["c"],
            schema=pa.schema([("day", pa.int64()), ("c", pa.int64())]),
        )
        .to_pandas()
        .sort_values("day")
    )
    if len(days) < 2:
        return pa.table({"n_pairs": pa.array([0], pa.int64()), "acf1": pa.array([None], pa.float64())})
    x = [int(v) for v in days["c"].to_numpy()[1:]]  # current
    y = [int(v) for v in days["c"].to_numpy()[:-1]]  # lagged
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx == 0 or vy == 0:
        return pa.table({"n_pairs": pa.array([n], pa.int64()), "acf1": pa.array([None], pa.float64())})
    import math

    acf = float(n * sxy - sx * sy) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
    return pa.table(
        {
            "n_pairs": pa.array([n], pa.int64()),
            "acf1": pa.array([round(acf, 6)], pa.float64()),
        }
    )


SQL_AUTOCORR_DAILY = """
WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  count(*) AS c
           FROM events GROUP BY 1),
     p AS (SELECT c AS x, lag(c) OVER (ORDER BY day) AS y FROM d),
     q AS (SELECT x, y FROM p WHERE y IS NOT NULL),
     s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
           FROM q)
SELECT n AS n_pairs,
       CASE WHEN n < 1 OR n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
            ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                          * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
       END AS acf1
FROM s
"""


# --------------------------------------------------------------------------
# Gopher-style quality-rule filter (Rae et al. 2021's repetition/
# length heuristics family): word count, mean word length, and
# alphabetic-ratio gates, reported as per-reason reject counts with
# first-failing-rule precedence.  Every predicate is INTEGER
# arithmetic (ns < 2·wc instead of ns/wc < 2.0), so the engine and the
# oracle agree exactly on boundary documents.  Map-only per-batch
# kernel (4 Arrow string ops) + one O(4)-row count exchange.
# --------------------------------------------------------------------------

_GOPHER_WC_MIN, _GOPHER_WC_MAX = 5, 5000
_GOPHER_MWL_MIN, _GOPHER_MWL_MAX = 2, 12  # mean word length bounds


def q_gopher_filter(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        text = b.column("text")
        wc = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
            zero_copy_only=False
        )
        ns = pc.utf8_length(pc.replace_substring(text, " ", "")).to_numpy(
            zero_copy_only=False
        )
        al = pc.utf8_length(
            pc.replace_substring_regex(text, "[^a-zA-Z]", "")
        ).to_numpy(zero_copy_only=False)
        tot = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        reason = np.select(
            [
                (wc < _GOPHER_WC_MIN) | (wc > _GOPHER_WC_MAX),
                (ns < _GOPHER_MWL_MIN * wc) | (ns > _GOPHER_MWL_MAX * wc),
                5 * al < 3 * tot,
            ],
            ["wc", "mwl", "alpha"],
            default="kept",
        )
        u, c = np.unique(reason, return_counts=True)
        return pa.table(
            {
                "reason": pa.array(u, pa.string()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    out = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["reason"],
            sum_cols=["cnt"],
            schema=pa.schema([("reason", pa.string()), ("cnt", pa.int64())]),
        )
        .to_pandas()
        .sort_values("reason")
    )
    return pa.table(
        {
            "reason": pa.array(out["reason"], pa.string()),
            "cnt": pa.array(out["cnt"].to_numpy(), pa.int64()),
        }
    )


SQL_GOPHER_FILTER = f"""
WITH f AS (SELECT len(string_split(text, ' ')) AS wc,
                  length(replace(text, ' ', '')) AS ns,
                  length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS al,
                  length(text) AS tot
           FROM documents),
     r AS (SELECT CASE
                    WHEN wc < {_GOPHER_WC_MIN} OR wc > {_GOPHER_WC_MAX} THEN 'wc'
                    WHEN ns < {_GOPHER_MWL_MIN}*wc OR ns > {_GOPHER_MWL_MAX}*wc
                      THEN 'mwl'
                    WHEN 5*al < 3*tot THEN 'alpha'
                    ELSE 'kept' END AS reason
           FROM f)
SELECT reason, count(*) AS cnt FROM r GROUP BY reason ORDER BY reason
"""


# --------------------------------------------------------------------------
# Per-user exponential moving average (α = 1/2) of event amounts in
# time order — the genuinely SEQUENTIAL per-key fold (each step needs
# the previous state, unlike the frame windows above).  One
# user-bucketed exchange; inside a bucket pandas ewm() runs the exact
# recursion y_t = ½x_t + ½y_{t-1} vectorized per user.  α = ½ makes
# every step two exact halvings, so the fold is bit-identical to the
# oracle's recursive CTE regardless of formula arrangement.  A user's
# history must fit one task — the M3/M4 carried-context bound
# (reference src/pipeline.py) applies.
# --------------------------------------------------------------------------


def q_ewma_user(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        ew = (
            df.groupby("user_id", sort=False)["value"]
            .apply(lambda s: s.ewm(alpha=0.5, adjust=False).mean().iloc[-1])
            .reset_index(name="ewma")
        )
        n = df.groupby("user_id", sort=False).size().reset_index(name="n_events")
        m = ew.merge(n, on="user_id")
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(), pa.int64()),
                "n_events": pa.array(m["n_events"].to_numpy(), pa.int64()),
                "ewma": pa.array(np.round(m["ewma"].to_numpy(), 6), pa.float64()),
            }
        )

    return _merge_partials(
        ds,
        key="user_id",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
    )


# --------------------------------------------------------------------------
# End-to-end pretraining-data preparation — the composition every
# LLM-data user actually runs: Gopher-rule filter → exact dedup (keep
# min doc_id, carrying THAT row's lang) → per-language document/token
# budget.  One pass computes the filter mask, the 64-bit content
# fingerprint, and the token count per batch; ONE fp-bucketed exchange
# resolves dedup winners (argmin is per-batch combinable, fp groups
# complete within a bucket) and collapses to per-lang sums in-bucket —
# the driver sees O(langs × buckets) rows, never documents.
# --------------------------------------------------------------------------


def q_pretrain_prep(sf_dir: str):
    from ..functions.textstats import fingerprint_exact

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        text = b.column("text")
        wc = pc.list_value_length(pc.split_pattern(text, " ")).to_numpy(
            zero_copy_only=False
        )
        ns = pc.utf8_length(pc.replace_substring(text, " ", "")).to_numpy(
            zero_copy_only=False
        )
        al = pc.utf8_length(
            pc.replace_substring_regex(text, "[^a-zA-Z]", "")
        ).to_numpy(zero_copy_only=False)
        tot = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        keep = (
            (wc >= _GOPHER_WC_MIN)
            & (wc <= _GOPHER_WC_MAX)
            & (ns >= _GOPHER_MWL_MIN * wc)
            & (ns <= _GOPHER_MWL_MAX * wc)
            & (5 * al >= 3 * tot)
        )
        f = b.filter(pa.array(keep))
        fps = [fingerprint_exact(t or "") for t in f.column("text").to_pylist()]
        df = pd.DataFrame(
            {
                "fp64": np.asarray(fps, dtype=np.int64),
                "doc_id": f.column("doc_id").to_numpy(zero_copy_only=False),
                "lang": f.column("lang").to_numpy(zero_copy_only=False),
                "tokens": wc[keep],
            }
        )
        # per-batch argmin combiner: one candidate row per fingerprint
        w = df.sort_values("doc_id").drop_duplicates("fp64")
        return pa.table(
            {
                "fp64": pa.array(w["fp64"].to_numpy(), pa.int64()),
                "doc_id": pa.array(w["doc_id"].to_numpy(), pa.int64()),
                "lang": pa.array(w["lang"], pa.string()),
                "tokens": pa.array(w["tokens"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        w = df.sort_values("doc_id").drop_duplicates("fp64")
        g = w.groupby("lang", sort=False).agg(
            n_docs=("doc_id", "size"), n_tokens=("tokens", "sum")
        )
        g = g.reset_index()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy().astype(np.int64), pa.int64()),
                "n_tokens": pa.array(
                    g["n_tokens"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    merged = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="fp64",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [
                ("fp64", pa.int64()),
                ("doc_id", pa.int64()),
                ("lang", pa.string()),
                ("tokens", pa.int64()),
            ]
        ),
    ).to_pandas()
    out = (
        merged.groupby("lang", as_index=False)[["n_docs", "n_tokens"]]
        .sum()
        .sort_values("lang")
    )
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "n_docs": pa.array(out["n_docs"].to_numpy().astype(np.int64), pa.int64()),
            "n_tokens": pa.array(
                out["n_tokens"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


# --------------------------------------------------------------------------
# Cumulative-distinct-user growth curve — the adoption metric SQL
# window functions can't express directly (no DISTINCT in windows):
# reduce each user to their FIRST-seen day (per-batch min combiner →
# one Min exchange of O(users) slim rows), then the per-day new-user
# counts cumsum on the driver over O(days) rows.
# --------------------------------------------------------------------------


def q_user_growth(sf_dir: str):
    from ray.data.aggregate import Min

    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False) // (
            86_400_000_000
        )
        g = (
            pd.DataFrame(
                {"user_id": b.column("user_id").to_numpy(zero_copy_only=False), "day": day}
            )
            .groupby("user_id", sort=False)["day"]
            .min()
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
            }
        )

    first = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("day", alias_name="day"))
    )
    days = (
        _to_table_s(first, pa.schema([("user_id", pa.int64()), ("day", pa.int64())]))
        .column("day")
        .to_numpy(zero_copy_only=False)
    )
    u, c = np.unique(days, return_counts=True)
    return pa.table(
        {
            "day": pa.array(u, pa.int64()),
            "new_users": pa.array(c.astype(np.int64), pa.int64()),
            "total_users": pa.array(np.cumsum(c).astype(np.int64), pa.int64()),
        }
    )


SQL_USER_GROWTH = """
WITH f AS (SELECT user_id,
                  min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS day
           FROM events GROUP BY user_id),
     d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
SELECT day, new_users,
       CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS total_users
FROM d ORDER BY day
"""


# --------------------------------------------------------------------------
# Fingerprint-level cross-split decontamination — the Dolma/RedPajama
# practice one level up from q_decontaminate's substring match: flag
# train-split docs sharing ≥3 distinct winnow fingerprints with the
# held-out split (doc_id % 20 == 0 plays the eval set).  Fully
# reduce-side: (doc_id, fp, is_eval) rows union-tag into ONE
# fp-bucketed exchange; a fingerprint's eval/train membership is
# resolved inside its bucket, so only truly-contaminated (doc, fp)
# pairs ever reach the driver — no eval-set broadcast (the eval side
# scales with the lake here, unlike q_decontaminate's capped snippet
# set).
# --------------------------------------------------------------------------

_DECON_SPLIT_MOD = 20
_DECON_MIN_SHARED = 3


def q_winnow_decontaminate(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        w = _winnow_batch(b)
        df = pd.DataFrame(
            {
                "doc_id": w.column("doc_id").to_numpy(zero_copy_only=False),
                "fp": w.column("fp").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "fp": pa.array(df["fp"].to_numpy(), pa.int64()),
                "is_eval": pa.array(
                    (df["doc_id"].to_numpy() % _DECON_SPLIT_MOD == 0), pa.bool_()
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        ev = df.loc[df["is_eval"], "fp"].unique()
        hit = df[~df["is_eval"] & df["fp"].isin(ev)][["doc_id", "fp"]].drop_duplicates()
        return pa.table(
            {
                "doc_id": pa.array(hit["doc_id"].to_numpy(), pa.int64()),
                "fp": pa.array(hit["fp"].to_numpy(), pa.int64()),
            }
        )

    pairs = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="fp",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [("doc_id", pa.int64()), ("fp", pa.int64()), ("is_eval", pa.bool_())]
        ),
    ).to_pandas()
    out = (
        pairs.groupby("doc_id", as_index=False)["fp"]
        .nunique()
        .rename(columns={"fp": "n_shared"})
    )
    out = out[out["n_shared"] >= _DECON_MIN_SHARED].sort_values("doc_id")
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "n_shared": pa.array(out["n_shared"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


SQL_WINNOW_DECONTAMINATE = f"""
WITH {_WINNOW_CTES},
     fp AS (SELECT DISTINCT sel.doc_id, gh.h AS fp
            FROM sel JOIN gh ON gh.doc_id = sel.doc_id AND gh.i = sel.pos),
     ev AS (SELECT DISTINCT fp FROM fp WHERE doc_id % {_DECON_SPLIT_MOD} = 0),
     tr AS (SELECT doc_id, fp FROM fp WHERE doc_id % {_DECON_SPLIT_MOD} <> 0)
SELECT tr.doc_id, CAST(count(DISTINCT tr.fp) AS BIGINT) AS n_shared
FROM tr JOIN ev USING (fp)
GROUP BY tr.doc_id HAVING count(DISTINCT tr.fp) >= {_DECON_MIN_SHARED}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Top event-type trigrams — sequential-pattern mining one step past
# `transitions` (bigrams): per-user time-ordered 3-grams.  One
# user-bucketed exchange (a user's history lands whole in one bucket,
# so the in-bucket shift is exact); per-bucket (e1,e2,e3,n) count
# partials → tiny keyed sum → global top-10 with deterministic
# tie-break.
# --------------------------------------------------------------------------


def q_event_trigrams(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)["event_type"]
        t = pd.DataFrame(
            {
                "e1": df["event_type"].to_numpy(),
                "e2": g.shift(-1).to_numpy(),
                "e3": g.shift(-2).to_numpy(),
            }
        ).dropna()
        c = t.groupby(["e1", "e2", "e3"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "e1": pa.array(c["e1"], pa.string()),
                "e2": pa.array(c["e2"], pa.string()),
                "e3": pa.array(c["e3"], pa.string()),
                "n": pa.array(c["n"].to_numpy(), pa.int64()),
            }
        )

    partials = _merge_partials(
        ds,
        key="user_id",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
                ("event_type", pa.string()),
            ]
        ),
    ).to_pandas()
    out = (
        partials.groupby(["e1", "e2", "e3"], as_index=False)["n"]
        .sum()
        .sort_values(["n", "e1", "e2", "e3"], ascending=[False, True, True, True])
        .head(10)
    )
    return pa.table(
        {
            "e1": pa.array(out["e1"], pa.string()),
            "e2": pa.array(out["e2"], pa.string()),
            "e3": pa.array(out["e3"], pa.string()),
            "n": pa.array(out["n"].to_numpy(), pa.int64()),
        }
    )


SQL_EVENT_TRIGRAMS = """
WITH s AS (SELECT user_id, event_type AS e1,
                  lead(event_type, 1) OVER w AS e2,
                  lead(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
     t AS (SELECT e1, e2, e3 FROM s WHERE e3 IS NOT NULL AND e2 IS NOT NULL)
SELECT e1, e2, e3, count(*) AS n FROM t GROUP BY 1, 2, 3
ORDER BY n DESC, e1, e2, e3 LIMIT 10
"""


# --------------------------------------------------------------------------
# Poisson-bootstrap 95% CI of mean document length — the DISTRIBUTED
# bootstrap (resampling-with-replacement can't shuffle at scale, but
# per-row Poisson(1) replicate weights are exchangeable with it and
# embarrassingly mergeable).  Weights derive from splitmix64(doc_id, r)
# via the inverse Poisson CDF — fully deterministic, no RNG state.
# Per batch: R exact integer (Σw, Σw·x) pairs; ONE R-row sum exchange;
# the driver takes percentiles over R replicate means.  Rows-only
# check (a 200-replicate hash bootstrap has no SQL analogue); CI
# coverage and width-shrink pinned by tests.
# --------------------------------------------------------------------------

_BOOT_R = 200


def _pois1_cdf() -> np.ndarray:
    """Poisson(1) inverse-CDF breakpoints P(K ≤ k), k = 0..7."""
    import math

    return np.cumsum([math.exp(-1.0) / math.factorial(k) for k in range(8)])


_POIS1 = _pois1_cdf()


def q_bootstrap_ci(sf_dir: str):
    from ..functions.sketches import _splitmix64

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        x = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        sw = np.zeros(_BOOT_R, np.int64)
        swx = np.zeros(_BOOT_R, np.int64)
        # one vectorized draw per replicate: u = h(doc_id, r)/2⁶⁴ →
        # inverse Poisson CDF; weights are small ints so both sums
        # stay exact int64 at any scale
        for r in range(_BOOT_R):
            h = _splitmix64(ids * np.uint64(_BOOT_R) + np.uint64(r))
            u = h.astype(np.float64) / 18446744073709551616.0
            w = np.searchsorted(_POIS1, u).astype(np.int64)
            sw[r] = w.sum()
            swx[r] = (w * x).sum()
        return pa.table(
            {
                "r": pa.array(np.arange(_BOOT_R, dtype=np.int64), pa.int64()),
                "sw": pa.array(sw, pa.int64()),
                "swx": pa.array(swx, pa.int64()),
            }
        )

    sums = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            keys=["r"],
            sum_cols=["sw", "swx"],
            schema=pa.schema(
                [("r", pa.int64()), ("sw", pa.int64()), ("swx", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values("r")
    )
    ok = sums["sw"].to_numpy() > 0
    means = sums["swx"].to_numpy()[ok] / sums["sw"].to_numpy()[ok]
    if not len(means):  # empty corpus → no bootstrap replicates exist
        return pa.schema(
            [
                ("n_replicates", pa.int64()),
                ("boot_mean", pa.float64()),
                ("ci_lo", pa.float64()),
                ("ci_hi", pa.float64()),
            ]
        ).empty_table()
    lo, hi = np.percentile(means, [2.5, 97.5])
    return pa.table(
        {
            "n_replicates": pa.array([int(ok.sum())], pa.int64()),
            "boot_mean": pa.array([round(float(means.mean()), 6)], pa.float64()),
            "ci_lo": pa.array([round(float(lo), 6)], pa.float64()),
            "ci_hi": pa.array([round(float(hi), 6)], pa.float64()),
        }
    )


SQL_PRETRAIN_PREP = f"""
WITH f AS (SELECT doc_id, text, lang,
                  len(string_split(text, ' ')) AS wc,
                  length(replace(text, ' ', '')) AS ns,
                  length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS al,
                  length(text) AS tot
           FROM documents),
     kept AS (SELECT doc_id, text, lang, wc FROM f
              WHERE wc >= {_GOPHER_WC_MIN} AND wc <= {_GOPHER_WC_MAX}
                AND ns >= {_GOPHER_MWL_MIN}*wc AND ns <= {_GOPHER_MWL_MAX}*wc
                AND 5*al >= 3*tot),
     w AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY text),
     d AS (SELECT k.lang, k.wc FROM kept k JOIN w ON k.doc_id = w.doc_id)
SELECT lang, count(*) AS n_docs, CAST(sum(wc) AS BIGINT) AS n_tokens
FROM d GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Embedding-compression + diverse-retrieval pair (similarity family;
# rows-only checks — random projections and greedy re-ranking have no
# SQL analogue; both are pinned by tests/test_round5_ops.py instead).
# --------------------------------------------------------------------------


def q_jl_projection(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    proj = sim.random_projection(ds, out_dim=16)

    def norms(b: pa.Table) -> pa.Table:
        col = b.column("proj").combine_chunks()
        flat = col.values.to_numpy(zero_copy_only=False)
        x = flat.reshape(b.num_rows, -1)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "proj_norm": pa.array(
                    np.round(np.sqrt((x * x).sum(axis=1)), 6), pa.float64()
                ),
            }
        )

    return _to_table_s(
        proj.map_batches(norms, batch_format="pyarrow"),
        pa.schema([("vec_id", pa.int64()), ("proj_norm", pa.float64())]),
    ).sort_by("vec_id")


def q_mmr_diverse(sf_dir: str):
    emb = pa.parquet.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    )
    if emb.num_rows == 0:  # no query vector exists on an empty lake
        return pa.schema(
            [("rank", pa.int32()), ("vec_id", pa.int64()), ("cosine", pa.float64())]
        ).empty_table()
    first = pc.min(emb.column("vec_id")).as_py()
    qv = emb.filter(pc.equal(emb.column("vec_id"), first)).column("embedding")[
        0
    ].as_py()
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return sim.mmr_topk(ds, qv, k=10, lam=0.5, fetch=128)


SQL_EWMA_USER = """
WITH RECURSIVE e AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events),
rec AS (
  SELECT user_id, rn, n, value AS ewma FROM e WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn, e.n, 0.5 * e.value + 0.5 * rec.ewma
  FROM e JOIN rec ON e.user_id = rec.user_id AND e.rn = rec.rn + 1)
SELECT user_id, CAST(n AS BIGINT) AS n_events, round(ewma, 6) AS ewma
FROM rec WHERE rn = n ORDER BY user_id
"""


# --------------------------------------------------------------------------
# TPC-H Q4-shaped order-priority check: orders in a 3-month window that
# have at least one LATE line (EXISTS semi-join), counted by priority.
# Adapted to this lake's schema the same way tpch_q21 was: no
# l_commitdate/l_receiptdate columns exist, so "late" means
# l_shipdate > o_orderdate + 45 days.  Scale shape: the EXISTS side
# collapses map-side (per-batch (orderkey, max ship) combiner — the
# read is ALREADY pruned to l_shipdate > window_lo + 45d, the earliest
# shipdate any qualifying line can have), then ONE bucketed exchange on
# orderkey merges it with the date-pruned orders; only
# (priority, count) partials leave the buckets.  Completes the 22/22
# TPC-H suite (reference analogue: SURVEY §2 join/agg families).
# --------------------------------------------------------------------------

_Q4_LATE_US = 45 * 24 * 3600 * 1_000_000


def q_tpch_q4(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo, hi = _dt.datetime(1996, 3, 1), _dt.datetime(1996, 6, 1)

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_shipdate"],
        filter=pads.field("l_shipdate") > lo + _dt.timedelta(days=45),
    )

    def li_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "k": b.column("l_orderkey"),
                    "ship_us": b.column("l_shipdate").cast(pa.int64()),
                }
            )
            .group_by("k")
            .aggregate([("ship_us", "max")])
        )
        n = g.num_rows
        return pa.table(
            {
                "k": g.column("k"),
                "ship_us": g.column("ship_us_max"),
                "od_us": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "prio": pa.array([""] * n, pa.string()),
            }
        )

    orders = _read_pq(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi),
    )

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "ship_us": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "od_us": b.column("o_orderdate").cast(pa.int64()),
                "prio": b.column("o_orderpriority"),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def exists_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["od_us"].to_numpy() >= 0
        o = b[is_order]
        # cross-batch (k, max ship) partials: keep the true max
        ship = b[~is_order].groupby("k", sort=False)["ship_us"].max()
        od = o["od_us"].to_numpy()
        ms = o["k"].map(ship).fillna(-1).to_numpy(dtype=np.int64)
        late = ms > od + _Q4_LATE_US
        cnt = o.loc[late].groupby("prio", sort=False).size()
        return pa.table(
            {
                "o_orderpriority": pa.array(cnt.index.to_numpy(), pa.string()),
                "order_count": pa.array(cnt.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    out = _sum_partials(
        _bucketed(both, "k", exists_bucket),
        ["o_orderpriority"],
        ["order_count"],
        pa.schema([("o_orderpriority", pa.string()), ("order_count", pa.int64())]),
    )
    return out.sort_by("o_orderpriority")


SQL_TPCH_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-03-01'
  AND o_orderdate <  TIMESTAMP '1996-06-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q12-shaped shipping-priority split: lines shipped in one year,
# counted per lineitem class with the order's priority bucketed
# high (1-URGENT/2-HIGH) vs low.  Adapted: this lake has no l_shipmode,
# so l_returnflag is the grouping column.  Scale shape (the q9 reduce-
# side join): lineitem is date-pruned AT THE READ and collapses per
# batch to (orderkey, flag, count) partials; orders contributes only
# (orderkey, is_high int8); ONE bucketed exchange on orderkey joins
# them and per-flag (high, low) count partials are all that leave.
# --------------------------------------------------------------------------

_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_tpch_q12(sf_dir: str):
    import datetime as _dt

    import pyarrow.dataset as pads

    lo, hi = _dt.datetime(1997, 1, 1), _dt.datetime(1998, 1, 1)

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_returnflag"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def li_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {"k": b.column("l_orderkey"), "flag": b.column("l_returnflag")}
            )
            .group_by(["k", "flag"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "flag": g.column("flag"),
                "n": g.column("count_all").cast(pa.int64()),
                "is_high": pa.array(np.full(g.num_rows, -1, np.int8), pa.int8()),
            }
        )

    orders = _read_pq(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])

    def order_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        hi_mask = pc.is_in(
            b.column("o_orderpriority"), value_set=pa.array(_Q12_HIGH)
        )
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "flag": pa.array([""] * n, pa.string()),
                "n": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "is_high": hi_mask.cast(pa.int8()),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def split_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["n"].to_numpy() < 0
        hi_by_k = b[is_order].set_index("k")["is_high"]
        li_rows = b[~is_order]
        # cross-batch (k, flag) partials: sum the counts
        li_rows = li_rows.groupby(["k", "flag"], sort=False, as_index=False)["n"].sum()
        li_rows["hi"] = li_rows["k"].map(hi_by_k)
        li_rows = li_rows[li_rows["hi"].notna()]
        hi_n = li_rows["hi"].to_numpy(dtype=np.int8)
        li_rows = li_rows.assign(
            high=np.where(hi_n == 1, li_rows["n"], 0),
            low=np.where(hi_n == 0, li_rows["n"], 0),
        )
        g = li_rows.groupby("flag", sort=False, as_index=False)[["high", "low"]].sum()
        return pa.table(
            {
                "l_returnflag": pa.array(g["flag"], pa.string()),
                "high_line_count": pa.array(g["high"].to_numpy(), pa.int64()),
                "low_line_count": pa.array(g["low"].to_numpy(), pa.int64()),
            }
        )

    out = _sum_partials(
        _bucketed(both, "k", split_bucket),
        ["l_returnflag"],
        ["high_line_count", "low_line_count"],
        pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("high_line_count", pa.int64()),
                ("low_line_count", pa.int64()),
            ]
        ),
    )
    return out.sort_by("l_returnflag")


SQL_TPCH_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Co-supply graph family: triangle counting (the Suri–Vassilvitskii /
# Cohen MapReduce construction) and degree distribution over the
# supplier co-supply graph (two suppliers are adjacent iff they supply
# the same part, restricted to low-quantity lines so the graph stays
# sparse).  Every stage is a bucketed O(edges)-row exchange:
#   pairs-per-part → global edge dedup → degrees → two reduce-side
#   degree joins → DEGREE-ORDERED orientation (each triangle then has
#   exactly ONE source node with out-edges to both others, and
#   out-degree is bounded by O(√m) — the published fix for the
#   "curse of the last reducer" wedge explosion at hub nodes) →
#   wedge/edge match → per-node count partials.
# Assumption documented for 100 TB: suppliers-per-part is bounded (a
# catalog invariant); the per-part pair fan-out is quadratic in THAT
# bound, never in the corpus.
# --------------------------------------------------------------------------

_TRI_QTY_MAX = 2.0


def _cosupply_edges(sf_dir: str) -> ray.data.Dataset:
    """Globally-distinct undirected co-supply edges ``(u, v)``, u < v."""
    import pyarrow.dataset as pads

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey"],
        filter=pads.field("l_quantity") <= _TRI_QTY_MAX,
    )

    def ps_partial(b: pa.Table) -> pa.Table:
        f = pd.DataFrame(
            {
                "p": b.column("l_partkey").to_numpy(zero_copy_only=False),
                "s": b.column("l_suppkey").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "p": pa.array(f["p"].to_numpy(), pa.int64()),
                "s": pa.array(f["s"].to_numpy(), pa.int64()),
            }
        )

    pairs = li.map_batches(ps_partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_part_pairs(df: pd.DataFrame) -> pa.Table:
        f = df[["p", "s"]].drop_duplicates()
        # vectorized within-part pair generation: self-merge on the part
        # key; bounded by (suppliers-per-part)² per part by assumption
        m = f.merge(f, on="p")
        m = m[m["s_x"] < m["s_y"]][["s_x", "s_y"]].drop_duplicates()
        return pa.table(
            {
                "u": pa.array(m["s_x"].to_numpy(), pa.int64()),
                "v": pa.array(m["s_y"].to_numpy(), pa.int64()),
            }
        )

    raw = _bucketed(pairs, "p", per_part_pairs)

    # the same (u, v) arises from every shared part: exact global dedup
    def dedup_uv(df: pd.DataFrame) -> pa.Table:
        f = df[["u", "v"]].drop_duplicates()
        return pa.table(
            {
                "u": pa.array(f["u"].to_numpy(), pa.int64()),
                "v": pa.array(f["v"].to_numpy(), pa.int64()),
            }
        )

    return _bucketed(raw, "u", dedup_uv)


_COSUPPLY_SQL_E = f"""
e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
      WHERE a.l_quantity <= {_TRI_QTY_MAX} AND b.l_quantity <= {_TRI_QTY_MAX})
"""


def _node_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """(node, deg) from a distinct edge list — per-batch count partials,
    one bucketed sum exchange; O(nodes) output rows."""

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                b.column("u").to_numpy(zero_copy_only=False),
                b.column("v").to_numpy(zero_copy_only=False),
            ]
        )
        nodes, counts = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "deg": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    partials = edges.map_batches(deg_partial, batch_format="pyarrow")

    def sum_deg(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("node", sort=False, as_index=False)["deg"].sum()
        return pa.table(
            {
                "node": pa.array(g["node"].to_numpy(), pa.int64()),
                "deg": pa.array(g["deg"].to_numpy(), pa.int64()),
            }
        )

    return _bucketed(partials, "node", sum_deg)


def q_degree_dist(sf_dir: str):
    degs = _node_degrees(_cosupply_edges(sf_dir))

    def hist_partial(b: pa.Table) -> pa.Table:
        d, n = np.unique(b.column("deg").to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "degree": pa.array(d, pa.int64()),
                "n_nodes": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    out = _sum_partials(
        degs.map_batches(hist_partial, batch_format="pyarrow"),
        ["degree"],
        ["n_nodes"],
        pa.schema([("degree", pa.int64()), ("n_nodes", pa.int64())]),
    )
    return out.sort_by("degree")


SQL_DEGREE_DIST = f"""
WITH {_COSUPPLY_SQL_E},
d AS (SELECT node, count(*) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node)
SELECT CAST(deg AS BIGINT) AS degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM d GROUP BY deg ORDER BY degree
"""


def _attach_deg(tagged: ray.data.Dataset, key: str, out_col: str) -> ray.data.Dataset:
    """Reduce-side degree join: ``tagged`` unions edge rows (deg < 0
    sentinel in ``out_col``) with degree rows, which carry -1 in the
    OTHER endpoint column — that is the discriminator; one bucketed
    exchange on ``key`` fills ``out_col``."""
    other = "u" if key == "v" else "v"

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        is_deg = df[other].to_numpy() < 0
        dmap = df[is_deg].set_index(key)[out_col]
        e = df[~is_deg].copy()
        e[out_col] = e[key].map(dmap).fillna(0).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(e["u"].to_numpy(), pa.int64()),
                "v": pa.array(e["v"].to_numpy(), pa.int64()),
                "du": pa.array(e["du"].to_numpy(dtype=np.int64), pa.int64()),
                "dv": pa.array(e["dv"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return _bucketed(tagged, key, per_bucket)


# local-path gate (the q_pagerank pattern): the DEDUPED co-supply edge
# list is O(parts × supplier-pairs-per-part) — tiny relative to
# lineitem — so below this byte size the orientation/wedge/match run
# as one in-process numpy pass instead of six bucketed exchanges
# (measured: 22.5 s → local at sf0.1); the distributed path below is
# the 100-TB shape and is pinned by its own forced-path test.
_TRI_LOCAL_MAX_BYTES = 64 << 20


_TRI_SCHEMA = pa.schema([("supp_node", pa.int64()), ("n_triangles", pa.int64())])


def _triangles_local(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _TRI_SCHEMA.empty_table()
    df = t.to_pandas()
    deg = pd.concat([df["u"], df["v"]]).value_counts()
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    du = df["u"].map(deg).to_numpy()
    dv = df["v"].map(deg).to_numpy()
    u_first = (du < dv) | ((du == dv) & (u < v))
    oe = pd.DataFrame(
        {
            "a": np.where(u_first, u, v),
            "b": np.where(u_first, v, u),
            "db": np.where(u_first, dv, du),
        }
    )
    m = oe.merge(oe, on="a")
    keep = (m["db_x"] < m["db_y"]) | ((m["db_x"] == m["db_y"]) & (m["b_x"] < m["b_y"]))
    w = m[keep]
    tri = w.merge(
        oe[["a", "b"]].rename(columns={"a": "b_x", "b": "b_y"}), on=["b_x", "b_y"]
    )
    corners = np.concatenate(
        [tri["b_x"].to_numpy(), tri["b_y"].to_numpy(), tri["a"].to_numpy()]
    )
    nodes, counts = np.unique(corners, return_counts=True)
    return pa.table(
        {
            "supp_node": pa.array(nodes.astype(np.int64), pa.int64()),
            "n_triangles": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def q_triangle_count(sf_dir: str):
    edges = _cosupply_edges(sf_dir).materialize()
    if edges.count() == 0:
        # a zero-block stream collects schema-less — keep the contract
        return _TRI_SCHEMA.empty_table()
    if (edges.size_bytes() or 0) <= _TRI_LOCAL_MAX_BYTES:
        out = _triangles_local(dd._collect(edges))
    else:
        out = _triangles_distributed(edges)
    return out.sort_by([("n_triangles", "descending"), ("supp_node", "ascending")])


def _oriented_edges(edges) -> ray.data.Dataset:
    """Degree-ordered orientation ``(a, b, da, db)`` with a = the
    smaller (deg, id) endpoint: the shared front half of the
    distributed triangle-count and edge-Jaccard paths — two
    reduce-side degree tag-union joins plus one vectorized orient
    pass.  Triangle counting only needs ``db`` (the wedge order);
    edge-Jaccard reads both degrees off the oriented edge row."""
    degs = _node_degrees(edges).materialize()

    def edge_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        neg = pa.array(np.full(n, -1, np.int64), pa.int64())
        return pa.table({"u": b.column("u"), "v": b.column("v"), "du": neg, "dv": neg})

    def deg_as(slot_key: str, slot_val: str):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            neg = pa.array(np.full(n, -1, np.int64), pa.int64())
            cols = {"u": neg, "v": neg, "du": neg, "dv": neg}
            cols[slot_key] = b.column("node")
            cols[slot_val] = b.column("deg").cast(pa.int64())
            return pa.table(
                {k: cols[k] for k in ("u", "v", "du", "dv")}
            )

        return f

    # deg rows keep u = -1 as the "I am a degree row" sentinel for the v
    # join, so the u-side join tags them via the v slot first
    with_dv = _attach_deg(
        edges.map_batches(edge_rows, batch_format="pyarrow").union(
            degs.map_batches(deg_as("v", "dv"), batch_format="pyarrow")
        ),
        "v",
        "dv",
    )
    with_both = _attach_deg(
        with_dv.union(degs.map_batches(deg_as("u", "du"), batch_format="pyarrow")),
        "u",
        "du",
    )

    # degree-ordered orientation: src = smaller (deg, id); strict total
    # order (ids are distinct), so the oriented graph is a DAG and every
    # triangle has exactly one 2-out-edge source node
    def orient(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        du = b.column("du").to_numpy(zero_copy_only=False)
        dv = b.column("dv").to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        return pa.table(
            {
                "a": pa.array(np.where(u_first, u, v), pa.int64()),
                "b": pa.array(np.where(u_first, v, u), pa.int64()),
                "da": pa.array(np.where(u_first, du, dv), pa.int64()),
                "db": pa.array(np.where(u_first, dv, du), pa.int64()),
            }
        )

    return with_both.map_batches(orient, batch_format="pyarrow")


def _wedge_edge_stream(oriented) -> ray.data.Dataset:
    """Union of apex wedges ``(x, y, z=apex)`` and closing-edge keys
    ``(x, y, z=-1)`` over a degree-oriented edge set — consumers bucket
    on x, match wedges against edges per bucket, and attribute each
    triangle their own way (corner counts vs per-edge counts)."""

    # wedges at each source a: pairs of out-neighbors ordered by the
    # SAME (deg, id) total order, so the closing edge — if it exists —
    # is oriented exactly (x → y); out-degree ≤ O(√m) bounds the
    # self-merge
    def wedges(df: pd.DataFrame) -> pa.Table:
        m = df.merge(df, on="a")
        keep = (m["db_x"] < m["db_y"]) | (
            (m["db_x"] == m["db_y"]) & (m["b_x"] < m["b_y"])
        )
        m = m[keep]
        return pa.table(
            {
                "x": pa.array(m["b_x"].to_numpy(), pa.int64()),
                "y": pa.array(m["b_y"].to_numpy(), pa.int64()),
                "z": pa.array(m["a"].to_numpy(), pa.int64()),
            }
        )

    wedge_rows = _bucketed(oriented, "a", wedges)

    def edge_keys(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "x": b.column("a"),
                "y": b.column("b"),
                "z": pa.array(np.full(n, -1, np.int64), pa.int64()),
            }
        )

    return wedge_rows.union(oriented.map_batches(edge_keys, batch_format="pyarrow"))


def _triangles_distributed(edges) -> pa.Table:
    oriented = _oriented_edges(edges).materialize()
    both = _wedge_edge_stream(oriented)

    # match wedges against edges on (x, y); each match is one triangle
    # {x, y, z} — emit +1 per corner, pre-summed per bucket
    def match(df: pd.DataFrame) -> pa.Table:
        is_edge = df["z"].to_numpy() < 0
        e = df[is_edge][["x", "y"]]
        w = df[~is_edge]
        tri = w.merge(e, on=["x", "y"])
        corners = np.concatenate(
            [tri["x"].to_numpy(), tri["y"].to_numpy(), tri["z"].to_numpy()]
        )
        nodes, counts = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "supp_node": pa.array(nodes, pa.int64()),
                "n_triangles": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return _sum_partials(
        _bucketed(both, "x", match),
        ["supp_node"],
        ["n_triangles"],
        pa.schema([("supp_node", pa.int64()), ("n_triangles", pa.int64())]),
    )


SQL_TRIANGLE_COUNT = f"""
WITH {_COSUPPLY_SQL_E},
tri AS (SELECT ab.u AS x, ab.v AS y, bc.v AS z
        FROM e ab JOIN e bc ON ab.v = bc.u
                  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
corners AS (SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
SELECT node AS supp_node, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY node ORDER BY n_triangles DESC, supp_node
"""


# --------------------------------------------------------------------------
# Edge-Jaccard neighborhood similarity (graph family): for every
# co-supply edge (u, v), J = |N(u)∩N(v)| / |N(u)∪N(v)|.  The
# intersection is exactly the triangle count THROUGH the edge, and
# |N(u)∪N(v)| = deg(u) + deg(v) − |N(u)∩N(v)| (u and v each sit in the
# union once, via the other's neighborhood) — so the whole operator is
# the triangle machinery with per-EDGE instead of per-CORNER
# attribution.  Scale shape: shares _oriented_edges (two reduce-side
# degree joins) and _wedge_edge_stream (out-degree ≤ O(√m) wedge
# self-merge) with q_triangle_count; the match stage emits the three
# canonical edges of each triangle pre-summed per bucket, edge rows
# carry their own degrees with common=0, and ONE summed exchange on
# (u, v) produces the final table — no all-pairs, no driver graph.
# Integer common/union columns keep the hash exact; jaccard is one
# IEEE division of exact int64s (bit-equal to DuckDB's DOUBLE divide).
# --------------------------------------------------------------------------

_EJ_SCHEMA = pa.schema(
    [
        ("u", pa.int64()),
        ("v", pa.int64()),
        ("common_neighbors", pa.int64()),
        ("union_neighbors", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)


def _edge_jaccard_finish(u, v, du, dv, common) -> pa.Table:
    """(u, v, deg, deg, common) int64 arrays → final sorted table."""
    union = du + dv - common
    t = pa.table(
        {
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "common_neighbors": pa.array(common, pa.int64()),
            "union_neighbors": pa.array(union, pa.int64()),
            # an edge forces du, dv ≥ 1 and common ≤ min(du, dv) − 1,
            # so union ≥ 2 — the divide is total
            "jaccard": pa.array(common.astype(np.float64) / union, pa.float64()),
        }
    )
    return t.sort_by(
        [("jaccard", "descending"), ("u", "ascending"), ("v", "ascending")]
    )


def _edge_jaccard_local(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _EJ_SCHEMA.empty_table()
    df = t.to_pandas()
    deg = pd.concat([df["u"], df["v"]]).value_counts()
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    du = df["u"].map(deg).to_numpy()
    dv = df["v"].map(deg).to_numpy()
    u_first = (du < dv) | ((du == dv) & (u < v))
    oe = pd.DataFrame(
        {
            "a": np.where(u_first, u, v),
            "b": np.where(u_first, v, u),
            "db": np.where(u_first, dv, du),
        }
    )
    m = oe.merge(oe, on="a")
    keep = (m["db_x"] < m["db_y"]) | ((m["db_x"] == m["db_y"]) & (m["b_x"] < m["b_y"]))
    w = m[keep]
    tri = w.merge(
        oe[["a", "b"]].rename(columns={"a": "b_x", "b": "b_y"}), on=["b_x", "b_y"]
    )
    x = tri["b_x"].to_numpy()
    y = tri["b_y"].to_numpy()
    z = tri["a"].to_numpy()
    eu = np.concatenate([np.minimum(x, y), np.minimum(x, z), np.minimum(y, z)])
    ev = np.concatenate([np.maximum(x, y), np.maximum(x, z), np.maximum(y, z)])
    cnt = (
        pd.DataFrame({"u": eu, "v": ev})
        .groupby(["u", "v"], sort=False)
        .size()
        .reset_index(name="common")
    )
    merged = df[["u", "v"]].merge(cnt, on=["u", "v"], how="left")
    common = merged["common"].fillna(0).to_numpy().astype(np.int64)
    return _edge_jaccard_finish(u, v, du.astype(np.int64), dv.astype(np.int64), common)


def _edge_jaccard_distributed(edges) -> pa.Table:
    oriented = _oriented_edges(edges).materialize()
    both = _wedge_edge_stream(oriented)

    _EJ_PART = pa.schema(
        [
            ("u", pa.int64()),
            ("v", pa.int64()),
            ("du", pa.int64()),
            ("dv", pa.int64()),
            ("common", pa.int64()),
        ]
    )

    # match wedges against edges on (x, y); each triangle {x, y, z}
    # credits its THREE canonical edges, pre-summed per bucket
    def match_edges(df: pd.DataFrame) -> pa.Table:
        is_edge = df["z"].to_numpy() < 0
        e = df[is_edge][["x", "y"]]
        w = df[~is_edge]
        tri = w.merge(e, on=["x", "y"])
        x = tri["x"].to_numpy()
        y = tri["y"].to_numpy()
        z = tri["z"].to_numpy()
        eu = np.concatenate([np.minimum(x, y), np.minimum(x, z), np.minimum(y, z)])
        ev = np.concatenate([np.maximum(x, y), np.maximum(x, z), np.maximum(y, z)])
        g = (
            pd.DataFrame({"u": eu, "v": ev})
            .groupby(["u", "v"], sort=False)
            .size()
            .reset_index(name="common")
        )
        n = len(g)
        zero = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table(
            {
                "u": pa.array(g["u"].to_numpy(), pa.int64()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
                "du": zero,
                "dv": zero,
                "common": pa.array(g["common"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    tri_partials = _bucketed(both, "x", match_edges)

    # every edge exactly once, back in canonical (min, max) id order,
    # carrying its endpoint degrees and common = 0
    def edge_deg_rows(b: pa.Table) -> pa.Table:
        a = b.column("a").to_numpy(zero_copy_only=False)
        bb = b.column("b").to_numpy(zero_copy_only=False)
        da = b.column("da").to_numpy(zero_copy_only=False)
        db = b.column("db").to_numpy(zero_copy_only=False)
        a_first = a < bb
        n = len(a)
        return pa.table(
            {
                "u": pa.array(np.where(a_first, a, bb), pa.int64()),
                "v": pa.array(np.where(a_first, bb, a), pa.int64()),
                "du": pa.array(np.where(a_first, da, db), pa.int64()),
                "dv": pa.array(np.where(a_first, db, da), pa.int64()),
                "common": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    summed = _sum_partials(
        tri_partials.union(
            oriented.map_batches(edge_deg_rows, batch_format="pyarrow")
        ),
        ["u", "v"],
        ["du", "dv", "common"],
        _EJ_PART,
    )
    return _edge_jaccard_finish(
        summed.column("u").to_numpy(zero_copy_only=False),
        summed.column("v").to_numpy(zero_copy_only=False),
        summed.column("du").to_numpy(zero_copy_only=False),
        summed.column("dv").to_numpy(zero_copy_only=False),
        summed.column("common").to_numpy(zero_copy_only=False),
    )


def q_edge_jaccard(sf_dir: str):
    edges = _cosupply_edges(sf_dir).materialize()
    if edges.count() == 0:
        return _EJ_SCHEMA.empty_table()
    if (edges.size_bytes() or 0) <= _TRI_LOCAL_MAX_BYTES:
        return _edge_jaccard_local(dd._collect(edges))
    return _edge_jaccard_distributed(edges)


SQL_EDGE_JACCARD = f"""
WITH {_COSUPPLY_SQL_E},
d AS (SELECT node, count(*) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node),
tri AS (SELECT ab.u AS x, ab.v AS y, bc.v AS z
        FROM e ab JOIN e bc ON ab.v = bc.u
                  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
c AS (SELECT u, v, count(*) AS common FROM (
        SELECT x AS u, y AS v FROM tri
        UNION ALL SELECT x, z FROM tri
        UNION ALL SELECT y, z FROM tri)
      GROUP BY u, v)
SELECT e.u, e.v,
       CAST(COALESCE(c.common, 0) AS BIGINT)                        AS common_neighbors,
       CAST(du.deg + dv.deg - COALESCE(c.common, 0) AS BIGINT)      AS union_neighbors,
       CAST(COALESCE(c.common, 0) AS DOUBLE)
         / CAST(du.deg + dv.deg - COALESCE(c.common, 0) AS DOUBLE)  AS jaccard
FROM e
JOIN d du ON du.node = e.u
JOIN d dv ON dv.node = e.v
LEFT JOIN c ON c.u = e.u AND c.v = e.v
ORDER BY jaccard DESC, e.u, e.v
"""


# --------------------------------------------------------------------------
# Market-basket frequent pairs (the A-Priori pair pass): parts
# co-ordered in the same order, support-counted, thresholded.  Scale
# shape: per-batch distinct (order, part) partials → ONE bucketed
# exchange on orderkey where the per-order pair fan-out is quadratic
# only in lines-per-order (a schema invariant, ≤ a dozen — the same
# bounded-basket assumption every A-Priori implementation documents)
# and pairs are PRE-COUNTED per bucket → a (p1, p2, support) partial
# sum whose exchange carries O(distinct pairs) rows; the support
# threshold prunes before the final sort.
# --------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 3


def q_copurchase_pairs(sf_dir: str):
    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def op_partial(b: pa.Table) -> pa.Table:
        f = pd.DataFrame(
            {
                "o": b.column("l_orderkey").to_numpy(zero_copy_only=False),
                "p": b.column("l_partkey").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "o": pa.array(f["o"].to_numpy(), pa.int64()),
                "p": pa.array(f["p"].to_numpy(), pa.int64()),
            }
        )

    pairs_in = li.map_batches(op_partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_order_pairs(df: pd.DataFrame) -> pa.Table:
        f = df[["o", "p"]].drop_duplicates()
        m = f.merge(f, on="o")
        m = m[m["p_x"] < m["p_y"]]
        g = m.groupby(["p_x", "p_y"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "p1": pa.array(g["p_x"].to_numpy(), pa.int64()),
                "p2": pa.array(g["p_y"].to_numpy(), pa.int64()),
                "support": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    counted = _sum_partials(
        _bucketed(pairs_in, "o", per_order_pairs),
        ["p1", "p2"],
        ["support"],
        pa.schema([("p1", pa.int64()), ("p2", pa.int64()), ("support", pa.int64())]),
    )
    out = counted.filter(
        pc.greater_equal(counted.column("support"), _BASKET_MIN_SUPPORT)
    )
    return out.sort_by(
        [("support", "descending"), ("p1", "ascending"), ("p2", "ascending")]
    )


SQL_COPURCHASE_PAIRS = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (SELECT a.p AS p1, c.p AS p2 FROM b a JOIN b c ON a.o = c.o AND a.p < c.p)
SELECT p1, p2, CAST(count(*) AS BIGINT) AS support
FROM pr GROUP BY p1, p2
HAVING count(*) >= {_BASKET_MIN_SUPPORT}
ORDER BY support DESC, p1, p2
"""


# --------------------------------------------------------------------------
# Reconciliation audit (data-quality family): the 20 orders whose
# header total diverges most from the sum of their lines' charged
# amount (price × (1−disc) × (1+tax)).  A 2dp × 2dp × 2dp product has
# EXACTLY 6 decimals, so ×10⁶ int64 "micro-money" makes every partial
# sum and the final diff summation-order-proof (the _money_i4 lesson,
# one decimal wider).  Scale shape: lineitem collapses per batch to
# (orderkey, Σ micro) partials, ONE bucketed exchange joins the order
# headers (left — headerless lines and line-less headers both audit),
# each bucket emits only its local top-20, and the driver merges
# 20 × buckets rows.
# --------------------------------------------------------------------------

_RECON_TOPK = 20


def _micro_i6(price, disc, tax) -> pa.Array:
    v = (
        price.to_numpy(zero_copy_only=False)
        * (1.0 - disc.to_numpy(zero_copy_only=False))
        * (1.0 + tax.to_numpy(zero_copy_only=False))
    )
    return pa.array(np.rint(v * 1e6).astype(np.int64), pa.int64())


def q_order_reconcile(sf_dir: str):
    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    )

    def li_partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "k": b.column("l_orderkey"),
                    "m": _micro_i6(
                        b.column("l_extendedprice"),
                        b.column("l_discount"),
                        b.column("l_tax"),
                    ),
                }
            )
            .group_by("k")
            .aggregate([("m", "sum")])
        )
        return pa.table(
            {
                "k": g.column("k"),
                "m": g.column("m_sum"),
                "total": pa.array(np.full(g.num_rows, -1, np.int64), pa.int64()),
            }
        )

    orders = _read_pq(_t(sf_dir, "orders"), columns=["o_orderkey", "o_totalprice"])

    def order_rows(b: pa.Table) -> pa.Table:
        t = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)
        n = b.num_rows
        return pa.table(
            {
                "k": b.column("o_orderkey"),
                "m": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "total": pa.array(t, pa.int64()),
            }
        )

    both = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(order_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def recon_bucket(b: pd.DataFrame) -> pa.Table:
        is_order = b["total"].to_numpy() >= 0
        o = b[is_order]
        lines = b[~is_order].groupby("k", sort=False)["m"].sum()
        lm = o["k"].map(lines).fillna(0).astype(np.int64)
        df = pd.DataFrame(
            {
                "o_orderkey": o["k"].to_numpy(),
                "total_micro": o["total"].to_numpy(),
                "lines_micro": lm.to_numpy(),
            }
        )
        df["diff_micro"] = df["lines_micro"] - df["total_micro"]
        df["_a"] = df["diff_micro"].abs()
        df = df.sort_values(["_a", "o_orderkey"], ascending=[False, True], kind="mergesort").head(
            _RECON_TOPK
        )
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(), pa.int64()),
                "total_micro": pa.array(df["total_micro"].to_numpy(), pa.int64()),
                "lines_micro": pa.array(df["lines_micro"].to_numpy(), pa.int64()),
                "diff_micro": pa.array(df["diff_micro"].to_numpy(), pa.int64()),
            }
        )

    partials = _to_table_s(
        _bucketed(both, "k", recon_bucket),
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("total_micro", pa.int64()),
                ("lines_micro", pa.int64()),
                ("diff_micro", pa.int64()),
            ]
        ),
    ).to_pandas()
    partials["_a"] = partials["diff_micro"].abs()
    out = partials.sort_values(
        ["_a", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(_RECON_TOPK)
    return pa.table(
        {
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy(), pa.int64()),
            "total_micro": pa.array(out["total_micro"].to_numpy(), pa.int64()),
            "lines_micro": pa.array(out["lines_micro"].to_numpy(), pa.int64()),
            "diff_micro": pa.array(out["diff_micro"].to_numpy(), pa.int64()),
        }
    )


SQL_ORDER_RECONCILE = f"""
WITH ls AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        * 1000000) AS BIGINT)) AS BIGINT) AS lines_micro
  FROM lineitem GROUP BY 1)
SELECT o_orderkey,
       CAST(round(o_totalprice * 1000000) AS BIGINT) AS total_micro,
       COALESCE(lines_micro, 0) AS lines_micro,
       COALESCE(lines_micro, 0)
         - CAST(round(o_totalprice * 1000000) AS BIGINT) AS diff_micro
FROM orders LEFT JOIN ls ON o_orderkey = l_orderkey
ORDER BY abs(COALESCE(lines_micro, 0)
         - CAST(round(o_totalprice * 1000000) AS BIGINT)) DESC, o_orderkey
LIMIT {_RECON_TOPK}
"""


# --------------------------------------------------------------------------
# Daily resample with calendar gap-fill (time-series family): per
# (user, day) event count + value sum, with every missing day between
# a user's first and last day emitted as an explicit zero row — the
# densification step every downstream window/autocorr consumer needs.
# Scale shape: per-batch (user, day, n, Σv) combiner partials → ONE
# bucketed exchange on user_id; the calendar expansion inside the
# bucket is fully vectorized (repeat/cumsum arange — no per-user
# Python loop) and output is O(users × span-days), the fill's
# irreducible size.
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_resample_daily(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "day": day,
                    "v": b.column("value").to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["user_id", "day"], sort=False)
            .agg(n=("v", "size"), v=("v", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "v": pa.array(g["v"].to_numpy(), pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def fill_bucket(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["user_id", "day"], sort=False, as_index=False).agg(
            n=("n", "sum"), v=("v", "sum")
        )
        span = g.groupby("user_id", sort=False).agg(mind=("day", "min"), maxd=("day", "max"))
        lens = (span["maxd"] - span["mind"] + 1).to_numpy()
        total = int(lens.sum())
        users = np.repeat(span.index.to_numpy(), lens)
        offs = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
        days = offs + np.repeat(span["mind"].to_numpy(), lens)
        cal = pd.DataFrame({"user_id": users, "day": days})
        m = cal.merge(g, on=["user_id", "day"], how="left")
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(m["day"].to_numpy(), pa.int64()),
                "n_events": pa.array(
                    m["n"].fillna(0).to_numpy(dtype=np.int64), pa.int64()
                ),
                "day_value": pa.array(
                    np.round(m["v"].fillna(0.0).to_numpy(), 6), pa.float64()
                ),
            }
        )

    out = _to_table_s(
        _bucketed(partials, "user_id", fill_bucket),
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("day", pa.int64()),
                ("n_events", pa.int64()),
                ("day_value", pa.float64()),
            ]
        ),
    )
    return out.sort_by([("user_id", "ascending"), ("day", "ascending")])


SQL_RESAMPLE_DAILY = """
WITH d AS (SELECT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                  count(*) AS n, sum(value) AS v
           FROM events GROUP BY 1, 2),
span AS (SELECT user_id, min(day) AS mind, max(day) AS maxd FROM d GROUP BY 1),
cal AS (SELECT user_id, unnest(generate_series(mind, maxd)) AS day FROM span)
SELECT cal.user_id, cal.day,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
       round(COALESCE(d.v, 0.0), 6) AS day_value
FROM cal LEFT JOIN d USING (user_id, day)
ORDER BY user_id, day
"""


# --------------------------------------------------------------------------
# Grid-bucketed DBSCAN (density clustering — rows-only: no SQL
# analogue).  See stages/similarity.py::dbscan_2d for the construction;
# the summary here is a mergeable (cluster, count) combiner so the
# O(points) assignment table never reaches the driver.
# --------------------------------------------------------------------------


def q_dbscan(sf_dir: str):
    db_schema = pa.schema([("cluster", pa.int64()), ("n_points", pa.int64())])
    if pa.parquet.read_metadata(_t(sf_dir, "embeddings")).num_rows == 0:
        return db_schema.empty_table()
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    assign = sim.dbscan_2d(ds, min_pts=8)

    def size_partial(b: pa.Table) -> pa.Table:
        c, n = np.unique(
            b.column("cluster").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "cluster": pa.array(c, pa.int64()),
                "n_points": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    out = _sum_partials(
        assign.map_batches(size_partial, batch_format="pyarrow"),
        ["cluster"],
        ["n_points"],
        pa.schema([("cluster", pa.int64()), ("n_points", pa.int64())]),
    )
    return out.sort_by([("n_points", "descending"), ("cluster", "ascending")])


# --------------------------------------------------------------------------
# KLL rank sketch quantiles (Karnin–Lang–Liberty) — the principled
# mergeable quantile structure next to the fixed-bin histogram of
# q_approx_percentiles: one small compactor sketch per batch crosses
# the exchange (O(k·log(n/k)) floats, never O(rows)), the driver
# merges partials in a SORTED deterministic order, and rank error
# ≤2% of n is pinned by test.  Rows-only (approximate by design).
# --------------------------------------------------------------------------

_KLL_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_kll_quantiles(sf_dir: str):
    from ..functions import sketches as sk

    ds = _read_pq(_t(sf_dir, "documents"), columns=["n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        s = sk.kll_new()
        sk.kll_update(s, b.column("n_chars").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "sketch": pa.array(
                    [sk.kll_serialize(s)], pa.list_(pa.list_(pa.float64()))
                )
            }
        )

    parts = _to_table(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    )
    payloads = parts.column("sketch").to_pylist() if parts.num_rows else []
    # block arrival order is nondeterministic — fix the merge order
    payloads.sort(key=lambda p: (len(p), p[-1], p[0][:8] if p[0] else []))
    merged = None
    for p in payloads:
        s = sk.kll_deserialize(p)
        merged = s if merged is None else sk.kll_merge(merged, s)
    if merged is None:
        est = np.full(len(_KLL_QS), np.nan)
    else:
        est = sk.kll_quantiles(merged, _KLL_QS)
    return pa.table(
        {
            "q": pa.array(list(_KLL_QS), pa.float64()),
            "n_chars_est": pa.array(est, pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# rolling anomaly flags — per-user daily-spend spikes: |x − μ_win| >
# 2σ_win over the trailing window of the last _RANOM_W OBSERVED days
# (a ROWS frame, matching the SQL oracle).  The whole test is integer:
# (n·x − S)² > 4·(n·Q − S²) over exact cent sums, so no float ever
# crosses an engine boundary.  Shape: per-batch (user, day) cent/cent²
# partials → ONE bucketed exchange of O(users × days) rows → the
# rolling window runs vectorized inside each user bucket (cumsum
# differences, never pandas .rolling — which would silently cast the
# exact int64 sums to float64).  int64 bound: daily user cents < 4.3e8
# keeps n·Q ≤ 49·c² inside int64 (SQL side auto-promotes to HUGEINT).
# --------------------------------------------------------------------------

_RANOM_W, _RANOM_MIN_N = 7, 4


def q_rolling_anomaly(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        us = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        f = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "day_id": us // _DAY_US,
                "cents": _event_cents(b),
            }
        )
        g = f.groupby(["user_id", "day_id"], sort=False, as_index=False).sum()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day_id": pa.array(g["day_id"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    daily = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["user_id", "day_id"],
        sum_cols=["cents"],
        schema=pa.schema(
            [("user_id", pa.int64()), ("day_id", pa.int64()), ("cents", pa.int64())]
        ),
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("day_id", pa.int64()),
                ("cents", pa.int64()),
                ("win_n", pa.int64()),
                ("win_sum", pa.int64()),
                ("win_sumsq", pa.int64()),
            ]
        )
        b = b[b.columns.difference(["_bucket"], sort=False)]
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "day_id"])
        u = b["user_id"].to_numpy()
        x = b["cents"].to_numpy()
        xsq = x * x
        # row index within each user's day-ordered run
        newgrp = np.r_[True, u[1:] != u[:-1]]
        start = np.flatnonzero(newgrp)
        runlen = np.diff(np.r_[start, len(u)])
        gidx = np.arange(len(u)) - np.repeat(start, runlen)
        # trailing-window sums as exact cumsum differences: window is
        # rows j..i with j = i - min(gidx, W-1)
        cs, csq = np.cumsum(x), np.cumsum(xsq)
        j = np.arange(len(u)) - np.minimum(gidx, _RANOM_W - 1)
        S = cs - cs[j] + x[j]
        Q = csq - csq[j] + xsq[j]
        n = np.minimum(gidx, _RANOM_W - 1) + 1
        d = n * x - S
        flag = (n >= _RANOM_MIN_N) & (d * d > 4 * (n * Q - S * S))
        return pa.table(
            {
                "user_id": pa.array(u[flag], pa.int64()),
                "day_id": pa.array(b["day_id"].to_numpy()[flag], pa.int64()),
                "cents": pa.array(x[flag], pa.int64()),
                "win_n": pa.array(n[flag], pa.int64()),
                "win_sum": pa.array(S[flag], pa.int64()),
                "win_sumsq": pa.array(Q[flag], pa.int64()),
            }
        )

    out = _bucketed(ray.data.from_arrow(daily), "user_id", per_bucket)
    return _to_table(out)


SQL_ROLLING_ANOMALY = f"""
WITH m AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id, day_id),
w AS (
  SELECT user_id, day_id, cents,
         count(*) OVER fr AS win_n,
         sum(cents) OVER fr AS win_sum,
         sum(cents * cents) OVER fr AS win_sumsq
  FROM m WINDOW fr AS (PARTITION BY user_id ORDER BY day_id
                       ROWS BETWEEN {_RANOM_W - 1} PRECEDING AND CURRENT ROW))
SELECT user_id, day_id, cents,
       CAST(win_n AS BIGINT) AS win_n,
       CAST(win_sum AS BIGINT) AS win_sum,
       CAST(win_sumsq AS BIGINT) AS win_sumsq
FROM w
WHERE win_n >= {_RANOM_MIN_N}
  AND (win_n * cents - win_sum) * (win_n * cents - win_sum)
      > 4 * (win_n * win_sumsq - win_sum * win_sum)
"""


# --------------------------------------------------------------------------
# Welch two-sample t — each language's n_chars vs the REST of the
# corpus, from mergeable integer moment partials (n, Σx, Σx²): the
# exchange carries O(langs × batches) rows at any corpus size and the
# t/df floats are derived on both engines from the SAME exact integers
# through the SAME expression tree (every op IEEE correctly-rounded →
# identical doubles; round(…, 6) on top).  int64 bound: Σ n_chars²
# needs n_chars² × rows < 2⁶³ (DuckDB auto-promotes to HUGEINT; the
# Ray side sums per-batch int64 then Python unbounded ints on merge).
# --------------------------------------------------------------------------


def q_welch_t(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        x = b.column("n_chars").to_numpy(zero_copy_only=False)
        f = pd.DataFrame({"lang": b.column("lang").to_numpy(zero_copy_only=False)})
        f["n"], f["s"], f["q"] = 1, x, x * x
        g = f.groupby("lang", sort=False, as_index=False).sum()
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "s": pa.array(g["s"].to_numpy(), pa.int64()),
                "q": pa.array(g["q"].to_numpy(), pa.int64()),
            }
        )

    mom = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["lang"],
        sum_cols=["n", "s", "q"],
        schema=pa.schema(
            [
                ("lang", pa.string()),
                ("n", pa.int64()),
                ("s", pa.int64()),
                ("q", pa.int64()),
            ]
        ),
    ).to_pandas()
    tn, ts_, tq = (int(mom[c].sum()) for c in ("n", "s", "q"))
    langs, n_l, n_r, tstat, dof = [], [], [], [], []
    for _, r in mom.sort_values("lang").iterrows():
        # float derivation mirrors SQL_WELCH_T term by term
        n1, s1, q1 = float(r["n"]), float(r["s"]), float(r["q"])
        n2, s2, q2 = float(tn - r["n"]), float(ts_ - r["s"]), float(tq - r["q"])
        if n1 < 2 or n2 < 2:
            continue
        m1, m2 = s1 / n1, s2 / n2
        v1 = (q1 - s1 * s1 / n1) / (n1 - 1)
        v2 = (q2 - s2 * s2 / n2) / (n2 - 1)
        se2 = v1 / n1 + v2 / n2
        if not se2 > 0:
            continue
        langs.append(r["lang"])
        n_l.append(int(r["n"]))
        n_r.append(tn - int(r["n"]))
        tstat.append(round((m1 - m2) / math.sqrt(se2), 6))
        dof.append(
            round(
                (se2 * se2)
                / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)),
                6,
            )
        )
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_lang": pa.array(n_l, pa.int64()),
            "n_rest": pa.array(n_r, pa.int64()),
            "t_stat": pa.array(tstat, pa.float64()),
            "df": pa.array(dof, pa.float64()),
        }
    )


SQL_WELCH_T = """
WITH m AS (SELECT lang, count(*) AS n, sum(n_chars) AS s,
                  sum(n_chars * n_chars) AS q
           FROM documents GROUP BY lang),
tot AS (SELECT sum(n) AS n, sum(s) AS s, sum(q) AS q FROM m),
p AS (SELECT m.lang, m.n AS n_i,
             CAST(m.n AS DOUBLE) AS n1, CAST(m.s AS DOUBLE) AS s1,
             CAST(m.q AS DOUBLE) AS q1,
             CAST(tot.n - m.n AS DOUBLE) AS n2,
             CAST(tot.s - m.s AS DOUBLE) AS s2,
             CAST(tot.q - m.q AS DOUBLE) AS q2,
             CAST(tot.n AS BIGINT) AS n_tot
      FROM m, tot),
v AS (SELECT lang, n_i, n_tot, n1, n2,
             s1 / n1 AS m1, s2 / n2 AS m2,
             (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
             (q2 - s2 * s2 / n2) / (n2 - 1) AS v2
      FROM p WHERE n1 >= 2 AND n2 >= 2)
SELECT lang, CAST(n_i AS BIGINT) AS n_lang,
       CAST(n_tot - n_i AS BIGINT) AS n_rest,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       round(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS df
FROM v WHERE (v1 / n1 + v2 / n2) > 0
"""


# --------------------------------------------------------------------------
# exact substring-CONTAINMENT dedup — drop documents whose full text
# occurs verbatim inside another document (the arbitrary-alignment
# complement of q_dup_spans' stride-aligned window scan; Lee et al.
# 2021 exact-substring family).  Returns (doc_id, n_containers) for
# every contained doc, matching position(a.text IN b.text) > 0.
#
# Construction (Rabin-Karp, exact):
#   1. anchor index — one map pass emits per-doc (anchor_h = 64-bit
#      polynomial hash of the first _CONTAIN_A UTF-8 bytes, byte len,
#      two independent keyed siphash64s of the FULL text = a 128-bit
#      identity).  O(docs) rows, ~40 B each, collected once and
#      broadcast via ray.put.  For lakes where even this index
#      outgrows the driver, the same construction holds with the
#      index sharded across an actor set — documented fallback, not
#      wired (the decontaminate / pair_texts precedent).
#   2. scan — per batch, the Arrow string column's own value buffer
#      IS the concatenated UTF-8 bytes (zero-copy); ONE vectorized
#      uint64 rolling-hash pass scores every byte offset
#      (S-cumsum × modular-inverse-of-B powers, everything wrapping
#      mod 2^64), boundary-masked so windows never straddle docs.
#      Probe = searchsorted into the broadcast anchor array;
#      equal-anchor runs expand via repeat/cumsum (no row loop).
#      Transient scan memory ≈ 40 B per text byte per batch.
#   3. verify — surviving (position, candidate) pairs re-hash the
#      container's byte slice with both siphash keys and compare to
#      the candidate's full-text identity: a match is exact equality
#      up to 2^-128 collision odds (the q_dup_spans exactness
#      standard).  No text ever crosses an exchange.
#   Candidates shorter than _CONTAIN_A bytes can't be anchored and go
#   through a literal match_substring pass (decontaminate shape);
#   empty texts are contained in every other doc by SQL semantics
#   (position('' IN x) = 1) and are closed-form: n_containers = N-1.
#   The broadcast is chunked at _CONTAIN_CHUNK candidates per scan
#   pass, so anchor-set size bounds memory, never correctness.
# Final exchange: only (doc_id, n_containers) partials — a container
# doc lives in exactly one batch, so per-batch distinct-container
# counts sum to the global count.
# --------------------------------------------------------------------------

_CONTAIN_A = 16                     # anchor length, UTF-8 bytes
# candidates broadcast per scan pass: 40 B each → ~170 MB of object
# store per pass; every doc is a candidate, so at 1e9 docs this is
# ~250 corpus passes — the honest broadcast-memory/pass-count
# trade-off (measured: 16 passes of the 1M-doc lake cost 130 s vs
# ~10 s in one pass)
_CONTAIN_CHUNK = 1 << 22
_CONTAIN_B = np.uint64(1000003)     # odd → invertible mod 2^64
_CONTAIN_BINV = np.uint64(pow(1000003, -1, 2**64))
_CONTAIN_K1, _CONTAIN_K2 = "contain-sip-key1", "contain-sip-key2"
_CONTAIN_BM_BITS = 26               # anchor-presence bitmap (64 MB bool)

# per-worker power-table cache: uint64 multiply.accumulate costs
# ~150 ns/element (no SIMD path), i.e. ~1.3 s per 6.5 MB batch if
# rebuilt per call — the tables depend only on position, so build
# once per worker and grow on demand
_contain_pows: dict[str, np.ndarray] = {}


def _contain_pow(kind: str, n: int) -> np.ndarray:
    arr = _contain_pows.get(kind)
    if arr is None or len(arr) < n:
        size = max(n, 1 << 20)
        base = _CONTAIN_B if kind == "bpow" else _CONTAIN_BINV
        arr = np.ones(size, dtype=np.uint64)
        with np.errstate(over="ignore"):
            np.multiply.accumulate(
                np.full(size - 1, base, dtype=np.uint64), out=arr[1:]
            )
        _contain_pows[kind] = arr
    return arr[:n]


def _contain_buffers(batch: pa.Table):
    """(ids, byte_offsets, uint8 data, per-doc byte lengths) of the
    batch's text column — the value buffer is the zero-copy
    concatenation of all UTF-8 texts."""
    arr = pc.cast(
        pc.cast(batch.column("text"), pa.large_string()), pa.large_binary()
    ).combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    return ids, offs, data, np.diff(offs), arr


def q_contained_dedup(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    bpA = np.ones(_CONTAIN_A, dtype=np.uint64)
    np.multiply.accumulate(
        np.full(_CONTAIN_A - 1, _CONTAIN_B, dtype=np.uint64), out=bpA[1:]
    )

    def anchor_partial(batch: pa.Table) -> pa.Table:
        ids, offs, data, blen, arr = _contain_buffers(batch)
        obj = arr.to_numpy(zero_copy_only=False)  # object array of bytes
        fh1 = pd.util.hash_array(obj, hash_key=_CONTAIN_K1).view(np.int64)
        fh2 = pd.util.hash_array(obj, hash_key=_CONTAIN_K2).view(np.int64)
        long = blen >= _CONTAIN_A
        anchor = np.zeros(len(ids), dtype=np.uint64)
        if long.any():
            pref = data[
                offs[:-1][long][:, None] + np.arange(_CONTAIN_A)[None, :]
            ].astype(np.uint64)
            with np.errstate(over="ignore"):
                anchor[long] = (pref * bpA[None, :]).sum(axis=1, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "blen": pa.array(blen, pa.int64()),
                "anchor": pa.array(anchor.view(np.int64), pa.int64()),
                "fh1": pa.array(fh1, pa.int64()),
                "fh2": pa.array(fh2, pa.int64()),
            }
        )

    idx_tb = _to_table_s(
        ds.map_batches(anchor_partial, batch_format="pyarrow", zero_copy_batch=True),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("blen", pa.int64()),
                ("anchor", pa.int64()),
                ("fh1", pa.int64()),
                ("fh2", pa.int64()),
            ]
        ),
    )
    blen_all = idx_tb.column("blen").to_numpy(zero_copy_only=False)
    n_total = idx_tb.num_rows
    # sort the anchor index in UNSIGNED hash space (the scan probes
    # uint64 views — an int64 sort would break searchsorted)
    long_tb = idx_tb.filter(pa.array(blen_all >= _CONTAIN_A))
    la = long_tb.column("anchor").to_numpy(zero_copy_only=False).view(np.uint64)
    lorder = np.argsort(la, kind="stable")
    l_anchor = la[lorder]
    l_id = long_tb.column("doc_id").to_numpy(zero_copy_only=False)[lorder]
    l_len = long_tb.column("blen").to_numpy(zero_copy_only=False)[lorder]
    l_f1 = long_tb.column("fh1").to_numpy(zero_copy_only=False)[lorder]
    l_f2 = long_tb.column("fh2").to_numpy(zero_copy_only=False)[lorder]
    short_tb = idx_tb.filter(
        pa.array((blen_all > 0) & (blen_all < _CONTAIN_A))
    )
    parts: list[pa.Table] = []
    pair_schema = pa.schema([("doc_id", pa.int64()), ("n_containers", pa.int64())])

    # empty texts: contained in every other doc, closed form
    n_empty = int((blen_all == 0).sum())
    if n_empty:
        empt = idx_tb.filter(pa.array(blen_all == 0))
        parts.append(
            pa.table(
                {
                    "doc_id": empt.column("doc_id"),
                    "n_containers": pa.array(
                        np.full(n_empty, n_total - 1, dtype=np.int64), pa.int64()
                    ),
                }
            )
        )

    def scan_pass(sl: slice, shorts: list[tuple[int, str]]):
        a_chunk = l_anchor[sl]
        bitmap = np.zeros(1 << _CONTAIN_BM_BITS, dtype=bool)
        if len(a_chunk):
            bitmap[a_chunk & np.uint64((1 << _CONTAIN_BM_BITS) - 1)] = True
        ref = ray.put(
            (a_chunk, l_id[sl], l_len[sl], l_f1[sl], l_f2[sl], bitmap, shorts)
        )

        def scan(batch: pa.Table) -> pa.Table:
            a_srt, cid, clen, cf1, cf2, bm, shorts = ray.get(ref)
            ids, offs, data, blen, _arr = _contain_buffers(batch)
            pair_c, pair_k = [], []
            n = len(data)
            npos = n - _CONTAIN_A + 1
            if npos > 0 and len(a_srt):
                with np.errstate(over="ignore"):
                    x = data.astype(np.uint64)
                    x *= _contain_pow("bpow", n)
                    S = np.zeros(n + 1, dtype=np.uint64)
                    np.cumsum(x, out=S[1:])
                    W = (S[_CONTAIN_A:] - S[:npos]) * _contain_pow("binv", npos)
                # window validity (fully inside one doc) as a
                # range-delta cumsum — no per-byte fancy indexing
                delta = np.zeros(npos + 1, dtype=np.int32)
                dl = blen >= _CONTAIN_A
                np.add.at(delta, offs[:-1][dl], 1)
                np.add.at(
                    delta,
                    np.minimum(offs[1:][dl] - _CONTAIN_A + 1, npos),
                    -1,
                )
                valid = np.cumsum(delta[:npos]) > 0
                # bitmap prefilter: one L3 probe per position kills
                # ~98.5% of misses before the binary search
                cand_pos = np.flatnonzero(
                    valid & bm[W & np.uint64((1 << _CONTAIN_BM_BITS) - 1)]
                )
                Wc = W[cand_pos]
                lo = np.searchsorted(a_srt, Wc)
                hitm = a_srt[np.minimum(lo, len(a_srt) - 1)] == Wc
                hp = cand_pos[hitm]
                if len(hp):
                    docidx = np.repeat(np.arange(len(ids)), blen)
                    wlo = lo[hitm]
                    whi = np.searchsorted(a_srt, W[hp], side="right")
                    runs = whi - wlo
                    tot = int(runs.sum())
                    # expand equal-anchor runs: candidate row per (pos, cand)
                    pos_r = np.repeat(hp, runs)
                    base = np.repeat(wlo, runs)
                    within = np.arange(tot) - np.repeat(
                        np.cumsum(runs) - runs, runs
                    )
                    crow = base + within
                    d_r = docidx[pos_r]
                    ok = (cid[crow] != ids[d_r]) & (
                        pos_r + clen[crow] <= offs[1:][d_r]
                    )
                    crow, pos_r, d_r = crow[ok], pos_r[ok], d_r[ok]
                    if len(crow):
                        sl = np.array(
                            [
                                bytes(data[p : p + L])
                                for p, L in zip(pos_r, clen[crow])
                            ],
                            dtype=object,
                        )
                        h1 = pd.util.hash_array(sl, hash_key=_CONTAIN_K1).view(
                            np.int64
                        )
                        eq = h1 == cf1[crow]
                        if eq.any():
                            h2 = pd.util.hash_array(
                                sl[eq], hash_key=_CONTAIN_K2
                            ).view(np.int64)
                            eq2 = h2 == cf2[crow][eq]
                            fc = crow[eq][eq2]
                            fd = d_r[eq][eq2]
                            if len(fc):
                                pr = pd.DataFrame(
                                    {"c": cid[fc], "k": ids[fd]}
                                ).drop_duplicates()
                                pair_c.append(pr["c"].to_numpy())
                                pair_k.append(pr["k"].to_numpy())
            # short candidates: literal substring pass
            text = batch.column("text")
            for sdoc, stext in shorts:
                m = pc.match_substring(text, stext)
                kmask = m.to_numpy(zero_copy_only=False) & (ids != sdoc)
                if kmask.any():
                    pair_c.append(np.full(int(kmask.sum()), sdoc, dtype=np.int64))
                    pair_k.append(ids[kmask])
            if not pair_c:
                return pair_schema.empty_table()
            g = (
                pd.DataFrame(
                    {"doc_id": np.concatenate(pair_c), "k": np.concatenate(pair_k)}
                )
                .groupby("doc_id", sort=False)["k"]
                .nunique()
                .reset_index(name="n_containers")
            )
            return pa.table(
                {
                    "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                    "n_containers": pa.array(
                        g["n_containers"].to_numpy(), pa.int64()
                    ),
                }
            )

        return _to_table(
            ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
        )

    # the anchor index dropped text — re-read the (rare) short texts
    # via a vectorized is_in filter scan
    short_all: list[tuple[int, str]] = []
    if short_tb.num_rows:
        sids = ray.put(short_tb.column("doc_id").to_numpy(zero_copy_only=False))

        def pick(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("doc_id"), pa.array(ray.get(sids)))
            )

        st = _to_table(
            ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)
        )
        short_all = list(
            zip(
                (int(d) for d in st.column("doc_id").to_pylist()),
                st.column("text").to_pylist(),
            )
        )

    for c0 in range(0, max(len(l_anchor), 1), _CONTAIN_CHUNK):
        sl = slice(c0, c0 + _CONTAIN_CHUNK)
        shorts = short_all if c0 == 0 else []
        if len(l_anchor[sl]) or shorts:
            parts.append(scan_pass(sl, shorts))

    if not parts:
        return pair_schema.empty_table()
    merged = pa.concat_tables(parts)
    out = _sum_partials(
        ray.data.from_arrow(merged),
        keys=["doc_id"],
        sum_cols=["n_containers"],
        schema=pair_schema,
    )
    return out.sort_by("doc_id")


SQL_CONTAINED_DEDUP = """
SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_containers
FROM documents a JOIN documents b
  ON a.doc_id <> b.doc_id AND position(a.text IN b.text) > 0
GROUP BY a.doc_id ORDER BY a.doc_id
"""


# --------------------------------------------------------------------------
# data-mixing weights — per-(lang, source) multinomial sampling
# weights at temperature α=½ (the count^α re-balancing used for
# multilingual pretraining mixtures).  α=½ is deliberate: sqrt is an
# IEEE CORRECTLY-ROUNDED op (pow is not), so both engines derive the
# identical double from the identical integer count; scaled-isqrt
# (floor(sqrt(n·10¹²))) and the round-half-up integer-ppm division
# keep everything after that exact.  Scale shape: per-batch counts →
# one O(langs × sources) exchange; the weight finish is driver-side
# over that tiny table.  int64 bound: n ≤ 10¹² keeps 2·sw·10⁶ < 2⁶³.
# --------------------------------------------------------------------------


def q_mixture_weights(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "source"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            b.append_column("n", pa.array(np.ones(b.num_rows, dtype=np.int64)))
            .group_by(["lang", "source"])
            .aggregate([("n", "sum")])
        )
        return pa.table(
            {
                "lang": g.column("lang"),
                "source": g.column("source"),
                "n": g.column("n_sum").cast(pa.int64()),
            }
        )

    cnt = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["lang", "source"],
        sum_cols=["n"],
        schema=pa.schema(
            [("lang", pa.string()), ("source", pa.string()), ("n", pa.int64())]
        ),
    ).to_pandas()
    cnt = cnt.sort_values(["lang", "source"]).reset_index(drop=True)
    n = cnt["n"].to_numpy(dtype=np.int64)
    sw = np.floor(np.sqrt(n.astype(np.float64) * 1e12)).astype(np.int64)
    tot = int(sw.sum())
    ppm = [(2 * int(w) * 1_000_000 + tot) // (2 * tot) for w in sw]
    return pa.table(
        {
            "lang": pa.array(cnt["lang"], pa.string()),
            "source": pa.array(cnt["source"], pa.string()),
            "n": pa.array(n, pa.int64()),
            "weight_ppm": pa.array(ppm, pa.int64()),
        }
    )


SQL_MIXTURE_WEIGHTS = """
WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
w AS (SELECT lang, source, CAST(n AS BIGINT) AS n,
             CAST(floor(sqrt(CAST(n AS DOUBLE) * 1e12)) AS BIGINT) AS sw
      FROM c),
t AS (SELECT CAST(sum(sw) AS BIGINT) AS tot FROM w)
SELECT lang, source, n,
       CAST((2 * sw * 1000000 + tot) // (2 * tot) AS BIGINT) AS weight_ppm
FROM w, t ORDER BY lang, source
"""


# --------------------------------------------------------------------------
# RANGE-frame trailing window — per event, the count and exact cent
# sum of the SAME USER's events with ts in [ts − 1 h, ts] (a
# value-based RANGE frame, not a ROWS frame: all ts-peers are in the
# frame regardless of row order, matching SQL RANGE semantics).
# Shape: one user-bucketed exchange; inside a bucket, rows sort by
# (user, ts) and each user SEGMENT gets two vectorized searchsorted
# calls + a cumsum difference — a per-GROUP loop over vectorized
# kernels (the q_ewma_user precedent: per-user sequential scans are
# inherent to the semantics and parallelize across buckets/users).
# --------------------------------------------------------------------------

_RANGE_WIN_US = 3_600_000_000  # 1 hour in microseconds


def q_range_window(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("n_1h", pa.int64()),
                ("sum_cents_1h", pa.int64()),
            ]
        )
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "ts"], kind="stable")
        u = b["user_id"].to_numpy()
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, len(u)]
        n = np.empty(len(u), dtype=np.int64)
        s = np.empty(len(u), dtype=np.int64)
        csum = np.concatenate([[0], np.cumsum(cents)])
        for k in range(len(starts)):
            a, e = bounds[k], bounds[k + 1]
            seg = ts[a:e]
            lo = a + np.searchsorted(seg, seg - _RANGE_WIN_US, side="left")
            hi = a + np.searchsorted(seg, seg, side="right")
            n[a:e] = hi - lo
            s[a:e] = csum[hi] - csum[lo]
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy(), pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n_1h": pa.array(n, pa.int64()),
                "sum_cents_1h": pa.array(s, pa.int64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_RANGE_WINDOW = """
SELECT event_id, user_id,
  CAST(count(*) OVER fr AS BIGINT) AS n_1h,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER fr AS BIGINT) AS sum_cents_1h
FROM events
WINDOW fr AS (PARTITION BY user_id ORDER BY ts
              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Longest consecutive-active-day streak per user — the gaps-and-islands
# pattern: a batch collapses to its distinct (user, day) pairs (the
# combiner), ONE user-bucketed exchange re-dedups and computes islands
# as day − rank(day) per user (equal within a run of consecutive days),
# then per-island sizes fold to the per-user max.  Everything after the
# sort is a vectorized segmented cumsum/compare — pure integer days, so
# both engines agree exactly.
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q_user_streaks(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()), _DAY_US)
        g = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "day": day.to_numpy(),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_active_days", pa.int64()),
                ("max_streak", pa.int64()),
            ]
        )
        b = b.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="stable"
        )
        if b.empty:
            return schema.empty_table()
        u = b["user_id"].to_numpy()
        d = b["day"].to_numpy()
        new_user = np.r_[True, u[1:] != u[:-1]]
        # rank of the day within its user segment (0-based)
        idx = np.arange(len(u))
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        rank = idx - seg_start
        isl = d - rank  # constant within a consecutive-day run
        k = pd.DataFrame({"user_id": u, "isl": isl})
        runs = k.groupby(["user_id", "isl"], sort=False).size().reset_index(name="len")
        g = runs.groupby("user_id", sort=False).agg(
            n_active_days=("len", "sum"), max_streak=("len", "max")
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_active_days": pa.array(
                    g["n_active_days"].to_numpy().astype(np.int64), pa.int64()
                ),
                "max_streak": pa.array(
                    g["max_streak"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return _to_table(_bucketed(part, "user_id", per_bucket))


SQL_USER_STREAKS = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
i AS (
  SELECT user_id, day,
         day - (row_number() OVER (PARTITION BY user_id ORDER BY day) - 1) AS isl
  FROM d),
s AS (SELECT user_id, isl, count(*) AS len FROM i GROUP BY user_id, isl)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM s GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Per-user CUSUM change detection — the reset-free one-sided CUSUM
# s_t = max(0, s_{t-1} + (c_t − k)) has the closed form
# s_t = C_t − min(0, min_{j≤t} C_j) over the drift-adjusted cumsum C,
# so the whole fold vectorizes as a segmented cumsum + running-min —
# no per-row recursion on either engine.  An ALARM is an upward
# crossing of h (s > h while the previous s ≤ h).  Exact int64 cents
# throughout; the oracle is plain window SQL, no recursive CTE.
# --------------------------------------------------------------------------

_CUSUM_K_CENTS = 2_000  # drift allowance per event (=$20)
_CUSUM_H_CENTS = 10_000  # alarm threshold (=$100)


def q_cusum_flags(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_alarms", pa.int64()),
                ("max_s_cents", pa.int64()),
            ]
        )
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = b["user_id"].to_numpy()
        c = np.rint(b["value"].to_numpy() * 100).astype(np.int64) - _CUSUM_K_CENTS
        new_user = np.r_[True, u[1:] != u[:-1]]
        # segmented cumsum: subtract the running total at each segment start
        cs = np.cumsum(c)
        seg_base = (cs - c)[new_user]
        seg_id = np.cumsum(new_user) - 1
        C = cs - seg_base[seg_id]
        # running min of C within the segment (C-speed grouped cummin —
        # segments are contiguous after the sort), floored at 0
        M = np.minimum(pd.Series(C).groupby(seg_id).cummin().to_numpy(), 0)
        s = C - M
        prev_s = np.where(new_user, np.int64(0), np.r_[np.int64(0), s[:-1]])
        alarm = (s > _CUSUM_H_CENTS) & (prev_s <= _CUSUM_H_CENTS)
        k = pd.DataFrame({"user_id": u, "alarm": alarm.astype(np.int64), "s": s})
        g = k.groupby("user_id", sort=False).agg(
            n_alarms=("alarm", "sum"), max_s_cents=("s", "max")
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_alarms": pa.array(g["n_alarms"].to_numpy().astype(np.int64), pa.int64()),
                "max_s_cents": pa.array(
                    g["max_s_cents"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_CUSUM_FLAGS = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(round(value * 100) AS BIGINT) - 2000 AS c
  FROM events),
w AS (
  SELECT user_id, ts, event_id,
         sum(c) OVER seq AS cum
  FROM e
  WINDOW seq AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s0 AS (
  SELECT user_id, ts, event_id,
         cum - least(0, min(cum) OVER seq) AS s
  FROM w
  WINDOW seq AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s AS (
  SELECT user_id, s,
         coalesce(lag(s, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 0)
           AS prev_s
  FROM s0)
SELECT user_id,
       CAST(sum(CASE WHEN s > 10000 AND prev_s <= 10000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_alarms,
       CAST(max(s) AS BIGINT) AS max_s_cents
FROM s GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Last-touch attribution — each PURCHASE attributes to the user's most
# recent strictly-preceding CLICK within a 7-day lookback.  One
# user-bucketed exchange; inside a bucket the "last preceding click"
# is a segmented shift-then-ffill (C-speed grouped transform), the
# lookback test exact integer microseconds.  Oracle: the same frame as
# max(click ts) OVER (... ROWS BETWEEN UNBOUNDED PRECEDING AND 1
# PRECEDING) — identical (ts, event_id) tie order on both engines.
# --------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 7 * 86_400_000_000


def q_attribution(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_purchases", pa.int64()),
                ("n_attributed", pa.int64()),
                ("sum_lag_us", pa.int64()),
            ]
        )
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = b["event_type"].to_numpy()
        u = b["user_id"].to_numpy()
        click_ts = pd.Series(np.where(et == "click", ts, np.nan))
        last_click = (
            click_ts.groupby(pd.Series(u)).transform(lambda s: s.shift(1).ffill())
        ).to_numpy()
        is_p = et == "purchase"
        if not is_p.any():
            return schema.empty_table()
        lag = ts[is_p] - last_click[is_p]
        ok = ~np.isnan(last_click[is_p]) & (lag <= _ATTR_LOOKBACK_US)
        k = pd.DataFrame(
            {
                "user_id": u[is_p],
                "att": ok.astype(np.int64),
                "lag": np.where(ok, lag, 0.0).astype(np.int64),
            }
        )
        g = k.groupby("user_id", sort=False).agg(
            n_purchases=("att", "size"),
            n_attributed=("att", "sum"),
            sum_lag_us=("lag", "sum"),
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_purchases": pa.array(
                    g["n_purchases"].to_numpy().astype(np.int64), pa.int64()
                ),
                "n_attributed": pa.array(
                    g["n_attributed"].to_numpy().astype(np.int64), pa.int64()
                ),
                "sum_lag_us": pa.array(
                    g["sum_lag_us"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_ATTRIBUTION = """
WITH x AS (
  SELECT user_id, ts, event_type,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
  FROM events)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN last_click IS NOT NULL
                      AND epoch_us(ts) - last_click <= 604800000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
       CAST(sum(CASE WHEN last_click IS NOT NULL
                      AND epoch_us(ts) - last_click <= 604800000000
                     THEN epoch_us(ts) - last_click ELSE 0 END) AS BIGINT)
         AS sum_lag_us
FROM x WHERE event_type = 'purchase' GROUP BY user_id
"""


# --------------------------------------------------------------------------
# BFS hop distance from the min node over the co-supply graph —
# bounded-depth single-source shortest hops (unweighted).  Both
# engines compute "min hops, capped at _BFS_MAX_HOPS": in BFS a
# node's distance is final the round it is first reached, so the
# distributed loop is monotone frontier growth — each round is the
# CC machinery's two reduce-side exchanges (messages = dist⋈edges
# keyed on node, then per-node min over dist∪messages) and the
# convergence check is a row COUNT (dist only ever gains nodes).
# Size-gated like connected_components: below _BFS_LOCAL_MAX_BYTES
# the materialized edge table is solved with a vectorized CSR
# frontier walk instead of paying ~diameter rounds of executor
# overhead; a test forces the distributed path and compares.
# --------------------------------------------------------------------------

_BFS_MAX_HOPS = 12
_BFS_LOCAL_MAX_BYTES = 64 << 20


def _bfs_local(edge_tbl: pa.Table, max_hops: int) -> pa.Table:
    """Exact bounded BFS on a driver-resident (node, nbr) edge table:
    compact ids, CSR adjacency via one argsort, vectorized per-level
    frontier expansion — O(E) total across all levels."""
    a = edge_tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    b = edge_tbl.column("nbr").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia, ib = np.searchsorted(nodes, a), np.searchsorted(nodes, b)
    # undirected: both orientations into one CSR
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.searchsorted(src, np.arange(len(nodes) + 1))
    dist = np.full(len(nodes), -1, dtype=np.int64)
    frontier = np.array([0], dtype=np.int64)  # nodes sorted → index 0 is min id
    dist[0] = 0
    for d in range(1, max_hops + 1):
        if len(frontier) == 0:
            break
        # gather all frontier neighbors in one vectorized CSR-span read
        starts = indptr[frontier]
        cnts = indptr[frontier + 1] - starts
        total = int(cnts.sum())
        if total == 0:
            break
        offsets = np.concatenate([[0], np.cumsum(cnts)])
        idx = (
            np.arange(total)
            - np.repeat(offsets[:-1], cnts)
            + np.repeat(starts, cnts)
        )
        nxt = np.unique(dst[idx])
        nxt = nxt[dist[nxt] < 0]
        dist[nxt] = d
        frontier = nxt
    reached = dist >= 0
    return pa.table(
        {
            "node": pa.array(nodes[reached], pa.int64()),
            "hops": pa.array(dist[reached], pa.int64()),
        }
    )


def q_bfs_hops(
    sf_dir: str,
    local_max_bytes: int = _BFS_LOCAL_MAX_BYTES,
    max_hops: int = _BFS_MAX_HOPS,
):
    import pyarrow.dataset as pads

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey"],
        filter=pads.field("l_quantity") == 1.0,
    )

    def edges(b: pa.Table) -> pa.Table:
        f = pd.DataFrame(
            {
                "node": b.column("l_suppkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "nbr": b.column("l_partkey")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                + _GRAPH_PART_OFFSET,
            }
        ).drop_duplicates()
        return pa.table(
            {
                "node": pa.array(f["node"].to_numpy(), pa.int64()),
                "nbr": pa.array(f["nbr"].to_numpy(), pa.int64()),
            }
        )

    bfs_schema = pa.schema([("node", pa.int64()), ("hops", pa.int64())])
    edge_ds = li.map_batches(edges, batch_format="pyarrow").materialize()
    if edge_ds.count() == 0:  # no edges → no reachable nodes
        return bfs_schema.empty_table()
    if (edge_ds.size_bytes() or 0) <= local_max_bytes:
        return _bfs_local(_to_table(edge_ds), max_hops)

    # distributed path: per-round reduce-side exchanges (CC pattern)
    both = edge_ds.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [t.column("node").combine_chunks(), t.column("nbr").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t.column("nbr").combine_chunks(), t.column("node").combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    # deterministic source: global min node id
    mins = both.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.min(t.column("node")).as_py()], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    src_id = int(pc.min(_to_table(mins).column("m")).as_py())
    dist = ray.data.from_arrow(
        pa.table({"node": pa.array([src_id], pa.int64()), "hops": pa.array([0], pa.int64())})
    ).materialize()
    # Frontier-only propagation: a BFS distance is final the round the
    # node is first reached, so only LAST round's new nodes can relax a
    # neighbor — messages shrink from O(reached) to O(frontier) rows.
    # Per round: one reduce-side frontier⋈edges exchange + one min
    # exchange; the edge table is re-shipped each round (Ray Data has
    # no persistent partitioning), which is the documented cost of the
    # big-graph regime — the local CSR path handles everything under
    # local_max_bytes without any of it.
    frontier = dist

    def front_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": t.column("node"),
                "nbr": pa.nulls(t.num_rows, pa.int64()),
                "_src": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def edge_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": t.column("node"),
                "nbr": t.column("nbr"),
                "_src": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def relax(df: pd.DataFrame) -> pa.Table:
        f = df[df["_src"] == 0]
        e = df[df["_src"] == 1]
        if f.empty or e.empty:
            return pa.table({"node": pa.array([], pa.int64())})
        hit = e.loc[e["_k"].isin(f["_k"].to_numpy()), "nbr"].unique()
        return pa.table({"node": pa.array(hit.astype(np.int64), pa.int64())})

    for d in range(1, max_hops + 1):
        msgs = _bucketed(
            frontier.map_batches(front_keyed, batch_format="pyarrow").union(
                both.map_batches(edge_keyed, batch_format="pyarrow")
            ),
            "_k",
            relax,
        ).map_batches(
            lambda t, _d=d: pa.table(
                {
                    "node": t.column("node"),
                    "hops": pa.array(np.full(t.num_rows, _d, np.int64), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        dist = (
            dist.union(msgs)
            .groupby("node")
            .min("hops")
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t.column("node"),
                        "hops": t.column("min(hops)"),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        frontier = dist.map_batches(
            lambda t, _d=d: t.filter(pc.equal(t.column("hops"), _d)),
            batch_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:
            break
    return _to_table(dist)


_SQL_BFS_TMPL = f"""
WITH RECURSIVE
e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS a,
             CAST(l_partkey + {_GRAPH_PART_OFFSET} AS BIGINT) AS b
      FROM lineitem WHERE l_quantity = 1),
u AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
src AS (SELECT min(a) AS s FROM u),
walk(node, d) AS (
  SELECT s, 0 FROM src WHERE s IS NOT NULL
  UNION
  SELECT u.b, walk.d + 1 FROM walk JOIN u ON u.a = walk.node
  WHERE walk.d < {{h}})
SELECT node, CAST(min(d) AS BIGINT) AS hops FROM walk GROUP BY node
"""

SQL_BFS_HOPS = _SQL_BFS_TMPL.format(h=_BFS_MAX_HOPS)


# --------------------------------------------------------------------------
# Mann-Whitney U between two document sources on n_chars — rank-sum
# with tie-averaged ranks, EXACTLY: the whole test reduces to the
# per-(group, value) histogram (a combiner-sized _sum_partials
# exchange; the value domain is bounded by document length, not corpus
# size), and avg-rank×2 = 2·cum_before + ties + 1 keeps every rank an
# integer — no .5 floats cross an engine boundary.  Outputs are the
# x2-scaled rank sum and U statistic (n ≤ 2^31 keeps 2R ≤ 4n² in
# int64 up to n ≈ 1.5e9 per pair of groups).
# --------------------------------------------------------------------------

_MW_A, _MW_B = "src0", "src1"


def q_mann_whitney(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read_pq(
        _t(sf_dir, "documents"),
        columns=["source", "n_chars"],
        filter=pads.field("source").isin([_MW_A, _MW_B]),
    )

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "g": pc.equal(b.column("source"), _MW_B).to_numpy(
                        zero_copy_only=False
                    ),
                    "v": b.column("n_chars").to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["g", "v"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "g": pa.array(g["g"].to_numpy().astype(np.int8), pa.int8()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    hist = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["g", "v"],
        sum_cols=["cnt"],
        schema=pa.schema([("g", pa.int8()), ("v", pa.int64()), ("cnt", pa.int64())]),
    ).to_pandas()
    h = (
        hist.pivot_table(index="v", columns="g", values="cnt", aggfunc="sum")
        .reindex(columns=[0, 1], fill_value=0)
        .fillna(0)
        .sort_index()
    )
    c0 = h[0].to_numpy().astype(np.int64)
    c1 = h[1].to_numpy().astype(np.int64)
    tot = c0 + c1
    cum_before = np.concatenate([[0], np.cumsum(tot)[:-1]])
    r2 = 2 * cum_before + tot + 1  # avg rank × 2 per distinct value
    n_a, n_b = int(c0.sum()), int(c1.sum())
    r_a_x2 = int((c0 * r2).sum())
    u_a_x2 = r_a_x2 - n_a * (n_a + 1)
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "r_a_x2": pa.array([r_a_x2], pa.int64()),
            "u_a_x2": pa.array([u_a_x2], pa.int64()),
        }
    )


SQL_MANN_WHITNEY = f"""
WITH s AS (
  SELECT n_chars AS v, CASE WHEN source = '{_MW_B}' THEN 1 ELSE 0 END AS g
  FROM documents WHERE source IN ('{_MW_A}', '{_MW_B}')),
r AS (
  SELECT g, 2 * rank() OVER (ORDER BY v) + count(*) OVER (PARTITION BY v) - 1 AS r2
  FROM s),
a AS (
  SELECT count(*) FILTER (g = 0) AS n_a, count(*) FILTER (g = 1) AS n_b,
         sum(r2) FILTER (g = 0) AS r_a_x2
  FROM r)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(r_a_x2 AS BIGINT) AS r_a_x2,
       CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2
FROM a
"""


# --------------------------------------------------------------------------
# Spearman rank correlation ingredients per lang between n_chars and
# the space count (both metrics have bounded value domains, so BOTH
# global rankings collapse to histograms).  Tie-averaged ranks ×2 keep
# everything integer: Σ(2rx−2ry)² = 4Σd² is exact int64 up to ~1e9
# docs per lang (the oracle's HUGEINT keeps going past that — noted
# bound).  ρ = 1 − sum_d2_x4/(4·n(n²−1)/6) is left to the caller so no
# float leaves either engine.
# --------------------------------------------------------------------------

def _space_count(b: pa.Table) -> np.ndarray:
    return (
        pc.count_substring(b.column("text"), " ")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def q_spearman_x4(sf_dir: str):
    cols = ["lang", "n_chars", "text"]

    def hist_partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        x = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        y = _space_count(b)
        f = pd.DataFrame(
            {
                "lang": np.concatenate([lang, lang]),
                "w": np.r_[
                    np.zeros(len(x), np.int8), np.ones(len(y), np.int8)
                ],
                "v": np.concatenate([x, y]),
            }
        )
        g = f.groupby(["lang", "w", "v"], sort=False).size().reset_index(name="cnt")
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "w": pa.array(g["w"].to_numpy(), pa.int8()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    hist = _sum_partials(
        _read_pq(_t(sf_dir, "documents"), columns=cols).map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["lang", "w", "v"],
        sum_cols=["cnt"],
        schema=pa.schema(
            [
                ("lang", pa.string()),
                ("w", pa.int8()),
                ("v", pa.int64()),
                ("cnt", pa.int64()),
            ]
        ),
    ).to_pandas()
    # per (lang, metric): sorted values + avg-rank×2 lookup arrays
    maps: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}
    for (lang, w), g in hist.groupby(["lang", "w"], sort=False):
        g = g.sort_values("v")
        cnt = g["cnt"].to_numpy().astype(np.int64)
        cum_before = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        maps[(lang, int(w))] = (
            g["v"].to_numpy().astype(np.int64),
            2 * cum_before + cnt + 1,
        )

    def pair_partial(b: pa.Table) -> pa.Table:
        lang = b.column("lang").to_numpy(zero_copy_only=False)
        x = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        y = _space_count(b)
        out_lang, out_n, out_s = [], [], []
        f = pd.DataFrame({"lang": lang, "x": x, "y": y})
        for lg, g in f.groupby("lang", sort=False):
            vx, rx = maps[(lg, 0)]
            vy, ry = maps[(lg, 1)]
            r2x = rx[np.searchsorted(vx, g["x"].to_numpy())]
            r2y = ry[np.searchsorted(vy, g["y"].to_numpy())]
            d = r2x - r2y
            out_lang.append(lg)
            out_n.append(len(g))
            out_s.append(int((d * d).sum()))
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "n": pa.array(out_n, pa.int64()),
                "sum_d2_x4": pa.array(out_s, pa.int64()),
            }
        )

    return _sum_partials(
        _read_pq(_t(sf_dir, "documents"), columns=cols).map_batches(
            pair_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        keys=["lang"],
        sum_cols=["n", "sum_d2_x4"],
        schema=pa.schema(
            [("lang", pa.string()), ("n", pa.int64()), ("sum_d2_x4", pa.int64())]
        ),
    )


SQL_SPEARMAN_X4 = """
WITH m AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS x,
         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS y
  FROM documents),
r AS (
  SELECT lang,
    2 * rank() OVER (PARTITION BY lang ORDER BY x)
      + count(*) OVER (PARTITION BY lang, x) - 1 AS rx,
    2 * rank() OVER (PARTITION BY lang ORDER BY y)
      + count(*) OVER (PARTITION BY lang, y) - 1 AS ry
  FROM m)
SELECT lang, CAST(count(*) AS BIGINT) AS n,
       CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2_x4
FROM r GROUP BY lang
"""


# --------------------------------------------------------------------------
# Kaplan-Meier ingredients for user lifetime (days between first and
# last event): per lifespan day d, how many users were still "at
# risk" (lifespan ≥ d) and how many churned exactly at d.  Per-user
# min/max is one bucketed exchange; the lifespan histogram is
# combiner-sized, so the survival curve itself is a driver cumsum over
# O(max-lifespan) rows regardless of user count.
# --------------------------------------------------------------------------

def q_kaplan_meier(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()), _DAY_US
        ).to_numpy()
        g = (
            pd.DataFrame(
                {"user_id": b.column("user_id").to_numpy(zero_copy_only=False), "d": day}
            )
            .groupby("user_id", sort=False)
            .agg(f=("d", "min"), l=("d", "max"))
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "f": pa.array(g["f"].to_numpy(), pa.int64()),
                "l": pa.array(g["l"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("user_id", sort=False).agg(f=("f", "min"), l=("l", "max"))
        h = (g["l"] - g["f"]).value_counts().sort_index()
        return pa.table(
            {
                "d": pa.array(h.index.to_numpy().astype(np.int64), pa.int64()),
                "churned": pa.array(h.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    hist = _sum_partials(
        _bucketed(
            ds.map_batches(partial, batch_format="pyarrow"), "user_id", per_bucket
        ),
        keys=["d"],
        sum_cols=["churned"],
        schema=pa.schema([("d", pa.int64()), ("churned", pa.int64())]),
    ).to_pandas().sort_values("d")
    churned = hist["churned"].to_numpy()
    at_risk = churned[::-1].cumsum()[::-1]
    return pa.table(
        {
            "d": pa.array(hist["d"].to_numpy(), pa.int64()),
            "at_risk": pa.array(at_risk.astype(np.int64), pa.int64()),
            "churned": pa.array(churned.astype(np.int64), pa.int64()),
        }
    )


SQL_KAPLAN_MEIER = """
WITH u AS (
  SELECT user_id,
         max(epoch_us(ts) // 86400000000) - min(epoch_us(ts) // 86400000000) AS d
  FROM events GROUP BY user_id),
h AS (SELECT d, count(*) AS churned FROM u GROUP BY d)
SELECT d,
       CAST(sum(churned) OVER
            (ORDER BY d DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk,
       CAST(churned AS BIGINT) AS churned
FROM h
"""


# --------------------------------------------------------------------------
# LOCF gap-fill: per user, a daily calendar spine from first to last
# purchase day, filled with the last observed purchase value (exact
# cents; same-day ties resolved to the max event_id).  The fill is one
# bucketed exchange on user_id; inside a bucket the whole ffill is a
# single composite-key searchsorted (user · 2^25 + day stays bijective
# for epoch days < 2^25 ≈ year 93000), no per-user Python loop.
# Oracle: DuckDB ASOF JOIN against the generate_series spine.
# --------------------------------------------------------------------------

def q_locf_fill(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read_pq(
        _t(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "value"],
        filter=pads.field("event_type") == "purchase",
    )

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()), _DAY_US
        ).to_numpy()
        f = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "day": day,
                "event_id": b.column("event_id").to_numpy(zero_copy_only=False),
                "cents": _event_cents(b),
            }
        ).sort_values(["user_id", "day", "event_id"], kind="stable")
        g = f.groupby(["user_id", "day"], sort=False).tail(1)
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "event_id": pa.array(g["event_id"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [("user_id", pa.int64()), ("day", pa.int64()), ("cents", pa.int64())]
        )
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "day", "event_id"], kind="stable")
        b = b.groupby(["user_id", "day"], sort=False).tail(1)
        u = b["user_id"].to_numpy()
        d = b["day"].to_numpy()
        c = b["cents"].to_numpy()
        new_u = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_u)
        ends = np.r_[starts[1:], len(u)] - 1
        span = d[ends] - d[starts] + 1
        total = int(span.sum())
        seg = np.repeat(np.arange(len(starts)), span)
        pos = np.arange(total) - np.repeat(np.cumsum(span) - span, span)
        out_u = u[starts][seg]
        out_d = d[starts][seg] + pos
        key_obs = u * (1 << 25) + d
        key_spine = out_u * (1 << 25) + out_d
        idx = np.searchsorted(key_obs, key_spine, side="right") - 1
        return pa.table(
            {
                "user_id": pa.array(out_u, pa.int64()),
                "day": pa.array(out_d, pa.int64()),
                "cents": pa.array(c[idx], pa.int64()),
            }
        )

    return _to_table(
        _bucketed(ds.map_batches(partial, batch_format="pyarrow"), "user_id", per_bucket)
    )


SQL_LOCF_FILL = """
WITH obs AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         arg_max(CAST(round(value * 100) AS BIGINT), event_id) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, day),
b AS (SELECT user_id, min(day) AS f, max(day) AS l FROM obs GROUP BY user_id),
spine AS (SELECT user_id, unnest(generate_series(f, l)) AS day FROM b)
SELECT s.user_id, s.day, o.cents
FROM spine s ASOF JOIN obs o ON s.user_id = o.user_id AND s.day >= o.day
"""


# --------------------------------------------------------------------------
# Session path analysis — entry/exit event_type per 30-min-gap session,
# rolled up to (entry, exit) counts.  Sessionization is the
# window_session fold (bucketed user exchange, vectorized gap cumsum);
# entry/exit fall out of the segment boundary mask, and the final
# rollup is a combiner-sized _sum_partials.
# --------------------------------------------------------------------------

def q_session_paths(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("entry_type", pa.string()),
                ("exit_type", pa.string()),
                ("n_sessions", pa.int64()),
            ]
        )
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uid = b["user_id"].to_numpy()
        new_s = np.empty(len(b), dtype=bool)
        new_s[0] = True
        new_s[1:] = (uid[1:] != uid[:-1]) | (
            (ts_us[1:] - ts_us[:-1]) > _SESSION_GAP_US
        )
        starts = np.flatnonzero(new_s)
        ends = np.r_[starts[1:], len(b)] - 1
        et = b["event_type"].to_numpy()
        g = (
            pd.DataFrame({"entry_type": et[starts], "exit_type": et[ends]})
            .groupby(["entry_type", "exit_type"], sort=False)
            .size()
            .reset_index(name="n_sessions")
        )
        return pa.table(
            {
                "entry_type": pa.array(g["entry_type"], pa.string()),
                "exit_type": pa.array(g["exit_type"], pa.string()),
                "n_sessions": pa.array(
                    g["n_sessions"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return _sum_partials(
        _bucketed(ds, "user_id", per_bucket),
        keys=["entry_type", "exit_type"],
        sum_cols=["n_sessions"],
        schema=pa.schema(
            [
                ("entry_type", pa.string()),
                ("exit_type", pa.string()),
                ("n_sessions", pa.int64()),
            ]
        ),
    )


SQL_SESSION_PATHS = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
x AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY user_id, sid ORDER BY ts DESC, event_id DESC) AS rd
  FROM sess)
SELECT a.event_type AS entry_type, d.event_type AS exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions
FROM x a JOIN x d ON a.user_id = d.user_id AND a.sid = d.sid
WHERE a.ra = 1 AND d.rd = 1
GROUP BY a.event_type, d.event_type
"""


# --------------------------------------------------------------------------
# Week-over-week revenue change per event_type — map-side (type, week)
# cents combiner, then the lag happens on the O(types × weeks) rollup
# on the driver (bounded by calendar span, not data size).  delta is
# NULL on each type's first week, matching SQL lag().
# --------------------------------------------------------------------------

def q_wow_change(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        week = (
            pc.divide(
                b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
                7 * _DAY_US,
            ).to_numpy()
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": b.column("event_type").to_numpy(zero_copy_only=False),
                    "week": week,
                    "cents": _event_cents(b),
                }
            )
            .groupby(["event_type", "week"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "week": pa.array(g["week"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    agg = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["event_type", "week"],
        sum_cols=["cents"],
        schema=pa.schema(
            [("event_type", pa.string()), ("week", pa.int64()), ("cents", pa.int64())]
        ),
    ).to_pandas().sort_values(["event_type", "week"], kind="stable")
    prev = agg.groupby("event_type", sort=False)["cents"].shift(1)
    delta = agg["cents"] - prev
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"], pa.string()),
            "week": pa.array(agg["week"].to_numpy(), pa.int64()),
            "cents": pa.array(agg["cents"].to_numpy(), pa.int64()),
            "delta_cents": pa.array(
                [None if pd.isna(v) else int(v) for v in delta], pa.int64()
            ),
        }
    )


SQL_WOW_CHANGE = """
WITH w AS (
  SELECT event_type, epoch_us(ts) // 604800000000 AS week,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY event_type, week)
SELECT event_type, week, cents,
       CAST(cents - lag(cents) OVER (PARTITION BY event_type ORDER BY week)
            AS BIGINT) AS delta_cents
FROM w
"""


# --------------------------------------------------------------------------
# Day-of-week seasonality per event_type — pure combiner rollup
# (domain: types × 7).  dow is epoch-day mod 7 (0 = Thursday), spelled
# identically in both engines to dodge locale-dependent dayname().
# avg_value divides the exact cent sum in one fixed order so the
# float64 result is bit-identical.
# --------------------------------------------------------------------------

def q_seasonal_dow(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        dow = (
            pc.divide(
                b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()), _DAY_US
            ).to_numpy()
            % 7
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": b.column("event_type").to_numpy(zero_copy_only=False),
                    "dow": dow,
                    "cents": _event_cents(b),
                }
            )
            .groupby(["event_type", "dow"], sort=False)
            .agg(n=("cents", "size"), cents=("cents", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "dow": pa.array(g["dow"].to_numpy(), pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    agg = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["event_type", "dow"],
        sum_cols=["n", "cents"],
        schema=pa.schema(
            [
                ("event_type", pa.string()),
                ("dow", pa.int64()),
                ("n", pa.int64()),
                ("cents", pa.int64()),
            ]
        ),
    ).to_pandas()
    avg = agg["cents"].to_numpy().astype(np.float64) / 100.0 / agg["n"].to_numpy()
    return pa.table(
        {
            "event_type": pa.array(agg["event_type"], pa.string()),
            "dow": pa.array(agg["dow"].to_numpy(), pa.int64()),
            "n": pa.array(agg["n"].to_numpy(), pa.int64()),
            "cents": pa.array(agg["cents"].to_numpy(), pa.int64()),
            "avg_value": pa.array(avg, pa.float64()),
        }
    )


SQL_SEASONAL_DOW = """
SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS dow,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)
         AS avg_value
FROM events GROUP BY event_type, dow
"""


# --------------------------------------------------------------------------
# Trailing-window spike counter — an event is a spike when its value
# exceeds 2× the mean of its user's previous ≤5 events (rows-frame
# 5 PRECEDING..1 PRECEDING), compared in cross-multiplied integer
# cents (c·k > 2·s) so no float mean exists.  The rolling sums are a
# segmented cumsum over the bucketed user exchange — no pandas
# .rolling(), no per-user loop.
# --------------------------------------------------------------------------

def q_trailing_spike(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema([("user_id", pa.int64()), ("n_spikes", pa.int64())])
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = b["user_id"].to_numpy()
        c = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        idx = np.arange(len(u))
        new_u = np.r_[True, u[1:] != u[:-1]]
        seg_start = np.maximum.accumulate(np.where(new_u, idx, 0))
        j = np.maximum(idx - 5, seg_start)
        cs0 = np.r_[0, np.cumsum(c)]
        s = cs0[idx] - cs0[j]
        k = idx - j
        spike = (k > 0) & (c * k > 2 * s)
        g = pd.DataFrame({"user_id": u, "spike": spike}).groupby(
            "user_id", sort=False
        )["spike"].sum()
        return pa.table(
            {
                "user_id": pa.array(g.index.to_numpy(), pa.int64()),
                "n_spikes": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_TRAILING_SPIKE = """
WITH e AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
  FROM events),
w AS (
  SELECT user_id, c,
         sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS s,
         count(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS k
  FROM e)
SELECT user_id,
       CAST(count(*) FILTER (WHERE k > 0 AND c * k > 2 * s) AS BIGINT) AS n_spikes
FROM w GROUP BY user_id
"""


# --------------------------------------------------------------------------
# RFM quintile scoring over purchase events.  Buckets use the
# tie-stable rank rule q = least(4, 5·|{strictly smaller}| // n) —
# equal metric values always share a bucket, so no ntile boundary
# resolution is needed.  |smaller| is computed WITHOUT a global sort:
# a combiner-sized coarse-bin histogram fixes each value-range's
# global offset on the driver, then one value-binned exchange per
# metric ranks rows inside their bin (min-rank over ties) — the users
# table itself never materializes anywhere.
# --------------------------------------------------------------------------

_RFM_SHIFTS = {"recency_days": 0, "freq": 0, "cents": 14}

# local-path gate (the q_pagerank pattern): the per-user RFM table is
# O(distinct purchasers) — tiny relative to events — so below this
# byte size the three quintile ranks run as one in-process numpy pass
# instead of three value-binned exchanges (measured 3.7 s → ~1 s at
# sf0.01); the exchange path below is the 100-TB shape and stays
# pinned by the forced-path branch of test_rfm_tie_stable_quintiles.
_RFM_LOCAL_MAX_BYTES = 64 << 20


_RFM_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("recency_days", pa.int64()),
        ("freq", pa.int64()),
        ("cents", pa.int64()),
        ("r_q", pa.int64()),
        ("f_q", pa.int64()),
        ("m_q", pa.int64()),
    ]
)


def _rfm_local(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return _RFM_SCHEMA.empty_table()
    last_day = t.column("last_day").to_numpy(zero_copy_only=False)
    rec = (last_day.max() - last_day).astype(np.int64)
    freq = t.column("freq").to_numpy(zero_copy_only=False)
    cents = t.column("cents").to_numpy(zero_copy_only=False)
    n = t.num_rows

    def quint(v: np.ndarray) -> np.ndarray:
        sv = np.sort(v, kind="stable")
        smaller = np.searchsorted(sv, v, side="left")
        return np.minimum(4, 5 * smaller // n).astype(np.int64)

    return pa.table(
        {
            "user_id": t.column("user_id"),
            "recency_days": pa.array(rec, pa.int64()),
            "freq": pa.array(freq.astype(np.int64), pa.int64()),
            "cents": pa.array(cents.astype(np.int64), pa.int64()),
            "r_q": pa.array(quint(rec), pa.int64()),
            "f_q": pa.array(quint(freq), pa.int64()),
            "m_q": pa.array(quint(cents), pa.int64()),
        }
    )


def _rank_quintile(users: ray.data.Dataset, col: str, out_col: str, n_total: int):
    """Append least(4, 5·cnt_smaller//n) for ``col`` via a value-binned
    exchange; bin offsets come from a _sum_partials coarse histogram."""
    shift = _RFM_SHIFTS[col]

    def hist_partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False) >> shift
        g = pd.Series(v).value_counts()
        return pa.table(
            {
                "bin": pa.array(g.index.to_numpy().astype(np.int64), pa.int64()),
                "cnt": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    hist = (
        _sum_partials(
            users.map_batches(hist_partial, batch_format="pyarrow"),
            keys=["bin"],
            sum_cols=["cnt"],
            schema=pa.schema([("bin", pa.int64()), ("cnt", pa.int64())]),
        )
        .to_pandas()
        .sort_values("bin")
    )
    bins = hist["bin"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(hist["cnt"].to_numpy())[:-1]])
    off = dict(zip(bins.tolist(), offsets.tolist()))

    def add_bin(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False) >> shift
        return b.append_column("_bin", pa.array(v.astype(np.int64), pa.int64()))

    def per_bin(g: pd.DataFrame) -> pd.DataFrame:
        base = off[int(g["_bin"].iloc[0])]
        v = g[col].to_numpy()
        order = np.argsort(v, kind="stable")
        sv = v[order]
        # min-rank of each value within the bin = count of strictly smaller
        smaller = np.searchsorted(sv, v, side="left") + base
        g = g.drop(columns=["_bin"]).copy()
        g[out_col] = np.minimum(4, 5 * smaller // n_total).astype(np.int64)
        return g

    return (
        users.map_batches(add_bin, batch_format="pyarrow")
        .groupby("_bin", num_partitions=_GROUP_BUCKETS)
        .map_groups(per_bin, batch_format="pandas")
    )


def q_rfm_scores(sf_dir: str, local_max_bytes: int = _RFM_LOCAL_MAX_BYTES):
    import pyarrow.dataset as pads

    ds = _read_pq(
        _t(sf_dir, "events"),
        columns=["user_id", "ts", "value"],
        filter=pads.field("event_type") == "purchase",
    )

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()), _DAY_US
        ).to_numpy()
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "day": day,
                    "cents": _event_cents(b),
                }
            )
            .groupby("user_id", sort=False)
            .agg(last_day=("day", "max"), freq=("day", "size"), cents=("cents", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "last_day": pa.array(g["last_day"].to_numpy(), pa.int64()),
                "freq": pa.array(g["freq"].to_numpy().astype(np.int64), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = (
            b.groupby("user_id", sort=False)
            .agg(last_day=("last_day", "max"), freq=("freq", "sum"), cents=("cents", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "last_day": pa.array(g["last_day"].to_numpy(), pa.int64()),
                "freq": pa.array(g["freq"].to_numpy().astype(np.int64), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    users = _bucketed(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", per_bucket
    ).materialize()
    if (users.size_bytes() or 0) <= local_max_bytes:
        return _rfm_local(dd._collect(users))
    gmax = int(
        pc.max(_to_table(users.select_columns(["last_day"])).column("last_day")).as_py()
    )
    n_total = users.count()

    def recency(b: pa.Table) -> pa.Table:
        r = pc.subtract(pa.scalar(gmax, pa.int64()), b.column("last_day"))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "recency_days": r,
                "freq": b.column("freq"),
                "cents": b.column("cents"),
            }
        )

    out = users.map_batches(recency, batch_format="pyarrow")
    out = _rank_quintile(out, "recency_days", "r_q", n_total)
    out = _rank_quintile(out, "freq", "f_q", n_total)
    out = _rank_quintile(out, "cents", "m_q", n_total)
    return _to_table(out)


SQL_RFM_SCORES = """
WITH p AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'),
u AS (
  SELECT user_id, max(day) AS last_day, count(*) AS freq, sum(c) AS cents
  FROM p GROUP BY user_id),
g AS (SELECT max(last_day) AS gmax FROM u),
n AS (SELECT count(*) AS nu FROM u)
SELECT user_id,
       CAST((SELECT gmax FROM g) - last_day AS BIGINT) AS recency_days,
       CAST(freq AS BIGINT) AS freq, CAST(cents AS BIGINT) AS cents,
       CAST(least(4, 5 * (rank() OVER (ORDER BY (SELECT gmax FROM g) - last_day) - 1)
                     // (SELECT nu FROM n)) AS BIGINT) AS r_q,
       CAST(least(4, 5 * (rank() OVER (ORDER BY freq) - 1)
                     // (SELECT nu FROM n)) AS BIGINT) AS f_q,
       CAST(least(4, 5 * (rank() OVER (ORDER BY cents) - 1)
                     // (SELECT nu FROM n)) AS BIGINT) AS m_q
FROM u
"""


# --------------------------------------------------------------------------
# blocked fuzzy similarity join (Jaro-Winkler) — the second classic
# entity-resolution verify kernel next to q_edit_dedup's banded
# Levenshtein: a deterministic BLOCKING key (first two whitespace
# tokens) co-locates candidates in one bucketed exchange, then
# Jaro-Winkler over a fixed 48-char prefix verifies within blocks.
# functions.textstats.jaro_winkler is bit-for-bit DuckDB's
# jaro_winkler_similarity (standard Winkler parameters: prefix ≤ 4,
# weight 0.1, boost only above 0.7) — pinned by
# test_jaro_winkler_duckdb_parity over every real candidate pair, so
# the unrounded ≥-threshold filter agrees exactly on both engines.
# All-pairs work is bounded by the block-size distribution (the
# standard, documented blocking assumption — same as q_edit_dedup).
# --------------------------------------------------------------------------

_FUZZY_PREFIX, _FUZZY_THRESHOLD = 48, 0.88


def q_fuzzy_join(sf_dir: str):
    from ..functions.textstats import jaro_winkler

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyed(b: pd.DataFrame) -> pa.Table:
        toks = b["text"].str.split(" ")
        bk = toks.str[0].fillna("") + " " + toks.str[1].fillna("")
        return pa.table(
            {
                "bk": pa.array(bk, pa.string()),
                "doc_id": pa.array(b["doc_id"].to_numpy(), pa.int64()),
                "s": pa.array(b["text"].str.slice(0, _FUZZY_PREFIX), pa.string()),
            }
        )

    def verify_buckets(df: pd.DataFrame) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for _, blk in df.groupby("bk", sort=False):
            blk = blk.sort_values("doc_id")
            ids = blk["doc_id"].to_numpy()
            ss = list(blk["s"])
            for i in range(len(ids)):
                si = ss[i]
                for j in range(i + 1, len(ids)):
                    sim = jaro_winkler(si, ss[j])
                    if sim >= _FUZZY_THRESHOLD:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
                        out_s.append(sim)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "sim": pa.array(np.round(out_s, 6), pa.float64()),
            }
        )

    # size-gated like every stat exchange: the keyed stream is only
    # (bk, doc_id, 48-char prefix) — tiny relative to the corpus — so
    # below _DRIVER_MERGE_MAX_ROWS the verify runs in-process (zero
    # exchanges); above, ONE bucketed exchange on hashed bk
    return _merge_partials(
        ds.map_batches(keyed, batch_format="pandas"),
        "bk",
        verify_buckets,
        input_schema=pa.schema(
            [("bk", pa.string()), ("doc_id", pa.int64()), ("s", pa.string())]
        ),
    )


SQL_FUZZY_JOIN = f"""
WITH k AS (
  SELECT doc_id, substr(text, 1, {_FUZZY_PREFIX}) AS s,
         split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 2) AS bk
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(jaro_winkler_similarity(a.s, b.s), 6) AS sim
FROM k a JOIN k b ON a.bk = b.bk AND a.doc_id < b.doc_id
WHERE jaro_winkler_similarity(a.s, b.s) >= {_FUZZY_THRESHOLD}
"""


# --------------------------------------------------------------------------
# SCD2 intervalization — reconstruct type-2 validity intervals from an
# event stream: per user ordered by (ts, event_id), each run of equal
# event_type becomes one (user, state, valid_from, valid_to) row,
# valid_to = the next run's first ts (-1 sentinel for the open current
# state — both engines emit the same exact int64, no NULL/NaN repr
# ambiguity crosses the hash).  A batch can't pre-collapse runs (run
# boundaries need global per-user order), so the shape is the one
# user-bucketed exchange shared with sessionize/streaks, with the
# run-collapse a vectorized segmented boundary scan inside the bucket.
# --------------------------------------------------------------------------


def q_scd2_intervals(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("from_us", pa.int64()),
                ("to_us", pa.int64()),
            ]
        )
        if b.empty:
            return schema.empty_table()
        b = b.sort_values(["user_id", "ts", "event_id"], kind="stable")
        u = b["user_id"].to_numpy()
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = b["event_type"].to_numpy()
        new_run = np.r_[True, (u[1:] != u[:-1]) | (et[1:] != et[:-1])]
        starts = np.flatnonzero(new_run)
        su = u[starts]
        sfrom = ts[starts]
        nxt = np.r_[sfrom[1:], np.int64(0)]
        same_user = np.r_[su[1:] == su[:-1], False]
        to_us = np.where(same_user, nxt, np.int64(-1))
        return pa.table(
            {
                "user_id": pa.array(su, pa.int64()),
                "event_type": pa.array(et[starts], pa.string()),
                "from_us": pa.array(sfrom, pa.int64()),
                "to_us": pa.array(to_us, pa.int64()),
            }
        )

    return _to_table(_bucketed(ds, "user_id", per_bucket))


SQL_SCD2_INTERVALS = """
WITH o AS (
  SELECT user_id, event_type, ts,
         row_number() OVER w AS rn,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS isl
  FROM o),
g AS (
  SELECT user_id, min(event_type) AS event_type, isl,
         min(ts) AS vf
  FROM s GROUP BY user_id, isl)
SELECT user_id, event_type,
       CAST(epoch_us(vf) AS BIGINT) AS from_us,
       COALESCE(CAST(epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY isl))
                     AS BIGINT), -1) AS to_us
FROM g
"""


# --------------------------------------------------------------------------
# full Pearson correlation matrix in ONE moment pass — the
# column-profiling shape: each batch collapses to a single row of
# mergeable moments (n, Σxᵢ, Σxᵢxⱼ for all i ≤ j — 15 floats for 4
# columns), one O(batches)-row exchange, closed-form finalize on the
# tiny result.  Per-column constant shifts (corr is shift-invariant)
# keep the n·Σxᵢxⱼ − ΣxᵢΣxⱼ cancellation at ~14 significant digits,
# the same conditioning trick as q_corr_stats.  Columns are listed
# alphabetically so pair labels are canonical.
# --------------------------------------------------------------------------

_CMAT_COLS = (
    ("l_discount", 0.05),
    ("l_extendedprice", 38_000.0),
    ("l_quantity", 25.0),
    ("l_tax", 0.04),
)


def q_corr_matrix(sf_dir: str):
    cols = [c for c, _ in _CMAT_COLS]
    nc = len(_CMAT_COLS)
    ds = _read_pq(_t(sf_dir, "lineitem"), columns=cols)
    moment_names = [f"s{i}" for i in range(nc)] + [
        f"s{i}{j}" for i in range(nc) for j in range(i, nc)
    ]

    def partial(b: pd.DataFrame) -> pa.Table:
        x = [b[c].to_numpy() - sh for c, sh in _CMAT_COLS]
        out = {
            "k": pa.array([0], pa.int32()),
            "n": pa.array([len(b)], pa.int64()),
        }
        for i in range(nc):
            out[f"s{i}"] = pa.array([float(x[i].sum())], pa.float64())
            for j in range(i, nc):
                out[f"s{i}{j}"] = pa.array([float((x[i] * x[j]).sum())], pa.float64())
        return pa.table(out)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("k")
        .aggregate(
            Sum("n", alias_name="n"),
            *[Sum(m, alias_name=m) for m in moment_names],
        )
    )
    t = _to_table_s(
        agg,
        pa.schema(
            [("k", pa.int32()), ("n", pa.int64())]
            + [(m, pa.float64()) for m in moment_names],
        ),
    )
    if t.num_rows == 0:  # empty lake → the oracle's 6 NULL-corr rows
        n = 0
        s = {m: 0.0 for m in moment_names}
    else:
        n = int(t.column("n")[0].as_py())
        s = {m: float(t.column(m)[0].as_py()) for m in moment_names}
    col_a, col_b, corr = [], [], []
    for i in range(nc):
        for j in range(i + 1, nc):
            col_a.append(_CMAT_COLS[i][0])
            col_b.append(_CMAT_COLS[j][0])
            if n == 0:
                corr.append(None)
                continue
            cov = n * s[f"s{i}{j}"] - s[f"s{i}"] * s[f"s{j}"]
            var_i = n * s[f"s{i}{i}"] - s[f"s{i}"] ** 2
            var_j = n * s[f"s{j}{j}"] - s[f"s{j}"] ** 2
            den = math.sqrt(var_i * var_j)
            corr.append(round(cov / den, 6) if den > 0 else None)
    return pa.table(
        {
            "col_a": pa.array(col_a, pa.string()),
            "col_b": pa.array(col_b, pa.string()),
            "n": pa.array([n] * len(col_a), pa.int64()),
            "corr": pa.array(corr, pa.float64()),
        }
    )


SQL_CORR_MATRIX = """
SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(l_discount, l_extendedprice), 6) AS corr FROM lineitem
UNION ALL
SELECT 'l_discount', 'l_quantity', CAST(count(*) AS BIGINT),
       round(corr(l_discount, l_quantity), 6) FROM lineitem
UNION ALL
SELECT 'l_discount', 'l_tax', CAST(count(*) AS BIGINT),
       round(corr(l_discount, l_tax), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_quantity', CAST(count(*) AS BIGINT),
       round(corr(l_extendedprice, l_quantity), 6) FROM lineitem
UNION ALL
SELECT 'l_extendedprice', 'l_tax', CAST(count(*) AS BIGINT),
       round(corr(l_extendedprice, l_tax), 6) FROM lineitem
UNION ALL
SELECT 'l_quantity', 'l_tax', CAST(count(*) AS BIGINT),
       round(corr(l_quantity, l_tax), 6) FROM lineitem
"""


# --------------------------------------------------------------------------
# compression-ratio quality signal — the classic repetitiveness filter
# for pretraining corpora (a highly repetitive document compresses far
# below typical prose): per-document zlib ratio, flagged below a
# threshold.  Purely map-side (no exchange at all); the per-row
# zlib.compress call is the vectorization floor — each call is one C
# routine over the document bytes, the same per-row-C-kernel shape as
# tokenizers.  No SQL oracle (DuckDB has no zlib); determinism is
# zlib-level-6 byte counts, pinned by unit test.
# --------------------------------------------------------------------------

_ZRATIO_LEVEL = 6
_ZRATIO_FLAG_BELOW = 0.35


def q_compression_ratio(sf_dir: str):
    import zlib

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        raw = np.empty(len(texts), np.int64)
        comp = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            bs = (t or "").encode("utf-8")
            raw[i] = len(bs)
            comp[i] = len(zlib.compress(bs, _ZRATIO_LEVEL))
        ratio = comp / np.maximum(raw, 1)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "raw_len": pa.array(raw, pa.int64()),
                "comp_len": pa.array(comp, pa.int64()),
                "ratio": pa.array(np.round(ratio, 6), pa.float64()),
                "flag_repetitive": pa.array(ratio < _ZRATIO_FLAG_BELOW),
            }
        )

    return _to_table(ds.map_batches(score, batch_format="pyarrow"))


# --------------------------------------------------------------------------
# local clustering coefficient — per-node LCC = 2·tri(v) / (deg(v)·
# (deg(v)−1)) over the co-supply graph: reuses the size-gated triangle
# counter (local numpy pass / six bucketed exchanges) and the
# O(nodes)-row degree table, joined reduce-side with the tag-union
# pattern (no driver-resident node map).  The float is ONE IEEE divide
# of exact int64s, identical on both engines; the oracle is the
# wedge-join triangle SQL extended per corner.
# --------------------------------------------------------------------------

_LCC_SCHEMA = pa.schema(
    [
        ("supp_node", pa.int64()),
        ("deg", pa.int64()),
        ("n_triangles", pa.int64()),
        ("lcc", pa.float64()),
    ]
)


def q_clustering_coeff(sf_dir: str):
    edges = _cosupply_edges(sf_dir).materialize()
    if edges.count() == 0:
        return _LCC_SCHEMA.empty_table()
    if (edges.size_bytes() or 0) <= _TRI_LOCAL_MAX_BYTES:
        tri = _triangles_local(dd._collect(edges))
    else:
        tri = _triangles_distributed(edges)
    degs = _node_degrees(edges)  # (node, deg), O(nodes) rows

    # reduce-side merge: degree rows carry n_triangles = -1 sentinel,
    # triangle rows deg = -1; one bucketed exchange on the node id
    def tri_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "node": b.column("supp_node"),
                "deg": pa.array(np.full(n, -1, np.int64), pa.int64()),
                "nt": b.column("n_triangles"),
            }
        )

    def deg_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "node": b.column("node"),
                "deg": b.column("deg"),
                "nt": pa.array(np.full(n, -1, np.int64), pa.int64()),
            }
        )

    tagged = ray.data.from_arrow(tri).map_batches(
        tri_rows, batch_format="pyarrow"
    ).union(degs.map_batches(deg_rows, batch_format="pyarrow"))

    def merge(df: pd.DataFrame) -> pa.Table:
        d = df[df["nt"] < 0][["node", "deg"]]
        t = df[df["deg"] < 0][["node", "nt"]]
        m = d.merge(t, on="node", how="left")
        m["nt"] = m["nt"].fillna(0).astype(np.int64)
        m = m[m["deg"] >= 2]
        deg = m["deg"].to_numpy()
        nt = m["nt"].to_numpy()
        lcc = 2.0 * nt / (deg * (deg - 1))
        return pa.table(
            {
                "supp_node": pa.array(m["node"].to_numpy(), pa.int64()),
                "deg": pa.array(deg, pa.int64()),
                "n_triangles": pa.array(nt, pa.int64()),
                "lcc": pa.array(np.round(lcc, 6), pa.float64()),
            }
        )

    return _to_table(_bucketed(tagged, "node", merge))


SQL_CLUSTERING_COEFF = f"""
WITH {_COSUPPLY_SQL_E},
tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
        FROM e a JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v),
pern AS (SELECT node, count(*) AS nt FROM
         (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri) GROUP BY node),
d AS (SELECT node, count(*) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node)
SELECT d.node AS supp_node, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(pern.nt, 0) AS BIGINT) AS n_triangles,
       round(2.0 * COALESCE(pern.nt, 0) / (d.deg * (d.deg - 1)), 6) AS lcc
FROM d LEFT JOIN pern ON pern.node = d.node
WHERE d.deg >= 2
"""


# --------------------------------------------------------------------------
# k-core extraction (k = 3) — iterative peeling over the co-supply
# graph: drop every node with degree < k, recompute, repeat to a fixed
# point.  Size-gated like bfs_hops: small edge lists peel in one numpy
# pass; the distributed path re-derives degrees with the existing
# O(nodes)-row exchange per round and broadcasts only the per-round
# REMOVED-node id array (ray.put → vectorized pc.is_in edge filter) —
# total driver traffic is O(nodes removed) across all rounds, never
# edges.  Rows-only (k-core needs iteration; no single SQL oracle) —
# planted-clique + dist≡local pins in tests.
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_LOCAL_MAX_BYTES = 64 << 20
_KCORE_MAX_ROUNDS = 64
_KCORE_SCHEMA = pa.schema([("supp_node", pa.int64()), ("core_deg", pa.int64())])


def _kcore_local(t: pa.Table, k: int) -> pa.Table:
    u = t.column("u").to_numpy(zero_copy_only=False).copy()
    v = t.column("v").to_numpy(zero_copy_only=False).copy()
    while len(u):
        nodes, counts = np.unique(np.concatenate([u, v]), return_counts=True)
        drop = nodes[counts < k]
        if not len(drop):
            deg_of = dict(zip(nodes.tolist(), counts.tolist()))
            out = sorted(deg_of.items())
            return pa.table(
                {
                    "supp_node": pa.array([n for n, _ in out], pa.int64()),
                    "core_deg": pa.array([d for _, d in out], pa.int64()),
                }
            )
        keep = ~(np.isin(u, drop) | np.isin(v, drop))
        u, v = u[keep], v[keep]
    return _KCORE_SCHEMA.empty_table()


def q_k_core(sf_dir: str, local_max_bytes: int = _KCORE_LOCAL_MAX_BYTES):
    k = _KCORE_K
    edges = _cosupply_edges(sf_dir).materialize()
    if edges.count() == 0:
        return _KCORE_SCHEMA.empty_table()
    if (edges.size_bytes() or 0) <= local_max_bytes:
        return _kcore_local(dd._collect(edges), k)

    for _ in range(_KCORE_MAX_ROUNDS):
        degs = _node_degrees(edges)
        low = _to_table_s(
            degs.filter(expr=f"deg < {k}"),
            pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
        )
        drop = low.column("node").to_numpy(zero_copy_only=False)
        if len(drop) == 0:
            break
        drop_ref = ray.put(np.sort(drop))

        def prune(b: pa.Table, drop_ref=drop_ref) -> pa.Table:
            d = ray.get(drop_ref)
            bad = pc.or_(
                pc.is_in(b.column("u"), value_set=pa.array(d, pa.int64())),
                pc.is_in(b.column("v"), value_set=pa.array(d, pa.int64())),
            )
            return b.filter(pc.invert(bad))

        edges = edges.map_batches(prune, batch_format="pyarrow").materialize()
        if edges.count() == 0:
            return _KCORE_SCHEMA.empty_table()
    else:
        import warnings

        warnings.warn(
            f"k_core did not converge in {_KCORE_MAX_ROUNDS} rounds",
            RuntimeWarning,
            stacklevel=2,
        )

    final = _to_table_s(
        _node_degrees(edges), pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    )
    out = final.sort_by("node")
    return pa.table(
        {
            "supp_node": out.column("node"),
            "core_deg": out.column("deg"),
        }
    )


# --------------------------------------------------------------------------
# BPE merge-table training — the tokenizer-training op for a pretrain
# corpus, built the standard way (the way HF trainers do): ONE
# distributed word-count exchange collapses the corpus to its bounded
# (word, count) vocabulary, then the merge loop runs on that tiny
# table (vocab ≪ corpus — the documented assumption, with the same
# audible cap as unigram_logprob).  Pair counts weight by word count;
# ties break (count desc, pair lexicographic asc) so the merge
# sequence is deterministic.  Rows-only: BPE is iterative, no SQL.
# --------------------------------------------------------------------------

_BPE_MERGES = 50
_BPE_MAX_VOCAB = 2_000_000


def q_bpe_train(sf_dir: str, n_merges: int = _BPE_MERGES):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def vocab_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), "[^a-z]+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table(
            {
                "word": vc.field("values"),
                "cnt": vc.field("counts").cast(pa.int64()),
            }
        )

    vocab = _to_table(
        ds.map_batches(vocab_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    schema = pa.schema(
        [
            ("rank", pa.int64()),
            ("left", pa.string()),
            ("right", pa.string()),
            ("pair_count", pa.int64()),
        ]
    )
    if vocab.num_rows == 0:
        return schema.empty_table()
    if vocab.num_rows > _BPE_MAX_VOCAB:
        import warnings

        warnings.warn(
            f"bpe_train vocabulary has {vocab.num_rows} entries "
            f"(> {_BPE_MAX_VOCAB}); driver merge loop is large — "
            "apply a min-count floor upstream for web-scale corpora",
            RuntimeWarning,
            stacklevel=2,
        )
    words = [
        (tuple(w), int(c))
        for w, c in zip(
            vocab.column("word").to_pylist(), vocab.column("cnt").to_pylist()
        )
    ]
    ranks, lefts, rights, counts = [], [], [], []
    for r in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, rgt), bc = best
        ranks.append(r)
        lefts.append(l)
        rights.append(rgt)
        counts.append(bc)
        merged = l + rgt
        new_words = []
        for syms, c in words:
            if len(syms) < 2:
                new_words.append((syms, c))
                continue
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rgt:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), c))
        words = new_words
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "pair_count": pa.array(counts, pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# exact grouped trimmed mean (10% each tail) — the robust-statistics
# sibling of winsorize, on the mann_whitney/spearman histogram shape:
# a batch collapses to its distinct (lang, n_chars, count) rows, ONE
# O(langs × distinct values)-row exchange, and the trim + mean fold
# runs on the tiny histogram (exact integer sums; the final mean is
# one IEEE divide identical on both engines).  Trim count n//10 is
# integer on both sides — no float boundary.
# --------------------------------------------------------------------------


def q_trimmed_mean(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (
            pd.DataFrame(
                {"lang": b["lang"].to_numpy(), "v": b["n_chars"].to_numpy()}
            )
            .groupby(["lang", "v"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "v": pa.array(g["v"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    hist_schema = pa.schema(
        [("lang", pa.string()), ("v", pa.int64()), ("cnt", pa.int64())]
    )
    hist = _sum_partials(
        ds.map_batches(partial, batch_format="pandas"),
        ["lang", "v"],
        ["cnt"],
        hist_schema,
    ).to_pandas()
    out_schema = pa.schema(
        [("lang", pa.string()), ("n_kept", pa.int64()), ("trimmed_mean", pa.float64())]
    )
    if hist.empty:
        return out_schema.empty_table()
    langs, kept, means = [], [], []
    for lang, g in hist.sort_values(["lang", "v"]).groupby("lang", sort=True):
        v = g["v"].to_numpy()
        c = g["cnt"].to_numpy()
        n = int(c.sum())
        trim = n // 10
        # keep ranks (trim, n - trim] of the sorted multiset — exact
        # per-value kept counts from the cumulative histogram
        cum = np.cumsum(c)
        lo_kept = np.minimum(c, np.maximum(0, cum - trim))
        hi_cap = n - trim - np.concatenate([[0], cum[:-1]])
        keep_c = np.minimum(lo_kept, np.maximum(0, hi_cap))
        nk = int(keep_c.sum())
        s = int((v * keep_c).sum())
        langs.append(lang)
        kept.append(nk)
        means.append(round(s / nk, 6))
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "n_kept": pa.array(kept, pa.int64()),
            "trimmed_mean": pa.array(means, pa.float64()),
        }
    )


SQL_TRIMMED_MEAN = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents)
SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS trimmed_mean
FROM r WHERE rn > n // 10 AND rn <= n - n // 10
GROUP BY lang
"""


# --------------------------------------------------------------------------
# Rank-sum AUC — the classifier-quality-filter evaluation stat (how
# well a score column separates a label, e.g. a fastText-style quality
# score vs a "keep" label; here n_chars scoring lang='en').  The exact
# Mann-Whitney construction on the VALUE HISTOGRAM instead of per-row
# ranks: per-batch (value, pos, neg) counts → ONE summed exchange of
# O(distinct values) rows → the tie-aware trapezoid fold
# Σ pos_v·(cum_neg_below + neg_v/2) / (P·N) on the driver.  No global
# sort, no per-row rank window — the shape that survives 10^12 rows
# (distinct score values are bounded, rows are not).
# --------------------------------------------------------------------------


def q_auc_ranksum(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        pos = pc.cast(pc.equal(b.column("lang"), "en"), pa.int64())
        neg = pc.subtract(1, pos)
        g = pa.table(
            {"v": pc.cast(b.column("n_chars"), pa.int64()), "p": pos, "n": neg}
        ).group_by(["v"]).aggregate([("p", "sum"), ("n", "sum")])
        return pa.table(
            {
                "v": g.column("v"),
                "p": g.column("p_sum"),
                "n": g.column("n_sum"),
            }
        )

    hist = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["v"],
        ["p", "n"],
        pa.schema([("v", pa.int64()), ("p", pa.int64()), ("n", pa.int64())]),
    ).to_pandas()
    out_schema = pa.schema(
        [("n_pos", pa.int64()), ("n_neg", pa.int64()), ("auc", pa.float64())]
    )
    if hist.empty:
        return out_schema.empty_table()
    hist = hist.sort_values("v")
    p = hist["p"].to_numpy(dtype=np.int64)
    n = hist["n"].to_numpy(dtype=np.int64)
    P, N = int(p.sum()), int(n.sum())
    if P == 0 or N == 0:  # AUC undefined — 0 rows, same as the oracle
        return out_schema.empty_table()
    cum_n_below = np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.float64)
    num = float((p * (cum_n_below + 0.5 * n)).sum())
    return pa.table(
        {
            "n_pos": pa.array([P], pa.int64()),
            "n_neg": pa.array([N], pa.int64()),
            "auc": pa.array([round(num / (float(P) * float(N)), 6)], pa.float64()),
        }
    )


SQL_AUC_RANKSUM = """
WITH vc AS (SELECT CAST(n_chars AS BIGINT) AS v,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p,
                   CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n
            FROM documents GROUP BY 1),
     cw AS (SELECT p, n, sum(n) OVER (ORDER BY v) - n AS cum_n FROM vc),
     tot AS (SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(sum(n) AS BIGINT) AS tn
             FROM vc)
SELECT tp AS n_pos, tn AS n_neg,
       round(sum(p * (CAST(cum_n AS DOUBLE) + 0.5 * n))
             / (CAST(tp AS DOUBLE) * tn), 6) AS auc
FROM cw CROSS JOIN tot
GROUP BY tp, tn
HAVING tp > 0 AND tn > 0
"""


# --------------------------------------------------------------------------
# Population stability index — the data-drift monitor between two
# corpus slices (the stat a training-data pipeline alarms on when a
# new crawl's length distribution shifts).  Top-2 sources by count
# (ties: source asc, the ks_sources convention), n_chars binned at
# width 50, Laplace-smoothed (c+1)/(t+B) over the union of observed
# bins so ln() never sees a zero, PSI = Σ (p1−p2)·ln(p1/p2).  Same
# 100-TB shape as ks_sources: one O(distinct bins) summed exchange.
# --------------------------------------------------------------------------

_PSI_BIN = 50


def q_psi_drift(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        bins = pc.divide(pc.cast(b.column("n_chars"), pa.int64()), _PSI_BIN)
        g = pa.table({"source": b.column("source"), "bin": bins}).group_by(
            ["source", "bin"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "bin": g.column("bin"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    vc = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "bin"],
        ["c"],
        pa.schema([("source", pa.string()), ("bin", pa.int64()), ("c", pa.int64())]),
    ).to_pandas()
    out_schema = pa.schema(
        [
            ("s1", pa.string()),
            ("s2", pa.string()),
            ("n1", pa.int64()),
            ("n2", pa.int64()),
            ("psi", pa.float64()),
        ]
    )
    if vc.empty or vc["source"].nunique() < 2:
        return out_schema.empty_table()
    totals = (
        vc.groupby("source")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "source"], ascending=[False, True])
    )
    s1, s2 = totals["source"].iloc[0], totals["source"].iloc[1]
    n1, n2 = int(totals["c"].iloc[0]), int(totals["c"].iloc[1])
    sub = vc[vc["source"].isin([s1, s2])]
    piv = sub.pivot_table(
        index="bin", columns="source", values="c", fill_value=0, aggfunc="sum"
    )
    c1 = piv[s1].to_numpy(dtype=np.int64) if s1 in piv else np.zeros(len(piv), np.int64)
    c2 = piv[s2].to_numpy(dtype=np.int64) if s2 in piv else np.zeros(len(piv), np.int64)
    nb = len(piv)
    p1 = (c1 + 1.0) / (float(n1) + nb)
    p2 = (c2 + 1.0) / (float(n2) + nb)
    psi = float(((p1 - p2) * np.log(p1 / p2)).sum())
    return pa.table(
        {
            "s1": pa.array([s1], pa.string()),
            "s2": pa.array([s2], pa.string()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "psi": pa.array([round(psi, 6)], pa.float64()),
        }
    )


SQL_PSI_DRIFT = f"""
WITH top2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (ORDER BY count(*) DESC, source) AS r
              FROM documents GROUP BY 1),
     s1 AS (SELECT source, n FROM top2 WHERE r = 1),
     s2 AS (SELECT source, n FROM top2 WHERE r = 2),
     b AS (SELECT n_chars // {_PSI_BIN} AS bin,
                  CAST(sum(CASE WHEN source = (SELECT source FROM s1)
                                THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN source = (SELECT source FROM s2)
                                THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM documents
           WHERE source IN ((SELECT source FROM s1), (SELECT source FROM s2))
           GROUP BY 1),
     k AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM b)
SELECT (SELECT source FROM s1) AS s1, (SELECT source FROM s2) AS s2,
       (SELECT n FROM s1) AS n1, (SELECT n FROM s2) AS n2,
       round(sum(((c1 + 1.0) / ((SELECT n FROM s1) + nb)
                  - (c2 + 1.0) / ((SELECT n FROM s2) + nb))
                 * ln(((c1 + 1.0) / ((SELECT n FROM s1) + nb))
                      / ((c2 + 1.0) / ((SELECT n FROM s2) + nb)))), 6) AS psi
FROM b CROSS JOIN k
HAVING count(*) > 0
"""


# --------------------------------------------------------------------------
# Jensen-Shannon divergence between the language mixes of the top-2
# sources — the bounded-symmetric drift stat (0 = identical mixes,
# ln 2 = disjoint) used to compare corpus slices where KL blows up on
# zeros.  Zero-count langs contribute 0 via the 0·ln(0/m)=0
# convention (CASE in the oracle, mask here) — no smoothing needed
# because the mixture m is nonzero wherever either side is.  One
# O(sources × langs) summed exchange.
# --------------------------------------------------------------------------


def q_js_divergence(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "lang": g.column("lang"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    vc = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["source", "lang"],
        ["c"],
        pa.schema([("source", pa.string()), ("lang", pa.string()), ("c", pa.int64())]),
    ).to_pandas()
    out_schema = pa.schema(
        [
            ("s1", pa.string()),
            ("s2", pa.string()),
            ("n1", pa.int64()),
            ("n2", pa.int64()),
            ("js", pa.float64()),
        ]
    )
    if vc.empty or vc["source"].nunique() < 2:
        return out_schema.empty_table()
    totals = (
        vc.groupby("source")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "source"], ascending=[False, True])
    )
    s1, s2 = totals["source"].iloc[0], totals["source"].iloc[1]
    n1, n2 = int(totals["c"].iloc[0]), int(totals["c"].iloc[1])
    sub = vc[vc["source"].isin([s1, s2])]
    piv = sub.pivot_table(
        index="lang", columns="source", values="c", fill_value=0, aggfunc="sum"
    )
    c1 = piv[s1].to_numpy(dtype=np.int64) if s1 in piv else np.zeros(len(piv), np.int64)
    c2 = piv[s2].to_numpy(dtype=np.int64) if s2 in piv else np.zeros(len(piv), np.int64)
    p = c1 / float(n1)
    q_ = c2 / float(n2)
    m = 0.5 * (p + q_)
    t1 = np.where(p > 0, p * np.log(np.where(p > 0, p, 1.0) / np.where(m > 0, m, 1.0)), 0.0)
    t2 = np.where(q_ > 0, q_ * np.log(np.where(q_ > 0, q_, 1.0) / np.where(m > 0, m, 1.0)), 0.0)
    js = float(0.5 * t1.sum() + 0.5 * t2.sum())
    return pa.table(
        {
            "s1": pa.array([s1], pa.string()),
            "s2": pa.array([s2], pa.string()),
            "n1": pa.array([n1], pa.int64()),
            "n2": pa.array([n2], pa.int64()),
            "js": pa.array([round(js, 6)], pa.float64()),
        }
    )


SQL_JS_DIVERGENCE = """
WITH top2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (ORDER BY count(*) DESC, source) AS r
              FROM documents GROUP BY 1),
     s1 AS (SELECT source, n FROM top2 WHERE r = 1),
     s2 AS (SELECT source, n FROM top2 WHERE r = 2),
     b AS (SELECT lang,
                  CAST(sum(CASE WHEN source = (SELECT source FROM s1)
                                THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(sum(CASE WHEN source = (SELECT source FROM s2)
                                THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM documents
           WHERE source IN ((SELECT source FROM s1), (SELECT source FROM s2))
           GROUP BY 1),
     pq AS (SELECT c1 / CAST((SELECT n FROM s1) AS DOUBLE) AS p,
                   c2 / CAST((SELECT n FROM s2) AS DOUBLE) AS q
            FROM b)
SELECT (SELECT source FROM s1) AS s1, (SELECT source FROM s2) AS s2,
       (SELECT n FROM s1) AS n1, (SELECT n FROM s2) AS n2,
       round(sum(0.5 * (CASE WHEN p > 0 THEN p * ln(p / (0.5 * (p + q)))
                             ELSE 0 END)
                 + 0.5 * (CASE WHEN q > 0 THEN q * ln(q / (0.5 * (p + q)))
                               ELSE 0 END)), 6) AS js
FROM pq
HAVING count(*) > 0
"""


# --------------------------------------------------------------------------
# quantile normalization across sources — map every document's length
# onto the GLOBAL length distribution at the same within-source rank
# position (the batch-effect-removal transform; here: per-source
# length re-calibration before corpus mixing, so no source's crawler
# truncation policy skews the mix).  Integer-exact end to end:
# within-source MIN-rank r (ties share), target global rank
# g = 1 + ((r−1)(N−1)) // (n_s−1), and "global value at rank g" is
# invariant under tie order.  The (source, value) → normalized-value
# mapping is computed once on the bounded (source, value, count) CDF
# table with Python ints (no int64 overflow at any N), broadcast via
# ray.put, and applied map-side — the wide data crosses NO shuffle.
# --------------------------------------------------------------------------


def q_quantile_normalize(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "source": b.column("source").to_numpy(zero_copy_only=False),
                    "val": b.column("n_chars").to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["source", "val"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "val": pa.array(g["val"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    cdf = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["source", "val"],
            sum_cols=["cnt"],
            schema=pa.schema(
                [("source", pa.string()), ("val", pa.int64()), ("cnt", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["source", "val"])
    )
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("norm_chars", pa.int64()),
        ]
    )
    if cdf.empty:
        return out_schema.empty_table()

    glob = cdf.groupby("val", sort=True)["cnt"].sum()
    gvals = glob.index.to_numpy(dtype=np.int64)
    gcum = np.cumsum(glob.to_numpy(dtype=np.int64))
    N = int(gcum[-1])

    lut: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for src, g in cdf.groupby("source", sort=False):
        vals = g["val"].to_numpy(dtype=np.int64)
        cnt = g["cnt"].to_numpy(dtype=np.int64)
        below = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        n_s = int(cnt.sum())
        norm = np.empty(len(vals), dtype=np.int64)
        for j in range(len(vals)):
            r = int(below[j]) + 1  # min-rank: ties share
            if n_s == 1:
                gr = 1 + (N - 1) // 2
            else:
                gr = 1 + ((r - 1) * (N - 1)) // (n_s - 1)  # Python ints: no overflow
            norm[j] = gvals[int(np.searchsorted(gcum, gr, side="left"))]
        lut[src] = (vals, norm)
    lref = ray.put(lut)

    def norm_map(b: pa.Table) -> pa.Table:
        m = ray.get(lref)
        src = b.column("source").to_numpy(zero_copy_only=False)
        nc = b.column("n_chars").to_numpy(zero_copy_only=False)
        out = np.zeros(len(nc), dtype=np.int64)
        for s in pd.unique(src):
            vals, norm = m[s]
            mask = src == s
            out[mask] = norm[np.searchsorted(vals, nc[mask])]
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "source": b.column("source"),
                "n_chars": b.column("n_chars"),
                "norm_chars": pa.array(out, pa.int64()),
            }
        )

    ds2 = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "source", "n_chars"])
    return _to_table(ds2.map_batches(norm_map, batch_format="pyarrow"))


SQL_QUANTILE_NORMALIZE = """
WITH r AS (SELECT doc_id, source, n_chars,
                  rank() OVER (PARTITION BY source ORDER BY n_chars) AS rk,
                  count(*) OVER (PARTITION BY source) AS ns,
                  count(*) OVER () AS n
           FROM documents),
     gv AS (SELECT n_chars AS gval,
                   row_number() OVER (ORDER BY n_chars) AS gr
            FROM documents)
SELECT doc_id, source, n_chars, CAST(gval AS BIGINT) AS norm_chars
FROM r JOIN gv ON gv.gr = CASE WHEN ns = 1 THEN 1 + (n - 1) // 2
                               ELSE 1 + ((rk - 1) * (n - 1)) // (ns - 1) END
"""


# --------------------------------------------------------------------------
# Z-order (Morton-curve) layout key — the locality-preserving sort a
# lakehouse writer runs so range predicates on EITHER user_id or time
# prune the same file set (Delta/Iceberg OPTIMIZE ZORDER analog).
# The key interleaves the low 16 bits of user_id with the low 16 bits
# of the event's epoch-minute — pure int64 bit arithmetic, identical
# in numpy and the generated 32-term SQL expression.  Map-side key +
# ONE distributed sort (the exchange IS the operator here: the whole
# point is the physical output order); order-sensitive LIMIT verifies
# the order itself, as in shuffle_export.
# --------------------------------------------------------------------------

_Z_SIDE_BITS = 16
_Z_MASK = (1 << _Z_SIDE_BITS) - 1


def _zorder_interleave(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave the low 16 bits of x (even positions) and y (odd)."""
    x = x.astype(np.uint64) & np.uint64(_Z_MASK)
    y = y.astype(np.uint64) & np.uint64(_Z_MASK)
    z = np.zeros(len(x), dtype=np.uint64)
    for k in range(_Z_SIDE_BITS):
        z |= ((x >> np.uint64(k)) & np.uint64(1)) << np.uint64(2 * k)
        z |= ((y >> np.uint64(k)) & np.uint64(1)) << np.uint64(2 * k + 1)
    return z.astype(np.int64)


def q_zorder_layout(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])

    def zmap(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        z = _zorder_interleave(uid, ts // 60_000_000)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "zkey": pa.array(z, pa.int64()),
            }
        )

    out = (
        ds.map_batches(zmap, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["zkey", "event_id"])
        .limit(200)
    )
    return _to_table_s(
        out,
        pa.schema(
            [("event_id", pa.int64()), ("user_id", pa.int64()), ("zkey", pa.int64())]
        ),
    )


_Z_TERMS_SQL = " + ".join(
    f"(((x >> {k}) & 1) << {2 * k}) + (((y >> {k}) & 1) << {2 * k + 1})"
    for k in range(_Z_SIDE_BITS)
)

SQL_ZORDER_LAYOUT = f"""
WITH b AS (SELECT event_id, user_id,
                  user_id % 65536 AS x,
                  (epoch_us(ts) // 60000000) % 65536 AS y
           FROM events)
SELECT event_id, user_id, CAST({_Z_TERMS_SQL} AS BIGINT) AS zkey
FROM b ORDER BY zkey, event_id LIMIT 200
"""


# --------------------------------------------------------------------------
# bigram log-probability score — the order-1 sibling of
# q_unigram_logprob (the CCNet-style LM quality filter): pass 1
# builds the corpus bigram table with the vocab combiner (adjacent
# non-empty token pairs; the left marginal c1 = Σ_w2 c(w1,w2) falls
# out of the same table, no second pass), pass 2 broadcasts the
# sorted (composite-key, ln(c12/c1)) arrays once and scores each doc
# map-side with searchsorted + segment means.  Bottom-k = the docs
# whose word TRANSITIONS are most surprising — catches shuffled /
# concatenated boilerplate that unigram stats miss.  Both engines
# sort the ROUNDED score (unigram_logprob precedent).
# --------------------------------------------------------------------------

_BLP_BOTTOM_K = 25


def _doc_bigrams(batch: pa.Table):
    """(w1, w2, parent_doc_row) arrays of adjacent non-empty token
    pairs per document row.  Interior empties cannot occur (greedy
    `[^a-z]+` split), so pairing the non-empty stream within a parent
    matches the oracle's zipped-slice pairing exactly."""
    toks = pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    parents = pc.list_parent_indices(toks).filter(keep).to_numpy(zero_copy_only=False)
    words = flat.filter(keep).to_numpy(zero_copy_only=False)
    if len(words) < 2:
        e = np.array([], dtype=object)
        return e, e, np.array([], dtype=np.int64)
    adj = parents[:-1] == parents[1:]
    return words[:-1][adj], words[1:][adj], parents[:-1][adj]


def q_bigram_logprob(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pair_partial(batch: pa.Table) -> pa.Table:
        w1, w2, _ = _doc_bigrams(batch)
        g = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .reset_index(name="c12")
        )
        return pa.table(
            {
                "w1": pa.array(g["w1"], pa.string()),
                "w2": pa.array(g["w2"], pa.string()),
                "c12": pa.array(g["c12"].to_numpy(), pa.int64()),
            }
        )

    freq = _sum_partials(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        keys=["w1", "w2"],
        sum_cols=["c12"],
        schema=pa.schema(
            [("w1", pa.string()), ("w2", pa.string()), ("c12", pa.int64())]
        ),
    ).to_pandas()
    out_schema = pa.schema([("doc_id", pa.int64()), ("logprob", pa.float64())])
    if freq.empty:
        return out_schema.empty_table()
    if len(freq) > _ULP_MAX_VOCAB:
        import warnings

        warnings.warn(
            f"bigram_logprob table has {len(freq)} entries (> {_ULP_MAX_VOCAB}); "
            "apply a min-count floor upstream for web-scale corpora",
            RuntimeWarning,
            stacklevel=2,
        )
    c1 = freq.groupby("w1")["c12"].transform("sum").to_numpy(dtype=np.float64)
    # integer pair keys: vocab-index each side once, key = i1·V + i2 —
    # the int64 searchsorted replaces a 2×-concat string key whose
    # per-element allocations dominated the 1M-doc scale run (44 s →
    # see SCALE.md); V ≤ 2M keeps i1·V + i2 < 2^63
    vocab = np.unique(np.concatenate([freq["w1"].to_numpy(), freq["w2"].to_numpy()]))
    V = np.int64(len(vocab))
    i1 = np.searchsorted(vocab, freq["w1"].to_numpy()).astype(np.int64)
    i2 = np.searchsorted(vocab, freq["w2"].to_numpy()).astype(np.int64)
    key = i1 * V + i2
    order = np.argsort(key)
    key = key[order]
    logp = np.log(freq["c12"].to_numpy(dtype=np.float64)[order] / c1[order])
    vref = ray.put((vocab, V, key, logp))

    def score(batch: pa.Table) -> pa.Table:
        voc, nv, k, lp = ray.get(vref)
        w1, w2, par = _doc_bigrams(batch)
        n_rows = batch.num_rows
        sums = np.zeros(n_rows)
        counts = np.zeros(n_rows)
        if len(w1):
            pk = (
                np.searchsorted(voc, w1).astype(np.int64) * nv
                + np.searchsorted(voc, w2).astype(np.int64)
            )
            idx = np.searchsorted(k, pk)  # every pair is in-corpus
            np.add.at(sums, par, lp[idx])
            np.add.at(counts, par, 1.0)
        has = counts > 0
        mean = np.full(n_rows, np.nan)
        mean[has] = sums[has] / counts[has]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logprob": pa.array(np.round(mean, 6), pa.float64()),
            }
        ).filter(pa.array(has))

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["logprob", "doc_id"])
        .limit(_BLP_BOTTOM_K)
    )
    return _to_table_s(out, out_schema)


SQL_BIGRAM_LOGPROB = f"""
WITH w AS (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS ws
           FROM documents),
     p AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1,
                  unnest(ws[2:len(ws)]) AS w2 FROM w),
     p2 AS (SELECT doc_id, w1, w2 FROM p WHERE w1 <> '' AND w2 <> ''),
     f AS (SELECT w1, w2, count(*) AS c12 FROM p2 GROUP BY 1, 2),
     m AS (SELECT w1, sum(c12) AS c1 FROM f GROUP BY 1)
SELECT doc_id, round(avg(ln(CAST(c12 AS DOUBLE) / c1)), 6) AS logprob
FROM p2 JOIN f USING (w1, w2) JOIN m USING (w1)
GROUP BY doc_id ORDER BY logprob, doc_id LIMIT {_BLP_BOTTOM_K}
"""


# --------------------------------------------------------------------------
# hot-key skew report — the diagnostic this engine runs BEFORE picking
# join salting / bucket counts: top-10 keys by total payload bytes.
# Per-batch (key, rows, bytes) combiner; each _merge_partials bucket
# emits only ITS top-10 (a key lives entirely in one bucket, so
# per-bucket top-10 → global top-10 is exact) — the driver sees
# O(buckets × 10) rows at any scale.
# --------------------------------------------------------------------------

_SKEW_TOP_N = 10
_SKEW_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("n_events", pa.int64()), ("payload_bytes", pa.int64())]
)


def q_skew_report(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "props"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "nb": pc.binary_length(b.column("props"))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False),
                }
            )
            .groupby("user_id", sort=False)
            .agg(n_events=("nb", "size"), payload_bytes=("nb", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_events": pa.array(g["n_events"].to_numpy(), pa.int64()),
                "payload_bytes": pa.array(g["payload_bytes"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("user_id", as_index=False)[["n_events", "payload_bytes"]].sum()
        g = g.sort_values(
            ["payload_bytes", "user_id"], ascending=[False, True]
        ).head(_SKEW_TOP_N)
        return pa.table(
            {f.name: pa.array(g[f.name].to_numpy(), f.type) for f in _SKEW_SCHEMA}
        )

    merged = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        per_bucket,
        input_schema=_SKEW_SCHEMA,
    )
    df = (
        merged.to_pandas()
        .sort_values(["payload_bytes", "user_id"], ascending=[False, True])
        .head(_SKEW_TOP_N)
    )
    return pa.table({f.name: pa.array(df[f.name].to_numpy(), f.type) for f in _SKEW_SCHEMA})


SQL_SKEW_REPORT = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(strlen(props)) AS BIGINT) AS payload_bytes
FROM events GROUP BY user_id
ORDER BY payload_bytes DESC, user_id LIMIT {_SKEW_TOP_N}
"""


# --------------------------------------------------------------------------
# distributed logistic regression (IRLS/Newton) — fit "is this doc
# English?" from length + punctuation-density features.  Each of the
# 4 rounds broadcasts β once and every batch emits ONE 13-float
# partial row (the symmetric 3×3 normal matrix XᵀWX flattened, the
# gradient Xᵀ(y−p), and n); the driver solves the 3×3 system — model
# state crossing the exchange is O(iterations × blocks), never O(rows).
# Rows-only: iterative float fitting has no ANSI-SQL twin; the
# planted-separable recovery test pins correctness
# (tests/test_round10_ops.py).
# --------------------------------------------------------------------------

_LOGREG_ITERS = 4


def _logreg_features(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    n_chars = batch.column("n_chars").to_numpy(zero_copy_only=False).astype(np.float64)
    punct = (
        pc.count_substring_regex(batch.column("text"), r"[^A-Za-z0-9\s]")
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    x1 = n_chars / 1000.0
    x2 = 100.0 * punct / np.maximum(n_chars, 1.0)
    X = np.column_stack([np.ones(len(x1)), x1, x2])
    y = (
        pc.equal(batch.column("lang"), pa.scalar("en"))
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    return X, y


def q_logreg_irls(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text", "lang", "n_chars"])
    beta = np.zeros(3)
    n_total = 0.0
    for _ in range(_LOGREG_ITERS):
        bref = ray.put(beta.copy())

        def part(batch: pa.Table, bref=bref) -> pa.Table:
            X, y = _logreg_features(batch)
            b = ray.get(bref)
            p = 1.0 / (1.0 + np.exp(-np.clip(X @ b, -30, 30)))
            w = p * (1.0 - p) + 1e-9
            A = X.T @ (X * w[:, None])
            g = X.T @ (y - p)
            row = np.concatenate([A.ravel(), g, [float(len(y))]])
            return pa.table({f"v{i}": pa.array([row[i]]) for i in range(13)})

        tot = (
            _to_table(ds.map_batches(part, batch_format="pyarrow"))
            .to_pandas()
            .sum()
            .to_numpy()
        )
        if len(tot) != 13 or tot[12] == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "value": pa.array([], pa.float64())}
            )
        A = tot[:9].reshape(3, 3)
        g = tot[9:12]
        n_total = tot[12]
        try:
            beta = beta + np.linalg.solve(A, g)
        except np.linalg.LinAlgError:
            beta = beta + np.linalg.lstsq(A, g, rcond=None)[0]

    bref = ray.put(beta.copy())

    def acc_part(batch: pa.Table, bref=bref) -> pa.Table:
        X, y = _logreg_features(batch)
        b = ray.get(bref)
        pred = (X @ b) > 0
        return pa.table({"hit": pa.array([float((pred == (y > 0.5)).sum())])})

    hits = float(
        _to_table(ds.map_batches(acc_part, batch_format="pyarrow"))
        .to_pandas()["hit"]
        .sum()
    )
    return pa.table(
        {
            "term": pa.array(
                ["intercept", "n_chars_k", "punct_per_100", "accuracy", "n"],
                pa.string(),
            ),
            "value": pa.array(
                [
                    round(float(beta[0]), 6),
                    round(float(beta[1]), 6),
                    round(float(beta[2]), 6),
                    round(hits / n_total, 6),
                    float(n_total),
                ],
                pa.float64(),
            ),
        }
    )


# --------------------------------------------------------------------------
# BPE encode — apply q_bpe_train's rank-ordered merge table to the
# corpus and report per-doc token counts (the tokenize step of a
# pretraining pipeline; pairs with pack_sequences downstream).  The
# merge table (≤n_merges rows) broadcasts once; each batch encodes
# only its DISTINCT words (the same vocab ≪ corpus assumption as
# bpe_train — encoded-word results are memoized per batch) and maps
# counts back to docs with searchsorted + segment sums.  Rows-only:
# the merge loop is iterative; char-mass conservation and the
# no-merge identity are pinned in tests/test_round10_ops.py.
# --------------------------------------------------------------------------


def _bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard (GPT-2-style) BPE apply: repeatedly merge every
    occurrence of the lowest-rank adjacent pair until none applies."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        l, rgt = best_pair
        merged = l + rgt
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rgt:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def q_bpe_encode(sf_dir: str):
    merges = q_bpe_train(sf_dir)
    ranks = {
        (l, r): k
        for k, (l, r) in enumerate(
            zip(merges.column("left").to_pylist(), merges.column("right").to_pylist())
        )
    }
    rref = ray.put(ranks)
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()), ("n_tokens", pa.int64())]
    )

    def enc(batch: pa.Table) -> pa.Table:
        rk = ray.get(rref)
        toks = pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        parents = (
            pc.list_parent_indices(toks).filter(keep).to_numpy(zero_copy_only=False)
        )
        words = flat.filter(keep).to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        wcnt = np.zeros(n_rows, dtype=np.int64)
        tcnt = np.zeros(n_rows, dtype=np.int64)
        if len(words):
            uniq = np.unique(words.astype(str))
            ntok = np.array(
                [len(_bpe_encode_word(w, rk)) for w in uniq], dtype=np.int64
            )
            idx = np.searchsorted(uniq, words.astype(str))
            np.add.at(wcnt, parents, 1)
            np.add.at(tcnt, parents, ntok[idx])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(wcnt, pa.int64()),
                "n_tokens": pa.array(tcnt, pa.int64()),
            }
        )

    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return _to_table_s(
        ds.map_batches(enc, batch_format="pyarrow").sort("doc_id"), out_schema
    )


# --------------------------------------------------------------------------
# data-quality audit — the constraint-validation sweep a lake runs
# before admitting a batch: referential integrity (orphan orders),
# domain ranges (quantity/discount), null/empty payloads, and a
# derived-column consistency check (n_chars vs the text itself).
# Four pruned-column scans, each a scalar count combiner; the
# customer keyset broadcasts once via ray.put (the documented small-
# dimension assumption — the anti_join_shuffle path is the fallback
# when the dimension outgrows a worker heap).  Emits one fixed row
# per check — O(checks), never O(rows), reaches the driver.
# --------------------------------------------------------------------------


def _scalar_count(ds: ray.data.Dataset, count_of) -> int:
    """Sum of a per-batch violation counter (int64 end to end)."""

    def part(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array([int(count_of(b))], pa.int64())})

    t = _to_table(ds.map_batches(part, batch_format="pyarrow"))
    return int(t.column("n").to_pandas().sum()) if t.num_rows else 0


def q_dq_checks(sf_dir: str):
    cust = _read_pq(_t(sf_dir, "customer"), columns=["c_custkey"])
    ckeys = np.sort(
        _to_table(cust).column("c_custkey").to_numpy(zero_copy_only=False)
    )
    ckref = ray.put(ckeys)

    def orphan(b: pa.Table) -> int:
        keys = ray.get(ckref)
        ok = pc.is_in(b.column("o_custkey"), value_set=pa.array(keys, pa.int64()))
        return b.num_rows - int(pc.sum(pc.cast(ok, pa.int8())).as_py() or 0)

    checks = [
        (
            "documents_nchars_mismatch",
            _scalar_count(
                _read_pq(_t(sf_dir, "documents"), columns=["text", "n_chars"]),
                lambda b: int(
                    pc.sum(
                        pc.cast(
                            pc.not_equal(
                                pc.utf8_length(b.column("text")).cast(pa.int64()),
                                b.column("n_chars"),
                            ),
                            pa.int8(),
                        )
                    ).as_py()
                    or 0
                ),
            ),
        ),
        (
            "events_null_props",
            _scalar_count(
                _read_pq(_t(sf_dir, "events"), columns=["props"]),
                lambda b: int(
                    pc.sum(
                        pc.cast(
                            pc.or_kleene(
                                pc.is_null(b.column("props")),
                                pc.equal(b.column("props"), ""),
                            ),
                            pa.int8(),
                        )
                    ).as_py()
                    or 0
                ),
            ),
        ),
        (
            "lineitem_discount_range",
            _scalar_count(
                _read_pq(_t(sf_dir, "lineitem"), columns=["l_discount"]),
                lambda b: int(
                    pc.sum(
                        pc.cast(
                            pc.or_(
                                pc.less(b.column("l_discount"), 0.0),
                                pc.greater(b.column("l_discount"), 1.0),
                            ),
                            pa.int8(),
                        )
                    ).as_py()
                    or 0
                ),
            ),
        ),
        (
            "lineitem_nonpositive_qty",
            _scalar_count(
                _read_pq(_t(sf_dir, "lineitem"), columns=["l_quantity"]),
                lambda b: int(
                    pc.sum(
                        pc.cast(pc.less_equal(b.column("l_quantity"), 0.0), pa.int8())
                    ).as_py()
                    or 0
                ),
            ),
        ),
        (
            "orders_orphan_custkey",
            _scalar_count(
                _read_pq(_t(sf_dir, "orders"), columns=["o_custkey"]), orphan
            ),
        ),
    ]
    return pa.table(
        {
            "dq_check": pa.array([c[0] for c in checks], pa.string()),
            "n_violations": pa.array([c[1] for c in checks], pa.int64()),
        }
    )


SQL_DQ_CHECKS = """
SELECT 'documents_nchars_mismatch' AS dq_check,
       CAST(count(*) FILTER (n_chars <> length(text)) AS BIGINT) AS n_violations
FROM documents
UNION ALL
SELECT 'events_null_props',
       CAST(count(*) FILTER (props IS NULL OR props = '') AS BIGINT)
FROM events
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem_nonpositive_qty',
       CAST(count(*) FILTER (l_quantity <= 0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(count(*) FILTER (o_custkey NOT IN (SELECT c_custkey FROM customer))
            AS BIGINT)
FROM orders
"""


# --------------------------------------------------------------------------
# regex findall + explode — extract EVERY embedded integer from each
# document (the multi-match sibling of props_extract's single-field
# extract): maximal digit runs via one vectorized split-on-complement
# pass (split_pattern_regex('[^0-9]+') ≡ regexp_extract_all('[0-9]+')
# for maximal runs), Arrow-cast to int64, segment-summed back to the
# doc.  Runs longer than 18 digits are excluded on BOTH engines (the
# int64 bound); map-only, no exchange at any scale.
# --------------------------------------------------------------------------


def q_extract_numbers(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def part(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(b.column("text"), "[^0-9]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        keep = pc.and_(
            pc.not_equal(flat, ""),
            pc.less_equal(pc.utf8_length(flat), 18),
        )
        vals = pc.cast(flat.filter(keep), pa.int64()).to_numpy(zero_copy_only=False)
        par = parents.filter(keep).to_numpy(zero_copy_only=False)
        n_rows = b.num_rows
        cnt = np.zeros(n_rows, dtype=np.int64)
        tot = np.zeros(n_rows, dtype=np.int64)
        if len(vals):
            np.add.at(cnt, par, 1)
            np.add.at(tot, par, vals)
        has = cnt > 0
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_ints": pa.array(cnt, pa.int64()),
                "sum_ints": pa.array(tot, pa.int64()),
            }
        ).filter(pa.array(has))

    return _to_table_s(
        ds.map_batches(part, batch_format="pyarrow"),
        pa.schema(
            [("doc_id", pa.int64()), ("n_ints", pa.int64()), ("sum_ints", pa.int64())]
        ),
    )


SQL_EXTRACT_NUMBERS = """
WITH x AS (SELECT doc_id, unnest(regexp_extract_all(text, '[0-9]+')) AS s
           FROM documents),
     y AS (SELECT doc_id, CAST(s AS BIGINT) AS v FROM x WHERE length(s) <= 18)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ints, CAST(sum(v) AS BIGINT) AS sum_ints
FROM y GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# activity-grid hotspot detection — the density diagnostic over the
# (user-bucket × day-of-week) grid: top-10 hottest cells plus an
# exact-integer ≥2×-mean flag (cnt · n_cells ≥ 2 · total — no float
# ever compares).  Day-of-week from pure integer epoch math
# ((days+4) % 7, 1970-01-01 = Thursday) so neither engine's calendar
# convention leaks in.  O(grid) crosses the exchange regardless of
# rows.
# --------------------------------------------------------------------------

_HOTSPOT_BUCKETS = 64
_HOTSPOT_TOP = 10


def q_grid_hotspots(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def part(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ep = (
            b.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        g = (
            pd.DataFrame(
                {
                    "bucket": uid % _HOTSPOT_BUCKETS,
                    "dow": (ep // 86_400_000_000 + 4) % 7,
                }
            )
            .groupby(["bucket", "dow"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "bucket": pa.array(g["bucket"].to_numpy(), pa.int64()),
                "dow": pa.array(g["dow"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy(), pa.int64()),
            }
        )

    grid = _sum_partials(
        ds.map_batches(part, batch_format="pyarrow"),
        keys=["bucket", "dow"],
        sum_cols=["cnt"],
        schema=pa.schema(
            [("bucket", pa.int64()), ("dow", pa.int64()), ("cnt", pa.int64())]
        ),
    ).to_pandas()
    out_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("dow", pa.int64()),
            ("cnt", pa.int64()),
            ("is_hot", pa.bool_()),
        ]
    )
    if grid.empty:
        return out_schema.empty_table()
    total = int(grid["cnt"].sum())
    nc = len(grid)
    grid = grid.sort_values(
        ["cnt", "bucket", "dow"], ascending=[False, True, True]
    ).head(_HOTSPOT_TOP)
    return pa.table(
        {
            "bucket": pa.array(grid["bucket"].to_numpy(), pa.int64()),
            "dow": pa.array(grid["dow"].to_numpy(), pa.int64()),
            "cnt": pa.array(grid["cnt"].to_numpy(), pa.int64()),
            "is_hot": pa.array(
                (grid["cnt"].to_numpy(dtype=np.int64) * nc >= 2 * total), pa.bool_()
            ),
        }
    )


SQL_GRID_HOTSPOTS = f"""
WITH g AS (SELECT (user_id % {_HOTSPOT_BUCKETS}) AS bucket,
                  ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
     t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                  CAST(count(*) AS BIGINT) AS nc FROM g)
SELECT bucket, dow, cnt, (cnt * nc >= 2 * total) AS is_hot
FROM g CROSS JOIN t
ORDER BY cnt DESC, bucket, dow LIMIT {_HOTSPOT_TOP}
"""


# --------------------------------------------------------------------------
# record highs — every event whose value strictly exceeds ALL
# preceding events' values in (ts, event_id) order: the distributed
# GLOBAL PREFIX-MAX primitive (the max sibling of running_total's
# prefix sum, and the core of watermark/lateness tracking on ordered
# streams).  Two bounded passes: per-1h-range max-cents partials →
# driver exclusive running max over O(ranges) → one range-bucketed
# exchange where each range resolves its events against
# max(prior-range prefix, in-range shifted cummax).  Output is
# O(log n) rows in expectation (records over exchangeable values).
# --------------------------------------------------------------------------

_REC_RANGE_US = 3_600_000_000  # 1 h ts ranges (the running_total grain)
_REC_NEG_INF = -(2**62)


def q_record_highs(sf_dir: str):
    import zlib

    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {"range": t.to_numpy(zero_copy_only=False) // _REC_RANGE_US,
                 "cents": cents}
            )
            .groupby("range", sort=False)["cents"]
            .max()
            .reset_index(name="mx")
        )
        return pa.table(
            {
                "range": pa.array(g["range"].to_numpy(), pa.int64()),
                "mx": pa.array(g["mx"].to_numpy(), pa.int64()),
            }
        )

    def merge_max(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("range", as_index=False)["mx"].max()
        return pa.table(
            {
                "range": pa.array(g["range"].to_numpy(), pa.int64()),
                "mx": pa.array(g["mx"].to_numpy(), pa.int64()),
            }
        )

    rng_schema = pa.schema([("range", pa.int64()), ("mx", pa.int64())])
    ranges = (
        _merge_partials(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
            "range",
            merge_max,
            input_schema=rng_schema,
        )
        .to_pandas()
        .sort_values("range")
    )
    out_schema = pa.schema([("event_id", pa.int64()), ("cents", pa.int64())])
    if ranges.empty:
        return out_schema.empty_table()
    mx = ranges["mx"].to_numpy(dtype=np.int64)
    prev = np.concatenate(
        [[_REC_NEG_INF], np.maximum.accumulate(mx)[:-1]]
    )  # exclusive prefix max per range
    offsets = dict(zip(ranges["range"].to_numpy(), prev))

    def add_keys(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        rng = pc.divide(t, _REC_RANGE_US)
        bucket = pa.array(
            [zlib.crc32(str(v).encode()) % _STAT_BUCKETS for v in rng.to_pylist()],
            pa.int32(),
        )
        return (
            batch.append_column("_ts_us", t)
            .append_column("_range", rng)
            .append_column("_bucket", bucket)
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["_range", "_ts_us", "event_id"], kind="mergesort")
        cents = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        b = b.assign(_cents=cents)
        grp = b.groupby("_range", sort=False)["_cents"]
        within = grp.cummax().groupby(b["_range"].to_numpy()).shift(1)
        within = within.fillna(float(_REC_NEG_INF)).to_numpy().astype(np.int64)
        wm = np.maximum(within, b["_range"].map(offsets).to_numpy(dtype=np.int64))
        rec = cents > wm
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy()[rec], pa.int64()),
                "cents": pa.array(cents[rec], pa.int64()),
            }
        )

    out = _to_table_s(
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_STAT_BUCKETS)
        .map_groups(per_bucket, batch_format="pandas"),
        out_schema,
    )
    return out.sort_by("event_id")


SQL_RECORD_HIGHS = """
WITH r AS (SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents,
                  max(CAST(round(value * 100) AS BIGINT))
                    OVER (ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS prev_max
           FROM events)
SELECT event_id, cents FROM r
WHERE prev_max IS NULL OR cents > prev_max
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# storage/compaction diagnostic — one row per table file with footer
# metadata only (rows, row groups, compressed bytes, bytes/row): the
# manifest scan a lakehouse runs to decide compaction and bucket
# counts.  Footers are read in DISTRIBUTED tasks (never the data
# pages); rows-only — file-level metadata is not a SQL view.
# --------------------------------------------------------------------------

_ALL_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

_STORAGE_SCHEMA = pa.schema(
    [
        ("tbl", pa.string()),
        ("file", pa.string()),
        ("n_rows", pa.int64()),
        ("n_row_groups", pa.int64()),
        ("compressed_bytes", pa.int64()),
        ("bytes_per_row", pa.int64()),
    ]
)


def q_storage_stats(sf_dir: str):
    from ..sources.scan import parquet_files

    items = []
    for t in _ALL_TABLES:
        p = _t(sf_dir, t)
        if os.path.isdir(p):  # directory-form table: one row PER FILE
            items += [{"tbl": t, "path": f} for f in parquet_files(p)]
        elif os.path.exists(p):
            items.append({"tbl": t, "path": p})
    if not items:
        return _STORAGE_SCHEMA.empty_table()
    ds = ray.data.from_items(items)

    def stat(b: pa.Table) -> pa.Table:
        names, files, rows, groups, comp = [], [], [], [], []
        for tname, path in zip(
            b.column("tbl").to_pylist(), b.column("path").to_pylist()
        ):
            md = pa.parquet.read_metadata(path)
            names.append(tname)
            files.append(os.path.basename(path))
            rows.append(md.num_rows)
            groups.append(md.num_row_groups)
            comp.append(
                sum(
                    md.row_group(i).column(j).total_compressed_size
                    for i in range(md.num_row_groups)
                    for j in range(md.row_group(i).num_columns)
                )
            )
        return pa.table(
            {
                "tbl": pa.array(names, pa.string()),
                "file": pa.array(files, pa.string()),
                "n_rows": pa.array(rows, pa.int64()),
                "n_row_groups": pa.array(groups, pa.int64()),
                "compressed_bytes": pa.array(comp, pa.int64()),
                "bytes_per_row": pa.array(
                    [c // max(r, 1) for c, r in zip(comp, rows)], pa.int64()
                ),
            }
        )

    return _to_table_s(
        ds.map_batches(stat, batch_format="pyarrow"), _STORAGE_SCHEMA
    ).sort_by([("tbl", "ascending"), ("file", "ascending")])


# --------------------------------------------------------------------------
# int8-quantized ANN — the memory-bandwidth scale path for similarity
# search (4× smaller vectors, integer dot products): pass 1 collects
# per-dimension |max| via O(dims × batches) partials, symmetric
# scales s_d = amax_d/127 broadcast once; pass 2 quantizes each batch
# in place and scores the int8 matmul, cutting to a per-batch top-k
# partial before the per-query reduction.  Rows-only (approximate by
# construction); recall ≥0.8 vs the float brute force is pinned in
# tests/test_round10_ops.py.
# --------------------------------------------------------------------------


def q_embed_quantize(sf_dir: str):
    from ..stages.similarity import vecs_to_numpy

    qv = _query_vectors(sf_dir)
    out_schema = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("qcos", pa.float64())]
    )
    if not qv:
        return out_schema.empty_table()
    ds = _read_pq(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def amax_partial(b: pa.Table) -> pa.Table:
        v = np.abs(vecs_to_numpy(b.column("embedding"))).max(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(len(v)), pa.int64()),
                "amax": pa.array(v, pa.float64()),
            }
        )

    def merge_amax(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("dim", as_index=False)["amax"].max()
        return pa.table(
            {
                "dim": pa.array(g["dim"].to_numpy(), pa.int64()),
                "amax": pa.array(g["amax"].to_numpy(), pa.float64()),
            }
        )

    am = (
        _merge_partials(
            ds.map_batches(amax_partial, batch_format="pyarrow"),
            "dim",
            merge_amax,
            input_schema=pa.schema([("dim", pa.int64()), ("amax", pa.float64())]),
        )
        .to_pandas()
        .sort_values("dim")
    )
    scale = np.maximum(am["amax"].to_numpy(), 1e-12) / 127.0

    q_ids = sorted(qv)
    qmat = np.asarray([qv[i] for i in q_ids], dtype=np.float64)
    qq = np.clip(np.rint(qmat / scale), -127, 127).astype(np.int8)
    bref = ray.put((np.asarray(q_ids, dtype=np.int64), qq, scale))

    def score(b: pa.Table) -> pa.Table:
        ids, qq8, sc = ray.get(bref)
        v = vecs_to_numpy(b.column("embedding"))
        v8 = np.clip(np.rint(v / sc), -127, 127).astype(np.int8)
        dots = v8.astype(np.int32) @ qq8.astype(np.int32).T  # (n, q)
        vn = np.sqrt((v8.astype(np.int64) ** 2).sum(axis=1))
        qn = np.sqrt((qq8.astype(np.int64) ** 2).sum(axis=1))
        cos = dots / np.maximum(vn[:, None] * qn[None, :], 1e-12)
        vid = b.column("vec_id").to_numpy(zero_copy_only=False)
        parts = []
        for qi in range(len(ids)):
            order = np.lexsort((vid, -cos[:, qi]))[: _ANN_K]  # per-batch top-k cut
            parts.append(
                pa.table(
                    {
                        "query_id": pa.array(
                            np.full(len(order), ids[qi]), pa.int64()
                        ),
                        "vec_id": pa.array(vid[order], pa.int64()),
                        "qcos": pa.array(np.round(cos[order, qi], 6), pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["qcos", "vec_id"], ascending=[False, True]
        ).head(_ANN_K)

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(topk, batch_format="pandas")
    )
    return _to_table_s(out, out_schema)


# --------------------------------------------------------------------------
# OHLC candles — the classic streaming bar aggregate: per (event_type,
# 6h window) open/high/low/close/count in exact integer cents.
# Open/close are ARGMIN/ARGMAX by (ts, event_id) carried as candidate
# triplets through the combiner (the first_last pattern widened to
# four simultaneous reductions); one O(types × windows) exchange.
# --------------------------------------------------------------------------

_OHLC_WIN_US = 21_600_000_000  # 6 h


def q_ohlc_candles(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "ts", "event_type", "value"])

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("win", pa.int64()),
            ("o_ts", pa.int64()),
            ("o_eid", pa.int64()),
            ("o_c", pa.int64()),
            ("c_ts", pa.int64()),
            ("c_eid", pa.int64()),
            ("c_c", pa.int64()),
            ("high", pa.int64()),
            ("low", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b.column("event_type").to_numpy(zero_copy_only=False),
                "win": t // _OHLC_WIN_US,
                "ts": t,
                "eid": b.column("event_id").to_numpy(zero_copy_only=False),
                "c": cents,
            }
        ).sort_values(["event_type", "win", "ts", "eid"], kind="mergesort")
        g = df.groupby(["event_type", "win"], sort=False)
        agg = pd.DataFrame(
            {
                "o_ts": g["ts"].first(),
                "o_eid": g["eid"].first(),
                "o_c": g["c"].first(),
                "c_ts": g["ts"].last(),
                "c_eid": g["eid"].last(),
                "c_c": g["c"].last(),
                "high": g["c"].max(),
                "low": g["c"].min(),
                "n": g["c"].size(),
            }
        ).reset_index()
        return pa.table(
            {f.name: pa.array(agg[f.name].to_numpy(), f.type) for f in part_schema}
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        bo = b.sort_values(["o_ts", "o_eid"], kind="mergesort")
        go = bo.groupby(["event_type", "win"], sort=False)
        bc = b.sort_values(["c_ts", "c_eid"], ascending=[False, False], kind="mergesort")
        gc = bc.groupby(["event_type", "win"], sort=False)
        g = b.groupby(["event_type", "win"], sort=False)
        out = pd.DataFrame(
            {
                "open": go["o_c"].first(),
                "high": g["high"].max(),
                "low": g["low"].min(),
                "close": gc["c_c"].first(),
                "n": g["n"].sum(),
            }
        ).reset_index()
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "win": pa.array(out["win"].to_numpy(), pa.int64()),
                "open": pa.array(out["open"].to_numpy(), pa.int64()),
                "high": pa.array(out["high"].to_numpy(), pa.int64()),
                "low": pa.array(out["low"].to_numpy(), pa.int64()),
                "close": pa.array(out["close"].to_numpy(), pa.int64()),
                "n": pa.array(out["n"].to_numpy(), pa.int64()),
            }
        )

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        per_bucket,
        input_schema=part_schema,
    )


SQL_OHLC_CANDLES = f"""
WITH w AS (SELECT event_type, epoch_us(ts) // {_OHLC_WIN_US} AS win,
                  CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
           FROM events),
     r AS (SELECT *,
                  row_number() OVER (PARTITION BY event_type, win
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY event_type, win
                                     ORDER BY ts DESC, event_id DESC) AS rnd
           FROM w)
SELECT event_type, win,
       CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS open,
       CAST(max(cents) AS BIGINT) AS high,
       CAST(min(cents) AS BIGINT) AS low,
       CAST(max(CASE WHEN rnd = 1 THEN cents END) AS BIGINT) AS close,
       CAST(count(*) AS BIGINT) AS n
FROM r GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# join-cardinality estimate — the optimizer statistic this engine's
# own size-aware join gates want: |lineitem ⋈ orders on orderkey| =
# Σ_k cA(k)·cB(k), computed EXACTLY from the two per-key count
# combiner streams (O(keys) rows cross, never the data; per-bucket
# product partials so the driver sees O(buckets)).  The CMS
# inner-product ESTIMATE of the same quantity (min_d Σ_w A_d·B_d —
# the sketch the gate would use when even O(keys) is too much) is
# pinned within 5% in tests/test_round10_ops.py.
# --------------------------------------------------------------------------


def q_join_size_estimate(sf_dir: str):
    part_schema = pa.schema(
        [("k", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
    )

    def side(path: str, key: str, col: str) -> ray.data.Dataset:
        ds = _read_pq(path, columns=[key])

        def part(b: pa.Table, key=key, col=col) -> pa.Table:
            vc = b.column(key).value_counts()
            n = pc.cast(vc.field("counts"), pa.int64())
            z = pa.array(np.zeros(len(vc), np.int64), pa.int64())
            return pa.table(
                {
                    "k": vc.field("values").cast(pa.int64()),
                    "na": n if col == "na" else z,
                    "nb": n if col == "nb" else z,
                }
            )

        return ds.map_batches(part, batch_format="pyarrow")

    partials = side(_t(sf_dir, "lineitem"), "l_orderkey", "na").union(
        side(_t(sf_dir, "orders"), "o_orderkey", "nb")
    )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("k", as_index=False)[["na", "nb"]].sum()
        s = int((g["na"].to_numpy() * g["nb"].to_numpy()).sum())
        return pa.table({"part": pa.array([s], pa.int64())})

    parts = _merge_partials(partials, "k", per_bucket, input_schema=part_schema)
    df = parts.to_pandas()
    if df.empty or int(df["part"].sum()) == 0:
        # empty join → SQL's sum() over zero rows: one NULL row
        return pa.table({"join_rows": pa.array([None], pa.int64())})
    return pa.table(
        {"join_rows": pa.array([int(df["part"].sum())], pa.int64())}
    )


SQL_JOIN_SIZE_ESTIMATE = """
WITH a AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
     b AS (SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1)
SELECT CAST(sum(a.n * b.n) AS BIGINT) AS join_rows FROM a JOIN b USING (k)
"""


# --------------------------------------------------------------------------
# linear-interpolation gap fill — materialize each user's value series
# on an hourly grid (the time-series regularization step before any
# fixed-step model): for every consecutive event pair [t, t2) emit the
# grid hours it half-open-covers, value = ((t2−h)·c + (h−t)·c2)/(t2−t).
# Numerator/denominator are exact int64 on both engines, so the single
# float divide is bit-identical; rounded to 6.  One user-bucketed
# exchange; the variable-length hour expansion is a vectorized
# repeat+arange, no per-segment Python.  Output is O(users × span
# hours) — the GRID, not the events, bounds it.
# --------------------------------------------------------------------------

_INTERP_U = 3_600_000_000  # 1 h grid

_INTERP_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("hour_us", pa.int64()), ("interp_cents", pa.float64())]
)


def q_interp_fill(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        c = np.rint(b["value"].to_numpy() * 100).astype(np.int64)
        u = b["user_id"].to_numpy()
        if len(t) < 2:
            return _INTERP_SCHEMA.empty_table()
        same = (u[:-1] == u[1:]) & (t[1:] > t[:-1])
        t1, t2 = t[:-1][same], t[1:][same]
        c1, c2 = c[:-1][same], c[1:][same]
        uu = u[:-1][same]
        k0 = (t1 + _INTERP_U - 1) // _INTERP_U
        k1 = (t2 + _INTERP_U - 1) // _INTERP_U - 1
        cnt = np.maximum(k1 - k0 + 1, 0)
        tot = int(cnt.sum())
        if tot == 0:
            return _INTERP_SCHEMA.empty_table()
        idx = np.repeat(np.arange(len(cnt)), cnt)
        within = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        h = (np.repeat(k0, cnt) + within) * _INTERP_U
        T1, T2 = t1[idx], t2[idx]
        num = (T2 - h) * c1[idx] + (h - T1) * c2[idx]
        v = num / (T2 - T1).astype(np.float64)
        # DuckDB round(x, 6) is half-AWAY-from-zero; np.round is
        # half-to-even — 5 of 10.5M rows at the 1M-event lake landed
        # exactly on the boundary and split the engines (SCALE.md)
        val = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "user_id": pa.array(uu[idx], pa.int64()),
                "hour_us": pa.array(h, pa.int64()),
                "interp_cents": pa.array(val, pa.float64()),
            }
        )

    return _to_table_s(_bucketed(ds, "user_id", per_bucket), _INTERP_SCHEMA)


SQL_INTERP_FILL = f"""
WITH b AS (SELECT user_id, epoch_us(ts) AS t, CAST(round(value*100) AS BIGINT) AS c,
                  lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS t2,
                  lead(CAST(round(value*100) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c2
           FROM events),
     seg AS (SELECT * FROM b WHERE t2 IS NOT NULL AND t2 > t)
SELECT user_id, k * {_INTERP_U} AS hour_us,
       round(((t2 - k*{_INTERP_U}) * c + (k*{_INTERP_U} - t) * c2)
             / CAST(t2 - t AS DOUBLE), 6) AS interp_cents
FROM seg, unnest(generate_series((t + {_INTERP_U - 1}) // {_INTERP_U},
                                 (t2 + {_INTERP_U - 1}) // {_INTERP_U} - 1)) AS u(k)
"""


# --------------------------------------------------------------------------
# mass-coverage point — "how many documents (largest-first) carry half
# the corpus chars": the concentration-curve statistic behind
# curation decisions like 'the top N docs dominate the token budget'.
# Computed from the bounded (value, count) histogram with Python-int
# prefix sums and an exact in-tie-group crossing ceil division — no
# global sort, no per-doc rank; O(distinct values) crosses the
# exchange.
# --------------------------------------------------------------------------


def q_mass_coverage(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["n_chars"])

    def part(b: pa.Table) -> pa.Table:
        vc = b.column("n_chars").value_counts()
        return pa.table(
            {
                "val": vc.field("values").cast(pa.int64()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    vc = (
        _sum_partials(
            ds.map_batches(part, batch_format="pyarrow"),
            keys=["val"],
            sum_cols=["cnt"],
            schema=pa.schema([("val", pa.int64()), ("cnt", pa.int64())]),
        )
        .to_pandas()
        .sort_values("val", ascending=False)
    )
    if vc.empty:
        return pa.table(
            {
                "n_docs": pa.array([None], pa.int64()),
                "covered": pa.array([None], pa.int64()),
                "total": pa.array([None], pa.int64()),
            }
        )
    vals = vc["val"].to_numpy(dtype=np.int64)
    cnts = vc["cnt"].to_numpy(dtype=np.int64)
    tot = int((vals * cnts).sum())
    cumb, nb = 0, 0
    n_docs = covered = None
    for v, cnt in zip(vals.tolist(), cnts.tolist()):
        grp = v * cnt
        if 2 * (cumb + grp) >= tot:
            if v <= 0:  # zero-length docs: first one already "covers" a 0 total
                k = 1
            else:
                k = (tot - 2 * cumb + 2 * v - 1) // (2 * v)
                k = max(k, 1)
            n_docs = nb + k
            covered = cumb + k * max(v, 0)
            break
        cumb += grp
        nb += cnt
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "covered": pa.array([covered], pa.int64()),
            "total": pa.array([tot], pa.int64()),
        }
    )


SQL_MASS_COVERAGE = """
WITH o AS (SELECT n_chars,
                  sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id) AS cum,
                  row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn,
                  sum(n_chars) OVER () AS tot
           FROM documents)
SELECT CAST(min(rn) AS BIGINT) AS n_docs, CAST(min(cum) AS BIGINT) AS covered,
       CAST(min(tot) AS BIGINT) AS total
FROM o WHERE 2*cum >= tot
"""


# --------------------------------------------------------------------------
# stickiness (avg-DAU / total-users) — the product-analytics engagement
# ratio: batches collapse to distinct (user, day) pairs, ONE
# user-bucketed exchange dedupes them (a user lives entirely in its
# bucket, so per-bucket distinct pairs/users sum exactly); each bucket
# emits per-day pair counts plus a user-count sentinel row — the
# driver folds O(buckets × days) rows, never events.  The final ratio
# is two IEEE divides written in the same order as the oracle.
# --------------------------------------------------------------------------

_STICKY_SCHEMA = pa.schema(
    [("day", pa.int64()), ("pairs", pa.int64()), ("users", pa.int64())]
)


def q_stickiness(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "day": t // 86_400_000_000,
                }
            )
            .drop_duplicates()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        d = b.drop_duplicates(["user_id", "day"])
        per_day = d.groupby("day").size()
        return pa.table(
            {
                "day": pa.array(
                    np.concatenate([per_day.index.to_numpy(), [-1]]), pa.int64()
                ),
                "pairs": pa.array(
                    np.concatenate([per_day.to_numpy(), [0]]), pa.int64()
                ),
                "users": pa.array(
                    np.concatenate(
                        [np.zeros(len(per_day), np.int64), [d["user_id"].nunique()]]
                    ),
                    pa.int64(),
                ),
            }
        )

    folded = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        per_bucket,
        input_schema=pa.schema([("user_id", pa.int64()), ("day", pa.int64())]),
    ).to_pandas()
    real = folded[folded["day"] >= 0]
    if real.empty:
        # the oracle's group-less aggregate still emits its one row:
        # (NULL, 0, 0, NULL) on an empty lake
        return pa.table(
            {
                "user_days": pa.array([None], pa.int64()),
                "n_days": pa.array([0], pa.int64()),
                "total_users": pa.array([0], pa.int64()),
                "stickiness": pa.array([None], pa.float64()),
            }
        )
    user_days = int(real["pairs"].sum())
    n_days = int(real["day"].nunique())
    total_users = int(folded["users"].sum())
    sticky = round(float(user_days) / n_days / total_users, 6)
    return pa.table(
        {
            "user_days": pa.array([user_days], pa.int64()),
            "n_days": pa.array([n_days], pa.int64()),
            "total_users": pa.array([total_users], pa.int64()),
            "stickiness": pa.array([sticky], pa.float64()),
        }
    )


SQL_STICKINESS = """
WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id
           FROM events GROUP BY 1, 2),
     per_day AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY 1),
     tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS mau FROM events)
SELECT CAST(sum(dau) AS BIGINT) AS user_days, CAST(count(*) AS BIGINT) AS n_days,
       (SELECT mau FROM tot) AS total_users,
       round(CAST(sum(dau) AS DOUBLE) / count(*) / (SELECT mau FROM tot), 6)
         AS stickiness
FROM per_day
"""


# --------------------------------------------------------------------------
# rate-limit audit — burst detection over (user, minute) windows: how
# many windows exceeded the 1-event/min budget, the total excess, and
# the worst burst.  Per-batch (user, minute, cnt) partials; the final
# three scalars reduce INSIDE each merge bucket, so the driver sees
# O(buckets) rows even though distinct user-minutes approach event
# count on bursty traffic.
# --------------------------------------------------------------------------

_RATE_BUDGET = 1  # events per user-minute


def q_rate_limit_audit(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    part_schema = pa.schema(
        [("user_id", pa.int64()), ("minute", pa.int64()), ("cnt", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "minute": t // 60_000_000,
                }
            )
            .groupby(["user_id", "minute"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {f.name: pa.array(g[f.name].to_numpy(), f.type) for f in part_schema}
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["user_id", "minute"], as_index=False)["cnt"].sum()
        c = g["cnt"].to_numpy(dtype=np.int64)
        over = c > _RATE_BUDGET
        return pa.table(
            {
                "nv": pa.array([int(over.sum())], pa.int64()),
                "excess": pa.array(
                    [int((c[over] - _RATE_BUDGET).sum())], pa.int64()
                ),
                "mx": pa.array([int(c.max()) if len(c) else 0], pa.int64()),
            }
        )

    folded = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        per_bucket,
        input_schema=part_schema,
    ).to_pandas()
    if folded.empty or int(folded["mx"].max() if len(folded) else 0) == 0:
        # group-less aggregate row on empty input: (0, 0, NULL)
        return pa.table(
            {
                "n_violating_windows": pa.array([0], pa.int64()),
                "excess_events": pa.array([0], pa.int64()),
                "max_per_minute": pa.array([None], pa.int64()),
            }
        )
    return pa.table(
        {
            "n_violating_windows": pa.array([int(folded["nv"].sum())], pa.int64()),
            "excess_events": pa.array([int(folded["excess"].sum())], pa.int64()),
            "max_per_minute": pa.array([int(folded["mx"].max())], pa.int64()),
        }
    )


SQL_RATE_LIMIT_AUDIT = f"""
WITH m AS (SELECT user_id, epoch_us(ts) // 60000000 AS minute,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2)
SELECT CAST(count(*) FILTER (cnt > {_RATE_BUDGET}) AS BIGINT)
         AS n_violating_windows,
       CAST(coalesce(sum(CASE WHEN cnt > {_RATE_BUDGET}
                              THEN cnt - {_RATE_BUDGET} END), 0) AS BIGINT)
         AS excess_events,
       CAST(max(cnt) AS BIGINT) AS max_per_minute
FROM m
"""


# --------------------------------------------------------------------------
# Bayesian-smoothed rate — the feature-engineering estimator for
# sparse per-entity rates ((purchases + α) / (events + α + β),
# Beta(1,19) prior): per-batch (user, purchases, n) integer partials,
# per-bucket top-10 on the ROUNDED rate (both engines sort the same
# rounded alias, so float ties resolve identically by user_id);
# driver sees O(buckets × 10).
# --------------------------------------------------------------------------

_SRATE_TOP = 10

_SRATE_PART_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("purchases", pa.int64()), ("n_events", pa.int64())]
)


def q_smoothed_rate(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "p": pc.equal(b.column("event_type"), "purchase")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby("user_id", sort=False)
            .agg(purchases=("p", "sum"), n_events=("p", "size"))
            .reset_index()
        )
        return pa.table(
            {f.name: pa.array(g[f.name].to_numpy(), f.type) for f in _SRATE_PART_SCHEMA}
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("user_id", as_index=False)[["purchases", "n_events"]].sum()
        srate = np.round(
            (g["purchases"].to_numpy() + 1.0) / (g["n_events"].to_numpy() + 20.0), 6
        )
        g = g.assign(srate=srate).sort_values(
            ["srate", "user_id"], ascending=[False, True]
        ).head(_SRATE_TOP)
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "purchases": pa.array(g["purchases"].to_numpy(), pa.int64()),
                "n_events": pa.array(g["n_events"].to_numpy(), pa.int64()),
                "srate": pa.array(g["srate"].to_numpy(), pa.float64()),
            }
        )

    merged = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "user_id",
        per_bucket,
        input_schema=_SRATE_PART_SCHEMA,
    ).to_pandas()
    out = merged.sort_values(["srate", "user_id"], ascending=[False, True]).head(
        _SRATE_TOP
    )
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].to_numpy(), pa.int64()),
            "purchases": pa.array(out["purchases"].to_numpy(), pa.int64()),
            "n_events": pa.array(out["n_events"].to_numpy(), pa.int64()),
            "srate": pa.array(out["srate"].to_numpy(), pa.float64()),
        }
    )


SQL_SMOOTHED_RATE = f"""
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchases,
       CAST(count(*) AS BIGINT) AS n_events,
       round((count(*) FILTER (event_type = 'purchase') + 1.0)
             / (count(*) + 20.0), 6) AS srate
FROM events GROUP BY user_id ORDER BY srate DESC, user_id LIMIT {_SRATE_TOP}
"""


# --------------------------------------------------------------------------
# conversion latency — per user, first signup → first purchase AT OR
# AFTER it; report converted-user count and the exact median latency
# (quantile_disc convention: rank ⌈n/2⌉, the mad/percentiles
# precedent).  Users resolve entirely inside their bucket; the driver
# folds one latency per CONVERTED user — the same O(users) result
# granularity as the sessionize/rfm family.
# --------------------------------------------------------------------------


def q_conversion_latency(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_type"])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        t = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = b["event_type"].to_numpy()
        u = b["user_id"].to_numpy()
        lat = []
        sign = pd.DataFrame({"u": u[et == "signup"], "t": t[et == "signup"]})
        if not len(sign):
            return pa.table({"latency_us": pa.array([], pa.int64())})
        s = sign.groupby("u")["t"].min()
        pur = pd.DataFrame({"u": u[et == "purchase"], "t": t[et == "purchase"]})
        if len(pur):
            pur = pur.assign(ts0=pur["u"].map(s))
            pur = pur[pur["ts0"].notna() & (pur["t"] >= pur["ts0"])]
            conv = pur.groupby("u")["t"].min()
            lat = (conv - s[conv.index]).to_numpy().astype(np.int64)
        return pa.table({"latency_us": pa.array(lat, pa.int64())})

    lats = _to_table_s(
        _bucketed(ds, "user_id", per_bucket),
        pa.schema([("latency_us", pa.int64())]),
    )
    arr = np.sort(lats.column("latency_us").to_numpy(zero_copy_only=False))
    if len(arr) == 0:
        return pa.table(
            {
                "n_converted": pa.array([0], pa.int64()),
                "median_latency_us": pa.array([None], pa.int64()),
            }
        )
    med = int(arr[(len(arr) + 1) // 2 - 1])
    return pa.table(
        {
            "n_converted": pa.array([len(arr)], pa.int64()),
            "median_latency_us": pa.array([med], pa.int64()),
        }
    )


SQL_CONVERSION_LATENCY = """
WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t_signup
           FROM events WHERE event_type = 'signup' GROUP BY 1),
     p AS (SELECT e.user_id, min(epoch_us(ts)) AS t_conv
           FROM events e JOIN s USING (user_id)
           WHERE event_type = 'purchase' AND epoch_us(ts) >= s.t_signup
           GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       CAST(quantile_disc(p.t_conv - s.t_signup, 0.5) AS BIGINT)
         AS median_latency_us
FROM p JOIN s USING (user_id)
"""


# --------------------------------------------------------------------------
# association-rule metrics — confidence and lift for the qualifying
# co-purchase pairs (completes the A-Priori pass of copurchase_pairs):
# pair supports from the same bounded-basket pipeline, item supports
# as a per-part count combiner, the basket total as one distinct-
# orderkey dedup count; the ≤O(pairs) driver join computes
# conf = sup/s₁ and lift = sup·N/(s₁·s₂) with the identical
# int→double op order as the oracle.
# --------------------------------------------------------------------------


def q_basket_lift(sf_dir: str):
    pairs = q_copurchase_pairs(sf_dir).to_pandas()
    out_schema = pa.schema(
        [
            ("p1", pa.int64()),
            ("p2", pa.int64()),
            ("support", pa.int64()),
            ("confidence", pa.float64()),
            ("lift", pa.float64()),
        ]
    )
    if pairs.empty:
        return out_schema.empty_table()

    li = _read_pq(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_partkey"])

    def op_partial(b: pa.Table) -> pa.Table:
        f = pd.DataFrame(
            {
                "o": b.column("l_orderkey").to_numpy(zero_copy_only=False),
                "p": b.column("l_partkey").to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                "o": pa.array(f["o"].to_numpy(), pa.int64()),
                "p": pa.array(f["p"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        f = b.drop_duplicates(["o", "p"])
        g = f.groupby("p").size().reset_index(name="s")
        no = f["o"].nunique()
        return pa.table(
            {
                "p": pa.array(
                    np.concatenate([g["p"].to_numpy(), [-1]]), pa.int64()
                ),
                "s": pa.array(
                    np.concatenate([g["s"].to_numpy(), [0]]), pa.int64()
                ),
                "no": pa.array(
                    np.concatenate([np.zeros(len(g), np.int64), [no]]), pa.int64()
                ),
            }
        )

    # bucket on ORDERKEY: an order lives in one bucket, so per-bucket
    # distinct-order counts sum exactly; per-part counts need a second
    # fold (a part spans buckets) — the driver sums O(buckets × parts)
    folded = (
        _bucketed(
            li.map_batches(op_partial, batch_format="pyarrow", zero_copy_batch=True),
            "o",
            per_bucket,
        )
    )
    folded = _to_table_s(
        folded,
        pa.schema([("p", pa.int64()), ("s", pa.int64()), ("no", pa.int64())]),
    ).to_pandas()
    n_orders = int(folded["no"].sum())
    item = folded[folded["p"] >= 0].groupby("p")["s"].sum()
    s1 = pairs["p1"].map(item).to_numpy(dtype=np.int64)
    s2 = pairs["p2"].map(item).to_numpy(dtype=np.int64)
    sup = pairs["support"].to_numpy(dtype=np.int64)
    conf = np.round(sup.astype(np.float64) / s1, 6)
    lift = np.round(
        sup.astype(np.float64) * float(n_orders) / (s1 * s2).astype(np.float64), 6
    )
    out = pairs.assign(confidence=conf, lift=lift).sort_values(
        ["lift", "p1", "p2"], ascending=[False, True, True]
    )
    return pa.table(
        {
            "p1": pa.array(out["p1"].to_numpy(), pa.int64()),
            "p2": pa.array(out["p2"].to_numpy(), pa.int64()),
            "support": pa.array(out["support"].to_numpy(), pa.int64()),
            "confidence": pa.array(out["confidence"].to_numpy(), pa.float64()),
            "lift": pa.array(out["lift"].to_numpy(), pa.float64()),
        }
    )


SQL_BASKET_LIFT = f"""
WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
pr AS (SELECT a.p AS p1, c.p AS p2 FROM b a JOIN b c ON a.o = c.o AND a.p < c.p),
sup AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS support
        FROM pr GROUP BY 1, 2 HAVING count(*) >= {_BASKET_MIN_SUPPORT}),
item AS (SELECT p, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1),
n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS total FROM b)
SELECT p1, p2, support,
       round(CAST(support AS DOUBLE) / ia.s, 6) AS confidence,
       round(CAST(support AS DOUBLE) * total / CAST(ia.s * ib.s AS DOUBLE), 6)
         AS lift
FROM sup JOIN item ia ON ia.p = sup.p1 JOIN item ib ON ib.p = sup.p2 CROSS JOIN n
ORDER BY lift DESC, p1, p2
"""


# --------------------------------------------------------------------------
# degree assortativity — Pearson correlation of endpoint degrees over
# the co-supply graph's directed edge pairs (both orientations, the
# standard Newman r): degrees broadcast once (O(nodes), the documented
# small-graph-state assumption — _attach_deg is the reduce-side
# fallback), per-batch integer moment partials (Σx, Σxy, Σx², n),
# driver closed form with Python ints so no product ever overflows.
# --------------------------------------------------------------------------


def q_degree_assortativity(sf_dir: str):
    edges = _cosupply_edges(sf_dir).materialize()
    out_empty = pa.table(
        {
            "n_edges": pa.array([0], pa.int64()),
            "assortativity": pa.array([None], pa.float64()),
        }
    )
    if edges.count() == 0:
        return out_empty
    degs = _to_table_s(
        _node_degrees(edges), pa.schema([("node", pa.int64()), ("deg", pa.int64())])
    )
    nodes = degs.column("node").to_numpy(zero_copy_only=False)
    dd_ = degs.column("deg").to_numpy(zero_copy_only=False)
    order = np.argsort(nodes)
    dref = ray.put((nodes[order], dd_[order]))

    def moments(b: pa.Table) -> pa.Table:
        nd, dg = ray.get(dref)
        du = dg[np.searchsorted(nd, b.column("u").to_numpy(zero_copy_only=False))]
        dv = dg[np.searchsorted(nd, b.column("v").to_numpy(zero_copy_only=False))]
        return pa.table(
            {
                "n": pa.array([2 * len(du)], pa.int64()),
                "sx": pa.array([int(du.sum() + dv.sum())], pa.int64()),
                "sxy": pa.array([2 * int((du * dv).sum())], pa.int64()),
                "sxx": pa.array([int((du * du).sum() + (dv * dv).sum())], pa.int64()),
            }
        )

    t = _to_table(edges.map_batches(moments, batch_format="pyarrow")).to_pandas()
    n = int(t["n"].sum())
    sx = int(t["sx"].sum())
    sxy = int(t["sxy"].sum())
    sxx = int(t["sxx"].sum())
    var = n * sxx - sx * sx  # symmetric: Σy ≡ Σx, Σy² ≡ Σx²
    if n == 0 or var == 0:
        # regular graph: defined n_edges, undefined correlation (the
        # oracle's CASE emits NULL with the real edge count)
        return pa.table(
            {
                "n_edges": pa.array([n // 2], pa.int64()),
                "assortativity": pa.array([None], pa.float64()),
            }
        )
    num = n * sxy - sx * sx
    r = round(float(num) / (math.sqrt(float(var)) * math.sqrt(float(var))), 6)
    return pa.table(
        {
            "n_edges": pa.array([n // 2], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH {_COSUPPLY_SQL_E},
d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node),
p AS (SELECT du.deg AS x, dv.deg AS y
      FROM e JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v
      UNION ALL
      SELECT dv.deg, du.deg
      FROM e JOIN d du ON du.node = e.u JOIN d dv ON dv.node = e.v),
s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
      FROM p)
SELECT CAST(n // 2 AS BIGINT) AS n_edges,
       CASE WHEN n = 0 OR n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
            ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
                       / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                          * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
       END AS assortativity
FROM s
"""


# --------------------------------------------------------------------------
# peak concurrency — the interval sweep-line: each event holds a
# 1-hour lease, peak = max over time of the running Σ(+1 at start,
# −1 at end).  The prefix machinery of running_total/record_highs on
# the DELTA stream: per-1h-range delta-sum partials → driver
# exclusive prefix over O(ranges) → range-bucketed in-range cumsum;
# each bucket emits (its max load, first time achieving it) and the
# driver folds O(buckets).  Boundary ties process starts before ends
# (ORDER BY t, d DESC — overlap-inclusive), identically in both
# engines.
# --------------------------------------------------------------------------

_CONC_LEASE_US = 3_600_000_000


def q_peak_concurrency(sf_dir: str):
    import zlib

    ds = _read_pq(_t(sf_dir, "events"), columns=["ts"])

    def deltas(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "t": pa.array(np.concatenate([t, t + _CONC_LEASE_US]), pa.int64()),
                "d": pa.array(
                    np.concatenate(
                        [np.ones(len(t), np.int64), -np.ones(len(t), np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    pts = ds.map_batches(deltas, batch_format="pyarrow").materialize()

    def range_partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "range": b.column("t").to_numpy(zero_copy_only=False)
                    // _CONC_LEASE_US,
                    "d": b.column("d").to_numpy(zero_copy_only=False),
                }
            )
            .groupby("range", sort=False)["d"]
            .sum()
            .reset_index(name="sd")
        )
        return pa.table(
            {
                "range": pa.array(g["range"].to_numpy(), pa.int64()),
                "sd": pa.array(g["sd"].to_numpy(), pa.int64()),
            }
        )

    sums = (
        _sum_partials(
            pts.map_batches(range_partial, batch_format="pyarrow"),
            keys=["range"],
            sum_cols=["sd"],
            schema=pa.schema([("range", pa.int64()), ("sd", pa.int64())]),
        )
        .to_pandas()
        .sort_values("range")
    )
    if sums.empty:
        return pa.table(
            {
                "peak": pa.array([None], pa.int64()),
                "first_peak_t": pa.array([None], pa.int64()),
            }
        )
    offsets = dict(
        zip(
            sums["range"].to_numpy(),
            np.concatenate([[0], np.cumsum(sums["sd"].to_numpy())[:-1]]),
        )
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        rng = pc.divide(b.column("t"), _CONC_LEASE_US)
        bucket = pa.array(
            [zlib.crc32(str(v).encode()) % _STAT_BUCKETS for v in rng.to_pylist()],
            pa.int32(),
        )
        return b.append_column("_range", rng).append_column("_bucket", bucket)

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        b = b.sort_values(["_range", "t", "d"], ascending=[True, True, False],
                          kind="mergesort")
        cum = b.groupby("_range", sort=False)["d"].cumsum()
        load = cum.to_numpy() + b["_range"].map(offsets).to_numpy()
        mx = int(load.max())
        at = int(b["t"].to_numpy()[load == mx].min())
        return pa.table(
            {
                "mx": pa.array([mx], pa.int64()),
                "at": pa.array([at], pa.int64()),
            }
        )

    folded = _to_table_s(
        pts.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=_STAT_BUCKETS)
        .map_groups(per_bucket, batch_format="pandas"),
        pa.schema([("mx", pa.int64()), ("at", pa.int64())]),
    ).to_pandas()
    peak = int(folded["mx"].max())
    first_t = int(folded[folded["mx"] == peak]["at"].min())
    return pa.table(
        {
            "peak": pa.array([peak], pa.int64()),
            "first_peak_t": pa.array([first_t], pa.int64()),
        }
    )


SQL_PEAK_CONCURRENCY = f"""
WITH pts AS (SELECT epoch_us(ts) AS t, 1 AS d FROM events
             UNION ALL SELECT epoch_us(ts) + {_CONC_LEASE_US}, -1 FROM events),
r AS (SELECT t, d, sum(d) OVER (ORDER BY t, d DESC ROWS UNBOUNDED PRECEDING)
             AS load
      FROM pts)
SELECT CAST(max(load) AS BIGINT) AS peak,
       CAST(min(t) FILTER (load = (SELECT max(load) FROM r)) AS BIGINT)
         AS first_peak_t
FROM r
"""


# --------------------------------------------------------------------------
# spell suggestion — top-3 nearest corpus-vocabulary words by edit
# distance for a fixed query list (the fuzzy-search primitive):
# vocabulary from ONE distinct-word combiner exchange (bounded — the
# unigram assumption), then a VECTORIZED Wagner–Fischer DP that runs
# all vocab words simultaneously as numpy columns — O(|q|·maxlen)
# array ops total, no per-word Python loop.
# --------------------------------------------------------------------------

_SPELL_QUERIES = ("transfomer", "gradint", "atention")
_SPELL_TOP = 3


def _lev_to_vocab(q: str, mat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Edit distances q ↔ every padded word row of ``mat`` at once."""
    n, L = mat.shape
    m = len(q)
    prev = np.tile(np.arange(L + 1, dtype=np.int32)[:, None], (1, n))
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        qc = ord(q[i - 1])
        for j in range(1, L + 1):
            sub = prev[j - 1] + (mat[:, j - 1] != qc)
            cur[j] = np.minimum(np.minimum(prev[j] + 1, cur[j - 1] + 1), sub)
        prev = cur
    return prev[lens, np.arange(n)]


def q_spell_suggest(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def vocab_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"word": flat.unique()})

    def merge_words(b: pd.DataFrame) -> pa.Table:
        return pa.table({"word": pa.array(b["word"].unique(), pa.string())})

    vocab = _merge_partials(
        ds.map_batches(vocab_partial, batch_format="pyarrow"),
        "word",
        merge_words,
        input_schema=pa.schema([("word", pa.string())]),
    )
    out_schema = pa.schema(
        [("qw", pa.string()), ("word", pa.string()), ("dist", pa.int64())]
    )
    words = np.sort(vocab.column("word").to_numpy(zero_copy_only=False).astype(str))
    if len(words) == 0:
        return out_schema.empty_table()
    L = max(len(w) for w in words)
    mat = np.zeros((len(words), L), dtype=np.int32)
    lens = np.empty(len(words), dtype=np.int64)
    for i, w in enumerate(words):  # vocab-bounded setup, not per-token
        mat[i, : len(w)] = [ord(ch) for ch in w]
        lens[i] = len(w)
    rows_q, rows_w, rows_d = [], [], []
    for q in _SPELL_QUERIES:
        d = _lev_to_vocab(q, mat, lens)
        top = np.lexsort((words, d))[:_SPELL_TOP]
        rows_q += [q] * len(top)
        rows_w += list(words[top])
        rows_d += [int(x) for x in d[top]]
    return pa.table(
        {
            "qw": pa.array(rows_q, pa.string()),
            "word": pa.array(rows_w, pa.string()),
            "dist": pa.array(rows_d, pa.int64()),
        }
    )


SQL_SPELL_SUGGEST = f"""
WITH w AS (SELECT DISTINCT unnest(string_split_regex(lower(text), '[^a-z]+'))
             AS word FROM documents),
w2 AS (SELECT word FROM w WHERE word <> ''),
q AS (SELECT unnest({list(_SPELL_QUERIES)!r}) AS qw),
d AS (SELECT q.qw, w2.word, CAST(levenshtein(q.qw, w2.word) AS BIGINT) AS dist
      FROM q CROSS JOIN w2),
r AS (SELECT *, row_number() OVER (PARTITION BY qw ORDER BY dist, word) AS rk
      FROM d)
SELECT qw, word, dist FROM r WHERE rk <= {_SPELL_TOP}
"""


# --------------------------------------------------------------------------
# time-decay engagement — exponential half-life recency weighting
# (1-day half-life) in PURE INTEGER arithmetic: weight = 2²⁰ >> Δdays
# (0 beyond 20 days — the fixed-point floor), so the decayed sum is
# summation-order-proof and bit-identical across engines — the
# float-exp formulation differs in the last ulp between libm builds,
# which a ×1e12 round can flip (why this op avoids exp entirely).
# Two passes: global max-ts scalar, then per-(type) integer partials.
# --------------------------------------------------------------------------

_DECAY_ONE = 1 << 20
_DECAY_MAX_D = 20


def q_decay_engagement(sf_dir: str):
    ds0 = _read_pq(_t(sf_dir, "events"), columns=["ts"])

    def tmax_part(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"m": pa.array([pc.max(t).as_py()], pa.int64())})

    mt = _to_table(ds0.map_batches(tmax_part, batch_format="pyarrow")).to_pandas()
    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n", pa.int64()),
            ("decayed_x2_20", pa.int64()),
        ]
    )
    if mt.empty or mt["m"].isna().all():
        return out_schema.empty_table()
    tmax = int(mt["m"].max())

    ds = _read_pq(_t(sf_dir, "events"), columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        d = (tmax - t) // 86_400_000_000
        w = np.where(d <= _DECAY_MAX_D, _DECAY_ONE >> np.minimum(d, _DECAY_MAX_D), 0)
        g = (
            pd.DataFrame(
                {
                    "event_type": b.column("event_type").to_numpy(
                        zero_copy_only=False
                    ),
                    "dec": cents * w,
                }
            )
            .groupby("event_type", sort=False)
            .agg(n=("dec", "size"), dec=("dec", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
                "dec": pa.array(g["dec"].to_numpy(), pa.int64()),
            }
        )

    out = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["event_type"],
        sum_cols=["n", "dec"],
        schema=pa.schema(
            [("event_type", pa.string()), ("n", pa.int64()), ("dec", pa.int64())]
        ),
    )
    return pa.table(
        {
            "event_type": out.column("event_type"),
            "n": out.column("n"),
            "decayed_x2_20": out.column("dec"),
        }
    )


SQL_DECAY_ENGAGEMENT = f"""
WITH T AS (SELECT max(epoch_us(ts)) AS tmax FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN (tmax - epoch_us(ts)) // 86400000000 <= {_DECAY_MAX_D}
                     THEN CAST(round(value * 100) AS BIGINT)
                          * ({_DECAY_ONE} >> CAST((tmax - epoch_us(ts))
                                                  // 86400000000 AS INT))
                     ELSE 0 END) AS BIGINT) AS decayed_x2_20
FROM events CROSS JOIN T GROUP BY event_type
"""


# --------------------------------------------------------------------------
# order-free table checksum — the cross-engine content-equality audit
# a migration runs after copying a table: per-doc Horner hash
# h = fold((acc·31 + codepoint) mod 2³¹) over the text, table
# checksum = Σh (order-free, so any partitioning/retry produces the
# same value).  The per-batch fold is vectorized POSITION-wise over
# UTF-32 codepoints (O(maxlen) array ops per batch, no per-doc
# Python); the oracle reproduces the identical fold with
# list_reduce over ord(chars).
# --------------------------------------------------------------------------

_CKSUM_MOD = 1 << 31


def q_table_checksum(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n = len(texts)
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        codes = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
        acc = np.zeros(n, dtype=np.int64)
        maxlen = int(lens.max()) if n else 0
        for j in range(maxlen):
            act = lens > j
            acc[act] = (acc[act] * 31 + codes[offs[act] + j]) % _CKSUM_MOD
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([int(acc.sum())], pa.int64()),
            }
        )

    t = _to_table(ds.map_batches(partial, batch_format="pyarrow")).to_pandas()
    if t.empty:
        return pa.table(
            {
                "n_docs": pa.array([0], pa.int64()),
                "checksum": pa.array([0], pa.int64()),
            }
        )
    return pa.table(
        {
            "n_docs": pa.array([int(t["n"].sum())], pa.int64()),
            "checksum": pa.array([int(t["s"].sum())], pa.int64()),
        }
    )


SQL_TABLE_CHECKSUM = f"""
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(text, ''),
                                       x -> CAST(ord(x) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % {_CKSUM_MOD})), 0) AS BIGINT) AS checksum
FROM documents
"""


# --------------------------------------------------------------------------
# weighted median — quantity-weighted median price per returnflag:
# the (flag, cents, Σqty) weighted value-count exchange (O(distinct
# prices), the percentile_rank/dup_count granularity — the binned
# two-pass refinement is the beyond-O(distinct) path), then an exact
# integer crossing scan: wmedian = min cents with 2·cum ≥ tot.
# --------------------------------------------------------------------------


def q_weighted_median(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "flag": b.column("l_returnflag").to_numpy(zero_copy_only=False),
                    "cents": np.rint(
                        b.column("l_extendedprice").to_numpy(zero_copy_only=False)
                        * 100
                    ).astype(np.int64),
                    "w": b.column("l_quantity")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby(["flag", "cents"], sort=False)["w"]
            .sum()
            .reset_index()
        )
        return pa.table(
            {
                "flag": pa.array(g["flag"], pa.string()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
                "w": pa.array(g["w"].to_numpy(), pa.int64()),
            }
        )

    vc = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["flag", "cents"],
            sum_cols=["w"],
            schema=pa.schema(
                [("flag", pa.string()), ("cents", pa.int64()), ("w", pa.int64())]
            ),
        )
        .to_pandas()
        .sort_values(["flag", "cents"])
    )
    out_schema = pa.schema([("flag", pa.string()), ("wmedian", pa.int64())])
    if vc.empty:
        return out_schema.empty_table()
    flags, meds = [], []
    for flag, g in vc.groupby("flag", sort=True):
        w = g["w"].to_numpy(dtype=np.int64)
        cum = np.cumsum(w)
        tot = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, tot, side="left"))
        flags.append(flag)
        meds.append(int(g["cents"].to_numpy()[idx]))
    return pa.table(
        {
            "flag": pa.array(flags, pa.string()),
            "wmedian": pa.array(meds, pa.int64()),
        }
    )


SQL_WEIGHTED_MEDIAN = """
WITH g AS (SELECT l_returnflag AS flag,
                  CAST(round(l_extendedprice*100) AS BIGINT) AS cents,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
c AS (SELECT *, sum(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             sum(w) OVER (PARTITION BY flag) AS tot FROM g)
SELECT flag, CAST(min(cents) FILTER (2*cum >= tot) AS BIGINT) AS wmedian
FROM c GROUP BY flag
"""


# --------------------------------------------------------------------------
# robust outlier counts — MAD fences (|x − median| > 5·MAD, all
# integer cents so the fence compare never touches a float): two
# composed passes of the exact bounded order-statistic machinery (the
# q_mad construction, on events), then one counting pass against the
# broadcast (median, MAD) table.
# --------------------------------------------------------------------------


def q_robust_outliers(sf_dir: str):
    def cents_of(b: pa.Table) -> np.ndarray:
        return np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)

    def ds_factory():
        return _read_pq(_t(sf_dir, "events"), columns=["event_type", "value"])

    med_stats = _grouped_order_stats(
        ds_factory,
        "event_type",
        cents_of,
        lambda n: {"m": int(np.ceil(0.5 * n))},
    )
    out_schema = pa.schema(
        [("event_type", pa.string()), ("n_outliers", pa.int64()), ("n", pa.int64())]
    )
    if not med_stats:
        return out_schema.empty_table()
    med = {k: info["stats"]["m"][0] for k, info in med_stats.items()}

    def dev_of(b: pa.Table) -> np.ndarray:
        et = pd.Series(b.column("event_type").to_numpy(zero_copy_only=False))
        return np.abs(cents_of(b) - et.map(med).to_numpy()).astype(np.int64)

    mad_stats = _grouped_order_stats(
        ds_factory,
        "event_type",
        dev_of,
        lambda n: {"m": int(np.ceil(0.5 * n))},
    )
    mad = {k: info["stats"]["m"][0] for k, info in mad_stats.items()}

    def count_part(b: pa.Table) -> pa.Table:
        et = pd.Series(b.column("event_type").to_numpy(zero_copy_only=False))
        dev = np.abs(cents_of(b) - et.map(med).to_numpy())
        fence = 5 * et.map(mad).to_numpy()
        g = (
            pd.DataFrame({"event_type": et.to_numpy(), "out": (dev > fence)})
            .groupby("event_type", sort=False)
            .agg(n_outliers=("out", "sum"), n=("out", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "n_outliers": pa.array(
                    g["n_outliers"].to_numpy().astype(np.int64), pa.int64()
                ),
                "n": pa.array(g["n"].to_numpy(), pa.int64()),
            }
        )

    return _sum_partials(
        ds_factory().map_batches(count_part, batch_format="pyarrow"),
        keys=["event_type"],
        sum_cols=["n_outliers", "n"],
        schema=out_schema,
    )


SQL_ROBUST_OUTLIERS = """
WITH m AS (SELECT event_type,
                  quantile_disc(CAST(round(value*100) AS BIGINT), 0.5) AS med
           FROM events GROUP BY 1),
d AS (SELECT e.event_type,
             abs(CAST(round(value*100) AS BIGINT) - m.med) AS dev
      FROM events e JOIN m USING (event_type)),
md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad FROM d GROUP BY 1)
SELECT e.event_type,
       CAST(count(*) FILTER (abs(CAST(round(value*100) AS BIGINT) - m.med)
                             > 5 * md.mad) AS BIGINT) AS n_outliers,
       CAST(count(*) AS BIGINT) AS n
FROM events e JOIN m USING (event_type) JOIN md USING (event_type)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# cross-table entity linkage — how many event users also appear as
# order customers (the reconciliation count a warehouse runs after
# joining fact tables from two systems): per-side distinct-key
# combiner exchanges (O(entities) each, the user-level result
# granularity of sessionize/rfm), intersection via one sorted-array
# pass driver-side.
# --------------------------------------------------------------------------


def _distinct_int_col(path: str, col: str) -> np.ndarray:
    ds = _read_pq(path, columns=[col])

    def part(b: pa.Table) -> pa.Table:
        return pa.table({"k": b.column(col).unique().cast(pa.int64())})

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        return pa.table({"k": pa.array(b["k"].unique(), pa.int64())})

    t = _merge_partials(
        ds.map_batches(part, batch_format="pyarrow"),
        "k",
        per_bucket,
        input_schema=pa.schema([("k", pa.int64())]),
    )
    return np.sort(t.column("k").to_numpy(zero_copy_only=False))


def q_entity_overlap(sf_dir: str):
    eu = _distinct_int_col(_t(sf_dir, "events"), "user_id")
    ck = _distinct_int_col(_t(sf_dir, "orders"), "o_custkey")
    both = np.intersect1d(eu, ck, assume_unique=True)
    return pa.table(
        {
            "n_event_users": pa.array([len(eu)], pa.int64()),
            "n_order_custs": pa.array([len(ck)], pa.int64()),
            "n_both": pa.array([len(both)], pa.int64()),
        }
    )


SQL_ENTITY_OVERLAP = """
WITH eu AS (SELECT DISTINCT user_id FROM events),
     ck AS (SELECT DISTINCT o_custkey AS user_id FROM orders)
SELECT CAST((SELECT count(*) FROM eu) AS BIGINT) AS n_event_users,
       CAST((SELECT count(*) FROM ck) AS BIGINT) AS n_order_custs,
       CAST((SELECT count(*) FROM eu JOIN ck USING (user_id)) AS BIGINT) AS n_both
"""


# --------------------------------------------------------------------------
# Simpson diversity — the ecology/corpus-mix concentration index per
# source, in its UNBIASED form D = 1 − Σc(c−1)/(n(n−1)) so the
# numerator is pure integer (one O(sources × langs) count exchange,
# one int÷int divide per source).
# --------------------------------------------------------------------------


def q_simpson_diversity(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "source": g.column("source"),
                "lang": g.column("lang"),
                "c": pc.cast(g.column("count_all"), pa.int64()),
            }
        )

    vc = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["source", "lang"],
        sum_cols=["c"],
        schema=pa.schema(
            [("source", pa.string()), ("lang", pa.string()), ("c", pa.int64())]
        ),
    ).to_pandas()
    out_schema = pa.schema(
        [("source", pa.string()), ("n", pa.int64()), ("simpson", pa.float64())]
    )
    if vc.empty:
        return out_schema.empty_table()
    rows = []
    for src, g in vc.groupby("source", sort=True):
        c = g["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        if n <= 1:
            continue
        ss = int((c * (c - 1)).sum())
        rows.append((src, n, round(1.0 - float(ss) / (n * (n - 1)), 6)))
    if not rows:
        return out_schema.empty_table()
    return pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "simpson": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


SQL_SIMPSON_DIVERSITY = """
WITH c AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
t AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(c*(c-1)) AS BIGINT) AS ss FROM c GROUP BY 1)
SELECT source, n, round(1.0 - CAST(ss AS DOUBLE)/(n*(n-1)), 6) AS simpson
FROM t WHERE n > 1
"""


# --------------------------------------------------------------------------
# median with order-statistic confidence band — the distribution-free
# binomial CI on the median (ranks (n+1)/2 ∓ 0.98√n, the 95% normal
# approximation): values at the three EXACT ranks come from one
# (value, count) exchange + a cumulative scan; the rank indices are
# derived from the same correctly-rounded sqrt on both engines, so
# they agree as integers.
# --------------------------------------------------------------------------


def q_median_ci(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        v, c = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "val": pa.array(v, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    vc = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["val"],
            sum_cols=["cnt"],
            schema=pa.schema([("val", pa.int64()), ("cnt", pa.int64())]),
        )
        .to_pandas()
        .sort_values("val")
    )
    if vc.empty:
        return pa.table(
            {
                "median": pa.array([None], pa.int64()),
                "ci_lo": pa.array([None], pa.int64()),
                "ci_hi": pa.array([None], pa.int64()),
            }
        )
    vals = vc["val"].to_numpy(dtype=np.int64)
    cum = np.cumsum(vc["cnt"].to_numpy(dtype=np.int64))
    n = int(cum[-1])

    def at_rank(r: int):
        if r < 1 or r > n:
            return None
        return int(vals[int(np.searchsorted(cum, r, side="left"))])

    med = at_rank((n + 1) // 2)
    lo = at_rank(int(math.floor((n + 1) / 2.0 - 0.98 * math.sqrt(float(n)))))
    hi = at_rank(int(math.ceil((n + 1) / 2.0 + 0.98 * math.sqrt(float(n)))))
    return pa.table(
        {
            "median": pa.array([med], pa.int64()),
            "ci_lo": pa.array([lo], pa.int64()),
            "ci_hi": pa.array([hi], pa.int64()),
        }
    )


SQL_MEDIAN_CI = """
WITH v AS (SELECT CAST(round(value*100) AS BIGINT) AS c FROM events),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn, count(*) OVER () AS n
      FROM v)
SELECT CAST(max(CASE WHEN rn = (n+1)//2 THEN c END) AS BIGINT) AS median,
       CAST(max(CASE WHEN rn = CAST(floor((n+1)/2.0
                     - 0.98*sqrt(CAST(n AS DOUBLE))) AS BIGINT) THEN c END)
            AS BIGINT) AS ci_lo,
       CAST(max(CASE WHEN rn = CAST(ceil((n+1)/2.0
                     + 0.98*sqrt(CAST(n AS DOUBLE))) AS BIGINT) THEN c END)
            AS BIGINT) AS ci_hi
FROM r
"""


# --------------------------------------------------------------------------
# data freshness — per-stream staleness vs the lake's watermark (the
# SLA monitor a warehouse runs per ingested source): per-type
# (max ts, count) combiner, global max from the same tiny table,
# staleness in exact µs.
# --------------------------------------------------------------------------


def q_data_freshness(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["event_type", "ts"])

    part_schema = pa.schema(
        [("event_type", pa.string()), ("mx", pa.int64()), ("n", pa.int64())]
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame(
                {
                    "event_type": b.column("event_type").to_numpy(
                        zero_copy_only=False
                    ),
                    "t": t,
                }
            )
            .groupby("event_type", sort=False)["t"]
            .agg(["max", "size"])
            .reset_index()
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "mx": pa.array(g["max"].to_numpy(), pa.int64()),
                "n": pa.array(g["size"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("event_type", as_index=False).agg(
            mx=("mx", "max"), n=("n", "sum")
        )
        return pa.table(
            {f.name: pa.array(g[f.name].to_numpy(), f.type) for f in part_schema}
        )

    folded = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        "event_type",
        per_bucket,
        input_schema=part_schema,
    ).to_pandas()
    out_schema = pa.schema(
        [("event_type", pa.string()), ("staleness_us", pa.int64()), ("n", pa.int64())]
    )
    if folded.empty:
        return out_schema.empty_table()
    g = folded.groupby("event_type", as_index=False).agg(
        mx=("mx", "max"), n=("n", "sum")
    )
    wm = int(g["mx"].max())
    return pa.table(
        {
            "event_type": pa.array(g["event_type"], pa.string()),
            "staleness_us": pa.array(wm - g["mx"].to_numpy(), pa.int64()),
            "n": pa.array(g["n"].to_numpy(), pa.int64()),
        }
    )


SQL_DATA_FRESHNESS = """
WITH g AS (SELECT max(epoch_us(ts)) AS m FROM events)
SELECT event_type,
       CAST((SELECT m FROM g) - max(epoch_us(ts)) AS BIGINT) AS staleness_us,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


# --------------------------------------------------------------------------
# new-vs-returning split — the daily acquisition/retention mix: ONE
# user-bucketed exchange over distinct (user, day) pairs resolves each
# user's first day in-bucket; per-(day, is_new) integer partials sum
# in a tiny second exchange.  O(users × active-days) crosses as
# distinct pairs, never raw events.
# --------------------------------------------------------------------------


def q_new_vs_returning(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        g = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "day": t // 86_400_000_000,
            }
        ).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        d = b.drop_duplicates(["user_id", "day"])
        d0 = d.groupby("user_id")["day"].transform("min")
        g = (
            pd.DataFrame({"day": d["day"].to_numpy(), "new": (d["day"] == d0)})
            .groupby("day", sort=False)
            .agg(new_users=("new", "sum"), total=("new", "size"))
            .reset_index()
        )
        return pa.table(
            {
                "day": pa.array(g["day"].to_numpy(), pa.int64()),
                "new_users": pa.array(
                    g["new_users"].to_numpy().astype(np.int64), pa.int64()
                ),
                "returning_users": pa.array(
                    (g["total"] - g["new_users"]).to_numpy().astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    folded = _bucketed(
        ds.map_batches(partial, batch_format="pyarrow"), "user_id", per_bucket
    )
    out_schema = pa.schema(
        [
            ("day", pa.int64()),
            ("new_users", pa.int64()),
            ("returning_users", pa.int64()),
        ]
    )
    return _sum_partials(
        folded,
        keys=["day"],
        sum_cols=["new_users", "returning_users"],
        schema=out_schema,
    )


SQL_NEW_VS_RETURNING = """
WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS d0
           FROM events GROUP BY 1),
d AS (SELECT epoch_us(ts) // 86400000000 AS day, e.user_id
      FROM events e GROUP BY 1, 2)
SELECT day, CAST(count(*) FILTER (day = f.d0) AS BIGINT) AS new_users,
       CAST(count(*) FILTER (day > f.d0) AS BIGINT) AS returning_users
FROM d JOIN f USING (user_id) GROUP BY day
"""


# --------------------------------------------------------------------------
# equi-depth decile boundaries — the histogram statistic an optimizer
# collects per column (values at ranks ⌈k·n/10⌉): one (value, count)
# exchange + a cumulative scan, exact at any scale.
# --------------------------------------------------------------------------


def q_value_deciles(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.rint(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        v, c = np.unique(cents, return_counts=True)
        return pa.table(
            {
                "val": pa.array(v, pa.int64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    vc = (
        _sum_partials(
            ds.map_batches(partial, batch_format="pyarrow"),
            keys=["val"],
            sum_cols=["cnt"],
            schema=pa.schema([("val", pa.int64()), ("cnt", pa.int64())]),
        )
        .to_pandas()
        .sort_values("val")
    )
    out_schema = pa.schema([("decile", pa.int64()), ("boundary", pa.int64())])
    if vc.empty:
        return out_schema.empty_table()
    vals = vc["val"].to_numpy(dtype=np.int64)
    cum = np.cumsum(vc["cnt"].to_numpy(dtype=np.int64))
    n = int(cum[-1])
    ks, bs = [], []
    for k in range(1, 10):
        r = -(-k * n // 10)  # ceil(k·n/10), pure ints
        ks.append(k)
        bs.append(int(vals[int(np.searchsorted(cum, r, side="left"))]))
    return pa.table(
        {
            "decile": pa.array(ks, pa.int64()),
            "boundary": pa.array(bs, pa.int64()),
        }
    )


SQL_VALUE_DECILES = """
WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS c FROM orders),
r AS (SELECT c, row_number() OVER (ORDER BY c) AS rn, count(*) OVER () AS n
      FROM v),
k AS (SELECT unnest(generate_series(1, 9)) AS decile)
SELECT decile, CAST(max(CASE WHEN rn = -((-decile * n) // 10) THEN c END)
                    AS BIGINT) AS boundary
FROM r CROSS JOIN k GROUP BY decile
HAVING max(CASE WHEN rn = -((-decile * n) // 10) THEN c END) IS NOT NULL
"""


# --------------------------------------------------------------------------
# compaction plan — first-fit-decreasing bin packing of the lake's
# part files into ≤64 MB merge groups (what OPTIMIZE does before
# rewriting): runs on storage_stats' distributed footer scan, the
# planner itself is a deterministic driver fold over O(files)
# metadata rows.  Rows-only (file layout is not a SQL view);
# cap/coverage invariants pinned in tests/test_round10_ops.py.
# --------------------------------------------------------------------------

_COMPACT_CAP = 64 << 20


def q_compaction_plan(sf_dir: str):
    stats = q_storage_stats(sf_dir).to_pandas()
    out_schema = pa.schema(
        [
            ("group_id", pa.int64()),
            ("n_files", pa.int64()),
            ("group_bytes", pa.int64()),
        ]
    )
    if stats.empty:
        return out_schema.empty_table()
    # first-fit-decreasing, deterministic: size desc then (tbl, file)
    stats = stats.sort_values(
        ["compressed_bytes", "tbl", "file"], ascending=[False, True, True]
    )
    groups: list[tuple[int, int]] = []  # (n_files, bytes)
    for sz in stats["compressed_bytes"].to_numpy(dtype=np.int64):
        placed = False
        for i, (nf, gb) in enumerate(groups):
            if gb + int(sz) <= _COMPACT_CAP:
                groups[i] = (nf + 1, gb + int(sz))
                placed = True
                break
        if not placed:
            groups.append((1, int(sz)))
    return pa.table(
        {
            "group_id": pa.array(np.arange(len(groups)), pa.int64()),
            "n_files": pa.array([g[0] for g in groups], pa.int64()),
            "group_bytes": pa.array([g[1] for g in groups], pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# Weighted single-source shortest path — bounded Bellman-Ford over the
# co-supply graph; complements q_bfs_hops (hop metric) with an integer
# edge-weight metric.  Semantics on BOTH engines: min total weight
# over walks of ≤ _SSSP_ROUNDS edges from the min node id (bounded
# rounds make the result exact and partitioning-independent).  Rounds
# are frontier relaxations (semi-naive: a node whose best dist did not
# improve cannot improve a neighbor — same result, O(frontier)
# messages); below _SSSP_LOCAL_MAX_BYTES the materialized edge list is
# solved with a vectorized np.minimum.at relaxation loop instead of
# paying per-round executor overhead.
# --------------------------------------------------------------------------

_SSSP_ROUNDS = 5
_SSSP_LOCAL_MAX_BYTES = 64 << 20
_SSSP_SENT = np.int64(1) << 62


def _sssp_local(edge_tbl: pa.Table, rounds: int) -> pa.Table:
    a = edge_tbl.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
    b = edge_tbl.column("nbr").to_numpy(zero_copy_only=False).astype(np.int64)
    w = edge_tbl.column("wt").to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    ia, ib = np.searchsorted(nodes, a), np.searchsorted(nodes, b)
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    wt = np.concatenate([w, w])
    dist = np.full(len(nodes), _SSSP_SENT, dtype=np.int64)
    dist[0] = 0  # nodes sorted → index 0 is the min node id
    for _ in range(rounds):
        nd = dist.copy()
        np.minimum.at(nd, dst, dist[src] + wt)
        if np.array_equal(nd, dist):
            break
        dist = nd
    reached = dist < _SSSP_SENT
    return pa.table(
        {
            "node": pa.array(nodes[reached], pa.int64()),
            "dist": pa.array(dist[reached], pa.int64()),
        }
    )


def q_sssp_weighted(
    sf_dir: str,
    local_max_bytes: int = _SSSP_LOCAL_MAX_BYTES,
    rounds: int = _SSSP_ROUNDS,
):
    import pyarrow.dataset as pads

    li = _read_pq(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_partkey", "l_quantity"],
        filter=pads.field("l_quantity") <= 2.0,
    )

    def edges(b: pa.Table) -> pa.Table:
        f = (
            pd.DataFrame(
                {
                    "node": b.column("l_suppkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "nbr": b.column("l_partkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    + _GRAPH_PART_OFFSET,
                    "wt": b.column("l_quantity")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                }
            )
            .groupby(["node", "nbr"], sort=False, as_index=False)["wt"]
            .min()  # per-batch combiner: multi-edges collapse to min weight
        )
        return pa.table(
            {
                "node": pa.array(f["node"].to_numpy(), pa.int64()),
                "nbr": pa.array(f["nbr"].to_numpy(), pa.int64()),
                "wt": pa.array(f["wt"].to_numpy(), pa.int64()),
            }
        )

    sssp_schema = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
    edge_ds = li.map_batches(edges, batch_format="pyarrow").materialize()
    if edge_ds.count() == 0:
        return sssp_schema.empty_table()
    if (edge_ds.size_bytes() or 0) <= local_max_bytes:
        # duplicate (node,nbr) across batches is fine: min relaxation
        # is idempotent over multi-edges
        return _sssp_local(_to_table(edge_ds), rounds)

    # distributed regime: per-round reduce-side exchanges (BFS pattern,
    # messages carry dist+wt); edges re-shipped per round is the
    # documented big-graph cost — the local path absorbs everything
    # under local_max_bytes.
    both = edge_ds.map_batches(
        lambda t: pa.table(
            {
                "node": pa.concat_arrays(
                    [t.column("node").combine_chunks(), t.column("nbr").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t.column("nbr").combine_chunks(), t.column("node").combine_chunks()]
                ),
                "wt": pa.concat_arrays(
                    [t.column("wt").combine_chunks(), t.column("wt").combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    mins = both.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.min(t.column("node")).as_py()], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    src_id = int(pc.min(_to_table(mins).column("m")).as_py())
    dist = ray.data.from_arrow(
        pa.table({"node": pa.array([src_id], pa.int64()), "dist": pa.array([0], pa.int64())})
    ).materialize()
    frontier = dist

    def front_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": t.column("node"),
                "nbr": pa.nulls(t.num_rows, pa.int64()),
                "wt": pa.nulls(t.num_rows, pa.int64()),
                "d": t.column("dist"),
                "_src": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def edge_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": t.column("node"),
                "nbr": t.column("nbr"),
                "wt": t.column("wt"),
                "d": pa.nulls(t.num_rows, pa.int64()),
                "_src": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def relax(df: pd.DataFrame) -> pa.Table:
        f = df[df["_src"] == 0][["_k", "d"]]
        e = df[df["_src"] == 1][["_k", "nbr", "wt"]]
        if f.empty or e.empty:
            return pa.table(
                {"node": pa.array([], pa.int64()), "dist": pa.array([], pa.int64())}
            )
        m = e.merge(f, on="_k")
        out = (
            m.assign(nd=m["d"].astype(np.int64) + m["wt"].astype(np.int64))
            .groupby("nbr", sort=False, as_index=False)["nd"]
            .min()
        )
        return pa.table(
            {
                "node": pa.array(out["nbr"].to_numpy().astype(np.int64), pa.int64()),
                "dist": pa.array(out["nd"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    # Per round: exchange 1 builds frontier messages (frontier ∪ edges
    # keyed on source node); exchange 2 FUSES the min-merge with the
    # improved flag (prev dist tagged vs messages) so the frontier
    # costs no third exchange — 2 exchanges/round, the BFS shape.
    def prev_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": t.column("node"),
                "d": t.column("dist"),
                "_src": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def msg_keyed(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "_k": t.column("node"),
                "d": t.column("dist"),
                "_src": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def min_merge(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("_k", sort=False)
        best = g["d"].min()
        old = df[df["_src"] == 0].groupby("_k", sort=False)["d"].min()
        out = best.reset_index().rename(columns={"_k": "node", "d": "dist"})
        old_al = old.reindex(out["node"])
        improved = (
            old_al.isna().to_numpy() | (out["dist"].to_numpy() < old_al.to_numpy())
        )
        return pa.table(
            {
                "node": pa.array(out["node"].to_numpy().astype(np.int64), pa.int64()),
                "dist": pa.array(out["dist"].to_numpy().astype(np.int64), pa.int64()),
                "improved": pa.array(improved, pa.bool_()),
            }
        )

    for _ in range(rounds):
        msgs = _bucketed(
            frontier.map_batches(front_keyed, batch_format="pyarrow").union(
                both.map_batches(edge_keyed, batch_format="pyarrow")
            ),
            "_k",
            relax,
        )
        merged = _bucketed(
            dist.map_batches(prev_keyed, batch_format="pyarrow").union(
                msgs.map_batches(msg_keyed, batch_format="pyarrow")
            ),
            "_k",
            min_merge,
        ).materialize()
        dist = merged.select_columns(["node", "dist"]).materialize()
        frontier = merged.map_batches(
            lambda t: t.filter(t.column("improved")).select(["node", "dist"]),
            batch_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:
            break
    return _to_table(dist)


SQL_SSSP_WEIGHTED = f"""
WITH RECURSIVE
e AS (SELECT CAST(l_suppkey AS BIGINT) AS a,
             CAST(l_partkey + {_GRAPH_PART_OFFSET} AS BIGINT) AS b,
             CAST(min(l_quantity) AS BIGINT) AS w
      FROM lineitem WHERE l_quantity <= 2
      GROUP BY 1, 2),
u AS (SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e),
src AS (SELECT min(a) AS s FROM u),
walk(node, dist, d) AS (
  SELECT s, CAST(0 AS BIGINT), 0 FROM src WHERE s IS NOT NULL
  UNION
  SELECT u.b, walk.dist + u.w, walk.d + 1 FROM walk JOIN u ON u.a = walk.node
  WHERE walk.d < {_SSSP_ROUNDS})
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node
"""


# --------------------------------------------------------------------------
# Holt linear-trend smoothing (double exponential) per user over the
# ordered event stream — an order-sensitive recurrence SQL windows
# cannot express (oracle: recursive CTE).  Engine shape: user-bucketed
# exchange, then the fold runs vectorized ACROSS users round-by-round
# (loop length = max events per user, each step one numpy op over all
# users in the bucket) — never a Python loop over rows.  Expression
# order matches the SQL exactly so float64 results are bit-identical
# before the final round().
# --------------------------------------------------------------------------

def _round6_away(v: np.ndarray) -> np.ndarray:
    """round(x, 6) with SQL semantics — half AWAY from zero (np.round
    is half-to-even; the 1-in-~2M boundary split is the documented
    `interp_fill` big-lake lesson)."""
    v = np.asarray(v, dtype=np.float64)
    return np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6


_HOLT_ALPHA, _HOLT_BETA = 0.5, 0.3


def _rank_flat(df: pd.DataFrame, col: str):
    """Flat per-user-rank layout for vectorized-across-users folds:
    values sorted by (count-DESC user, event rank), so at round r the
    live users are the prefix ``n_active[r]`` and their r-th values
    are the gather ``flat[starts[:n_active[r]] + r]``.  O(total
    events) memory — no (users × max_rank) matrix, so a single
    mega-user (skew) costs its own rows, not a dense row for every
    other user in the bucket.  Returns (user_ids, flat, starts,
    n_active)."""
    uid, uidx = np.unique(df["user_id"].to_numpy(), return_inverse=True)
    rn = df.groupby("user_id", sort=False).cumcount().to_numpy()
    counts = np.bincount(uidx, minlength=len(uid))
    order = np.argsort(-counts, kind="stable")  # most events first
    rank_of = np.empty(len(uid), dtype=np.int64)
    rank_of[order] = np.arange(len(uid))
    sorted_counts = counts[order]
    starts = np.concatenate([[0], np.cumsum(sorted_counts[:-1])])
    flat = np.empty(len(df))
    flat[starts[rank_of[uidx]] + rn] = df[col].to_numpy()
    max_rn = int(sorted_counts[0]) if len(sorted_counts) else 1
    # n_active[r] = how many users have ≥ r+1 events (prefix length)
    n_active = np.searchsorted(-sorted_counts, -(np.arange(max_rn) + 1), "right")
    return uid[order], flat, starts, n_active


_HOLT_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("level", pa.float64()), ("trend", pa.float64())]
)


def q_holt_linear(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _HOLT_SCHEMA.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"])
        uid, flat, starts, n_active = _rank_flat(df, "value")
        lvl = flat[starts].copy()  # rank 0 always exists for present users
        trd = np.zeros(len(uid))
        a, b2 = _HOLT_ALPHA, _HOLT_BETA
        for r in range(1, len(n_active)):
            m = n_active[r]  # users with ≥ r+1 events are the prefix
            v = flat[starts[:m] + r]
            ln = a * v + (1.0 - a) * (lvl[:m] + trd[:m])
            trd[:m] = b2 * (ln - lvl[:m]) + (1.0 - b2) * trd[:m]
            lvl[:m] = ln
        return pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64), pa.int64()),
                "level": pa.array(_round6_away(lvl), pa.float64()),
                "trend": pa.array(_round6_away(trd), pa.float64()),
            }
        )

    return _merge_partials(
        ds,
        key="user_id",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
    )


SQL_HOLT_LINEAR = f"""
WITH RECURSIVE
x AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
n AS (SELECT user_id, max(rn) AS mx FROM x GROUP BY user_id),
rec(user_id, rn, l, t) AS (
  SELECT user_id, 1, value, CAST(0.0 AS DOUBLE) FROM x WHERE rn = 1
  UNION ALL
  SELECT x.user_id, x.rn,
         {_HOLT_ALPHA} * x.value + {1.0 - _HOLT_ALPHA} * (r.l + r.t),
         {_HOLT_BETA} * (({_HOLT_ALPHA} * x.value
                          + {1.0 - _HOLT_ALPHA} * (r.l + r.t)) - r.l)
           + {1.0 - _HOLT_BETA} * r.t
  FROM rec r JOIN x ON x.user_id = r.user_id AND x.rn = r.rn + 1)
SELECT r.user_id AS user_id, round(r.l, 6) AS level, round(r.t, 6) AS trend
FROM rec r JOIN n ON n.user_id = r.user_id AND r.rn = n.mx
"""


# --------------------------------------------------------------------------
# Capped running balance — the canonical order-sensitive stateful fold
# plain SQL windows cannot express (clamping makes each step depend on
# the clamped previous state): per user, balance starts at 0, each
# event adds (value − 50) and the result is clamped into [0, 500];
# outputs the final balance and how many events hit a clamp.  Oracle:
# recursive CTE.  Same vectorized-across-users round loop as Holt.
# --------------------------------------------------------------------------

_CAP_DRAIN, _CAP_MAX = 50.0, 500.0

_CAPSUM_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("balance", pa.float64()), ("n_clamped", pa.int64())]
)


def q_capped_running_sum(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "value"])

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _CAPSUM_SCHEMA.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"])
        uid, flat, starts, n_active = _rank_flat(df, "value")
        bal = np.zeros(len(uid))
        clamps = np.zeros(len(uid), dtype=np.int64)
        for r in range(len(n_active)):
            m = n_active[r]
            raw = bal[:m] + (flat[starts[:m] + r] - _CAP_DRAIN)
            clamps[:m] += (raw < 0.0) | (raw > _CAP_MAX)
            bal[:m] = np.minimum(np.maximum(raw, 0.0), _CAP_MAX)
        return pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64), pa.int64()),
                "balance": pa.array(_round6_away(bal), pa.float64()),
                "n_clamped": pa.array(clamps, pa.int64()),
            }
        )

    return _merge_partials(
        ds,
        key="user_id",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
    )


SQL_CAPPED_RUNNING_SUM = f"""
WITH RECURSIVE
x AS (SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events),
n AS (SELECT user_id, max(rn) AS mx FROM x GROUP BY user_id),
rec(user_id, rn, bal, clamps) AS (
  SELECT user_id, 1,
         least(greatest(CAST(0.0 AS DOUBLE) + (value - {_CAP_DRAIN}),
                        CAST(0.0 AS DOUBLE)), CAST({_CAP_MAX} AS DOUBLE)),
         CASE WHEN CAST(0.0 AS DOUBLE) + (value - {_CAP_DRAIN}) < 0.0
                OR CAST(0.0 AS DOUBLE) + (value - {_CAP_DRAIN}) > {_CAP_MAX}
              THEN 1 ELSE 0 END
  FROM x WHERE rn = 1
  UNION ALL
  SELECT x.user_id, x.rn,
         least(greatest(r.bal + (x.value - {_CAP_DRAIN}),
                        CAST(0.0 AS DOUBLE)), CAST({_CAP_MAX} AS DOUBLE)),
         r.clamps + CASE WHEN r.bal + (x.value - {_CAP_DRAIN}) < 0.0
                           OR r.bal + (x.value - {_CAP_DRAIN}) > {_CAP_MAX}
                         THEN 1 ELSE 0 END
  FROM rec r JOIN x ON x.user_id = r.user_id AND x.rn = r.rn + 1)
SELECT r.user_id AS user_id, round(r.bal, 6) AS balance,
       CAST(r.clamps AS BIGINT) AS n_clamped
FROM rec r JOIN n ON n.user_id = r.user_id AND r.rn = n.mx
"""


# --------------------------------------------------------------------------
# Anagram classes per language — groups the (bounded) vocabulary by
# sorted-letter signature and reports, per language, how many classes
# hold ≥2 distinct words and the largest class.  Scale shape: the
# per-batch combiner dedups (sig, lang, word) so the sig-bucketed
# exchange moves O(distinct vocabulary), never O(corpus); the final
# class→language rollup is over O(classes) rows.
# --------------------------------------------------------------------------

_ANAGRAM_MIN_LEN = 4

_ANAGRAM_SCHEMA = pa.schema(
    [("sig", pa.string()), ("lang", pa.string()), ("word", pa.string())]
)

# worker-persistent signature cache (ST1-style module state): the
# vocabulary is bounded, so after the first few batches every word is
# a dict hit and no sorting happens at all
_ANAGRAM_SIG_CACHE: dict[str, str] = {}
_ANAGRAM_CACHE_MAX = 4_000_000


def _anagram_sigs(words: np.ndarray) -> list[str]:
    """Sorted-letter signature per word — vectorized byte-matrix sort
    for the cache misses (ascii lowercase input; NUL padding sorts
    first and is stripped, so the result equals ''.join(sorted(w)))."""
    cache = _ANAGRAM_SIG_CACHE
    miss = [w for w in words if w not in cache]
    if miss:
        arr = np.array(miss, dtype="S")  # fixed-width, NUL-padded
        mat = np.sort(arr.view(np.uint8).reshape(len(miss), -1), axis=1)
        for w, row in zip(miss, mat.view(f"S{mat.shape[1]}").ravel()):
            cache[w] = row.lstrip(b"\0").decode()
    out = [cache[w] for w in words]
    if len(cache) > _ANAGRAM_CACHE_MAX:  # bound worker memory on hostile vocab
        cache.clear()
    return out


def q_anagram_groups(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native tokenize → explode → distinct (C++ hash agg);
        # Python touches only the UNIQUE words (vocabulary-bounded),
        # with signatures cached across batches in worker state
        toks = pc.split_pattern_regex(pc.utf8_lower(b.column("text")), "[^a-z]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        t = pa.table(
            {"lang": pc.take(b.column("lang"), parent).combine_chunks(), "word": flat}
        )
        t = t.filter(
            pc.greater_equal(pc.utf8_length(t.column("word")), _ANAGRAM_MIN_LEN)
        )
        t = t.group_by(["lang", "word"]).aggregate([])
        words = t.column("word").to_pylist()
        uw = list(dict.fromkeys(words))
        sigs = dict(zip(uw, _anagram_sigs(uw)))
        return pa.table(
            {
                "sig": pa.array([sigs[w] for w in words], pa.string()),
                "lang": t.column("lang"),
                "word": t.column("word"),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.schema(
                [("lang", pa.string()), ("sig", pa.string()), ("nw", pa.int64())]
            ).empty_table()
        g = (
            df.drop_duplicates(["sig", "lang", "word"])
            .groupby(["lang", "sig"], sort=False)["word"]
            .nunique()
            .reset_index(name="nw")
        )
        g = g[g["nw"] >= 2]
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "sig": pa.array(g["sig"], pa.string()),
                "nw": pa.array(g["nw"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    classes = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="sig",
        per_bucket=per_bucket,
        input_schema=_ANAGRAM_SCHEMA,
    )
    out_schema = pa.schema(
        [("lang", pa.string()), ("n_classes", pa.int64()), ("max_class", pa.int64())]
    )
    cdf = (classes if isinstance(classes, pa.Table) else classes).to_pandas()
    if cdf.empty:
        return out_schema.empty_table()
    fin = cdf.groupby("lang", sort=False).agg(
        n_classes=("sig", "size"), max_class=("nw", "max")
    )
    fin = fin.reset_index()
    return pa.table(
        {
            "lang": pa.array(fin["lang"], pa.string()),
            "n_classes": pa.array(fin["n_classes"].to_numpy().astype(np.int64), pa.int64()),
            "max_class": pa.array(fin["max_class"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


SQL_ANAGRAM_GROUPS = f"""
WITH w AS (
  SELECT DISTINCT lang, word FROM (
    SELECT lang, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents)
  WHERE length(word) >= {_ANAGRAM_MIN_LEN}),
s AS (SELECT lang, word,
             array_to_string(list_sort(regexp_extract_all(word, '[a-z]')), '') AS sig
      FROM w),
c AS (SELECT lang, sig, count(DISTINCT word) AS nw FROM s
      GROUP BY lang, sig HAVING count(DISTINCT word) >= 2)
SELECT lang, CAST(count(*) AS BIGINT) AS n_classes, CAST(max(nw) AS BIGINT) AS max_class
FROM c GROUP BY lang
"""


# --------------------------------------------------------------------------
# Multi-feature OLS via the normal equations — n_chars regressed on
# [1, word_count, vowel_count] over all documents.  Every cross moment
# is an EXACT int64 sum (the per-batch combiner emits one 10-moment
# row), so the single tiny exchange is summation-order-proof; both
# engines then solve the identical 3×3 Cramer expressions on exact
# int→double conversions (all moments ≪ 2^53 at test scales; the
# docstring bound at 100 TB is Σ n_chars² < 2^63).  Oracle: the same
# moments in SQL (HUGEINT-safe, cast at use) + the same Cramer text.
# --------------------------------------------------------------------------

_OLS_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("beta0", pa.float64()),
        ("beta1", pa.float64()),
        ("beta2", pa.float64()),
        ("r2", pa.float64()),
    ]
)


def _det3(a, b, c, d, e, f, g, h, i) -> float:
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def q_ols_multi(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["text", "n_chars"])

    _m_cols = ["n", "sx", "sz", "sxx", "szz", "sxz", "sy", "sxy", "szy", "syy"]

    def partial(b: pa.Table) -> pa.Table:
        x = (
            pc.list_value_length(pc.split_pattern(b.column("text"), " "))
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        z = (
            pc.utf8_length(
                pc.replace_substring_regex(
                    pc.utf8_lower(b.column("text")), "[^aeiou]", ""
                )
            )
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        y = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        vals = [
            len(y),
            int(x.sum()),
            int(z.sum()),
            int((x * x).sum()),
            int((z * z).sum()),
            int((x * z).sum()),
            int(y.sum()),
            int((x * y).sum()),
            int((z * y).sum()),
            int((y * y).sum()),
        ]
        t = {"_g": pa.array([0], pa.int64())}
        t.update({c: pa.array([v], pa.int64()) for c, v in zip(_m_cols, vals)})
        return pa.table(t)

    moment_schema = pa.schema(
        [("_g", pa.int64())] + [(c, pa.int64()) for c in _m_cols]
    )
    merged = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["_g"],
        sum_cols=_m_cols,
        schema=moment_schema,
    )
    mt = merged if isinstance(merged, pa.Table) else merged
    if mt.num_rows == 0 or mt.column("n")[0].as_py() == 0:
        return _OLS_SCHEMA.empty_table()
    n, sx, sz, sxx, szz, sxz, sy, sxy, szy, syy = (
        float(mt.column(c)[0].as_py()) for c in _m_cols
    )
    det = _det3(n, sx, sz, sx, sxx, sxz, sz, sxz, szz)
    d0 = _det3(sy, sx, sz, sxy, sxx, sxz, szy, sxz, szz)
    d1 = _det3(n, sy, sz, sx, sxy, sxz, sz, szy, szz)
    d2 = _det3(n, sx, sy, sx, sxx, sxy, sz, sxz, szy)
    # degenerate-but-valid lakes (singular normal matrix / zero y
    # variance) must DIVERGE GRACEFULLY like the oracle: DuckDB double
    # x/0 is NULL, which pandas reads as NaN — mirror that, don't raise
    nan = float("nan")
    if det != 0.0:
        b0, b1, b2 = d0 / det, d1 / det, d2 / det
    else:
        b0 = b1 = b2 = nan
    sse = syy - (b0 * sy + b1 * sxy + b2 * szy)
    sst = syy - sy * sy / n
    r2 = 1.0 - sse / sst if sst != 0.0 else nan
    return pa.table(
        {
            "n_docs": pa.array([int(n)], pa.int64()),
            "beta0": pa.array(_round6_away([b0]), pa.float64()),
            "beta1": pa.array(_round6_away([b1]), pa.float64()),
            "beta2": pa.array(_round6_away([b2]), pa.float64()),
            "r2": pa.array(_round6_away([r2]), pa.float64()),
        }
    )


SQL_OLS_MULTI = """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         SUM(CAST(len(str_split(text, ' ')) AS BIGINT)) AS sx,
         SUM(CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)) AS sz,
         SUM(CAST(len(str_split(text, ' ')) AS BIGINT)
             * CAST(len(str_split(text, ' ')) AS BIGINT)) AS sxx,
         SUM(CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)
             * CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)) AS szz,
         SUM(CAST(len(str_split(text, ' ')) AS BIGINT)
             * CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)) AS sxz,
         SUM(CAST(n_chars AS BIGINT)) AS sy,
         SUM(CAST(len(str_split(text, ' ')) AS BIGINT) * CAST(n_chars AS BIGINT)) AS sxy,
         SUM(CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS BIGINT)
             * CAST(n_chars AS BIGINT)) AS szy,
         SUM(CAST(n_chars AS BIGINT) * CAST(n_chars AS BIGINT)) AS syy
  FROM documents HAVING count(*) > 0),
d AS (SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx, CAST(sz AS DOUBLE) AS sz,
             CAST(sxx AS DOUBLE) AS sxx, CAST(szz AS DOUBLE) AS szz,
             CAST(sxz AS DOUBLE) AS sxz, CAST(sy AS DOUBLE) AS sy,
             CAST(sxy AS DOUBLE) AS sxy, CAST(szy AS DOUBLE) AS szy,
             CAST(syy AS DOUBLE) AS syy
      FROM m),
dets AS (SELECT n, sy, sxy, szy, syy,
  n*(sxx*szz - sxz*sxz) - sx*(sx*szz - sxz*sz) + sz*(sx*sxz - sxx*sz) AS det,
  sy*(sxx*szz - sxz*sxz) - sx*(sxy*szz - sxz*szy) + sz*(sxy*sxz - sxx*szy) AS d0,
  n*(sxy*szz - sxz*szy) - sy*(sx*szz - sxz*sz) + sz*(sx*szy - sxy*sz) AS d1,
  n*(sxx*szy - sxy*sxz) - sx*(sx*szy - sxy*sz) + sy*(sx*sxz - sxx*sz) AS d2
  FROM d),
beta AS (SELECT n, sy, sxy, szy, syy,
                d0/det AS b0, d1/det AS b1, d2/det AS b2 FROM dets)
SELECT CAST(n AS BIGINT) AS n_docs,
       round(b0, 6) AS beta0, round(b1, 6) AS beta1, round(b2, 6) AS beta2,
       round(1.0 - (syy - (b0*sy + b1*sxy + b2*szy)) / (syy - sy*sy/n), 6) AS r2
FROM beta
"""


# --------------------------------------------------------------------------
# Markov stationary distribution of the event-type transition chain —
# bounded power iteration in EXACT integer fixed-point, so the result
# is bit-identical across engines and partitionings with no float
# summation-order hazard: mass starts at SCALE//k per state and each
# step moves floor(p_i·c_ij / r_i) units along every edge (integer
# terms are summation-order-proof; the floor leak is part of the
# spec).  The transition counts come from the q_transitions exchange
# (O(event-type²) rows); the 20-round iteration runs on the driver
# over a k×k matrix (k = distinct event types, bounded).  Oracle: the
# SAME spec as 20 unrolled CTEs with // integer division.
# --------------------------------------------------------------------------

_MARKOV_ITERS = 20
_MARKOV_SCALE = 10**9


def q_markov_stationary(sf_dir: str):
    counts = q_transitions(sf_dir)
    # Dataset.unique returns None on a fully-empty dataset
    uniq = _read_pq(_t(sf_dir, "events"), columns=["event_type"]).unique("event_type")
    states = sorted(uniq or [])
    out_schema = pa.schema([("state", pa.string()), ("mass", pa.int64())])
    if not states:
        return out_schema.empty_table()
    c: dict[tuple[str, str], int] = {}
    r: dict[str, int] = {}
    for i, j, n in zip(
        counts.column("from_type").to_pylist(),
        counts.column("to_type").to_pylist(),
        counts.column("n").to_pylist(),
    ):
        c[(i, j)] = c.get((i, j), 0) + int(n)
        r[i] = r.get(i, 0) + int(n)
    p = {s: _MARKOV_SCALE // len(states) for s in states}
    for _ in range(_MARKOV_ITERS):
        nxt: dict[str, int] = {}
        for (i, j), cnt in c.items():
            if i in p:
                nxt[j] = nxt.get(j, 0) + (p[i] * cnt) // r[i]
        p = nxt
    out = sorted(p.items())
    return pa.table(
        {
            "state": pa.array([s for s, _ in out], pa.string()),
            "mass": pa.array([v for _, v in out], pa.int64()),
        }
    )


def _markov_sql() -> str:
    head = f"""
WITH seq AS (SELECT event_type AS to_type,
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      AS from_type
             FROM events),
c AS (SELECT from_type AS i, to_type AS j, CAST(count(*) AS BIGINT) AS cnt
      FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
r AS (SELECT i, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY i),
s AS (SELECT DISTINCT event_type AS state FROM events),
p0 AS (SELECT state,
              CAST({_MARKOV_SCALE} AS BIGINT) // (SELECT count(*) FROM s) AS v
       FROM s)"""
    steps = [
        f""",
p{t} AS (SELECT c.j AS state, CAST(SUM((p{t - 1}.v * c.cnt) // r.tot) AS BIGINT) AS v
         FROM p{t - 1} JOIN c ON c.i = p{t - 1}.state JOIN r ON r.i = p{t - 1}.state
         GROUP BY c.j)"""
        for t in range(1, _MARKOV_ITERS + 1)
    ]
    return head + "".join(steps) + f"\nSELECT state, v AS mass FROM p{_MARKOV_ITERS}"


SQL_MARKOV_STATIONARY = _markov_sql()


# --------------------------------------------------------------------------
# Longest common prefix of all document texts per language — the
# classic algebraic-reduction trick: LCP(set) = LCP(lexicographic
# min, max), so the whole operator is a per-batch (lang, min, max)
# combiner + an O(langs) exchange + one commonprefix per group on the
# driver.  String comparison is codepoint order on both engines
# (UTF-8 byte order ≡ codepoint order).
# --------------------------------------------------------------------------

_LCP_SCHEMA = pa.schema(
    [("lang", pa.string()), ("a", pa.string()), ("b", pa.string())]
)


def q_group_lcp(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame(
                {
                    "lang": b.column("lang").to_numpy(zero_copy_only=False),
                    "text": b.column("text").to_numpy(zero_copy_only=False),
                }
            )
            .groupby("lang", sort=False)["text"]
            .agg(["min", "max"])
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "a": pa.array(g["min"], pa.string()),
                "b": pa.array(g["max"], pa.string()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _LCP_SCHEMA.empty_table()
        g = (
            df.groupby("lang", sort=False)
            .agg(a=("a", "min"), b=("b", "max"))
            .reset_index()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "a": pa.array(g["a"], pa.string()),
                "b": pa.array(g["b"], pa.string()),
            }
        )

    mm = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="lang",
        per_bucket=per_bucket,
        input_schema=_LCP_SCHEMA,
    )
    import os.path as _osp

    langs = mm.column("lang").to_pylist()
    lcps = [
        len(_osp.commonprefix([a, b]))
        for a, b in zip(mm.column("a").to_pylist(), mm.column("b").to_pylist())
    ]
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "lcp_len": pa.array(lcps, pa.int64()),
        }
    )


SQL_GROUP_LCP = """
WITH mm AS (SELECT lang, min(text) AS a, max(text) AS b FROM documents GROUP BY lang),
ser AS (SELECT CAST(unnest(generate_series(1, m)) AS INT) AS i
        FROM (SELECT coalesce(max(length(text)), 0) AS m FROM documents)),
hit AS (SELECT mm.lang AS lang, max(i) AS lcp FROM mm JOIN ser
        ON i <= least(length(a), length(b))
        AND substr(a, 1, i) = substr(b, 1, i) GROUP BY mm.lang)
SELECT mm.lang AS lang, CAST(coalesce(hit.lcp, 0) AS BIGINT) AS lcp_len
FROM mm LEFT JOIN hit ON hit.lang = mm.lang
"""


# --------------------------------------------------------------------------
# Strict 3-step funnel — first 'view', first 'click' STRICTLY after
# it, first 'purchase' strictly after that click; counts users
# reaching each stage.  The strictly-after chain makes the stage
# times non-combinable per batch, so the shape is the ewma one: the
# exchange moves PROJECTED narrow rows (user_id, ts, 2-bit stage) —
# never text/props — and each user resolves vectorized in its bucket.
# --------------------------------------------------------------------------

_F3_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_type", pa.string())]
)


def q_funnel3_strict(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read_pq(
        _t(sf_dir, "events"),
        columns=["user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["view", "click", "purchase"]),
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.table(
                {
                    "n_view": pa.array([0], pa.int64()),
                    "n_click": pa.array([0], pa.int64()),
                    "n_purchase": pa.array([0], pa.int64()),
                }
            )
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {"user_id": df["user_id"].to_numpy(), "ts": ts, "et": df["event_type"]}
        )
        v = (
            df[df["et"] == "view"]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "tv"})
        )
        c = df[df["et"] == "click"].merge(v, on="user_id")
        c = (
            c[c["ts"] > c["tv"]]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
            .rename(columns={"ts": "tc"})
        )
        p = df[df["et"] == "purchase"].merge(c, on="user_id")
        p = (
            p[p["ts"] > p["tc"]]
            .groupby("user_id", sort=False, as_index=False)["ts"]
            .min()
        )
        return pa.table(
            {
                "n_view": pa.array([len(v)], pa.int64()),
                "n_click": pa.array([len(c)], pa.int64()),
                "n_purchase": pa.array([len(p)], pa.int64()),
            }
        )

    per_bucket_counts = _merge_partials(
        ds, key="user_id", per_bucket=per_bucket, input_schema=_F3_SCHEMA
    )
    # bucket partials are additive (users are bucket-disjoint)
    t = per_bucket_counts
    return pa.table(
        {
            "n_view": pa.array([pc.sum(t.column("n_view")).as_py() or 0], pa.int64()),
            "n_click": pa.array([pc.sum(t.column("n_click")).as_py() or 0], pa.int64()),
            "n_purchase": pa.array(
                [pc.sum(t.column("n_purchase")).as_py() or 0], pa.int64()
            ),
        }
    )


SQL_FUNNEL3_STRICT = """
WITH v AS (SELECT user_id, min(ts) AS tv FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id AS user_id, min(e.ts) AS tc FROM events e
      JOIN v ON v.user_id = e.user_id AND e.ts > v.tv
      WHERE e.event_type = 'click' GROUP BY e.user_id),
p AS (SELECT e.user_id AS user_id, min(e.ts) AS tp FROM events e
      JOIN c ON c.user_id = e.user_id AND e.ts > c.tc
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase
"""


# --------------------------------------------------------------------------
# Event-type runs (gaps-and-islands) — per user: number of maximal
# same-type runs, the longest run, and its type (lexicographic min on
# ties).  The user-bucketed exchange ships only (user_id, ts,
# event_id, event_type); in-bucket the island ids are one vectorized
# boundary-cumsum.  Oracle: the classic rn − rn_per_type island key.
# --------------------------------------------------------------------------

_RUNS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("event_id", pa.int64()),
        ("event_type", pa.string()),
    ]
)


def q_type_runs(sf_dir: str):
    ds = _read_pq(
        _t(sf_dir, "events"), columns=["user_id", "ts", "event_id", "event_type"]
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_runs", pa.int64()),
                ("longest_run", pa.int64()),
                ("longest_type", pa.string()),
            ]
        )
        if df.empty:
            return out_schema.empty_table()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        new_run = np.ones(len(df), dtype=bool)
        new_run[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        run_id = np.cumsum(new_run) - 1
        runs = pd.DataFrame(
            {"user_id": uid, "event_type": et, "run_id": run_id}
        ).groupby("run_id", sort=False).agg(
            user_id=("user_id", "first"),
            event_type=("event_type", "first"),
            length=("run_id", "size"),
        )
        agg = runs.groupby("user_id", sort=False).agg(
            n_runs=("length", "size"), longest_run=("length", "max")
        )
        m = runs.merge(agg, on="user_id")
        m = m[m["length"] == m["longest_run"]]
        top = (
            m.groupby("user_id", sort=False)
            .agg(
                n_runs=("n_runs", "first"),
                longest_run=("longest_run", "first"),
                longest_type=("event_type", "min"),
            )
            .reset_index()
        )
        return pa.table(
            {
                "user_id": pa.array(top["user_id"].to_numpy(), pa.int64()),
                "n_runs": pa.array(top["n_runs"].to_numpy().astype(np.int64), pa.int64()),
                "longest_run": pa.array(
                    top["longest_run"].to_numpy().astype(np.int64), pa.int64()
                ),
                "longest_type": pa.array(top["longest_type"], pa.string()),
            }
        )

    return _merge_partials(
        ds, key="user_id", per_bucket=per_bucket, input_schema=_RUNS_SCHEMA
    )


SQL_TYPE_RUNS = """
WITH x AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rt
           FROM events),
runs AS (SELECT user_id, event_type, count(*) AS len
         FROM x GROUP BY user_id, event_type, rn - rt),
agg AS (SELECT user_id, count(*) AS n_runs, max(len) AS longest
        FROM runs GROUP BY user_id)
SELECT a.user_id AS user_id, CAST(a.n_runs AS BIGINT) AS n_runs,
       CAST(a.longest AS BIGINT) AS longest_run,
       min(r.event_type) AS longest_type
FROM agg a JOIN runs r ON r.user_id = a.user_id AND r.len = a.longest
GROUP BY a.user_id, a.n_runs, a.longest
"""


# --------------------------------------------------------------------------
# Linear multi-touch attribution — for every purchase, the number of
# the same user's clicks in the strict 7-day window before it and the
# per-touch weight as an INTEGER ppm (1000000 // k): no float sums
# cross any boundary, so the result is partitioning- and
# engine-exact.  Shape: user-bucketed exchange of projected narrow
# rows; in-bucket, ONE vectorized two-sided searchsorted per user
# answers all of that user's purchases at once.
# --------------------------------------------------------------------------

_MTA_WIN_US = 7 * 24 * 3600 * 1_000_000

_MTA_IN_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("event_id", pa.int64()),
        ("event_type", pa.string()),
    ]
)


def q_multitouch_attribution(sf_dir: str):
    import pyarrow.dataset as pads

    ds = _read_pq(
        _t(sf_dir, "events"),
        columns=["user_id", "ts", "event_id", "event_type"],
        filter=pads.field("event_type").isin(["click", "purchase"]),
    )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("n_touches", pa.int64()),
                ("weight_ppm", pa.int64()),
            ]
        )
        if df.empty:
            return out_schema.empty_table()
        # merge-based window counting, fully vectorized across users:
        # interleave click rows (+1) with two probe rows per purchase
        # (at tp and tp−W); after a (user, ts, probe-before-click)
        # sort, a per-user running click count read at the probes gives
        # #(ts < tp) − #(ts < tp−W) = clicks in [tp−W, tp) exactly —
        # probes sort before clicks at equal ts, so the tp−W boundary
        # click is included and the tp one excluded, matching the SQL.
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        eid = df["event_id"].to_numpy()
        is_click = (df["event_type"] == "click").to_numpy()
        is_p = (df["event_type"] == "purchase").to_numpy()
        n_p = int(is_p.sum())
        if n_p == 0 or not is_click.any():
            return out_schema.empty_table()
        pu, pt, pe = uid[is_p], ts[is_p], eid[is_p]
        mu = np.concatenate([uid[is_click], pu, pu])
        mt = np.concatenate([ts[is_click], pt, pt - _MTA_WIN_US])
        kind = np.concatenate(  # 1 = click, 0 = probe (sorts first on ties)
            [
                np.ones(int(is_click.sum()), np.int8),
                np.zeros(2 * n_p, np.int8),
            ]
        )
        probe_id = np.concatenate(
            [np.full(int(is_click.sum()), -1), np.arange(n_p), np.arange(n_p) + n_p]
        )
        order = np.lexsort((kind, mt, mu))
        cum = np.cumsum(kind[order] == 1)
        # per-user base: clicks counted before this user's first row
        first = np.ones(len(order), dtype=bool)
        first[1:] = mu[order][1:] != mu[order][:-1]
        cum_before = np.concatenate([[0], cum[:-1]])
        base = np.maximum.accumulate(np.where(first, cum_before, 0))
        per_user_cum = cum - base
        pid = probe_id[order]
        probes = pid >= 0
        vals = np.empty(2 * n_p, dtype=np.int64)
        vals[pid[probes]] = per_user_cum[probes]
        k = vals[:n_p] - vals[n_p:]
        keep = k > 0
        kk = k[keep]
        return pa.table(
            {
                "event_id": pa.array(pe[keep].astype(np.int64), pa.int64()),
                "user_id": pa.array(pu[keep].astype(np.int64), pa.int64()),
                "n_touches": pa.array(kk, pa.int64()),
                "weight_ppm": pa.array(1_000_000 // kk, pa.int64()),
            }
        )

    return _merge_partials(
        ds, key="user_id", per_bucket=per_bucket, input_schema=_MTA_IN_SCHEMA
    )


SQL_MULTITOUCH_ATTRIBUTION = f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
k AS (SELECT p.event_id AS event_id, p.user_id AS user_id,
             CAST(count(*) AS BIGINT) AS n_touches
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.ts < p.ts
       AND epoch_us(c.ts) >= epoch_us(p.ts) - {_MTA_WIN_US}
      GROUP BY p.event_id, p.user_id)
SELECT event_id, user_id, n_touches,
       CAST(1000000 // n_touches AS BIGINT) AS weight_ppm
FROM k
"""


# --------------------------------------------------------------------------
# EXACT heavy hitters — users contributing ≥ 1/200 of all events;
# the oracled anchor for the sketch-based `heavy_hitters` (CMS, no
# oracle): per-batch count combiner → O(users) exchange → integer
# threshold filter.  Both engines use integer // so the threshold is
# tie-exact.
# --------------------------------------------------------------------------

_HH_DENOM = 200


def q_heavy_hitters_exact(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id"])

    def partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(
            b.column("user_id").to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "user_id": pa.array(u.astype(np.int64), pa.int64()),
                "n_events": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    # pass 1: global total (streaming count — no materialization);
    # pass 2: per-user sums filtered IN the bucket, so the driver only
    # ever sees the hitters themselves (≤ _HH_DENOM rows by
    # construction), never the O(users) count table.
    total = int(ds.count())
    thresh = total // _HH_DENOM
    schema = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())])

    def per_bucket(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("user_id", sort=False, as_index=False)["n_events"].sum()
        g = g[g["n_events"] >= thresh]
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_events": pa.array(
                    g["n_events"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id",
        per_bucket=per_bucket,
        input_schema=schema,
    )


SQL_HEAVY_HITTERS_EXACT = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
HAVING count(*) >= (SELECT count(*) FROM events) // {_HH_DENOM}
"""


# --------------------------------------------------------------------------
# Hierarchical top-k — the top-10 users by lifetime spend (exact
# integer cents) with each one's top-3 days.  Per-batch (user, day)
# cent combiner; the user-keyed exchange resolves each user's total
# and top-3 days IN its bucket (≤3 rows + 1 total per user cross to
# the driver — O(users), never O(user-days)); the global top-10 cut
# happens on that small table.  Ordering ties: (cents DESC, day ASC)
# within user, (total DESC, user_id ASC) across — identical on both
# engines, integers end to end.
# --------------------------------------------------------------------------

_DAY_US = 24 * 3600 * 1_000_000

_TKJ_PART_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("day_us", pa.int64()), ("cents", pa.int64())]
)


def q_topk_join(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        day = (ts.astype(np.int64) // _DAY_US) * _DAY_US
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "day_us": day,
                    "cents": cents,
                }
            )
            .groupby(["user_id", "day_us"], sort=False, as_index=False)["cents"]
            .sum()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "day_us": pa.array(g["day_us"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("total_cents", pa.int64()),
                ("day_us", pa.int64()),
                ("day_cents", pa.int64()),
            ]
        )
        if df.empty:
            return out_schema.empty_table()
        d = df.groupby(["user_id", "day_us"], sort=False, as_index=False)[
            "cents"
        ].sum()
        tot = d.groupby("user_id", sort=False)["cents"].sum().rename("total_cents")
        d = d.merge(tot, on="user_id")
        d = d.sort_values(
            ["user_id", "cents", "day_us"], ascending=[True, False, True]
        )
        top3 = d.groupby("user_id", sort=False).head(3)
        # bucket-local top-10 cut: users are bucket-disjoint, so the
        # global top-10 is a subset of the per-bucket top-10s — the
        # driver sees ≤ 40 rows per bucket, never O(users)
        bt = (
            top3[["user_id", "total_cents"]]
            .drop_duplicates()
            .sort_values(["total_cents", "user_id"], ascending=[False, True])
            .head(10)
        )
        top3 = top3[top3["user_id"].isin(bt["user_id"])]
        return pa.table(
            {
                "user_id": pa.array(top3["user_id"].to_numpy(), pa.int64()),
                "total_cents": pa.array(top3["total_cents"].to_numpy(), pa.int64()),
                "day_us": pa.array(top3["day_us"].to_numpy(), pa.int64()),
                "day_cents": pa.array(top3["cents"].to_numpy(), pa.int64()),
            }
        )

    per_user = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id",
        per_bucket=per_bucket,
        input_schema=_TKJ_PART_SCHEMA,
    )
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("total_cents", pa.int64()),
            ("day_us", pa.int64()),
            ("day_cents", pa.int64()),
        ]
    )
    if per_user.num_rows == 0:
        return out_schema.empty_table()
    pdf = per_user.to_pandas()
    totals = pdf[["user_id", "total_cents"]].drop_duplicates()
    top10 = totals.sort_values(
        ["total_cents", "user_id"], ascending=[False, True]
    ).head(10)
    keep = pdf[pdf["user_id"].isin(top10["user_id"])]
    return pa.table(
        {
            "user_id": pa.array(keep["user_id"].to_numpy(), pa.int64()),
            "total_cents": pa.array(keep["total_cents"].to_numpy(), pa.int64()),
            "day_us": pa.array(keep["day_us"].to_numpy(), pa.int64()),
            "day_cents": pa.array(keep["day_cents"].to_numpy(), pa.int64()),
        }
    )


SQL_TOPK_JOIN = f"""
WITH d AS (SELECT user_id,
                  (epoch_us(ts) // {_DAY_US}) * {_DAY_US} AS day_us,
                  SUM(CAST(round(value * 100) AS BIGINT)) AS cents
           FROM events GROUP BY 1, 2),
u AS (SELECT user_id, CAST(SUM(cents) AS BIGINT) AS total_cents FROM d GROUP BY 1),
top AS (SELECT user_id, total_cents FROM u
        ORDER BY total_cents DESC, user_id LIMIT 10)
SELECT t.user_id AS user_id, t.total_cents AS total_cents,
       d.day_us AS day_us, CAST(d.cents AS BIGINT) AS day_cents
FROM top t JOIN d ON d.user_id = t.user_id
QUALIFY row_number() OVER (PARTITION BY t.user_id
                           ORDER BY d.cents DESC, d.day_us) <= 3
"""


# --------------------------------------------------------------------------
# Pairwise event-type audience overlap (exact Jaccard, integer ppm) —
# the per-user 5-bit type bitmask is the whole state: a per-batch
# (user → OR-mask) combiner, one O(users) Max exchange, then a
# 32-entry mask histogram from which every pair's |A|, |B|, |A∩B|
# falls out in closed form on the driver.  jaccard_ppm uses integer
# // so no float ever exists.
# --------------------------------------------------------------------------


def q_type_jaccard(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "event_type"])
    types: list[str] = sorted(
        _read_pq(_t(sf_dir, "events"), columns=["event_type"]).unique("event_type")
        or []
    )
    out_schema = pa.schema(
        [
            ("type_a", pa.string()),
            ("type_b", pa.string()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("n_both", pa.int64()),
            ("jaccard_ppm", pa.int64()),
        ]
    )
    if len(types) < 2:
        return out_schema.empty_table()
    t_idx = {t: i for i, t in enumerate(types)}

    def _or_by_user(df: pd.DataFrame) -> np.ndarray:
        """Vectorized per-user OR: expand the ≤|types|-bit mask into
        boolean columns, groupby-max each, recombine — no Python
        lambda per group."""
        g = df.groupby("user_id", sort=False)
        out = np.zeros(g.ngroups, dtype=np.int64)
        mask = df["mask"].to_numpy()
        for k in range(len(types)):
            bit = (
                pd.Series((mask >> k) & 1, index=df.index)
                .groupby(df["user_id"], sort=False)
                .max()
                .to_numpy()
            )
            out |= bit.astype(np.int64) << k
        return out

    def partial(b: pa.Table) -> pa.Table:
        codes = pd.Categorical(
            b.column("event_type").to_numpy(zero_copy_only=False), categories=types
        ).codes.astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                "mask": np.int64(1) << codes,
            }
        )
        uid = np.array(sorted(df["user_id"].unique()))
        df = df.sort_values("user_id", kind="stable")
        return pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64), pa.int64()),
                "mask": pa.array(_or_by_user(df), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.schema(
                [("mask", pa.int64()), ("n_users", pa.int64())]
            ).empty_table()
        df = df.sort_values("user_id", kind="stable")
        m = _or_by_user(df)
        u, c = np.unique(m, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(u.astype(np.int64), pa.int64()),
                "n_users": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hist = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id",
        per_bucket=per_bucket,
        input_schema=pa.schema([("user_id", pa.int64()), ("mask", pa.int64())]),
    )
    # the bucketed path emits one histogram per bucket — fold them
    hd = hist.to_pandas().groupby("mask", as_index=False)["n_users"].sum()
    masks = hd["mask"].to_numpy()
    counts = hd["n_users"].to_numpy()
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ba, bb = 1 << t_idx[a], 1 << t_idx[b]
            n_a = int(counts[(masks & ba) > 0].sum())
            n_b = int(counts[(masks & bb) > 0].sum())
            n_both = int(counts[((masks & ba) > 0) & ((masks & bb) > 0)].sum())
            union = n_a + n_b - n_both
            rows.append(
                (a, b, n_a, n_b, n_both, (1_000_000 * n_both) // union if union else 0)
            )
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "n_both": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard_ppm": pa.array([r[5] for r in rows], pa.int64()),
        }
    )


SQL_TYPE_JACCARD = """
WITH u AS (SELECT user_id, event_type FROM events GROUP BY user_id, event_type),
t AS (SELECT DISTINCT event_type FROM events),
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM t a JOIN t b ON a.event_type < b.event_type),
j AS (SELECT p.type_a, p.type_b,
             (SELECT count(*) FROM u WHERE u.event_type = p.type_a) AS n_a,
             (SELECT count(*) FROM u WHERE u.event_type = p.type_b) AS n_b,
             (SELECT count(*) FROM u ua JOIN u ub
               ON ua.user_id = ub.user_id
              WHERE ua.event_type = p.type_a AND ub.event_type = p.type_b) AS n_both
      FROM pairs p)
SELECT type_a, type_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(CASE WHEN n_a + n_b - n_both > 0
                 THEN (1000000 * n_both) // (n_a + n_b - n_both)
                 ELSE 0 END AS BIGINT) AS jaccard_ppm
FROM j
"""


# --------------------------------------------------------------------------
# Per-language character-trigram profile — top-20 [a-z]³ trigrams.
# Kernel: per batch, docs concat into ONE byte buffer with NUL
# separators; the three window views are stride slices, the
# all-lowercase mask one vectorized compare, and the counting a
# single bincount over base-26 codes per language segment — no
# Python loop over characters.  The exchange moves (lang, tri, cnt)
# partials (≤ 17,576 rows per lang per batch).
# --------------------------------------------------------------------------

_TRI_TOPK = 20


def q_char_trigrams(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        langs = b.column("lang").to_numpy(zero_copy_only=False)
        texts = b.column("text").to_numpy(zero_copy_only=False)
        order = np.argsort(langs, kind="stable")
        out_l, out_t, out_c = [], [], []
        # one buffer per language segment (languages are few)
        for lg in np.unique(langs):
            docs = texts[order][langs[order] == lg]
            buf = np.frombuffer(
                ("\x00".join(d.lower() for d in docs)).encode(
                    "utf-8", errors="replace"
                ),
                dtype=np.uint8,
            )
            if len(buf) < 3:
                continue
            c0, c1, c2 = buf[:-2], buf[1:-1], buf[2:]
            lo, hi = np.uint8(ord("a")), np.uint8(ord("z"))
            m = (
                (c0 >= lo) & (c0 <= hi)
                & (c1 >= lo) & (c1 <= hi)
                & (c2 >= lo) & (c2 <= hi)
            )
            code = (
                (c0[m].astype(np.int32) - lo) * 676
                + (c1[m].astype(np.int32) - lo) * 26
                + (c2[m].astype(np.int32) - lo)
            )
            cnt = np.bincount(code, minlength=17576)
            nz = np.flatnonzero(cnt)
            out_l.append(np.full(len(nz), lg, dtype=object))
            out_t.append(nz)
            out_c.append(cnt[nz])
        if not out_t:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "tri": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "lang": pa.array(np.concatenate(out_l), pa.string()),
                "tri": pa.array(np.concatenate(out_t).astype(np.int64), pa.int64()),
                "cnt": pa.array(np.concatenate(out_c).astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [("lang", pa.string()), ("trigram", pa.string()), ("cnt", pa.int64())]
        )
        if df.empty:
            return out_schema.empty_table()
        g = df.groupby(["lang", "tri"], sort=False, as_index=False)["cnt"].sum()
        g = g.sort_values(["lang", "cnt", "tri"], ascending=[True, False, True])
        g = g.groupby("lang", sort=False).head(_TRI_TOPK)
        tri = g["tri"].to_numpy().astype(np.int64)
        chars = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        names = [
            "".join((chars[t // 676], chars[(t // 26) % 26], chars[t % 26]))
            for t in tri
        ]
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "trigram": pa.array(names, pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="lang",
        per_bucket=per_bucket,
        input_schema=pa.schema(
            [("lang", pa.string()), ("tri", pa.int64()), ("cnt", pa.int64())]
        ),
    )


SQL_CHAR_TRIGRAMS = f"""
WITH ser AS (SELECT CAST(unnest(generate_series(1, m)) AS INT) AS i
             FROM (SELECT coalesce(max(length(text)), 0) AS m FROM documents)),
tg AS (SELECT lang, substr(lower(text), i, 3) AS trigram
       FROM documents JOIN ser ON i <= length(lower(text)) - 2),
c AS (SELECT lang, trigram, CAST(count(*) AS BIGINT) AS cnt FROM tg
      WHERE regexp_full_match(trigram, '[a-z]{{3}}')
      GROUP BY lang, trigram)
SELECT lang, trigram, cnt FROM c
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, trigram)
        <= {_TRI_TOPK}
"""


# --------------------------------------------------------------------------
# Weekly cohort LTV — revenue (exact cents) and active users by
# (first-seen week, week age).  Weeks are plain epoch_us // 7d floor
# on BOTH engines (no ISO-week/date_trunc subtleties).  Per-batch
# (user, week)→cents combiner; the user-keyed exchange resolves each
# user's cohort anchor in its bucket and collapses to (cohort, age)
# partials — the driver sums O(weeks²) rows, never users.
# --------------------------------------------------------------------------

_WEEK_US = 7 * 24 * 3600 * 1_000_000

_LTV_PART_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("wk", pa.int64()), ("cents", pa.int64())]
)


def q_cohort_ltv(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        wk = ts.astype(np.int64) // _WEEK_US
        cents = np.rint(
            b.column("value").to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "user_id": b.column("user_id").to_numpy(zero_copy_only=False),
                    "wk": wk,
                    "cents": cents,
                }
            )
            .groupby(["user_id", "wk"], sort=False, as_index=False)["cents"]
            .sum()
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "wk": pa.array(g["wk"].to_numpy(), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy(), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("cohort_week", pa.int64()),
                ("age", pa.int64()),
                ("cents", pa.int64()),
                ("n_users", pa.int64()),
            ]
        )
        if df.empty:
            return out_schema.empty_table()
        d = df.groupby(["user_id", "wk"], sort=False, as_index=False)["cents"].sum()
        first = d.groupby("user_id", sort=False)["wk"].min().rename("cw")
        d = d.merge(first, on="user_id")
        d["age"] = d["wk"] - d["cw"]
        g = d.groupby(["cw", "age"], sort=False).agg(
            cents=("cents", "sum"), n_users=("user_id", "nunique")
        )
        g = g.reset_index()
        return pa.table(
            {
                "cohort_week": pa.array(g["cw"].to_numpy().astype(np.int64), pa.int64()),
                "age": pa.array(g["age"].to_numpy().astype(np.int64), pa.int64()),
                "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
                "n_users": pa.array(
                    g["n_users"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    parts = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id",
        per_bucket=per_bucket,
        input_schema=_LTV_PART_SCHEMA,
    )
    # users are bucket-disjoint → cents and n_users are both additive
    pdf = parts.to_pandas()
    out_schema = pa.schema(
        [
            ("cohort_week", pa.int64()),
            ("age", pa.int64()),
            ("cents", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )
    if pdf.empty:
        return out_schema.empty_table()
    g = pdf.groupby(["cohort_week", "age"], as_index=False)[["cents", "n_users"]].sum()
    return pa.table(
        {
            "cohort_week": pa.array(g["cohort_week"].to_numpy(), pa.int64()),
            "age": pa.array(g["age"].to_numpy(), pa.int64()),
            "cents": pa.array(g["cents"].to_numpy().astype(np.int64), pa.int64()),
            "n_users": pa.array(g["n_users"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


SQL_COHORT_LTV = f"""
WITH e AS (SELECT user_id, epoch_us(ts) // {_WEEK_US} AS wk,
                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
f AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
g AS (SELECT f.cw AS cohort_week, e.wk - f.cw AS age,
             SUM(e.cents) AS cents, count(DISTINCT e.user_id) AS n_users
      FROM e JOIN f ON f.user_id = e.user_id GROUP BY 1, 2)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week, CAST(age AS BIGINT) AS age,
       CAST(cents AS BIGINT) AS cents, CAST(n_users AS BIGINT) AS n_users
FROM g
"""


# --------------------------------------------------------------------------
# Training-mixture apportionment — split a fixed per-epoch document
# budget across languages proportionally to token mass with the
# largest-remainder (Hamilton) method: floor shares first, the
# leftover seats to the largest remainders (ties → lang ASC).  Pure
# integer arithmetic on both engines (Python ints ≙ HUGEINT), so the
# allocation is tie-exact; token counts come from one mergeable-sum
# exchange and the apportionment itself touches k = |langs| rows.
# --------------------------------------------------------------------------

_APPORTION_BUDGET = 1_000_000


def q_sample_apportion(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        wc = pc.list_value_length(pc.split_pattern(b.column("text"), " ")).to_numpy(
            zero_copy_only=False
        )
        g = (
            pd.DataFrame(
                {"lang": b.column("lang").to_numpy(zero_copy_only=False), "toks": wc}
            )
            .groupby("lang", sort=False, as_index=False)["toks"]
            .sum()
        )
        return pa.table(
            {
                "lang": pa.array(g["lang"], pa.string()),
                "toks": pa.array(g["toks"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    schema = pa.schema([("lang", pa.string()), ("toks", pa.int64())])
    merged = _sum_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["lang"],
        sum_cols=["toks"],
        schema=schema,
    )
    out_schema = pa.schema([("lang", pa.string()), ("quota", pa.int64())])
    langs = merged.column("lang").to_pylist()
    toks = [int(v) for v in merged.column("toks").to_pylist()]
    tot = sum(toks)
    if not langs or tot == 0:
        return out_schema.empty_table()
    B = _APPORTION_BUDGET
    floors = [(B * t) // tot for t in toks]
    rems = [(B * t) % tot for t in toks]
    left = B - sum(floors)
    order = sorted(range(len(langs)), key=lambda i: (-rems[i], langs[i]))
    quota = list(floors)
    for i in order[:left]:
        quota[i] += 1
    return pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "quota": pa.array(quota, pa.int64()),
        }
    )


SQL_SAMPLE_APPORTION = f"""
WITH c AS (SELECT lang, SUM(CAST(len(str_split(text, ' ')) AS BIGINT)) AS toks
           FROM documents GROUP BY lang),
t AS (SELECT SUM(toks) AS tot FROM c HAVING SUM(toks) > 0),
base AS (SELECT lang, ({_APPORTION_BUDGET} * toks) // t.tot AS fl,
                ({_APPORTION_BUDGET} * toks) % t.tot AS rem
         FROM c, t),
lef AS (SELECT {_APPORTION_BUDGET} - SUM(fl) AS leftover FROM base),
r AS (SELECT lang, fl, row_number() OVER (ORDER BY rem DESC, lang) AS rk FROM base)
SELECT lang,
       CAST(fl + CASE WHEN rk <= (SELECT leftover FROM lef) THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r
"""


# --------------------------------------------------------------------------
# Pairwise source-contamination matrix — for every source pair, how
# many DISTINCT 8-word shingles they share (the curation diagnostic
# behind cross-source syndication / benchmark leakage).
#
# Scale path (r3 lesson: the literal 8-word shingle STRING as the
# exchange key measured 456 s vs the 81 s oracle at 1M docs — ~50
# bytes of text per exchanged row): the exchange now carries TWO
# independent 64-bit shingle hashes (polynomial roll over two
# independently-keyed word-hash streams) — 16 bytes/row, computed
# fully vectorized.  Exactness is preserved by a collision AUDIT:
# within each h1-keyed bucket, an h1 carrying >1 distinct h2 is a
# detected collision and is routed to a string-keyed audit pass (the
# original exact path) restricted to just those shingles; clean h1s
# count hash-side.  A collision escapes only if two DIFFERENT
# shingles collide in BOTH independent 64-bit hashes simultaneously
# (≈2⁻¹²⁸ per pair — below any physical error rate).
# --------------------------------------------------------------------------

_SHINGLE_K = 8

_SSO_PART_SCHEMA = pa.schema(
    [("h1", pa.uint64()), ("h2", pa.uint64()), ("source", pa.string())]
)
_SSO_OUT_SCHEMA = pa.schema(
    [("source_a", pa.string()), ("source_b", pa.string()), ("n_shared", pa.int64())]
)
_SSO_KEY2 = "graftsso2ndkey!!"  # 16-char pandas hash_key for stream 2
_SSO_B1 = np.uint64(1099511628211)  # FNV-1a prime, odd
_SSO_B2 = np.uint64(2862933555777941757)  # LCG multiplier, odd
_SSO_SUSPECT = "\x00__sso_suspect__"  # per-bucket suspect marker row


def _sso_windows(srcs: list, texts: list):
    """Vectorized per-batch shingle hashing: every doc's ``split(' ')``
    words hashed once per stream, then k shifted multiply-adds build
    all window hashes at once.  Returns (src_codes np.object win rows,
    h1, h2, doc_idx, win_start_within_doc, words_per_doc)."""
    words_per_doc = [t.split(" ") for t in texts]
    lens = np.fromiter(
        (len(w) for w in words_per_doc), dtype=np.int64, count=len(words_per_doc)
    )
    m = np.maximum(lens - _SHINGLE_K + 1, 0)
    total = int(m.sum())
    if total == 0:
        e = np.empty(0, dtype=np.uint64)
        return (
            np.empty(0, dtype=object), e, e,
            np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
            words_per_doc,
        )
    flat = np.concatenate([np.asarray(w, dtype=object) for w in words_per_doc])
    wh1 = pd.util.hash_array(flat)
    wh2 = pd.util.hash_array(flat, hash_key=_SSO_KEY2)
    starts = np.cumsum(lens) - lens
    doc_idx = np.repeat(np.arange(len(lens)), m)
    within = np.arange(total) - np.repeat(np.cumsum(m) - m, m)
    w0 = starts[doc_idx] + within
    h1 = np.zeros(total, dtype=np.uint64)
    h2 = np.zeros(total, dtype=np.uint64)
    for j in range(_SHINGLE_K):  # uint64 wraparound = mod 2^64
        h1 = h1 * _SSO_B1 + wh1[w0 + j]
        h2 = h2 * _SSO_B2 + wh2[w0 + j]
    src_arr = np.asarray(srcs, dtype=object)[doc_idx]
    return src_arr, h1, h2, doc_idx, within, words_per_doc


def _sso_pair_counts(d: pd.DataFrame, key: str) -> pd.DataFrame:
    """Distinct-``key`` shared-shingle counts per source pair via a
    vectorized self-merge (no per-group Python)."""
    dd = d[[key, "source"]].drop_duplicates()
    multi = dd[key].map(dd[key].value_counts()) >= 2
    dd = dd[multi]
    if dd.empty:
        return pd.DataFrame(columns=["source_a", "source_b", "n_shared"])
    mm = dd.merge(dd, on=key)
    mm = mm[mm["source_x"] < mm["source_y"]]
    g = mm.groupby(["source_x", "source_y"], as_index=False).size()
    g.columns = ["source_a", "source_b", "n_shared"]
    return g


def q_source_shingle_overlap(sf_dir: str):
    path = _t(sf_dir, "documents")
    ds = _read_pq(path, columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        src_arr, h1, h2, _, _, _ = _sso_windows(
            b.column("source").to_pylist(), b.column("text").to_pylist()
        )
        if len(h1) == 0:
            return _SSO_PART_SCHEMA.empty_table()
        d = pd.DataFrame({"h1": h1, "h2": h2, "source": src_arr}).drop_duplicates()
        return pa.table(
            {
                "h1": pa.array(d["h1"].to_numpy(), pa.uint64()),
                "h2": pa.array(d["h2"].to_numpy(), pa.uint64()),
                "source": pa.array(d["source"], pa.string()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _SSO_OUT_SCHEMA.empty_table()
        d = df.drop_duplicates(["h1", "h2", "source"])
        # detected collisions: one h1, >1 distinct underlying shingle
        nh2 = d.groupby("h1")["h2"].transform("nunique")
        suspects = d.loc[nh2 > 1, "h1"].unique()
        clean = d[nh2 <= 1]
        g = _sso_pair_counts(clean, "h1")
        out = pa.table(
            {
                "source_a": pa.array(g["source_a"], pa.string()),
                "source_b": pa.array(g["source_b"], pa.string()),
                "n_shared": pa.array(
                    g["n_shared"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )
        if len(suspects):
            out = pa.concat_tables(
                [
                    out,
                    pa.table(
                        {
                            "source_a": pa.array(
                                [_SSO_SUSPECT] * len(suspects), pa.string()
                            ),
                            "source_b": pa.array(
                                [str(int(s)) for s in suspects], pa.string()
                            ),
                            "n_shared": pa.array([0] * len(suspects), pa.int64()),
                        }
                    ),
                ]
            )
        return out

    parts = _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="h1",
        per_bucket=per_bucket,
        input_schema=_SSO_PART_SCHEMA,
    )
    pdf = parts.to_pandas()
    if pdf.empty:
        return _SSO_OUT_SCHEMA.empty_table()

    suspect_rows = pdf[pdf["source_a"] == _SSO_SUSPECT]
    pdf = pdf[pdf["source_a"] != _SSO_SUSPECT]
    if len(suspect_rows):
        # string-keyed audit pass, restricted to the detected-collision
        # shingles only — the original exact path as the audit twin
        suspect_set = set(
            np.asarray(suspect_rows["source_b"], dtype="U").astype(np.uint64).tolist()
        )

        def audit_partial(b: pa.Table) -> pa.Table:
            srcs = b.column("source").to_pylist()
            texts = b.column("text").to_pylist()
            src_arr, h1, _, doc_idx, within, words = _sso_windows(srcs, texts)
            mask = np.isin(h1, np.fromiter(suspect_set, dtype=np.uint64))
            sg = [
                " ".join(words[di][w : w + _SHINGLE_K])
                for di, w in zip(doc_idx[mask], within[mask])
            ]
            return pa.table(
                {
                    "sg": pa.array(sg, pa.string()),
                    "source": pa.array(src_arr[mask], pa.string()),
                }
            )

        audit = (
            _to_table(
                _read_pq(path, columns=["source", "text"]).map_batches(
                    audit_partial, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .to_pandas()
            .drop_duplicates()
        )
        pdf = pd.concat([pdf, _sso_pair_counts(audit, "sg")], ignore_index=True)

    g = pdf.groupby(["source_a", "source_b"], as_index=False)["n_shared"].sum()
    return pa.table(
        {
            "source_a": pa.array(g["source_a"], pa.string()),
            "source_b": pa.array(g["source_b"], pa.string()),
            "n_shared": pa.array(g["n_shared"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


SQL_SOURCE_SHINGLE_OVERLAP = f"""
WITH w AS (SELECT source, str_split(text, ' ') AS ws FROM documents),
ser AS (SELECT CAST(unnest(generate_series(1, m)) AS INT) AS i
        FROM (SELECT coalesce(max(len(str_split(text, ' '))), 0) AS m
              FROM documents)),
sh AS (SELECT DISTINCT source,
              array_to_string(list_slice(ws, i, i + {_SHINGLE_K - 1}), ' ') AS sg
       FROM w JOIN ser ON i <= len(ws) - {_SHINGLE_K - 1}),
p AS (SELECT a.source AS source_a, b.source AS source_b
      FROM sh a JOIN sh b ON a.sg = b.sg AND a.source < b.source)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared
FROM p GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Burstiness (Fano factor) of each user's hourly event counts over
# their active span (zero hours included analytically): everything
# derives from three INTEGER per-user quantities — N = Σ counts,
# S2 = Σ counts², span = last_hour − first_hour + 1 — so the
# exchange moves integer (user, hour)-count partials and the one
# float expression is structurally identical on both engines.
#   fano = (S2/span − (N/span)²) / (N/span)
# --------------------------------------------------------------------------

_HOUR_US = 3600 * 1_000_000

_BURST_PART_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("hr", pa.int64()), ("cnt", pa.int64())]
)


def q_burstiness(sf_dir: str):
    ds = _read_pq(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hr = ts.astype(np.int64) // _HOUR_US
        g = (
            pd.DataFrame(
                {"user_id": b.column("user_id").to_numpy(zero_copy_only=False), "hr": hr}
            )
            .groupby(["user_id", "hr"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "hr": pa.array(g["hr"].to_numpy(), pa.int64()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out_schema = pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_events", pa.int64()),
                ("span_hours", pa.int64()),
                ("fano", pa.float64()),
            ]
        )
        if df.empty:
            return out_schema.empty_table()
        d = df.groupby(["user_id", "hr"], sort=False, as_index=False)["cnt"].sum()
        d["c2"] = d["cnt"].to_numpy().astype(np.int64) ** 2
        g = d.groupby("user_id", sort=False).agg(
            n=("cnt", "sum"), s2=("c2", "sum"), h0=("hr", "min"), h1=("hr", "max")
        )
        g = g.reset_index()
        n = g["n"].to_numpy().astype(np.float64)
        s2 = g["s2"].to_numpy().astype(np.float64)
        span = (g["h1"] - g["h0"] + 1).to_numpy().astype(np.float64)
        mean = n / span
        fano = (s2 / span - mean * mean) / mean
        return pa.table(
            {
                "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
                "n_events": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "span_hours": pa.array(span.astype(np.int64), pa.int64()),
                "fano": pa.array(_round6_away(fano), pa.float64()),
            }
        )

    return _merge_partials(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key="user_id",
        per_bucket=per_bucket,
        input_schema=_BURST_PART_SCHEMA,
    )


SQL_BURSTINESS = f"""
WITH h AS (SELECT user_id, epoch_us(ts) // {_HOUR_US} AS hr,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1, 2),
g AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(cnt * cnt) AS BIGINT) AS s2,
             max(hr) - min(hr) + 1 AS span
      FROM h GROUP BY user_id)
SELECT user_id, n AS n_events, CAST(span AS BIGINT) AS span_hours,
       round((CAST(s2 AS DOUBLE) / CAST(span AS DOUBLE)
              - (CAST(n AS DOUBLE) / CAST(span AS DOUBLE))
                * (CAST(n AS DOUBLE) / CAST(span AS DOUBLE)))
             / (CAST(n AS DOUBLE) / CAST(span AS DOUBLE)), 6) AS fano
FROM g
"""


QUERIES = {
    "extract_transcripts": q_extract_transcripts,
    "page_render": q_page_render,
    "review_priority": q_review_priority,
    "events_sessionize": q_events_sessionize,
    "filter_project": q_filter_project,
    "agg_rollup": q_agg_rollup,
    "join_broadcast": q_join_broadcast,
    "join_hash": q_join_hash,
    "sort_topk": q_sort_topk,
    "dedup_exact": q_dedup_exact,
    "dedup_latest": q_dedup_latest,
    "refs_regex": q_refs_regex,
    "token_count": q_token_count,
    "sample_det": q_sample_det,
    "window_tumbling": q_window_tumbling,
    "window_session": q_window_session,
    "window_sliding": q_window_sliding,
    "rollup_multi": q_rollup_multi,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q12": q_tpch_q12,
    "distinct_sources": q_distinct_sources,
    "distinct_per_group": q_distinct_per_group,
    "topk_per_group": q_topk_per_group,
    "anti_join": q_anti_join,
    "anti_join_shuffle": q_anti_join_shuffle,
    "approx_distinct": q_approx_distinct,
    "approx_distinct_grouped": q_approx_distinct_grouped,
    "ann_bruteforce": q_ann_bruteforce,
    "ann_ivf": q_ann_ivf,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frames": q_multimodal_frames,
    "langid": q_langid,
    "quality": q_quality,
    "minhash_pairs": q_minhash_pairs,
    "minhash_dedup": q_minhash_dedup,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embed_neardup": q_embed_neardup,
    "embed_dedup": q_embed_dedup,
    "semi_join": q_semi_join,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "percentiles": q_percentiles,
    "vocab_topk": q_vocab_topk,
    "funnel": q_funnel,
    "corr_stats": q_corr_stats,
    "pivot_events": q_pivot_events,
    "tfidf_topk": q_tfidf_topk,
    "bloom_semi_join": q_bloom_semi_join,
    "cohort_retention": q_cohort_retention,
    "approx_percentiles": q_approx_percentiles,
    "kmeans": q_kmeans,
    "pii_redact": q_pii_redact,
    "chunk_docs": q_chunk_docs,
    "decontaminate": q_decontaminate,
    "rank_window": q_rank_window,
    "sample_stratified": q_sample_stratified,
    "repetition": q_repetition,
    "zscore": q_zscore,
    "group_concat": q_group_concat,
    "semdedup": q_semdedup,
    "outer_join": q_outer_join,
    "cube": q_cube,
    "shuffle_export": q_shuffle_export,
    "heavy_hitters": q_heavy_hitters,
    "ntile": q_ntile,
    "transitions": q_transitions,
    "set_ops": q_set_ops,
    "props_extract": q_props_extract,
    "grouped_mode": q_grouped_mode,
    "pack_sequences": q_pack_sequences,
    "quantile_filter": q_quantile_filter,
    "group_entropy": q_group_entropy,
    "train_split": q_train_split,
    "winsorize": q_winsorize,
    "running_total": q_running_total,
    "mad": q_mad,
    "iqr_outliers": q_iqr_outliers,
    "dedup_consecutive": q_dedup_consecutive,
    "sample_weighted": q_sample_weighted,
    "bigram_topk": q_bigram_topk,
    "tpch_q6": q_tpch_q6,
    "active_days_dist": q_active_days_dist,
    "percentile_rank": q_percentile_rank,
    "gap_stats": q_gap_stats,
    "window_distinct": q_window_distinct,
    "moving_avg": q_moving_avg,
    "first_last": q_first_last,
    "dup_spans": q_dup_spans,
    "grouped_regression": q_grouped_regression,
    "dedup_normalized": q_dedup_normalized,
    "exists_join": q_exists_join,
    "ship_priority": q_ship_priority,
    "sssp_weighted": q_sssp_weighted,
    "holt_linear": q_holt_linear,
    "capped_running_sum": q_capped_running_sum,
    "anagram_groups": q_anagram_groups,
    "ols_multi": q_ols_multi,
    "markov_stationary": q_markov_stationary,
    "group_lcp": q_group_lcp,
    "funnel3_strict": q_funnel3_strict,
    "type_runs": q_type_runs,
    "multitouch_attribution": q_multitouch_attribution,
    "heavy_hitters_exact": q_heavy_hitters_exact,
    "topk_join": q_topk_join,
    "type_jaccard": q_type_jaccard,
    "char_trigrams": q_char_trigrams,
    "cohort_ltv": q_cohort_ltv,
    "sample_apportion": q_sample_apportion,
    "source_shingle_overlap": q_source_shingle_overlap,
    "burstiness": q_burstiness,
    "bm25_topk": q_bm25_topk,
    "join_salted": q_join_salted,
    "source_quota": q_source_quota,
    "dup_count_dist": q_dup_count_dist,
    "skew_kurt": q_skew_kurt,
    "dedup_keep_longest": q_dedup_keep_longest,
    "dod_change": q_dod_change,
    "graph_components": q_graph_components,
    "triangle_count": q_triangle_count,
    "degree_dist": q_degree_dist,
    "edge_jaccard": q_edge_jaccard,
    "copurchase_pairs": q_copurchase_pairs,
    "order_reconcile": q_order_reconcile,
    "resample_daily": q_resample_daily,
    "dbscan": q_dbscan,
    "kll_quantiles": q_kll_quantiles,
    "rolling_anomaly": q_rolling_anomaly,
    "welch_t": q_welch_t,
    "contained_dedup": q_contained_dedup,
    "mixture_weights": q_mixture_weights,
    "range_window": q_range_window,
    "user_streaks": q_user_streaks,
    "cusum_flags": q_cusum_flags,
    "attribution": q_attribution,
    "bfs_hops": q_bfs_hops,
    "mann_whitney": q_mann_whitney,
    "spearman_x4": q_spearman_x4,
    "kaplan_meier": q_kaplan_meier,
    "locf_fill": q_locf_fill,
    "session_paths": q_session_paths,
    "wow_change": q_wow_change,
    "seasonal_dow": q_seasonal_dow,
    "trailing_spike": q_trailing_spike,
    "rfm_scores": q_rfm_scores,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "percentile_cont": q_percentile_cont,
    "edit_dedup": q_edit_dedup,
    "fuzzy_join": q_fuzzy_join,
    "scd2_intervals": q_scd2_intervals,
    "corr_matrix": q_corr_matrix,
    "compression_ratio": q_compression_ratio,
    "clustering_coeff": q_clustering_coeff,
    "k_core": q_k_core,
    "bpe_train": q_bpe_train,
    "trimmed_mean": q_trimmed_mean,
    "unigram_logprob": q_unigram_logprob,
    "lang_balance": q_lang_balance,
    "drawdown": q_drawdown,
    "unpivot_events": q_unpivot_events,
    "embed_norms": q_embed_norms,
    "pareto_front": q_pareto_front,
    "interval_union": q_interval_union,
    "weighted_avg": q_weighted_avg,
    "histogram_2d": q_histogram_2d,
    "pagerank": q_pagerank,
    "time_weighted_avg": q_time_weighted_avg,
    "tpch_q13": q_tpch_q13,
    "tpch_q17": q_tpch_q17,
    "tpch_q10": q_tpch_q10,
    "tpch_q22": q_tpch_q22,
    "tpch_q9": q_tpch_q9,
    "inverted_index": q_inverted_index,
    "pmi_bigrams": q_pmi_bigrams,
    "sentence_stats": q_sentence_stats,
    "tpch_q21": q_tpch_q21,
    "tpch_q7": q_tpch_q7,
    "tpch_q16": q_tpch_q16,
    "tpch_q2": q_tpch_q2,
    "tpch_q8": q_tpch_q8,
    "tpch_q15": q_tpch_q15,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "dup_rate_by_source": q_dup_rate_by_source,
    "zipf_slope": q_zipf_slope,
    "source_overlap": q_source_overlap,
    "tpch_q11": q_tpch_q11,
    "label_centroid_sim": q_label_centroid_sim,
    "lang_kl": q_lang_kl,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_dup_pairs": q_winnow_dup_pairs,
    "gini_by_lang": q_gini_by_lang,
    "ks_sources": q_ks_sources,
    "ttr_by_lang": q_ttr_by_lang,
    "winnow_dedup": q_winnow_dedup,
    "boilerplate_prefixes": q_boilerplate_prefixes,
    "lang_source_mi": q_lang_source_mi,
    "hhi_concentration": q_hhi_concentration,
    "embed_pca": q_embed_pca,
    "profile_columns": q_profile_columns,
    "chi2_lang_source": q_chi2_lang_source,
    "benford_digits": q_benford_digits,
    "autocorr_daily": q_autocorr_daily,
    "gopher_filter": q_gopher_filter,
    "ewma_user": q_ewma_user,
    "jl_projection": q_jl_projection,
    "mmr_diverse": q_mmr_diverse,
    "pretrain_prep": q_pretrain_prep,
    "bootstrap_ci": q_bootstrap_ci,
    "lang_confusion": q_lang_confusion,
    "event_trigrams": q_event_trigrams,
    "winnow_decontaminate": q_winnow_decontaminate,
    "user_growth": q_user_growth,
    "auc_ranksum": q_auc_ranksum,
    "quantile_normalize": q_quantile_normalize,
    "zorder_layout": q_zorder_layout,
    "bigram_logprob": q_bigram_logprob,
    "skew_report": q_skew_report,
    "logreg_irls": q_logreg_irls,
    "bpe_encode": q_bpe_encode,
    "dq_checks": q_dq_checks,
    "extract_numbers": q_extract_numbers,
    "grid_hotspots": q_grid_hotspots,
    "record_highs": q_record_highs,
    "storage_stats": q_storage_stats,
    "embed_quantize": q_embed_quantize,
    "ohlc_candles": q_ohlc_candles,
    "join_size_estimate": q_join_size_estimate,
    "interp_fill": q_interp_fill,
    "mass_coverage": q_mass_coverage,
    "stickiness": q_stickiness,
    "rate_limit_audit": q_rate_limit_audit,
    "smoothed_rate": q_smoothed_rate,
    "conversion_latency": q_conversion_latency,
    "basket_lift": q_basket_lift,
    "degree_assortativity": q_degree_assortativity,
    "peak_concurrency": q_peak_concurrency,
    "spell_suggest": q_spell_suggest,
    "decay_engagement": q_decay_engagement,
    "table_checksum": q_table_checksum,
    "weighted_median": q_weighted_median,
    "robust_outliers": q_robust_outliers,
    "entity_overlap": q_entity_overlap,
    "simpson_diversity": q_simpson_diversity,
    "median_ci": q_median_ci,
    "data_freshness": q_data_freshness,
    "new_vs_returning": q_new_vs_returning,
    "value_deciles": q_value_deciles,
    "compaction_plan": q_compaction_plan,
    "psi_drift": q_psi_drift,
    "js_divergence": q_js_divergence,
}

ORACLES = {
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "filter_project": SQL_FILTER_PROJECT,
    "agg_rollup": SQL_AGG_ROLLUP,
    "join_broadcast": SQL_JOIN_BROADCAST,
    "join_hash": SQL_JOIN_HASH,
    "sort_topk": SQL_SORT_TOPK,
    "dedup_exact": SQL_DEDUP_EXACT,
    "dedup_latest": SQL_DEDUP_LATEST,
    "refs_regex": SQL_REFS_REGEX,
    "token_count": SQL_TOKEN_COUNT,
    "sample_det": SQL_SAMPLE_DET,
    "window_tumbling": SQL_WINDOW_TUMBLING,
    "window_session": SQL_WINDOW_SESSION,
    "window_sliding": SQL_WINDOW_SLIDING,
    "rollup_multi": SQL_ROLLUP_MULTI,
    "tpch_q1": SQL_TPCH_Q1,
    "tpch_q3": SQL_TPCH_Q3,
    "tpch_q4": SQL_TPCH_Q4,
    "tpch_q5": SQL_TPCH_Q5,
    "tpch_q12": SQL_TPCH_Q12,
    "distinct_sources": SQL_DISTINCT_SOURCES,
    "distinct_per_group": SQL_DISTINCT_PER_GROUP,
    "topk_per_group": SQL_TOPK_PER_GROUP,
    "anti_join": SQL_ANTI_JOIN,
    "anti_join_shuffle": SQL_ANTI_JOIN,
    "semi_join": SQL_SEMI_JOIN,
    "asof_join": SQL_ASOF_JOIN,
    "range_join": SQL_RANGE_JOIN,
    "percentiles": SQL_PERCENTILES,
    "vocab_topk": SQL_VOCAB_TOPK,
    "funnel": SQL_FUNNEL,
    "ann_bruteforce": SQL_ANN_BRUTEFORCE,
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
    "langid": SQL_LANGID
    % {lang: _sw_sql(lang) for lang in ("de", "en", "es", "fr", "zh")},
    "quality": SQL_QUALITY % {"en": _sw_sql("en")},
    "corr_stats": SQL_CORR_STATS,
    "pivot_events": SQL_PIVOT_EVENTS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
    "cohort_retention": SQL_COHORT_RETENTION,
    "approx_percentiles": SQL_APPROX_PERCENTILES,
    "pii_redact": SQL_PII_REDACT,
    "chunk_docs": SQL_CHUNK_DOCS,
    "decontaminate": SQL_DECONTAMINATE,
    "rank_window": SQL_RANK_WINDOW,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "repetition": SQL_REPETITION,
    "zscore": SQL_ZSCORE,
    "group_concat": SQL_GROUP_CONCAT,
    "outer_join": SQL_OUTER_JOIN,
    "cube": SQL_CUBE,
    "shuffle_export": SQL_SHUFFLE_EXPORT,
    "ntile": SQL_NTILE,
    "transitions": SQL_TRANSITIONS,
    "set_ops": SQL_SET_OPS,
    "props_extract": SQL_PROPS_EXTRACT,
    "grouped_mode": SQL_GROUPED_MODE,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "quantile_filter": SQL_QUANTILE_FILTER,
    "group_entropy": SQL_GROUP_ENTROPY,
    "train_split": SQL_TRAIN_SPLIT,
    "winsorize": SQL_WINSORIZE,
    "running_total": SQL_RUNNING_TOTAL,
    "mad": SQL_MAD,
    "iqr_outliers": SQL_IQR_OUTLIERS,
    "dedup_consecutive": SQL_DEDUP_CONSECUTIVE,
    "sample_weighted": SQL_SAMPLE_WEIGHTED,
    "bigram_topk": SQL_BIGRAM_TOPK,
    "tpch_q6": SQL_TPCH_Q6,
    "active_days_dist": SQL_ACTIVE_DAYS_DIST,
    "percentile_rank": SQL_PERCENTILE_RANK,
    "gap_stats": SQL_GAP_STATS,
    "window_distinct": SQL_WINDOW_DISTINCT,
    "moving_avg": SQL_MOVING_AVG,
    "first_last": SQL_FIRST_LAST,
    "dup_spans": SQL_DUP_SPANS,
    "grouped_regression": SQL_GROUPED_REGRESSION,
    "dedup_normalized": SQL_DEDUP_NORMALIZED,
    "exists_join": SQL_EXISTS_JOIN,
    "ship_priority": SQL_SHIP_PRIORITY,
    "bm25_topk": SQL_BM25_TOPK,
    "join_salted": SQL_JOIN_SALTED,
    "source_quota": SQL_SOURCE_QUOTA,
    "dup_count_dist": SQL_DUP_COUNT_DIST,
    "skew_kurt": SQL_SKEW_KURT,
    "dedup_keep_longest": SQL_DEDUP_KEEP_LONGEST,
    "dod_change": SQL_DOD_CHANGE,
    "graph_components": SQL_GRAPH_COMPONENTS,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "degree_dist": SQL_DEGREE_DIST,
    "edge_jaccard": SQL_EDGE_JACCARD,
    "copurchase_pairs": SQL_COPURCHASE_PAIRS,
    "order_reconcile": SQL_ORDER_RECONCILE,
    "resample_daily": SQL_RESAMPLE_DAILY,
    "rolling_anomaly": SQL_ROLLING_ANOMALY,
    "welch_t": SQL_WELCH_T,
    "contained_dedup": SQL_CONTAINED_DEDUP,
    "mixture_weights": SQL_MIXTURE_WEIGHTS,
    "range_window": SQL_RANGE_WINDOW,
    "user_streaks": SQL_USER_STREAKS,
    "cusum_flags": SQL_CUSUM_FLAGS,
    "attribution": SQL_ATTRIBUTION,
    "bfs_hops": SQL_BFS_HOPS,
    "mann_whitney": SQL_MANN_WHITNEY,
    "spearman_x4": SQL_SPEARMAN_X4,
    "kaplan_meier": SQL_KAPLAN_MEIER,
    "locf_fill": SQL_LOCF_FILL,
    "session_paths": SQL_SESSION_PATHS,
    "wow_change": SQL_WOW_CHANGE,
    "seasonal_dow": SQL_SEASONAL_DOW,
    "trailing_spike": SQL_TRAILING_SPIKE,
    "rfm_scores": SQL_RFM_SCORES,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q18": SQL_TPCH_Q18,
    "percentile_cont": SQL_PERCENTILE_CONT,
    "edit_dedup": SQL_EDIT_DEDUP,
    "fuzzy_join": SQL_FUZZY_JOIN,
    "scd2_intervals": SQL_SCD2_INTERVALS,
    "corr_matrix": SQL_CORR_MATRIX,
    "clustering_coeff": SQL_CLUSTERING_COEFF,
    "trimmed_mean": SQL_TRIMMED_MEAN,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "lang_balance": SQL_LANG_BALANCE,
    "drawdown": SQL_DRAWDOWN,
    "unpivot_events": SQL_UNPIVOT_EVENTS,
    "embed_norms": SQL_EMBED_NORMS,
    "pareto_front": SQL_PARETO_FRONT,
    "interval_union": SQL_INTERVAL_UNION,
    "weighted_avg": SQL_WEIGHTED_AVG,
    "histogram_2d": SQL_HISTOGRAM_2D,
    "pagerank": SQL_PAGERANK,
    "time_weighted_avg": SQL_TIME_WEIGHTED_AVG,
    "tpch_q13": SQL_TPCH_Q13,
    "tpch_q17": SQL_TPCH_Q17,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q22": SQL_TPCH_Q22,
    "tpch_q9": SQL_TPCH_Q9,
    "inverted_index": SQL_INVERTED_INDEX,
    "pmi_bigrams": SQL_PMI_BIGRAMS,
    "sentence_stats": SQL_SENTENCE_STATS,
    "tpch_q21": SQL_TPCH_Q21,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q16": SQL_TPCH_Q16,
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q19": SQL_TPCH_Q19,
    "tpch_q20": SQL_TPCH_Q20,
    "dup_rate_by_source": SQL_DUP_RATE_BY_SOURCE,
    "zipf_slope": SQL_ZIPF_SLOPE,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "tpch_q11": SQL_TPCH_Q11,
    "label_centroid_sim": SQL_LABEL_CENTROID_SIM,
    "lang_kl": SQL_LANG_KL,
    "winnow_fingerprints": SQL_WINNOW_FINGERPRINTS,
    "winnow_dup_pairs": SQL_WINNOW_DUP_PAIRS,
    "gini_by_lang": SQL_GINI_BY_LANG,
    "ks_sources": SQL_KS_SOURCES,
    "ttr_by_lang": SQL_TTR_BY_LANG,
    "winnow_dedup": SQL_WINNOW_DEDUP,
    "boilerplate_prefixes": SQL_BOILERPLATE_PREFIXES,
    "lang_source_mi": SQL_LANG_SOURCE_MI,
    "hhi_concentration": SQL_HHI_CONCENTRATION,
    "profile_columns": SQL_PROFILE_COLUMNS,
    "chi2_lang_source": SQL_CHI2_LANG_SOURCE,
    "benford_digits": SQL_BENFORD_DIGITS,
    "autocorr_daily": SQL_AUTOCORR_DAILY,
    "gopher_filter": SQL_GOPHER_FILTER,
    "ewma_user": SQL_EWMA_USER,
    "pretrain_prep": SQL_PRETRAIN_PREP,
    "lang_confusion": SQL_LANG_CONFUSION
    % {lang: _sw_sql(lang) for lang in ("de", "en", "es", "fr", "zh")},
    "event_trigrams": SQL_EVENT_TRIGRAMS,
    "winnow_decontaminate": SQL_WINNOW_DECONTAMINATE,
    "user_growth": SQL_USER_GROWTH,
    "auc_ranksum": SQL_AUC_RANKSUM,
    "quantile_normalize": SQL_QUANTILE_NORMALIZE,
    "zorder_layout": SQL_ZORDER_LAYOUT,
    "bigram_logprob": SQL_BIGRAM_LOGPROB,
    "skew_report": SQL_SKEW_REPORT,
    "dq_checks": SQL_DQ_CHECKS,
    "extract_numbers": SQL_EXTRACT_NUMBERS,
    "grid_hotspots": SQL_GRID_HOTSPOTS,
    "record_highs": SQL_RECORD_HIGHS,
    "ohlc_candles": SQL_OHLC_CANDLES,
    "join_size_estimate": SQL_JOIN_SIZE_ESTIMATE,
    "interp_fill": SQL_INTERP_FILL,
    "mass_coverage": SQL_MASS_COVERAGE,
    "stickiness": SQL_STICKINESS,
    "rate_limit_audit": SQL_RATE_LIMIT_AUDIT,
    "smoothed_rate": SQL_SMOOTHED_RATE,
    "conversion_latency": SQL_CONVERSION_LATENCY,
    "basket_lift": SQL_BASKET_LIFT,
    "degree_assortativity": SQL_DEGREE_ASSORTATIVITY,
    "peak_concurrency": SQL_PEAK_CONCURRENCY,
    "spell_suggest": SQL_SPELL_SUGGEST,
    "decay_engagement": SQL_DECAY_ENGAGEMENT,
    "table_checksum": SQL_TABLE_CHECKSUM,
    "weighted_median": SQL_WEIGHTED_MEDIAN,
    "robust_outliers": SQL_ROBUST_OUTLIERS,
    "entity_overlap": SQL_ENTITY_OVERLAP,
    "simpson_diversity": SQL_SIMPSON_DIVERSITY,
    "median_ci": SQL_MEDIAN_CI,
    "data_freshness": SQL_DATA_FRESHNESS,
    "new_vs_returning": SQL_NEW_VS_RETURNING,
    "value_deciles": SQL_VALUE_DECILES,
    "psi_drift": SQL_PSI_DRIFT,
    "js_divergence": SQL_JS_DIVERGENCE,
    "sssp_weighted": SQL_SSSP_WEIGHTED,
    "holt_linear": SQL_HOLT_LINEAR,
    "capped_running_sum": SQL_CAPPED_RUNNING_SUM,
    "anagram_groups": SQL_ANAGRAM_GROUPS,
    "ols_multi": SQL_OLS_MULTI,
    "markov_stationary": SQL_MARKOV_STATIONARY,
    "group_lcp": SQL_GROUP_LCP,
    "funnel3_strict": SQL_FUNNEL3_STRICT,
    "type_runs": SQL_TYPE_RUNS,
    "multitouch_attribution": SQL_MULTITOUCH_ATTRIBUTION,
    "heavy_hitters_exact": SQL_HEAVY_HITTERS_EXACT,
    "topk_join": SQL_TOPK_JOIN,
    "type_jaccard": SQL_TYPE_JACCARD,
    "char_trigrams": SQL_CHAR_TRIGRAMS,
    "cohort_ltv": SQL_COHORT_LTV,
    "sample_apportion": SQL_SAMPLE_APPORTION,
    "source_shingle_overlap": SQL_SOURCE_SHINGLE_OVERLAP,
    "burstiness": SQL_BURSTINESS,
}


def _sql_flagship_golden(filename: str, cols: str) -> str:
    """Oracle over a frozen flagship golden parquet.

    The flagship trio runs over the deterministic seed-42 transcript
    lake, so its output is a pure function of the scale factor.  The
    goldens are computed SEQUENTIALLY (single-threaded
    ``oracle.oracle_extract`` + the pure per-batch kernels — see
    scripts/make_flagship_golden.py), never by the Ray engine, so the
    driver's hash-compare against them verifies the distributed
    orchestration.  The ``_sf`` slice is picked by sniffing the row
    count of the driver-registered ``orders`` view (1.5k / 15k / 150k
    at sf0.001 / sf0.01 / sf0.1)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
        "golden",
        filename,
    )
    return f"""
    SELECT {cols}
    FROM read_parquet('{path}')
    WHERE _sf = (
        SELECT CASE WHEN count(*) < 5000 THEN 'sf0.001'
                    WHEN count(*) < 50000 THEN 'sf0.01'
                    ELSE 'sf0.1' END
        FROM orders)
    """


ORACLES["extract_transcripts"] = _sql_flagship_golden(
    "flagship_extracted.parquet", "conv_id, turn_idx, unit_id, extracted_text"
)
ORACLES["review_priority"] = _sql_flagship_golden(
    "flagship_review_priority.parquet", "review_priority, n"
)
ORACLES["page_render"] = _sql_flagship_golden(
    "flagship_page_render.parquet", "conv_id, n_pages, png_bytes"
)

# The driver's correctness gate checks the FIRST 50 ``queries()``
# entries; keep every oracled operator ahead of the sketch/iterative
# ops (HLL, LSH pairs, k-means, PCA, ...) whose contracts are
# approximation properties pinned by pytest, not SQL-expressible
# equalities.  Stable partition: relative order unchanged within each
# class, flagship trio (now golden-oracled) stays on top.
QUERIES = {
    **{n: QUERIES[n] for n in QUERIES if n in ORACLES},
    **{n: QUERIES[n] for n in QUERIES if n not in ORACLES},
}
