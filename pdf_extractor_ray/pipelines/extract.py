"""Flagship extraction pipeline (reference `extract` entry point,
/root/reference/src/cli.py:17-130 + src/pipeline.py:149-363, rebuilt
Ray-Data-first per SURVEY §3.4):

    read_parquet(lake)                         # pruned columns
      → map_batches(TurnExtractor actor pool)  # per-turn parse, raw text dropped
      → groupby(conv_id).map_groups(...)       # stitch + resolve (THE shuffle)
      → sort(conv_id, turn_idx, parsed id)     # stable output ordering (O1)
      → write_parquet + per-partition manifests

Streaming end-to-end: nothing materializes the full dataset; the only
wide operations are the conv_id hash shuffle and the final ordering
sort (optional for throughput runs).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, DEFAULT_RUN, ExtractorConfig, RunConfig
from ..sources.transcripts import lake_files, read_transcripts
from ..stages.conversation import stitch_conversations
from ..stages.turn_extract import TurnExtractor
from ..state import manifest as mf


def _default_concurrency() -> int:
    """Fixed actor-pool size = CPUs - 1: a pool reserving every CPU
    starves the read/shuffle tasks (pipeline serializes); autoscaling
    pools ramp too slowly and leave the stage effectively serial
    (measured: (1,8) → 5.8s vs fixed 7 → 2.9s on the sf0.01 bench
    lake)."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus - 1)


def add_sort_keys(batch: pa.Table) -> pa.Table:
    """Derived numeric sort-key columns from unit_id (reference
    parse_qa_id, /root/reference/src/pipeline.py:92-127) so the global
    sort orders 2.9 < 2.10 and 2.18 < 2.18a.

    Arrow-native twin of ``functions.ids.parse_unit_id`` ("2.18a" →
    (2, 18, "a"); non-matching ids → (0, 0, raw)) — one
    ``extract_regex`` kernel call instead of a Python loop per row."""
    ids = batch.column("unit_id")
    ex = pc.extract_regex(
        pc.utf8_trim_whitespace(ids),
        r"^(?P<ch>\d+)\.(?P<q>\d+)(?P<sfx>[a-z]*)$",
    )
    valid = ex.is_valid()
    zero = pa.scalar(0, pa.int32())
    chapter = pc.if_else(valid, pc.struct_field(ex, "ch").cast(pa.int32()), zero)
    qnum = pc.if_else(valid, pc.struct_field(ex, "q").cast(pa.int32()), zero)
    suffix = pc.if_else(valid, pc.struct_field(ex, "sfx"), ids)
    return (
        batch.append_column("_chapter", chapter)
        .append_column("_qnum", qnum)
        .append_column("_suffix", suffix)
    )


def max_conversation_turns(source: str | list[str] | ray.data.Dataset) -> int:
    """Metadata pre-pass: the largest conversation's turn count.

    Reads ONLY the conv_id column; per-batch partial counts compress
    the shuffle to ~one row per (conversation, batch) — the
    pre-aggregation pattern — so this costs a tiny fraction of the
    extraction run even at lake scale."""
    from ray.data.aggregate import Sum

    if isinstance(source, ray.data.Dataset):
        ds = source.select_columns(["conv_id"])
    else:
        ds = read_transcripts(source, columns=("conv_id",))

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("conv_id"))
        return pa.table(
            {
                "conv_id": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n", alias_name="n"))
    )
    return int(out.max("n"))


def extraction_pipeline(
    source: str | list[str] | ray.data.Dataset,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    run: RunConfig = DEFAULT_RUN,
    *,
    salt_turns: int | None = None,
    auto_salt_threshold: int | None = None,
    global_sort: bool = False,
) -> ray.data.Dataset:
    """Build the (lazy) extraction Dataset from a lake path / file list
    / pre-built Dataset.

    Ordering: the reference's output sort (O1, pipeline.py:116-127) is
    per-document and is applied inside each conversation by the stitch
    stage (parallel, no extra shuffle).  ``global_sort=True`` adds a
    total order across conversations via a range-partitioned ``sort``
    — an all-to-all that is only needed when a single globally-sorted
    artifact is required.

    Skew: pass ``salt_turns`` to force the salted-shard stitch, or
    ``auto_salt_threshold=T`` to run the metadata pre-pass
    (``max_conversation_turns``) and engage salting with W=T only when
    some conversation exceeds T turns — mega-conversation mitigation
    that costs nothing on well-behaved lakes."""
    if isinstance(source, ray.data.Dataset):
        ds = source
        est_bytes = None  # unknown size → conservative sort shuffle
    else:
        ds = read_transcripts(source)
        try:  # lake size drives the size-aware shuffle-strategy choice
            files = lake_files(source) if isinstance(source, str) else list(source)
            est_bytes = sum(os.path.getsize(f) for f in files)
        except OSError:
            est_bytes = None

    if salt_turns is None and auto_salt_threshold:
        if max_conversation_turns(source) > auto_salt_threshold:
            salt_turns = auto_salt_threshold

    if run.use_actor_pool:
        ds = ds.map_batches(
            TurnExtractor,
            fn_constructor_kwargs={"cfg": cfg},
            batch_size=run.batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=run.extract_concurrency or _default_concurrency(),
            num_cpus=run.num_cpus_per_actor,
        )
    else:
        extractor = TurnExtractor(cfg)  # warm state shipped once per worker

        def extract_fn(batch: pa.Table) -> pa.Table:
            return extractor(batch)

        ds = ds.map_batches(
            extract_fn,
            batch_size=run.batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    ds = stitch_conversations(ds, salt_turns=salt_turns, est_bytes=est_bytes)

    if global_sort:
        ds = ds.map_batches(add_sort_keys, batch_format="pyarrow")
        ds = ds.sort(["conv_id", "_chapter", "_qnum", "_suffix", "turn_idx"])
        ds = ds.drop_columns(["_chapter", "_qnum", "_suffix"])
    return ds


def run_with_checkpoint(
    lake_path: str,
    out_dir: str,
    *,
    num_partitions: int = 4,
    force_restart: bool = False,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    run: RunConfig = DEFAULT_RUN,
    salt_turns: int | None = None,
) -> dict:
    """Resumable run: lake files → ``num_partitions`` groups; each
    group is one streaming pipeline whose output lands atomically with
    a manifest (state/manifest.py).  A re-run skips partitions whose
    lineage matches — zero reprocessing (reference resume semantics,
    /root/reference/src/pipeline.py:185-211, partition-granular).

    Conversations must not span lake files (the conv-partitioned
    layout ``datagen.write_lake`` produces; any production lake
    bucketed by conv hash satisfies this).
    """
    files = lake_files(lake_path)
    config_tag = f"v1|salt={salt_turns}|{cfg.html_min_block_chars}|{cfg.html_max_link_ratio}"
    partitions = [files[i::num_partitions] for i in range(num_partitions)]
    partitions = [p for p in partitions if p]

    if force_restart:
        mf.clear_checkpoints(out_dir)
    done = mf.completed_partitions(out_dir, partitions, config_tag)

    stats = {"partitions": len(partitions), "skipped": sorted(done), "ran": []}
    for pid, part_files in enumerate(partitions):
        if pid in done:
            continue
        t0 = time.monotonic()
        ds = extraction_pipeline(
            part_files, cfg, run, salt_turns=salt_turns
        )
        tmp_dir = f"{out_dir}/.tmp-partition={pid:05d}"
        ds.write_parquet(tmp_dir)  # streaming consume — no materialize
        row_count = count_parquet_rows(tmp_dir)
        # per-stage metrics (north-rule "per-stage throughput"): Ray's
        # per-operator wall/CPU breakdown for THIS partition's run,
        # persisted beside the manifests for post-hoc scaling analysis
        try:
            stats_dir = os.path.join(out_dir, "_stats")
            os.makedirs(stats_dir, exist_ok=True)
            with open(os.path.join(stats_dir, f"partition={pid:05d}.txt"), "w") as f:
                f.write(ds.stats())
        except Exception:  # stats are advisory — never fail the run
            pass
        mf.atomic_partition_swap(tmp_dir, out_dir, pid)
        mf.write_manifest(
            out_dir,
            mf.PartitionManifest(
                partition_id=pid,
                lineage_id=mf.lineage_id(part_files, config_tag),
                input_files=part_files,
                row_count=row_count,
                bytes_out=sum_parquet_bytes(mf.partition_dir(out_dir, pid)),
                wall_ms=(time.monotonic() - t0) * 1000.0,
                completed_at=time.time(),
            ),
        )
        stats["ran"].append(pid)
        dt = time.monotonic() - t0
        stats.setdefault("rows_per_sec", {})[pid] = round(row_count / dt, 1) if dt else 0.0
    return stats


def count_parquet_rows(d: str) -> int:
    """Row count from parquet footers only — no data scan."""
    import os

    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, names in os.walk(d):
        for n in names:
            if n.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, n)).num_rows
    return total


def sum_parquet_bytes(d: str) -> int:
    import os

    total = 0
    for root, _dirs, names in os.walk(d):
        total += sum(
            os.path.getsize(os.path.join(root, n))
            for n in names
            if n.endswith(".parquet")
        )
    return total


def read_extracted(out_dir: str) -> ray.data.Dataset:
    """Reader for the pipeline's partitioned output (reference S14)."""
    import glob
    import os

    from ..sources.scan import scan_parquet

    files = sorted(
        glob.glob(os.path.join(out_dir, "partition=*", "**", "*.parquet"), recursive=True)
    )
    return scan_parquet(files if files else out_dir)
