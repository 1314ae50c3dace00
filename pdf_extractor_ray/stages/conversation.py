"""Conversation-level stage: the conv_id shuffle + stitch/resolve.

Plain path (default): ONE hash-partition shuffle —
``groupby("conv_id").map_groups(fn, batch_format="pyarrow")`` where
``fn`` sorts the group by ``turn_idx``, deduplicates dirty-lake
duplicate turns (last-write-wins by ``ts``,
/root/reference/src/reviewer.py:251-264 semantics), then runs the
sequential fold + document-order reference resolution
(functions/stitch.py).  Embarrassingly parallel across conversations
(SURVEY §4.3).

Salted path (mega-conversation skew): a conversation is an
unsplittable group for ``map_groups``, so giant conversations are
sharded by ``(conv_id, turn_idx // W)``:

1. ``groupby(shard_key)`` stitches inside each shard, *deferring* the
   shard's leading continuation chain (raw fragments, JSON) and
   exporting its trailing open unit + carried unit-id state;
2. a second ``groupby(conv_id)`` over ONLY the boundary rows (a few
   rows per shard, independent of shard size) replays the fold across
   shard boundaries — chains crossing any number of cuts merge
   exactly as in the plain path;
3. a final ``groupby(conv_id)`` over the (now small, payload-free)
   unit records runs document-order reference resolution.

The skew a shard shuffle can't fix — raw payload bytes concentrated in
one conversation — is gone after step 1, because only extracted unit
text crosses the later shuffles.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..functions.ids import parse_unit_id
from ..functions.segment import Fragment
from ..functions.stitch import (
    FoldState,
    OutputRow,
    TurnInput,
    UnitRecord,
    resolve_conversation,
    stitch_conversation,
)
from ..schema import EXTRACTED_SCHEMA, SPAN_TYPE

# Intermediate schema for the salted path (unit records + boundary rows).
UNIT_RECORD_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("shard", pa.int64()),
        ("head_turn", pa.int32()),
        ("seq", pa.int32()),
        ("last_turn", pa.int32()),
        ("unit_id", pa.string()),
        ("part_id", pa.string()),
        ("question", pa.string()),
        ("answer", pa.string()),
        ("open", pa.bool_()),
        ("continued", pa.bool_()),
        ("parse_error", pa.bool_()),
        ("needs_id", pa.bool_()),
        ("is_boundary", pa.bool_()),
        ("payload_json", pa.string()),  # deferred turns / shard meta
        ("spans", pa.list_(SPAN_TYPE)),
        ("figures", pa.list_(pa.string())),
    ]
)


# --------------------------------------------------------------------------
# Arrow <-> python converters
# --------------------------------------------------------------------------

def _group_to_turns(group: pa.Table) -> list[TurnInput]:
    """Sort a conversation group by (turn_idx, ts) and fold duplicate
    (conv_id, turn_idx) rows last-write-wins by ts."""
    import pickle

    order = [("turn_idx", "ascending")] + (
        [("ts", "ascending")] if "ts" in group.column_names else []
    )
    group = group.sort_by(order)

    turn_idx = group.column("turn_idx").to_pylist()
    payloads = group.column("payload").to_pylist()

    turns: list[TurnInput] = []
    for i in range(len(turn_idx)):
        frags, spans, err = pickle.loads(payloads[i])
        ti = TurnInput(
            turn_idx=turn_idx[i], fragments=frags, spans=spans, parse_error=err
        )
        if turns and turns[-1].turn_idx == ti.turn_idx:
            turns[-1] = ti  # newest wins (rows pre-sorted by ts)
        else:
            turns.append(ti)
    return turns


def _rows_to_table(conv_id: str, rows: list[OutputRow]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([conv_id] * len(rows), type=pa.string()),
            "turn_idx": pa.array([r.turn_idx for r in rows], type=pa.int32()),
            "unit_id": pa.array([r.unit_id for r in rows], type=pa.string()),
            "extracted_text": pa.array(
                [r.extracted_text for r in rows], type=pa.string()
            ),
            "spans": pa.array(
                [
                    [{"start": s, "end": e, "kind": k} for s, e, k in r.spans]
                    for r in rows
                ],
                type=pa.list_(SPAN_TYPE),
            ),
            "turn_span": pa.array(
                [list(r.turn_span) for r in rows], type=pa.list_(pa.int32(), 2)
            ),
            "flags": pa.array(
                [
                    {
                        "continued": r.continued,
                        "resolved": r.resolved,
                        "had_refs": r.had_refs,
                        "parse_error": r.parse_error,
                    }
                    for r in rows
                ],
                type=EXTRACTED_SCHEMA.field("flags").type,
            ),
            "refs_found": pa.array(
                [r.refs_found for r in rows], type=pa.list_(pa.string())
            ),
            "figures": pa.array(
                [r.figures for r in rows], type=pa.list_(pa.string())
            ),
        }
    )


# --------------------------------------------------------------------------
# plain path — explicit hash-bucket shuffle
# --------------------------------------------------------------------------
#
# One map_groups call PER CONVERSATION pays ~ms-level Python overhead
# per group; at transcript-lake scale (huge conversation counts) that
# overhead dwarfs the fold itself.  Instead: bucket = crc32(conv_id)
# % B (deterministic across workers — unlike builtin hash()), ONE
# group call per bucket, conversations iterated inside the bucket over
# a single Arrow→Python conversion.  Output is per-conversation
# deterministic and independent of B.

def conversation_group_fn(group: pa.Table) -> pa.Table:
    """map_groups body: one conversation in, extracted rows out
    (kept for unit tests / direct use)."""
    conv_id = group.column("conv_id")[0].as_py()
    turns = _group_to_turns(group)
    units, _ = stitch_conversation(turns)
    rows = resolve_conversation(units)
    return _rows_to_table(conv_id, rows)


def bucket_group_fn(group: pa.Table) -> pa.Table:
    """map_groups body for one hash bucket: many conversations,
    processed sequentially per conversation within one task."""
    order = [("conv_id", "ascending"), ("turn_idx", "ascending")]
    if "ts" in group.column_names:
        order.append(("ts", "ascending"))
    group = group.sort_by(order)

    import pickle

    conv_ids = group.column("conv_id").to_pylist()
    turn_idx = group.column("turn_idx").to_pylist()
    payloads = group.column("payload").to_pylist()

    out_conv: list[str] = []
    out_rows: list[OutputRow] = []

    n = len(conv_ids)
    start = 0
    while start < n:
        end = start
        cid = conv_ids[start]
        while end < n and conv_ids[end] == cid:
            end += 1
        turns: list[TurnInput] = []
        for i in range(start, end):
            frags, spans, err = pickle.loads(payloads[i])
            ti = TurnInput(
                turn_idx=turn_idx[i], fragments=frags, spans=spans, parse_error=err
            )
            if turns and turns[-1].turn_idx == ti.turn_idx:
                turns[-1] = ti  # duplicate turn: newest (by ts) wins
            else:
                turns.append(ti)
        units, _ = stitch_conversation(turns)
        rows = resolve_conversation(units)
        # Reference output ordering (O1, pipeline.py:116-127) is
        # per-DOCUMENT: within the conversation, parent units before
        # lettered parts, numerically (2.9 < 2.10 < 2.18 < 2.18a);
        # ties (content rows) stay in turn order.
        rows.sort(key=lambda r: (parse_unit_id(r.unit_id), r.turn_idx))
        out_conv.extend([cid] * len(rows))
        out_rows.extend(rows)
        start = end

    return _rows_to_table_multi(out_conv, out_rows)


def _rows_to_table_multi(conv_ids: list[str], rows: list[OutputRow]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array([r.turn_idx for r in rows], type=pa.int32()),
            "unit_id": pa.array([r.unit_id for r in rows], type=pa.string()),
            "extracted_text": pa.array(
                [r.extracted_text for r in rows], type=pa.string()
            ),
            "spans": pa.array(
                [
                    [{"start": s, "end": e, "kind": k} for s, e, k in r.spans]
                    for r in rows
                ],
                type=pa.list_(SPAN_TYPE),
            ),
            "turn_span": pa.array(
                [list(r.turn_span) for r in rows], type=pa.list_(pa.int32(), 2)
            ),
            "flags": pa.array(
                [
                    {
                        "continued": r.continued,
                        "resolved": r.resolved,
                        "had_refs": r.had_refs,
                        "parse_error": r.parse_error,
                    }
                    for r in rows
                ],
                type=EXTRACTED_SCHEMA.field("flags").type,
            ),
            "refs_found": pa.array(
                [r.refs_found for r in rows], type=pa.list_(pa.string())
            ),
            "figures": pa.array(
                [r.figures for r in rows], type=pa.list_(pa.string())
            ),
        }
    )


def _default_num_buckets() -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(8, cpus * 2)


def add_bucket_column(num_buckets: int):
    import zlib

    def _add(batch: pa.Table) -> pa.Table:
        ids = batch.column("conv_id").to_pylist()
        buckets = [zlib.crc32(s.encode()) % num_buckets for s in ids]
        return batch.append_column("_bucket", pa.array(buckets, pa.int32()))

    return _add


#: Exchange sizes above this engage the hash-shuffle strategy
#: automatically (compressed input bytes as the proxy).  Measured on
#: the 10× lake (873 MB, 2.11 M turns, 32 CPUs): sort 405.8 s vs hash
#: 146.9 s — sort's range materialization degrades superlinearly once
#: the exchange outgrows memory comfort, while hash streams.  Below it
#: (sf0.1 = 89 MB) sort wins under this sandbox's CPU throttling (see
#: docstring).  Env-tunable for other clusters.
HASH_SHUFFLE_MIN_BYTES = int(
    os.environ.get("GRAFT_HASH_SHUFFLE_MIN_BYTES", 256 << 20)
)


def _prefer_hash_shuffle(ds, est_bytes: int | None = None) -> None:
    """Configure the conv/bucket exchange's shuffle strategy.

    DATA-SIZE-AWARE default: sort-based shuffle for small exchanges,
    hash-based above ``HASH_SHUFFLE_MIN_BYTES`` of (compressed) input.

    Why not one answer: A/B on the sf0.1 bench lake (89 MB), 6
    alternating trials per arm @32 CPUs: sort 19.8–23.7 s (mean 21.6)
    vs hash-shuffle 24.9–47.1 s (mean 31.8; mean 24.7 after giving
    each aggregator a full CPU via ``hash_shuffle_operator_actor_num_
    cpus_per_partition_override``) — the hash aggregator ACTORS are
    the first thing the sandbox's CPU throttling starves (observed
    844 s of aggregate send wall for a 280 MB exchange), while sort's
    plain tasks degrade gracefully.  But at 10× the data (873 MB,
    2.11 M turns) the ranking INVERTS hard: sort 405.8 s vs hash
    146.9 s — sort pays range materialization that grows superlinearly
    with exchange size, hash streams.  Small → robust sort; large →
    scalable hash; at 100 TB every exchange is "large".

    Overrides: ``GRAFT_HASH_SHUFFLE=1`` forces hash, ``=0`` forces
    sort, regardless of size.

    Hash sizing when engaged: aggregators = cpus/4 (the 16 default
    deadlocks successive shuffles on small clusters because finished
    datasets' aggregators linger); partitions = 2×cpus, not the 200
    default; a FULL CPU per aggregator (the stabilizer).

    Scoped to THIS pipeline: datasets snapshot a DataContext copy at
    creation (read_api passes ``DataContext.get_current().copy()``), so
    mutating ``ds.context`` before deriving the groupby affects only
    datasets built from ``ds`` — the session-global context and
    unrelated datasets keep their shuffle behavior."""
    override = os.environ.get("GRAFT_HASH_SHUFFLE")
    if override == "0":
        return  # forced sort
    if override != "1" and (est_bytes is None or est_bytes < HASH_SHUFFLE_MIN_BYTES):
        return  # small exchange (or unknown size): sort-based shuffle
    try:
        import ray
        from ray.data.context import ShuffleStrategy

        ctx = ds.context
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        ctx.max_hash_shuffle_aggregators = max(2, cpus // 4)
        ctx.default_hash_shuffle_parallelism = max(16, cpus * 2)
        # partitions/aggregator × 0.125 = 1.0 CPU per aggregator actor
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.125
    except (ImportError, AttributeError):  # older Ray: keep sort shuffle
        pass


def stitch_conversations(
    ds,
    *,
    salt_turns: int | None = None,
    num_buckets: int | None = None,
    est_bytes: int | None = None,
):
    """The wide step.  ``ds`` is the turn-extraction output (schema
    TURN_EXTRACTED + optional ts column).  Returns extracted rows.
    ``est_bytes`` (compressed input size, from the lake's file sizes)
    drives the size-aware shuffle-strategy choice."""
    _prefer_hash_shuffle(ds, est_bytes)
    if salt_turns:
        return _stitch_salted(ds, salt_turns)
    b = num_buckets or _default_num_buckets()
    return (
        ds.map_batches(add_bucket_column(b), batch_format="pyarrow")
        .groupby("_bucket", num_partitions=b)
        .map_groups(bucket_group_fn, batch_format="pyarrow")
    )


# --------------------------------------------------------------------------
# salted path
# --------------------------------------------------------------------------

def _frag_to_dict(f: Fragment) -> dict:
    return {
        "kind": f.kind,
        "unit_id": f.unit_id,
        "part_id": f.part_id,
        "question": f.question,
        "answer": f.answer,
        "continues_next": f.continues_next,
        "continued_prev": f.continued_prev,
        "figures": list(f.figures),
    }


def _unit_to_row(conv_id: str, shard: int, u: UnitRecord, is_boundary: bool) -> dict:
    return {
        "conv_id": conv_id,
        "shard": shard,
        "head_turn": u.head_turn,
        "seq": u.seq,
        "last_turn": u.last_turn,
        "unit_id": u.unit_id,
        "part_id": u.part_id,
        "question": u.question,
        "answer": u.answer,
        "open": u.open,
        "continued": u.continued,
        "parse_error": u.parse_error,
        "needs_id": u.needs_id,
        "is_boundary": is_boundary,
        "payload_json": "",
        "spans": [{"start": s, "end": e, "kind": k} for s, e, k in u.spans],
        "figures": list(u.figures),
    }


def _row_to_unit(r: dict) -> UnitRecord:
    return UnitRecord(
        unit_id=r["unit_id"],
        part_id=r["part_id"],
        question=r["question"],
        answer=r["answer"],
        head_turn=r["head_turn"],
        last_turn=r["last_turn"],
        seq=r["seq"],
        open=r["open"],
        continued=r["continued"],
        parse_error=r["parse_error"],
        needs_id=r["needs_id"],
        spans=[(s["start"], s["end"], s["kind"]) for s in (r["spans"] or [])],
        figures=list(r["figures"] or []),
    )


def _records_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return UNIT_RECORD_SCHEMA.empty_table()
    cols = {
        f.name: pa.array([r[f.name] for r in rows], type=f.type)
        for f in UNIT_RECORD_SCHEMA
    }
    return pa.table(cols)


def _shard_group_rows(group: pa.Table) -> list[dict]:
    """Pass 1: stitch inside one (conv_id, shard) group.

    Defers the leading continuation chain raw; everything after it is
    folded normally.  Emits unit-record ROW DICTS (the caller batches
    one Arrow build per bucket, not per shard) plus one meta row
    carrying the shard's trailing fold state."""
    conv_id = group.column("conv_id")[0].as_py()
    shard = group.column("_shard")[0].as_py()
    turns = _group_to_turns(group)

    # Maximal deferred prefix: t0 if it opens with a loose continuation,
    # then each next turn while the chain keeps flowing.
    deferred: list[TurnInput] = []
    i = 0
    while i < len(turns):
        t = turns[i]
        frag0 = t.fragments[0] if t.fragments else None
        starts_cont = frag0 is not None and frag0.kind == "cont"
        if i == 0:
            if not starts_cont:
                break
        else:
            prev = turns[i - 1]
            prev_last = prev.fragments[-1] if prev.fragments else None
            if not (
                starts_cont
                and prev_last is not None
                and prev_last.continues_next
                and prev.turn_idx == t.turn_idx - 1
            ):
                break
        deferred.append(t)
        i += 1

    units, state = stitch_conversation(turns[i:])

    rows: list[dict] = []
    for t in deferred:
        rows.append(
            {
                "conv_id": conv_id,
                "shard": shard,
                "head_turn": t.turn_idx,
                "seq": -1,
                "last_turn": t.turn_idx,
                "unit_id": "",
                "part_id": "",
                "question": "",
                "answer": "",
                "open": False,
                "continued": False,
                "parse_error": t.parse_error,
                "needs_id": False,
                "is_boundary": True,
                "payload_json": json.dumps(
                    {
                        "deferred_turn": {
                            "turn_idx": t.turn_idx,
                            "fragments": [_frag_to_dict(f) for f in t.fragments],
                            "spans": [list(s) for s in t.spans],
                            "parse_error": t.parse_error,
                        }
                    }
                ),
                "spans": [],
                "figures": [],
            }
        )

    for u in units:
        boundary = u.open or u.needs_id
        rows.append(_unit_to_row(conv_id, shard, u, boundary))

    # Shard meta: trailing fold state for pass 2.
    rows.append(
        {
            "conv_id": conv_id,
            "shard": shard,
            "head_turn": 2**31 - 1,
            "seq": 2**31 - 1,
            "last_turn": 0,
            "unit_id": "",
            "part_id": "",
            "question": "",
            "answer": "",
            "open": False,
            "continued": False,
            "parse_error": False,
            "needs_id": False,
            "is_boundary": True,
            "payload_json": json.dumps(
                {
                    "meta": {
                        "stitched_any": bool(turns[i:]),
                        "final_luid": state.last_unit_id,
                        "has_open": state.open_unit is not None,
                    }
                }
            ),
            "spans": [],
            "figures": [],
        }
    )
    return rows


def _boundary_group_rows(group: pa.Table) -> list[dict]:
    """Pass 2: replay the fold across one conversation's shard
    boundaries.  Input: only boundary rows (deferred turns, open /
    needs_id records, shard metas) — a few rows per shard.  Returns
    row dicts (caller batches the Arrow build per bucket)."""
    conv_id = group.column("conv_id")[0].as_py()
    group = group.sort_by([("shard", "ascending"), ("head_turn", "ascending"), ("seq", "ascending")])
    items = group.to_pylist()

    # Bucket rows per shard preserving order.
    shards: dict[int, list[dict]] = {}
    for r in items:
        shards.setdefault(r["shard"], []).append(r)

    carry = FoldState()
    out_units: list[UnitRecord] = []

    for shard in sorted(shards):
        deferred_turns: list[TurnInput] = []
        recs: list[UnitRecord] = []
        meta: dict = {}
        for r in shards[shard]:
            if r["payload_json"]:
                payload = json.loads(r["payload_json"])
                if "deferred_turn" in payload:
                    d = payload["deferred_turn"]
                    deferred_turns.append(
                        TurnInput(
                            turn_idx=d["turn_idx"],
                            fragments=[Fragment(**f) for f in d["fragments"]],
                            spans=[tuple(s) for s in d["spans"]],
                            parse_error=d["parse_error"],
                        )
                    )
                else:
                    meta = payload["meta"]
            else:
                recs.append(_row_to_unit(r))

        # (1) replay the deferred prefix with the carried state.
        prefix_units, carry_after_prefix = stitch_conversation(deferred_turns, carry)
        out_units.extend(prefix_units)

        # (2) fill orphan-part ids that pass 1 couldn't resolve.
        luid = carry_after_prefix.last_unit_id
        open_rec: UnitRecord | None = None
        for u in recs:
            if u.needs_id and not u.unit_id:
                u.unit_id = luid
                u.needs_id = False
            if u.open:
                open_rec = u
            out_units.append(u)

        # (3) advance the carry into the next shard.
        if meta.get("stitched_any"):
            carry = FoldState(
                open_unit=open_rec,
                last_unit_id=meta.get("final_luid") or luid,
            )
        else:
            # Shard fully deferred: the prefix fold's state carries on.
            carry = carry_after_prefix

    return [_unit_to_row(conv_id, -1, u, False) for u in out_units]


def _resolve_group_rows(group: pa.Table) -> tuple[list[str], list[OutputRow]]:
    """Pass 3: document-order reference resolution over one
    conversation's unit records (payload-free, small).  Returns
    (conv_id-per-row, OutputRows) for a batched Arrow build."""
    conv_id = group.column("conv_id")[0].as_py()
    group = group.sort_by([("head_turn", "ascending"), ("seq", "ascending")])
    units = [_row_to_unit(r) for r in group.to_pylist()]
    rows = resolve_conversation(units)
    rows.sort(key=lambda r: (parse_unit_id(r.unit_id), r.turn_idx))
    return [conv_id] * len(rows), rows


def _iter_subgroups(group: pa.Table, key_cols: list[str]):
    """Sort by the entity key columns and yield contiguous zero-copy
    sub-group slices."""
    group = group.sort_by([(c, "ascending") for c in key_cols])
    keys = [group.column(c).to_pylist() for c in key_cols]
    n = group.num_rows
    start = 0
    for i in range(1, n + 1):
        if i == n or any(k[i] != k[start] for k in keys):
            yield group.slice(start, i - start)
            start = i


def _subgrouped_records(row_fn, key_cols: list[str]):
    """ONE ``map_groups`` call per hash bucket, ONE Arrow table build
    per bucket: apply a row-dict-returning per-entity fn to each
    contiguous sub-group and batch all rows into a single
    ``_records_table``.  Same per-group-overhead elimination as
    ``bucket_group_fn`` — both the map_groups layer cost AND the
    per-entity pyarrow build (the dominant term) amortize across the
    bucket."""

    def wrapper(group: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for sub in _iter_subgroups(group, key_cols):
            rows.extend(row_fn(sub))
        return _records_table(rows)

    return wrapper


def _subgrouped_extracted(key_cols: list[str]):
    """Bucket wrapper for pass 3: batch every conversation's resolved
    OutputRows into one ``_rows_to_table_multi`` build."""

    def wrapper(group: pa.Table) -> pa.Table:
        convs: list[str] = []
        rows: list[OutputRow] = []
        for sub in _iter_subgroups(group, key_cols):
            c, r = _resolve_group_rows(sub)
            convs.extend(c)
            rows.extend(r)
        return _rows_to_table_multi(convs, rows)

    return wrapper


# Dense bucket-value multiplier: bucket values ≫ partitions so EVERY
# hash partition receives data.  (Ray's hash shuffle broadcasts input
# schemas only with the first block; a filter-derived input can lead
# with an empty block and lose the broadcast, after which a partition
# that received no shard at all builds a zero-column table.  Dense
# values make no-shard partitions statistically impossible, which also
# keeps pass-1 output blocks non-empty for the downstream filters.)
_DENSE = 64


def _stitch_salted(ds, salt_turns: int):
    import zlib

    import pyarrow.compute as pc

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = pc.floor(
            pc.divide(pc.cast(batch.column("turn_idx"), pa.float64()), salt_turns)
        ).cast(pa.int64())
        return batch.append_column("_shard", shard)

    nparts = _default_num_buckets()
    nvals = nparts * _DENSE

    # Skew-safe bucket key: hash of (conv, shard), so a mega
    # conversation's shards spread across tasks.
    def add_shard_bucket(batch: pa.Table) -> pa.Table:
        convs = batch.column("conv_id").to_pylist()
        shards = batch.column("_shard").to_pylist()
        bk = [
            zlib.crc32(f"{c}|{s}".encode()) % nvals for c, s in zip(convs, shards)
        ]
        return batch.append_column("_sbucket", pa.array(bk, pa.int32()))

    sharded = ds.map_batches(add_shard, batch_format="pyarrow").map_batches(
        add_shard_bucket, batch_format="pyarrow"
    )
    pass1 = sharded.groupby("_sbucket", num_partitions=nparts).map_groups(
        _subgrouped_records(_shard_group_rows, ["conv_id", "_shard"]),
        batch_format="pyarrow",
    )

    # pass1 feeds two branches; materialize it so the upstream
    # (payload parse + shard shuffle) runs ONCE.  Unit records are
    # payload-free — a small fraction of input bytes — so pinning them
    # in the object store is cheap relative to recomputation.
    pass1 = pass1.materialize()

    boundary = pass1.filter(expr="is_boundary == True")
    final = pass1.filter(expr="is_boundary == False")

    merged = (
        boundary.map_batches(add_bucket_column(nvals), batch_format="pyarrow")
        .groupby("_bucket", num_partitions=nparts)
        .map_groups(
            _subgrouped_records(_boundary_group_rows, ["conv_id"]),
            batch_format="pyarrow",
        )
    )

    return (
        final.union(merged)
        .map_batches(add_bucket_column(nvals), batch_format="pyarrow")
        .groupby("_bucket", num_partitions=nparts)
        .map_groups(_subgrouped_extracted(["conv_id"]), batch_format="pyarrow")
    )
