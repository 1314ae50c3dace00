"""CLI entry points (reference src/cli.py rebuilt for ``ray job submit``).

    python -m pdf_extractor_ray.cli extract --lake DIR --out DIR \
        [--partitions N] [--force-restart] [--salt-turns W] [--no-resolve]
    python -m pdf_extractor_ray.cli evaluate --out DIR --golden FILE
    python -m pdf_extractor_ray.cli review --out DIR [--rate 0.1]
    python -m pdf_extractor_ray.cli latex --out DIR --tex DIR

Mirrors the reference's flag surface (resolve_references,
enable_checkpoints/force_restart — /root/reference/src/cli.py:29-48,
src/pipeline.py:133-153).  Owns the Ray session (guarded init) —
library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def cmd_extract(args) -> int:
    import os

    if not os.path.exists(args.lake):
        print(f"error: lake path does not exist: {args.lake}", file=sys.stderr)
        return 1
    _ensure_ray()
    from .pipelines.extract import run_with_checkpoint

    stats = run_with_checkpoint(
        args.lake,
        args.out,
        num_partitions=args.partitions,
        force_restart=args.force_restart,
        salt_turns=args.salt_turns,
    )
    print(json.dumps(stats))
    return 0


def cmd_evaluate(args) -> int:
    _ensure_ray()
    import pyarrow.parquet as pq

    from .pipelines.evaluate import evaluate_against_golden, flag_rollup
    from .pipelines.extract import read_extracted

    from ray.data.aggregate import Count

    from .pipelines.evaluate import review_priorities

    ds = read_extracted(args.out)
    golden = pq.read_table(args.golden)
    report, mism = evaluate_against_golden(ds, golden)
    rollup = flag_rollup(read_extracted(args.out))
    out = {"report": report.__dict__, "flags": rollup}
    if args.priorities_out:
        # per-row review routing (reference evaluator's review_priority)
        # — a full extra pass with a per-row snippet build, so computed
        # only when its artifact was asked for; materialize once so the
        # write and the count rollup share the rows (artifacts are small)
        pri_ds = review_priorities(read_extracted(args.out)).materialize()
        pri_ds.write_parquet(args.priorities_out)
        out["priorities"] = {
            r["review_priority"]: int(r["n"])
            for r in pri_ds.groupby("review_priority")
            .aggregate(Count(alias_name="n"))
            .take_all()
        }
    print(json.dumps(out))
    if mism.num_rows:
        print(f"{mism.num_rows} mismatches; first: {mism.slice(0, 3).to_pylist()}", file=sys.stderr)
    return 0 if report.failed == 0 and report.missing == 0 else 1


def cmd_review(args) -> int:
    """Sampling display (reference reviewer loop's read half) plus the
    persistent decision workflow (reviewer.py:204-285): ``--decide
    CONV:TURN:UNIT=accept|reject|skip`` appends decision rows,
    ``--summary`` prints the merged newest-wins counts (A6)."""
    _ensure_ray()
    from .pipelines.evaluate import review_sample
    from .pipelines.extract import read_extracted
    from .pipelines.review import record_decisions, review_summary

    if (args.decide or args.summary) and not args.reviews:
        print("error: --decide/--summary require --reviews DIR", file=sys.stderr)
        return 1
    if not (args.decide or args.summary or args.out):
        print("error: need --out for sampling or --decide/--summary", file=sys.stderr)
        return 1
    if args.decide:
        decisions = []
        for spec in args.decide:
            key, _, decision = spec.rpartition("=")
            parts = key.split(":", 2)
            import re as _re

            if len(parts) != 3 or not decision or not _re.fullmatch(r"-?\d+", parts[1]):
                print(
                    f"error: bad --decide {spec!r}; expected CONV:TURN:UNIT=DECISION",
                    file=sys.stderr,
                )
                return 1
            conv_id, turn_idx, unit_id = parts
            decisions.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": int(turn_idx),
                    "unit_id": unit_id,
                    "decision": decision,
                    "note": args.note or "",
                }
            )
        try:
            path = record_decisions(args.reviews, decisions)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        print(json.dumps({"recorded": len(decisions), "path": path}))
        return 0
    if args.summary:
        print(json.dumps(review_summary(args.reviews)))
        return 0

    rows = review_sample(read_extracted(args.out), rate=args.rate, seed=args.seed)
    for r in rows:
        text = (r["extracted_text"] or "")[:200]
        print(f"[{r['conv_id']}:{r['turn_idx']}:{r['unit_id']}] {text}")
    return 0


def cmd_latex(args) -> int:
    _ensure_ray()
    from .pipelines.extract import read_extracted
    from .sources.latex_sink import compile_check, write_latex

    paths = write_latex(read_extracted(args.out), args.tex)
    ok = sum(1 for p in paths if compile_check(p))
    print(json.dumps({"documents": len(paths), "render_ok": ok}))
    return 0 if ok == len(paths) else 1


def cmd_pages(args) -> int:
    """S3 surface (reference convert_all_pages, src/pdf_processor.py:
    79-102 + src/cli.py page-image output): render every PDF page of
    the lake and write the ``page_%03d.png`` tree distributed."""
    import os

    if not os.path.exists(args.lake):
        print(f"error: lake path does not exist: {args.lake}", file=sys.stderr)
        return 1
    _ensure_ray()
    import pyarrow.compute as pc

    from .sources.transcripts import read_transcripts
    from .stages.page_render import PageRenderer, write_page_images

    ds = read_transcripts(args.lake, columns=("conv_id", "turn_idx", "tool", "text"))
    pages = ds.map_batches(
        PageRenderer(zoom=args.zoom), batch_format="pyarrow", batch_size=32
    )
    manifest = write_page_images(pages, args.images)
    print(
        json.dumps(
            {
                "pages": manifest.num_rows,
                "conversations": len(set(manifest.column("conv_id").to_pylist())),
                "bytes": int(pc.sum(manifest.column("n_bytes")).as_py() or 0),
            }
        )
    )
    return 0


def cmd_query(args) -> int:
    """Run any registered analytics pipeline by name over a testdata-
    shaped parquet directory — the user-facing door to the full query
    surface (``--list`` enumerates it)."""
    from .pipelines.queries import ORACLES, QUERIES

    if args.list:
        for name in sorted(QUERIES):
            print(f"{name}{'' if name in ORACLES else '  (no SQL oracle)'}")
        return 0
    if not args.name:
        print("error: query NAME required (or --list)", file=sys.stderr)
        return 1
    if args.name not in QUERIES:
        print(f"error: unknown query {args.name!r} (see --list)", file=sys.stderr)
        return 1
    import os

    if not os.path.isdir(args.sf_dir):
        print(f"error: sf dir does not exist: {args.sf_dir}", file=sys.stderr)
        return 1
    _ensure_ray()
    import pyarrow as pa

    result = QUERIES[args.name](args.sf_dir)
    tbl = result if isinstance(result, pa.Table) else pa.Table.from_pandas(result)
    if args.out:
        import pyarrow.parquet as pq

        pq.write_table(tbl, args.out)
        print(json.dumps({"query": args.name, "rows": tbl.num_rows, "out": args.out}))
    else:
        head = tbl.slice(0, args.limit).to_pandas()
        print(head.to_string(index=False))
        print(json.dumps({"query": args.name, "rows": tbl.num_rows}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pdf_extractor_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract")
    pe.add_argument("--lake", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--partitions", type=int, default=4)
    pe.add_argument("--force-restart", action="store_true")
    pe.add_argument("--salt-turns", type=int, default=None)
    pe.set_defaults(fn=cmd_extract)

    pv = sub.add_parser("evaluate")
    pv.add_argument("--out", required=True)
    pv.add_argument("--golden", required=True)
    pv.add_argument("--priorities-out", default=None, help="write per-row review priorities parquet")
    pv.set_defaults(fn=cmd_evaluate)

    pr = sub.add_parser("review")
    pr.add_argument("--out", required=False, default=None)
    pr.add_argument("--rate", type=float, default=0.1)
    pr.add_argument("--seed", type=int, default=7)
    pr.add_argument("--reviews", default=None, help="decision artifact dir")
    pr.add_argument(
        "--decide",
        action="append",
        default=None,
        metavar="CONV:TURN:UNIT=DECISION",
        help="record a decision (repeatable)",
    )
    pr.add_argument("--note", default=None)
    pr.add_argument("--summary", action="store_true")
    pr.set_defaults(fn=cmd_review)

    pl = sub.add_parser("latex")
    pl.add_argument("--out", required=True)
    pl.add_argument("--tex", required=True)
    pl.set_defaults(fn=cmd_latex)

    pp = sub.add_parser("pages")
    pp.add_argument("--lake", required=True)
    pp.add_argument("--images", required=True, help="output image tree root")
    pp.add_argument("--zoom", type=float, default=2.0)
    pp.set_defaults(fn=cmd_pages)

    pq_ = sub.add_parser("query", help="run a registered analytics pipeline")
    pq_.add_argument("name", nargs="?", default=None)
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pq_.add_argument("--limit", type=int, default=20, help="rows to print")
    pq_.add_argument("--out", default=None, help="write full result parquet here")
    pq_.add_argument("--list", action="store_true", help="list query names")
    pq_.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
