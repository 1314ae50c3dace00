"""Validation pipeline (reference `evaluate` entry point rebuilt,
/root/reference/src/cli.py:183-241 + src/evaluator.py:216-437).

A Ray Data job: join extracted rows vs golden fixtures on
(conv_id, turn_idx, unit_id), per-row checks — text equality
(similarity gate tightened to bit-equality), remaining-reference regex
scan (M10), difflib similarity for diagnostics (M13) — then the report
rollup (A4: passed/failed counts, pass rate, per-flag tallies) as
dataset aggregates.  The interactive reviewer (reference
src/reviewer.py) becomes a deterministic random-sample surrogate (O2).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.refs import GENERIC_REF_RE


@dataclass
class EvaluationReport:
    total: int
    passed: int
    failed: int
    missing: int  # golden rows with no pipeline row
    extra: int  # pipeline rows with no golden row
    with_remaining_refs: int
    parse_errors: int
    pass_rate: float
    mean_similarity: float


def _key_cols(t: pa.Table) -> pa.Table:
    return t.select(["conv_id", "turn_idx", "unit_id", "extracted_text"])


def evaluate_against_golden(
    extracted: ray.data.Dataset | pa.Table,
    golden: pa.Table,
) -> tuple[EvaluationReport, pa.Table]:
    """Compare pipeline output against a golden table.

    The golden side is the SMALL side in tests (broadcast dict); for a
    golden lake of pipeline scale, swap the broadcast for
    ``Dataset.join`` on (conv_id, turn_idx, unit_id) — same key as the
    partitioned output, so the join reuses the existing layout.

    Returns (report, mismatches-table).
    """
    from difflib import SequenceMatcher

    errs = 0
    if isinstance(extracted, ray.data.Dataset):
        has_flags = "flags" in extracted.schema().names
        cols = ["conv_id", "turn_idx", "unit_id", "extracted_text"] + (
            ["flags"] if has_flags else []
        )
        got = pa.concat_tables(
            list(
                extracted.select_columns(cols).iter_batches(batch_format="pyarrow", batch_size=None)
            ),
            promote_options="permissive",
        )
    else:
        has_flags = "flags" in extracted.column_names
        got = extracted
    if has_flags:
        errs = int(
            pc.sum(
                pc.cast(pc.struct_field(got.column("flags"), "parse_error"), pa.int64())
            ).as_py()
            or 0
        )
    got = _key_cols(got)

    # Keys may legitimately repeat (several content rows of one turn
    # share unit_id "") → compare per-key text MULTISETS.
    def to_multimap(t: pa.Table) -> dict[tuple, list[str]]:
        m: dict[tuple, list[str]] = {}
        for c, ti, u, x in zip(
            t.column("conv_id").to_pylist(),
            t.column("turn_idx").to_pylist(),
            t.column("unit_id").to_pylist(),
            t.column("extracted_text").to_pylist(),
        ):
            m.setdefault((c, ti, u), []).append(x)
        return m

    want_map = to_multimap(_key_cols(golden))
    got_map = to_multimap(got)

    passed = failed = extra = refs = 0
    total = sum(len(v) for v in got_map.values())
    sims: list[float] = []
    mism: list[dict] = []
    for key, texts in got_map.items():
        for x in texts:
            if GENERIC_REF_RE.search(x or ""):
                refs += 1
        want_texts = want_map.get(key)
        if want_texts is None:
            extra += len(texts)
            continue
        for x, g in zip(sorted(texts), sorted(want_texts)):
            if x == g:
                passed += 1
                sims.append(1.0)
            else:
                failed += 1
                sim = SequenceMatcher(None, x or "", g or "").ratio()
                sims.append(sim)
                mism.append(
                    {
                        "conv_id": key[0],
                        "turn_idx": key[1],
                        "unit_id": key[2],
                        "got": x,
                        "want": g,
                        "similarity": round(sim, 4),
                    }
                )
        extra += max(0, len(texts) - len(want_texts))
    missing = sum(
        max(0, len(v) - len(got_map.get(k, [])))
        for k, v in want_map.items()
    )
    rows = [None] * total

    report = EvaluationReport(
        total=len(rows),
        passed=passed,
        failed=failed,
        missing=missing,
        extra=extra,
        with_remaining_refs=refs,
        parse_errors=errs,
        pass_rate=round(passed / len(rows), 4) if rows else 1.0,
        mean_similarity=round(sum(sims) / len(sims), 4) if sims else 1.0,
    )
    mism_table = (
        pa.Table.from_pylist(mism)
        if mism
        else pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int32()),
                "unit_id": pa.array([], pa.string()),
                "got": pa.array([], pa.string()),
                "want": pa.array([], pa.string()),
                "similarity": pa.array([], pa.float64()),
            }
        )
    )
    return report, mism_table


def flag_rollup(ds: ray.data.Dataset) -> dict:
    """A4-style aggregate rollup over the flags struct column —
    distributed (partial counts per batch, summed)."""

    def partial(batch: pa.Table) -> pa.Table:
        flags = batch.column("flags")

        def count(field: str) -> pa.Array:
            s = pc.sum(pc.cast(pc.struct_field(flags, field), pa.int64()))
            return pa.array([s.as_py() or 0], pa.int64())

        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "continued": count("continued"),
                "resolved": count("resolved"),
                "had_refs": count("had_refs"),
                "parse_error": count("parse_error"),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("continued", alias_name="continued"),
            Sum("resolved", alias_name="resolved"),
            Sum("had_refs", alias_name="had_refs"),
            Sum("parse_error", alias_name="parse_error"),
        )
    )
    return dict(out)


def review_sample(
    ds: ray.data.Dataset,
    rate: float = 0.1,
    seed: int = 7,
    limit: int = 20,
    priority_only: bool = False,
):
    """Random-sample review surrogate (reference src/reviewer.py:113-115
    — `random.sample` with max(1, n*rate)): a seeded sample for human
    spot-checking, capped for display (O2/O3).

    ``priority_only`` keeps rows a reviewer should look at first —
    parse errors, unresolved references — the rebuild of the
    reference's review-priority filter (J3, src/reviewer.py:95-110,
    an anti-join shape: 'failed' = not passed)."""
    if priority_only:
        def needs_review(batch: pa.Table) -> pa.Table:
            flags = batch.column("flags").to_pylist()
            mask = [
                f["parse_error"] or (f["had_refs"] and not f["resolved"])
                for f in flags
            ]
            return batch.filter(pa.array(mask))

        ds = ds.map_batches(needs_review, batch_format="pyarrow")
    return ds.random_sample(rate, seed=seed).limit(limit).take_all()


_PRIORITY_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("unit_id", pa.string()),
        ("latex_ok", pa.bool_()),
        ("has_remaining_refs", pa.bool_()),
        ("answer_similarity", pa.float64()),
        ("review_priority", pa.string()),
        ("passed", pa.bool_()),
    ]
)

def review_priorities(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-row review routing (reference QAEvaluation,
    /root/reference/src/evaluator.py:216-292): LaTeX snippet check
    (M12 — ``structural_check`` stands in for the container-less
    pdflatex, same snippet shape as evaluator.py:249), remaining-
    reference scan, and the resolved-answer similarity gate with the
    reference's thresholds (<0.95 → high, <0.99 → low; remaining refs
    → medium; snippet-check failure → high; else none).

    The similarity gate: the reference's LLM resolver MAY rewrite the
    answer, so it diffs original vs resolved (evaluator.py:258-270).
    This engine's deterministic resolver provably never modifies the
    answer — it appends "[Context from <id>: ...]" to the QUESTION
    only (functions/refs.py:137-146) — so the gate reduces to the
    marker invariant: a resolved row must carry its inline marker
    (similarity 1.0), and a resolved row WITHOUT one is corrupted
    output (similarity 0.0 → high priority).  Runs entirely inside
    ``map_batches`` — one pass, no shuffle."""
    return ds.map_batches(priority_batch, batch_format="pyarrow")


def priority_batch(batch: pa.Table) -> pa.Table:
    """Pure per-batch review routing (body of ``review_priorities``).

    Module-level so the sequential golden generator
    (scripts/make_flagship_golden.py) can run the IDENTICAL routing
    over the single-threaded oracle extraction — the frozen golden
    parquet then verifies only the distributed orchestration."""
    from ..sources.latex_sink import render_unit, structural_check

    texts = batch.column("extracted_text").to_pylist()
    units = batch.column("unit_id").to_pylist()
    flags = batch.column("flags").to_pylist()
    lat, refs, sims, prio, passed = [], [], [], [], []
    for u, x, f in zip(units, texts, flags):
        x = x or ""
        p = "none"
        snippet = (
            "\\documentclass{article}\n\\begin{document}\n"
            + render_unit(u, x)
            + "\\end{document}"
        )
        ok = structural_check(snippet)
        if not ok:
            p = "high"
        has_refs = bool(GENERIC_REF_RE.search(x))
        if has_refs and p != "high":
            p = "medium"
        sim = None
        if f["resolved"]:
            sim = 1.0 if "[Context from " in x else 0.0
            if sim < 0.95:
                p = "high"
            elif sim < 0.99 and p == "none":
                p = "low"
        lat.append(ok)
        refs.append(has_refs)
        sims.append(sim)
        prio.append(p)
        passed.append(ok and not has_refs and (sim is None or sim >= 0.95))
    return pa.table(
        {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "unit_id": batch.column("unit_id"),
            "latex_ok": pa.array(lat, pa.bool_()),
            "has_remaining_refs": pa.array(refs, pa.bool_()),
            "answer_similarity": pa.array(sims, pa.float64()),
            "review_priority": pa.array(prio, pa.string()),
            "passed": pa.array(passed, pa.bool_()),
        }
    )


def resolution_report(ds: ray.data.Dataset) -> tuple[dict, pa.Table]:
    """Resolution-tracking output (reference S10,
    /root/reference/src/pipeline.py:326-351): summary counts + a
    details table restricted to rows that had references.  Answers are
    never modified by the deterministic resolver, so
    ``answers_modified`` is structurally 0."""

    def details(batch: pa.Table) -> pa.Table:
        flags = batch.column("flags").to_pylist()
        mask = pa.array([f["had_refs"] for f in flags])
        kept = batch.filter(mask)
        kflags = kept.column("flags").to_pylist()
        return pa.table(
            {
                "conv_id": kept.column("conv_id"),
                "unit_id": kept.column("unit_id"),
                "had_references": pa.array([True] * kept.num_rows, pa.bool_()),
                "references_found": kept.column("refs_found"),
                "context_inlined": pa.array(
                    [f["resolved"] for f in kflags], pa.bool_()
                ),
            }
        )

    detail_tbl = pa.concat_tables(
        list(ds.map_batches(details, batch_format="pyarrow").iter_batches(batch_format="pyarrow", batch_size=None)),
        promote_options="permissive",
    )
    rollup = flag_rollup(ds)
    summary = {
        "total_qas": int(rollup["n"]),
        "with_references": int(rollup["had_refs"]),
        "resolved": int(rollup["resolved"]),
        "answers_modified": 0,
    }
    return summary, detail_tbl


def figure_counts(ds: ray.data.Dataset) -> pa.Table:
    """Figures per conversation (reference A7,
    /root/reference/src/pdf_processor.py:179-206 page→figure tallies) —
    partial counts per batch, then a small groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        figs = batch.column("figures").to_pylist()
        return pa.table(
            {
                "conv_id": batch.column("conv_id"),
                "n_figures": pa.array([len(f or []) for f in figs], pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n_figures", alias_name="n_figures"))
    )
    return pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=None)), promote_options="permissive"
    )


def ssim_compare(img_a, img_b) -> float:
    """Structural-similarity check (reference M14,
    /root/reference/src/evaluator.py:188-214).  Requires scikit-image
    + PIL — absent from this container — so it degrades to the
    reference's own fallback value (-1.0) instead of raising."""
    try:  # pragma: no cover - skimage not installed here
        import numpy as np
        from skimage.metrics import structural_similarity as ssim  # type: ignore

        a = np.asarray(img_a, dtype=float)
        b = np.asarray(img_b, dtype=float)
        if a.shape != b.shape:
            return -1.0
        return float(ssim(a, b, data_range=max(a.max() - a.min(), 1.0)))
    except ImportError:
        return -1.0
