"""Resumable big-lake strict sweep (round-5 SCALE protocol).

Runs EVERY oracled registry query whose referenced tables all exist in
LAKE_DIR against both the Ray engine and the DuckDB oracle, compares
dtype-exact canonical hashes (same discipline as driver_check.py), and
records per-query status + timings into a results JSON.  Re-running
skips queries already recorded as MATCH — so a sweep interrupted by a
timeout or box hiccup resumes where it left off.

Usage:
  python scripts/sweep_biglake.py LAKE_DIR RESULTS_JSON [--timeout S]
                                  [--only q1,q2] [--skip q1,q2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# The flagship trio's oracles compare against FIXED sf0.001 golden
# parquet (pipelines/queries/__init__._sql_flagship_golden) — they are
# only meaningful at sf0.001 and must not run against a big lake.
GOLDEN_ONLY = {"extract_transcripts", "review_priority", "page_render"}


def _duck(lake_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(lake_dir, f"{t}.parquet")
        if os.path.isdir(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        elif os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        else:
            small = os.path.join("/root/testdata/sf0.001", f"{t}.parquet")
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{small}') WHERE 1=0"
            )
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    return pd.DataFrame(result)


def _canon(df: pd.DataFrame) -> tuple:
    import hashlib

    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    h = hashlib.sha256()
    h.update(repr(list(df.dtypes)).encode())
    h.update(df.to_csv(index=False, float_format="%.10g").encode())
    return len(df), list(df.columns), h.hexdigest()


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout()


def _tables_in(sql: str) -> set[str]:
    return {t for t in TABLES if re.search(rf"\b{t}\b", sql)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("lake_dir")
    ap.add_argument("results_json")
    ap.add_argument("--timeout", type=int, default=420)
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    from pdf_extractor_ray.pipelines.queries import ORACLES, QUERIES

    present = {
        t for t in TABLES if os.path.exists(os.path.join(args.lake_dir, f"{t}.parquet"))
    }
    results: dict = {}
    if os.path.exists(args.results_json):
        results = json.load(open(args.results_json))

    only = set(filter(None, args.only.split(",")))
    skip = set(filter(None, args.skip.split(",")))
    todo = []
    for name, sql in ORACLES.items():
        if only and name not in only:
            continue
        if name in skip or name in GOLDEN_ONLY:
            continue
        refs = _tables_in(sql)
        if not refs or not refs <= present:
            continue
        if results.get(name, {}).get("status") == "MATCH":
            continue
        todo.append(name)
    print(f"[sweep] {len(todo)} queries to run on {args.lake_dir}", flush=True)

    signal.signal(signal.SIGALRM, _alarm)
    for i, name in enumerate(todo):
        rec: dict = {"lake": args.lake_dir}
        t0 = time.time()
        try:
            signal.alarm(args.timeout)
            eng = _canon(_to_df(QUERIES[name](args.lake_dir)))
            rec["engine_s"] = round(time.time() - t0, 1)
            t1 = time.time()
            con = _duck(args.lake_dir)
            ora = _canon(con.execute(ORACLES[name]).df())
            con.close()
            rec["oracle_s"] = round(time.time() - t1, 1)
            signal.alarm(0)
            rec["rows"] = eng[0]
            if eng == ora:
                rec["status"] = "MATCH"
            else:
                rec["status"] = "MISMATCH"
                rec["detail"] = {
                    "engine": [eng[0], eng[1]],
                    "oracle": [ora[0], ora[1]],
                    "hash_eq": eng[2] == ora[2],
                }
        except _Timeout:
            rec["status"] = "TIMEOUT"
            rec["at_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001 — record and continue the sweep
            signal.alarm(0)
            if "interrupted" in str(e).lower():
                # DuckDB turns the SIGALRM into RuntimeError("Query
                # interrupted") before _Timeout can propagate
                rec["status"] = "TIMEOUT"
                rec["at_s"] = round(time.time() - t0, 1)
            else:
                rec["status"] = "ERROR"
                rec["error"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec
        tmp = args.results_json + ".tmp"
        json.dump(results, open(tmp, "w"), indent=1, sort_keys=True)
        os.replace(tmp, args.results_json)
        print(
            f"[{i + 1}/{len(todo)}] {name}: {rec['status']} "
            f"({rec.get('engine_s', '?')}s / {rec.get('oracle_s', '?')}s)",
            flush=True,
        )
    n_match = sum(1 for r in results.values() if r.get("status") == "MATCH")
    bad = {k: r["status"] for k, r in results.items() if r.get("status") != "MATCH"}
    print(f"[sweep] done: {n_match} MATCH, issues: {bad}", flush=True)
    ray.shutdown()
    return 0 if not bad else 1


if __name__ == "__main__":
    sys.exit(main())
