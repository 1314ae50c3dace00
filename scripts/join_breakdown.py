"""join_hash cold-start breakdown (round-5 judge item 5).

Attributes the gap between join_hash's cold first run and its warm
steady state in one session:

  1. tiny-join probe in the fresh session = pure JoinOperator actor
     -pool spin-up (two 4-row tables; exchange/probe cost ~0)
  2. join_hash trial 1 (cold for the real pipeline) vs trials 2..N
     (warm) — the delta beyond the probe is read/map warmup
  3. per-operator wall times from Dataset.stats() on a warm run
     (read+combine map vs the Join operator itself)

Usage: python scripts/join_breakdown.py [sf_dir] [n_warm]
"""

from __future__ import annotations

import os
import re
import sys
import time

import pyarrow as pa


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    from pdf_extractor_ray.pipelines.queries import QUERIES

    # 1. tiny-join probe: pure JoinOperator fixed cost in this session
    t0 = time.time()
    a = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 4], "x": [1, 2, 3, 4]}))
    b = ray.data.from_arrow(pa.table({"k": [1, 2, 3, 4], "y": [5, 6, 7, 8]}))
    a.join(b, join_type="inner", num_partitions=8, on=("k",)).materialize()
    probe1 = time.time() - t0
    t0 = time.time()
    a.join(b, join_type="inner", num_partitions=8, on=("k",)).materialize()
    probe2 = time.time() - t0
    print(f"tiny-join probe: cold {probe1:.2f}s, repeat {probe2:.2f}s "
          f"(spin-up ~{probe1 - probe2:.2f}s)")

    # 2. real join_hash trials
    trials = []
    for _ in range(1 + n_warm):
        t0 = time.time()
        QUERIES["join_hash"](sf_dir)
        trials.append(round(time.time() - t0, 2))
    print(f"join_hash trials (first=cold-after-probe): {trials}")
    warm = sorted(trials[1:])[len(trials[1:]) // 2]
    print(f"warm median: {warm:.2f}s")

    # 3. operator breakdown from stats() of one more run
    import pdf_extractor_ray.pipelines.queries.relational as rel

    orders = rel._read_pq(
        rel._t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    )
    lineitem = rel._read_pq(
        rel._t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "rev",
            rel._money_i4(batch.column("l_extendedprice"), batch.column("l_discount")),
        )
        part = batch.group_by("l_orderkey").aggregate([("rev", "sum"), ("rev", "count")])
        return part.rename_columns(["l_orderkey", "rev", "n"])

    cpus = int(ray.cluster_resources().get("CPU", 8))
    left = lineitem.map_batches(revenue, batch_format="pyarrow")
    joined = left.join(
        orders,
        join_type="inner",
        num_partitions=max(8, cpus // 4),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).materialize()
    for line in joined.stats().splitlines():
        m = re.match(r"^Operator \d+ (\S+).*|^\* Remote wall time: (.*)", line.strip())
        if line.strip().startswith("Operator") or "wall time" in line.lower():
            print("  ", line.strip()[:120])
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
