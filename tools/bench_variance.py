#!/usr/bin/env python
"""Repeated-run variance study for the headline bench queries.

Runs each named query N times (after one warm-up) through the noop
sink — the same measurement bench.py takes — and prints min / median /
max / spread per query as one JSON line. Used to attribute
round-over-round bench deltas: a delta inside the measured spread is
harness noise, not a regression (VERDICT r03 "What's wrong #1").

Usage: python tools/bench_variance.py [query ...]   (default: the
queries the r03 driver flagged plus the two dedup hot spots)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "m5_extra_data_merge",
    "j5_child_attach",
    "t_sequence_pack",
    "t_corpus_prep",
    "u1_upsert_returning",
    "t_minhash_lsh_dedup",
    "t_simhash_dedup",
]

N = int(os.environ.get("BENCH_VARIANCE_N", "10"))


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from faexport_db_spark.queries import QUERIES
    from faexport_db_spark.session import get_spark

    spark = get_spark("faexport-db-spark-bench-variance")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(N):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        lo, hi = min(samples), max(samples)
        out[name] = {
            "n": N,
            "min": round(lo, 4),
            "median": round(statistics.median(samples), 4),
            "max": round(hi, 4),
            "spread_pct": round(hi / lo - 1.0, 3),
            "samples": [round(s, 4) for s in samples],
        }
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
