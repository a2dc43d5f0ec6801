#!/usr/bin/env python
"""Optimization-round measurement harness.

For each headline query (or the names passed as argv): build the DF,
time noop-sink executions (warm + best-of-N), and dump
``explain('formatted')`` plus plan-shape counters (Exchange /
WholeStageCodegen / BatchEvalPython / ArrowEvalPython nodes) to
``plans/$SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt`` (default r10).

Usage: python tools/profile_headline.py <tag> [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2:]

HEADLINE = [
    "merged_entity", "m5_extra_data_merge", "m7_file_clash_merge",
    "j1_fact_dim_left_join", "j3_hash_search_chain", "j5_child_attach",
    "j7_semi_join", "a5_group_count_topk", "w1_dedup_keep_highest",
    "u1_upsert_returning", "t_exact_dedup", "t_minhash_lsh_dedup",
    "t_simhash_dedup", "t_ann_cosine_topk", "t_embed_cosine_dedup_lsh",
    "t_text_quality", "t_token_count", "t_sequence_pack", "t_corpus_prep",
]


def plan_counts(txt: str) -> dict:
    return {
        "exchange": len(re.findall(r"\bExchange\b", txt)),
        "wsc": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt))),
        "batch_eval_python": txt.count("BatchEvalPython"),
        "arrow_eval_python": txt.count("ArrowEvalPython"),
        "sort": len(re.findall(r"^\(?\d*\)? ?Sort\b", txt, re.M)) + txt.count(") Sort ["),
        "smj": txt.count("SortMergeJoin"),
        "bhj": txt.count("BroadcastHashJoin"),
        "shj": txt.count("ShuffledHashJoin"),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from faexport_db_spark.queries import QUERIES
    from faexport_db_spark.session import get_spark

    plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "r10")
    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", plan_dir)
    os.makedirs(outdir, exist_ok=True)

    names = ONLY or HEADLINE
    results = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print("skip (unregistered):", name)
            continue
        t_build0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t_build0
        explain = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        spark.sparkContext.setJobDescription(f"{plan_dir} {TAG}: {name}")
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        best = min(samples)
        results[name] = {
            "best": round(best, 4),
            "median": round(sorted(samples)[len(samples) // 2], 4),
            "worst": round(max(samples), 4),
            "build_s": round(build_s, 4),
            **plan_counts(explain),
        }
        with open(os.path.join(outdir, f"{name}_{TAG}.txt"), "w") as f:
            f.write(explain)
        print(name, json.dumps(results[name]), flush=True)

    total = round(sum(r["best"] for r in results.values()), 4)
    print(json.dumps({"tag": TAG, "total_best": total, "queries": results}))


if __name__ == "__main__":
    main()
