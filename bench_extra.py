"""Extra measurement harness for the optimization round (guide §1.4).

NOT the frozen driver bench — bench.py stays the measured protocol. This
file isolates each headline query with the noop sink (times the computation,
not the count/collect), dumps ``.explain("formatted")`` per query to
``plans/r06/<query>_<tag>.txt``, and prints the flagship pipeline's
per-stage walls. Run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [--tag before] \
        [--queries k4_k6_edge_jaccard,...] [--repeat 2] [--no-plans]

Queries run in the SAME order as bench.py so memo behavior matches the
driver protocol; memo hits are reported per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_QUERIES = [
    "k4_k6_edge_jaccard",
    "k5_weighted_pairs",
    "k9_threshold_count",
    "doc_pair_jaccard",
    "minhash_signatures",
    "lsh_candidates",
    "ann_cosine_topk",
    "ann_ivf_candidates",
    "quality_stats",
    "decontam_manifest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    names = BENCH_QUERIES
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    dump_plans = "--no-plans" not in sys.argv
    run_flagship = "--no-flagship" not in sys.argv

    os.environ.setdefault("SPARK_GRAFT_AQE", "false")  # match bench.py setting
    from sycl_jaccard_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus)
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    os.makedirs("plans/r06", exist_ok=True)
    qs = entrymod.queries()
    out: dict[str, list[float]] = {}
    memo_hits: dict[str, int] = {}
    for name in names:
        walls = []
        for i in range(repeat):
            h0 = entrymod._MEMO_STATS["hits"]
            sc.setJobDescription(f"{name} [noop r{i}]")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            if i == 0:
                memo_hits[name] = entrymod._MEMO_STATS["hits"] - h0
                if dump_plans:
                    with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
                        f.write(df._sc._jvm.PythonSQLUtils.explainString(
                            df._jdf.queryExecution(), "formatted"))
        sc.setJobDescription(None)
        out[name] = walls
        print(json.dumps({"query": name, "walls": walls, "memo_hits": memo_hits[name]}),
              flush=True)

    if run_flagship:
        from sycl_jaccard_spark.config import PipelineConfig
        from sycl_jaccard_spark.plans.pipeline import DedupPipeline
        from sycl_jaccard_spark.sources.tables import documents_as_files, load_table

        files = documents_as_files(load_table(spark, sf_dir, "documents"))
        files.count()
        stage_walls = []
        flag_walls = []
        for i in range(2):
            sc.setJobDescription(f"flagship r{i}")
            pipe = DedupPipeline(spark, PipelineConfig(), enable_simhash=True)
            t0 = time.monotonic()
            res = pipe.run(files)
            res.clusters.count()
            flag_walls.append(round(time.monotonic() - t0, 3))
            stage_walls.append({m["stage"]: m["wall_s"] for m in pipe.metrics})
            res = pipe = None
            spark._jvm.System.gc()
        best = min(range(2), key=lambda i: flag_walls[i])
        print(json.dumps({"flagship_walls": flag_walls,
                          "stages_best": stage_walls[best]}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
