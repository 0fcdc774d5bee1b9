"""Decontamination recall + cost at scale (operators/decontaminate.py):
planted benchmark leaks in a distributed synthetic corpus, probed against a
1k-item benchmark set, manifest compared to truth.

Corpus (deterministic, generated DISTRIBUTED from spark.range):

* N docs x TOKENS_PER_FILE tokens drawn from a shared vocabulary
  (xxhash64-derived from (doc, position) — no driver-side materialization);
* docs with ``doc_id % LEAK_PERIOD == 0`` are FULL LEAKS: benchmark item
  ``(doc_id // LEAK_PERIOD) % B``'s whole token window is embedded verbatim
  → containment 1.0, must be flagged;
* docs with ``doc_id % LEAK_PERIOD == 1`` are HALF LEAKS: only the first
  half of the window → containment ≈ 0.46 < the 0.5 threshold, must score
  but NOT be flagged (threshold discrimination, not just hit detection).

Benchmark items use their own vocabulary (never sampled by clean docs), so
truth is exact: recall = flagged ∩ planted / planted, and any flagged clean
doc is a false positive.

Cost: the probe is a broadcast hash join against the corpus scan — wall must
scale with CORPUS size (linear scan), never with corpus×bench. Measured at
two corpus sizes; writes BENCH/DECONTAM.md.

Usage: python scripts/eval_decontam.py
       SPARK_GRAFT_DECON_DOCS=300000 SPARK_GRAFT_CPUS=32 python scripts/eval_decontam.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.functions.shingles import shingle_hashes, shingles  # noqa: E402
from sycl_jaccard_spark.operators.decontaminate import (  # noqa: E402
    contamination_overlap,
    decontamination_manifest,
)
from sycl_jaccard_spark.session import get_spark  # noqa: E402

SEED = 42
TOKENS_PER_FILE = 60
BENCH_ITEMS = 1000
BENCH_LEN = 30          # tokens per benchmark item
LEAK_OFF = 15           # where the leak is embedded in the doc
LEAK_PERIOD = 50        # 2% full leaks + 2% half leaks
K = 3
THRESHOLD = 0.5
VOCAB = 5000


def _bench_tok(j, t):
    """Benchmark item j's token at position t — vocab disjoint from docs."""
    return F.concat(F.lit("b"), j.cast("string"), F.lit("_"), t.cast("string"))


def bench_df(spark):
    item = F.col("id")
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(BENCH_LEN - 1)), lambda t: _bench_tok(item, t)
    )
    return spark.range(BENCH_ITEMS).select(
        F.col("id").alias("bench_id"),
        shingle_hashes(shingles(toks, K)).alias("ngram_hashes"),
    )


def corpus_df(spark, n_docs):
    doc = F.col("id")
    leak_kind = F.pmod(doc, F.lit(LEAK_PERIOD))  # 0 full, 1 half
    item = F.pmod((doc / LEAK_PERIOD).cast("long"), F.lit(BENCH_ITEMS))
    half = LEAK_OFF + BENCH_LEN // 2

    def tok(t):
        leak_pos = t - LEAK_OFF
        in_full = (leak_kind == 0) & (t >= LEAK_OFF) & (t < LEAK_OFF + BENCH_LEN)
        in_half = (leak_kind == 1) & (t >= LEAK_OFF) & (t < half)
        common = F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(doc, t, F.lit(SEED)), F.lit(VOCAB)).cast("string"),
        )
        return F.when(in_full | in_half, _bench_tok(item, leak_pos)).otherwise(common)

    toks = F.transform(F.sequence(F.lit(0), F.lit(TOKENS_PER_FILE - 1)), tok)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        shingle_hashes(shingles(toks, K)).alias("ngram_hashes"),
    )


def run_level(spark, n_docs):
    corpus = corpus_df(spark, n_docs)
    bench = bench_df(spark)
    t0 = time.monotonic()
    overlaps = contamination_overlap(corpus, bench, min_overlap=3).localCheckpoint(
        eager=True
    )
    manifest = decontamination_manifest(
        corpus.select("doc_id"), overlaps, threshold=THRESHOLD
    )
    flagged = {
        r.doc_id for r in manifest.filter(F.col("contaminated")).collect()
    }
    wall = time.monotonic() - t0
    planted = {i for i in range(0, n_docs, LEAK_PERIOD)}
    half = {i for i in range(1, n_docs, LEAK_PERIOD)}
    recall = len(flagged & planted) / len(planted)
    false_pos = len(flagged - planted)
    half_flagged = len(flagged & half)
    n_pairs = overlaps.count()
    return dict(
        n_docs=n_docs, wall=wall, recall=recall, false_pos=false_pos,
        half_flagged=half_flagged, n_pairs=n_pairs,
        files_per_s=n_docs / wall,
    )


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big = int(os.environ.get("SPARK_GRAFT_DECON_DOCS", "300000"))
    spark = get_spark("eval-decontam", cores=cpus, shuffle_partitions=cpus)
    levels = [big // 3, big]
    results = [run_level(spark, n) for n in levels]
    spark.stop()

    ratio_docs = results[1]["n_docs"] / results[0]["n_docs"]
    ratio_wall = results[1]["wall"] / results[0]["wall"]
    rows = "\n".join(
        f"| {r['n_docs']:,} | {r['wall']:.1f} | {r['files_per_s']:.0f} "
        f"| {r['n_pairs']:,} | {r['recall']:.3f} | {r['false_pos']} | {r['half_flagged']} |"
        for r in results
    )
    ok = all(r["recall"] == 1.0 and r["false_pos"] == 0 and r["half_flagged"] == 0
             for r in results)
    section = f"""

## Decontamination at scale (scripts/eval_decontam.py)

{BENCH_ITEMS:,}-item benchmark set ({BENCH_LEN} tokens each) probed against a
synthetic corpus with planted leaks: 2% of docs embed a full benchmark
window (containment 1.0 — must be dropped), 2% embed HALF a window
(containment ≈ 0.46 < the {THRESHOLD} threshold — must score but survive).
Broadcast probe, {cpus} cores, min_overlap=3.

| corpus docs | wall (s) | docs/s | scored pairs | leak recall | false drops | half-leaks dropped |
|---|---|---|---|---|---|---|
{rows}

Corpus grew {ratio_docs:.1f}x, wall grew {ratio_wall:.1f}x — the probe cost
is the corpus scan (broadcast join, no corpus shuffle; the plan pin lives in
tests/test_decontam.py). The first level runs first in the session and
absorbs JVM/codegen warmup, so a sub-linear wall ratio is warmup, not
magic — the per-doc floor is the second level's docs/s. Threshold
discrimination: every full leak dropped, every half leak correctly
retained. Gate: **{"PASS" if ok else "FAIL"}**.
"""
    replace_section("BENCH/DECONTAM.md", "\n\n## Decontamination at scale", section)
    hdr = "# Decontamination evidence\n"
    content = open("BENCH/DECONTAM.md").read()
    if not content.startswith("#"):
        with open("BENCH/DECONTAM.md", "w") as f:
            f.write(hdr + content)
    for r in results:
        print({k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()})
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
