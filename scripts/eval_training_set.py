"""Composed training-set action at scale (operators/representatives.py
training_set): planted truth for ALL THREE drop reasons, verified
distributively, cost measured at two corpus sizes.

The composition takes (files, clusters, contam_manifest) as inputs, so this
evaluator synthesizes them directly with exact planted truth (clustering
recall itself is BENCH/RECALL.md's subject; decontamination recall is the
sections above) — what is under test here is the COMPOSITION: reason
precedence, representative succession, and that the action's cost is a
constant number of linear passes over the corpus.

Construction (deterministic, distributed from spark.range, N docs):

* clusters are pairs: docs (2k, 2k+1) share cluster k; the even member is
  LONGER (30 tokens vs 20) so ``longest`` picks it when clean;
* ``doc_id % 50 == 0`` (even) → CONTAMINATED (containment 1.0): its pair
  must fall to the odd member — leak succession;
* ``doc_id % 50 == 8`` (even) → JUNK (one distinct token; fails the
  min_distinct_ratio gate): its pair must fall to the odd member — junk
  succession;
* ``doc_id % 50 == 7`` (odd) → JUNK on the shorter member: must drop as
  ``low_quality``, NOT ``duplicate`` (reason precedence);
* every other even doc keeps; every other odd doc drops as ``duplicate``.

Truth is an exact per-row expression, so verification is a distributed
violation count (no driver-side set materialization). Writes the
"Composed training set" section of BENCH/DECONTAM.md.

Usage: python scripts/eval_training_set.py
       SPARK_GRAFT_TS_DOCS=300000 SPARK_GRAFT_CPUS=32 python scripts/eval_training_set.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.operators.representatives import (  # noqa: E402
    QualityGate,
    training_set,
)
from sycl_jaccard_spark.session import get_spark  # noqa: E402

PERIOD = 50
LONG_TOKS, SHORT_TOKS, JUNK_TOKS = 30, 20, 25
GATE = QualityGate(min_tokens=5, min_distinct_ratio=0.35)


def synth(spark, n_docs):
    doc = F.col("id")
    kind = F.pmod(doc, F.lit(PERIOD))
    junk = (kind == 7) | (kind == 8)
    n_toks = F.when(junk, JUNK_TOKS).otherwise(
        F.when(doc % 2 == 0, LONG_TOKS).otherwise(SHORT_TOKS)
    )
    tok = F.when(junk, F.lit("zz")).otherwise(
        F.concat(F.lit("w"), doc.cast("string"), F.lit("_"), F.col("t").cast("string"))
    )
    files = (
        spark.range(n_docs)
        .select(doc.alias("id"), F.expr(f"sequence(0, {LONG_TOKS - 1})").alias("ts"),
                n_toks.alias("n"))
        .select("id", F.explode(F.slice("ts", 1, F.col("n"))).alias("t"))
        .groupBy("id")
        .agg(F.concat_ws(" ", F.collect_list(tok)).alias("content"))
    )
    clusters = spark.range(n_docs).select(
        doc.alias("id"), (doc / 2).cast("long").alias("cluster")
    )
    contam = spark.range(n_docs).select(
        doc.alias("doc_id"),
        F.when(kind == 0, 1.0).otherwise(0.0).alias("max_containment"),
        (kind == 0).alias("contaminated"),
    )
    return files, clusters, contam


def expected_cols(manifest):
    """Planted-truth expressions joined onto the manifest by id alone."""
    i = F.col("id")
    kind = F.pmod(i, F.lit(PERIOD))
    # an odd member drops as duplicate ONLY when its even partner is clean;
    # succession odds (partner of a kind-0 leak or kind-8 junk) are KEPT
    reason = (
        F.when(kind == 0, "contaminated")
        .when((kind == 7) | (kind == 8), "low_quality")
        .when((i % 2 == 1) & ~kind.isin(1, 9), "duplicate")
    )
    # rep of cluster i//2: the even member unless IT is flagged, else odd
    even = (i / 2).cast("long") * 2
    even_kind = F.pmod(even, F.lit(PERIOD))
    rep = F.when((even_kind == 0) | (even_kind == 8), even + 1).otherwise(even)
    exp_rep = F.when(reason.isin("contaminated", "low_quality"), F.lit(None)).otherwise(rep)
    exp_keep = reason.isNull()
    return reason, exp_rep, exp_keep


def run_level(spark, n_docs):
    files, clusters, contam = synth(spark, n_docs)
    files = files.localCheckpoint(eager=True)  # exclude synth cost from the wall
    clusters = clusters.localCheckpoint(eager=True)
    contam = contam.localCheckpoint(eager=True)
    t0 = time.monotonic()
    kept, manifest = training_set(files, clusters, contam, quality=GATE)
    n_kept = kept.count()
    reason_counts = {
        (r.drop_reason or "kept"): r["count"]
        for r in manifest.groupBy("drop_reason").count().collect()
    }
    wall = time.monotonic() - t0
    exp_reason, exp_rep, exp_keep = expected_cols(manifest)
    violations = manifest.filter(
        ~(
            F.coalesce(F.col("drop_reason") == exp_reason,
                       F.col("drop_reason").isNull() & exp_reason.isNull())
            & F.coalesce(F.col("rep_id") == exp_rep,
                         F.col("rep_id").isNull() & exp_rep.isNull())
            & (F.col("keep") == exp_keep)
        )
    ).count()
    n_total = sum(reason_counts.values())
    return dict(
        n_docs=n_docs, wall=wall, n_kept=n_kept, n_total=n_total,
        violations=violations, reasons=reason_counts,
        files_per_s=n_docs / wall,
    )


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big = int(os.environ.get("SPARK_GRAFT_TS_DOCS", "300000"))
    spark = get_spark("eval-training-set", cores=cpus, shuffle_partitions=cpus)
    results = [run_level(spark, n) for n in (big // 3, big)]
    spark.stop()

    ok = all(
        r["violations"] == 0 and r["n_total"] == r["n_docs"]
        and r["n_kept"] == r["reasons"].get("kept", 0)
        for r in results
    )
    ratio_docs = results[1]["n_docs"] / results[0]["n_docs"]
    ratio_wall = results[1]["wall"] / results[0]["wall"]
    rows = "\n".join(
        f"| {r['n_docs']:,} | {r['wall']:.1f} | {r['files_per_s']:.0f} "
        f"| {r['reasons'].get('kept', 0):,} | {r['reasons'].get('contaminated', 0):,} "
        f"| {r['reasons'].get('low_quality', 0):,} | {r['reasons'].get('duplicate', 0):,} "
        f"| {r['violations']} |"
        for r in results
    )
    section = f"""

## Composed training set (scripts/eval_training_set.py)

`training_set` (decontaminate → quality gate → dedup survivors) over a
synthetic corpus with planted truth for EVERY row: pair clusters whose
longer member is sometimes a leak (doc % {PERIOD} == 0) or junk
(doc % {PERIOD} == 8) — both must fall to the shorter clean member
(representative succession) — plus junk shorter members
(doc % {PERIOD} == 7) that must drop as `low_quality`, not `duplicate`
(reason precedence). Verification is a distributed violation count of
reason, rep_id and keep against the planted truth — zero rows collected.
{cpus} cores; gate: min_tokens=5, min_distinct_ratio=0.35.

| corpus docs | wall (s) | docs/s | kept | contaminated | low_quality | duplicate | violations |
|---|---|---|---|---|---|---|---|
{rows}

Corpus grew {ratio_docs:.1f}x, wall grew {ratio_wall:.1f}x — the action is
a constant number of linear passes (broadcast anti-join for leaks, inline
quality filter, one rank window per cluster; plan pin in
tests/test_plans.py). Succession and precedence hold at every planted
site. Gate: **{"PASS" if ok else "FAIL"}**.
"""
    replace_section("BENCH/DECONTAM.md", "\n\n## Composed training set", section)
    for r in results:
        print({k: (round(v, 2) if isinstance(v, float) else v) for k, v in r.items()})
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
