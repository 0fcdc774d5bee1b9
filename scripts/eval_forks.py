"""Fork-detection recall + cost at scale for the collection-level family
(``operators/collections.py``): planted fork pairs among distractor repos,
both candidate paths (inverted index vs union-closure MinHash LSH), scored
exactly, clustered, compared to truth.

Corpus (deterministic, generated DISTRIBUTED from spark.range):

* R repos x F files; file (r, j) is a stream of tokens drawn from repo r's
  "identity tokens" (hash-derived) mixed with a SHARED vocabulary at
  ``common_frac`` — repos look alike the way real code does (license
  headers, stdlib idioms) without being forks.
* the last ``n_forks`` repos are FORKS: repo R-1-i copies repo i's files
  and rewrites each token with prob ``edit_rate`` (rename-style drift), so
  the planted repo-level Jaccard sits around (1-edit_rate)/(1+edit_rate).

Truth: fork pair (i, R-1-i) must be recovered (pair recall) and the
lineage labels must match exactly (cluster equality); distractor merges
count against precision.

Writes the '## Fork detection at scale' section of BENCH/FORKS.md.

Usage: python scripts/eval_forks.py
       SPARK_GRAFT_FORK_REPOS=1000 SPARK_GRAFT_FORK_FILES=100 \
       SPARK_GRAFT_CPUS=32 python scripts/eval_forks.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.config import PipelineConfig  # noqa: E402
from sycl_jaccard_spark.functions.minhash import minhash_udf  # noqa: E402
from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes  # noqa: E402
from sycl_jaccard_spark.operators.collections import (  # noqa: E402
    collection_candidates,
    collection_clusters,
    collection_memberships,
    collection_minhash,
    collection_pair_jaccard,
)
from sycl_jaccard_spark.operators.lsh import band_hashes, candidate_pairs  # noqa: E402
from sycl_jaccard_spark.operators.pair_jaccard import (  # noqa: E402
    jaccard_pairs_memberships,
)
from sycl_jaccard_spark.session import get_spark  # noqa: E402

SEED = 42
TOKENS_PER_FILE = 60
COMMON_FRAC = 0.3   # shared-vocabulary tokens per file (boilerplate pressure)
EDIT_RATE = 0.05    # fork token-rewrite probability
THRESHOLD = 0.5     # lineage edge threshold (planted J ~ 0.83 at edit 0.05)
SHINGLE_K = 3


def synth_fork_corpus(spark, n_repos: int, n_files: int):
    """(repo, content) member files, generated distributed; the last
    n_forks repos fork repos 0..n_forks-1. All randomness is xxhash64-
    derived from (source_repo, file, token) so a fork's UNedited tokens
    are bit-identical to its source's."""
    n_forks = max(1, n_repos // 10)
    base = spark.range(n_repos * n_files).select(
        (F.col("id") / n_files).cast("long").alias("rid"),
        (F.col("id") % n_files).alias("file"),
    )
    src = F.when(
        F.col("rid") >= n_repos - n_forks, (n_repos - 1) - F.col("rid")
    ).otherwise(F.col("rid"))
    is_fork = F.col("rid") >= n_repos - n_forks
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_FILE - 1)),
        lambda t: F.when(
            # shared vocabulary: same token text across ALL repos
            F.pmod(F.xxhash64(F.lit("pos"), F.col("file"), t, F.lit(SEED)), F.lit(1000))
            < int(COMMON_FRAC * 1000),
            F.concat(
                F.lit("common"),
                F.pmod(F.xxhash64(F.lit("cv"), F.col("file"), t, F.lit(SEED)), F.lit(500)),
            ),
        ).otherwise(
            F.when(
                # fork edit: rewrite this token under the FORK repo's key
                is_fork
                & (
                    F.pmod(
                        F.xxhash64(F.lit("edit"), F.col("rid"), F.col("file"), t, F.lit(SEED)),
                        F.lit(1000),
                    )
                    < int(EDIT_RATE * 1000)
                ),
                F.concat(
                    F.lit("ed"),
                    F.xxhash64(F.col("rid"), F.col("file"), t, F.lit(SEED)),
                ),
            ).otherwise(
                # identity token keyed by the SOURCE repo -> bit-identical in the fork
                F.concat(F.lit("id"), F.xxhash64(src, F.col("file"), t, F.lit(SEED)))
            )
        ),
    )
    files = base.select(
        F.concat(F.lit("repo"), F.format_string("%06d", F.col("rid"))).alias("repo"),
        F.array_join(toks, " ").alias("content"),
    )
    truth = {
        (f"repo{i:06d}", f"repo{n_repos - 1 - i:06d}") for i in range(n_forks)
    }
    return files, truth, n_forks


def main() -> int:
    n_repos = int(os.environ.get("SPARK_GRAFT_FORK_REPOS", "1000"))
    n_files = int(os.environ.get("SPARK_GRAFT_FORK_FILES", "100"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("eval_forks", cores=cores, shuffle_partitions=cores)
    files, truth, n_forks = synth_fork_corpus(spark, n_repos, n_files)

    cfg = PipelineConfig(
        shingle_k=SHINGLE_K, num_perms=128, bands=32, rows_per_band=4
    )
    t0 = time.monotonic()
    shingled = files.select(
        "repo", doc_shingle_hashes(F.col("content"), cfg).alias("shingle_hashes")
    ).localCheckpoint(eager=True)
    t_shingle = time.monotonic() - t0
    t0 = time.monotonic()
    mem = collection_memberships(shingled, "repo", "shingle_hashes").localCheckpoint(
        eager=True
    )
    t_mem = time.monotonic() - t0

    results = {}
    for mode in ("index", "lsh"):
        t0 = time.monotonic()
        if mode == "index":
            pairs = collection_candidates(mem, max_df=10)
        else:
            signed = shingled.select(
                "repo",
                minhash_udf(cfg.num_perms, cfg.seed)(F.col("shingle_hashes")).alias("sig"),
            ).localCheckpoint(eager=True)
            csig = collection_minhash(signed, "repo", cfg.num_perms)
            banded = band_hashes(csig, cfg, "collection")
            pairs = candidate_pairs(banded, cfg, "collection")
        pairs = pairs.localCheckpoint(eager=True)
        n_cand = pairs.count()
        t_cand = time.monotonic() - t0

        t0 = time.monotonic()
        scored = jaccard_pairs_memberships(mem, pairs, id_col="collection")
        scored = scored.localCheckpoint(eager=True)
        t_verify = time.monotonic() - t0

        hits = {
            (r["a"], r["b"])
            for r in scored.filter(F.col("jaccard") >= THRESHOLD).collect()
        }
        recall = len(hits & truth) / len(truth)
        false_merges = len(hits - truth)

        allc = mem.select("collection").distinct()
        clusters = collection_clusters(scored, threshold=THRESHOLD, collections=allc)
        got = {r["collection"]: r["rep"] for r in clusters.collect()}
        want = {c: c for c in got}
        for a, b in truth:
            want[b] = a
        labels_ok = got == want
        results[mode] = dict(
            n_cand=n_cand, t_cand=t_cand, t_verify=t_verify,
            recall=recall, false_merges=false_merges, labels_ok=labels_ok,
        )
        print(f"{mode}: {results[mode]}")

    n_total = n_repos * n_files
    lines = [
        f"{n_repos} repos × {n_files} files = {n_total} files, {n_forks} planted fork",
        f"pairs (token edit rate {EDIT_RATE} → planted repo-level J ≈"
        f" {(1 - EDIT_RATE) / (1 + EDIT_RATE):.2f}), {int(COMMON_FRAC * 100)}% shared",
        f"boilerplate vocabulary, lineage threshold {THRESHOLD}, {cores} cores.",
        f"Shingle stage {t_shingle:.1f} s; membership relation {t_mem:.1f} s (shared).",
        "",
        "| candidates | pairs emitted | cand wall (s) | verify wall (s) | fork recall | false merges | lineage labels |",
        "|---|---|---|---|---|---|---|",
    ]
    for mode, r in results.items():
        lines.append(
            f"| {mode} | {r['n_cand']} | {r['t_cand']:.1f} | {r['t_verify']:.1f} "
            f"| {r['recall']:.3f} | {r['false_merges']} "
            f"| {'exact' if r['labels_ok'] else 'MISMATCH'} |"
        )
    lines += [
        "",
        "Reading: the index path's pair fan-out is bounded by the rare-shingle",
        "df cap and grows with shared vocabulary; the LSH path emits one",
        "candidate per banded signature collision — at 10^8 collections only",
        "the LSH path's cost stays proportional to the number of collections,",
        "which is why it is the documented scale path (`--candidates lsh`; the CLI",
        "defaults to the exact-recall index path for corpus sizes where it fits).",
    ]
    if not os.path.exists("BENCH/FORKS.md"):
        with open("BENCH/FORKS.md", "w") as f:
            f.write("# Collection-level (fork) detection evidence\n")
    replace_section(
        "BENCH/FORKS.md",
        "\n\n## Fork detection at scale",
        "\n\n## Fork detection at scale (scripts/eval_forks.py)\n\n"
        + "\n".join(lines)
        + "\n",
    )
    print("wrote BENCH/FORKS.md")
    spark.stop()
    ok = all(
        r["recall"] == 1.0 and r["labels_ok"] and r["false_merges"] == 0
        for r in results.values()
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
