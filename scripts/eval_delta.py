"""Measure the delta (incremental) dedup cost claim — per-batch wall must
track the BATCH size, not the corpus size (VERDICT r4 #1 'done' criterion).

Protocol: bootstrap a store with B0 files, then alternate growth batches
(corpus doubling) with identically-sized PROBE batches of near-dups of
stored content. The probe walls at growing store sizes are the evidence:
flat-ish walls = per-batch cost ∝ batch; a full-pipeline rerun over the
final corpus is the comparison point (what a batch-only engine would pay
per delivery).

Each (grow → probe → remove) delivery triple runs in its OWN fresh
SparkSession against the persisted store. This is both the real
operational shape (a delivery is its own job attaching to the store) and
the fair measurement: a single long-lived session accumulates driver-side
block-manager state (localCheckpoint blocks from earlier 300k-file grows)
that polluted later probes — an in-run third probe measured 47s while a
fresh probe on the SAME ~900k store measured 16.5s. Fresh sessions make
every probe positionally identical: warmup → grow → probe → remove.

Usage: python scripts/eval_delta.py          # 20k/40k/60k stores, 2k probes
       SPARK_GRAFT_DELTA_FILES=8000 SPARK_GRAFT_DELTA_PROBE=1000 ...
Writes/updates the '## Incremental (delta) dedup' section of BENCH/DELTA.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.config import PipelineConfig  # noqa: E402
from sycl_jaccard_spark.plans.delta import DeltaDedup  # noqa: E402
from sycl_jaccard_spark.plans.pipeline import DedupPipeline  # noqa: E402
from sycl_jaccard_spark.session import get_spark  # noqa: E402
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files  # noqa: E402
from sycl_jaccard_spark.sources.tables import with_file_id  # noqa: E402


def _fresh_spark(cores: int):
    return get_spark("eval_delta", cores=cores, shuffle_partitions=cores)


def _read_seg(spark, store_dir: str, i: int):
    return spark.read.parquet(f"{store_dir}/segments/seg{i}")


def _probe_batch(seg, n_probe: int, j: int):
    """n_probe near-dup/exact-dup copies of stored content — the worst
    case for the store join (every probe file touches stored buckets).
    orderBy before limit: deterministic across sessions/parquet reads."""
    return (
        seg.orderBy("id").limit(n_probe)
        .select(
            F.col("id").bitwiseXOR(F.lit((10 + j) * (1 << 41))).alias("id"),
            F.concat(F.col("content"), F.lit(f"\nprobe = {j}")).alias("content"),
        )
        .localCheckpoint(eager=True)
    )


def _warmup(spark, store_dir: str, cfg, seg, n_probe: int) -> None:
    """Untimed warmup delivery against a throwaway store: JVM codegen, Arrow
    and Python-worker startup otherwise land in the first timed op of each
    session (first rows measured ~3-8x slower than identical later work)."""
    warm = DeltaDedup(spark, f"{store_dir}/warm", cfg)
    warm.add_batch(seg.orderBy("id").limit(500))
    warm.add_batch(_probe_batch(seg, min(500, n_probe), 99))
    shutil.rmtree(f"{store_dir}/warm", ignore_errors=True)


def main() -> int:
    n_seg = int(os.environ.get("SPARK_GRAFT_DELTA_FILES", "20000"))  # per growth segment
    n_probe = int(os.environ.get("SPARK_GRAFT_DELTA_PROBE", "2000"))
    n_rm = int(os.environ.get("SPARK_GRAFT_DELTA_REMOVE", "500"))
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = PipelineConfig()
    store_dir = tempfile.mkdtemp(prefix="delta_store_")

    # ---- session 0: synthesize the three growth segments to parquet ----
    spark = _fresh_spark(cores)
    for i in range(3):
        spec = CorpusSpec(
            n_files=n_seg, n_clusters=n_seg // 8, cluster_min=2, cluster_max=6,
            edit_rate=0.06, exact_dup_rate=0.25, seed=100 + i,
        )
        files, _ = synth_source_files(spark, spec)
        (
            with_file_id(files)
            .select(F.col("id").bitwiseXOR(F.lit(i * (1 << 45))).alias("id"), "content")
            .write.mode("overwrite").parquet(f"{store_dir}/segments/seg{i}")
        )
    spark.stop()

    # ---- one fresh session per delivery triple (grow → probe×2 → remove×2):
    # the real operational cadence, and positionally identical measurement
    # state at every store size ----
    rows = []
    rm_rows = []
    corpus_size = 0
    for i in range(3):
        spark = _fresh_spark(cores)
        seg = _read_seg(spark, store_dir, i)
        _warmup(spark, store_dir, cfg, seg, n_probe)
        store = DeltaDedup(spark, f"{store_dir}/store", cfg)

        t0 = time.monotonic()
        store.add_batch(seg)
        grow_wall = time.monotonic() - t0
        corpus_size += n_seg
        # best-of-2 probes per store size (min-estimator discipline — noise
        # on this shared box only ever ADDS wall time; single observations
        # carry a 1.5x swing that would dominate the growth ratio)
        probe_wall = float("inf")
        for rep in range(2):
            pb = _probe_batch(seg, n_probe, 2 * i + rep)
            t0 = time.monotonic()
            summary = store.add_batch(pb)
            probe_wall = min(probe_wall, time.monotonic() - t0)
            corpus_size += n_probe
        rows.append((corpus_size, n_seg, grow_wall, n_probe, probe_wall, summary["n_new_edges"]))
        # removal probe: best-of-2 over DISJOINT same-shape sets (a replayed
        # removal is idempotent-by-state and would measure nothing); sets are
        # drawn past the probe region so every removal hits the same cluster
        # shape regardless of store size — flat walls here evidence cost ∝
        # affected components, not corpus
        rm_wall, rm_summary = float("inf"), {}
        for rep in range(2):
            rm_set = (
                seg.select("id").orderBy("id")
                .offset(n_probe + rep * n_rm).limit(n_rm)
                .localCheckpoint(eager=True)
            )
            t0 = time.monotonic()
            s = store.remove_ids(rm_set)
            if time.monotonic() - t0 < rm_wall:
                rm_wall, rm_summary = time.monotonic() - t0, s
            corpus_size -= s["n_removed"]
        rm_rows.append(
            (corpus_size, n_rm, rm_wall,
             rm_summary["n_affected_components"], rm_summary["n_members_fixed"])
        )
        print(
            f"store={corpus_size}: grow({n_seg})={grow_wall:.1f}s "
            f"probe({n_probe})={probe_wall:.1f}s remove({n_rm})={rm_wall:.1f}s",
            flush=True,
        )
        spark.stop()

    # ---- final session: batch-engine comparison point + compaction ----
    spark = _fresh_spark(cores)
    seg0 = _read_seg(spark, store_dir, 0)
    _warmup(spark, store_dir, cfg, seg0, n_probe)
    store = DeltaDedup(spark, f"{store_dir}/store", cfg)

    # comparison point: one full-pipeline run over the final corpus — the
    # per-delivery price of a batch-only engine
    full_corpus = seg0
    for i in range(1, 3):
        full_corpus = full_corpus.unionByName(_read_seg(spark, store_dir, i))
    t0 = time.monotonic()
    res = DedupPipeline(spark, cfg, count_rows=False).run(full_corpus)
    res.clusters.count()
    full_wall = time.monotonic() - t0
    print(f"full pipeline over {3 * n_seg} files: {full_wall:.1f}s", flush=True)

    # -- compaction payoff: fragment the store with many tiny deliveries
    # (the daily-cadence shape), CLONE it, compact only the clone, then
    # deliver IDENTICAL probe batches to both stores interleaved (order
    # alternated per round, best-of-2 each) — the wall delta is pure
    # store-layout cost, with session drift cancelled by interleaving --
    n_tiny = int(os.environ.get("SPARK_GRAFT_DELTA_TINY_BATCHES", "20"))
    for j in range(n_tiny):
        store.add_batch(
            _read_seg(spark, store_dir, j % 3).orderBy("id").limit(200).select(
                F.col("id").bitwiseXOR(F.lit((100 + j) * (1 << 41))).alias("id"),
                F.concat(F.col("content"), F.lit(f"\ntiny = {j}")).alias("content"),
            )
        )

    def count_part_files(root: str) -> int:
        n = 0
        for _dirpath, _dirs, fnames in os.walk(root):
            n += sum(1 for f in fnames if f.startswith("part-") and f.endswith(".parquet"))
        return n

    clone = f"{store_dir}/clone"
    shutil.copytree(f"{store_dir}/store", clone)
    cstore = DeltaDedup(spark, clone, cfg)
    csum = cstore.compact()
    files_before = count_part_files(f"{store_dir}/store")
    files_after = count_part_files(clone)
    walls: dict[str, list[float]] = {"frag": [], "compact": []}
    for rnd in range(2):
        pb = _probe_batch(_read_seg(spark, store_dir, rnd), n_probe, 20 + rnd)
        order = [("frag", store), ("compact", cstore)]
        if rnd % 2:
            order.reverse()
        for name, st in order:
            t0 = time.monotonic()
            st.add_batch(pb)
            walls[name].append(time.monotonic() - t0)
    frag_probe_wall = min(walls["frag"])
    compact_probe_wall = min(walls["compact"])
    print(
        f"compaction: {files_before} part files -> {files_after}; probe "
        f"{frag_probe_wall:.1f}s (fragmented, {csum['n_batches']} batches) vs "
        f"{compact_probe_wall:.1f}s (compacted); fold wall {csum['wall_s']}s",
        flush=True,
    )

    probe_walls = [r[4] for r in rows]
    growth = probe_walls[-1] / probe_walls[0] if probe_walls[0] else float("inf")
    corpus_growth = rows[-1][0] / rows[0][0]
    verdict = "PASS" if growth < corpus_growth / 2 else "FAIL"
    rm_walls = [r[2] for r in rm_rows]
    rm_growth = rm_walls[-1] / rm_walls[0] if rm_walls[0] else float("inf")
    rm_verdict = "PASS" if rm_growth < corpus_growth / 2 else "FAIL"

    lines = "\n".join(
        f"| {r[0]:,} | {r[1]:,} | {r[2]:.1f} | {r[3]:,} | {r[4]:.1f} |" for r in rows
    )
    rm_lines = "\n".join(
        f"| {r[0]:,} | {r[1]:,} | {r[2]:.1f} | {r[3]:,} | {r[4]:,} |" for r in rm_rows
    )
    replace_section("BENCH/DELTA.md", "\n\n## Incremental (delta) dedup", f"""

## Incremental (delta) dedup — per-batch cost vs corpus size (scripts/eval_delta.py)

local[{cores}], config defaults (MinHash 128, LSH 32x4, SimHash on). Each
delivery triple (grow → probe → remove) runs in its own fresh SparkSession
attached to the persisted store — the real per-delivery job shape, and the
fair protocol: a long-lived session accumulates localCheckpoint blocks from
earlier grows that polluted later probes (47s in-run vs 16.5s fresh on the
same store). Probe batches are {n_probe:,} near-dups of STORED content
(worst case: every probe file touches stored buckets); probe walls are
best-of-2 (min-estimator — single observations on this box carry a 1.5x
swing). Corpus grew {corpus_growth:.1f}x across probes; probe wall grew
{growth:.2f}x -> **{verdict}** (per-batch cost tracks batch size, not
corpus size).

| store size after | growth batch | wall (s) | probe batch | probe wall (s) |
|---|---|---|---|---|
{lines}

One FULL pipeline run over the final {3 * n_seg:,}-file corpus
(what a batch-only engine pays per delivery): **{full_wall:.1f} s** vs
**{probe_walls[-1]:.1f} s** for the delta probe at the same store size —
**{full_wall / probe_walls[-1]:.1f}x** cheaper per delivery.

### Removals (store.remove_ids())

Same protocol for the SHRINK half: at each store size, tombstone
{n_rm} same-shape ids (best-of-2 over disjoint sets drawn past the probe
region, so every removal hits the same planted-cluster shape). Corpus grew
{corpus_growth:.1f}x; removal wall grew {rm_growth:.2f}x ->
**{rm_verdict}** (removal cost tracks the affected components, not the
corpus). A batch-only engine pays a full rerun over the survivors per
takedown — ~**{full_wall:.1f} s** at the final size vs
**{rm_walls[-1]:.1f} s** here (**{full_wall / rm_walls[-1]:.1f}x**).

| store size after | removed ids | wall (s) | affected components | members re-labeled |
|---|---|---|---|---|
{rm_lines}

### Compaction (store.compact())

After {n_tiny} additional tiny (200-file) deliveries — the daily-cadence
fragmentation shape — the store held {csum["n_batches"]} batch partitions /
{files_before:,} parquet part files; compact() on a cloned copy folded them
to {files_after:,} files in {csum["wall_s"]:.1f} s. IDENTICAL probe batches
delivered to both stores, interleaved, order alternated, best-of-2:
**{frag_probe_wall:.1f} s fragmented vs {compact_probe_wall:.1f} s
compacted**. At sandbox scale the listing/footer cost the fold removes is
small — the operational case is object storage at thousands of batches,
where per-file LIST/GET dominates scan planning; rows and labels are
proven invariant in tests/test_delta.py.
""")
    shutil.rmtree(store_dir, ignore_errors=True)
    spark.stop()
    return 0 if verdict == "PASS" and rm_verdict == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
