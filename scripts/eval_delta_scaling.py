"""Delta-mode N vs 4N scaling — the north rule's two-cluster-size criterion
applied to the INCREMENTAL path (BENCH/BASELINE.md covers the batch
pipeline; this covers the per-delivery `DeltaDedup.add_batch` that a living
100 TB corpus actually pays every day).

Protocol mirrors `bench.py --scaling`: one subprocess per parallelism
level (fresh JVM — recreating a session with a different master in the
same JVM degrades the second run), levels interleaved A B A B so
noisy-neighbor periods hit both equally, best-of-N min estimator (noise on
this shared box only ever ADDS wall), AQE off inside the measurement (its
driver-side re-planning is a fixed serial cost at sandbox scale).

Each observation is the SAME work item: a fresh clone of a bootstrapped
store + one identical probe delivery of near-dups of stored content (the
worst case — every probe file touches stored buckets). Cloning per repeat
keeps the batch id and the store view identical across observations, so
the walls are comparable.

Usage: python scripts/eval_delta_scaling.py       # 40k store, 10k probe
       SPARK_GRAFT_DELTA_STORE=20000 SPARK_GRAFT_DELTA_PROBE=5000 ...
Writes/updates the '## Delta scaling' section of BENCH/DELTA.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts._bench_md import replace_section  # noqa: E402
from sycl_jaccard_spark.config import PipelineConfig  # noqa: E402
from sycl_jaccard_spark.plans.delta import DeltaDedup  # noqa: E402
from sycl_jaccard_spark.session import get_spark  # noqa: E402
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files  # noqa: E402
from sycl_jaccard_spark.sources.tables import with_file_id  # noqa: E402

REPEATS_PER_WORKER = 2


def worker(cores: int, store_src: str, probe_path: str) -> None:
    spark = get_spark(f"delta_scale{cores}", cores=cores, shuffle_partitions=cores)
    probe = spark.read.parquet(probe_path).localCheckpoint(eager=True)
    n = probe.count()
    # warmup OUTSIDE the timed window: per-core Python UDF worker fork +
    # shuffle-path JIT are cluster-startup costs, not delivery throughput
    from sycl_jaccard_spark.operators.lsh import minhash_signatures

    warm = probe.limit(max(cores * 8, 64)).repartition(cores).select(
        "id", F.array(F.xxhash64("content")).alias("shingle_hashes")
    )
    minhash_signatures(warm, PipelineConfig()).count()

    walls, stages_best = [], {}
    for rep in range(REPEATS_PER_WORKER):
        clone = tempfile.mkdtemp(prefix=f"delta_scale_{cores}_{rep}_")
        shutil.rmtree(clone)
        shutil.copytree(store_src, clone)
        store = DeltaDedup(spark, clone, PipelineConfig())
        t0 = time.monotonic()
        store.add_batch(probe)
        wall = time.monotonic() - t0
        if not walls or wall < min(walls):
            stages_best = {
                m["stage"]: m["wall_s"]
                for m in store.metrics
                if m["stage"] != "batch_total"
            }
        walls.append(wall)
        shutil.rmtree(clone, ignore_errors=True)
        spark._jvm.System.gc()
    spark.stop()
    print(json.dumps(
        {"wall_s": min(walls), "runs": walls, "n_probe": n, "stages": stages_best}
    ))


def main() -> int:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(int(sys.argv[i + 1]), sys.argv[i + 2], sys.argv[i + 3])
        return 0

    n_store = int(os.environ.get("SPARK_GRAFT_DELTA_STORE", "40000"))
    n_probe = int(os.environ.get("SPARK_GRAFT_DELTA_PROBE", "10000"))
    report_md = os.environ.get("SPARK_GRAFT_DELTA_MD", "BENCH/DELTA.md")
    # Same refusal bench.py --scaling applies: below these floors the walls
    # are fixed-overhead-bound (job scheduling, UDF worker fork, store
    # listing) and the efficiency number measures overhead, not the engine.
    # Tiny dry runs must point SPARK_GRAFT_DELTA_MD away from the curated
    # report so they can never clobber real evidence.
    MIN_PROBE, MIN_STORE = 5_000, 20_000
    if report_md == "BENCH/DELTA.md" and (n_probe < MIN_PROBE or n_store < MIN_STORE):
        print(json.dumps({
            "error": f"delta scaling requires store >= {MIN_STORE} and probe >= "
                     f"{MIN_PROBE} (got {n_store}/{n_probe}): tiny deliveries are "
                     "fixed-overhead-bound; set SPARK_GRAFT_DELTA_MD to a scratch "
                     "path for dry runs — no report written",
        }))
        return 2
    levels = tuple(
        int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,4").split(",")
    )
    n_rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    # A pre-built fixture (store/ + probe.parquet, same generator code below)
    # lets repeated measurement skip the multi-minute bootstrap — the fixture
    # dir is reused read-only (workers clone the store per observation).
    fixture = os.environ.get("SPARK_GRAFT_DELTA_FIXTURE")
    if fixture:
        work_dir = None
        store_src = f"{fixture}/store"
        probe_path = f"{fixture}/probe.parquet"
        if not (os.path.isdir(store_src) and os.path.exists(probe_path)):
            print(json.dumps({"error": f"fixture {fixture} missing store/ or probe.parquet"}))
            return 2
    else:
        work_dir = tempfile.mkdtemp(prefix="delta_scaling_")
        store_src = f"{work_dir}/store"
        probe_path = f"{work_dir}/probe.parquet"

        # bootstrap once (its wall is NOT part of the measurement): a planted-
        # cluster corpus ingested as batch 0, plus one probe delivery of
        # near-dups of stored content written to parquet
        gen = get_spark("delta_scale_gen", cores=8, shuffle_partitions=8)
        spec = CorpusSpec(
            n_files=n_store, n_clusters=n_store // 8, cluster_min=2, cluster_max=6,
            edit_rate=0.06, exact_dup_rate=0.25, seed=777,
        )
        files, _ = synth_source_files(gen, spec)
        files = with_file_id(files).localCheckpoint(eager=True)
        DeltaDedup(gen, store_src, PipelineConfig()).add_batch(files)
        (
            files.limit(n_probe)
            .select(
                F.col("id").bitwiseXOR(F.lit(1 << 41)).alias("id"),
                F.concat(F.col("content"), F.lit("\nprobe = scale")).alias("content"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(probe_path)
        )
        gen.stop()

    all_walls: dict[int, list[float]] = {}
    best_stages: dict[int, dict] = {}
    for _round in range(n_rounds):
        for cores in levels:
            out = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(cores), store_src, probe_path,
                ],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            prev_best = min(all_walls.get(cores, [float("inf")]))
            if r["wall_s"] < prev_best:
                best_stages[cores] = r["stages"]
            all_walls.setdefault(cores, []).extend(r["runs"])
            print(f"local[{cores}] walls so far: "
                  + ", ".join(f"{w:.1f}" for w in sorted(all_walls[cores])))

    n_lo, n_hi = levels
    best = {c: min(w) for c, w in all_walls.items()}
    thr = {c: n_probe / best[c] for c in best}
    ratio = n_hi // n_lo
    eff = thr[n_hi] / (ratio * thr[n_lo])
    if work_dir:
        shutil.rmtree(work_dir, ignore_errors=True)

    # marker must stay specific: DELTA.md also carries a hand-written
    # '## Delta scaling — measurement history' section that must survive
    marker = "## Delta scaling — N vs 4N"
    section = (
        f"{marker} cores on one probe delivery "
        "(scripts/eval_delta_scaling.py)\n\n"
        f"Store bootstrapped with {n_store:,} files (batch 0); each\n"
        "observation = fresh clone of that store + one identical\n"
        f"{n_probe:,}-file probe delivery of near-dups of stored content\n"
        "(worst case: every probe file touches stored buckets). One\n"
        "subprocess per level, levels interleaved, best-of-"
        f"{n_rounds * REPEATS_PER_WORKER} per level, AQE off (same protocol\n"
        "as the batch gate in BENCH/BASELINE.md).\n\n"
        "| parallelism | best wall (s) | probe files/sec | observed walls (s) |\n"
        "|---|---|---|---|\n"
        + "".join(
            f"| local[{c}] | {best[c]:.2f} | {thr[c]:.1f} | "
            + ", ".join(f"{w:.1f}" for w in sorted(all_walls[c]))
            + " |\n"
            for c in levels
        )
        + f"\n`eff = thr@{n_hi} / ({ratio} x thr@{n_lo}) = **{eff:.3f}**`"
        " (north-rule target >= 0.8 — the incremental path is the same\n"
        "broadcast-pruned DataFrame plan as the batch stages, just over\n"
        "Δ-sized inputs).\n\n"
        "Per-stage wall seconds (best run per level):\n\n"
        "| stage | " + " | ".join(f"local[{c}]" for c in levels) + " | ratio |\n"
        "|---|" + "---|" * (len(levels) + 1) + "\n"
        + "".join(
            f"| {stage} | "
            + " | ".join(f"{best_stages[c].get(stage, 0.0):.2f}" for c in levels)
            + " | "
            + (
                f"{best_stages[n_lo].get(stage, 0.0) / best_stages[n_hi][stage]:.2f}"
                if best_stages[n_hi].get(stage, 0.0) >= 0.5
                else "— (sub-1s)"
            )
            + " |\n"
            for stage in best_stages.get(n_lo, {})
        )
        + "\n"
    )
    replace_section(report_md, marker, section)
    print(json.dumps({"best": best, "throughput": thr, "efficiency": eff}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
