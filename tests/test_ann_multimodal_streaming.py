"""Tests for ANN (cosine top-k + hyperplane LSH), multimodal plumbing, and
streaming incremental signatures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sycl_jaccard_spark.config import PipelineConfig
from sycl_jaccard_spark.operators.ann import cosine_topk, lsh_cosine_candidates
from sycl_jaccard_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)
from sycl_jaccard_spark.functions.minhash import make_perms, minhash_batch
from sycl_jaccard_spark.streaming.ingest import incremental_signatures, read_file_stream
from sycl_jaccard_spark.sources.corpus import CorpusSpec, synth_source_files


def _vec_rows(n=40, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    return [(i, v[i].tolist()) for i in range(n)], v


def test_cosine_topk_vs_numpy(spark):
    rows, v = _vec_rows()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = cosine_topk(df.filter(F.col("vec_id") < 5), df, k=3).collect()
    # numpy oracle on the same quantization
    q = np.round(v.astype(np.float64) * 10000)
    sims = (q @ q.T) / (np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(q, axis=1)[None, :])
    for qid in range(5):
        order = sorted(
            (i for i in range(len(v)) if i != qid), key=lambda i: (-sims[qid, i], i)
        )[:3]
        got_q = sorted([r for r in got if r.query_id == qid], key=lambda r: r.rank)
        assert [r.neighbor_id for r in got_q] == order
        for r in got_q:
            assert r.cosine == pytest.approx(sims[qid, r.neighbor_id], abs=1e-9)


def test_lsh_cosine_candidates_recall_of_near_duplicates(spark):
    """Planted near-identical vectors must share a band."""
    rng = np.random.default_rng(9)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(20)]
    # ids 100+i = tiny perturbation of i -> near-parallel vectors
    rows += [(100 + i, (base[i] + 0.01 * rng.standard_normal(16).astype(np.float32)).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cands = {(r.a, r.b) for r in lsh_cosine_candidates(df, dim=16, n_planes=32, bands=4).collect()}
    hit = sum(1 for i in range(20) if (i, 100 + i) in cands)
    assert hit >= 19  # near-parallel pairs collide in ≥1 of 4 bands


def test_lsh_cosine_bucket_cap_bounds_pairs(spark):
    """A degenerate bucket (many copies of one vector -> one dominant
    sign-pattern) must not go quadratic: with bucket_cap=c the pair count is
    bounded by bands * C(c, 2), the text-path bound (operators/lsh.py)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    rows = [(i, base.tolist()) for i in range(60)]  # 60 identical vectors
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    capped = lsh_cosine_candidates(df, dim=16, n_planes=32, bands=4, bucket_cap=8).collect()
    assert len(capped) <= 4 * (8 * 7) // 2
    uncapped = lsh_cosine_candidates(df, dim=16, n_planes=32, bands=4, bucket_cap=10**9).collect()
    assert len(uncapped) == (60 * 59) // 2
    # no silent caps: the drop counter reports exactly what the cap removed
    from sycl_jaccard_spark.operators.ann import lsh_capped_members

    assert lsh_capped_members(df, dim=16, n_planes=32, bands=4, bucket_cap=8) == 4 * (60 - 8)
    assert lsh_capped_members(df, dim=16, n_planes=32, bands=4, bucket_cap=10**9) == 0


def test_ivf_capped_members_counter(spark):
    """IVF path drop counter: 30 identical vectors land in the same nprobe
    lists; cap c drops (30 - c) memberships per probed list."""
    from sycl_jaccard_spark.operators.ann import ivf_capped_members

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, base.tolist()) for i in range(30)], ["vec_id", "embedding"]
    )
    assert (
        ivf_capped_members(df, dim=16, n_centroids=8, nprobe=2, bucket_cap=10)
        == 2 * (30 - 10)
    )
    assert ivf_capped_members(df, dim=16, n_centroids=8, nprobe=2, bucket_cap=10**9) == 0


def test_ann_at_realistic_dim_768(spark):
    """The matmul pandas UDF exists for real embedding dims (768-1536): at
    dim=768 the hyperplane path must keep near-parallel recall and the IVF +
    exact-cosine near-dup chain must find exactly the planted twins (plan
    sanity for the r1 literal-explosion fix — no 768-literal projections)."""
    from sycl_jaccard_spark.operators.ann import embedding_near_dups

    rng = np.random.default_rng(21)
    n, dim = 60, 768
    base = rng.standard_normal((n, dim)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(n)]
    # planted near-dups: 1000+i ~ i (cosine ~0.99995); random 768-dim pairs
    # concentrate near 0, so threshold 0.9 isolates exactly the twins
    rows += [
        (1000 + i, (base[i] + 0.01 * rng.standard_normal(dim).astype(np.float32)).tolist())
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cands = {
        (r.a, r.b)
        for r in lsh_cosine_candidates(df, dim=dim, n_planes=32, bands=4).collect()
    }
    lsh_hits = sum(1 for i in range(10) if (i, 1000 + i) in cands)
    assert lsh_hits >= 9
    dups = {
        (r.a, r.b): r.cosine
        for r in embedding_near_dups(
            df, dim=dim, threshold=0.9, method="ivf", n_centroids=8, nprobe=3
        ).collect()
    }
    assert set(dups) == {(i, 1000 + i) for i in range(10)}
    assert all(c > 0.99 for c in dups.values())


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", "image/png", 64, 64, None, b"\x89PNGfakebytes"),
        (2, "audio", "audio/wav", None, None, 2000, b"RIFFfakebytes"),
        (3, "video", "video/mp4", 320, 240, 3000, b"\x00\x00mp4fake"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media, dim=8, deterministic_fake=True).collect()
    assert {r.media_id for r in feats} == {1, 2, 3}
    assert all(len(r.feature) == 8 for r in feats)
    assert {r.media_id: r.n_bytes for r in feats}[1] == len(b"\x89PNGfakebytes")
    # determinism: same payload -> same feature
    again = extract_features(media, dim=8, deterministic_fake=True).collect()
    assert {r.media_id: r.feature for r in feats} == {r.media_id: r.feature for r in again}
    # real decode is an explicit stub
    with pytest.raises(Exception):
        extract_features(media, dim=8, deterministic_fake=False).collect()
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert [r.frame_ts for r in frames if r.media_id == 3] == [0, 1000, 2000, 3000]


def test_streaming_incremental_signatures(spark, tmp_path):
    """availableNow file-source stream: signatures equal the batch path."""
    files, _ = synth_source_files(spark, CorpusSpec(n_files=30, n_clusters=5))
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    files.write.parquet(src)
    cfg = PipelineConfig(num_perms=16, bands=4, rows_per_band=4)
    stream = incremental_signatures(read_file_stream(spark, src), cfg)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 30
    assert set(got.columns) >= {"id", "sha256", "shingle_hashes", "sig"}
    # cross-check one row's signature against the NumPy batch implementation
    row = got.orderBy("id").first()
    a, b = make_perms(16, 42)
    import pandas as pd

    expect = list(minhash_batch(pd.Series([row.shingle_hashes]), a, b)[0])
    assert row.sig == expect


def test_ivf_candidates_recall_and_cap(spark):
    """IVF inverted lists: near-identical vectors land in the same coarse
    cell (recall), and the per-list cap bounds the self-join."""
    from sycl_jaccard_spark.operators.ann import ivf_candidates

    rng = np.random.default_rng(11)
    base = rng.standard_normal((15, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(15)]
    rows += [
        (100 + i, (base[i] + 0.01 * rng.standard_normal(16).astype(np.float32)).tolist())
        for i in range(15)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cands = {
        (r.a, r.b)
        for r in ivf_candidates(df, dim=16, n_centroids=8, nprobe=2, bucket_cap=10**9).collect()
    }
    hit = sum(1 for i in range(15) if (i, 100 + i) in cands)
    assert hit == 15  # perturbed twins share the nearest cell

    capped = ivf_candidates(df, dim=16, n_centroids=2, nprobe=1, bucket_cap=4).collect()
    assert len(capped) <= 2 * (4 * 3) // 2  # <= n_lists * C(cap, 2)


def test_multimodal_resize_plumbing(spark):
    """resize_plan computes aspect-preserving fit-within targets JVM-side;
    resize_images keeps the media schema with updated dims; real resample is
    an explicit stub."""
    from sycl_jaccard_spark.operators.multimodal import resize_images, resize_plan

    rows = [
        (1, "image", "image/png", 640, 480, None, b"\x89PNGfakebytes"),
        (2, "image", "image/png", 100, 50, None, b"\x89PNGtiny"),
        (3, "video", "video/mp4", 320, 240, 3000, b"\x00\x00mp4fake"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    plan = {r.media_id: (r.target_w, r.target_h) for r in resize_plan(media, 256, 256).collect()}
    assert plan[1] == (256, 192)   # 640x480, scale = min(256/640, 256/480, 1) = 0.4
    assert plan[2] == (100, 50)    # never upscale
    out = resize_images(media, 256, 256, deterministic_fake=True).collect()
    assert {r.media_id for r in out} == {1, 2}  # images only
    got = {r.media_id: (r.width, r.height) for r in out}
    assert got[1] == (256, 192) and got[2] == (100, 50)
    assert all(isinstance(r.payload, (bytes, bytearray)) and len(r.payload) > 0 for r in out)
    with pytest.raises(Exception):
        resize_images(media, deterministic_fake=False).collect()


def test_train_ivf_centroids_improves_codebook(spark):
    """Lloyd training: (1) the k-means objective (total squared distance to
    the assigned centroid, exact int space) is no worse than at init; (2) the
    trained codebook drops into ivf_candidates and still recalls planted
    near-identical twins; (3) determinism — two runs are bit-identical."""
    from sycl_jaccard_spark.operators.ann import (
        init_centroids,
        ivf_candidates,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((4, 16)) * 2.0
    pts = np.concatenate(
        [centers[i] + 0.1 * rng.standard_normal((12, 16)) for i in range(4)]
    ).astype(np.float32)
    rows = [(i, pts[i].tolist()) for i in range(len(pts))]
    rows += [
        (100 + i, (pts[i] + 0.001 * rng.standard_normal(16).astype(np.float32)).tolist())
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    trained = train_ivf_centroids(df, dim=16, n_centroids=4, n_iters=3, seed=7)
    again = train_ivf_centroids(df, dim=16, n_centroids=4, n_iters=3, seed=7)
    assert np.array_equal(trained, again)

    vq = np.round(pts.astype(np.float64) * 10000)

    def objective(cents):
        d2 = ((vq[:, None, :] - cents[None, :, :].astype(np.float64)) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    assert objective(trained) <= objective(init_centroids(16, 4, 7))

    cands = {
        (r.a, r.b)
        for r in ivf_candidates(
            df, dim=16, nprobe=1, bucket_cap=10**9, centroids_q=trained
        ).collect()
    }
    hit = sum(1 for i in range(10) if (i, 100 + i) in cands)
    assert hit == 10  # twins share the trained cell even at nprobe=1


def test_streaming_watermarked_exact_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark on sha256: duplicate contents arriving
    within the watermark window collapse to one row, distinct contents all
    pass, and the query maintains bounded keyed state (the middle ground
    between the stateless map-only stream and full batch dedup)."""
    from sycl_jaccard_spark.streaming.ingest import watermarked_exact_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        ("r1", f"f{i}.py", "c1", "py", f"unique content {i}") for i in range(10)
    ] + [
        ("r2", f"g{i}.py", "c2", "py", f"unique content {i}") for i in range(4)
    ]  # 4 exact dups of the first corpus
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(src)

    stream = watermarked_exact_dedup(read_file_stream(spark, src), delay="1 hour")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 10  # one survivor per distinct content
    assert got.select("sha256").distinct().count() == 10


def test_streaming_dedup_state_spans_microbatches(spark, tmp_path):
    """The state store must carry sha256 keys ACROSS microbatches:
    maxFilesPerTrigger=1 forces each parquet file into its own batch, so the
    duplicate in file 2 is dropped only if batch 1's state survived."""
    from sycl_jaccard_spark.streaming.ingest import watermarked_exact_dedup

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "repo string, path string, commit string, lang string, content string"
    spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "the original content")], schema
    ).coalesce(1).write.parquet(str(src / "batch1.parquet"))
    spark.createDataFrame(
        [
            ("r2", "b.py", "c2", "py", "the original content"),  # dup of batch 1
            ("r2", "c.py", "c2", "py", "fresh content"),
        ],
        schema,
    ).coalesce(1).write.parquet(str(src / "batch2.parquet"))

    stream = watermarked_exact_dedup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(
            str(src) + "/*.parquet"
        ),
        delay="1 hour",
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = [p["batchId"] for p in q.recentProgress if p["numInputRows"] > 0]
    got = spark.read.parquet(out)
    assert len(batches) >= 2, f"expected multiple microbatches, saw {batches}"
    assert got.count() == 2  # duplicate-across-batches dropped by state
    assert got.select("sha256").distinct().count() == 2


def test_multimodal_real_ppm_decode_resize_features(spark):
    """REAL image path, no imaging library: synthetic gradient PPMs decode
    with the pure-NumPy P6 parser, features (channel means + gray thumbnail)
    match a local replay exactly, and resize_images produces re-decodable
    PPM payloads identical to the local nearest-neighbor resample."""
    from sycl_jaccard_spark.operators.multimodal import (
        PPM_MIME,
        _ppm_features,
        _resize_nearest,
        decode_ppm,
        encode_ppm,
        extract_features,
        resize_images,
    )

    def gradient(w, h, phase):
        x = np.arange(w, dtype=np.uint8)[None, :].repeat(h, axis=0)
        y = np.arange(h, dtype=np.uint8)[:, None].repeat(w, axis=1)
        return np.stack([x, y, np.full((h, w), phase, np.uint8)], axis=2)

    imgs = {1: gradient(40, 30, 7), 2: gradient(513, 200, 99)}
    rows = [
        (mid, "image", PPM_MIME, img.shape[1], img.shape[0], None,
         bytearray(encode_ppm(img)))
        for mid, img in imgs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )

    # round trip sanity (driver-side)
    assert np.array_equal(decode_ppm(encode_ppm(imgs[1])), imgs[1])

    feats = {r.media_id: np.array(r.feature, np.float32)
             for r in extract_features(media).collect()}
    for mid, img in imgs.items():
        assert np.array_equal(feats[mid], _ppm_features(img)), mid
    assert len(feats[1]) == 3 + 64  # channel means + 8x8 thumbnail

    resized = {r.media_id: r for r in resize_images(media, 64, 64).collect()}
    # 40x30 fits in the box -> unchanged; 513x200 scales to 64x24 (floor)
    assert (resized[1].width, resized[1].height) == (40, 30)
    assert (resized[2].width, resized[2].height) == (64, 24)
    for mid in imgs:
        got = decode_ppm(bytes(resized[mid].payload))
        want = _resize_nearest(imgs[mid], resized[mid].width, resized[mid].height)
        assert np.array_equal(got, want), mid


def test_multimodal_real_wav_decode_features(spark):
    """REAL audio path: synthetic sine-wave WAVs decode with the pure-NumPy
    RIFF/PCM parser; features match a local replay exactly and carry the
    physically-expected values (duration, RMS ~ A/sqrt(2), ZCR ~ 2f/sr)."""
    from sycl_jaccard_spark.operators.multimodal import (
        WAV_MIME,
        _wav_features,
        decode_wav,
        encode_wav,
        extract_features,
    )

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 second
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    stereo = np.stack([tone, 0.25 * tone], axis=1)
    payloads = {1: encode_wav(tone, sr), 2: encode_wav(stereo, sr)}

    dec, got_sr = decode_wav(payloads[1])
    assert got_sr == sr and dec.shape == (sr, 1)
    assert np.allclose(dec[:, 0], tone, atol=1 / 32768)

    rows = [
        (mid, "audio", WAV_MIME, None, None, 1000, bytearray(p))
        for mid, p in payloads.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    feats = {r.media_id: np.array(r.feature, np.float32)
             for r in extract_features(media).collect()}
    for mid, p in payloads.items():
        assert np.array_equal(feats[mid], _wav_features(*decode_wav(p))), mid
    dur, rms, zcr = feats[1][:3]
    assert abs(dur - 1.0) < 1e-6
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01
    assert abs(zcr - 2 * 440 / sr) < 0.01
    assert len(feats[1]) == 3 + 8


def test_multimodal_real_video_frame_sampling(spark):
    """REAL video path for PPM streams (ffmpeg image2pipe format): the
    payload splits into self-delimiting P6 frames, every_n sampling emits
    image rows that decode back to the original frames, and the sampled
    frames flow straight into extract_features."""
    from sycl_jaccard_spark.operators.multimodal import (
        PPM_STREAM_MIME,
        _ppm_features,
        decode_ppm,
        encode_ppm,
        extract_features,
        sample_video_frames,
        split_ppm_stream,
    )

    frames = [np.full((6, 8, 3), 40 * i, np.uint8) for i in range(5)]
    stream = b"".join(encode_ppm(f) for f in frames)
    offs = split_ppm_stream(stream)
    assert len(offs) == 5
    assert all(
        np.array_equal(decode_ppm(stream[o : o + ln]), frames[i])
        for i, (o, ln) in enumerate(offs)
    )

    media = spark.createDataFrame(
        [(7, "video", PPM_STREAM_MIME, 8, 6, 5, bytearray(stream))],
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    sampled = sample_video_frames(media, every_n=2).collect()
    assert [r.frame_idx for r in sorted(sampled, key=lambda r: r.frame_idx)] == [0, 2, 4]
    for r in sampled:
        assert np.array_equal(decode_ppm(bytes(r.payload)), frames[r.frame_idx])
        assert (r.width, r.height, r.kind) == (8, 6, "image")

    # sampled frames chain into the real image feature path
    feats = extract_features(
        sample_video_frames(media, every_n=2).drop("frame_idx").withColumn(
            "duration_ms", F.lit(None).cast("long")
        )
    ).collect()
    assert len(feats) == 3
    want = {tuple(_ppm_features(frames[i]).tolist()) for i in (0, 2, 4)}
    assert {tuple(r.feature) for r in feats} == want


def test_media_features_flow_into_embedding_near_dup(spark):
    """Integration: decoded image features ARE embeddings — two
    near-identical PPMs (tiny pixel noise) must surface as an embedding-
    cosine near-dup pair through the standard candidate->verify engine,
    while a structurally different image stays out."""
    from sycl_jaccard_spark.operators.ann import embedding_near_dups
    from sycl_jaccard_spark.operators.multimodal import (
        PPM_MIME,
        encode_ppm,
        extract_features,
    )

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    noisy = np.clip(
        base.astype(np.int16) + rng.integers(-2, 3, base.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [
        (mid, "image", PPM_MIME, 32, 32, None, bytearray(encode_ppm(img)))
        for mid, img in [(1, base), (2, noisy), (3, other)]
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int, "
        "duration_ms long, payload binary",
    )
    feats = extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    dups = {
        (r.a, r.b)
        for r in embedding_near_dups(
            feats, dim=67, threshold=0.995, method="lsh",
            n_planes=16, bands=4, bucket_cap=10**9,
        ).collect()
    }
    assert (1, 2) in dups
    assert not any(3 in p for p in dups)


def test_multimodal_declared_kind_beats_riff_sniff(spark):
    """ADVICE r3: byte-sniffing is a fallback for MISSING metadata only. A
    mime-less RIFF payload DECLARED as an image (e.g. WebP) must reach the
    image decoder's explicit no-decoder error, not the WAV decoder's
    'not a RIFF/WAVE payload' failure."""
    webp_ish = b"RIFF\x10\x00\x00\x00WEBPVP8 fake"
    media = spark.createDataFrame(
        [(1, "image", None, None, None, None, webp_ish)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="(?i)image|decoder|format"):
        extract_features(media, dim=8, deterministic_fake=False).collect()
    # mime-less RIFF bytes with UNKNOWN kind still sniff into the WAV path
    media2 = spark.createDataFrame(
        [(2, "unknown", None, None, None, None, webp_ish)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="RIFF/WAVE"):
        extract_features(media2, dim=8, deterministic_fake=False).collect()


def test_video_fake_path_null_duration(spark):
    """ADVICE r3: a null duration_ms arrives in pandas as NaN (truthy) —
    the deterministic_fake path must fall back to one frame, not raise."""
    from sycl_jaccard_spark.operators.multimodal import sample_video_frames

    media = spark.createDataFrame(
        [(7, "video", "video/mp4", 320, 240, None, b"\x00\x00mp4fake")], MEDIA_SCHEMA
    )
    frames = sample_video_frames(media, deterministic_fake=True).collect()
    assert len(frames) == 1 and frames[0].media_id == 7


def test_trained_codebook_recall_vs_random(spark):
    """VERDICT r3 #4 done-bar: on blob-structured data, IVF candidate recall
    of planted near-dup pairs with the TRAINED Lloyd codebook is at least the
    random-codebook recall (and near-perfect), since trained centroids align
    lists with the actual clusters instead of slicing them arbitrarily."""
    from sycl_jaccard_spark.operators.ann import ivf_candidates, train_ivf_centroids

    rng = np.random.default_rng(11)
    dim, n_blobs = 16, 8
    centers = rng.standard_normal((n_blobs, dim)) * 4
    rows, planted = [], set()
    vid = 0
    for b in range(n_blobs):
        for _ in range(12):
            v = centers[b] + rng.standard_normal(dim) * 0.15
            rows.append((vid, v.astype(np.float32).tolist()))
            dup = v + rng.standard_normal(dim) * 0.01
            rows.append((vid + 1, dup.astype(np.float32).tolist()))
            planted.add((vid, vid + 1))
            vid += 2
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def recall(centroids_q):
        cands = {
            (r.a, r.b)
            for r in ivf_candidates(
                df, dim=dim, n_centroids=n_blobs, nprobe=1, seed=42,
                bucket_cap=10**9, centroids_q=centroids_q,
            ).collect()
        }
        return sum(1 for p in planted if p in cands) / len(planted)

    trained = train_ivf_centroids(df, dim=dim, n_centroids=n_blobs, n_iters=3, seed=42)
    r_trained = recall(trained)
    r_random = recall(None)
    assert r_trained >= r_random
    assert r_trained >= 0.95


def test_streaming_weighted_signatures_match_batch(spark, tmp_path):
    """foreachBatch weighted-signature ingest (static IDF snapshot) produces
    exactly the batch CWS signatures for the same corpus — even when the
    files arrive across multiple micro-batches."""
    from pyspark.sql import functions as F

    from sycl_jaccard_spark.functions.shingles import shingle_hashes, shingles, tokens
    from sycl_jaccard_spark.operators.weighted_dedup import idf_weights, weighted_signatures
    from sycl_jaccard_spark.streaming.ingest import (
        read_file_stream,
        weighted_signature_batch_writer,
    )

    files, _ = synth_source_files(spark, CorpusSpec(n_files=40, n_clusters=6, seed=3))
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    # two parquet files -> maxFilesPerTrigger=1 forces two micro-batches
    files.repartition(2).write.parquet(src)

    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4)
    batch_shingled = files.select(
        F.xxhash64("repo", "path", "commit").alias("id"),
        shingle_hashes(shingles(tokens(F.col("content")), cfg.shingle_k)).alias("shingle_hashes"),
    )
    idf = idf_weights(batch_shingled).localCheckpoint(eager=True)
    expected = {
        r.id: r.sig
        for r in weighted_signatures(batch_shingled, idf, cfg.num_perms, cfg.seed).collect()
    }

    stream = spark.readStream.schema(files.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.writeStream
        .foreachBatch(weighted_signature_batch_writer(idf, out, cfg))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.id: r.sig for r in spark.read.parquet(out).collect()}
    assert got == expected


def test_streaming_weighted_signatures_novel_files_and_replay(spark, tmp_path):
    """Review fixes: (1) files whose shingles are absent from the static IDF
    snapshot still produce signature rows (novel shingles get the max-rarity
    default weight, not an inner-join drop) and two identical novel files get
    IDENTICAL signatures; (2) replaying a micro-batch (at-least-once
    foreachBatch) overwrites its batch partition instead of appending dups."""
    from pyspark.sql import functions as F

    from sycl_jaccard_spark.functions.shingles import shingle_hashes, shingles, tokens
    from sycl_jaccard_spark.operators.weighted_dedup import idf_weights
    from sycl_jaccard_spark.streaming.ingest import weighted_signature_batch_writer

    # IDF trained on an unrelated corpus
    train = spark.createDataFrame(
        [(i, " ".join(f"trained{i}_{j} tok{j}" for j in range(30))) for i in range(20)],
        ["id", "content"],
    )
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4)
    tr_sh = train.select(
        "id", shingle_hashes(shingles(tokens(F.col("content")), cfg.shingle_k)).alias("shingle_hashes")
    )
    idf = idf_weights(tr_sh).localCheckpoint(eager=True)

    novel_body = " ".join(f"never_seen_{j} fresh{j * 3}" for j in range(40))
    batch = spark.createDataFrame(
        [
            ("r1", "a.py", "c1", "python", novel_body),
            ("r2", "b.py", "c2", "python", novel_body),  # identical novel twin
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    out = str(tmp_path / "wsig")
    writer = weighted_signature_batch_writer(idf, out, cfg)
    writer(batch, 0)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2, "fully-novel files must still be signed"
    sigs = [r.sig for r in rows]
    assert sigs[0] == sigs[1], "identical novel files must collide exactly"
    # replay the same batch id: overwrite, not append
    writer(batch, 0)
    assert spark.read.parquet(out).count() == 2


def test_streaming_delta_store_equals_full_run(spark, tmp_path):
    """Streaming leg of the incremental pipeline: two availableNow waves
    through foreachBatch(delta_store_batch_writer) must leave the store
    label-for-label equal to one full batch pipeline over all files."""
    from sycl_jaccard_spark.plans.delta import DeltaDedup
    from sycl_jaccard_spark.plans.pipeline import DedupPipeline
    from sycl_jaccard_spark.streaming.ingest import (
        delta_store_batch_writer,
        incremental_exact_dedup,
        read_file_stream,
    )

    files, _ = synth_source_files(
        spark, CorpusSpec(n_files=80, n_clusters=15, seed=23)
    )
    files = files.localCheckpoint(eager=True)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4)
    store = DeltaDedup(spark, str(tmp_path / "store"), cfg)

    # wave 1, then wave 2 — separate epochs through one checkpointed stream
    w1 = files.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0)
    w2 = files.join(w1, ["repo", "path", "commit"], "left_anti")
    for wave in (w1, w2):
        wave.write.mode("append").parquet(src)
        q = (
            read_file_stream(spark, src)
            .writeStream.foreachBatch(delta_store_batch_writer(store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    batch_files = incremental_exact_dedup(files).select("id", "content")
    full = DedupPipeline(spark, cfg).run(batch_files)
    expect = {(r.id, r.cluster) for r in full.clusters.collect()}
    got = {(r.id, r.cluster) for r in store.clusters().collect()}
    assert got == expect
    assert len(got) == 80


def test_streaming_delta_store_maintains_contamination_manifest(spark, tmp_path):
    """Streaming x decontamination composition: a bench-enabled store fed
    through foreachBatch(delta_store_batch_writer) maintains the SAME
    whole-corpus contamination manifest as one batch probe of all files —
    the hygiene leg needs no streaming-specific code path."""
    from sycl_jaccard_spark.functions.shingles import doc_shingle_hashes
    from sycl_jaccard_spark.operators.decontaminate import (
        contamination_overlap,
        decontamination_manifest,
    )
    from sycl_jaccard_spark.plans.delta import DeltaDedup
    from sycl_jaccard_spark.streaming.ingest import (
        delta_store_batch_writer,
        incremental_exact_dedup,
        read_file_stream,
    )

    files, _ = synth_source_files(
        spark, CorpusSpec(n_files=80, n_clusters=15, seed=29)
    )
    files = files.localCheckpoint(eager=True)
    cfg = PipelineConfig(num_perms=32, bands=8, rows_per_band=4)
    batch_files = incremental_exact_dedup(files).select("id", "content")
    leak_ids = [r["id"] for r in batch_files.orderBy("id").limit(2).collect()]
    bench = (
        batch_files.filter(F.col("id").isin(leak_ids))
        .select(
            F.col("id").alias("bench_id"),
            doc_shingle_hashes(F.col("content"), cfg).alias("ngram_hashes"),
        )
        .localCheckpoint(eager=True)
    )
    store = DeltaDedup(
        spark, str(tmp_path / "store"), cfg,
        bench_snapshot=bench, bench_min_overlap=2,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    w1 = files.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0)
    w2 = files.join(w1, ["repo", "path", "commit"], "left_anti")
    for wave in (w1, w2):
        wave.write.mode("append").parquet(src)
        q = (
            read_file_stream(spark, src)
            .writeStream.foreachBatch(delta_store_batch_writer(store))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    got = {
        r["doc_id"]: (round(r["max_containment"], 12), r["contaminated"])
        for r in store.contamination_manifest(threshold=0.8).collect()
    }
    docs = batch_files.select(
        F.col("id").alias("doc_id"),
        doc_shingle_hashes(F.col("content"), cfg).alias("ngram_hashes"),
    )
    expect = {
        r["doc_id"]: (round(r["max_containment"], 12), r["contaminated"])
        for r in decontamination_manifest(
            batch_files.select(F.col("id").alias("doc_id")),
            contamination_overlap(docs, bench, id_col="doc_id", min_overlap=2),
            threshold=0.8,
            id_col="doc_id",
        ).collect()
    }
    assert got == expect
    for i in leak_ids:
        assert got[i] == (1.0, True)


def test_watermarked_dedup_event_time_col(spark, tmp_path):
    """Review regression: a caller-supplied time_col previously broke at
    first use (the fixed projection dropped it before withWatermark); it
    must now watermark on the EVENT time and keep the column in the
    output."""
    from sycl_jaccard_spark.streaming.ingest import watermarked_exact_dedup

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, event_ts timestamp"
    )
    spark.sql(
        "SELECT 'r1' repo, 'a.py' path, 'c1' commit, 'py' lang, "
        "'some content' content, timestamp'2026-01-01 10:00:00' event_ts "
        "UNION ALL SELECT 'r2', 'b.py', 'c2', 'py', 'some content', "
        "timestamp'2026-01-01 10:05:00' "
        "UNION ALL SELECT 'r3', 'c.py', 'c3', 'py', 'other content', "
        "timestamp'2026-01-01 10:06:00'"
    ).write.parquet(src)
    stream = watermarked_exact_dedup(
        spark.readStream.schema(schema).parquet(src),
        delay="1 hour",
        time_col="event_ts",
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2  # the duplicate content collapsed
    assert "event_ts" in got.columns
    import pytest

    with pytest.raises(ValueError, match="time_col"):
        watermarked_exact_dedup(
            spark.readStream.schema(schema).parquet(src), time_col="nope"
        )


def test_delta_store_writer_dedupes_within_microbatch(spark, tmp_path):
    """Review regression: a source that re-emits the same (repo, path,
    commit) row twice in ONE micro-batch must not wedge the stream on the
    store's duplicate-id refusal — the writer self-heals by dropping the
    identical-provenance duplicate."""
    from sycl_jaccard_spark.config import PipelineConfig
    from sycl_jaccard_spark.plans.delta import DeltaDedup
    from sycl_jaccard_spark.streaming.ingest import delta_store_batch_writer

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    content = " ".join(f"tok{t}" for t in range(30))
    rows = [
        ("r1", "a.py", "c1", "py", content),
        ("r1", "a.py", "c1", "py", content),  # crawler re-emit, same batch
        ("r1", "b.py", "c1", "py", "other " + content),
    ]
    schema = "repo string, path string, commit string, lang string, content string"
    spark.createDataFrame(rows, schema).write.parquet(src)
    store = DeltaDedup(spark, str(tmp_path / "store"), PipelineConfig())
    q = (
        read_file_stream(spark, src)
        .writeStream.foreachBatch(delta_store_batch_writer(store))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert store.clusters().count() == 2  # one row per distinct provenance
