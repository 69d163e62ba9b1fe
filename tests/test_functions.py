"""Training-data pipeline function tests: dedup recall/precision,
ANN exactness + IVF recall, multimodal plumbing, text functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.functions import dedup, multimodal, similarity, textfn


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base + " extra"),                      # near-dup of 0
        (2, base),                                 # exact dup of 0
        (3, "completely different content about spark and indexes here"),
        (4, "short"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_duplicates(spark, docs):
    out = dedup.exact_duplicates(docs, "id", "text").collect()
    assert len(out) == 1
    assert out[0]["canonical_id"] == 0 and out[0]["n_members"] == 2


def test_jaccard_and_minhash_agree(spark, docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(docs, "id", "text", threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs, "id", "text", threshold=0.5).collect()
    }
    assert (0, 2) in exact and (0, 1) in exact
    assert mh == exact  # verified LSH == exact at this scale


def test_simhash_near_pairs(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(docs, "id", "text", max_hamming=10).collect()
    }
    assert pairs.get((0, 2)) == 0  # identical docs → identical simhash
    assert (0, 1) in pairs  # near-dup within hamming budget


def test_shingles_short_doc(spark, docs):
    out = docs.select(
        "id", dedup.shingles(textfn.tokens(F.col("text")), 3).alias("sh")
    ).collect()
    by_id = {r["id"]: r["sh"] for r in out}
    assert by_id[4] == [] and by_id[5] == []  # no descending-sequence blowup


def test_textfn_contract(spark, docs):
    row = docs.filter(F.col("id") == 0).select(
        textfn.token_count(F.col("text")).alias("n"),
        textfn.fingerprint(F.col("text")).alias("fp"),
        textfn.lang_id(F.col("text")).alias("lang"),
    ).collect()[0]
    # "the ... the ... and" are stopwords: 12 raw -> 9 analyzed
    assert row["n"] == 9
    assert row["lang"] == "en"
    # identical analyzed content -> identical fingerprint
    fp2 = docs.filter(F.col("id") == 2).select(
        textfn.fingerprint(F.col("text")).alias("fp")
    ).collect()[0]["fp"]
    assert row["fp"] == fp2


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        v = rng.normal(size=8)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # planted near-duplicate of vector 0
    v0 = np.array(rows[0][1])
    dup = v0 + rng.normal(scale=0.01, size=8)
    rows.append((60, [float(x) for x in dup / np.linalg.norm(dup)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_full_probe_equals_brute(spark, vectors):
    qs = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    brute = similarity.brute_force_topk(vectors, qs, k=3).collect()
    cents = similarity.make_centroids(vectors, 4, iters=1)
    assigned = similarity.assign_centroids(vectors, cents)
    ivf = similarity.ivf_topk(assigned, cents, qs, nprobe=4, k=3).collect()
    key = lambda rows: sorted((r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in rows)
    assert key(brute) == key(ivf)


def test_ivf_reduced_probe_recall(spark, vectors):
    qs = vectors.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(vectors, qs, k=3).collect()
    }
    cents = similarity.make_centroids(vectors, 4, iters=2)
    assigned = similarity.assign_centroids(vectors, cents)
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(assigned, cents, qs, nprobe=2, k=3).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5  # nprobe=2/4 keeps most neighbors


def test_ivfpq_full_probe_big_refine_equals_brute(spark, vectors):
    """nprobe = all cells and refine ≥ corpus: the exact re-rank provably
    recovers brute force regardless of code quality."""
    qs = vectors.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    brute = similarity.brute_force_topk(vectors, qs, k=3).collect()
    cents = similarity.make_centroids(vectors, 4, iters=1)
    assigned = similarity.assign_centroids(vectors, cents)
    model = similarity.pq_train(assigned, cents, m=4, ksub=8)
    encoded = similarity.pq_encode(assigned, model)
    got = similarity.ivfpq_topk(
        encoded, vectors, model, qs, nprobe=4, k=3, refine=100
    ).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"]) for r in rows)
    assert key(brute) == key(got)


def test_ivfpq_reduced_probe_recall(spark, vectors):
    """The VERDICT contract: recall ≥ 0.9 vs brute with a REAL prune
    (nprobe < n_centroids, refine ≪ corpus)."""
    qs = vectors.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(vectors, qs, k=3).collect()
    }
    cents = similarity.make_centroids(vectors, 4, iters=2)
    assigned = similarity.assign_centroids(vectors, cents)
    model = similarity.pq_train(assigned, cents, m=4, ksub=16)
    encoded = similarity.pq_encode(assigned, model)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivfpq_topk(
            encoded, vectors, model, qs, nprobe=3, k=3, refine=15
        ).collect()
    }
    recall = len(brute & got) / len(brute)
    assert recall >= 0.9, f"recall {recall}"


def test_ivfpq_codes_shape_and_determinism(spark, vectors):
    cents = similarity.make_centroids(vectors, 4, iters=1)
    assigned = similarity.assign_centroids(vectors, cents)
    model = similarity.pq_train(assigned, cents, m=4, ksub=8)
    assert model["codebooks"].shape == (4, 8, 2)
    rows = similarity.pq_encode(assigned, model).collect()
    assert len(rows) == 61
    assert all(len(r["codes"]) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["codes"])
    # same input → same codes (seeded training, argmin ties stable)
    model2 = similarity.pq_train(assigned, cents, m=4, ksub=8)
    assert (model2["codebooks"] == model["codebooks"]).all()


def test_near_dup_pairs(spark, vectors):
    pairs = similarity.brute_force_pairs(vectors, threshold=0.99).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 60)}


def test_multimodal_plumbing(spark, docs):
    media = multimodal.synthesize_media(docs, "id", "text", kind="image")
    feats = multimodal.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert all(r["ok"] for r in feats)
    assert by_id[0]["sha256"] == by_id[2]["sha256"]  # same payload, same hash
    assert len(by_id[0]["feature"]) == 8
    assert by_id[0]["width"] >= 16 and by_id[0]["height"] >= 16


def test_multimodal_stub_errors_channelled(spark, docs):
    media = multimodal.synthesize_media(docs.limit(2), "id", "text", kind="audio")
    feats = multimodal.extract_features(media).collect()
    assert all(not r["ok"] for r in feats)
    # text payloads are not PCM WAV: the audio dispatch channels its
    # missing-codec NotImplementedError into the error column
    assert all("PCM WAV" in r["error"] for r in feats)
    assert all(r["sha256"] is not None for r in feats)  # hashing still ran


def test_evaluator_registry(spark):
    """Scalar + vector evaluator builders (Lang.java:419-498 family)."""
    import math

    from pyspark.sql import functions as F

    from solr_spark.functions import evaluators as ev

    df = spark.createDataFrame(
        [(4.0, 2.0, [1.0, 2.0], [3.0, 4.0])], "a double, b double, u array<double>, v array<double>"
    )
    row = df.select(
        ev.SCALAR["sqrt"](F.col("a")).alias("sqrt"),
        ev.SCALAR["pow"](F.col("a"), F.col("b")).alias("pow"),
        ev.SCALAR["div"](F.col("a"), F.col("b")).alias("div"),
        ev.VECTOR["dotProduct"](F.col("u"), F.col("v")).alias("dot"),
        ev.VECTOR["euclidean"](F.col("u"), F.col("v")).alias("euc"),
        ev.VECTOR["cosineSimilarity"](F.col("u"), F.col("v")).alias("cos"),
    ).collect()[0]
    assert row["sqrt"] == 2.0 and row["pow"] == 16.0 and row["div"] == 2.0
    assert row["dot"] == 11.0
    assert abs(row["euc"] - math.sqrt(8.0)) < 1e-12
    assert abs(row["cos"] - 11.0 / (math.sqrt(5) * 5.0)) < 1e-12


def test_evaluator_zscore_and_windows(spark):
    from pyspark.sql import functions as F

    from solr_spark.functions import evaluators as ev

    df = spark.createDataFrame(
        [(1, "g", 1.0), (2, "g", 3.0), (3, "g", 5.0), (4, "h", 10.0)],
        "id int, g string, v double",
    )
    z = {r["id"]: r["z"] for r in ev.zscore(df, "v", "z").collect()}
    assert abs(z[4]) > abs(z[1])  # outlier farthest from the mean
    ma = {
        r["id"]: r["moving_avg"]
        for r in ev.moving_avg(df, ["g"], [F.asc("id")], "v", 2).collect()
    }
    assert ma[1] == 1.0 and ma[2] == 2.0 and ma[3] == 4.0 and ma[4] == 10.0
    cs = {
        r["id"]: r["cumsum"]
        for r in ev.cumulative_sum(df, ["g"], [F.asc("id")], "v").collect()
    }
    assert cs[3] == 9.0 and cs[4] == 10.0
    d = {r["id"]: r["diff"] for r in ev.diff_lag(df, ["g"], [F.asc("id")], "v").collect()}
    assert d[2] == 2.0 and d[3] == 2.0 and d[1] is None


def test_duplicate_clusters_multihop(spark):
    """Chain a-b-c plus isolated pair (x,y): one 3-cluster via 2-hop
    propagation, one 2-cluster; canonical = min id of each component."""
    from solr_spark.functions.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(5, 2), (2, 9), (20, 30)], "id_a bigint, id_b bigint"
    )
    out = {
        r["id"]: (r["cluster_id"], r["is_canonical"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert out == {
        2: (2, True), 5: (2, False), 9: (2, False),
        20: (20, True), 30: (20, False),
    }


def test_srp_near_dup_recall_and_precision(spark):
    """SRP-LSH vs exact brute force on a corpus with PLANTED near-dups
    (base vectors + small-noise copies, cosine ~0.95-0.99): every
    returned pair is exact-verified (precision 1.0 by construction) and
    recall at cosine >= 0.9 meets the 8x8 banding-math bound (~99%).
    The driver embeddings top out at cosine ~0.51, so they exercise only
    the no-false-positive side."""
    import numpy as np

    from solr_spark.functions.similarity import brute_force_pairs, srp_near_dup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((60, 64))
    rows = []
    vid = 0
    for i, v in enumerate(base):
        rows.append((vid, [float(x) for x in v])); vid += 1
        if i % 2 == 0:  # plant a near-dup of half the vectors
            nd = v + 0.12 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in nd])); vid += 1
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in brute_force_pairs(emb, threshold=0.9, round_to=6).collect()
    }
    assert len(exact) >= 20  # the planted pairs are really there
    got = {
        (r["id_a"], r["id_b"])
        for r in srp_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert got <= exact  # exact verify: no false positives
    recall = len(got & exact) / len(exact)
    assert recall >= 0.9, (recall, len(exact))


def test_netpbm_real_decode_pipeline(spark):
    """Real image decode end-to-end: seeded P6 payloads through the
    mapInPandas feature extractor — exact dimensions, 8-dim feature with
    the documented layout, and a corrupt payload channeled to an error
    row instead of a task failure."""
    import numpy as np

    from solr_spark.functions.multimodal import decode_netpbm, extract_features, make_ppm

    ppm = make_ppm(20, 10, seed=3)
    meta = decode_netpbm(ppm)
    assert (meta["width"], meta["height"]) == (20, 10)
    assert len(meta["feature"]) == 8
    # P5 grayscale path
    gray = b"P5\n4 2\n255\n" + bytes(range(8))
    m5 = decode_netpbm(gray)
    assert (m5["width"], m5["height"]) == (4, 2)
    assert m5["feature"][4] == pytest.approx(m5["feature"][5])  # ch means equal

    rows = [
        (0, "image", bytearray(ppm), None),
        (1, "image", bytearray(b"P6\n4 4\n255\n" + b"\x00" * 5), None),  # truncated
        (2, "image", bytearray(b"not an image"), None),  # -> deterministic fake
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, "
        "meta struct<mime:string, declared_w:int, declared_h:int, duration_ms:int>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[0]["ok"] and (out[0]["width"], out[0]["height"]) == (20, 10)
    assert out[0]["feature"] == pytest.approx(meta["feature"])
    assert not out[1]["ok"] and "netpbm" in (out[1]["error"] or "").lower() or not out[1]["ok"]
    assert out[2]["ok"]  # fake fallback still succeeds deterministically


def test_wav_real_decode_pipeline(spark):
    """Real PCM WAV decode end-to-end: duration/rms/zcr features from the
    stdlib wave path; a non-WAV audio payload channels to an error row."""
    from solr_spark.functions.multimodal import decode_wav, extract_features, make_wav

    clip = make_wav(0.5, freq=440.0, rate=8000, seed=1)
    meta = decode_wav(clip)
    assert meta["n_frames"] == 4000
    dur, rms, zcr, peak = meta["feature"]
    assert dur == pytest.approx(0.5)
    assert rms == pytest.approx(0.5 / 2**0.5, rel=0.05)  # sine rms = A/sqrt(2)
    assert zcr == pytest.approx(2 * 440.0 / 8000, rel=0.1)  # 2 crossings/cycle
    assert 0.4 < peak <= 1.0

    rows = [
        (0, "audio", bytearray(clip), None),
        (1, "audio", bytearray(b"ID3\x04mp3-ish"), None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, "
        "meta struct<mime:string, declared_w:int, declared_h:int, duration_ms:int>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[0]["ok"] and out[0]["n_frames"] == 4000
    assert out[0]["feature"] == pytest.approx(meta["feature"])
    assert not out[1]["ok"] and "WAV" in out[1]["error"]


def test_video_frame_sampling(spark):
    """Concatenated-P6 stream: ALL frames counted, only every 2nd
    decoded; feature = mean over sampled frames; non-P6 video payloads
    channel to error rows."""
    import numpy as np

    from solr_spark.functions.multimodal import (
        decode_netpbm,
        decode_ppm_stream,
        extract_features,
        make_ppm,
    )

    frames = [make_ppm(8, 6, seed=s) for s in range(5)]
    stream = b"".join(frames)
    meta = decode_ppm_stream(stream, sample_every=2)
    assert meta["n_frames"] == 5
    assert (meta["width"], meta["height"]) == (8, 6)
    sampled = [decode_netpbm(frames[i])["feature"] for i in (0, 2, 4)]
    assert meta["feature"] == pytest.approx(
        np.mean(np.asarray(sampled), axis=0).tolist()
    )

    media = spark.createDataFrame(
        [(0, "video", bytearray(stream), None), (1, "video", bytearray(b"\x00mp4"), None)],
        "media_id bigint, kind string, payload binary, "
        "meta struct<mime:string, declared_w:int, declared_h:int, duration_ms:int>",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[0]["ok"] and out[0]["n_frames"] == 5
    assert not out[1]["ok"] and "P6" in out[1]["error"]


def test_haversine_antipodal_no_nan(spark):
    """Near-antipodal points: the least(1, sqrt(a)) clamp keeps asin in
    domain — unclamped double rounding yields NaN ~6% of the time."""
    import math

    from solr_spark.functions.geo import haversine_km

    lat1, lon1 = 61.898547014673326, 97.00206862884804
    df = spark.createDataFrame([(lat1, lon1, -lat1, lon1 - 180.0)],
                               "a double, b double, c double, d double")
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0]["km"]
    assert not math.isnan(got)
    assert got == pytest.approx(2 * 6371.0087714 * math.pi / 2, rel=0.01)


def test_simhash_excludes_tokenless_docs(spark):
    """Empty/stopword-only docs carry no signal: they must NOT collapse
    into a hamming-0 mega-cluster."""
    from solr_spark.functions.dedup import simhash_near_pairs

    rows = [(0, ""), (1, "the and of"), (2, None), (3, "real content here"),
            (4, "real content here")]
    df = spark.createDataFrame(rows, "id bigint, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_near_pairs(df, "id", "text", max_hamming=3).collect()}
    assert pairs == {(3, 4)}  # only the genuine near-dup pair


def test_minhash_bands_validation(spark):
    import pytest

    from solr_spark.functions.dedup import minhash_lsh_pairs

    df = spark.createDataFrame([(0, "a b c d")], "id bigint, text string")
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_pairs(df, "id", "text", num_hashes=64, bands=12)


def test_minhash_bucket_cap_kills_giant_cluster(spark):
    """A 1000-member exact-dup cluster lands whole in one bucket of EVERY
    band — uncapped, that is ~16x1000²/2 candidate rows through one
    reducer. With the bucket cap the cluster's buckets are dropped (it is
    exact-dup territory: run exact_duplicates first), the run completes,
    and genuine near-dups OUTSIDE the cluster are still found."""
    from solr_spark.functions.dedup import lsh_oversized_buckets, minhash_lsh_pairs

    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(1000)]
    rows += [
        (2000, "spark shuffles partition data across executor boundaries fast"),
        (2001, "spark shuffles partition data across executor boundaries quick"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    pairs = minhash_lsh_pairs(
        df, "id", "text", num_hashes=64, bands=16, threshold=0.5,
        max_bucket_size=64,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(2000, 2001)}
    # candidate volume stays bounded: the UNVERIFIED candidate set under
    # the cap is exactly the one surviving pair, not ~500k cluster pairs
    cand = minhash_lsh_pairs(
        df, "id", "text", num_hashes=64, bands=16, verify=False,
        max_bucket_size=64,
    )
    assert cand.count() == 1
    # dropped-bucket accounting (the jaccard_dropped_shingles mirror):
    # the cluster occupies one oversized bucket in each of the 16 bands
    from solr_spark.functions.dedup import shingle_rows
    from pyspark.sql import functions as F

    inv = shingle_rows(df, "id", "text", 3)
    sig = inv.groupBy("id").agg(
        *[F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
          for i in range(64)]
    )
    banded = sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"h{b * 4 + j}") for j in range(4)]).alias("bucket"),
            ) for b in range(16)
        ])).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    stats = lsh_oversized_buckets(banded, 64).collect()[0]
    assert stats["n_buckets_dropped"] == 16
    assert stats["n_members_dropped"] == 16 * 1000
    assert stats["max_bucket_seen"] == 1000


def test_srp_bucket_cap_kills_degenerate_bucket(spark):
    """Many bit-identical embeddings (e.g. zero-ish vectors all hashing to
    the same SRP signature) share every (band, bucket) — the cap drops
    those buckets and keeps candidate generation sub-quadratic while a
    distinct near-dup pair elsewhere survives."""
    import numpy as np

    from solr_spark.functions.similarity import srp_near_dup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    rows = [(i, (base * (1.0 + 1e-9 * i)).tolist()) for i in range(800)]
    u = rng.standard_normal(16)
    rows += [(9000, u.tolist()), (9001, (u + 0.01 * rng.standard_normal(16)).tolist())]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in srp_near_dup_pairs(
            emb, threshold=0.99, max_bucket_size=64
        ).collect()
    }
    assert got == {(9000, 9001)}


def test_geohash_known_vectors(spark):
    """Public geohash test vectors (the canonical geohash.org example and
    an antipodal corner) + decode round-trip + ghhsin self-distance."""
    from pyspark.sql import functions as F

    from solr_spark.functions.funcquery import (
        geohash_decode,
        geohash_encode,
        ghhsin,
    )

    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-25.382708, -49.265506), (0.0, 0.0)],
        "lat double, lon double",
    )
    got = df.select(
        geohash_encode(F.col("lat"), F.col("lon"), 11).alias("gh")
    ).collect()
    assert got[0]["gh"] == "u4pruydqqvj"
    assert got[1]["gh"] == "6gkzwgjzn82"
    assert got[2]["gh"].startswith("s00000000")
    # decode returns the cell midpoint — within one cell of the input
    dec = df.select(
        "lat", "lon",
        *(c.alias(n) for c, n in zip(
            geohash_decode(geohash_encode(F.col("lat"), F.col("lon"), 12), 12),
            ("dlat", "dlon"),
        )),
    ).collect()
    for r in dec:
        assert abs(r["lat"] - r["dlat"]) < 1e-4
        assert abs(r["lon"] - r["dlon"]) < 1e-4
    ghs = spark.createDataFrame(
        [("u4pruydqqvjs", "u4pruydqqvjs"), ("u4pruydqqvjs", "6gkzwgjzn820")],
        "g1 string, g2 string",
    )
    z = ghs.select(ghhsin(F.col("g1"), F.col("g2")).alias("d")).collect()
    assert z[0]["d"] == 0.0
    assert 9000 < z[1]["d"] < 11000  # Denmark → Curitiba great-circle km


def test_dist_sqedist_joindf(spark):
    from pyspark.sql import functions as F

    from solr_spark.functions.funcquery import dist, joindf, ord_rord, sqedist

    df = spark.createDataFrame([(1, 0.0, 0.0), (2, 3.0, 4.0)], "id int, x double, y double")
    r = df.select(
        "id",
        sqedist(F.col("x"), F.col("y"), F.lit(0.0), F.lit(0.0)).alias("sq"),
        dist(2.0, F.col("x"), F.col("y"), F.lit(0.0), F.lit(0.0)).alias("l2"),
        dist(1.0, F.col("x"), F.col("y"), F.lit(0.0), F.lit(0.0)).alias("l1"),
        dist(float("inf"), F.col("x"), F.col("y"), F.lit(0.0), F.lit(0.0)).alias("linf"),
        dist(0.0, F.col("x"), F.col("y"), F.lit(0.0), F.lit(0.0)).alias("l0"),
    ).collect()
    by = {row["id"]: row for row in r}
    assert by[2]["sq"] == 25.0 and by[2]["l2"] == 5.0
    assert by[2]["l1"] == 7.0 and by[2]["linf"] == 4.0 and by[2]["l0"] == 2.0
    assert by[1]["sq"] == 0.0 and by[1]["l0"] == 0.0
    # ord/rord over a 3-value field
    names = spark.createDataFrame(
        [(1, "b"), (2, "a"), (3, "c"), (4, "a")], "id int, v string"
    )
    orr = {row["id"]: (row["ord"], row["rord"]) for row in ord_rord(names, "v").collect()}
    assert orr == {1: (2, 2), 2: (1, 3), 3: (3, 1), 4: (1, 3)}
    # joindf membership flag
    other = spark.createDataFrame([("a",), ("z",)], "k string")
    j = {row["id"]: row["joined"] for row in joindf(names, other, "k", "v").collect()}
    assert j == {1: False, 2: True, 3: False, 4: True}


def test_wkt_polygon_parse_and_filter(spark):
    from solr_spark.functions import geo

    ring = geo.parse_wkt_polygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert ring == [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    with pytest.raises(ValueError):
        geo.parse_wkt_polygon("POLYGON ((0 0, 10 0, 10 10))")  # unclosed
    with pytest.raises(ValueError):
        geo.parse_wkt_polygon("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))")

    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 15.0, 5.0), (3, -0.1, 5.0), (4, 9.99, 9.99)],
        "id bigint, lon double, lat double",
    )
    got = sorted(
        r["id"]
        for r in geo.polygon_filter(
            df, "lon", "lat", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
        ).collect()
    )
    assert got == [1, 4]


def test_point_in_polygon_sql_mirror():
    """Python (Spark expression semantics replicated in numpy) vs the
    generated SQL, on a concave ring — same parity for every point."""
    import duckdb

    from solr_spark.functions.geo import parse_wkt_polygon, point_in_polygon_sql

    wkt = "POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))"  # concave notch
    ring = parse_wkt_polygon(wkt)

    def pip_py(x, y):
        c = 0
        n = len(ring)
        for i in range(n):
            (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
            if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                c += 1
        return c % 2 == 1

    pts = [(x * 0.7 - 2, y * 0.9 - 1) for x in range(20) for y in range(15)]
    con = duckdb.connect()
    con.execute("CREATE TABLE p(x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pts)
    sql = dict(
        ((x, y), v)
        for x, y, v in con.sql(
            f"SELECT x, y, {point_in_polygon_sql('x', 'y', ring)} FROM p"
        ).fetchall()
    )
    assert all(sql[(x, y)] == pip_py(x, y) for x, y in pts)
    # the notch: (5, 7) is OUTSIDE the concave polygon, (5, 3) inside
    assert not pip_py(5.0, 7.0) and pip_py(5.0, 3.0)
