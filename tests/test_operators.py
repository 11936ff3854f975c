"""Pipeline-operator behavior tests on small synthetic + sf0.001 data."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mondrian_olap_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=3, text="completely different words appear here entirely now"),
        Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),  # dup of 1
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(docs):
    out = {r["fingerprint"]: r for r in dedup.exact_dedup(docs).collect()}
    assert len(out) == 3
    dup = [r for r in out.values() if r["dup_count"] == 2]
    assert len(dup) == 1 and dup[0]["keep_id"] == 1


def test_shingles_count(docs):
    sh = dedup.shingles(docs, n=3).filter("id = 1").collect()
    # 9 tokens -> 7 trigrams, all distinct here
    assert len(sh) == 7


def test_jaccard_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 4)] == 1.0          # exact duplicates
    assert 0.5 < pairs[(1, 2)] < 1.0     # one word differs
    assert (1, 3) not in pairs


def test_minhash_matches_exact(docs):
    exact = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(docs, threshold=0.8).collect()}
    mh = {(r["id_a"], r["id_b"]) for r in dedup.minhash_dedup_pairs(docs, threshold=0.8).collect()}
    assert mh == exact  # verification step makes precision exact; recall ~1 here


def test_minhash_signatures_vectorized_matches_expression_form(spark):
    """The Arrow mapInPandas signature path must replay the portable
    md5/universal-hash scheme BIT-for-bit: same values as the old
    explode → md5 → groupBy(min…) expression form on adversarial texts
    (empty, null, tabs, multi-space, leading/trailing whitespace, short
    docs), and a zero-shuffle single-map-stage plan."""
    from pyspark.sql import functions as F

    rows = [
        (1, ""), (2, None), (3, "a"), (4, "a b"), (5, "a  b\tc"),
        (6, " leading space"), (7, "\tlead tab x y z"), (8, "trailing sp "),
        (9, "many t o k e n s h e r e indeed"), (10, "a b c d e f g"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def expression_form(frame, n=3, num_hashes=16):
        sh = dedup.shingles(frame, "doc_id", "text", n).withColumn(
            "h", F.expr(dedup._h("shingle")) % dedup.MINHASH_PRIME
        )
        aggs = [
            F.min(
                (F.lit(a) * F.col("h") + F.lit(b)) % dedup.MINHASH_PRIME
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(dedup.minhash_coefficients(num_hashes))
        ]
        return sh.groupBy("id").agg(*aggs)

    for n, nh in [(3, 16), (2, 8)]:
        new = dedup.minhash_signatures(df, n=n, num_hashes=nh)
        ref = expression_form(df, n=n, num_hashes=nh)
        assert new.exceptAll(ref).count() == 0
        assert ref.exceptAll(new).count() == 0
    # signatures are per-document local math: no shuffle, no join
    plan = dedup.minhash_signatures(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "MapInPandas" in plan


def test_hot_shingle_guard_skewed_corpus(spark):
    """Stop-shingle default: a boilerplate phrase shared by every document
    (the 100 TB skew scenario) is dropped before the self-join, so
    boilerplate-only similarity yields no pairs while true near-dups (same
    distinct body) are still found."""
    boiler = "this document is provided as is without any warranty of any kind whatsoever"
    rows = [
        Row(doc_id=i, text=f"{boiler} unique body number {i} speaks about topic {i % 7} today")
        for i in range(40)
    ]
    # 40 and 41: identical distinct bodies → true near-dup pair
    rows += [
        Row(doc_id=40, text=f"{boiler} identical interesting body shared by the pair of docs"),
        Row(doc_id=41, text=f"{boiler} identical interesting body shared by the pair of docs"),
    ]
    docs = spark.createDataFrame(rows)
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.jaccard_pairs(docs, threshold=0.8).collect()}
    assert (40, 41) in pairs
    # every other doc only shares the boilerplate — no pair survives
    assert pairs == {(40, 41)}


def test_hot_shingle_guard_inactive_on_small_corpora(docs):
    """The 8-doc floor keeps tiny corpora exact: default-capped results equal
    uncapped results."""
    capped = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in
              dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    exact = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in
             dedup.jaccard_pairs(docs, threshold=0.5, max_shingle_df=None).collect()}
    assert capped == exact


def test_simhash_identical_docs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(1, 4)] == 0


def test_simhash_requires_recall_guarantee(docs):
    with pytest.raises(ValueError):
        dedup.simhash_pairs(docs, max_hamming=4, chunks=4)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=2, embedding=[0.99, 0.01, 0.0, 0.0]),   # near v1
        Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0]),     # orthogonal to v1
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0, 0.0]),    # opposite of v1
        Row(vec_id=5, embedding=[1.0, 0.001, 0.0, 0.0]),   # near v1
    ]
    df = spark.createDataFrame(rows)
    return df.withColumn("embedding", F.col("embedding").cast("array<float>"))


def test_cosine_topk_order(vectors):
    out = similarity.cosine_topk(vectors, [1], k=3).collect()
    assert [r["neighbor_id"] for r in out] == [5, 2, 3]
    assert out[0]["cosine"] > 0.999


def test_cosine_pairs_threshold(vectors):
    pairs = {(r["id_a"], r["id_b"]) for r in
             similarity.cosine_pairs_threshold(vectors, 0.99).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    assert (1, 4) not in pairs


def test_ivf_index_assignment(vectors):
    idx = similarity.ivf_index(vectors, n_cells=2)
    cells = {r["id"]: r["cell"] for r in idx.collect()}
    # seeds are ids 1 and 2 (lowest ids); near-v1 vectors land with 1 or 2,
    # the orthogonal/opposite vectors still get their nearest seed
    assert set(cells) == {1, 2, 3, 4, 5}
    assert cells[1] == 1 and cells[2] == 2
    assert cells[5] in (1, 2)


def test_ivf_full_probe_is_exact(vectors):
    """n_probe == n_cells probes everything → IVF must equal brute force."""
    exact = similarity.cosine_topk(vectors, [1], k=3).collect()
    ivf = similarity.ivf_topk(vectors, [1], k=3, n_cells=2, n_probe=2).collect()
    assert [r["neighbor_id"] for r in ivf] == [r["neighbor_id"] for r in exact]
    for a, b in zip(ivf, exact):
        assert a["cosine"] == pytest.approx(b["cosine"], rel=1e-9)


def test_ivf_probe_subsets_candidates(spark):
    """With 1 of 2 cells probed, neighbors come only from the probed cell."""
    rows = [Row(vec_id=i, embedding=[1.0 + 0.001 * i, 0.0]) for i in range(5)]
    rows += [Row(vec_id=10 + i, embedding=[0.0, 1.0 + 0.001 * i]) for i in range(5)]
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = similarity.ivf_topk(df, [0], k=8, n_cells=2, n_probe=1).collect()
    # query 0 is an x-axis vector; the y-axis cluster (cell of vec 1? no —
    # seeds are 0 and 1, both x-axis) — everything assigns to x-ish cells,
    # so just assert the contract: ≤ k rows, no self-match, sorted by cosine
    assert all(r["neighbor_id"] != 0 for r in out)
    cosines = [r["cosine"] for r in out]
    assert cosines == sorted(cosines, reverse=True)


def test_ivf_index_roundtrip_and_pruning(vectors, spark, tmp_path):
    """write_ivf_index / read_ivf_index: the persisted index reproduces
    the in-memory topk exactly, and a literal cell filter prunes to the
    probed cells' directories (PartitionFilters in the scan)."""
    path = str(tmp_path / "ivf")
    written = similarity.write_ivf_index(vectors, path, n_cells=2)
    idx, cents = similarity.read_ivf_index(spark, path)
    assert [c["id"] for c in cents] == [c["id"] for c in written]
    mem = similarity.ivf_topk(vectors, [1], k=3, n_cells=2, n_probe=2).collect()
    disk = similarity.ivf_topk(
        vectors, [1], k=3, n_probe=2, index=idx, centroids=cents
    ).collect()
    assert [(r["neighbor_id"], round(r["cosine"], 9)) for r in disk] == [
        (r["neighbor_id"], round(r["cosine"], 9)) for r in mem
    ]
    # literal probe-cell filter reaches the scan as a partition filter
    plan = idx.filter(F.col("cell") == cents[0]["id"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_ivf_append_matches_full_rebuild(vectors, spark, tmp_path):
    """ivf_append: appending a delta to a persisted index yields probes
    IDENTICAL to a from-scratch build of the full corpus with the same
    (base-derived) centroids — and the append assigns only the delta,
    reusing the artifact's quantizer."""
    path = str(tmp_path / "ivf_app")
    base = vectors.filter("vec_id <= 3")
    delta = vectors.filter("vec_id > 3")
    written = similarity.write_ivf_index(base, path, n_cells=2)
    cents_back = similarity.ivf_append(delta, path)
    assert [c["id"] for c in cents_back] == [c["id"] for c in written]
    idx, cents = similarity.read_ivf_index(spark, path)
    # all 5 vectors present once, in base-derived cells
    assert sorted(r["id"] for r in idx.collect()) == [1, 2, 3, 4, 5]
    appended = similarity.ivf_topk(
        vectors, [5], k=3, n_probe=2, index=idx, centroids=cents
    ).collect()
    scratch = similarity.ivf_topk(
        vectors, [5], k=3, n_probe=2,
        index=similarity.ivf_index(vectors, centroids=written),
        centroids=written,
    ).collect()
    assert [(r["neighbor_id"], round(r["cosine"], 9)) for r in appended] == [
        (r["neighbor_id"], round(r["cosine"], 9)) for r in scratch
    ]


def test_lsh_candidates_find_near_duplicates(spark):
    # clusters of near-identical vectors -> band collision probability ~1
    rows = []
    for c in range(5):
        base = [1.0 if d == c else 0.05 * ((c + d) % 3) for d in range(8)]
        for i in range(4):
            v = list(base)
            v[7] += 0.001 * i
            rows.append(Row(vec_id=c * 10 + i, embedding=v))
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    cands = {(r["id_a"], r["id_b"]) for r in
             similarity.lsh_candidate_pairs(df, dim=8, planes=16, bands=4).collect()}
    for c in range(5):
        assert (c * 10, c * 10 + 1) in cands  # same-cluster pairs bucket together


def test_lsh_auto_width_scales_with_corpus(spark):
    """planes=None sizes band width from n so expected bucket occupancy is
    target_bucket; near-identical cluster pairs still collide, and the
    auto width matches the documented formula."""
    import math

    rows = []
    for c in range(8):
        base = [1.0 if d == c else 0.02 * ((c * d) % 5) for d in range(8)]
        for i in range(8):
            v = list(base)
            v[(c + 1) % 8] += 0.0005 * i
            rows.append(Row(vec_id=c * 100 + i, embedding=v))
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    n = len(rows)
    want_width = max(6, math.ceil(math.log2(n / 8)))
    cands = {(r["id_a"], r["id_b"]) for r in
             similarity.lsh_candidate_pairs(df, dim=8, planes=None, bands=4).collect()}
    # near-identical vectors agree on every sign bit regardless of width
    for c in range(8):
        assert (c * 100, c * 100 + 1) in cands
    # the auto width follows the documented formula (observable via the
    # signature width: buckets must fit in width*bands bits)
    sigs = similarity.lsh_signatures(df, dim=8, planes=want_width * 4)
    assert sigs.agg(F.max("bucket")).first()[0] < (1 << (want_width * 4))


def test_lsh_max_bucket_drops_degenerate_buckets(spark):
    """A pile of identical vectors lands in one bucket per band; the cap
    drops those buckets so candidates stay bounded, while distinct small
    clusters survive."""
    rows = [Row(vec_id=i, embedding=[1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    rows += [Row(vec_id=100, embedding=[-1.0, 0.5, 0.0, 0.0]),
             Row(vec_id=101, embedding=[-1.0, 0.5001, 0.0, 0.0])]
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    capped = {(r["id_a"], r["id_b"]) for r in similarity.lsh_candidate_pairs(
        df, dim=4, planes=16, bands=4, max_bucket=10).collect()}
    # the 40-way duplicate pile exceeds the cap in every band -> no pairs
    assert not any(a < 100 and b < 100 for a, b in capped)
    # the small cluster is untouched
    assert (100, 101) in capped
    uncapped = {(r["id_a"], r["id_b"]) for r in similarity.lsh_candidate_pairs(
        df, dim=4, planes=16, bands=4).collect()}
    assert any(a < 100 and b < 100 for a, b in uncapped)


def test_assign_splits_partitions_everything(docs):
    from mondrian_olap_spark.operators import sampling

    out = sampling.assign_splits(docs, {"train": 0.8, "val": 0.2})
    rows = out.collect()
    assert all(r["split"] in ("train", "val") for r in rows)
    # deterministic: same assignment on recompute
    again = {r["doc_id"]: r["split"] for r in sampling.assign_splits(docs, {"train": 0.8, "val": 0.2}).collect()}
    assert {r["doc_id"]: r["split"] for r in rows} == again


def test_deterministic_sample_stable_and_composable(docs):
    from mondrian_olap_spark.operators import sampling

    s1 = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.5).collect()}
    s2 = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.5).collect()}
    assert s1 == s2
    # a larger fraction strictly contains a smaller one (same seed)
    s_small = {r["doc_id"] for r in sampling.deterministic_sample(docs, 0.2).collect()}
    assert s_small <= s1


def test_redact_pii(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(doc_id=1, text="write to alice@example.com or call 555 123-4567 now"),
        Row(doc_id=2, text="no pii here"),
    ])
    out = {r["doc_id"]: r for r in text.redact_pii(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert "<EMAIL>" in out[1]["redacted"] and "<PHONE>" in out[1]["redacted"]
    assert "alice@" not in out[1]["redacted"]
    assert out[2]["redacted"] == "no pii here"


def test_quality_filter_reasons(spark):
    from pyspark.sql import Row

    long_good = " ".join(["the quick brown fox jumps over lazy dogs again"] * 5)
    df = spark.createDataFrame([
        Row(doc_id=1, text="too short"),
        Row(doc_id=2, text=long_good),
    ])
    out = {r["doc_id"]: r for r in text.quality_filter(df).collect()}
    assert out[1]["keep"] is False and out[1]["drop_reason"] == "too_short"
    assert out[2]["keep"] is True and out[2]["drop_reason"] is None


def test_text_features(docs):
    out = {r["doc_id"]: r for r in text.text_features(docs).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[1]["lang_guess"] == "en"
    assert out[1]["bag_fingerprint"] == out[4]["bag_fingerprint"]
    assert out[1]["bag_fingerprint"] != out[3]["bag_fingerprint"]
    assert 0.0 < out[1]["quality_score"] <= 1.0


def test_winnowing_fingerprints_stable(docs):
    fp1 = {(r["id"], r["fingerprint"]) for r in text.rolling_fingerprints(docs).collect()}
    fp2 = {(r["id"], r["fingerprint"]) for r in text.rolling_fingerprints(docs).collect()}
    assert fp1 == fp2
    d1 = {f for (i, f) in fp1 if i == 1}
    d4 = {f for (i, f) in fp1 if i == 4}
    assert d1 == d4  # identical docs -> identical fingerprint sets


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"\x89PNG fake bytes", meta={"frames": "1"}),
        Row(media_id=2, kind="video", payload=b"\x00\x00ftyp fake", meta={"frames": "25"}),
        Row(media_id=3, kind="audio", payload=None, meta={}),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_decode_media_deterministic(media):
    a = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    b = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert a.keys() == b.keys() == {1, 2, 3}
    for k in a:
        assert a[k]["features"] == b[k]["features"]
        assert len(a[k]["features"]) == multimodal.FEATURE_DIM
        assert a[k]["width"] >= 16 and a[k]["height"] >= 16


def test_resize_media_bounds_dimensions(media):
    out = {r["media_id"]: r for r in multimodal.resize_media(media, max_side=20).collect()}
    assert out.keys() == {1, 2, 3}
    for r in out.values():
        assert max(r["width"], r["height"]) <= 20
        assert r["payload"] is not None and len(r["payload"]) >= 1
    # deterministic across runs
    again = {r["media_id"]: r for r in multimodal.resize_media(media, max_side=20).collect()}
    assert all(bytes(out[k]["payload"]) == bytes(again[k]["payload"]) for k in out)


def _make_bmp(pixels):
    """Minimal uncompressed 24-bpp bottom-up BMP from a row-major [[(r,g,b)]]
    grid (pure struct — the same spec real_decoder parses)."""
    import struct

    h, w = len(pixels), len(pixels[0])
    stride = ((w * 3 + 3) // 4) * 4
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b_, g, r)) for r, g, b_ in row)
        body += line + b"\x00" * (stride - len(line))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return head + info + body


def _make_wav(samples, rate=8000, channels=1):
    """Minimal PCM-16 RIFF/WAVE from int16 samples (interleaved)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def test_real_decoder_bmp():
    """decode_bmp parses genuine pixel data: a 3x2 image with known colors
    yields exact dimensions and channel statistics."""
    import numpy as np

    g = 128 / 255.0
    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
    ]
    w, h, feats = multimodal.real_decoder("image", _make_bmp(pixels))
    assert (w, h) == (3, 2)
    arr = np.array(pixels, dtype=np.float64) / 255.0
    r_, g_, b_ = arr[..., 0], arr[..., 1], arr[..., 2]
    lum = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
    expect = [r_.mean(), g_.mean(), b_.mean(), lum.mean(), lum.std(),
              lum.min(), lum.max(), 1.5]
    assert feats == pytest.approx(expect)
    assert len(feats) == multimodal.FEATURE_DIM


def test_real_decoder_wav():
    """decode_wav parses genuine PCM samples: known waveform yields exact
    RMS/peak/zero-crossing/duration features."""
    import math

    w, h, feats = multimodal.real_decoder(
        "audio", _make_wav([0, 16384, -16384, 0], rate=8000)
    )
    assert (w, h) == (4, 1)  # samples-per-channel, channels
    mean, rms, peak, zcr, dur, khz, ch, depth = feats
    assert mean == pytest.approx(0.0)
    assert rms == pytest.approx(math.sqrt(0.125))
    assert peak == pytest.approx(0.5)
    assert zcr == pytest.approx(2 / 3)
    assert dur == pytest.approx(4 / 8000)
    assert (khz, ch, depth) == (8.0, 1.0, 0.5)


def test_real_decoder_through_map_in_pandas(spark):
    """The real codec rides the same mapInPandas stage as the fake one:
    genuine BMP/WAV payloads decode distributed, mixed in one frame."""
    rows = [
        Row(media_id=1, kind="image",
            payload=_make_bmp([[(255, 0, 0), (0, 0, 255)]]), meta={}),
        Row(media_id=2, kind="audio",
            payload=_make_wav([1000, -1000] * 50, rate=4000), meta={}),
    ]
    df = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           multimodal.decode_media(df, decoder=multimodal.real_decoder).collect()}
    assert (out[1]["width"], out[1]["height"]) == (2, 1)
    assert out[1]["features"][0] == pytest.approx(0.5)  # mean R
    assert (out[2]["width"], out[2]["height"]) == (100, 1)
    assert out[2]["features"][2] == pytest.approx(1000 / 32768)  # peak


def test_batch_decoders_match_per_row():
    """The whole-batch numpy decoders behind decode_media must be
    BIT-identical to the scalar codecs: same float64 operations, same
    per-row reduction order.  Mixed sizes/channels force several
    canonical groups; a WAV with an extra chunk exercises the per-row
    fallback inside the batch path."""
    import struct

    import numpy as np

    rng = np.random.RandomState(7)
    payloads = []
    for ns, ch, rate in [(32, 1, 8000), (32, 1, 8000), (7, 1, 4000),
                         (10, 2, 16000), (1, 1, 8000)]:
        samples = rng.randint(-32768, 32767, size=ns * ch).astype("<i2")
        payloads.append(
            ("audio", multimodal.encode_wav(samples, sample_rate=rate,
                                            channels=ch))
        )
    for h, w in [(4, 4), (3, 2), (5, 1), (4, 4)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payloads.append(("image", multimodal.encode_bmp(px)))
    # non-canonical WAV: a LIST chunk before fmt -> per-row fallback
    data = struct.pack("<4h", 5, -5, 7, -7)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    chunks = (b"WAVE" + b"LIST" + struct.pack("<I", 4) + b"INFO"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    payloads.append(("audio", b"RIFF" + struct.pack("<I", len(chunks)) + chunks))

    kinds = [k for k, _ in payloads]
    raw = [p for _, p in payloads]
    assert multimodal._wav_canonical_key(raw[-1]) is None  # really falls back
    bw, bh, bf = multimodal._real_decode_batch(kinds, raw)
    for i, (k, p) in enumerate(payloads):
        w, h, f = multimodal.real_decoder(k, p)
        assert (bw[i], bh[i]) == (w, h)
        assert bf[i] == f  # exact float equality, not approx
    fw, fh, ff = multimodal._fake_decode_batch(raw)
    for i, p in enumerate(raw):
        w, h, f = multimodal.fake_decoder("any", p)
        assert (fw[i], fh[i], ff[i]) == (w, h, f)


def test_batch_encoders_match_per_row():
    """encode_wav_batch / encode_bmp_batch must produce byte-identical
    payloads to the scalar encoders (the gates synthesize through them)."""
    import numpy as np

    rng = np.random.RandomState(11)
    smp = rng.randint(-1000, 1000, size=(6, 32)).astype("<i2")
    batch = multimodal.encode_wav_batch(smp, sample_rate=8000)
    for i in range(6):
        assert batch[i] == multimodal.encode_wav(smp[i], sample_rate=8000)
    inter = rng.randint(-1000, 1000, size=(3, 10)).astype("<i2")
    batch = multimodal.encode_wav_batch(inter, sample_rate=16000, channels=2)
    for i in range(3):
        assert batch[i] == multimodal.encode_wav(
            inter[i], sample_rate=16000, channels=2
        )
    for h, w in [(4, 4), (3, 2), (5, 1)]:  # odd widths exercise stride pad
        px = rng.randint(0, 256, size=(4, h, w, 3)).astype(np.uint8)
        batch = multimodal.encode_bmp_batch(px)
        for i in range(4):
            assert batch[i] == multimodal.encode_bmp(px[i])


def test_real_decoder_unsupported_formats_raise():
    with pytest.raises(NotImplementedError):
        multimodal.real_decoder("image", b"\x89PNG not parseable")
    with pytest.raises(ValueError):
        multimodal.real_decoder("image", b"BM" + b"\x00" * 10)  # truncated
    with pytest.raises(ValueError):  # RIFF but no data chunk
        import struct

        multimodal.real_decoder(
            "audio", b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        )


def test_frame_sample(media):
    out = multimodal.frame_sample(media, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    assert sorted(by_id[2]) == [0, 10, 20]
    assert sorted(by_id.get(1, [])) == [0]
    assert 3 not in by_id  # no frames metadata -> no rows


def test_dedup_clusters(spark, docs):
    """Connected components: 1-4 exact dups, 2 chained to 1 -> one cluster
    {1,2,4}; 3 alone."""
    from pyspark.sql import functions as F

    pairs = dedup.jaccard_pairs(docs, threshold=0.5)
    ids = docs.select(F.col("doc_id").alias("id"))
    out = {r["id"]: (r["cluster"], r["keep"]) for r in
           dedup.dedup_clusters(ids, pairs).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[4] == (1, False)
    assert out[3] == (3, True)


def test_dedup_clusters_chain(spark):
    """Transitive chain a-b, b-c -> one component even without an a-c pair."""
    from pyspark.sql import functions as F

    ids = spark.createDataFrame([(i,) for i in range(1, 6)], "id LONG")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a LONG, id_b LONG")
    out = {r["id"]: r["cluster"] for r in dedup.dedup_clusters(ids, pairs).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[4] == out[5] == 4


def test_ivf_external_index_requires_centroids(vectors):
    idx = similarity.ivf_index(vectors, n_cells=2)
    with pytest.raises(ValueError, match="centroids"):
        similarity.ivf_topk(vectors, [1], k=3, index=idx)


def test_ivf_external_index_with_centroids_matches(vectors):
    seeds = similarity.ivf_seeds(vectors, n_cells=2)
    idx = similarity.ivf_index(vectors, n_cells=2, centroids=seeds)
    ext = similarity.ivf_topk(
        vectors, [1], k=3, n_cells=2, n_probe=2, index=idx, centroids=seeds
    ).collect()
    internal = similarity.ivf_topk(vectors, [1], k=3, n_cells=2, n_probe=2).collect()
    assert [r["neighbor_id"] for r in ext] == [r["neighbor_id"] for r in internal]


def test_encode_wav_roundtrip():
    """encode_wav is the exact inverse of decode_wav's 16-bit case: the
    canonical layout matches _make_wav byte-for-byte (even sample count),
    odd byte counts get the RIFF word-alignment pad, and whole-frame
    validation rejects ragged multi-channel input."""
    samples = [0, 16384, -16384, 123, -1, 0]
    assert multimodal.encode_wav(samples, sample_rate=8000) == _make_wav(
        samples, rate=8000
    )
    w, h, feats = multimodal.decode_wav(
        multimodal.encode_wav([500, -500, 7], sample_rate=4000)
    )
    assert (w, h) == (3, 1)
    assert feats[5] == pytest.approx(4.0)  # kHz
    stereo = multimodal.encode_wav([1, 2, 3, 4], sample_rate=8000, channels=2)
    assert multimodal.decode_wav(stereo)[:2] == (2, 2)
    with pytest.raises(ValueError, match="frames"):
        multimodal.encode_wav([1, 2, 3], channels=2)


def test_wav_malformed_sizes_raise_cleanly():
    """decode_wav validates the declared data size and sample alignment
    (review fix): truncated and misaligned chunks raise ValueError, not
    an opaque numpy buffer error."""
    import struct

    good = _make_wav([0, 100, -100, 0])
    # declared data size overruns the payload
    truncated = good[:-2]
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_wav(truncated)
    # odd byte count for 16-bit samples
    data_at = good.rindex(b"data")
    odd = (
        good[: data_at + 4]
        + struct.pack("<I", 7)
        + good[data_at + 8 : data_at + 8 + 7]
    )
    with pytest.raises(ValueError, match="multiple"):
        multimodal.decode_wav(odd)


def test_ivf_train_refines_centroids(spark):
    """Lloyd's training moves seed vectors to the CLUSTER MEANS: with one
    seed per cluster (ids 0 and 1), the trained centroids converge to the
    per-cluster averages and one-probe search becomes exact."""
    rows = [Row(vec_id=0, embedding=[1.0, 0.2, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 0.2, 1.0, 0.0])]
    for i in range(2, 10):  # cluster A along x
        rows.append(Row(vec_id=i, embedding=[1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(10):  # cluster B along z
        rows.append(Row(vec_id=100 + i, embedding=[0.0, 0.01 * i, 1.0, 0.0]))
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    trained = similarity.ivf_train(df, n_cells=2, iterations=4)
    assert len(trained) == 2
    # the trained centroids separate the clusters: one x-dominant, one
    # z-dominant — and each is the (normalized-direction) cluster mean
    doms = sorted(max(range(4), key=lambda i: abs(c["v"][i])) for c in trained)
    assert doms == [0, 2]
    for c in trained:
        dom = max(range(4), key=lambda i: abs(c["v"][i]))
        assert c["v"][dom] == pytest.approx(1.0, abs=0.05)
    exact = [r["neighbor_id"] for r in
             similarity.cosine_topk(df, [104], k=3).collect()]
    got = [r["neighbor_id"] for r in similarity.ivf_topk(
        df, [104], k=3, n_cells=2, n_probe=1, centroids=trained
    ).collect()]
    assert got == exact  # n_probe=1 finds the true neighbors when trained
    # the trained quantizer composes with a prebuilt index too
    idx = similarity.ivf_index(df, n_cells=2, centroids=trained)
    got2 = [r["neighbor_id"] for r in similarity.ivf_topk(
        df, [104], k=3, n_cells=2, n_probe=1, index=idx, centroids=trained
    ).collect()]
    assert got2 == exact


def test_repetition_features_known_values(spark):
    """Known repetition fractions: 'a a a b' has dup_token 0.5 (2 distinct
    of 4) and top-2-gram 'a a' covering 4/4 positions... computed per the
    documented n*count/len formula."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a b"),
         Row(doc_id=2, text="w x y z"),
         Row(doc_id=3, text="solo")],
    )
    out = {r["doc_id"]: r for r in text.repetition_features(df).collect()}
    assert out[1]["dup_token_fraction"] == pytest.approx(0.5)
    # grams of doc1: [a a, a a, a b] -> top gram 'a a' count 2 -> 2*2/4 = 1.0
    assert out[1]["top_ngram_fraction"] == pytest.approx(1.0)
    assert out[2]["dup_token_fraction"] == 0.0
    # all 2-grams distinct -> 1 * 2 / 4 = 0.5
    assert out[2]["top_ngram_fraction"] == pytest.approx(0.5)
    # single-token doc: gram = the token itself, fraction 2*1/1 capped by formula
    assert out[3]["dup_token_fraction"] == 0.0


def test_real_resizer_bmp_roundtrip(spark):
    """real_resizer genuinely downscales BMP pixels: a 4x2 two-tone image
    resized to max_side=2 keeps the tone layout (nearest-neighbor), the
    output re-parses as a valid BMP, and an un-resized image round-trips
    bit-identically through encode_bmp."""
    left, right = (255, 0, 0), (0, 0, 255)
    pixels = [[left, left, right, right], [left, left, right, right]]
    payload = _make_bmp(pixels)
    out, nw, nh = multimodal.real_resizer("image", payload, max_side=2)
    assert (nw, nh) == (2, 1)
    w2, h2, feats = multimodal.decode_bmp(out)
    assert (w2, h2) == (2, 1)
    # the resized image keeps one red and one blue pixel: mean R = mean B = 0.5
    assert feats[0] == pytest.approx(0.5) and feats[2] == pytest.approx(0.5)
    # no-op resize round-trips bit-exactly
    same, sw, sh = multimodal.real_resizer("image", payload, max_side=10)
    assert (sw, sh) == (4, 2) and same == payload
    with pytest.raises(NotImplementedError):
        multimodal.real_resizer("image", b"\x89PNG...", 10)
    # and it rides the same mapInPandas stage as the fake resizer
    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", payload=payload, meta={})],
        schema=multimodal.MEDIA_SCHEMA,
    )
    rows = multimodal.resize_media(df, max_side=2, resizer=multimodal.real_resizer).collect()
    assert rows[0]["width"] == 2 and rows[0]["height"] == 1


def test_ivf_index_partitioned_probe_prunes(spark, tmp_path):
    """The documented IVF scale path: persist the index PARTITIONED BY
    cell, and a probe filtered to its cells becomes a partition-pruned
    scan (PartitionFilters in the plan — only probed cells are read)."""
    rows = [Row(vec_id=i, embedding=[1.0 + 0.001 * i, 0.0]) for i in range(6)]
    rows += [Row(vec_id=10 + i, embedding=[0.0, 1.0 + 0.001 * i]) for i in range(6)]
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    trained = similarity.ivf_train(df, n_cells=2, iterations=3)
    idx = similarity.ivf_index(df, n_cells=2, centroids=trained)
    path = str(tmp_path / "ivf_index")
    idx.write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)
    cells = sorted({r["cell"] for r in idx.select("cell").distinct().collect()})
    probe = stored.filter(F.col("cell") == cells[0])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # a NON-EMPTY partition filter referencing the cell column — an empty
    # 'PartitionFilters: []' (no pruning) must fail this test
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m is not None and "cell" in m.group(1), plan[:1500]
    # the probed scan returns only that cell's vectors
    got_cells = {r["cell"] for r in probe.collect()}
    assert got_cells == {cells[0]}


def test_sessionize_gap_semantics(spark):
    """Known session layout: events at 0s/10s/40min/41min for one user
    split into two sessions at a 30-min gap; session stats carry exact
    integer-microsecond durations."""
    from datetime import datetime

    from mondrian_olap_spark.operators import sessions

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 0, 0, 0).fromtimestamp(
            t0.timestamp() + sec
        )

    rows = [
        Row(event_id=1, user_id=7, ts=at(0)),
        Row(event_id=2, user_id=7, ts=at(10)),
        Row(event_id=3, user_id=7, ts=at(40 * 60)),
        Row(event_id=4, user_id=7, ts=at(41 * 60)),
        Row(event_id=5, user_id=9, ts=at(5)),
    ]
    df = spark.createDataFrame(rows)
    out = {(r["user_id"], r["session_idx"]): r for r in
           sessions.session_stats(df, gap_seconds=1800).collect()}
    assert out[(7, 1)]["n_events"] == 2
    assert out[(7, 1)]["duration_us"] == 10_000_000
    assert out[(7, 2)]["n_events"] == 2
    assert out[(7, 2)]["duration_us"] == 60_000_000
    assert out[(9, 1)]["n_events"] == 1 and out[(9, 1)]["duration_us"] == 0


def test_chunk_documents_windows(spark):
    """Chunk layout: 11 tokens, chunk=5, overlap=2 (stride 3) -> starts
    1,4,7 cover to token 11; short docs yield exactly one chunk."""
    rows = [
        Row(doc_id=1, text="t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"),
        Row(doc_id=2, text="only three tokens"),
    ]
    out = text.chunk_documents(
        spark.createDataFrame(rows), chunk_tokens=5, overlap=2
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["id"], []).append(r)
    c1 = sorted(by[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_text"] for r in c1] == [
        "t1 t2 t3 t4 t5", "t4 t5 t6 t7 t8", "t7 t8 t9 t10 t11",
    ]
    assert [r["chunk_n_tokens"] for r in c1] == [5, 5, 5]
    assert len(by[2]) == 1 and by[2][0]["chunk_text"] == "only three tokens"
    with pytest.raises(ValueError, match="overlap"):
        text.chunk_documents(spark.createDataFrame(rows), chunk_tokens=5, overlap=5)


def test_contamination_pairs_cross_frame(spark):
    """Cross-frame contamination: a held-out doc near-identical to a
    training doc is flagged; unrelated docs are not; candidates come only
    from shared shingles."""
    train = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=2, text="completely unrelated training material goes here now"),
    ])
    held = spark.createDataFrame([
        Row(doc_id=100, text="the quick brown fox jumps over the lazy dog today"),
        Row(doc_id=101, text="novel heldout benchmark question nothing shared"),
    ])
    pairs = {(r["corpus_id"], r["heldout_id"]): r["jaccard"]
             for r in dedup.contamination_pairs(train, held, threshold=0.5).collect()}
    assert pairs == {(1, 100): 1.0}


def test_sessionize_null_ts_excluded(spark):
    """A NULL-timestamp event cannot be ordered into any session — it must
    be dropped, not silently merged into the user's first session (same
    rule as funnel_counts)."""
    from datetime import datetime

    from mondrian_olap_spark.operators import sessions

    rows = [
        Row(event_id=1, user_id=7, ts=datetime(2024, 1, 1, 0, 0, 0)),
        Row(event_id=2, user_id=7, ts=datetime(2024, 1, 1, 0, 0, 10)),
        Row(event_id=3, user_id=7, ts=None),
    ]
    out = sessions.sessionize(spark.createDataFrame(rows)).collect()
    assert {r["event_id"] for r in out} == {1, 2}
    assert all(r["session_idx"] == 1 for r in out)


def test_sessionize_ntz_wall_clock_semantics(spark):
    """TIMESTAMP_NTZ gaps compute from wall-clock component math — a
    non-UTC session timezone (including a DST-transition morning) must
    not shift gaps or durations (review fix)."""
    from mondrian_olap_spark.operators import sessions

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.sql(
            """
            SELECT * FROM VALUES
              (1, 7, TIMESTAMP_NTZ'2024-03-10 01:50:00'),
              (2, 7, TIMESTAMP_NTZ'2024-03-10 03:15:00')
            AS t(event_id, user_id, ts)
            """
        )
        out = sessions.session_stats(df, gap_seconds=1800).collect()
        # 85-minute wall gap > 30 min: TWO sessions even across the DST gap
        assert len(out) == 2
        assert all(r["n_events"] == 1 and r["duration_us"] == 0 for r in out)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_repetition_fraction_bounded(spark):
    """top_ngram_fraction is clamped to [0,1] (review fix): a fully
    repetitive doc and a single-token doc both report 1.0, never more."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a a"), Row(doc_id=2, text="solo")]
    )
    out = {r["doc_id"]: r["top_ngram_fraction"]
           for r in text.repetition_features(df).collect()}
    assert out[1] == 1.0 and out[2] == 1.0


def test_contamination_guard_drops_boilerplate(spark):
    """The stop-shingle guard applies across BOTH corpora: shared
    boilerplate alone must not produce contamination pairs (and must not
    make the cross-join quadratic)."""
    boiler = "standard license header text appears in every single document here"
    train = spark.createDataFrame([
        Row(doc_id=i, text=f"{boiler} training body number {i} about topic {i}")
        for i in range(20)
    ])
    held = spark.createDataFrame([
        Row(doc_id=100 + i, text=f"{boiler} heldout body number {i} on theme {i}")
        for i in range(20)
    ] + [Row(doc_id=200, text="training body number 3 about topic 3 " + boiler)])
    pairs = {(r["corpus_id"], r["heldout_id"]) for r in
             dedup.contamination_pairs(train, held, threshold=0.5).collect()}
    # boilerplate-only overlap yields nothing; the genuinely shared body does
    assert (3, 200) in pairs
    assert all(b == 200 for _, b in pairs)


def test_pack_documents_assignment(spark):
    """Running-sum packing: a doc joins the pack where its span STARTS;
    per-group streams are independent; offsets restart per group."""
    from mondrian_olap_spark.operators import packing

    rows = [
        Row(doc_id=1, source="a", text="w " * 6),   # 6 toks → pack 0, off 0
        Row(doc_id=2, source="a", text="w " * 6),   # off 6 → pack 0 (straddles)
        Row(doc_id=3, source="a", text="w " * 6),   # off 12 → pack 1
        Row(doc_id=4, source="b", text="w " * 3),   # off 0 → pack 0
    ]
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_tokens"])
        for r in packing.pack_documents(
            spark.createDataFrame(rows), budget=10
        ).collect()
    }
    assert out[1] == (0, 0, 6)
    assert out[2] == (0, 6, 6)
    assert out[3] == (1, 12, 6)
    assert out[4] == (0, 0, 3)


def test_pack_summary_rollup(spark):
    from mondrian_olap_spark.operators import packing

    rows = [
        Row(doc_id=i, source="s", text="w " * 4) for i in range(1, 7)
    ]  # 6 docs × 4 toks, budget 8 → packs 0..2, 2 docs each
    out = {
        r["pack_id"]: (r["n_docs"], r["total_tokens"])
        for r in packing.pack_summary(
            spark.createDataFrame(rows), budget=8
        ).collect()
    }
    assert out == {0: (2, 8), 1: (2, 8), 2: (2, 8)}


def test_balanced_sample_deterministic_and_capped(spark):
    from mondrian_olap_spark.operators import packing

    rows = [
        Row(doc_id=i, lang=("en" if i < 40 else "de"), text="x")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    a = packing.balanced_sample(df, per_group=5, by="lang")
    b = packing.balanced_sample(df.repartition(7), per_group=5, by="lang")
    ka = sorted((r["lang"], r["doc_id"]) for r in a.collect())
    kb = sorted((r["lang"], r["doc_id"]) for r in b.collect())
    assert ka == kb  # layout-independent
    counts = {}
    for lang, _ in ka:
        counts[lang] = counts.get(lang, 0) + 1
    assert counts == {"en": 5, "de": 5}


def test_balanced_sample_small_stratum_passthrough(spark):
    from mondrian_olap_spark.operators import packing

    rows = [Row(doc_id=i, lang="fr", text="x") for i in range(3)]
    out = packing.balanced_sample(spark.createDataFrame(rows), per_group=10)
    assert out.count() == 3


def test_tfidf_top_terms_ranking(spark):
    """A term in every doc has ln(N/df)=0 weight; rarer terms with enough
    occurrences rank first; term tiebreak is deterministic."""
    import math

    rows = [
        Row(doc_id=1, text="common rare rare rare"),
        Row(doc_id=2, text="common other"),
        Row(doc_id=3, text="common other"),
    ]
    out = text.tfidf_top_terms(spark.createDataFrame(rows), n=3).collect()
    by_term = {r["term"]: r for r in out}
    assert by_term["common"]["weight"] == 0.0
    assert by_term["rare"]["tf"] == 3 and by_term["rare"]["df"] == 1
    assert by_term["rare"]["weight"] == pytest.approx(
        round(3 * math.log(3 / 1), 6)
    )
    assert out[0]["term"] == "rare"  # highest weight first


def test_select_top_quality_per_group(spark):
    rows = [
        Row(doc_id=i, source=s, lang="en", text=("the and is " * n).strip())
        for i, (s, n) in enumerate(
            [("a", 30), ("a", 2), ("a", 20), ("b", 1), ("b", 25)]
        )
    ]
    out = text.select_top_quality(
        spark.createDataFrame(rows), k=1, by="source"
    ).collect()
    got = {r["source"]: r["doc_id"] for r in out}
    assert got == {"a": 0, "b": 4}  # longest stopword-dense docs win


def test_label_norm_stats_values(spark):
    from mondrian_olap_spark.operators import similarity

    rows = [
        Row(vec_id=1, label=0, embedding=[3.0, 4.0]),     # norm 5
        Row(vec_id=2, label=0, embedding=[0.0, 2.0]),     # norm 2
        Row(vec_id=3, label=1, embedding=[0.0, 0.0]),     # norm 0
    ]
    df = spark.createDataFrame(rows).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    out = {r["label"]: r for r in similarity.label_norm_stats(df).collect()}
    assert out[0]["n_vectors"] == 2
    assert out[0]["min_norm"] == 2.0 and out[0]["max_norm"] == 5.0
    assert out[0]["avg_norm"] == pytest.approx(3.5)
    assert out[1]["min_norm"] == 0.0 and out[1]["max_norm"] == 0.0


# ---------------------------------------------------------------- events
def _ev_rows():
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    mk = lambda m: base + dt.timedelta(minutes=m)
    return [
        # user 1: click@0, view@5, click@10, purchase@15, purchase@20
        Row(event_id=1, user_id=1, event_type="click", ts=mk(0), value=1.0),
        Row(event_id=2, user_id=1, event_type="view", ts=mk(5), value=2.0),
        Row(event_id=3, user_id=1, event_type="click", ts=mk(10), value=3.0),
        Row(event_id=4, user_id=1, event_type="purchase", ts=mk(15), value=4.0),
        Row(event_id=5, user_id=1, event_type="purchase", ts=mk(20), value=5.0),
        # user 2: purchase with NO prior click
        Row(event_id=6, user_id=2, event_type="purchase", ts=mk(7), value=6.0),
        # user 3: click AFTER its only purchase (must not attribute)
        Row(event_id=7, user_id=3, event_type="purchase", ts=mk(1), value=7.0),
        Row(event_id=8, user_id=3, event_type="click", ts=mk(2), value=8.0),
        # user 4: click at the EXACT purchase instant (inclusive tie)
        Row(event_id=9, user_id=4, event_type="click", ts=mk(9), value=9.0),
        Row(event_id=10, user_id=4, event_type="purchase", ts=mk(9), value=10.0),
    ]


def test_asof_join_backward_inclusive(spark):
    from mondrian_olap_spark.operators import events as ev_ops

    ev = spark.createDataFrame(_ev_rows())
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    out = {
        r["event_id"]: r
        for r in ev_ops.asof_join(
            purchases, clicks, key="user_id", value_cols=["value"],
            suffix="_click",
        ).collect()
    }
    assert len(out) == 5
    assert out[4]["value_click"] == 3.0   # latest prior click, not first
    assert out[5]["value_click"] == 3.0   # carried forward
    assert out[6]["value_click"] is None  # no prior click at all
    assert out[6]["ts_click"] is None
    assert out[7]["value_click"] is None  # later click must not match
    assert out[10]["value_click"] == 9.0  # equal-instant tie is inclusive
    # left row count is preserved exactly (left outer semantics)
    assert sorted(out) == [4, 5, 6, 7, 10]


def test_funnel_counts_ordering(spark):
    from mondrian_olap_spark.operators import events as ev_ops

    ev = spark.createDataFrame(_ev_rows())
    out = {
        r["step"]: r["n_users"]
        for r in ev_ops.funnel_counts(
            ev, ["click", "purchase"]
        ).collect()
    }
    # click: users 1,3,4; purchase strictly after their first click: 1 only
    # (user 3 purchased before clicking, user 4 tied — strict > excludes)
    assert out == {"click": 3, "purchase": 1}


def test_funnel_counts_empty_step(spark):
    from mondrian_olap_spark.operators import events as ev_ops

    ev = spark.createDataFrame(_ev_rows())
    out = [
        (r["step_idx"], r["n_users"])
        for r in ev_ops.funnel_counts(
            ev, ["signup", "purchase"]
        ).collect()
    ]
    assert sorted(out) == [(1, 0), (2, 0)]


def test_dedup_clusters_raises_on_non_convergence(spark):
    """A chain component longer than max_iterations must FAIL loudly —
    silently returning split labels would keep duplicates downstream."""
    n = 8
    ids = spark.createDataFrame([Row(id=i) for i in range(n)])
    chain = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(n - 1)]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.dedup_clusters(ids, chain, max_iterations=2)
    # with a sufficient budget the same graph converges to one cluster
    ok = dedup.dedup_clusters(ids, chain, max_iterations=n).collect()
    assert {r["cluster"] for r in ok} == {0}


def test_dedup_clusters_pointer_doubling_long_chain(spark):
    """A planted 1000-node chain converges within a LOGARITHMIC round
    budget — pointer doubling compounds label reach to ~2^k hops after k
    rounds, where one-hop label propagation would need 1000 rounds."""
    n = 1000
    ids = spark.createDataFrame([Row(id=i) for i in range(n)])
    chain = spark.createDataFrame(
        [Row(id_a=i, id_b=i + 1) for i in range(n - 1)]
    )
    out = dedup.dedup_clusters(ids, chain, max_iterations=12).collect()
    assert {r["cluster"] for r in out} == {0}
    assert sum(r["keep"] for r in out) == 1


def test_bigram_entropy_detects_repeated_phrases(spark):
    """A document cycling one phrase has near-normal unigram variety but
    collapsed bigram entropy; short docs (<2 tokens) drop from output."""
    import math

    from mondrian_olap_spark.operators import text as text_ops

    rows = [
        Row(doc_id=1, text="alpha beta alpha beta alpha beta alpha beta"),
        Row(doc_id=2, text="alpha beta gamma delta epsilon zeta eta theta"),
        Row(doc_id=3, text="single"),
    ]
    out = {r["id"]: r for r in text_ops.bigram_entropy(
        spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 2}  # one-token doc has no bigrams
    assert out[1]["n_bigrams"] == 7 and out[1]["n_distinct_bigrams"] == 2
    assert out[2]["n_distinct_bigrams"] == 7
    # doc 2: all 7 bigrams distinct → entropy = ln(7); doc 1 collapsed
    assert out[2]["bigram_entropy"] == round(math.log(7), 6)
    assert out[1]["bigram_entropy"] < out[2]["bigram_entropy"]


def test_kl_from_corpus_hand_computed(spark):
    """Hand-checkable KL: corpus = {a:2, b:2, c:2}, N=6.  Docs 'a b' score
    ln(1.5) each; the concentrated doc 'c c' scores ln(3) — farther from
    the corpus distribution."""
    import math

    from mondrian_olap_spark.operators import text as text_ops

    rows = [
        Row(doc_id=1, text="a b"),
        Row(doc_id=2, text="a b"),
        Row(doc_id=3, text="c c"),
    ]
    out = {r["id"]: r for r in text_ops.kl_from_corpus(
        spark.createDataFrame(rows)).collect()}
    assert out[1]["kl"] == round(math.log(1.5), 6)
    assert out[2]["kl"] == out[1]["kl"]
    assert out[3]["kl"] == round(math.log(3.0), 6)
    assert all(r["kl"] >= 0 for r in out.values())


def test_curate_corpus_end_to_end(spark):
    """Composed curation: exact dups collapse to the min id, quality
    rules drop junk, survivors get deterministic splits."""
    from mondrian_olap_spark.operators.pipeline import curate_corpus

    # passes every rule: 28 tokens, avg token length ≈ 6.4 (≥ 4.0),
    # stopword ratio 4/28 (≥ 0.02), no punctuation
    good = ("the quantum computer calculates enormous matrices during "
            "the evening session while patient researchers monitor "
            "the thermal sensors recording voltage readings across "
            "the silicon wafers inside sealed chambers throughout winter")
    rows = [
        Row(doc_id=1, text=good),
        Row(doc_id=2, text=good),          # exact dup of 1 → absorbed
        Row(doc_id=3, text="  " + good.upper() + "  "),  # normalized dup of 1
        Row(doc_id=4, text="x y"),          # too_short → dropped
        Row(doc_id=5, text=good + " extra unique tail words here today"),
    ]
    df = spark.createDataFrame(rows)
    out = curate_corpus(df, split_weights={"train": 0.5, "test": 0.5})
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 5}            # min-id survivor, junk dropped
    assert got[1]["dup_count"] == 3      # docs 1, 2, 3 collapsed
    assert got[5]["dup_count"] == 1
    assert all(r["split"] in ("train", "test") for r in got.values())
    assert all(r["quality_score"] is not None for r in got.values())
    # without splits: no split column, same survivor set
    out2 = curate_corpus(df)
    assert "split" not in out2.columns and out2.count() == 2


def test_parse_props_explicit_schema(spark):
    from mondrian_olap_spark.operators import events as ev_ops

    df = spark.createDataFrame([
        Row(event_id=1, props='{"k": 42, "tag": "a"}'),
        Row(event_id=2, props='{"k": null}'),
        Row(event_id=3, props='not json'),
        Row(event_id=4, props=None),
    ])
    out = {r["event_id"]: (r["k"], r["tag"]) for r in ev_ops.parse_props(
        df, {"k": "int", "tag": "string"}).collect()}
    assert out[1] == (42, "a")
    assert out[2] == (None, None)
    assert out[3] == (None, None)  # malformed JSON → NULLs, row survives
    assert out[4] == (None, None)
    import pytest as _pt
    with _pt.raises(ValueError):
        ev_ops.parse_props(df, {})


def test_quantize_embeddings_roundtrip(spark):
    from mondrian_olap_spark.operators import similarity as sim

    df = spark.createDataFrame([
        Row(vec_id=1, embedding=[0.5, -0.25, 0.0, 0.125]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = {r["id"]: r for r in sim.quantize_embeddings(df).collect()}
    r1 = out[1]
    assert abs(r1["scale"] - 0.5 / 127) < 1e-12
    assert r1["qvec"] == [127, -63, 0, 32]  # floor(x/scale+0.5): -63.5→-63, 31.75→32
    assert max(abs(q) for q in r1["qvec"]) <= 127
    assert out[2]["scale"] == 0.0 and out[2]["qvec"] == [0, 0, 0, 0]
    # reconstruction error bounded by scale/2 (+ float slack)
    err = max(abs(q * r1["scale"] - x)
              for q, x in zip(r1["qvec"], [0.5, -0.25, 0.0, 0.125]))
    assert err <= r1["scale"] / 2 + 1e-9


def test_quantization_error_stats(spark):
    from mondrian_olap_spark.operators import similarity as sim

    df = spark.createDataFrame([
        Row(label=1, embedding=[1.0, 0.5, -0.5]),
        Row(label=1, embedding=[0.2, 0.1, 0.0]),
        Row(label=2, embedding=[0.0, 0.0, 0.0]),
    ]).withColumn("embedding", F.col("embedding").cast("array<float>"))
    out = {r["label"]: r for r in sim.quantization_error_stats(df).collect()}
    assert out[1]["n_vectors"] == 2
    assert 0 <= out[1]["avg_max_err"] <= out[1]["worst_max_err"]
    assert out[1]["worst_max_err"] <= 1.0 / 127 / 2 + 1e-9  # ≤ scale/2
    assert out[1]["avg_cosine"] > 0.999  # int8 keeps direction
    assert out[2]["worst_max_err"] == 0.0 and out[2]["avg_cosine"] is None


def test_key_skew_profile(spark):
    from mondrian_olap_spark.operators import util

    rows = [Row(a="hot", b=i) for i in range(6)]
    rows += [Row(a="warm", b=100), Row(a="warm", b=100), Row(a="x", b=101)]
    df = spark.createDataFrame(rows)
    out = {r["column"]: r for r in util.key_skew_profile(
        df, ["a", "b"], top=2, min_count=2).collect()}
    ra = out["a"]
    assert (ra["n_rows"], ra["n_keys"], ra["max_count"]) == (9, 3, 6)
    assert ra["top_keys"] == "hot:6,warm:2"
    assert abs(ra["skew_ratio"] - 6 / (9 / 3)) < 1e-9
    rb = out["b"]
    assert rb["max_count"] == 2  # b=100 twice
    assert rb["top_keys"] == "100:2"  # min_count drops all singletons
    # all-unique column: empty top list, ratio 1
    out2 = util.key_skew_profile(df.select("b").distinct(), ["b"]).collect()[0]
    assert out2["top_keys"] == "" and out2["skew_ratio"] == 1.0


def test_asof_join_null_key_never_matches(spark):
    """SQL join equality: NULL key ≠ NULL key.  The NULL-key left row
    survives (left-outer) with NULL right values; the NULL-key right row
    matches nothing."""
    import datetime as dt

    from mondrian_olap_spark.operators import events as ev_ops

    t = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [Row(k=None, ts=t, x=1), Row(k=1, ts=t, x=2)]
    )
    right = spark.createDataFrame(
        [Row(k=None, ts=t - dt.timedelta(minutes=1), value=7.0),
         Row(k=1, ts=t - dt.timedelta(minutes=1), value=9.0)]
    )
    out = {r["x"]: r["value_right"]
           for r in ev_ops.asof_join(left, right, key="k").collect()}
    assert out == {1: None, 2: 9.0}


def test_pack_documents_null_text_behaves_as_empty(spark):
    """NULL text must not poison the running token sum (size(split(NULL))
    is NULL): it counts like the empty string and later offsets stay
    consistent."""
    from mondrian_olap_spark.operators import packing

    df = spark.createDataFrame([
        Row(doc_id=1, source="a", text="one two three"),
        Row(doc_id=2, source="a", text=None),
        Row(doc_id=3, source="a", text="four five"),
    ])
    out = {r["doc_id"]: (r["n_tokens"], r["pack_offset"])
           for r in packing.pack_documents(df, budget=100).collect()}
    empty_toks = out[2][0]
    assert empty_toks is not None  # the NULL-propagation failure mode
    assert out[1] == (3, 0)
    assert out[2] == (empty_toks, 3)
    assert out[3] == (2, 3 + empty_toks)


def test_segment_dedup_null_text_doc_not_dropped(spark):
    from mondrian_olap_spark.operators import text as text_ops

    df = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta"),
        Row(doc_id=2, text=None),
    ])
    out = text_ops.segment_dedup(df, seg_tokens=2)
    assert out.count() == 2  # NULL-text doc still has an output row


def test_funnel_counts_null_ts_excluded(spark):
    """A NULL-timestamp event can never be ordered against the previous
    step's completion — it must not count toward any step."""
    from mondrian_olap_spark.operators import events as ev_ops

    rows = _ev_rows() + [
        Row(event_id=99, user_id=9, event_type="click", ts=None, value=0.0),
    ]
    ev = spark.createDataFrame(rows)
    out = {
        r["step"]: r["n_users"]
        for r in ev_ops.funnel_counts(ev, ["click", "purchase"]).collect()
    }
    # identical to test_funnel_counts_ordering: user 9's NULL-ts click is dropped
    assert out == {"click": 3, "purchase": 1}


def test_retention_cohorts_weekly(spark):
    import datetime as dt

    from mondrian_olap_spark.operators import events as ev_ops

    rows = [
        # user 1 first active week of Jan 1 2024 (Mon), returns wk+1, wk+3
        Row(event_id=1, user_id=1, event_type="view",
            ts=dt.datetime(2024, 1, 2), value=0.0),
        Row(event_id=2, user_id=1, event_type="view",
            ts=dt.datetime(2024, 1, 10), value=0.0),
        Row(event_id=3, user_id=1, event_type="view",
            ts=dt.datetime(2024, 1, 24), value=0.0),
        # user 2 first active wk2, never returns
        Row(event_id=4, user_id=2, event_type="view",
            ts=dt.datetime(2024, 1, 9), value=0.0),
    ]
    out = {
        (str(r["cohort"]), r["offset"]): r["n_users"]
        for r in ev_ops.retention_cohorts(
            spark.createDataFrame(rows), period="week"
        ).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
    }


def test_segment_dedup_removes_repeats(spark):
    rows = [
        Row(doc_id=1, text="a b c d e f"),       # segs (k=3): "a b c","d e f"
        Row(doc_id=2, text="a b c x y z"),       # "a b c" repeated → dropped
        Row(doc_id=3, text="x y z"),             # seen in doc 2 → dropped
    ]
    out = {
        r["id"]: r
        for r in text.segment_dedup(
            spark.createDataFrame(rows), seg_tokens=3
        ).collect()
    }
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "x y z"
    assert out[3]["n_segments"] == 1 and out[3]["n_kept"] == 0
    assert out[3]["clean_text"] == ""            # fully deduplicated


def test_segment_dedup_partial_tail_segment(spark):
    rows = [Row(doc_id=1, text="a b c d")]       # k=3 → "a b c", "d"
    (r,) = text.segment_dedup(
        spark.createDataFrame(rows), seg_tokens=3
    ).collect()
    assert r["n_segments"] == 2 and r["clean_text"] == "a b c d"


def test_unigram_entropy_values(spark):
    import math

    rows = [
        Row(doc_id=1, text="a a a a"),        # one word → H = 0
        Row(doc_id=2, text="a b c d"),        # uniform over 4 → H = ln 4
        Row(doc_id=3, text="a a b"),          # H = ln3 - (2 ln2)/3
    ]
    out = {
        r["id"]: r
        for r in text.unigram_entropy(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    assert out[2]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert out[3]["entropy"] == pytest.approx(
        math.log(3) - 2 * math.log(2) / 3, abs=1e-6
    )
    assert out[3]["n_tokens"] == 3


def test_mixing_weights_targets(spark):
    from mondrian_olap_spark.operators import sampling

    rows = (
        [Row(doc_id=i, source="web") for i in range(60)]
        + [Row(doc_id=100 + i, source="books") for i in range(20)]
        + [Row(doc_id=200 + i, source="junk") for i in range(20)]
    )
    out = {
        r["source"]: r
        for r in sampling.mixing_weights(
            spark.createDataFrame(rows), {"web": 0.5, "books": 0.5}
        ).collect()
    }
    # books is scarcest vs target: s = (20/100)/0.5 = 0.4 → kept = 40 docs
    assert out["books"]["sample_prob"] == pytest.approx(1.0)
    assert out["web"]["sample_prob"] == pytest.approx(20 / 60)
    assert out["web"]["expected_docs"] == pytest.approx(20.0)
    assert out["junk"]["sample_prob"] == 0.0      # unnamed group dropped
    assert out["junk"]["target_frac"] == 0.0


def test_mixing_weights_normalizes_targets(spark):
    from mondrian_olap_spark.operators import sampling

    rows = [Row(doc_id=i, source="a") for i in range(10)] + [
        Row(doc_id=100 + i, source="b") for i in range(10)
    ]
    out = {
        r["source"]: r["sample_prob"]
        for r in sampling.mixing_weights(
            spark.createDataFrame(rows), {"a": 2.0, "b": 2.0}  # unnormalized
        ).collect()
    }
    assert out == {"a": pytest.approx(1.0), "b": pytest.approx(1.0)}


def test_asof_join_null_right_ts_never_matches(spark):
    import datetime as dt

    from mondrian_olap_spark.operators import events as ev_ops

    left = spark.createDataFrame(
        [Row(k=1, ts=dt.datetime(2024, 1, 1, 12), lv=1.0)]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=None, value=99.0)],
        "k long, ts timestamp, value double",
    )
    (r,) = ev_ops.asof_join(left, right, key="k").collect()
    assert r["value_right"] is None and r["ts_right"] is None


def test_ensure_min_parallelism_noop_on_wide_input(spark):
    from mondrian_olap_spark.operators.util import ensure_min_parallelism

    df = spark.range(1000).repartition(64)
    assert ensure_min_parallelism(df) is df  # already parallel → untouched
    narrow = spark.range(1000).coalesce(1)
    out = ensure_min_parallelism(narrow)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_inverted_index_postings_sorted_and_pruned(spark):
    """Posting lists are sorted by id, df counts distinct docs (a repeated
    term in one doc counts once), and min_df prunes the hapax tail."""
    rows = [
        Row(doc_id=3, text="apple apple banana"),
        Row(doc_id=1, text="apple cherry"),
        Row(doc_id=2, text="  apple   banana "),
    ]
    idx = {
        r["term"]: (r["df"], r["postings"])
        for r in text.inverted_index(spark.createDataFrame(rows)).collect()
    }
    assert idx["apple"] == (3, [1, 2, 3])     # sorted despite insert order
    assert idx["banana"] == (2, [2, 3])
    assert idx["cherry"] == (1, [1])
    pruned = {
        r["term"]
        for r in text.inverted_index(
            spark.createDataFrame(rows), min_df=2
        ).collect()
    }
    assert pruned == {"apple", "banana"}


def test_apply_mixing_deterministic_and_drops_untargeted(spark):
    """The kept SET is layout-independent, untargeted groups vanish, and
    per-group keep rates track the computed sample_prob."""
    from mondrian_olap_spark.operators import sampling

    rows = [
        Row(doc_id=i, source=("web" if i % 4 else "other"))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    targets = {"web": 1.0}
    kept = {
        r["doc_id"]
        for r in sampling.apply_mixing(df, targets, by="source").collect()
    }
    kept_repart = {
        r["doc_id"]
        for r in sampling.apply_mixing(
            df.repartition(13), targets, by="source"
        ).collect()
    }
    assert kept == kept_repart                      # layout-independent
    assert all(i % 4 for i in kept)                 # 'other' dropped
    # sole targeted group is the scarcest → scale 1.0 → keep everything
    assert len(kept) == 300
    half = sampling.apply_mixing(
        df.filter(F.col("source") == "web"), {"web": 0.5, "none": 0.5},
        by="source",
    ).count()
    # 'none' has no rows, so scale comes from web alone (c/N/t = 2 → clamp
    # 1.0) and p_web = t·s·N/c = 0.5: web thins to its target share even
    # though the mix itself is unachievable.  166 = exact content-hash
    # keep count at p=0.5 (deterministic by construction).
    assert half == 166


def test_write_curated_partitioned_layout(spark, tmp_path):
    """write_curated materializes directory partitioning (trainer-side
    selection = partition pruning) with deterministic in-file order."""
    import os

    from mondrian_olap_spark.operators.pipeline import write_curated

    df = spark.createDataFrame([
        Row(doc_id=i, split=("train" if i % 2 else "test"), text=f"doc {i}")
        for i in range(10)
    ])
    dst = str(tmp_path / "curated")
    write_curated(df, dst)
    dirs = sorted(d for d in os.listdir(dst) if d.startswith("split="))
    assert dirs == ["split=test", "split=train"]
    back = spark.read.parquet(dst)
    assert back.count() == 10
    assert {r["split"] for r in back.select("split").distinct().collect()} == {
        "test", "train"
    }
    # partition filter prunes to one directory's rows
    assert back.filter("split = 'train'").count() == 5
    import pytest as _pt
    with _pt.raises(ValueError):
        write_curated(df, dst, partition_by=["nope"])


def test_text_operators_agree_on_tokenization(spark):
    """unigram_entropy, kl_from_corpus, and text_features must count the
    same tokens per document — tokenizer drift between operators would
    silently decorrelate the quality signals."""
    from mondrian_olap_spark.operators import text as text_ops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ue = text_ops.unigram_entropy(docs).select("id", "n_tokens")
    kl = text_ops.kl_from_corpus(docs).select(
        "id", F.col("n_tokens").alias("n2")
    )
    joined = ue.join(kl, "id")
    assert joined.filter("n_tokens <> n2").count() == 0
    assert joined.count() == docs.count()


def test_source_overlap_matrix(spark):
    """Two mirroring sources share shingles; a disjoint source pairs with
    nothing; jaccard=1 for identical shingle sets."""
    base = "alpha beta gamma delta epsilon zeta"
    rows = [
        Row(doc_id=1, source="s1", text=base),
        Row(doc_id=2, source="s2", text=base),  # s2 mirrors s1
        Row(doc_id=3, source="s3", text="one two three four five six"),
    ]
    out = {(r["source_a"], r["source_b"]): r for r in dedup.source_overlap(
        spark.createDataFrame(rows)).collect()}
    assert set(out) == {("s1", "s2")}  # s3 shares nothing
    r = out[("s1", "s2")]
    assert r["n_a"] == r["n_b"] == r["shared_shingles"] == 4  # 6 toks → 4 trigrams
    assert r["jaccard"] == 1.0


def test_bpe_pair_counts_hand_computed(spark):
    # "ab ab" pre-tokenizes to ['ab', ' ab']; pairs: 'ab' -> ab;
    # ' ab' -> ' a', 'ab'
    rows = [Row(doc_id=1, text="ab ab")]
    out = {r["pair"]: r["n_pairs"] for r in
           text.bpe_pair_counts(spark.createDataFrame(rows)).collect()}
    assert out == {"ab": 2, " a": 1}


def test_bpe_pair_counts_contraction_and_rank(spark):
    # "it's" splits into ['it', "'s"]: pairs it, 's — contractions are
    # their own pre-token (pairs never span the apostrophe boundary)
    rows = [Row(doc_id=1, text="it's it's zz")]
    out = text.bpe_pair_counts(spark.createDataFrame(rows), top_n=2).collect()
    ranked = {r["rank"]: (r["pair"], r["n_pairs"]) for r in out}
    assert len(ranked) == 2
    # count desc, pair asc: "'s" (2) sorts before "it" (2)
    assert ranked[1] == ("'s", 2) and ranked[2] == ("it", 2)


def test_token_length_histogram_buckets(spark):
    rows = [
        Row(doc_id=1, text="w"),                      # 1 token  → bucket 1
        Row(doc_id=2, text="a b c"),                  # 3 tokens → bucket 2
        Row(doc_id=3, text="a b c d"),                # 4 tokens → bucket 4
        Row(doc_id=4, text=" ".join(["t"] * 9)),      # 9 tokens → bucket 8
    ]
    out = {r["bucket_lo"]: r for r in
           text.token_length_histogram(spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 2, 4, 8}
    assert out[2]["n_docs"] == 1 and out[2]["total_tokens"] == 3
    assert out[8]["min_tokens"] == 9 and out[8]["max_tokens"] == 9


def test_top_ngrams_counts_all_occurrences(spark):
    rows = [
        Row(doc_id=1, text="x y z x y z"),   # 'x y z' twice in ONE doc
        Row(doc_id=2, text="x y z only"),
        Row(doc_id=3, text="too short"),     # < 3 tokens → contributes nothing
    ]
    out = text.top_ngrams(spark.createDataFrame(rows), n=3, top_k=10).collect()
    byg = {r["ngram"]: r for r in out}
    # occurrences counts every sliding window; n_docs is distinct
    assert byg["x y z"]["occurrences"] == 3 and byg["x y z"]["n_docs"] == 2
    assert byg["x y z"]["rank"] == 1
    assert "too short" not in byg


def test_decontamination_report_hand_computed(spark):
    corpus = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta epsilon"),
        Row(doc_id=2, text="one two three four"),
    ])
    heldout = spark.createDataFrame([
        # 3 distinct 3-grams; 'beta gamma delta' + 'gamma delta epsilon'
        # appear in corpus doc 1 → 2/3
        Row(doc_id=10, text="beta gamma delta epsilon zeta"),
        Row(doc_id=11, text="totally novel words nothing shared"),
        Row(doc_id=12, text="too short"),      # < n tokens → 0 n-grams
    ])
    out = {r["doc_id"]: r for r in
           dedup.decontamination_report(corpus, heldout, n=3).collect()}
    assert out[10]["n_grams"] == 3 and out[10]["n_hit"] == 2
    assert out[10]["hit_fraction"] == pytest.approx(0.666667)
    assert out[11]["n_hit"] == 0 and out[11]["hit_fraction"] == 0.0
    assert out[12]["n_grams"] == 0 and out[12]["hit_fraction"] is None


def test_temperature_targets_limits(spark):
    from mondrian_olap_spark.operators import sampling

    rows = ([Row(doc_id=i, source="web") for i in range(90)]
            + [Row(doc_id=100 + i, source="rare") for i in range(10)])
    df = spark.createDataFrame(rows)
    # alpha=1 keeps the natural mix
    nat = {r["source"]: r for r in
           sampling.temperature_targets(df, alpha=1.0).collect()}
    assert nat["web"]["target_frac"] == pytest.approx(0.9)
    assert nat["rare"]["target_frac"] == pytest.approx(0.1)
    # alpha=0 flattens to uniform
    uni = {r["source"]: r["target_frac"] for r in
           sampling.temperature_targets(df, alpha=0.0).collect()}
    assert uni["web"] == pytest.approx(0.5) and uni["rare"] == pytest.approx(0.5)
    # alpha=0.5 boosts the rare domain, keeps ordering
    mid = {r["source"]: r["target_frac"] for r in
           sampling.temperature_targets(df, alpha=0.5).collect()}
    assert 0.1 < mid["rare"] < 0.5 < mid["web"] < 0.9
    assert mid["rare"] + mid["web"] == pytest.approx(1.0)
    # chains into apply_mixing via a collected targets dict
    targets = {r["source"]: r["target_frac"] for r in
               sampling.temperature_targets(df, alpha=0.5).collect()}
    kept = sampling.apply_mixing(df, targets).groupBy("source").count().collect()
    assert {r["source"] for r in kept} == {"web", "rare"}


def test_corpus_diff_statuses(spark):
    from mondrian_olap_spark.operators.pipeline import corpus_diff

    old = spark.createDataFrame([
        Row(doc_id=1, text="same text"),
        Row(doc_id=2, text="Gone Soon"),
        Row(doc_id=3, text="  Mixed CASE  "),
        Row(doc_id=4, text="will change"),
        Row(doc_id=5, text=None),
    ])
    new = spark.createDataFrame([
        Row(doc_id=1, text="same text"),
        # 2 removed
        Row(doc_id=3, text="mixed case"),       # normalization → unchanged
        Row(doc_id=4, text="has changed"),
        Row(doc_id=5, text=None),               # NULL vs NULL → unchanged
        Row(doc_id=6, text="brand new"),
    ])
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "removed", 3: "unchanged",
                   4: "changed", 5: "unchanged", 6: "added"}


def test_null_text_dropped_by_quality_filter_and_curation(spark):
    """NULL text must never survive curation: every threshold comparison
    is NULL (no-opinion) on NULL text, so without the explicit rule the
    CASE chain would fall through to keep=true."""
    from mondrian_olap_spark.operators.pipeline import curate_corpus

    good = ("the quantum computer calculates enormous matrices during "
            "the evening session while patient researchers monitor "
            "the thermal sensors recording voltage readings across "
            "the silicon wafers inside sealed chambers throughout winter")
    df = spark.createDataFrame([
        Row(doc_id=1, text=good),
        Row(doc_id=2, text=None),
        Row(doc_id=3, text=None),
    ])
    qf = {r["doc_id"]: r for r in
          text.quality_filter(df).select("doc_id", "keep", "drop_reason").collect()}
    assert qf[2]["keep"] is False and qf[2]["drop_reason"] == "null_text"
    assert qf[1]["keep"] is True
    assert [r.doc_id for r in curate_corpus(df).collect()] == [1]
    # histogram: NULL counts as an empty doc in bucket 1, no NULL totals
    hist = {r["bucket_lo"]: r for r in
            text.token_length_histogram(df).collect()}
    assert hist[1]["n_docs"] == 2 and hist[1]["total_tokens"] == 2


def test_asof_join_forward_and_tolerance(spark):
    import datetime as dt

    from mondrian_olap_spark.operators import events as ev_ops

    t0 = dt.datetime(2001, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    left = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=ts(0)),
        Row(event_id=2, user_id=1, ts=ts(50)),
        Row(event_id=3, user_id=2, ts=ts(0)),     # no purchase at all
    ])
    right = spark.createDataFrame([
        Row(user_id=1, ts=ts(10), value=1.0),     # 10 min after event 1
        Row(user_id=1, ts=ts(300), value=2.0),    # 250 min after event 2
    ])
    fwd = {r["event_id"]: r for r in ev_ops.asof_join(
        left, right, key="user_id", value_cols=["value"],
        direction="forward").collect()}
    assert fwd[1]["value_right"] == 1.0           # nearest FOLLOWING row
    assert fwd[2]["value_right"] == 2.0
    assert fwd[3]["value_right"] is None
    tol = {r["event_id"]: r for r in ev_ops.asof_join(
        left, right, key="user_id", value_cols=["value"],
        direction="forward", tolerance="INTERVAL 1 HOUR").collect()}
    assert tol[1]["value_right"] == 1.0           # within the horizon
    assert tol[2]["value_right"] is None          # 250 min > 1 h → no match
    assert tol[2]["ts_right"] is None
    # backward tolerance: event 2 is 40 min after the ts(10) purchase
    back = {r["event_id"]: r for r in ev_ops.asof_join(
        left, right, key="user_id", value_cols=["value"],
        tolerance="INTERVAL 20 MINUTES").collect()}
    assert back[1]["value_right"] is None         # nearest prior is ahead
    assert back[2]["value_right"] is None         # 40 min > 20 min horizon
    with pytest.raises(ValueError):
        ev_ops.asof_join(left, right, key="user_id", direction="nearest")


def test_bpe_pair_counts_matches_python_reference(spark):
    """Differential check of the regex/pair plumbing against a plain
    Python implementation over adversarial inputs (contractions,
    unicode, whitespace runs, punctuation runs, digits)."""
    import re
    from collections import Counter

    texts = [
        "it's can't won't o'clock",
        "a  b\tc\nd",
        "héllo wörld — naïve café",
        "123abc!!!   456def???",
        "x",
        "",
        "    ",
        "don't....stop---now",
        "MixedCASE and lower and UPPER",
    ]
    want = Counter()
    for t in texts:
        for tok in re.findall(text.BPE_SPLIT_PATTERN, t):
            for i in range(len(tok) - 1):
                want[tok[i:i + 2]] += 1
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {r["pair"]: r["n_pairs"] for r in text.bpe_pair_counts(df).collect()}
    assert got == dict(want)


def test_asof_join_forward_null_left_ts_never_matches(spark):
    """Forward ordering is descending, where Spark defaults NULLS LAST —
    unguarded, a NULL-ts left row would sort after every right row and
    'match' the smallest right timestamp."""
    import datetime as dt

    from mondrian_olap_spark.operators import events as ev_ops

    t0 = dt.datetime(2001, 1, 1)
    left = spark.createDataFrame([
        Row(event_id=1, user_id=1, ts=None),
        Row(event_id=2, user_id=1, ts=t0),
    ])
    right = spark.createDataFrame([
        Row(user_id=1, ts=t0 + dt.timedelta(minutes=5), value=1.0),
    ])
    out = {r["event_id"]: r for r in ev_ops.asof_join(
        left, right, key="user_id", value_cols=["value"],
        direction="forward").collect()}
    assert out[1]["value_right"] is None and out[1]["ts_right"] is None
    assert out[2]["value_right"] == 1.0


def test_cosine_topk_vectorized_matches_expression_path(spark):
    from mondrian_olap_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [r["vec_id"] for r in emb.select("vec_id").limit(3).collect()]
    a = sim.cosine_topk(emb, qids, k=5).collect()
    b = sim.cosine_topk_vectorized(emb, qids, k=5).collect()
    pa = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in a}
    pb = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in b}
    assert set(pa) == set(pb)
    for key in pa:
        assert pa[key] == pytest.approx(pb[key], abs=1e-9)


def test_cms_sketch_properties(spark):
    """Count-min invariants on a corpus with forced collisions (width 2):
    estimates NEVER underestimate, a wide sketch with no collisions is
    exact, unseen tokens estimate 0, the sketch row count is bounded by
    depth*width, and shard sketches merge by cell-sum to the full-corpus
    sketch."""
    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(8)],
        ["doc_id", "text"],
    )
    exact = {"alpha": 8, "beta": 8, "gamma": sum(i % 3 for i in range(8))}
    queries = spark.createDataFrame([(t,) for t in exact] + [("missing",)], ["token"])

    tight = text.cms_sketch(docs, width=2, depth=2)
    assert tight.count() <= 2 * 2
    est = {
        r["token"]: r["cms_n"]
        for r in text.cms_estimate(tight, queries, width=2, depth=2).collect()
    }
    assert all(est[t] >= n for t, n in exact.items())
    assert est["missing"] >= 0  # may collide at width 2, never negative

    wide = text.cms_sketch(docs, width=4096, depth=4)
    est_w = {
        r["token"]: r["cms_n"]
        for r in text.cms_estimate(wide, queries, width=4096, depth=4).collect()
    }
    assert est_w == {**exact, "missing": 0}

    # merge = union shards + re-aggregate cells
    a, b = docs.where("doc_id < 4"), docs.where("doc_id >= 4")
    merged = (
        text.cms_sketch(a, width=2, depth=2)
        .unionByName(text.cms_sketch(b, width=2, depth=2))
        .groupBy("depth", "idx")
        .agg(F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, tight.collect())
    )


def test_apply_changes_merge_semantics(spark):
    """CDC merge invariants: untouched rows pass through, upserts replace
    or insert, deletes tombstone, the LAST change per id wins by
    sequence, seq ties resolve deterministically via the struct order,
    and an op outside {upsert, delete} fails loudly instead of acting as
    a delete."""
    from mondrian_olap_spark.operators.pipeline import apply_changes

    snap = spark.createDataFrame(
        [(1, "one", "s"), (2, "two", "s"), (3, "three", "s")],
        ["doc_id", "text", "source"],
    )
    feed = spark.createDataFrame(
        [
            (2, 1, "upsert", "two v2", "s"),     # update
            (3, 1, "delete", None, None),         # tombstone
            (4, 1, "upsert", "four", "s"),        # insert
            (4, 2, "delete", None, None),         # ...then deleted: last wins
            (5, 1, "upsert", "five a", "s"),      # seq tie: struct order
            (5, 1, "upsert", "five b", "s"),      #   picks the max payload
        ],
        ["doc_id", "change_seq", "op", "text", "source"],
    )
    out = {r["doc_id"]: (r["text"], r["source"])
           for r in apply_changes(snap, feed).collect()}
    assert out == {1: ("one", "s"), 2: ("two v2", "s"), 5: ("five b", "s")}

    bad = spark.createDataFrame(
        [(1, 1, "truncate", None, None)],
        "doc_id long, change_seq long, op string, text string, source string",
    )
    with pytest.raises(Exception, match="unknown op"):
        apply_changes(snap, bad).collect()

    with pytest.raises(ValueError, match="lacks columns"):
        apply_changes(snap, feed.drop("source"))


def test_zorder_key_and_layout_locality(spark):
    """Morton key: hand-computed interleavings match; the SQL rendering
    (zorder_sql) equals the DataFrame expression on every input; and
    zorder_repartition actually buys multi-dim locality — each output
    partition covers a compact box in BOTH dimensions, whereas a
    single-column sort leaves the other dimension unclustered."""
    from mondrian_olap_spark.operators import util

    # x=3 (bits at z-pos 0,2) and y=1 (bit at z-pos 1) interleave to 7
    one = spark.range(1).select(
        util.zorder_key(F.lit(3), F.lit(1), bits=2).alias("z")
    )
    assert one.collect()[0]["z"] == 7

    grid = spark.sql(
        "SELECT x.id AS x, y.id AS y FROM range(64) x CROSS JOIN range(64) y"
    )
    parity = grid.select(
        (
            util.zorder_key("x", "y", bits=6)
            == F.expr(util.zorder_sql(["x", "y"], bits=6))
        ).alias("ok")
    )
    assert parity.where("NOT ok").count() == 0

    def ranges(df):
        part = df.withColumn("p", F.spark_partition_id())
        rows = (
            part.groupBy("p")
            .agg(
                (F.max("x") - F.min("x")).alias("rx"),
                (F.max("y") - F.min("y")).alias("ry"),
            )
            .collect()
        )
        n = len(rows)
        return sum(r["rx"] for r in rows) / n, sum(r["ry"] for r in rows) / n

    zx, zy = ranges(util.zorder_repartition(grid, ["x", "y"], bits=6, num_partitions=16))
    lx, ly = ranges(grid.repartitionByRange(16, "x").sortWithinPartitions("x"))
    # z-order: both dims compact (16 partitions of a 64x64 grid -> ~16-wide boxes)
    assert zx < 32 and zy < 32
    # x-only sort: x is perfectly clustered but y spans the full grid
    assert lx < 8 and ly > 55

    with pytest.raises(ValueError, match="at least 2"):
        util.zorder_key("x")


def test_salted_join_equals_plain_join(spark):
    """salted_join is distribution-only: inner and left results equal the
    plain join row-for-row (including NULL keys never matching and
    unmatched left rows surviving a left join); guard rails reject
    unsupported join types and ambiguous column overlaps."""
    from mondrian_olap_spark.operators import util

    skewed = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(200)]
        + [(900, None, 0.0)],
        "id long, k string, v double",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("cold", 2), ("absent", 3)], "k string, w int"
    )

    def key(r):
        return (r["id"], r["k"], r["v"], r["w"])

    for how in ("inner", "left"):
        got = sorted(map(key, util.salted_join(skewed, dim, ["k"], how=how, buckets=4).collect()))
        want = sorted(map(key, skewed.join(dim, ["k"], how).collect()))
        assert got == want, how

    with pytest.raises(ValueError, match="inner/left"):
        util.salted_join(skewed, dim, ["k"], how="right")
    with pytest.raises(ValueError, match="ambiguous"):
        util.salted_join(skewed, dim.withColumnRenamed("w", "v"), ["k"])


def test_zorder_key_rejects_bit_overflow():
    """dims x bits beyond 63 would interleave into the sign bit —
    rejected up front instead of producing negative keys."""
    from mondrian_olap_spark.operators import util

    with pytest.raises(ValueError, match="overflows"):
        util.zorder_key("a", "b", bits=32)


def test_distributed_rank_matches_global_row_number(spark):
    """Two-phase distributed ranking equals the single-task global
    ROW_NUMBER on a frame spread over many partitions, shuffle_order is
    invariant to the input partitioning, and the rank window in the plan
    is partitioned (never a global one-task window)."""
    from pyspark.sql import Window as W

    from mondrian_olap_spark.operators import util
    from mondrian_olap_spark.operators.pipeline import shuffle_order

    df = spark.range(0, 5000).select(
        F.col("id"), (F.xxhash64("id")).alias("key")
    ).repartition(13)
    got = util.distributed_rank(df, ["key", "id"], rank_col="r")
    want = df.withColumn("r", F.row_number().over(W.orderBy("key", "id")).cast("long"))
    assert got.select("id", "r").exceptAll(want.select("id", "r")).count() == 0
    assert got.count() == 5000

    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "__pid" in line, f"global window found: {line.strip()[:120]}"

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = shuffle_order(docs.repartition(3), seed="e1")
    b = shuffle_order(docs.repartition(17), seed="e1")
    assert a.exceptAll(b).count() == 0
    c = shuffle_order(docs, seed="e2")
    moved = (
        a.alias("a")
        .join(c.alias("c"), "doc_id")
        .where("a.shuffle_rank <> c.shuffle_rank")
        .count()
    )
    assert moved > 900  # a new seed is a genuinely different permutation


def test_write_curated_zorder_clustering(spark, tmp_path):
    """write_curated(zorder_by=...) produces files whose parquet min/max
    footprint is compact in BOTH z-ordered dimensions (data-skipping
    actually possible), still honors directory partitioning, and keeps
    every row."""
    import glob

    from mondrian_olap_spark.operators.pipeline import write_curated

    docs = spark.sql(
        "SELECT id AS doc_id, id % 64 AS len_bucket, "
        "(id * 7) % 64 AS qual_bucket, "
        "CASE WHEN id % 2 = 0 THEN 'train' ELSE 'val' END AS split "
        "FROM range(4096)"
    )
    path = str(tmp_path / "zout")
    write_curated(
        docs, path, partition_by=["split"],
        zorder_by=["len_bucket", "qual_bucket"], zorder_bits=6,
        max_records_per_file=256,
    )
    back = spark.read.parquet(path)
    assert back.count() == 4096
    assert sorted(d.rsplit("=", 1)[-1] for d in glob.glob(f"{path}/split=*")) == [
        "train", "val"
    ]
    files = glob.glob(f"{path}/split=*/*.parquet")
    assert len(files) > 4
    spans = []
    for f in files:
        s = spark.read.parquet(f).agg(
            (F.max("len_bucket") - F.min("len_bucket")).alias("dl"),
            (F.max("qual_bucket") - F.min("qual_bucket")).alias("dq"),
        ).collect()[0]
        spans.append((s["dl"], s["dq"]))
    avg_l = sum(s[0] for s in spans) / len(spans)
    avg_q = sum(s[1] for s in spans) / len(spans)
    # both dims compact per file (full range is 63)
    assert avg_l < 40 and avg_q < 40, (avg_l, avg_q)


def test_padding_efficiency_accounting(spark):
    """Hand-checked padding/truncation accounting at seq_len=4: a 2-token
    doc wastes 2, a 4-token doc wastes 0, a 7-token doc loses 3; NULL
    text counts as the single-empty-token convention (bucket 1, waste 3);
    seq_len must be positive."""
    from mondrian_olap_spark.operators import packing

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, "a b c d e f g"), (4, None)],
        "doc_id long, text string",
    )
    rows = {
        r["bucket_lo"]: r
        for r in packing.padding_efficiency(docs, seq_len=4).collect()
    }
    assert rows[2]["pad_waste"] == 2 and rows[2]["trunc_loss"] == 0
    assert rows[4]["pad_waste"] == 0 and rows[4]["trunc_loss"] == 3
    assert rows[1]["n_docs"] == 1 and rows[1]["pad_waste"] == 3
    assert rows[2]["pad_ratio"] == 0.5
    with pytest.raises(ValueError, match="positive"):
        packing.padding_efficiency(docs, seq_len=0)


def test_bigram_perplexity_hand_computed(spark):
    """Add-1 bigram LM on a 3-doc corpus, checked by hand: V=5;
    'x y' has one bigram with P=(1+1)/(1+5) -> ppl exactly 3.0;
    'a b a b' mixes P(ab)=3/7 and P(ba)=1/3; a single-token doc has no
    bigrams and is absent."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y"), (3, "z")], "doc_id long, text string"
    )
    rows = {r["id"]: r for r in text.bigram_perplexity(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["ppl"] == pytest.approx(3.0, abs=1e-6)
    expect1 = math.exp(-(2 * math.log(3 / 7) + math.log(1 / 3)) / 3)
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["ppl"] == pytest.approx(expect1, abs=1e-6)


def test_zorder_key_int_columns_high_bits(spark):
    """32-bit INT input columns must interleave correctly past bit
    position 31 (shiftleft on INT wraps at 31 — the key is computed in
    LONG): an int column's top bit at 3 dims x 11 bits lands at z-bit 31+
    and must survive."""
    from mondrian_olap_spark.operators import util

    df = spark.sql(
        "SELECT CAST(2047 AS INT) AS a, CAST(2047 AS INT) AS b, "
        "CAST(2047 AS INT) AS c"
    )
    z = df.select(util.zorder_key("a", "b", "c", bits=11).alias("z")).collect()[0]["z"]
    # all 33 z-bits set: positions 31 and 32 exceed the 32-bit shift range,
    # so an INT-typed computation would wrap negative instead
    assert z == (1 << 33) - 1


def test_bloom_parameters_textbook_sizing():
    m, k = dedup.bloom_parameters(1_000_000, 0.01)
    # ~9.59 bits/item and 7 hashes at 1% (Bloom 1970), word-aligned
    assert 9_500_000 < m < 9_700_000 and k == 7
    assert m % dedup.BLOOM_WORD_BITS == 0
    with pytest.raises(ValueError):
        dedup.bloom_parameters(0)
    with pytest.raises(ValueError):
        dedup.bloom_parameters(10, 1.5)


def test_bloom_no_false_negatives_and_strategies_agree(docs):
    """Every corpus member must probe TRUE (no false negatives — the Bloom
    guarantee), and the inline-literal and broadcast-join probe strategies
    must return identical verdicts for every document."""
    m, k = 62 * 4, 3  # deliberately tiny: forces collisions
    bloom = dedup.bloom_build(docs, m_bits=m, k=k)
    self_probe = dedup.bloom_probe(docs, bloom, m, k)
    assert all(r["bloom_hit"] for r in self_probe.collect())
    inline = dedup.bloom_probe(docs, bloom, m, k).collect()
    joined = dedup.bloom_probe(docs, bloom, m, k, inline_max_bits=0).collect()
    assert sorted(map(tuple, inline)) == sorted(map(tuple, joined))


def test_bloom_build_word_bounds(docs):
    words = dedup.bloom_build(docs, m_bits=62 * 8, k=4).collect()
    assert len(words) <= 8
    for r in words:
        assert 0 <= r["word"] < 8
        assert r["bits"] > 0  # bit 62/63 never set → always positive


def test_incremental_dedup_flags(spark, docs):
    new = spark.createDataFrame([
        Row(doc_id=100, text="the quick brown fox jumps over the lazy dog"),  # dup of 1
        Row(doc_id=101, text="an entirely novel document about fresh subject matter"),
    ])
    out = {r["doc_id"]: r for r in
           dedup.incremental_dedup(new, docs, m_bits=62 * 33, k=4).collect()}
    assert out[100]["is_dup"] and out[100]["bloom_hit"]
    assert not out[101]["is_dup"]
    # is_dup ⇒ bloom_hit must hold for every row
    for r in out.values():
        assert (not r["is_dup"]) or r["bloom_hit"]
    # unverified mode takes the bitmap verdict as-is
    raw = {r["doc_id"]: r for r in
           dedup.incremental_dedup(new, docs, m_bits=62 * 33, k=4,
                                   verify=False).collect()}
    assert raw[100]["is_dup"] == raw[100]["bloom_hit"]


def test_bloom_bitmap_or_merge(spark, docs):
    """Bloom bitmaps compose under bitwise OR: the bitmap of a union equals
    the OR-merge of the parts' bitmaps (the incremental maintenance path)."""
    a = docs.filter("doc_id <= 2")
    b = docs.filter("doc_id > 2")
    m, k = 62 * 8, 4
    merged = (
        dedup.bloom_build(a, m_bits=m, k=k)
        .unionByName(dedup.bloom_build(b, m_bits=m, k=k))
        .groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
    )
    whole = dedup.bloom_build(docs, m_bits=m, k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_rejects_unaligned_m():
    with pytest.raises(ValueError):
        dedup.bloom_build(None, m_bits=1000, k=3)


def test_minhash_index_roundtrip_and_incremental_probe(spark, docs, tmp_path):
    """write_minhash_index persists band keys + params; a probe through the
    loaded index finds the same pairs as the direct (corpus-derived) path,
    and verification matches exact Jaccard."""
    path = str(tmp_path / "mh_idx")
    dedup.write_minhash_index(docs, path)
    idx, params = dedup.read_minhash_index(spark, path)
    assert params == {"n": 3, "num_hashes": 16, "bands": 8}
    new = spark.createDataFrame([
        # near-dup of doc 1 (one word appended: 7 of 8 trigrams shared)
        Row(doc_id=200, text="the quick brown fox jumps over the lazy dog tonight"),
        Row(doc_id=201, text="nothing here resembles any existing corpus document text"),
    ])
    direct = dedup.incremental_neardup_pairs(new, docs, threshold=0.8)
    via_index = dedup.incremental_neardup_pairs(
        new, docs, index=idx, threshold=0.8, **params
    )
    d, v = sorted(map(tuple, direct.collect())), sorted(map(tuple, via_index.collect()))
    assert d == v
    matched = {(r[0], r[1]) for r in d}
    assert (200, 1) in matched and (200, 4) in matched  # 4 is 1's exact dup
    assert all(nid != 201 for nid, _ in matched)


def test_minhash_index_append_matches_full_rebuild(spark, docs, tmp_path):
    """minhash_index_append: appending an accepted batch's band keys to a
    persisted index yields probe results IDENTICAL to a from-scratch
    index over corpus ∪ batch — using the artifact's own banding params,
    never re-fingerprinting the corpus."""
    path = str(tmp_path / "mh_app")
    dedup.write_minhash_index(docs, path)
    batch1 = spark.createDataFrame([
        Row(doc_id=300, text="completely new accepted batch document about rivers and stars"),
    ])
    appended = dedup.minhash_index_append(batch1, path)
    assert appended.count() > 0
    idx, params = dedup.read_minhash_index(spark, path)
    assert sorted({r["id"] for r in idx.select("id").distinct().collect()}) \
        == sorted({r["doc_id"] for r in docs.collect()} | {300})
    union_corpus = docs.select("doc_id", "text").unionByName(batch1)
    probe = spark.createDataFrame([
        # near-dup of the APPENDED doc only
        Row(doc_id=400, text="completely new accepted batch document about rivers and stars tonight"),
    ])
    via_appended = dedup.incremental_neardup_pairs(
        probe, union_corpus, index=idx, threshold=0.8, **params
    )
    scratch = dedup.incremental_neardup_pairs(
        probe, union_corpus, threshold=0.8, **params
    )
    a = sorted(map(tuple, via_appended.collect()))
    s = sorted(map(tuple, scratch.collect()))
    assert a == s
    assert {(r[0], r[1]) for r in a} == {(400, 300)}


def test_incremental_neardup_only_cross_pairs(docs):
    """The probe reports (new, corpus) pairs only — corpus-internal dups
    (docs 1 and 4 are identical) must not appear."""
    new = docs.filter("doc_id = 3").select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    pairs = dedup.incremental_neardup_pairs(new, docs, threshold=0.8).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in pairs} == {(103, 3)}
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_normalize_text_unicode_forms(spark):
    """NFC composes decomposed sequences (the dedup-critical property:
    composed and decomposed spellings fingerprint identically after
    normalization); control chars strip; whitespace collapses; NULL rides
    through; NFKC folds compatibility glyphs."""
    rows = [
        Row(doc_id=1, text="caf" + "e\u0301" + "  x"),     # decomposed
        Row(doc_id=2, text="caf\u00e9 x"),                  # composed
        Row(doc_id=3, text="a\u0007b\tc\nd"),              # controls
        Row(doc_id=4, text=None),
        Row(doc_id=5, text="\ufb01ne"),                     # fi ligature
    ]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["text"] for r in text.normalize_text(df).collect()}
    assert out[1] == out[2] == "caf\u00e9 x"
    assert out[3] == "a b c d"
    assert out[4] is None
    assert out[5] == "\ufb01ne"  # NFC keeps compatibility chars
    k = {r["doc_id"]: r["text"]
         for r in text.normalize_text(df, form="NFKC").collect()}
    assert k[5] == "fine"  # NFKC folds the ligature
    low = {r["doc_id"]: r["text"]
           for r in text.normalize_text(df, lowercase=True).collect()}
    assert low[1] == "caf\u00e9 x"
    with pytest.raises(ValueError):
        text.normalize_text(df, form="NFX")


def test_normalize_then_fingerprint_unifies_spellings(spark):
    """End-to-end motivation: exact dedup AFTER normalization collapses the
    composed/decomposed spellings of the same document into one group."""
    from mondrian_olap_spark.operators import dedup as dd
    df = spark.createDataFrame([
        Row(doc_id=1, text="Caf" + "e\u0301 au lait"),
        Row(doc_id=2, text="Caf\u00e9 au lait"),
    ])
    raw = dd.exact_dedup(df).count()
    normed = dd.exact_dedup(text.normalize_text(df)).count()
    assert raw == 2 and normed == 1


def test_profile_columns_metrics_and_single_scan(spark):
    from mondrian_olap_spark.operators.util import profile_columns
    df = spark.createDataFrame([
        Row(k=1, v="a"), Row(k=2, v="b"), Row(k=2, v=None), Row(k=None, v="a"),
    ])
    out = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 1
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_value"] == "a" and out["v"]["max_value"] == "b"
    # subset + errors
    sub = profile_columns(df, ["k"]).collect()
    assert len(sub) == 1 and sub[0]["col_name"] == "k"
    with pytest.raises(ValueError):
        profile_columns(df, ["nope"])
    with pytest.raises(ValueError):
        profile_columns(df, [])
    # the multi-distinct profile must stay ONE scan (Expand strategy)
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") <= 1


def test_daily_anomaly_hand_computed(spark):
    from datetime import datetime
    from mondrian_olap_spark.operators import events as ev_ops
    rows = []
    # key "a": 7 quiet days of 10 events, then a 100-event spike
    eid = 0
    for d in range(1, 8):
        for _ in range(10):
            rows.append(Row(event_id=eid, ts=datetime(2024, 1, d, 12), user_id=1,
                            event_type="a")); eid += 1
    for _ in range(100):
        rows.append(Row(event_id=eid, ts=datetime(2024, 1, 8, 12), user_id=1,
                        event_type="a")); eid += 1
    df = spark.createDataFrame(rows)
    out = {str(r["day"]): r for r in ev_ops.daily_anomaly(df).collect()}
    spike = out["2024-01-08"]
    # baseline: seven 10s -> mean 10, var 0 is wrong: var of identical
    # counts IS 0 -> z undefined -> NULL, not an anomaly flag
    assert spike["baseline_days"] == 7 and spike["baseline_mean"] == 10.0
    assert spike["z_score"] is None and not spike["is_anomaly"]
    # make the baseline non-degenerate: vary one quiet day
    rows.append(Row(event_id=eid, ts=datetime(2024, 1, 2, 13), user_id=1,
                    event_type="a"))
    out2 = {str(r["day"]): r for r in
            ev_ops.daily_anomaly(spark.createDataFrame(rows)).collect()}
    spike2 = out2["2024-01-08"]
    # baseline 10,11,10,10,10,10,10: mean=71/7, var=(Σx²−(Σx)²/n)/(n−1)
    import math
    mean = 71 / 7
    var = (721 - 71 * 71 / 7) / 6
    z = (100 - mean) / math.sqrt(var)
    assert spike2["z_score"] == round(z, 6) and spike2["is_anomaly"]
    # first day has no baseline at all
    first = out2["2024-01-01"]
    assert first["baseline_days"] == 0 and first["z_score"] is None


def test_user_sequences_order_truncation_nulls(spark):
    from datetime import datetime
    from mondrian_olap_spark.operators import events as ev_ops
    rows = [
        Row(event_id=3, ts=datetime(2024, 1, 1, 10, 0, 2), user_id=1, event_type="c"),
        Row(event_id=1, ts=datetime(2024, 1, 1, 10, 0, 0), user_id=1, event_type="a"),
        # same timestamp as event 1: event_id breaks the tie
        Row(event_id=2, ts=datetime(2024, 1, 1, 10, 0, 0), user_id=1, event_type="b"),
        Row(event_id=4, ts=None, user_id=1, event_type="x"),  # dropped
        Row(event_id=5, ts=datetime(2024, 1, 1), user_id=2, event_type="z"),
    ]
    df = spark.createDataFrame(rows)
    out = {r["user_id"]: r for r in ev_ops.user_sequences(df).collect()}
    assert out[1]["seq"] == "a->b->c" and out[1]["n_events"] == 3
    assert out[2]["seq"] == "z"
    # truncation: max_len bounds the token string, not the count
    t = {r["user_id"]: r for r in
         ev_ops.user_sequences(df, max_len=2).collect()}
    assert t[1]["seq"] == "a->b" and t[1]["n_events"] == 3


def test_rank_buckets_deciles_and_determinism(spark):
    from mondrian_olap_spark.operators.util import rank_buckets
    df = spark.range(100).withColumnRenamed("id", "k")
    out = rank_buckets(df, ["k"], n_buckets=10)
    got = {r["k"]: r["bucket"] for r in out.collect()}
    assert all(got[i] == i // 10 for i in range(100))
    # uneven split: sizes differ by at most one
    out7 = rank_buckets(df, ["k"], n_buckets=7)
    sizes = sorted(
        r["c"] for r in out7.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    )
    assert len(sizes) == 7 and sizes[-1] - sizes[0] <= 1
    with pytest.raises(ValueError):
        rank_buckets(df, ["k"], n_buckets=0)
    # no single-task global window in the plan (the NTILE scale cliff)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re as _re
    bad = [l for l in plan.splitlines()
           if "Window" in l and "row_number" in l and "__pid" not in l]
    assert not bad


def test_cdc_chunks_shift_resistance(spark):
    """The CDC property: inserting a prefix shifts positions but not
    boundary content — chunk hashes after the first re-synchronized
    boundary are identical, where fixed-size chunking would lose all
    alignment."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu")
    df = spark.createDataFrame([
        Row(doc_id=1, text=base),
        Row(doc_id=2, text="inserted prefix words here " + base),
    ])
    out = text.cdc_chunks(df, k=3, divisor=4)
    h1 = {r["chunk_hash"] for r in out.filter("doc_id = 1").collect()}
    h2 = {r["chunk_hash"] for r in out.filter("doc_id = 2").collect()}
    shared = h1 & h2
    # all but the first (prefix-contaminated) chunk re-synchronize
    assert len(shared) >= len(h1) - 1 >= 1
    # every token lands in exactly one chunk
    n_toks = sum(r["n_tokens"] for r in out.filter("doc_id = 1").collect())
    assert n_toks == len(base.split())
    with pytest.raises(ValueError):
        text.cdc_chunks(df, k=0)


def test_script_profile_classification(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="hello world"),
        Row(doc_id=2, text="Привет мир"),   # Russian
        Row(doc_id=3, text="你好世界"),                                   # CJK
        Row(doc_id=4, text="123 456"),
        Row(doc_id=5, text="...!!!"),
        Row(doc_id=6, text="café résumé"),                                 # accented Latin
    ])
    out = {r["doc_id"]: r for r in text.script_profile(df).collect()}
    assert out[1]["dominant_script"] == "latin" and out[1]["latin_ratio"] == 1.0
    assert out[2]["dominant_script"] == "cyrillic" and out[2]["cyrillic_ratio"] == 1.0
    assert out[3]["dominant_script"] == "cjk"
    assert out[4]["dominant_script"] == "digit" and out[4]["digit_ratio"] == 1.0
    assert out[5]["dominant_script"] == "other"
    assert out[6]["latin_ratio"] == 1.0  # accents are Latin-script
    assert out[2]["n_chars_sig"] == 9


def test_output_summary_and_compact_files(spark, tmp_path):
    from mondrian_olap_spark.operators.pipeline import compact_files, output_summary
    src = str(tmp_path / "fragmented")
    df = spark.range(10_000).withColumn("v", F.md5(F.col("id").cast("string")))
    df.repartition(40).write.parquet(src)
    before = output_summary(spark, src)
    assert before["n_files"] == 40 and before["n_rows"] == 10_000
    report = compact_files(spark, src, target_file_bytes=1 << 30)
    assert report["before_files"] == 40 and report["after_files"] == 1
    assert report["after_n_rows"] == 10_000
    # content preserved exactly: fingerprint multiset identical
    a = spark.read.parquet(src).select("id", "v")
    b = spark.read.parquet(report["out_path"]).select("id", "v")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # re-clustering restores order within the compacted output
    report2 = compact_files(
        spark, src, out_path=str(tmp_path / "ordered"),
        target_file_bytes=1 << 30, order_by=["id"],
    )
    ordered = spark.read.parquet(report2["out_path"]).collect()
    ids = [r["id"] for r in ordered]
    assert ids == sorted(ids)
    with pytest.raises(ValueError):
        compact_files(spark, str(tmp_path / "empty_dir"))


def test_bloom_probe_composes_with_streaming(spark, tmp_path):
    """The inline bloom probe is a pure projection, so it drops into a
    streaming pipeline unchanged: a rate-less file stream of new docs is
    probed against a static corpus bitmap batch-by-batch."""
    corpus = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="completely different corpus document content here"),
    ])
    m, k = 62 * 8, 4
    bloom = dedup.bloom_build(corpus, m_bits=m, k=k)
    staging = str(tmp_path / "stream_in")
    spark.createDataFrame([
        Row(doc_id=10, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=11, text="an entirely new never seen document body"),
    ]).write.json(staging)
    stream = spark.readStream.schema("doc_id long, text string").json(staging)
    probed = dedup.bloom_probe(stream, bloom, m, k)
    out = str(tmp_path / "stream_out")
    q = (probed.writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["bloom_hit"] for r in spark.read.parquet(out).collect()}
    assert got[10] is True and got[11] is False


def test_stateful_ingest_composes_with_streaming(spark, tmp_path):
    """ingest_batch drops into Structured Streaming unchanged: a file
    stream of arriving batches drained through foreachBatch(ingest_batch)
    accepts EXACTLY the documents sequential batch ingestion accepts —
    including rejecting a later micro-batch's duplicate of an earlier
    micro-batch's acceptance (state carried through the artifacts, not
    through streaming state)."""
    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=good + "original alpha")]
    )
    state = str(tmp_path / "state")
    init_ingest_state(corpus, state)
    staging = str(tmp_path / "in")
    # two files -> (with maxFilesPerTrigger=1) two ordered micro-batches
    spark.createDataFrame([
        Row(doc_id=11, text=good + "original alpha"),   # corpus dup
        Row(doc_id=12, text=good + "fresh gamma"),      # accept in batch 1
    ]).coalesce(1).write.json(staging)
    spark.createDataFrame([
        Row(doc_id=21, text=good + "fresh gamma"),      # dup of batch-1 accept
        Row(doc_id=22, text=good + "fresh delta"),      # accept in batch 2
    ]).coalesce(1).write.mode("append").json(staging)
    accepted_ids = []

    def drain(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        out = ingest_batch(batch_df, state)
        accepted_ids.extend(r["doc_id"] for r in out.collect())

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(staging))
    q = (stream.writeStream.foreachBatch(drain)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert sorted(accepted_ids) == [12, 22]
    store = spark.read.parquet(f"{state}/fingerprints")
    assert store.count() == store.distinct().count() == 3


def test_hll_sketch_mergeability_and_persistence(spark, tmp_path):
    """The mergeable-rollup property: unioning per-part sketches lands on
    the SAME registers as sketching the whole — estimates are exactly
    equal, not merely close.  Sketches survive a parquet round-trip (the
    persisted aggregate-table artifact)."""
    from mondrian_olap_spark.operators import sketches as sk
    df = spark.range(20_000).withColumn("part", F.col("id") % 4)
    parts = sk.distinct_sketches(df, ["part"], "id")
    merged_est = sk.merge_sketches(parts, []).select(
        sk.estimate().alias("e")).collect()[0]["e"]
    whole_est = sk.distinct_sketches(
        df.withColumn("g", F.lit(1)), ["g"], "id"
    ).select(sk.estimate().alias("e")).collect()[0]["e"]
    assert merged_est == whole_est
    # persistence: binary sketch column round-trips through parquet
    path = str(tmp_path / "sketches")
    parts.write.parquet(path)
    reread = spark.read.parquet(path)
    est2 = sk.merge_sketches(reread, []).select(
        sk.estimate().alias("e")).collect()[0]["e"]
    assert est2 == merged_est
    # error bound holds at a cardinality well past sparse mode
    err = abs(whole_est - 20_000) / 20_000
    assert err <= 3 * sk.rse(12)


def test_hll_distinct_rollup_total_row(spark):
    from mondrian_olap_spark.operators import sketches as sk
    df = spark.createDataFrame(
        [Row(g="a", v=i) for i in range(50)]
        + [Row(g="b", v=i) for i in range(25, 75)]
    )
    out = sk.distinct_rollup(df, ["g"], "v")
    rows = {r["g"]: r["estimate"] for r in out.collect()}
    # tiny cardinalities stay in sparse mode: estimates are exact
    assert rows["a"] == 50 and rows["b"] == 50
    assert rows[None] == 75  # union dedups the 25-element overlap


def test_remove_repeated_segments(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="alpha one. beta two. alpha one. gamma three. beta two"),
        Row(doc_id=2, text="no repeats here"),
        Row(doc_id=3, text=None),
    ])
    out = {r["doc_id"]: r for r in text.remove_repeated_segments(df).collect()}
    assert out[1]["text"] == "alpha one. beta two. gamma three"
    assert out[1]["n_segments_in"] == 5 and out[1]["n_segments_out"] == 3
    assert out[2]["text"] == "no repeats here" and out[2]["n_segments_out"] == 1
    assert out[3]["text"] is None
    # custom separator + new output column leaves the original intact
    df2 = spark.createDataFrame([Row(doc_id=1, text="a|b|a|c")])
    r = text.remove_repeated_segments(df2, sep="|", output="clean").collect()[0]
    assert r["clean"] == "a|b|c" and r["text"] == "a|b|a|c"
    # the plan is expression-only: no shuffle, no explode-generate
    plan = (text.remove_repeated_segments(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Generate" not in plan


def test_explain_report_structure_and_warnings(spark):
    from mondrian_olap_spark.operators.util import explain_report
    from .conftest import SF_DIR
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    df = (li.filter("l_quantity > 10")
          .join(part, li.l_partkey == part.p_partkey)
          .groupBy("p_brand").agg(F.sum("l_quantity").alias("q")))
    rep = explain_report(df)
    assert rep["joins"] == ["BroadcastHashJoin"]
    assert rep["exchanges"] == 1 and "hashpartitioning(p_brand)" in rep["exchange_keys"]
    assert any(f for s in rep["scans"] for f in s["pushed_filters"]
               if "l_quantity" in f)
    # column pruning visible: the lineitem scan reads few columns
    assert min(s["read_columns"] for s in rep["scans"]) <= 3
    # AQE hides codegen spans until the plan finalizes: None then, or >=1
    # after execution
    assert rep["codegen_stages"] is None or rep["codegen_stages"] >= 1
    df.collect()
    rep_final = explain_report(df)
    assert rep_final["codegen_stages"] >= 1
    assert rep["warnings"] == []
    # red flags surface
    cart = li.limit(2).crossJoin(part.limit(2))
    assert "cartesian/nested-loop join in plan" in explain_report(cart)["warnings"]
    from pyspark.sql.functions import udf
    slow = li.limit(2).select(udf(lambda x: x)("l_returnflag"))
    assert any("row-at-a-time" in w for w in explain_report(slow)["warnings"])


def test_curate_increment_semantics(spark):
    """Incremental curation: batch-internal dups collapse to one survivor,
    exact corpus duplicates are rejected (bloom prefilter + exact verify),
    quality failures drop, and fresh quality docs are accepted with
    splits assigned."""
    from mondrian_olap_spark.operators.pipeline import curate_increment

    prose = ("the substantial meaningful documentation of elaborate "
             "procedures and numerous detailed sections carefully "
             "explaining every nuance within the comprehensive reference "
             "material across multiple elaborate chapters")
    corpus = spark.createDataFrame([
        Row(doc_id=1, text=prose + " corpus original first"),
        Row(doc_id=2, text=prose + " corpus original second"),
    ])
    new = spark.createDataFrame([
        Row(doc_id=10, text=prose + " corpus original first"),   # corpus dup
        Row(doc_id=11, text=prose + " genuinely fresh addition"),
        Row(doc_id=12, text=prose + " genuinely fresh addition"),  # batch dup of 11
        Row(doc_id=13, text="too short"),                          # quality fail
    ])
    out = curate_increment(new, corpus, split_weights={"train": 1.0},
                           m_bits=62 * 8, k=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {11}
    assert rows[11]["dup_count"] == 2      # absorbed the batch twin
    assert rows[11]["split"] == "train"
    assert "bloom_hit" in out.columns      # fp accounting observable


def test_curate_increment_fingerprint_col_forwarded(spark):
    """curate_increment must key the CORPUS membership check on the
    caller's fingerprint_col, not silently recompute md5(lower(trim)):
    a new doc whose precomputed fingerprint collides with a corpus row is
    a duplicate even though its raw text differs."""
    from mondrian_olap_spark.operators.pipeline import curate_increment

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame([
        Row(doc_id=1, text=good + "alpha", fp="shared-key"),
    ])
    new = spark.createDataFrame([
        # different text, SAME precomputed fingerprint -> corpus dup
        Row(doc_id=11, text=good + "beta", fp="shared-key"),
        # fresh fingerprint -> accepted
        Row(doc_id=12, text=good + "gamma", fp="fresh-key"),
    ])
    out = curate_increment(new, corpus, fingerprint_col="fp",
                           m_bits=62 * 8, k=4)
    assert {r["doc_id"] for r in out.collect()} == {12}


def test_stateful_ingest_batches_carry_membership(spark, tmp_path):
    """init_ingest_state + ingest_batch: batch 2's duplicate of a batch-1
    ACCEPTANCE is rejected — membership state (bloom + fingerprint store)
    carries across batches without ever rescanning the corpus — while
    corpus dups, batch-internal dups and quality failures reject as in
    curate_increment; fresh quality docs land with splits."""
    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame([
        Row(doc_id=1, text=good + "original alpha"),
        Row(doc_id=2, text=good + "original beta"),
    ])
    state = str(tmp_path / "state")
    info = init_ingest_state(corpus, state)
    assert info["n_items"] == 2 and info["m_bits"] % 62 == 0

    b1 = spark.createDataFrame([
        Row(doc_id=11, text=good + "original alpha"),   # corpus dup
        Row(doc_id=12, text=good + "fresh gamma"),      # accept
        Row(doc_id=13, text=good + "fresh gamma"),      # batch dup of 12
        Row(doc_id=14, text="too short"),               # quality fail
    ])
    a1, rej1 = ingest_batch(b1, state, split_weights={"train": 1.0},
                            with_rejects=True)
    rows1 = {r["doc_id"]: r for r in a1.collect()}
    assert set(rows1) == {12}
    assert {(r["doc_id"], r["reject_reason"]) for r in rej1.collect()} == {
        (11, "corpus_exact_dup"),
        (13, "batch_dup_or_quality"),
        (14, "batch_dup_or_quality"),
    }
    assert rows1[12]["dup_count"] == 2 and rows1[12]["split"] == "train"

    b2 = spark.createDataFrame([
        Row(doc_id=21, text=good + "fresh gamma"),      # dup of batch-1 ACCEPT
        Row(doc_id=22, text=good + "original beta"),    # corpus dup
        Row(doc_id=23, text=good + "fresh delta"),      # accept
    ])
    a2 = ingest_batch(b2, state)
    assert {r["doc_id"] for r in a2.collect()} == {23}
    # the store now holds all four distinct fingerprints exactly once
    store = spark.read.parquet(f"{state}/fingerprints")
    assert store.count() == store.distinct().count() == 4


def test_stateful_ingest_fingerprint_col_keys_the_state(spark, tmp_path):
    """A state initialized with fingerprint_col must be PROBED with it:
    a batch doc whose precomputed fingerprint collides with a corpus
    member is a duplicate even though its raw text differs (and without
    forwarding, every duplicate would silently pass)."""
    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=good + "alpha", fp="shared-key")]
    )
    state = str(tmp_path / "state")
    init_ingest_state(corpus, state, fingerprint_col="fp")
    batch = spark.createDataFrame([
        # different text, SAME precomputed fingerprint -> duplicate
        Row(doc_id=11, text=good + "beta", fp="shared-key"),
        Row(doc_id=12, text=good + "gamma", fp="fresh-key"),
    ])
    a = ingest_batch(batch, state, fingerprint_col="fp")
    assert {r["doc_id"] for r in a.collect()} == {12}
    # the accepted fingerprint entered the store under the fp keying
    store = spark.read.parquet(f"{state}/fingerprints")
    assert {r["fingerprint"] for r in store.collect()} == {
        "shared-key", "fresh-key",
    }


def test_ingest_collapse_flag_requires_threshold(spark, tmp_path):
    """collapse_batch_near_dups without near_dup_threshold must raise —
    silently ignoring it would admit every within-batch near-dup family
    the caller believes was collapsed."""
    import pytest

    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame([Row(doc_id=1, text=good + "alpha")])
    state = str(tmp_path / "state")
    init_ingest_state(corpus, state)
    batch = spark.createDataFrame([Row(doc_id=11, text=good + "beta")])
    with pytest.raises(ValueError, match="requires near_dup_threshold"):
        ingest_batch(batch, state, collapse_batch_near_dups=True)


def test_ingest_state_info_tracks_fill_and_fp_drift(spark, tmp_path):
    """ingest_state_info: fill ratio and estimated fp rate GROW as batches
    fold in (the silent Bloom-degradation hazard made observable); the
    fill-based fp estimate tracks the theoretical value for a known
    member count; near-dup state surfaces its params and signature count."""
    import math

    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, ingest_state_info, init_ingest_state,
    )

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=good + f"variant {i}") for i in range(5)]
    )
    state = str(tmp_path / "state")
    init_ingest_state(corpus, state, near_dup=True)
    info0 = ingest_state_info(spark, state)
    assert info0["n_fingerprints"] == 5
    assert info0["n_signatures"] == 5
    assert info0["near_dup_params"] == {"n": 3, "num_hashes": 16, "bands": 8}
    assert 0 < info0["fill_ratio"] < 1
    # theoretical fill for n members, k hashes, m bits: 1-(1-1/m)^(kn)
    m, k, n = info0["m_bits"], info0["k"], 5
    theo = 1.0 - (1.0 - 1.0 / m) ** (k * n)
    assert math.isclose(info0["fill_ratio"], theo, rel_tol=0.5)
    assert not info0["resize_recommended"]  # sized for this corpus at 1%
    # fold in a large batch -> fill and est fp strictly grow
    batch = spark.createDataFrame(
        [Row(doc_id=100 + i, text=good + f"novel addition {i}")
         for i in range(50)]
    )
    ingest_batch(batch, state, near_dup_threshold=0.8)
    info1 = ingest_state_info(spark, state)
    assert info1["n_fingerprints"] > info0["n_fingerprints"]
    assert info1["fill_ratio"] > info0["fill_ratio"]
    assert info1["est_fp_rate"] > info0["est_fp_rate"]
    # a bitmap sized for 5 now holding ~55 is past the resize line
    assert info1["resize_recommended"]
    # resize rebuilds from the STORE alone; drift returns to design point
    # and membership semantics are unchanged (a known member still dups)
    from mondrian_olap_spark.operators.pipeline import resize_ingest_state

    geo = resize_ingest_state(spark, state)
    assert geo["n_items"] == info1["n_fingerprints"]
    info2 = ingest_state_info(spark, state)
    assert info2["est_fp_rate"] < 0.05
    assert not info2["resize_recommended"]
    redo = spark.createDataFrame(
        [Row(doc_id=999, text=good + "novel addition 7"),   # known member
         Row(doc_id=998, text="entirely unrelated writing about mountain "
                              "weather patterns where the afternoon storms "
                              "gather slowly over the ridgeline before any "
                              "hiker can reach shelter below the treeline")]
    )
    a = ingest_batch(redo, state, near_dup_threshold=0.8)
    assert {r["doc_id"] for r in a.collect()} == {998}


def test_stateful_ingest_near_dup_arm(spark, tmp_path):
    """ingest_batch(near_dup_threshold=…): exact-dup survivors that are
    NEAR-duplicates of the corpus — or of an EARLIER batch's acceptance —
    reject via the persisted band-key index + signature-estimated Jaccard
    (corpus text never read); genuinely novel docs still land, and the
    index/signature state grows only by acceptances."""
    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    base = ("the quick brown fox jumps over the lazy dog while several "
            "other animals watch quietly from undergrowth nearby today")
    other = ("entirely different content about distributed query engines "
             "that are processing analytical workloads across many cluster "
             "nodes while the scheduler keeps every machine busy with work")
    corpus = spark.createDataFrame([Row(doc_id=1, text=base)])
    state = str(tmp_path / "state")
    init_ingest_state(corpus, state, near_dup=True)

    b1 = spark.createDataFrame([
        # near-dup of the corpus doc (one appended word)
        Row(doc_id=11, text=base + " tonight"),
        # novel -> accept
        Row(doc_id=12, text=other),
    ])
    a1, rej1 = ingest_batch(b1, state, near_dup_threshold=0.8,
                            with_rejects=True)
    assert {r["doc_id"] for r in a1.collect()} == {12}
    assert {(r["doc_id"], r["reject_reason"]) for r in rej1.collect()} == {
        (11, "corpus_near_dup"),
    }

    b2 = spark.createDataFrame([
        # near-dup of batch-1's ACCEPTANCE -> reject purely via carried state
        Row(doc_id=21, text=other + " tonight"),
        # novel -> accept
        Row(doc_id=22, text="a third completely unrelated document about "
                            "gardening techniques for arid mountain climates "
                            "where the careful watering schedule matters more "
                            "than any fertilizer choice a grower could make"),
    ])
    a2 = ingest_batch(b2, state, near_dup_threshold=0.8)
    assert {r["doc_id"] for r in a2.collect()} == {22}
    # signatures state holds corpus + the two acceptances, once each
    sigs = spark.read.parquet(f"{state}/signatures")
    assert sorted(r["id"] for r in sigs.select("id").collect()) == [1, 12, 22]

    # batch-INTERNAL near-dup collapse: two near-identical novel docs in
    # one batch -> min-id survivor accepted, twin rejected with its own
    # reason; without the flag both land
    b3 = spark.createDataFrame([
        Row(doc_id=31, text=other + " morning edition"),
        Row(doc_id=32, text=other + " morning edition extra"),
    ])
    a3, rej3 = ingest_batch(b3, state, near_dup_threshold=0.8,
                            collapse_batch_near_dups=True, with_rejects=True)
    # both are near-dups of batch-1's acceptance (doc 12 = `other`): the
    # collapse keeps 31, and the corpus check then rejects it — reasons
    # distinguish the two paths
    assert a3.count() == 0
    assert {(r["doc_id"], r["reject_reason"]) for r in rej3.collect()} == {
        (31, "corpus_near_dup"), (32, "batch_near_dup"),
    }
    fresh = ("completely standalone narrative describing ancient harbor "
             "towns where fishing boats returned each evening before the "
             "lighthouse keeper lit the great lamp above the cliffs")
    b4 = spark.createDataFrame([
        Row(doc_id=41, text=fresh + " first printing"),
        Row(doc_id=42, text=fresh + " first printing revised"),
    ])
    a4, rej4 = ingest_batch(b4, state, near_dup_threshold=0.8,
                            collapse_batch_near_dups=True, with_rejects=True)
    assert {r["doc_id"] for r in a4.collect()} == {41}
    assert {(r["doc_id"], r["reject_reason"]) for r in rej4.collect()} == {
        (42, "batch_near_dup"),
    }


def test_build_vocab_and_tokens_to_ids(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b a c"), Row(doc_id=2, text="b b d"),
    ])
    v = text.build_vocab(docs, vocab_size=3)
    got = {r["token"]: r["token_id"] for r in v.collect()}
    # frequency rank with token tiebreak, specials first
    assert got == {"<unk>": 0, "b": 1, "a": 2, "c": 3}
    inline = text.tokens_to_ids(docs, v).orderBy("doc_id").collect()
    joined = text.tokens_to_ids(docs, v, broadcast_threshold=0).orderBy(
        "doc_id").collect()
    assert [list(r["token_ids"]) for r in inline] == [[2, 1, 2, 3], [1, 1, 0]]
    # both physical strategies produce identical arrays
    assert [list(r["token_ids"]) for r in joined] ==         [list(r["token_ids"]) for r in inline]
    # the inline path is a pure projection
    plan = (text.tokens_to_ids(docs, v)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan


def test_build_vocab_reserved_token_in_corpus(spark):
    """A literal reserved token in the corpus must NOT earn a second
    ranked vocab row — the special owns its id unconditionally."""
    docs = spark.createDataFrame([
        Row(doc_id=1, text="<unk> <unk> <unk> a b"),
        Row(doc_id=2, text="a <unk>"),
    ])
    v = text.build_vocab(docs, vocab_size=5)
    rows = v.collect()
    toks = [r["token"] for r in rows]
    assert toks.count("<unk>") == 1
    got = {r["token"]: r["token_id"] for r in rows}
    assert got == {"<unk>": 0, "a": 1, "b": 2}
    # encode: corpus '<unk>' literals map to the special's id, stably
    out = text.tokens_to_ids(docs, v).orderBy("doc_id").collect()
    assert [list(r["token_ids"]) for r in out] == [[0, 0, 0, 1, 2], [1, 0]]


def test_tokens_to_ids_duplicate_vocab_rows(spark):
    """A hand-built vocab with duplicate tokens must not crash the inline
    map literal; the smallest id wins deterministically on both paths."""
    docs = spark.createDataFrame([Row(doc_id=1, text="x y z")])
    dup = spark.createDataFrame(
        [("x", 1), ("x", 7), ("y", 2)],
        "token string, token_id bigint",
    )
    inline = text.tokens_to_ids(docs, dup).collect()
    assert list(inline[0]["token_ids"]) == [1, 2, 0]
    # the broadcast-join path applies the SAME smallest-id dedup — array
    # length must not grow from double matches
    joined = text.tokens_to_ids(docs, dup, broadcast_threshold=0).collect()
    assert list(joined[0]["token_ids"]) == [1, 2, 0]


def test_tokens_to_ids_plan_size_constant_in_vocab(spark):
    """The inline MAP literal is built from TWO array literals
    (map_from_arrays), so Catalyst plan size is O(1) in vocabulary size:
    a 50k-entry vocab must analyze fast and produce a plan string no
    larger than a 10-entry vocab's (plus the literal payload itself held
    in two nodes).  Guards against the per-entry create_map regression
    (2N lit nodes -> driver-side analysis/codegen bomb at BPE scale)."""
    import time

    docs = spark.createDataFrame([Row(doc_id=1, text="tok00001 zz")])
    big = spark.createDataFrame(
        [(f"tok{i:05d}", i + 1) for i in range(50_000)],
        "token string, token_id bigint",
    )
    t0 = time.time()
    out = text.tokens_to_ids(docs, big)
    qe = out._jdf.queryExecution()
    n_nodes = qe.analyzed().numberedTreeString().count("\n") + 1
    opt = qe.optimizedPlan().toString()
    elapsed = time.time() - t0
    # two packed-string literals -> a handful of plan nodes at any size
    assert n_nodes < 50, n_nodes
    # the packed-string unpack constant-folds into a map literal: no
    # per-row map_from_arrays/unpack survives optimization (the one
    # split left in the plan is the text tokenizer's)
    assert "map_from_arrays" not in opt
    assert elapsed < 20, f"build+optimize took {elapsed:.1f}s at 50k vocab"
    assert list(out.collect()[0]["token_ids"]) == [2, 0]


def test_bloom_artifact_roundtrip_and_append(spark, tmp_path):
    """write_bloom/read_bloom/bloom_append: the persisted artifact carries
    its sizing params; appending a batch OR-merges bit-identically to one
    build over the union; probes over the merged artifact find every
    member of both generations with zero false negatives."""
    m, k = 62 * 8, 4
    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"base corpus document number {i}") for i in range(10)]
    )
    batch = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"appended batch document number {i}") for i in range(5)]
    )
    path = str(tmp_path / "bloom")
    dedup.write_bloom(dedup.bloom_build(base, m_bits=m, k=k), path, m, k)
    merged = dedup.bloom_append(batch, path)
    bitmap, m2, k2 = dedup.read_bloom(spark, path)
    assert (m2, k2) == (m, k)
    # bit-identical to a one-shot build over the union
    union_bm = dedup.bloom_build(base.unionByName(batch), m_bits=m, k=k)
    assert sorted(map(tuple, bitmap.collect())) == \
        sorted(map(tuple, union_bm.collect()))
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, union_bm.collect()))
    # no false negatives across both generations
    probed = dedup.bloom_probe(
        base.unionByName(batch), bitmap, m_bits=m2, k=k2
    )
    assert probed.filter("NOT bloom_hit").count() == 0
    # bloom_merge is variadic and bitmap-sized
    a = dedup.bloom_build(base, m_bits=m, k=k)
    b = dedup.bloom_build(batch, m_bits=m, k=k)
    assert sorted(map(tuple, dedup.bloom_merge(a, b).collect())) == \
        sorted(map(tuple, union_bm.collect()))
    import pytest
    with pytest.raises(ValueError):
        dedup.bloom_merge()


def test_streaming_bloom_bitmap_maintenance(spark, tmp_path):
    """Incremental bitmap maintenance under Structured Streaming:
    foreachBatch OR-merges each micro-batch's bitmap into a running store;
    after the stream drains, the merged bitmap is IDENTICAL to the batch
    bitmap of the full corpus (Bloom bitmaps compose under bitwise OR)."""
    m, k = 62 * 8, 4
    all_docs = [
        Row(doc_id=i, text=f"streaming corpus document number {i} body")
        for i in range(20)
    ]
    staging = str(tmp_path / "in")
    spark.createDataFrame(all_docs[:10]).write.json(staging)
    spark.createDataFrame(all_docs[10:]).write.mode("append").json(staging)
    store = str(tmp_path / "bloom_store")

    def merge(batch_df, batch_id):
        import os
        bm = dedup.bloom_build(batch_df, m_bits=m, k=k)
        if os.path.exists(store):
            prev = batch_df.sparkSession.read.parquet(store)
            bm = (prev.unionByName(bm).groupBy("word")
                  .agg(F.expr("bit_or(bits)").alias("bits")))
        bm.write.mode("overwrite").parquet(store + ".next")
        merged = batch_df.sparkSession.read.parquet(store + ".next")
        merged.write.mode("overwrite").parquet(store)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).json(staging))
    q = (stream.writeStream.foreachBatch(merge)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = {(r["word"], r["bits"])
                for r in spark.read.parquet(store).collect()}
    whole = {(r["word"], r["bits"]) for r in
             dedup.bloom_build(spark.createDataFrame(all_docs),
                               m_bits=m, k=k).collect()}
    assert streamed == whole


def test_pq_encode_and_train(spark):
    """Product quantization: seed vectors encode to themselves with zero
    error; codes are within [0, k); Lloyd training strictly reduces mean
    reconstruction error on real data; dims must divide into subspaces."""
    from mondrian_olap_spark.operators import similarity as sim
    from .conftest import SF_DIR
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, sub = sim.pq_seeds(emb, m=4, k=8)
    assert len(cb) == 4 and len(cb[0]) == 8 and sub == 16
    enc = sim.pq_encode(emb, cb, sub).cache()
    seeds = {r["vec_id"] for r in emb.orderBy("vec_id").limit(8).collect()}
    for r in enc.collect():
        assert all(0 <= c < 8 for c in r["codes"])
        if r["vec_id"] in seeds:
            assert abs(r["sq_error"]) < 1e-9
    seed_err = enc.agg(F.avg("sq_error")).collect()[0][0]
    cbt, _ = sim.pq_train(emb, m=4, k=8, iterations=2)
    tr_err = (sim.pq_encode(emb, cbt, sub)
              .agg(F.avg("sq_error")).collect()[0][0])
    assert tr_err < seed_err
    # encode is a single scan-parallel map stage (no shuffle, no join)
    plan = (sim.pq_encode(emb, cb, sub)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan and "Join" not in plan
    assert "MapInPandas" in plan
    with pytest.raises(ValueError, match="not divisible"):
        sim.pq_seeds(emb, m=7, k=4)


def test_pq_topk_adc(spark):
    """ADC top-k over PQ codes: n ascending-score rows per query, no
    self-matches, identical results from on-the-fly and pre-encoded code
    frames, and sane recall (a vector's nearest ADC neighbor shares its
    cell structure on clusterable data)."""
    from mondrian_olap_spark.operators import similarity as sim
    from .conftest import SF_DIR
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb, sub = sim.pq_seeds(emb, m=4, k=8)
    out = sim.pq_topk(emb, [0, 100], cb, sub, n=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) == 5
        assert all(r["neighbor_id"] != qid for r in rows)
        scores = [r["approx_sq_dist"] for r in rows]
        assert scores == sorted(scores)
    codes = sim.pq_encode(emb, cb, sub, with_error=False)
    pre = sim.pq_topk(emb, [0, 100], cb, sub, n=5, codes=codes).collect()
    assert sorted(map(tuple, pre)) == sorted(map(tuple, out))


def test_mojibake_features(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="caf" + chr(195) + chr(169) + " normal words"),
        Row(doc_id=2, text="clean text entirely"),
        Row(doc_id=3, text="broken " + chr(65533) + " decode"),
    ])
    out = {r["doc_id"]: r for r in text.mojibake_features(df).collect()}
    assert out[1]["n_mojibake"] == 1 and out[1]["n_replacement"] == 0
    assert out[2]["n_mojibake"] == 0 and out[2]["mojibake_ratio"] == 0.0
    assert out[3]["n_replacement"] == 1 and out[3]["mojibake_ratio"] > 0


def test_write_manifest_roundtrip(spark, tmp_path):
    """The manifest answers "did membership change?" without a data read:
    identical datasets produce identical partition fingerprints; a dropped
    row changes them."""
    import json
    from mondrian_olap_spark.operators.pipeline import write_curated, write_manifest
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "train").otherwise("val").alias("split"),
    )
    p1 = str(tmp_path / "v1")
    write_curated(df, p1)
    m1 = write_manifest(spark, p1)
    assert m1["n_rows"] == 100 and set(m1["partitions"]) == {"train", "val"}
    on_disk = json.load(open(p1 + "/_manifest.json"))
    assert on_disk["partitions"] == m1["partitions"]
    # same content, different write → identical fingerprints
    p2 = str(tmp_path / "v2")
    write_curated(df.repartition(7), p2)
    m2 = write_manifest(spark, p2)
    assert m2["partitions"] == m1["partitions"]
    # membership change is visible
    p3 = str(tmp_path / "v3")
    write_curated(df.filter("doc_id <> 42"), p3)
    m3 = write_manifest(spark, p3)
    assert m3["partitions"]["train"]["ids_md5"] != m1["partitions"]["train"]["ids_md5"]
    assert m3["partitions"]["val"] == m1["partitions"]["val"]


def test_pq_index_roundtrip(spark, tmp_path):
    """write_pq_index persists codes + codebooks; a probe through the
    loaded artifact returns exactly what the in-memory path returns."""
    from mondrian_olap_spark.operators import similarity as sim
    from .conftest import SF_DIR
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "pq_idx")
    cb, sub = sim.write_pq_index(emb, path, m=4, k=8)
    codes, books, sub2 = sim.read_pq_index(spark, path)
    assert sub2 == sub and books == cb
    via_index = sim.pq_topk(emb, [0, 100], books, sub2, n=5,
                            codes=codes).collect()
    direct = sim.pq_topk(emb, [0, 100], cb, sub, n=5).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, direct))


def test_inter_event_stats_hand_computed(spark):
    from datetime import datetime
    from mondrian_olap_spark.operators import events as ev_ops
    rows = [
        # user 1: gaps of 10s, 20s, 30s, 40s (5 events)
        Row(event_id=i, user_id=1, ts=datetime(2024, 1, 1, 0, 0, s), event_type="x")
        for i, s in enumerate([0, 10, 30])
    ] + [
        Row(event_id=10, user_id=1, ts=datetime(2024, 1, 1, 0, 1, 0), event_type="x"),
        Row(event_id=11, user_id=1, ts=datetime(2024, 1, 1, 0, 1, 40), event_type="x"),
        Row(event_id=20, user_id=2, ts=datetime(2024, 1, 1), event_type="y"),  # no gaps
        Row(event_id=21, user_id=3, ts=None, event_type="z"),  # dropped
    ]
    out = {r["user_id"]: r for r in
           ev_ops.inter_event_stats(spark.createDataFrame(rows)).collect()}
    u1 = out[1]
    # sorted gaps [10, 20, 30, 40]: type-1 median = ceil(0.5*4)=2nd -> 20,
    # p90 = ceil(0.9*4)=4th -> 40; max 40
    assert u1["n_events"] == 5 and u1["n_gaps"] == 4
    assert u1["median_gap_s"] == 20.0
    assert u1["p90_gap_s"] == 40.0 and u1["max_gap_s"] == 40.0
    assert out[2]["n_gaps"] == 0 and out[2]["median_gap_s"] is None
    assert 3 not in out


def test_ivfpq_build_and_neardup_retrieval(spark):
    """IVF-PQ composite: the index is (id, cell, codes) with codes in
    range; a PLANTED near-duplicate of the query ranks first under ADC
    (the near-dup retrieval contract — on near-uniform synthetic vectors
    exact-rank recall is not meaningful, quantization error dominates);
    results are n-per-query ascending with self excluded."""
    from mondrian_olap_spark.operators import similarity as sim
    from .conftest import SF_DIR
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # plant a near-duplicate of vector 0
    v0 = emb.filter("vec_id = 0").collect()[0]["embedding"]
    near = spark.createDataFrame(
        [(99999, [float(x) + (0.001 if i == 0 else 0.0)
                  for i, x in enumerate(v0)], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    world = emb.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    ).unionByName(near)
    idx, cents, cb, sub = sim.ivfpq_build(world, n_cells=8, m=4, k=8)
    assert idx.columns == ["id", "cell", "codes"]
    assert idx.count() == world.count()
    out = sim.ivfpq_topk(world, [0], idx, cents, cb, sub, n=5, n_probe=8)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["neighbor_id"] != 0 for r in rows)
    scores = [r["approx_sq_dist"] for r in rows]
    assert scores == sorted(scores)
    # ADC resolves at CODE granularity: the planted near-dup shares the
    # query's codes, so its score attains the minimum (ties on the
    # zero-quantization-error tier break by id — top-1 by id is not a
    # guarantee ADC makes)
    full = {r["neighbor_id"]: r["approx_sq_dist"]
            for r in sim.ivfpq_topk(world, [0], idx, cents, cb, sub,
                                    n=world.count(), n_probe=8).collect()}
    assert abs(full[99999] - min(full.values())) < 1e-9


def test_negative_samples_determinism_and_exclusion(spark):
    from mondrian_olap_spark.operators.sampling import negative_samples
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = negative_samples(df, k=3).collect()
    assert len(out) == 60  # every anchor yields exactly k negatives
    assert all(r["negative_id"] != r["anchor_id"] for r in out)
    assert all(0 <= r["negative_id"] < 20 for r in out)
    # content-addressed: a re-run and a re-partitioned run agree exactly
    again = negative_samples(df.repartition(7), k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # a different seed is a different pairing
    other = negative_samples(df, k=3, seed="neg2").collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))
    with pytest.raises(ValueError):
        negative_samples(df.limit(1), k=2)


def test_blocklist_filter_whole_token(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="the Bad word appears"),
        Row(doc_id=2, text="badge and badminton are fine"),  # substrings don't trip
        Row(doc_id=3, text="bad bad bad everywhere"),
        Row(doc_id=4, text="totally clean"),
    ])
    out = {r["doc_id"]: r for r in
           text.blocklist_filter(df, ("bad",), max_hits=0).collect()}
    assert out[1]["n_blocked"] == 1 and not out[1]["keep"]  # case-insensitive
    assert out[2]["n_blocked"] == 0 and out[2]["keep"]
    assert out[3]["n_blocked"] == 3 and not out[3]["keep"]
    assert out[4]["keep"]
    # max_hits tolerance
    tol = {r["doc_id"]: r["keep"] for r in
           text.blocklist_filter(df, ("bad",), max_hits=1).collect()}
    assert tol[1] and not tol[3]
    with pytest.raises(ValueError):
        text.blocklist_filter(df, ())


def test_bloom_probe_null_text_never_vanishes(spark, docs):
    """A NULL-text row has a NULL fingerprint — definitionally not a
    member: bloom_hit must be FALSE (not NULL, which would satisfy
    neither downstream filter and silently drop the row), on BOTH probe
    strategies, and the row survives incremental_dedup as a non-dup."""
    new = spark.createDataFrame(
        [Row(doc_id=500, text=None),
         Row(doc_id=501, text="a perfectly ordinary novel document")],
    )
    m, k = 62 * 8, 4
    bloom = dedup.bloom_build(docs, m_bits=m, k=k)
    for thresh in (1 << 22, 0):  # inline and join strategies
        probed = {r["doc_id"]: r for r in dedup.bloom_probe(
            new, bloom, m, k, inline_max_bits=thresh).collect()}
        assert probed[500]["bloom_hit"] is False
    out = {r["doc_id"]: r for r in
           dedup.incremental_dedup(new, docs, m_bits=m, k=k).collect()}
    assert set(out) == {500, 501}
    assert out[500]["is_dup"] is False and out[500]["bloom_hit"] is False


def test_dataset_card(spark):
    from mondrian_olap_spark.operators.pipeline import dataset_card
    from .conftest import SF_DIR
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "split", F.when(F.col("doc_id") % 10 < 9, "train").otherwise("val")
    )
    card = dataset_card(docs, name="sf-docs")
    assert card.startswith("# Dataset card: sf-docs")
    for section in ("## Size", "## Language mix", "## Quality", "## Splits"):
        assert section in card
    assert "- documents: " in card and "- train: " in card
    # no split column → no Splits section
    card2 = dataset_card(docs.drop("split"))
    assert "## Splits" not in card2


def test_write_curated_artifacts(spark, tmp_path):
    """manifest=True / card=True ride along with the write — both
    artifacts land under the dataset path with the `_` prefix."""
    import os
    from mondrian_olap_spark.operators.pipeline import write_curated
    df = spark.createDataFrame(
        [(i, f"the document number {i} of the curated corpus", "train")
         for i in range(30)],
        "doc_id long, text string, split string",
    )
    p = str(tmp_path / "with_artifacts")
    write_curated(df, p, manifest=True, card=True, card_name="mini")
    assert os.path.exists(p + "/_manifest.json")
    card = open(p + "/_DATASET_CARD.md").read()
    assert card.startswith("# Dataset card: mini") and "## Splits" in card


def test_doc_keywords(spark):
    from .conftest import SF_DIR  # noqa: F401
    df = spark.createDataFrame([
        Row(doc_id=1, text="zebra zebra zebra common common filler"),
        Row(doc_id=2, text="common filler words only here"),
    ])
    out = text.doc_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    # zebra: tf=3 df=1 -> 3.0 beats common: tf=2 df=2 -> 1.0
    assert d1[0]["term"] == "zebra" and d1[0]["score"] == 3.0
    assert d1[0]["tf"] == 3 and d1[0]["df"] == 1
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2


def test_write_bloom_overwrite_is_crash_safe(spark, tmp_path):
    """Overwriting an EXISTING bloom artifact goes through a sibling
    temp dir + rename swap: the new bitmap lands complete, no
    __tmp__/__old__ residue survives a clean write, and stale residue
    from an interrupted earlier write is cleaned up rather than
    corrupting the swap."""
    import os

    m, k = 62 * 4, 3
    d1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"first generation doc {i}") for i in range(5)]
    )
    d2 = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"second generation doc {i}") for i in range(5)]
    )
    path = str(tmp_path / "bloom")
    dedup.write_bloom(dedup.bloom_build(d1, m_bits=m, k=k), path, m, k)
    # plant the residue an interrupted write would leave
    os.makedirs(path + ".__tmp__/junk", exist_ok=True)
    os.makedirs(path + ".__old__/junk", exist_ok=True)
    bm2 = dedup.bloom_build(d1.unionByName(d2), m_bits=m, k=k)
    dedup.write_bloom(bm2, path, m, k)
    got, m2, k2 = dedup.read_bloom(spark, path)
    assert (m2, k2) == (m, k)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, bm2.collect()))
    assert not os.path.exists(path + ".__tmp__")
    assert not os.path.exists(path + ".__old__")


def test_overwrite_restores_orphaned_old_copy(spark, tmp_path):
    """Crash BETWEEN the two swap renames leaves dest missing and the
    last good copy at .__old__ — the next write must restore it (finish
    the interrupted swap) and leave no orphan directories, instead of
    rebuilding blind while the orphans persist forever."""
    import os
    import shutil

    m, k = 62 * 4, 3
    d1 = spark.createDataFrame(
        [Row(doc_id=i, text=f"gen one doc {i}") for i in range(5)]
    )
    path = str(tmp_path / "bloom")
    bm1 = dedup.bloom_build(d1, m_bits=m, k=k)
    dedup.write_bloom(bm1, path, m, k)
    # simulate the crash window: dest moved aside, replacement never landed
    shutil.move(path, path + ".__old__")
    assert not os.path.exists(path)
    d2 = spark.createDataFrame(
        [Row(doc_id=100 + i, text=f"gen two doc {i}") for i in range(5)]
    )
    bm2 = dedup.bloom_build(d1.unionByName(d2), m_bits=m, k=k)
    dedup.write_bloom(bm2, path, m, k)
    got, m2, k2 = dedup.read_bloom(spark, path)
    assert (m2, k2) == (m, k)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, bm2.collect()))
    assert not os.path.exists(path + ".__tmp__")
    assert not os.path.exists(path + ".__old__")


def test_ingest_state_mutation_order_is_crash_safe(spark, tmp_path,
                                                   monkeypatch):
    """ingest_batch folds the Bloom bitmap BEFORE appending the
    fingerprint store, so every partial-failure state is recoverable by
    plain retry: (a) a crash AT the bitmap fold leaves the store without
    the batch (no store rows the prefilter cannot see — the order that
    would silently admit future duplicates); (b) the worst-case state —
    bits set for fingerprints the store lacks — only costs an extra
    verification miss and the document is correctly admitted."""
    import hashlib

    import pytest

    from mondrian_olap_spark.operators import dedup as dedup_mod
    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    good = ("this is a genuinely long enough quality document body with "
            "plenty of distinct words to pass every default rule ")
    corpus = spark.createDataFrame([Row(doc_id=1, text=good + "alpha")])
    state = str(tmp_path / "state")
    init_ingest_state(corpus, state)

    b1 = spark.createDataFrame([Row(doc_id=11, text=good + "gamma")])
    real_append = dedup_mod.bloom_append

    def boom(*a, **kw):
        raise RuntimeError("injected crash at the bitmap fold")

    monkeypatch.setattr(dedup_mod, "bloom_append", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        ingest_batch(b1, state)
    # the store must NOT have been appended yet (bloom folds first)
    assert spark.read.parquet(f"{state}/fingerprints").count() == 1
    monkeypatch.setattr(dedup_mod, "bloom_append", real_append)
    # plain retry recovers the crashed batch exactly once
    a1 = ingest_batch(b1, state)
    assert {r["doc_id"] for r in a1.collect()} == {11}
    assert spark.read.parquet(f"{state}/fingerprints").count() == 2

    # worst-case mid-crash state: fingerprint in the bitmap, not the
    # store (as a crash between the fold and the append leaves it)
    orphan_text = good + "delta"
    orphan_fp = hashlib.md5(
        orphan_text.strip().lower().encode()
    ).hexdigest()
    dedup_mod.bloom_append(
        spark.createDataFrame([Row(fingerprint=orphan_fp)]),
        f"{state}/bloom", fingerprint_col="fingerprint",
    )
    a2 = ingest_batch(
        spark.createDataFrame([Row(doc_id=21, text=orphan_text)]), state
    )
    rows = a2.collect()
    # bloom hit -> exact verify miss -> admitted (extra work, no loss)
    assert {r["doc_id"] for r in rows} == {21}
    assert all(r["bloom_hit"] for r in rows)


def test_cluster_balanced_sample_modes(spark):
    """cluster_balanced_sample: per-cell cap holds in all three modes;
    'center' keeps the highest centroid-cosines, 'edge' the lowest,
    'hash' is deterministic across invocations; assignment is the
    inlined-centroid projection (no join before the single cap window)."""
    from mondrian_olap_spark.operators import similarity as sim
    from mondrian_olap_spark.star import read_parquet_table

    emb = read_parquet_table(
        spark, "/root/testdata/sf0.001/embeddings.parquet"
    )
    center = sim.cluster_balanced_sample(emb, per_cluster=5, n_cells=4)
    rows = center.collect()
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    assert by_cell and all(len(v) <= 5 for v in by_cell.values())
    # center mode keeps each cell's TOP cosines: every kept row beats
    # every dropped row of its cell
    full = sim.cluster_balanced_sample(
        emb, per_cluster=10**9, n_cells=4
    ).collect()
    best: dict = {}
    for r in full:
        best.setdefault(r["cell"], []).append(r["centroid_cosine"])
    for cell, kept in by_cell.items():
        dropped = sorted(best[cell], reverse=True)[len(kept):]
        if dropped:
            assert min(k["centroid_cosine"] for k in kept) >= max(dropped)
    edge = sim.cluster_balanced_sample(
        emb, per_cluster=5, n_cells=4, by="edge"
    ).collect()
    for r in edge:
        cell_all = sorted(best[r["cell"]])
        assert r["centroid_cosine"] <= cell_all[min(5, len(cell_all)) - 1]
    h1 = sim.cluster_balanced_sample(
        emb, per_cluster=5, n_cells=4, by="hash"
    ).collect()
    h2 = sim.cluster_balanced_sample(
        emb, per_cluster=5, n_cells=4, by="hash"
    ).collect()
    assert sorted(map(tuple, h1)) == sorted(map(tuple, h2))
    import pytest

    with pytest.raises(ValueError, match="center|edge|hash"):
        sim.cluster_balanced_sample(emb, 5, by="random")
    # plan: no join feeds the cap window (assignment is a projection)
    plan = (sim.cluster_balanced_sample(emb, per_cluster=5, n_cells=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan


def test_importance_weights_and_sample(spark):
    """DSIR importance weights: documents that share the target domain's
    vocabulary outscore off-domain ones; smoothing keeps every weight
    finite even for words unseen in the target; Gumbel-top-k sampling is
    deterministic, keeps exactly k, and at tiny temperature degenerates
    to plain top-k by weight."""
    from mondrian_olap_spark.operators import text

    target = spark.createDataFrame(
        [Row(text="quantum physics entanglement qubit decoherence "
                  "quantum qubit physics")] * 3
    )
    src = spark.createDataFrame([
        Row(doc_id=1, text="quantum qubit physics entanglement lab"),
        Row(doc_id=2, text="soccer match goal referee stadium crowd"),
        Row(doc_id=3, text="quantum soccer physics goal qubit match"),
    ])
    w = text.importance_weights(src, target)
    rows = {r["doc_id"]: r for r in w.collect()}
    assert set(rows) == {1, 2, 3}
    # on-domain > mixed > off-domain
    assert rows[1]["log_ratio"] > rows[3]["log_ratio"] > rows[2]["log_ratio"]
    assert all(r["n_tokens"] > 0 for r in rows.values())
    # sampling: deterministic, k rows, near-top-k at small temperature
    s1 = text.importance_sample(w, k=2).collect()
    s2 = text.importance_sample(w, k=2).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    assert len(s1) == 2
    cold = text.importance_sample(w, k=1, temperature=1e-9).collect()
    assert cold[0]["doc_id"] == 1  # T→0: argmax weight wins
    # a different seed reshuffles the Gumbel keys (may or may not change
    # the kept set, but the keys themselves must differ)
    k_a = {r["doc_id"]: r["gumbel_key"]
           for r in text.importance_sample(w, k=3, seed="a").collect()}
    k_b = {r["doc_id"]: r["gumbel_key"]
           for r in text.importance_sample(w, k=3, seed="b").collect()}
    assert any(k_a[d] != k_b[d] for d in k_a)


def test_cell_blocked_pairs_and_semantic_dedup(spark):
    """cell_blocked_pairs ⊆ exact pairs (blocking never invents a pair,
    and every reported cosine matches the exact scan); multi-probe
    blocking recovers a solid share of the exact pair set at the gate
    knobs; semantic_dedup's components are consistent (one min-id
    survivor per cluster, every vector labeled)."""
    from mondrian_olap_spark.operators import similarity as sim
    from mondrian_olap_spark.star import read_parquet_table

    emb = read_parquet_table(
        spark, "/root/testdata/sf0.001/embeddings.parquet"
    )
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim.cosine_pairs_threshold(emb, 0.45).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sim.cell_blocked_pairs(
            emb, 0.45, n_cells=8, n_probe=2
        ).collect()
    }
    assert set(blocked) <= set(exact)
    assert all(abs(blocked[k] - exact[k]) < 1e-12 for k in blocked)
    recall = len(blocked) / max(1, len(exact))
    assert recall >= 0.5, f"blocked recall {recall:.2f} of {len(exact)} pairs"
    # wider probing improves recall monotonically
    blocked4 = sim.cell_blocked_pairs(emb, 0.45, n_cells=8, n_probe=4)
    assert blocked4.count() >= len(blocked)
    keep = sim.semantic_dedup(emb, 0.45, n_cells=8, n_probe=2).collect()
    by_cluster: dict = {}
    for r in keep:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, members in by_cluster.items():
        assert min(m["id"] for m in members) == cl
        assert sum(1 for m in members if m["keep"]) == 1
        assert next(m for m in members if m["keep"])["id"] == cl


def test_importance_weights_hashed_bigrams(spark):
    """Hashed-bigram DSIR weights (the production form): domain ordering
    still holds; a sub-ngram-length doc contributes no fabricated
    features; the fixed-size model BROADCASTS to the doc-feature join."""
    from mondrian_olap_spark.operators import text

    target = spark.createDataFrame(
        [Row(text="quantum physics entanglement qubit decoherence "
                  "quantum qubit physics")] * 3
    )
    src = spark.createDataFrame([
        Row(doc_id=1, text="quantum physics entanglement qubit lab"),
        Row(doc_id=2, text="soccer match goal referee stadium crowd"),
        Row(doc_id=3, text="short"),  # 1 token < ngram: no bigrams
    ])
    w = text.importance_weights(
        src, target, ngram=2, hashed_buckets=256
    )
    rows = {r["doc_id"]: r for r in w.collect()}
    # the 1-token doc has no bigram features -> absent from the output
    assert set(rows) == {1, 2}
    assert rows[1]["log_ratio"] > rows[2]["log_ratio"]
    assert rows[1]["n_tokens"] == 4 and rows[2]["n_tokens"] == 5
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # fixed-size model broadcasts
    import pytest

    with pytest.raises(ValueError, match="ngram"):
        text.importance_weights(src, target, ngram=0)


def test_importance_model_scorer_batch_equals_weights(spark):
    """score_with_model (the inline-model pure projection) matches
    importance_weights on the same corpora to float round-off (the only
    difference is summation order), scores the SAME values on a batch
    frame and the identical data streamed (append-safe: no join, no
    aggregation state), and its plan carries no join."""
    import math
    import tempfile

    from mondrian_olap_spark.operators import text
    from mondrian_olap_spark.star import read_parquet_table

    docs = read_parquet_table(
        spark, "/root/testdata/sf0.001/documents.parquet"
    )
    src = docs.filter("source <> 'src0'")
    tgt = docs.filter("source = 'src0'")
    model = text.importance_model(src, tgt, ngram=2, hashed_buckets=512)
    ref = {
        r["doc_id"]: r["log_ratio"]
        for r in text.importance_weights(
            src, tgt, ngram=2, hashed_buckets=512
        ).collect()
    }
    got = {
        r["doc_id"]: r["log_ratio"]
        for r in text.score_with_model(src, model).collect()
    }
    assert set(got) == set(ref)
    assert all(math.isclose(got[d], ref[d], abs_tol=2e-6) for d in got)
    plan = (text.score_with_model(src, model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Join" not in plan
    # streamed scores == batch scores, bit for bit
    work = tempfile.mkdtemp(prefix="dsir_stream_test_")
    sel = docs.select("doc_id", "text")
    sel.write.mode("overwrite").parquet(f"{work}/staging")
    stream = spark.readStream.schema(sel.schema).parquet(f"{work}/staging")
    spark.catalog.dropTempView("dsir_stream_test")
    q_ = (
        text.score_with_model(stream, model)
        .writeStream.format("memory").queryName("dsir_stream_test")
        .outputMode("append")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True).start()
    )
    q_.awaitTermination(120)
    streamed = {
        r["doc_id"]: r["log_ratio"]
        for r in spark.table("dsir_stream_test").collect()
    }
    batch = {
        r["doc_id"]: r["log_ratio"]
        for r in text.score_with_model(sel, model).collect()
    }
    assert streamed == batch


# ------------------------------------------------------------- finance


def test_finance_npv_irr_mirr(spark):
    """NPV/IRR/MIRR over grouped ordered cashflows (Vba.nPV/iRR/mIRR
    semantics): NPV discounts the first value one period; IRR solves
    f(r)=0 from time-0 flows; MIRR compounds positives at the reinvest
    rate and discounts negatives at the finance rate.  Pinned against
    independent Python arithmetic."""
    from mondrian_olap_spark.operators import finance

    rows = [
        Row(grp="a", t=i, v=float(v))
        for i, v in enumerate([-1000.0, 300.0, 420.0, 680.0])
    ] + [
        Row(grp="b", t=i, v=float(v))
        for i, v in enumerate([-5000.0, 1500.0, 1500.0, 1500.0, 1500.0])
    ]
    df = spark.createDataFrame(rows)
    series = finance.cashflows(df, ["grp"], "t", "v")
    out = {
        r["grp"]: r
        for r in finance.with_mirr(
            finance.with_irr(finance.with_npv(series, 0.08)),
            finance_rate=0.1,
            reinvest_rate=0.12,
        ).collect()
    }

    import math

    def ref_npv(rate, cfs):
        return sum(c / (1 + rate) ** (i + 1) for i, c in enumerate(cfs))

    def ref_irr(cfs, guess=0.1, steps=200):
        r = guess
        for _ in range(steps):
            f = sum(c / (1 + r) ** i for i, c in enumerate(cfs))
            fp = sum(-i * c / (1 + r) ** (i + 1) for i, c in enumerate(cfs))
            r2 = r - f / fp
            if r2 == r:
                break
            r = r2
        return r

    def ref_mirr(cfs, frate, rrate):
        n = len(cfs)
        npv_pos = ref_npv(rrate, [max(c, 0.0) for c in cfs])
        npv_neg = ref_npv(frate, [min(c, 0.0) for c in cfs])
        return (
            (-npv_pos * (1 + rrate) ** n) / (npv_neg * (1 + frate))
        ) ** (1 / (n - 1)) - 1

    cfs_a = [-1000.0, 300.0, 420.0, 680.0]
    cfs_b = [-5000.0, 1500.0, 1500.0, 1500.0, 1500.0]
    assert out["a"]["npv"] == pytest.approx(ref_npv(0.08, cfs_a), rel=1e-12)
    assert out["b"]["npv"] == pytest.approx(ref_npv(0.08, cfs_b), rel=1e-12)
    # IRR: npv at the solved rate is ~0 and matches the Python Newton
    assert out["a"]["irr"] == pytest.approx(ref_irr(cfs_a), rel=1e-9)
    assert out["b"]["irr"] == pytest.approx(ref_irr(cfs_b), rel=1e-9)
    for g, cfs in (("a", cfs_a), ("b", cfs_b)):
        r = out[g]["irr"]
        assert abs(sum(c / (1 + r) ** i for i, c in enumerate(cfs))) < 1e-6
    assert out["a"]["mirr"] == pytest.approx(
        ref_mirr(cfs_a, 0.1, 0.12), rel=1e-12
    )
    assert out["b"]["mirr"] == pytest.approx(
        ref_mirr(cfs_b, 0.1, 0.12), rel=1e-12
    )


def test_finance_cashflows_order_independent(spark):
    """cashflows() sorts by the order column inside the aggregation —
    the array (and thus IRR) is identical under any input partitioning
    or row order."""
    from mondrian_olap_spark.operators import finance

    rows = [Row(grp="a", t=t, v=float(v)) for t, v in
            [(3, 680.0), (0, -1000.0), (2, 420.0), (1, 300.0)]]
    df = spark.createDataFrame(rows).repartition(7)
    got = finance.cashflows(df, ["grp"], "t", "v").collect()[0]["cfs"]
    assert got == [-1000.0, 300.0, 420.0, 680.0]


def test_plan_shards_balance_and_modes(spark):
    """plan_shards: shards are contiguous token-budget runs in the
    deterministic epoch order; num_shards mode balances within one
    document's tokens; target_tokens mode opens a shard every ~T;
    assignment is invariant to input partitioning."""
    from mondrian_olap_spark.operators import pipeline as pl

    rows = [Row(doc_id=i, text=" ".join(["w"] * (5 + (i * 7) % 23)))
            for i in range(100)]
    docs = spark.createDataFrame(rows)
    planned = pl.plan_shards(docs, num_shards=4).collect()
    by_shard = {}
    for r in planned:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    total = sum(r["n_tokens"] for r in planned)
    target = -(-total // 4)
    max_doc = max(r["n_tokens"] for r in planned)
    for sid, rs in by_shard.items():
        mass = sum(r["n_tokens"] for r in rs)
        if sid < 3:  # the last shard takes the remainder
            assert mass <= target + max_doc
    # shards are contiguous in cum_tokens order
    for r in planned:
        assert r["shard_id"] == min((r["cum_tokens"] - r["n_tokens"]) // target, 3)

    # partitioning invariance
    p2 = {r["doc_id"]: r["shard_id"]
          for r in pl.plan_shards(docs.repartition(13), num_shards=4).collect()}
    assert p2 == {r["doc_id"]: r["shard_id"] for r in planned}

    # target_tokens mode
    t = pl.plan_shards(docs, target_tokens=100).collect()
    for r in t:
        assert r["shard_id"] == (r["cum_tokens"] - r["n_tokens"]) // 100

    with pytest.raises(ValueError, match="exactly one"):
        pl.plan_shards(docs)
    with pytest.raises(ValueError, match="exactly one"):
        pl.plan_shards(docs, num_shards=4, target_tokens=10)


def test_distributed_cumsum_exact(spark):
    """distributed_cumsum equals the single-task window cumsum on any
    partitioning (inclusive prefix sum, total order by (key, id))."""
    from mondrian_olap_spark.operators.util import distributed_cumsum

    rows = [Row(id=i, k=(i * 37) % 11, v=(i % 7) + 1) for i in range(200)]
    df = spark.createDataFrame(rows).repartition(9)
    got = {r["id"]: r["cs"] for r in
           distributed_cumsum(df, ["k", "id"], "v", cumsum_col="cs").collect()}
    ordered = sorted(rows, key=lambda r: (r.k, r.id))
    run = 0
    for r in ordered:
        run += r.v
        assert got[r.id] == run


def test_recall_report_generic(spark):
    """recall_report: per-query hit fraction vs the exact list; queries
    the approximate arm missed entirely still appear with recall 0."""
    from mondrian_olap_spark.operators import similarity

    exact = spark.createDataFrame(
        [Row(query_id=q, neighbor_id=n) for q in (1, 2) for n in range(4)]
    )
    approx = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=0), Row(query_id=1, neighbor_id=2),
         Row(query_id=1, neighbor_id=99),  # false neighbor, not counted
         Row(query_id=2, neighbor_id=77)]  # all misses
    )
    rep = {r["query_id"]: r for r in
           similarity.recall_report(exact, approx).collect()}
    assert rep[1]["n_true"] == 4 and rep[1]["n_hit"] == 2
    assert rep[1]["recall"] == 0.5
    assert rep[2]["n_hit"] == 0 and rep[2]["recall"] == 0.0


def test_write_shards_layout(spark, tmp_path):
    """write_shards materializes the planned layout as shard_id=N
    parquet partitions with every input column, no join back to the
    corpus; the returned audit matches what landed on disk."""
    from mondrian_olap_spark.operators import pipeline as pl

    rows = [Row(doc_id=i, text=" ".join(["w"] * (5 + i % 11)), lang="en")
            for i in range(80)]
    docs = spark.createDataFrame(rows)
    dest = str(tmp_path / "shards")
    audit = {r["shard_id"]: r for r in
             pl.write_shards(docs, dest, num_shards=4).collect()}
    back = spark.read.parquet(dest)
    assert set(back.columns) == {"doc_id", "text", "lang", "n_tokens",
                                 "shard_id"}
    on_disk = {r["shard_id"]: r["n"] for r in
               back.groupBy("shard_id").agg(F.count("*").alias("n")).collect()}
    assert on_disk == {s: a["n_docs"] for s, a in audit.items()}
    assert set(on_disk) == {0, 1, 2, 3}


def test_ids_to_tokens_roundtrip(spark):
    """ids_to_tokens inverts tokens_to_ids on in-vocab text; unknown ids
    decode to the unk token; oversized vocabs refuse the inline path."""
    from mondrian_olap_spark.operators import text as t

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="a b c a"), Row(doc_id=2, text="c b zz")]
    )
    vocab = spark.createDataFrame(
        [Row(token="a", token_id=1), Row(token="b", token_id=2),
         Row(token="c", token_id=3)]
    )
    enc = t.tokens_to_ids(docs, vocab, unk_id=0)
    dec = {r["doc_id"]: r["tokens"]
           for r in t.ids_to_tokens(enc, vocab, unk_token="<unk>").collect()}
    assert dec[1] == ["a", "b", "c", "a"]
    assert dec[2] == ["c", "b", "<unk>"]   # zz was OOV on encode
    with pytest.raises(ValueError, match="inline map"):
        t.ids_to_tokens(enc, vocab, broadcast_threshold=2)


def test_plan_shards_append_continues_layout(spark):
    """plan_shards_append: repeated batches produce exactly the shard
    boundaries a from-scratch target_tokens plan over the concatenated
    stream would — the tail shard fills before a new one opens, and
    state carries only two longs."""
    from mondrian_olap_spark.operators import pipeline as pl

    rows = [Row(doc_id=i, text=" ".join(["w"] * (4 + i % 9)))
            for i in range(120)]
    docs = spark.createDataFrame(rows)
    b1 = docs.filter("doc_id < 40")
    b2 = docs.filter("doc_id >= 40 AND doc_id < 80")
    b3 = docs.filter("doc_id >= 80")

    p1 = pl.plan_shards(b1, target_tokens=100)
    st = pl.shard_plan_state(p1, target_tokens=100)
    p2, st = pl.plan_shards_append(b2, st)
    p3, st = pl.plan_shards_append(b3, st)
    cols = ["doc_id", "n_tokens", "cum_tokens", "shard_id"]
    got = {r["doc_id"]: r for df in (p1.select(*cols), p2.select(*cols),
                                     p3.select(*cols))
           for r in df.collect()}

    # reference: sequential walk in (batch, skey, doc_id) order
    import hashlib

    def skey(i):
        return int(hashlib.md5(f"shards0:{i}".encode()).hexdigest()[:15], 16)

    order = (sorted(range(0, 40), key=lambda i: (skey(i), i))
             + sorted(range(40, 80), key=lambda i: (skey(i), i))
             + sorted(range(80, 120), key=lambda i: (skey(i), i)))
    cum = 0
    for i in order:
        n = 4 + i % 9
        assert got[i]["shard_id"] == cum // 100
        cum += n
        assert got[i]["cum_tokens"] == cum
    assert st["total_tokens"] == cum


def test_documents_cube_mdx_and_aggregate_routing(spark):
    """The corpus cube composes with the rest of the engine: MDX
    executes against it (calc members over corpus measures), and
    register_aggregate routes corpus rollups to a summary with ZERO
    documents scans — the OLAP-half features are not star-schema-only."""
    from mondrian_olap_spark.mdx import execute_mdx
    from mondrian_olap_spark.model import Cube, Dimension, Level, Measure
    from mondrian_olap_spark.star import CubeEngine, read_parquet_table

    from .conftest import SF_DIR

    docs = read_parquet_table(spark, f"{SF_DIR}/documents.parquet")
    cube = Cube(
        name="Corpus",
        fact="documents",
        dimensions=(
            Dimension(name="Lang", levels=(Level("Lang", "lang", output="lang"),)),
            Dimension(
                name="Source",
                levels=(Level("Source", "source", output="source"),),
            ),
        ),
        measures=(
            Measure("N Docs", "doc_id", "count", output="n_docs"),
            Measure("Sum Chars", "n_chars", "sum", output="sum_chars"),
        ),
    )
    eng = CubeEngine(cube, {"documents": docs})

    # MDX with a calc member over corpus measures
    r = execute_mdx(
        eng,
        """
        WITH MEMBER [Measures].[Chars Per Doc] AS
               'sum_chars / n_docs'
        SELECT {[Measures].[N Docs], [Measures].[Chars Per Doc]} ON COLUMNS,
               [Lang].Members ON ROWS FROM [Corpus]
        """,
    )
    rows = {x["lang"]: x for x in r.df.collect()}
    assert len(rows) >= 2
    ref = {x["lang"]: x for x in
           docs.groupBy("lang").agg(
               F.count("doc_id").alias("n"),
               F.sum("n_chars").alias("s")).collect()}
    for lang, x in rows.items():
        assert x["n_docs"] == ref[lang]["n"]
        assert x["chars_per_doc"] == pytest.approx(
            ref[lang]["s"] / ref[lang]["n"]
        )

    # aggregate routing: register a MATERIALIZED lang-grain summary (a
    # lazy groupBy frame would carry the documents scan in its own
    # lineage and defeat the plan assertion below), the routed plan must
    # not scan documents
    import tempfile

    agg_path = tempfile.mkdtemp(prefix="docs_cube_agg_") + "/summary"
    docs.groupBy("lang").agg(
        F.count("doc_id").alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    ).write.mode("overwrite").parquet(agg_path)
    summary = spark.read.parquet(agg_path)
    eng.register_aggregate(summary, ["lang"], {"n_docs": "count",
                                               "sum_chars": "sum"})
    from mondrian_olap_spark.query import Query

    df = (
        Query(eng)
        .columns("[Measures].[N Docs]", "[Measures].[Sum Chars]")
        .rows("[Lang].Members")
        .execute()
        .df
    )
    # the routed plan must serve from the summary — no documents scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan
    base = {x["lang"]: x for x in
            docs.groupBy("lang").agg(
                F.count("doc_id").alias("n"),
                F.sum("n_chars").alias("s")).collect()}
    got = {x["lang"]: x for x in df.collect()}
    assert {k: (v["n_docs"], v["sum_chars"]) for k, v in got.items()} == {
        k: (v["n"], v["s"]) for k, v in base.items()
    }


def test_pair_recall_report(spark):
    """pair_recall_report: orientation-normalized pair-set recall; a
    candidate generator that misses pairs shows the fraction found."""
    from mondrian_olap_spark.operators import dedup

    exact = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=3, id_b=4), Row(id_a=5, id_b=6)]
    )
    cand = spark.createDataFrame(
        [Row(id_a=2, id_b=1),       # reversed orientation still counts
         Row(id_a=3, id_b=4),
         Row(id_a=7, id_b=8)]       # false candidate, not counted
    )
    r = dedup.pair_recall_report(exact, cand).collect()[0]
    assert r["n_true"] == 3 and r["n_found"] == 2
    assert r["recall"] == pytest.approx(2 / 3)


def test_train_bpe_and_apply(spark):
    """BPE training vs an independent in-test reference (Sennrich
    pair-count/merge loop), then GPT-2-style application: lowest-rank
    pair first, lossless per-pre-token concatenation."""
    from mondrian_olap_spark.operators import text as t
    import re

    corpus = ["low low low low low",
              "lower lower newest newest newest",
              "newest newest newest widest"]
    docs = spark.createDataFrame([Row(doc_id=i, text=s)
                                  for i, s in enumerate(corpus)])
    merges = t.train_bpe(docs, num_merges=6, min_freq=2, max_words=100)

    # independent reference on the same pre-token counts
    pat = re.compile(t.BPE_SPLIT_PATTERN)
    freq = {}
    for s in corpus:
        for w in pat.findall(s):
            freq[w] = freq.get(w, 0) + 1
    vocab = {tuple(w): f for w, f in freq.items()}
    ref = []
    for _ in range(6):
        counts = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = counts.get(
                    (sym[i], sym[i + 1]), 0) + f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        nv = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(sym[i]); i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
        ref.append((a, b))
    assert merges == ref and len(merges) > 0

    seg = {r["doc_id"]: r["bpe_tokens"]
           for r in t.apply_bpe(docs, merges).collect()}
    # lossless: concatenating subwords reproduces the pre-tokens
    for i, s in enumerate(corpus):
        assert "".join(seg[i]) == "".join(pat.findall(s))
    # the most frequent word ends fully merged after enough rounds
    assert any(tok.endswith("est") or "newest" in tok
               for tok in seg[1] + seg[2])


def test_apply_bpe_on_stream_matches_batch(spark, tmp_path):
    """apply_bpe is a pure projection once the merge list is fixed, so
    the SAME call segments a streaming frame — streamed output equals
    the batch output row for row."""
    from mondrian_olap_spark.operators import text as t

    rows = [Row(doc_id=i, text=s) for i, s in enumerate(
        ["low low lower", "newest newest widest", "low newest"])]
    docs = spark.createDataFrame(rows)
    merges = t.train_bpe(docs, num_merges=5, min_freq=1, max_words=100)
    batch = {r["doc_id"]: r["bpe_tokens"]
             for r in t.apply_bpe(docs, merges).collect()}

    staging = str(tmp_path / "staging")
    docs.write.mode("overwrite").parquet(staging)
    stream = spark.readStream.schema(docs.schema).parquet(staging)
    seg = t.apply_bpe(stream, merges)
    spark.catalog.dropTempView("bpe_stream_view") if \
        "bpe_stream_view" in [v.name for v in spark.catalog.listTables()] \
        else None
    q_ = (seg.writeStream.format("memory").queryName("bpe_stream_view")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    q_.awaitTermination(120)
    streamed = {r["doc_id"]: r["bpe_tokens"]
                for r in spark.table("bpe_stream_view").collect()}
    assert streamed == batch


def test_write_shards_partition_pruning(spark, tmp_path):
    """Reading one shard back prunes to that partition — the layout is
    not just balanced, it is skippable (PartitionFilters on shard_id)."""
    from mondrian_olap_spark.operators import pipeline as pl

    rows = [Row(doc_id=i, text=" ".join(["w"] * (3 + i % 5)))
            for i in range(60)]
    dest = str(tmp_path / "shards")
    pl.write_shards(spark.createDataFrame(rows), dest, num_shards=4)
    one = spark.read.parquet(dest).filter("shard_id = 2")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan.split(
        "PartitionFilters")[1][:120]
    assert one.count() > 0


def test_embedding_scatter_pca_project(spark):
    """embedding_scatter matches numpy covariance to decimal-rounding
    tolerance; pca_components recovers the dominant planted direction;
    project_embeddings is the plain dot product."""
    import numpy as np
    from mondrian_olap_spark.operators import similarity as sim

    rng = np.random.RandomState(7)
    base = rng.randn(200, 1) @ np.array([[3.0, 1.0, 0.2, 0.0]])
    noise = rng.randn(200, 4) * 0.1
    X = base + noise
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in X[i]])
         for i in range(200)]
    )
    sc = {(r["i"], r["j"]): r for r in
          sim.embedding_scatter(df, dim=4).collect()}
    assert len(sc) == 10  # 4*5/2 upper triangle
    ref = np.cov(X, rowvar=False, bias=True)
    for (i, j), r in sc.items():
        assert r["cov"] == pytest.approx(ref[i - 1, j - 1], abs=1e-6)

    comps = sim.pca_components(df, k=2)
    v0 = np.array(comps[0])
    planted = np.array([3.0, 1.0, 0.2, 0.0])
    planted /= np.linalg.norm(planted)
    assert abs(float(v0 @ planted)) > 0.99
    # sign convention: largest-|.| coordinate positive
    assert v0[int(np.argmax(np.abs(v0)))] > 0

    proj = sim.project_embeddings(df, comps).collect()
    for r in proj[:5]:
        x = np.array(r["embedding"])
        want = [float(x @ np.array(c)) for c in comps]
        assert r["projected"] == pytest.approx(want, rel=1e-9)


def test_embedding_mean_and_centered_projection(spark):
    """embedding_mean matches numpy; centered projection equals
    (x - mu) @ C and has ~zero mean per coordinate."""
    import numpy as np
    from mondrian_olap_spark.operators import similarity as sim

    rng = np.random.RandomState(3)
    X = rng.randn(150, 4) + np.array([5.0, -2.0, 0.5, 0.0])
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in X[i]])
         for i in range(150)]
    )
    mu = sim.embedding_mean(df, dim=4)
    assert mu == pytest.approx(list(X.mean(axis=0)), abs=1e-9)
    comps = sim.pca_components(df, k=2, dim=4)
    proj = sim.project_embeddings(df, comps, mean=mu).collect()
    C = np.array(comps).T
    got = np.array([r["projected"] for r in
                    sorted(proj, key=lambda r: r["vec_id"])])
    want = (X - X.mean(axis=0)) @ C
    assert np.allclose(got, want, atol=1e-6)
    assert np.allclose(got.mean(axis=0), 0.0, atol=1e-6)


# ------------------------------------------------------------------ web
def test_canonical_url_rules(spark):
    from mondrian_olap_spark.operators import web

    cases = [
        # case folding + default port + slash run + trailing slash +
        # tracking drop + param sort + fragment drop
        ("HTTP://WWW.Example.COM:80//a//b/?utm_source=x&b=2&a=1#f",
         "http://www.example.com/a/b?a=1&b=2"),
        # https default port; tracking-only query vanishes (no '?')
        ("https://news.example.co.uk:443/path/3/?gclid=abc",
         "https://news.example.co.uk/path/3"),
        # non-default port kept; userinfo dropped
        ("HTTPS://USER:pw@Media.Example.ORG:8443/x/?fbclid=1&q=2",
         "https://media.example.org:8443/x?q=2"),
        # bare host, no path/query
        ("http://example.com", "http://example.com"),
        # bare ref param is a tracker; ref_src too; keep= survives
        ("https://a.b/p?ref&keep=1&ref_src=tw", "https://a.b/p?keep=1"),
        # unparseable input passes through trimmed
        ("  not a url  ", "not a url"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r.i: r.canonical_url
        for r in web.canonicalize_urls(df).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_canonical_url_strip_www_and_host(spark):
    from mondrian_olap_spark.operators import web

    df = spark.createDataFrame(
        [(1, "http://WWW.Example.com/a"), (2, "http://www2.example.com/b")],
        "i long, url string",
    )
    rows = {
        r.i: (r.canonical_url, r.host)
        for r in web.with_host(
            web.canonicalize_urls(df, strip_www=True),
            "url",
            strip_www=True,
        ).collect()
    }
    assert rows[1] == ("http://example.com/a", "example.com")
    # www2 is NOT www — must survive
    assert rows[2] == ("http://www2.example.com/b", "www2.example.com")


def test_registered_domain_heuristic(spark):
    from mondrian_olap_spark.operators import web

    df = spark.createDataFrame(
        [
            (1, "a.b.example.co.uk"),
            (2, "deep.blog.example.com"),
            (3, "example.com"),
            (4, "localhost"),
            (5, "x.custom.tld"),
        ],
        "i long, host string",
    )
    out = df.withColumn(
        "d", web.registered_domain_expr("host", extra_suffixes=("custom.tld",))
    )
    got = {r.i: r.d for r in out.collect()}
    assert got == {
        1: "example.co.uk",
        2: "example.com",
        3: "example.com",
        4: "localhost",
        5: "x.custom.tld",
    }


def test_cap_per_host_deterministic_and_ordered(spark):
    from mondrian_olap_spark.operators import web

    rows = [(i, f"https://h{i % 3}.ex.com/{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    a = web.cap_per_host(df, 2, "url")
    kept_a = sorted(r.doc_id for r in a.collect())
    # layout independence: different partitioning, same kept set
    b = web.cap_per_host(df.repartition(7), 2, "url")
    assert sorted(r.doc_id for r in b.collect()) == kept_a
    assert len(kept_a) == 6
    # explicit order_by overrides the hash order: keep the LOWEST ids
    c = web.cap_per_host(df, 2, "url", order_by=["doc_id"])
    assert sorted(r.doc_id for r in c.collect()) == [0, 1, 2, 3, 4, 5]
    with pytest.raises(ValueError):
        web.cap_per_host(df, 0, "url")


def test_host_profile_counts_canonical_urls(spark):
    from mondrian_olap_spark.operators import web

    df = spark.createDataFrame(
        [
            (1, "https://h.ex.com/a?utm_source=x", "aaaa"),
            (2, "https://h.ex.com/a?utm_source=y", "bb"),
            (3, "https://h.ex.com/b", "c"),
        ],
        "doc_id long, url string, text string",
    )
    row = web.host_profile(df, "url").collect()[0]
    # two tracking variants of /a collapse into ONE canonical url
    assert (row.host, row.n_docs, row.n_urls, row.total_chars) == (
        "h.ex.com", 3, 2, 7,
    )


def test_line_dedup_rules(spark):
    from mondrian_olap_spark.operators.text import boilerplate_lines, line_dedup

    rows = [
        (1, "cookie banner\nunique one\nfooter"),
        (2, "cookie banner\nunique two\nfooter"),
        (3, "cookie banner\nunique three"),
        (4, "cookie banner\ncookie banner"),  # within-doc dup: ONE doc
        (5, None),  # NULL text must survive as one empty line
        (6, "footer"),  # entirely boilerplate at min_docs=3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bp = {r.line: r.doc_freq for r in boilerplate_lines(df, 3).collect()}
    # 'cookie banner' in docs 1,2,3,4 (doc 4 counts ONCE); 'footer' in 1,2,6
    assert bp == {"cookie banner": 4, "footer": 3}
    out = {r.doc_id: r for r in line_dedup(df, 3).collect()}
    assert len(out) == 6  # every input doc comes back
    assert out[1].clean_text == "unique one"
    assert (out[1].n_lines, out[1].n_removed) == (3, 2)
    assert out[4].clean_text == "" and out[4].n_removed == 2
    assert out[5].clean_text == "" and out[5].n_lines == 1
    assert out[6].clean_text == "" and out[6].n_removed == 1
    # order preserved around a removed middle line
    df2 = spark.createDataFrame(
        [(1, "a\nZZ\nb"), (2, "ZZ"), (3, "ZZ")], "doc_id long, text string"
    )
    assert {r.doc_id: r.clean_text for r in line_dedup(df2, 3).collect()}[1] == "a\nb"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        line_dedup(df, 0)


def test_perceptron_learns_and_is_layout_independent(spark):
    from mondrian_olap_spark.operators.text import (
        score_with_perceptron,
        train_quality_perceptron,
    )

    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, 1, "excellent wonderful prose with excellent structure"))
        else:
            rows.append((i, 0, "zzz spam garbage zzz click here spam"))
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    m = train_quality_perceptron(df, hashed_buckets=64, iterations=10)
    # separable data converges (early exit) and classifies perfectly
    assert m["history"][-1] == 0
    scored = score_with_perceptron(df, m)
    assert (
        scored.filter(
            (F.col("prediction") == 1) != (F.col("doc_id") % 2 == 0)
        ).count()
        == 0
    )
    # all-integer training: bit-identical model under any layout
    m2 = train_quality_perceptron(
        df.repartition(7), hashed_buckets=64, iterations=10
    )
    assert m2 == m
    with pytest.raises(ValueError):
        train_quality_perceptron(df, iterations=0)


def test_perceptron_streaming_scoring_matches_batch(spark, tmp_path):
    """score_with_perceptron is a pure projection — the SAME call scores a
    readStream frame, and the streamed results equal the batch results."""
    from mondrian_olap_spark.operators.text import (
        score_with_perceptron,
        train_quality_perceptron,
    )

    rows = [
        (i, i % 3 == 0 and 1 or 0, f"alpha beta w{i % 5} gamma delta")
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    model = train_quality_perceptron(df, hashed_buckets=32, iterations=3)
    batch = {
        r.doc_id: (r.margin, r.prediction)
        for r in score_with_perceptron(df, model).collect()
    }
    src = tmp_path / "docs_stream"
    df.write.json(str(src))
    stream = spark.readStream.schema(df.schema).json(str(src))
    q = (
        score_with_perceptron(stream, model)
        .writeStream.format("memory")
        .queryName("perceptron_scores")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r.doc_id: (r.margin, r.prediction)
            for r in spark.sql("select * from perceptron_scores").collect()
        }
    finally:
        q.stop()
    assert streamed == batch and len(streamed) == 30


def test_ngram_collision_report(spark):
    from mondrian_olap_spark.operators.dedup import ngram_collision_report

    corpus = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "totally different words with no overlap at all here"),
            (3, "short doc"),  # < n tokens: no grams, never collides
        ],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame(
        [
            (100, "zzz one two three four five six seven eight yyy"),
            (101, "short doc"),  # also < n: must NOT match doc 3
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in ngram_collision_report(corpus, heldout, n=8).collect()}
    # doc 1 has 3 distinct 8-grams; exactly ONE ("one..eight") appears in heldout
    assert list(out) == [1]
    assert (out[1].n_grams, out[1].n_shared, out[1].n_heldout_docs) == (3, 1, 1)

    # stop-gram guard: a gram in EVERY doc on both sides gets dropped
    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    corpus2 = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    heldout2 = spark.createDataFrame(
        [(100 + i, boiler) for i in range(10)], "doc_id long, text string"
    )
    from mondrian_olap_spark.operators.dedup import ngram_collision_report as r

    assert r(corpus2, heldout2, n=8).count() == 10  # unguarded: all collide
    assert r(corpus2, heldout2, n=8, max_shingle_df=5).count() == 0


def test_duplicated_spans_any_alignment(spark):
    """ExactSubstr span dedup (Lee et al. 2022): rolling shingles catch a
    duplicated passage at ANY alignment; keep='first' leaves exactly one
    copy in (doc, position) order; merged spans are maximal."""
    from mondrian_olap_spark.operators.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    shared = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"a1 a2 a3 {shared} b1 b2"),
            Row(doc_id=2, text=f"c1 {shared} d1 d2 d3 d4"),  # offset copy
            Row(doc_id=3, text="all original words here no overlap at zz yy"),
            Row(doc_id=4, text="tiny doc"),  # < n tokens: never flagged
        ]
    )
    spans = duplicated_spans(docs, n=8).collect()
    # only the LATER copy (doc 2) is flagged; tokens 2..11 = the passage
    assert [(r.doc_id, r.start_tok, r.end_tok) for r in spans] == [(2, 2, 11)]
    out = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    assert out[1].n_removed == 0  # first occurrence survives intact
    assert out[2].n_removed == 10
    assert out[2].clean_text == "c1 d1 d2 d3 d4"
    assert out[3].n_removed == 0 and out[4].n_removed == 0
    # keep='none' scrubs BOTH copies
    all_gone = {
        r.doc_id: r.n_removed
        for r in remove_duplicated_spans(docs, n=8, keep="none").collect()
    }
    assert all_gone[1] == 10 and all_gone[2] == 10


def test_duplicated_spans_merge_adjacent_runs(spark):
    from mondrian_olap_spark.operators.dedup import duplicated_spans

    # two shared passages separated by ONE unique token in the copy: the
    # islands merge only when shingle intervals overlap/touch
    a = "x1 x2 x3 x4 x5 x6 x7 x8"
    b = "y1 y2 y3 y4 y5 y6 y7 y8"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{a} mid {b}"),
            Row(doc_id=2, text=f"{a} other1 other2 other3 {b}"),
        ]
    )
    spans = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicated_spans(docs, n=8).collect()
    }
    # doc 2 (later) flagged for both passages as separate spans
    assert spans == {(2, 1, 8), (2, 12, 19)}


def test_shingle_store_roundtrip_and_probe(spark, tmp_path):
    """Incremental ExactSubstr: store build → probe flags state passages
    and batch-internal dups → append folds the batch → compaction
    re-distincts without changing probe results."""
    from mondrian_olap_spark.operators.dedup import (
        compact_shingle_store,
        probe_duplicated_spans,
        read_shingle_store,
        shingle_store_append,
        write_shingle_store,
    )

    passage = "s1 s2 s3 s4 s5 s6 s7 s8"
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{passage} extra tail words"),
            Row(doc_id=2, text="fully original corpus doc two body text ok"),
        ]
    )
    path = str(tmp_path / "shingles")
    write_shingle_store(corpus, path, n=8)
    _, n = read_shingle_store(spark, path)
    assert n == 8
    batch = spark.createDataFrame(
        [
            Row(doc_id=100, text=f"lead {passage} trail"),  # vs state
            Row(doc_id=101, text="b1 b2 b3 b4 b5 b6 b7 b8 mid"),
            Row(doc_id=102, text="pre b1 b2 b3 b4 b5 b6 b7 b8"),  # vs 101
            Row(doc_id=103, text="wholly new never seen tokens q w e r"),
        ]
    )
    spans = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in probe_duplicated_spans(batch, path).collect()
    }
    # 100 matches the state passage at tokens 2..9; 102's copy of 101's
    # passage flags (keep-first: 101 < 102); 103 is clean
    assert spans == {(100, 2, 9), (102, 2, 9)}
    # fold the batch in: a re-probe of 103's text now flags against state
    shingle_store_append(batch, path)
    reprobe = probe_duplicated_spans(
        spark.createDataFrame(
            [Row(doc_id=200, text="wholly new never seen tokens q w e r")]
        ),
        path,
    ).collect()
    assert [(r.doc_id, r.start_tok, r.end_tok) for r in reprobe] == [(200, 1, 9)]
    # compaction keeps probe results identical
    before = spark.read.parquet(path).count()
    compact_shingle_store(spark, path)
    after = spark.read.parquet(path).count()
    assert after <= before
    reprobe2 = probe_duplicated_spans(
        spark.createDataFrame(
            [Row(doc_id=200, text="wholly new never seen tokens q w e r")]
        ),
        path,
    ).collect()
    assert [(r.doc_id, r.start_tok, r.end_tok) for r in reprobe2] == [(200, 1, 9)]


def test_ngram_collision_overlapping_id_spaces(spark):
    """Corpus and held-out id spaces may overlap (independent eval sets
    reuse small integer ids): the combined document frequency must count
    (side, id) pairs, so identical ids on the two sides stay distinct
    documents for the stop-shingle cap."""
    from mondrian_olap_spark.operators.dedup import ngram_collision_report as r

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    corpus = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    heldout = spark.createDataFrame(  # SAME ids as the corpus
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    # 20 distinct (side, id) pairs > cap 15 → the gram is dropped, even
    # though each side alone has only 10 distinct raw ids
    assert r(corpus, heldout, n=8, max_shingle_df=15).count() == 0


def test_value_histogram_and_quantiles(spark, tmp_path):
    from mondrian_olap_spark.operators import sketches

    # 100 values 0..99, 10 bins of width 10; out-of-range clamps to ends
    rows = [(i, float(i)) for i in range(100)] + [(900, -5.0), (901, 999.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    hist = sketches.value_histogram(df, "v", 0.0, 100.0, 10)
    counts = {r.bin: r.n for r in hist.collect()}
    assert counts[0] == 11 and counts[9] == 11  # clamped extremes
    assert all(counts[b] == 10 for b in range(1, 9))
    q = {
        r.percent: (r.bin, r.lower_edge, r.upper_edge, r.n_total)
        for r in sketches.histogram_quantiles(
            hist, 0.0, 100.0, 10, [1, 50, 100]
        ).collect()
    }
    assert q[1][0] == 0 and q[100][0] == 9
    # p50 of 102 values: target=51 -> cum reaches 51 in bin 4 (11+10*4=51)
    assert q[50][0] == 4 and q[50][1] == 40.0 and q[50][3] == 102
    with pytest.raises(ValueError):
        sketches.value_histogram(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError):
        sketches.histogram_quantiles(hist, 0.0, 100.0, 10, [0])


def test_histogram_append_equals_rebuild(spark, tmp_path):
    from mondrian_olap_spark.operators import sketches

    full = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i % 37)) for i in range(200)],
        "id long, g string, v double",
    )
    a = full.filter("id < 120")
    b = full.filter("id >= 120")
    path = str(tmp_path / "hist")
    sketches.write_histogram(
        sketches.value_histogram(a, "v", 0.0, 40.0, 8, ["g"]),
        path, 0.0, 40.0, 8, ["g"],
    )
    sketches.histogram_append(b, path, "v")
    got = {
        (r.g, r.bin): r.n
        for r in sketches.read_histogram(spark, path)[0].collect()
    }
    want = {
        (r.g, r.bin): r.n
        for r in sketches.value_histogram(full, "v", 0.0, 40.0, 8, ["g"]).collect()
    }
    assert got == want  # merge == one-pass rebuild, exactly


def test_scd2_enrich_versions_and_gaps(spark):
    from datetime import datetime

    from mondrian_olap_spark.operators.events import scd2_enrich

    dim = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), datetime(2024, 1, 10), "v1"),
            (1, datetime(2024, 1, 10), datetime(2024, 1, 15), "v2"),  # gap after
            (1, datetime(2024, 1, 20), None, "v3"),  # open-ended current
        ],
        "k long, valid_from timestamp, valid_to timestamp, name string",
    )
    facts = spark.createDataFrame(
        [
            (1, 1, datetime(2023, 12, 31)),  # before first version -> NULL
            (2, 1, datetime(2024, 1, 1)),    # inclusive start boundary -> v1
            (3, 1, datetime(2024, 1, 9, 23)),
            (4, 1, datetime(2024, 1, 10)),   # exclusive end boundary -> v2
            (5, 1, datetime(2024, 1, 17)),   # coverage gap -> NULL, not stale v2
            (6, 1, datetime(2024, 2, 1)),    # open version -> v3
            (7, 99, datetime(2024, 1, 5)),   # unknown key -> NULL
        ],
        "event_id long, k long, ts timestamp",
    )
    got = {
        r.event_id: r.name_dim
        for r in scd2_enrich(facts, dim, key="k").collect()
    }
    assert got == {1: None, 2: "v1", 3: "v1", 4: "v2", 5: None, 6: "v3", 7: None}


def test_scd2_validate_dim_flags_overlaps(spark):
    """scd2_validate_dim: the scd2_enrich_stream non-overlap precondition
    made checkable — overlapping and open-ended-shadowed versions are
    flagged, clean dimensions return empty."""
    from datetime import datetime

    from mondrian_olap_spark.operators.events import scd2_validate_dim

    clean = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), datetime(2024, 1, 10), "v1"),
            (1, datetime(2024, 1, 10), None, "v2"),
        ],
        "k long, valid_from timestamp, valid_to timestamp, name string",
    )
    assert scd2_validate_dim(clean, key="k").count() == 0
    dirty = spark.createDataFrame(
        [
            # v2 starts before v1 ends → overlap
            (1, datetime(2024, 1, 1), datetime(2024, 1, 10), "v1"),
            (1, datetime(2024, 1, 5), datetime(2024, 1, 15), "v2"),
            # open-ended v1 shadows everything after it
            (2, datetime(2024, 1, 1), None, "v1"),
            (2, datetime(2024, 2, 1), None, "v2"),
        ],
        "k long, valid_from timestamp, valid_to timestamp, name string",
    )
    bad = scd2_validate_dim(dirty, key="k").collect()
    assert {(r.k, r.valid_from) for r in bad} == {
        (1, datetime(2024, 1, 5)),
        (2, datetime(2024, 2, 1)),
    }


def test_streaming_histogram_maintenance(spark, tmp_path):
    """Histogram artifact maintenance under Structured Streaming:
    foreachBatch folds each micro-batch into the persisted artifact via
    histogram_append; after the stream drains, the artifact is IDENTICAL
    to the one-pass histogram of the full input (counts compose by
    summation)."""
    from mondrian_olap_spark.operators import sketches

    rows = [Row(id=i, g="g%d" % (i % 3), v=float(i % 53)) for i in range(60)]
    staging = str(tmp_path / "hin")
    # one file per chunk -> exactly three micro-batches (an unbounded
    # file count here would outlive awaitTermination on a busy machine)
    spark.createDataFrame(rows[:20]).coalesce(1).write.json(staging)
    spark.createDataFrame(rows[20:40]).coalesce(1).write.mode("append").json(staging)
    spark.createDataFrame(rows[40:]).coalesce(1).write.mode("append").json(staging)
    store = str(tmp_path / "hist_store")

    def fold(batch_df, batch_id):
        import os
        if not os.path.exists(store):
            sketches.write_histogram(
                sketches.value_histogram(batch_df, "v", 0.0, 60.0, 12, ["g"]),
                store, 0.0, 60.0, 12, ["g"],
            )
        else:
            sketches.histogram_append(batch_df, store, "v")

    stream = (spark.readStream.schema("id long, g string, v double")
              .option("maxFilesPerTrigger", 1).json(staging))
    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", str(tmp_path / "hckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300), "stream did not drain in time"
    got = {(r.g, r.bin): r.n
           for r in sketches.read_histogram(spark, store)[0].collect()}
    want = {(r.g, r.bin): r.n
            for r in sketches.value_histogram(
                spark.createDataFrame(rows), "v", 0.0, 60.0, 12, ["g"]
            ).collect()}
    assert got == want


def test_url_dedup_and_web_curation_chain(spark):
    from mondrian_olap_spark.operators import web

    body = "the wonderful excellent documentation and paragraphs with onward text " * 5
    rows = [
        # three tracking variants of ONE page -> one survivor (min id)
        (1, "https://a.ex.com/page?utm_source=x", body + "alpha"),
        (2, "https://A.EX.COM/page?utm_medium=y", body + "alpha"),
        (3, "https://a.ex.com/page/", body + "alpha"),
        # distinct page, same host
        (4, "https://a.ex.com/other", body + "beta"),
        # different host
        (5, "https://b.ex.com/p", body + "gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    dd = {r.doc_id: r.url_copies for r in web.url_dedup(df).collect()}
    assert dd == {1: 3, 4: 1, 5: 1}
    out = web.curate_web_corpus(df, max_per_host=1)
    kept = sorted(r.doc_id for r in out.collect())
    # host cap 1 keeps one doc per host from the deduped survivors
    assert len(kept) == 2 and 5 in kept and kept[0] in (1, 4)


def test_value_histogram_extreme_outliers_no_overflow(spark):
    """An extreme outlier (1e20) must clamp into the end bin, not blow up
    the integer cast under ANSI mode."""
    from mondrian_olap_spark.operators import sketches

    df = spark.createDataFrame(
        [(1, 1e20), (2, -1e20), (3, 5.0), (4, float("nan"))],
        "id long, v double",
    )
    counts = {r.bin: r.n for r in sketches.value_histogram(df, "v", 0.0, 10.0, 4).collect()}
    # 1e20 clamps into the top bin, -1e20 into bin 0, 5.0 in bin 2;
    # NaN is dropped like NULL (not a value in the range — counting it
    # in the top bin would silently skew high quantiles)
    assert counts == {3: 1, 0: 1, 2: 1}


def test_lsh_parameters_tuning(spark):
    from mondrian_olap_spark.operators.dedup import lsh_parameters

    p = lsh_parameters(0.8, max_hashes=64)
    # the chosen S-curve inflects near the target threshold
    assert abs(p["inflection"] - 0.8) < 0.15
    assert p["kwargs"] == {"num_hashes": p["num_hashes"], "bands": p["bands"]}
    assert p["num_hashes"] == p["bands"] * p["rows"] <= 64
    # a lower threshold moves the inflection down
    p5 = lsh_parameters(0.5, max_hashes=64)
    assert p5["inflection"] < p["inflection"]
    # weighting false negatives shifts the curve left (earlier catch)
    pfn = lsh_parameters(0.8, max_hashes=64, fn_weight=10.0)
    assert pfn["inflection"] <= p["inflection"] + 1e-9
    assert pfn["fn_area"] <= p["fn_area"] + 1e-12
    import pytest as _p
    with _p.raises(ValueError):
        lsh_parameters(1.5)


def test_line_stats_append_equals_rebuild(spark, tmp_path):
    from mondrian_olap_spark.operators.text import (
        line_dedup,
        line_dedup_with_stats,
        line_stats_append,
        write_line_stats,
    )

    rows = [
        (i, "cookie banner\nunique %d\nfooter" % i) for i in range(10)
    ]
    full = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "ls")
    write_line_stats(full.filter("doc_id < 6"), path)
    line_stats_append(full.filter("doc_id >= 6"), path)
    # artifact counts == one-pass counts
    stats = {r.line: r.doc_freq for r in spark.read.parquet(path).collect()}
    assert stats["cookie banner"] == 10 and stats["footer"] == 10
    # cleaning a probe against the artifact == direct line_dedup truth
    probe = full.filter("doc_id % 3 = 0")
    got = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
        for r in line_dedup_with_stats(probe, path, 3).collect()
    }
    want = {
        r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
        for r in line_dedup(full, 3).collect()
        if r.doc_id % 3 == 0
    }
    assert got == want
    with pytest.raises(ValueError):
        line_dedup_with_stats(probe, path, 0)


def test_scd2_enrich_stream_matches_batch(spark, tmp_path):
    from datetime import datetime

    from mondrian_olap_spark.operators.events import (
        scd2_enrich,
        scd2_enrich_stream,
    )

    dim = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), datetime(2024, 1, 10), 11),
            (1, datetime(2024, 1, 10), datetime(2024, 1, 15), 12),
            (1, datetime(2024, 1, 20), None, 13),
            (2, datetime(2024, 1, 5), None, 21),
        ],
        "k long, valid_from timestamp, valid_to timestamp, tier int",
    )
    facts = spark.createDataFrame(
        [
            (1, 1, datetime(2024, 1, 2)),
            (2, 1, datetime(2024, 1, 12)),
            (3, 1, datetime(2024, 1, 17)),  # gap
            (4, 1, datetime(2024, 2, 1)),
            (5, 2, datetime(2024, 1, 6)),
            (6, 3, datetime(2024, 1, 6)),  # unknown key
        ],
        "event_id long, k long, ts timestamp",
    )
    batch = {
        r.event_id: r.tier_dim
        for r in scd2_enrich(facts, dim, key="k", value_cols=["tier"]).collect()
    }
    src = tmp_path / "scd2_stream"
    facts.write.json(str(src))
    stream = spark.readStream.schema(facts.schema).json(str(src))
    q = (
        scd2_enrich_stream(stream, dim, key="k", value_cols=["tier"])
        .select("event_id", "tier_dim")
        .writeStream.format("memory")
        .queryName("scd2_stream_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r.event_id: r.tier_dim
            for r in spark.sql("select * from scd2_stream_out").collect()
        }
    finally:
        q.stop()
    assert streamed == batch == {1: 11, 2: 12, 3: None, 4: 13, 5: 21, 6: None}


def test_canonical_url_idempotent_over_url_matrix(spark):
    """canon(canon(x)) == canon(x) — THE canonicalization invariant —
    over a combinatorial matrix of scheme/case/userinfo/port/path/query/
    fragment variants plus unparseable garbage."""
    from itertools import product

    from mondrian_olap_spark.operators import web

    schemes = ["http", "HTTPS", "ftp"]
    auths = ["Ex.COM", "user:pw@a.b.Example.co.uk:443", "h9.ex.com:8080", "EX.com:80"]
    paths = ["", "/", "//a//b/", "/p/q", "/p/"]
    queries = ["", "?utm_source=1", "?b=2&a=1&gclid=x", "?ref&z=1&z=0"]
    frags = ["", "#frag"]
    urls = [
        f"{s}://{a}{p}{q}{f}"
        for s, a, p, q, f in product(schemes, auths, paths, queries, frags)
    ] + ["", "   ", "not a url", "x:y", "http:/half", "://nohost", "a b c"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = web.canonicalize_urls(df, "url", output="c1")
    twice = web.canonicalize_urls(once, "c1", output="c2")
    bad = twice.filter("c1 IS DISTINCT FROM c2").collect()
    assert not bad, [(r.url, r.c1, r.c2) for r in bad[:5]]


def test_perceptron_empty_and_degenerate_training(spark):
    """Empty or single-class training frames converge immediately to a
    sane model instead of erroring (the guard matters for sampled
    training pipelines where a stratum can come up empty)."""
    from mondrian_olap_spark.operators.text import (
        score_with_perceptron,
        train_quality_perceptron,
    )

    empty = spark.createDataFrame([], "doc_id long, label int, text string")
    m = train_quality_perceptron(empty, hashed_buckets=16, iterations=3)
    assert m["bias"] == 0 and all(w == 0 for w in m["weights"])
    assert m["history"] == [0]  # converged on the spot
    # all-negative labels: zero-weight model already classifies them
    neg = spark.createDataFrame(
        [(i, 0, "some words here") for i in range(5)],
        "doc_id long, label int, text string",
    )
    m2 = train_quality_perceptron(neg, hashed_buckets=16, iterations=5)
    assert m2["history"][-1] == 0
    scored = score_with_perceptron(neg, m2)
    assert scored.filter("prediction = 1").count() == 0


def test_fsio_tiny_df_single_slice_roundtrip(spark, tmp_path):
    """fsio.tiny_df builds sidecar frames on ONE slice: a params-sized
    write must produce a single partition (one task, one file — not
    defaultParallelism Python-RDD slices whose coalesce(1) serializes a
    Python-worker round-trip per slice), with rows and schema identical
    to the plain createDataFrame form."""
    from mondrian_olap_spark import fsio

    rows = [(7, 3), (9, 1)]
    df = fsio.tiny_df(spark, rows, "m_bits long, k int")
    assert df.rdd.getNumPartitions() == 1
    ref = spark.createDataFrame(rows, "m_bits long, k int")
    assert df.schema == ref.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, ref.collect()))
    path = str(tmp_path / "params")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    # exactly one data file — the sidecar stays a single small parquet
    import glob
    assert len(glob.glob(path + "/part-*")) == 1
