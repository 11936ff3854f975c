"""Structured Streaming tests: windowed aggregation with watermark + the
cache-invalidation sink (file source, availableNow trigger — deterministic
and bounded)."""

import json

import pytest
from pyspark.sql import functions as F

from mondrian_olap_spark.query import Query
from mondrian_olap_spark.star import engine_from_parquet
from mondrian_olap_spark.streaming import invalidate_cache_on_update, windowed_aggregate
from mondrian_olap_spark.tpch import SCHEMA

from .conftest import SF_DIR

EVENTS_SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "part1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def event_stream(spark, tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:50", "user_id": 2, "event_type": "click", "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 00:01:10", "user_id": 1, "event_type": "view", "value": 3.0},
        {"event_id": 4, "ts": "2024-01-01 00:02:30", "user_id": 3, "event_type": "click", "value": 4.0},
    ]
    src = tmp_path / "src"
    _write_events(src, rows)
    return spark.readStream.schema(EVENTS_SCHEMA).json(str(src))


def test_windowed_aggregate_tumbling(event_stream, spark, tmp_path):
    agg = windowed_aggregate(
        event_stream,
        "ts",
        "1 minute",
        [F.count("*").alias("n"), F.sum("value").alias("sum_value")],
        group_cols=["event_type"],
        watermark="5 minutes",
    )
    # complete mode: append would emit only watermark-closed windows, and a
    # bounded availableNow run ends before the 5-minute watermark passes
    q = (
        agg.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {
        (r["window_start"].strftime("%H:%M"), r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    assert rows[("00:00", "click")] == (2, 3.0)
    assert rows[("00:01", "view")] == (1, 3.0)
    assert rows[("00:02", "click")] == (1, 4.0)


def test_cache_invalidation_sink(event_stream, spark, tmp_path):
    eng = engine_from_parquet(spark, SCHEMA, "Sales", SF_DIR)
    eng.enable_cache()
    Query(eng).columns("[Measures].[Sum Qty]").rows("[Customer].children").execute().df.collect()
    assert len(eng.cache) == 1

    q = invalidate_cache_on_update(
        event_stream, eng, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q.awaitTermination(60)
    # new fact data arrived -> cache flushed (query_test.rb:1162-1213: the
    # reference needs a manual flush; the sink automates it)
    assert len(eng.cache) == 0


def test_session_window_aggregate(spark, tmp_path):
    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:30", "user_id": 1, "event_type": "click", "value": 2.0},
        # > 1 min gap -> new session for user 1
        {"event_id": 3, "ts": "2024-01-01 00:05:00", "user_id": 1, "event_type": "click", "value": 3.0},
        {"event_id": 4, "ts": "2024-01-01 00:00:10", "user_id": 2, "event_type": "view", "value": 4.0},
    ]
    src = tmp_path / "sess_src"
    _write_events(src, rows)
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))

    from mondrian_olap_spark.streaming.stateful import session_aggregate

    agg = session_aggregate(
        stream, "ts", "1 minute",
        [F.count("*").alias("n"), F.sum("value").alias("sum_value")],
        group_cols=["user_id"],
    )
    q = (
        agg.writeStream.format("memory").queryName("sess_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {(r["user_id"], r["n"]): r["sum_value"]
           for r in spark.sql("SELECT * FROM sess_test").collect()}
    assert got[(1, 2)] == 3.0   # first session: two events within the gap
    assert got[(1, 1)] == 3.0   # second session after >1min silence
    assert got[(2, 1)] == 4.0


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState custom operator: totals accumulate across
    micro-batches (two source files -> two batches with maxFilesPerTrigger)."""
    src = tmp_path / "state_src"
    _write_events(src, [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:10", "user_id": 1, "event_type": "click", "value": 2.0},
    ])
    with open(src / "part2.json", "w") as f:
        f.write(json.dumps({"event_id": 3, "ts": "2024-01-01 00:01:00", "user_id": 1,
                            "event_type": "click", "value": 4.0}) + "\n")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    from mondrian_olap_spark.streaming.stateful import stateful_running_totals

    out = stateful_running_totals(
        stream.withColumn("key", F.col("event_type")), "key", "value"
    )
    q = (
        out.writeStream.format("memory").queryName("state_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "state_ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = [
        (r["batch_events"], r["total_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM state_test").collect()
    ]
    # two micro-batches (file order is nondeterministic): whichever came
    # second must show state carried across batches
    assert len(rows) == 2
    final = max(rows, key=lambda t: t[1])
    assert final[1] == 3 and final[2] == 7.0


def test_maintain_aggregate(spark, tmp_path):
    """Streaming summary maintenance: micro-batches of fact rows merge into
    a grain summary; a second batch updates (not duplicates) existing keys."""
    from mondrian_olap_spark.streaming.maintenance import maintain_aggregate

    eng = engine_from_parquet(spark, SCHEMA, "Sales", SF_DIR)
    fact = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    half1 = fact.filter(F.col("l_orderkey") % 2 == 0)
    half2 = fact.filter(F.col("l_orderkey") % 2 == 1)
    src = tmp_path / "fact_stream"
    summary = str(tmp_path / "nation_summary")
    ckpt = str(tmp_path / "ckpt")
    half1.write.parquet(str(src), mode="overwrite")

    stream = spark.readStream.schema(fact.schema).parquet(str(src))
    q = maintain_aggregate(
        eng, stream, ["[Customer].[Nation]"], ["Sum Qty"], summary, ckpt
    )
    q.awaitTermination(120)

    from mondrian_olap_spark.streaming.maintenance import read_summary

    def summary_totals():
        return {
            r["nation_name"]: r["sum_qty"]
            for r in read_summary(spark, summary).collect()
        }

    def expected(df):
        eng2 = engine_from_parquet(spark, SCHEMA, "Sales", SF_DIR)
        eng2.tables = {**dict(eng2.tables), "lineitem": df}
        from mondrian_olap_spark.star import CubeEngine
        e = CubeEngine(eng2.cube, eng2.tables)
        return {
            (r["nation_name"]): r["sum_qty"]
            for r in Query(e)
            .columns("[Measures].[Sum Qty]")
            .rows("[Customer].[Nation].Members")
            .execute()
            .df.collect()
        }

    assert summary_totals() == expected(half1)
    # summary registered for routing
    assert any(t[1] == ["region_name", "nation_name"] for t in eng.aggregate_tables)

    # second batch arrives → merged totals equal the full-fact aggregate
    half2.write.parquet(str(src), mode="append")
    q2 = maintain_aggregate(
        eng, spark.readStream.schema(fact.schema).parquet(str(src)),
        ["[Customer].[Nation]"], ["Sum Qty"], summary, ckpt,
    )
    q2.awaitTermination(120)
    assert summary_totals() == expected(fact)


def test_streaming_exact_dedup(spark, tmp_path):
    """Watermark-bounded exact dedup: duplicate text within the horizon is
    dropped; distinct texts pass (streaming/dedup.py)."""
    import json

    from mondrian_olap_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01T00:00:00", "doc_id": 1, "text": "alpha beta"},
        {"ts": "2024-01-01T00:00:10", "doc_id": 2, "text": "alpha beta"},
        {"ts": "2024-01-01T00:00:20", "doc_id": 3, "text": "gamma delta"},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("ts timestamp, doc_id long, text string")
        .json(str(src))
    )
    out = streaming_exact_dedup(stream, event_time_col="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_exact_stream")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_exact_stream").collect()}
    assert 3 in got and len(got & {1, 2}) == 1  # one of the dups survives


def test_streaming_neardup_filter(spark, tmp_path):
    """Cross-batch MinHash/LSH filter: a later batch's near-duplicate of an
    accepted doc is rejected via the band store; novel docs pass."""
    import json

    from mondrian_olap_spark.streaming.dedup import streaming_neardup_filter

    base = "the quick brown fox jumps over the lazy dog again and again today"
    novel = "completely different content about parquet shuffles and broadcast joins"
    src = tmp_path / "nd_src"
    src.mkdir()
    accepted_batches = []

    def sink(df):
        accepted_batches.append([r["doc_id"] for r in df.collect()])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    # batch 1: the base doc
    (src / "b1.json").write_text(json.dumps({"doc_id": 1, "text": base}))
    q = streaming_neardup_filter(
        stream,
        store_path=str(tmp_path / "nd_store"),
        checkpoint_dir=str(tmp_path / "nd_ckpt"),
        threshold=0.5,  # one changed word in a 13-word doc ⇒ J ≈ 0.57
        accept_sink=sink,
    )
    try:
        q.processAllAvailable()
        # batch 2: a near-dup (one word changed) + a novel doc
        (src / "b2.json").write_text(
            json.dumps({"doc_id": 2, "text": base.replace("today", "tonight")})
            + "\n"
            + json.dumps({"doc_id": 3, "text": novel})
        )
        q.processAllAvailable()
    finally:
        q.stop()
    flat = [i for b in accepted_batches for i in b]
    assert 1 in flat and 3 in flat and 2 not in flat


def test_streaming_text_pipeline_operators(spark, tmp_path):
    """The expression-only text operators (quality filter, token counts,
    PII redaction) run UNCHANGED on streaming frames — no UDFs, no state,
    pure projections, so the same code covers batch and streams (the
    Structured Streaming contract for stateless transforms)."""
    import json

    from mondrian_olap_spark.operators import text

    src = tmp_path / "textstream_src"
    src.mkdir()
    rows = [
        {"doc_id": 1, "text": (
            "the quick brown fox jumps over the lazy dog and then the dog "
            "sleeps all of the day while the fox keeps running to the woods "
            "contact me at someone@example.com for details about the story"
        )},
        {"doc_id": 2, "text": "tiny"},
    ]
    (src / "a.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    out = text.redact_pii(text.with_token_counts(text.quality_filter(stream)))
    q = (
        out.writeStream.format("memory")
        .queryName("text_stream")
        .option("checkpointLocation", str(tmp_path / "text_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM text_stream").collect()}
    assert got[1]["keep"] is True and got[2]["keep"] is False
    assert got[2]["drop_reason"] == "too_short"
    assert "<EMAIL>" in got[1]["redacted"]
    assert got[1]["n_tokens_ws"] > got[1]["n_tokens_ws"] * 0 and got[1]["n_tokens_bpe"] >= got[1]["n_tokens_ws"]


def test_interval_join_stream_stream(spark, tmp_path):
    from mondrian_olap_spark.streaming import interval_join

    clicks = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:20:00", "user_id": 1, "event_type": "click", "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 00:00:00", "user_id": 2, "event_type": "click", "value": 3.0},
    ]
    purchases = [
        # in lookback of clicks 1 and 2 for user 1
        {"event_id": 10, "ts": "2024-01-01 00:30:00", "user_id": 1, "event_type": "purchase", "value": 9.0},
        # user 2's click is 61 min earlier — outside the 30-min lookback
        {"event_id": 11, "ts": "2024-01-01 01:01:00", "user_id": 2, "event_type": "purchase", "value": 8.0},
    ]
    csrc, psrc = tmp_path / "clicks", tmp_path / "purch"
    _write_events(csrc, clicks)
    _write_events(psrc, purchases)
    cs = spark.readStream.schema(EVENTS_SCHEMA).json(str(csrc))
    ps = spark.readStream.schema(EVENTS_SCHEMA).json(str(psrc))
    joined = interval_join(
        ps, cs.select("user_id", "ts", "value"),
        key="user_id", lookback="30 minutes",
    )
    q = (
        joined.writeStream.format("memory").queryName("ij_test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from ij_test").collect()
    # purchase 10 matches clicks at 00:00 and 00:20; purchase 11 matches none
    got = {(r["event_id"], r["value_right"]) for r in rows}
    assert got == {(10, 1.0), (10, 2.0)}
    # every match carries the right-side timestamp for downstream max()
    assert all(r["ts_right"] is not None for r in rows)


def test_enrich_with_dimension_stream_static(spark, tmp_path):
    from pyspark.sql import Row

    from mondrian_olap_spark.streaming import enrich_with_dimension

    events = [
        {"event_id": 1, "ts": "2024-01-01 00:00:00", "user_id": 1, "event_type": "click", "value": 1.0},
        {"event_id": 2, "ts": "2024-01-01 00:00:30", "user_id": 2, "event_type": "view", "value": 2.0},
        {"event_id": 3, "ts": "2024-01-01 00:01:00", "user_id": 9, "event_type": "view", "value": 3.0},
    ]
    src = tmp_path / "ev"
    _write_events(src, events)
    dim = spark.createDataFrame(
        [Row(user_id=1, segment="paid"), Row(user_id=2, segment="free")]
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(str(src))
    out = enrich_with_dimension(stream, dim, on="user_id")
    q = (
        out.writeStream.format("memory").queryName("enrich_test")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = {r["event_id"]: r["segment"] for r in spark.sql("select * from enrich_test").collect()}
    assert rows == {1: "paid", 2: "free", 3: None}  # left join keeps unmatched


def test_parse_props_composes_with_streams(spark, tmp_path):
    """parse_props is a pure projection (explicit-schema from_json), so it
    composes with readStream → windowed aggregation unchanged."""
    from mondrian_olap_spark.operators.events import parse_props

    rows = [
        {"event_id": 1, "ts": "2024-01-01 00:00:10", "user_id": 1,
         "event_type": "click", "value": 1.0, "props": '{"k": 10}'},
        {"event_id": 2, "ts": "2024-01-01 00:00:20", "user_id": 2,
         "event_type": "click", "value": 2.0, "props": '{"k": 32}'},
        {"event_id": 3, "ts": "2024-01-01 00:00:30", "user_id": 3,
         "event_type": "view", "value": 3.0, "props": "garbage"},
    ]
    src = tmp_path / "src"
    _write_events(src, rows)
    stream = spark.readStream.schema(EVENTS_SCHEMA + ", props STRING").json(str(src))
    parsed = parse_props(stream, {"k": "int"})
    assert parsed.isStreaming
    agg = parsed.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"), F.count("*").alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("props_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_props"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = {r["event_type"]: (r["sum_k"], r["n"])
           for r in spark.sql("SELECT * FROM props_test").collect()}
    assert out == {"click": (42, 2), "view": (None, 1)}  # garbage → NULL k


def test_streaming_curation_composition(spark, tmp_path):
    """The curation stages compose on a STREAM: quality filter (stateless
    expression projection) + exact dedup (watermark-free bounded-backfill
    variant) in one streaming plan — the ingest-side counterpart of
    pipeline.curate_corpus."""
    import json as _json

    from mondrian_olap_spark.operators.text import quality_filter
    from mondrian_olap_spark.streaming.dedup import streaming_exact_dedup

    good = ("the quantum computer calculates enormous matrices during "
            "the evening session while patient researchers monitor "
            "the thermal sensors recording voltage readings across "
            "the silicon wafers inside sealed chambers throughout winter")
    rows = [
        {"doc_id": 1, "text": good},
        {"doc_id": 2, "text": good},        # exact dup → dropped by dedup
        {"doc_id": 3, "text": "x y"},       # too_short → dropped by rules
        {"doc_id": 4, "text": good + " with unique additional closing material"},
    ]
    src = tmp_path / "docs_src"
    src.mkdir(parents=True)
    with open(src / "p1.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    curated = streaming_exact_dedup(quality_filter(stream).filter("keep"))
    assert curated.isStreaming
    q = (
        curated.select("doc_id", "quality_score")
        .writeStream.format("memory")
        .queryName("stream_curation")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cur"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM stream_curation").collect()
    assert {r["doc_id"] for r in out} == {1, 4}
    assert all(r["quality_score"] is not None for r in out)


def test_streaming_curated_partitioned_parquet_sink(spark, tmp_path):
    """End-to-end streaming ingest artifact: curated stream → native
    partitioned parquet sink (writeStream.partitionBy + checkpoint), the
    streaming counterpart of pipeline.write_curated."""
    import json as _json
    import os

    from mondrian_olap_spark.operators.sampling import assign_splits
    from mondrian_olap_spark.operators.text import quality_filter
    from mondrian_olap_spark.streaming.dedup import streaming_exact_dedup

    good = ("the quantum computer calculates enormous matrices during "
            "the evening session while patient researchers monitor "
            "the thermal sensors recording voltage readings across "
            "the silicon wafers inside sealed chambers throughout winter")
    src = tmp_path / "sink_src"
    src.mkdir(parents=True)
    with open(src / "p1.json", "w") as f:
        for i in range(6):
            f.write(_json.dumps(
                {"doc_id": i, "text": f"{good} closing variant {i}"}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, text STRING").json(str(src))
    curated = assign_splits(
        streaming_exact_dedup(quality_filter(stream).filter("keep")),
        {"train": 0.5, "test": 0.5},
    ).select("doc_id", "text", "split")
    dst = tmp_path / "sink_out"
    q = (
        curated.writeStream.format("parquet")
        .partitionBy("split")
        .option("path", str(dst))
        .option("checkpointLocation", str(tmp_path / "ckpt_sink"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    dirs = {d for d in os.listdir(dst) if d.startswith("split=")}
    assert dirs  # at least one split materialized as a directory
    back = spark.read.parquet(str(dst))
    assert back.count() == 6
    # hash splits are layout-independent: the batch assignment agrees
    batch = {r["doc_id"]: r["split"] for r in assign_splits(
        spark.read.schema("doc_id LONG, text STRING").json(str(src)),
        {"train": 0.5, "test": 0.5}).collect()}
    assert {r["doc_id"]: r["split"] for r in back.collect()} == batch


def test_streaming_cms_accumulates_across_microbatches(spark, tmp_path):
    """The streaming count-min sketch genuinely maintains state across
    micro-batches (maxFilesPerTrigger=1 over 4 files -> >= 4 batches,
    asserted from query progress) and the complete-mode result equals
    the batch sketch cell-for-cell."""
    from mondrian_olap_spark.operators import text

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 5} delta") for i in range(400)],
        "doc_id long, text string",
    )
    staging = str(tmp_path / "staging")
    docs.repartition(4).write.parquet(staging)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    q = (
        text.cms_sketch(stream, width=32, depth=3)
        .writeStream.format("memory")
        .queryName("cms_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(q.recentProgress) >= 4, "expected one micro-batch per file"
    got = sorted(map(tuple, spark.table("cms_stream_test").collect()))
    want = sorted(map(tuple, text.cms_sketch(docs, width=32, depth=3).collect()))
    assert got == want
