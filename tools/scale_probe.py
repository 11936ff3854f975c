#!/usr/bin/env python
"""10× scale probe: materialise sf1 parquet (sf0.1 × 10 replicas with
shifted keys, referential integrity preserved) and run the headline star +
pipeline entries against it, cold and warm.

No sf1 exists in /root/testdata (checked every round), so this generates it
under the repo: ``python tools/scale_probe.py [--generate-only]``.
Prints one JSON line with per-query cold/warm seconds; results are recorded
in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/scale_sf1")
REPLICAS = 10

#: key columns shifted per replica (offset chosen far above sf0.1 max so
#: replica key ranges never collide); every foreign key shifts by the same
#: offset as its primary key, preserving referential integrity
KEY_OFFSETS = {
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "c_custkey": 10_000_000,
    "o_custkey": 10_000_000,
    "s_suppkey": 10_000_000,
    "l_suppkey": 10_000_000,
    "p_partkey": 10_000_000,
    "l_partkey": 10_000_000,
    "event_id": 100_000_000,
    "doc_id": 10_000_000,
    "vec_id": 10_000_000,  # embeddings
}

#: dims whose cardinality is bounded at any data scale — NOT replicated
#: (10× data means 10× fact rows per nation, not 10× nations)
BOUNDED = {"region", "nation"}

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

QUERIES = [
    # star/OLAP headline
    "flagship_region_quarter",
    "pricing_summary_flags",
    "crossjoin_nation_priority",
    "rollup_region_nation",
    "distinct_count_by_region",
    "topcount_nations",
    "ytd_monthly",
    "virtual_sales_orders",
    "drillthrough_cell",
    # pipeline/dedup/ANN headline
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "text_quality_features",
    "embed_cosine_topk",
    "embed_ivf_topk",
    "pipeline_split_counts",
    # round-4 additions
    "events_sessionization",
    "text_chunking",
    "text_repetition_features",
    "pipeline_split_contamination",
    # round-5 additions
    "events_asof_attribution",
    "events_funnel_steps",
    "events_retention_weekly",
    "text_segment_dedup",
    "text_unigram_entropy",
    "pipeline_mix_weights",
    "embed_lsh_neardup_pairs",
    "pipeline_token_packing",
    "text_tfidf_top_terms",
    "text_inverted_index",
    "pipeline_pack_concat",
    "pipeline_mix_applied",
    "events_props_json_stats",
    "embed_quantization_report",
    "pipeline_skew_profile",
    "pipeline_end_to_end_curation",
    "text_bigram_entropy",
    "text_kl_from_corpus",
    "dedup_source_overlap",
    # incremental-ingestion + profiling operators (NOTE: the two gate
    # entries keep their oracle-replayable fixed knobs — at sf1 the
    # 2046-bit bloom is saturated by design; production sizing comes from
    # bloom_parameters(n, fp) and is probed separately in SCALE.md)
    "dedup_incremental_bloom",
    "dedup_incremental_neardup",
    "text_normalize_gate",
    "pipeline_column_profile",
    "events_daily_anomaly",
    "events_user_sequences",
    "pipeline_length_deciles",
    "text_cdc_chunks",
    "text_script_profile",
    "sketch_distinct_rollup",
    "text_repeated_segments_removed",
    "filter_member_property_gate",
    "pipeline_incremental_curation",
    "text_tokens_to_ids",
    "embed_pq_codes",
    "embed_pq_topk",
    "text_mojibake_gate",
    "events_inter_event_stats",
    "pipeline_negative_samples",
    "text_blocklist_filter",
    "text_doc_keywords",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from mondrian_olap_spark.star import read_parquet_table

    os.makedirs(DST, exist_ok=True)
    for t in TABLES:
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        df = read_parquet_table(spark, f"{SRC}/{t}.parquet")
        if t in BOUNDED:
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for i in range(REPLICAS):
            rep = df
            for col in df.columns:
                if col in KEY_OFFSETS:
                    rep = rep.withColumn(
                        col, F.col(col) + F.lit(i * KEY_OFFSETS[col])
                    )
            if t == "documents" and i > 0:
                # shift the text too: replicas are near-dup corpora, not
                # byte-identical ones — keeps dedup pair growth realistic
                # (intra-replica pairs dominate) instead of a degenerate
                # 10-way all-equal explosion
                rep = rep.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica{i}"))
                )
            if t == "embeddings" and i > 0:
                # same rationale as documents: nudge one component so
                # replica vectors are near-dups (cosine ≈ 1) rather than
                # byte-identical — realistic near-dup growth, no degenerate
                # 10-way exact-dup buckets
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when(
                            j == 0, x + F.lit(0.001 * i)
                        ).otherwise(x).cast("float"),
                    ),
                )
            parts.append(rep)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"generated {t}: {u.count()} rows", file=sys.stderr)


def main() -> None:
    from pyspark.sql import SparkSession

    import mondrian_olap_spark.suite_pipeline  # noqa: F401
    from mondrian_olap_spark import suite, tpch
    from mondrian_olap_spark.suite import QUERIES as Q

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark)
    if "--generate-only" in sys.argv:
        return

    queries = QUERIES
    if "--only" in sys.argv:
        queries = sys.argv[sys.argv.index("--only") + 1].split(",")

    # per-class split sizing, same rationale as bench.py
    PIPE = ("dedup_", "embed_", "text_", "pipeline_", "multimodal_")

    def tune(name):
        small = name.startswith(PIPE)
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes",
            str((4 if small else 128) * 1024 * 1024),
        )

    def flush():
        suite._STATEMENTS.clear()
        for eng in tpch._ENGINES.values():
            eng.flush_schema_cache()
        spark.catalog.clearCache()

    Q["flagship_region_quarter"](spark, DST).collect()  # JVM warm-up
    cold, warm = {}, {}
    for name in queries:
        tune(name)
        flush()
        t0 = time.perf_counter()
        n = len(Q[name](spark, DST).collect())
        cold[name] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        Q[name](spark, DST).collect()
        warm[name] = round(time.perf_counter() - t0, 2)
        print(f"{name}: cold {cold[name]}s warm {warm[name]}s rows {n}",
              file=sys.stderr)
    print(json.dumps({
        "sf": 1.0, "replicas": REPLICAS, "cold": cold, "warm": warm,
        "cold_total": round(sum(cold.values()), 2),
        "warm_total": round(sum(warm.values()), 2),
    }))


if __name__ == "__main__":
    main()
