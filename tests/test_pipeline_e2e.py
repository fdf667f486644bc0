"""End-to-end training-data curation pipeline: the round-5 proof that the
operator family COMPOSES — quality-classifier gating → duplicate-span
removal → exact dedup → MinHash near-dup clustering → benchmark
decontamination → stratified sampling → sequence packing, on the real
documents table, deterministic across runs."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from cnosdb_spark.operators import curation, dedup, quality_model, text
from cnosdb_spark.session import read_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def corpus(spark):
    return read_table(spark, SF_DIR, "documents")


def _run_pipeline(spark, corpus):
    counts = {"input": corpus.count()}

    # 1. model-based quality gate, bootstrapped from the heuristic score
    #    (top third = positive seed, bottom third = negative — the CCNet
    #    weak-label trick when no hand-curated seed corpus exists)
    scored = text.with_text_stats(corpus, "text").select("doc_id", "text", "quality_score")
    cuts = scored.agg(
        F.percentile("quality_score", F.lit(2 / 3)).alias("hi"),
        F.percentile("quality_score", F.lit(1 / 3)).alias("lo"),
    ).first()
    pos = scored.filter(F.col("quality_score") >= cuts["hi"])
    neg = scored.filter(F.col("quality_score") <= cuts["lo"])
    model = quality_model.train_quality_classifier(pos, neg, num_features=512)
    gated = quality_model.filter_by_quality(corpus, model, threshold=0.3)
    counts["quality_gated"] = gated.count()

    # 2. cut exact duplicate spans (license blocks / templated passages)
    cleaned = dedup.remove_duplicate_spans(gated, "text", "doc_id", k=8).drop(
        "n_tokens_removed", "n_spans_removed", "quality_prob"
    )

    # 3. exact document dedup (normalized md5, keep-min-id)
    keep_exact = dedup.exact_dedup(cleaned, "text", "doc_id").select("doc_id")
    deduped = cleaned.join(keep_exact, "doc_id", "left_semi")
    counts["exact_deduped"] = deduped.count()

    # 4. near-dup clusters via MinHash LSH → keep canonical ids only
    pairs = dedup.minhash_lsh_pairs(deduped, "text", "doc_id")
    clusters = dedup.resolve_duplicate_clusters(
        deduped.select(F.col("doc_id").alias("_id")), pairs, "_id"
    )
    canon = clusters.filter("is_canonical").select(F.col("id").alias("doc_id"))
    near_deduped = deduped.join(canon, "doc_id", "left_semi")
    counts["near_deduped"] = near_deduped.count()

    # 5. benchmark decontamination (8-gram probe against a fake eval set
    #    drawn FROM the corpus so hits are guaranteed)
    bench = corpus.orderBy("doc_id").limit(3).select("text")
    decon = curation.decontaminate(near_deduped, bench, "text", "doc_id")
    clean = near_deduped.join(
        decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi"
    )
    counts["decontaminated"] = clean.count()

    # 6. deterministic stratified sample (domain rebalancing)
    fracs = {f"src{i}": (1.0 if i % 2 else 0.5) for i in range(20)}
    sampled = curation.stratified_sample(clean, "source", fracs)
    counts["sampled"] = sampled.count()

    # 7. pack into fixed-capacity training sequences
    manifest = curation.pack_chunks(
        sampled.select("doc_id", "n_chars"), "n_chars", capacity=4096, shards=4
    )
    counts["packed_bins"] = manifest.select("shard", "bin").distinct().count()
    return counts, manifest


def test_pipeline_composes_and_reduces(spark, corpus):
    counts, manifest = _run_pipeline(spark, corpus)
    # every stage keeps a usable corpus while strictly never growing it
    assert (
        counts["input"]
        >= counts["quality_gated"]
        >= counts["exact_deduped"]
        >= counts["near_deduped"]
        >= counts["decontaminated"]
        >= counts["sampled"]
        > 0
    )
    # decontamination must have removed the planted benchmark docs
    assert counts["decontaminated"] < counts["near_deduped"]
    assert counts["packed_bins"] > 0
    # packing invariant: every closed bin is exactly at capacity
    closed = (
        manifest.groupBy("shard", "bin")
        .agg(F.sum("slice_len").alias("fill"))
        .withColumn(
            "is_last",
            F.col("bin") == F.max("bin").over(Window.partitionBy("shard")),
        )
        .filter(~F.col("is_last"))
        .collect()
    )
    assert closed and all(r["fill"] == 4096 for r in closed)


def test_pipeline_deterministic(spark, corpus):
    c1, _ = _run_pipeline(spark, corpus)
    c2, _ = _run_pipeline(spark, corpus)
    assert c1 == c2


def test_tokenize_pack_export_chain(spark, corpus, tmp_path):
    """Round-7 terminal stages compose: BPE token counts feed
    pack_sequences' budgeting, the packed corpus exports through
    shuffle_export, and the invariants survive the chain:
    total exported rows == packed docs, token totals agree between the
    packing layout and the exported data, and the manifest verifies."""
    from cnosdb_spark.operators import tokenizer
    from cnosdb_spark.operators.curation import (
        pack_sequences,
        shuffle_export,
        verify_export,
    )

    docs = corpus.limit(400).select("doc_id", "text")
    model = tokenizer.train_bpe(
        tokenizer.word_counts(docs, "text", min_count=2, max_words=5000),
        n_merges=80,
    )
    counted = tokenizer.bpe_token_count(docs, model["merges"], "text")
    packed = pack_sequences(counted, "n_bpe_tokens", capacity=2048, shards=4)
    layout = (
        packed.withColumnRenamed("shard", "pack_shard")
        .join(counted.select("doc_id", "n_bpe_tokens"), "doc_id")
    )

    path = str(tmp_path / "export")
    # export refuses to clobber an existing 'shard' column
    with pytest.raises(ValueError, match="shuffle_export writes its own"):
        shuffle_export(packed, path, shards=8)
    manifest = shuffle_export(layout, path, shards=8)
    assert manifest.agg(F.sum("n_rows")).first()[0] == packed.count()
    assert all(r["ok"] for r in verify_export(spark, path).collect())

    # token conservation: the exported data carries the same total token
    # mass the packing laid out
    exported = spark.read.parquet(path)
    assert (
        exported.agg(F.sum("n_bpe_tokens")).first()[0]
        == counted.filter(F.col("n_bpe_tokens") > 0).agg(F.sum("n_bpe_tokens")).first()[0]
    )
    # per-shard streams are internally consistent: within a (pack) shard,
    # seq_start is strictly increasing in (md5, id) order and equals the
    # running token sum
    for pshard in {r["shard"] for r in packed.select(F.col("shard")).collect()}:
        part = (
            packed.filter(F.col("shard") == pshard)
            .join(counted.select("doc_id", "n_bpe_tokens"), "doc_id")
            .orderBy("seq_start")
            .collect()
        )
        run = 0
        for r in part:
            assert r["seq_start"] == run
            run += r["n_bpe_tokens"]
