"""Plan-shape regression guards: the scale properties the engine promises
(pushdown, pruning, broadcast dims, top-k without global sort) must be
visible in the physical plan — a correct-but-mis-planned query is a bug."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from .conftest import SF_DIR

QUERIES = entry_mod.queries()


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_q1_filter_pushdown_and_partial_agg(spark):
    p = _plan(spark, "tpch_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert "partial_sum" in p  # map-side combine before the exchange
    # column pruning: o_orderkey etc. not read; scan schema is the 7 used cols
    assert "l_comment" not in p


def _hints(spark, name: str) -> str:
    """Analyzed logical plan — where join-strategy hints are still visible."""
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().analyzed().toString()


def test_q3_topk_and_no_pinned_broadcast(spark):
    p = _plan(spark, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject(limit=10" in p  # no global sort for top-N
    # scale guard: customer and orders grow O(SF) — the query must carry NO
    # forced-broadcast hint (AQE picks broadcast at small SF, shuffle at 100×)
    h = _hints(spark, "tpch_q3_shipping_priority")
    assert "ResolvedHint" not in h and "UnresolvedHint" not in h


def test_q5_hints_only_fixed_dims(spark):
    # region (5 rows) and the region⋈nation product (≤25 rows) are
    # constant at every SF — those two hints are safe; anything more pins
    # a plan that dies at 100×
    h = _hints(spark, "tpch_q5_local_supplier")
    assert h.count("ResolvedHint") + h.count("UnresolvedHint") == 2
    p = _plan(spark, "tpch_q5_local_supplier")
    # with the static auto-broadcast threshold OFF (session.py), every
    # BroadcastExchange in the INITIAL plan must come from an explicit
    # provably-bounded hint: region into the r⋈n join, then r⋈n into the
    # customer join.  A third would be a statically-committed
    # estimate-based broadcast — the irreversible misplan class that
    # broadcast the pruned lineitem fact table in r09.
    assert p.count("BroadcastExchange") == 2
    # the bounded-dim broadcasts keep customer un-shuffled by nationkey
    # (AQE upgrades the O(SF)-side joins at runtime instead)
    assert "Exchange hashpartitioning(c_nationkey" not in p


def test_topk_is_take_ordered(spark):
    p = _plan(spark, "topk_bottom_values")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # selectors must not global-sort


def test_tumbling_window_single_shuffle(spark):
    p = _plan(spark, "time_window_tumbling")
    assert p.count("Exchange hashpartitioning") == 1
    assert "partial_count" in p


def test_scan_reads_only_needed_columns(spark):
    p = _plan(spark, "sessionization")
    assert "ReadSchema" in p
    # events has 6 columns; sessionization needs only ts + user_id
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and len(m.group(1).split(",")) == 2


def test_count_pushdown_reaches_parquet_scan(spark):
    """SURVEY §2 row 2 (AggregateFilterTskvExec count pushdown): with the
    session's parquet.aggregatePushdown on, a bare COUNT(*) must be
    answered from parquet footer statistics, not a row scan.  Aggregate
    pushdown exists only on the DSv2 reader, so the test pins BOTH halves:
    the v2 plan carries PushedAggregation, and the result matches the
    v1-path count."""
    from .conftest import SF_DIR

    path = f"{SF_DIR}/lineitem.parquet"
    want = spark.read.parquet(path).count()
    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(path).groupBy().count()
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "PushedAggregation: [COUNT(*)]" in p, p
        assert df.first()[0] == want
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)


def test_sign_lsh_similarity_no_nested_loop(spark):
    """Both sign-LSH arms (near-dup candidates AND bucketed top-k) must
    come from band/bucket equi-joins, never an all-pairs
    BroadcastNestedLoopJoin (the O(n²) plan at 100 TB)."""
    p = _plan(spark, "sign_lsh_similarity")
    assert "BroadcastNestedLoopJoin" not in p


def test_ngram_jaccard_has_doc_freq_guard(spark):
    """The stop-shingle document-frequency ceiling must appear in the plan:
    a second aggregate keyed on the shingle (doc-freq) feeding the join."""
    p = _plan(spark, "ngram_jaccard_pairs")
    assert "BroadcastNestedLoopJoin" not in p
    assert "partial_count" in p  # doc-freq ceiling aggregate present


def test_cluster_resolution_lineage_bounded(spark):
    """Iterative min-label propagation must checkpoint each round: the
    final plan must not contain the whole join-per-iteration chain."""
    from cnosdb_spark.operators import dedup
    from pyspark.sql import functions as F

    ids = spark.range(0, 200).select(F.col("id"))
    pairs = spark.range(0, 199).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )  # one long chain → many propagation rounds
    out = dedup.resolve_duplicate_clusters(ids, pairs, "id", max_iterations=8)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # a checkpointed plan scans the materialized RDD — no joins remain
    assert "Join" not in plan
    assert "Scan ExistingRDD" in plan


def test_tf_idf_broadcasts_scalar_not_corpus(spark):
    """The doc-count scalar must ride a BroadcastExchange; the (doc, term)
    table must aggregate with map-side combine before its exchange."""
    from cnosdb_spark.operators import scoring
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    out = scoring.tf_idf_topk_terms(docs, k=3)
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastExchange" in p
    assert "partial_count" in p
    # the only nested-loop join allowed is the one-row doc-count scalar
    # riding its broadcast (keyless join against a 1-row aggregate)
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_mixture_sample_rates_broadcast(spark):
    """Per-stratum rates join must be a broadcast hash join (the rates
    side is one row per stratum), so the plan stays scan→join→filter."""
    from cnosdb_spark.operators import curation
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    out = curation.mixture_sample(
        docs, "source", {"src0": 0.6, "src1": 0.4}, 6000, token_col="n_chars"
    )
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastHashJoin" in p


def test_stratified_sample_no_shuffle(spark):
    """Deterministic hash sampling is a pure filter: no exchange at all."""
    from cnosdb_spark.operators import curation
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    out = curation.stratified_sample(docs, "source", {"src0": 0.5})
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in p


def test_semantic_dedup_joins_on_cluster(spark):
    """Within-cluster comparison must be an equi-join on the cluster id —
    never a BroadcastNestedLoopJoin over all pairs."""
    from cnosdb_spark.operators import similarity
    from cnosdb_spark.session import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = similarity.ivf_centroids(emb, "embedding", n_centroids=4)
    out = similarity.semantic_dedup(emb, cents, threshold=0.95)
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "BroadcastNestedLoopJoin" not in p


def test_chunk_documents_is_narrow(spark):
    """Chunking is a narrow map: tokenize → posexplode → slice, with no
    exchange — at 100 TB it parallelizes embarrassingly over input splits."""
    from cnosdb_spark.operators import text as text_ops
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    out = text_ops.chunk_documents(docs, 64, 16)
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in p


def test_asof_range_join_row_no_cartesian(spark):
    """The driver row composes asof_join (union+window, no join node) and
    the bucketized range join (equi-join) — no nested loop anywhere."""
    p = _plan(spark, "asof_range_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_scoring_sampling_row_plan(spark):
    """Every nested-loop in this row is a ONE-ROW scalar broadcast (the
    permissible shape): tfidf carries the corpus count (1), bm25 carries
    n_docs + avgdl (2), and the unigram-LM subtree carries its T/V totals
    — duplicated under the union because lm_ntok and lm_lp both read it
    (2). Anything beyond that bound means a data-sized side slipped into
    a nested loop. Stratified arm: a pure filter, no join at all."""
    p = _plan(spark, "scoring_sampling")
    assert "BroadcastExchange" in p
    assert p.count("BroadcastNestedLoopJoin") <= 5
    assert "CartesianProduct" not in p
    assert "partial_count" in p  # map-side combine on the (doc,term) agg


def test_broadcast_subtree_scan_handles_left_branch_prefix():
    """Regression (round-7 ADVICE): Spark tree strings prefix left-branch
    children with ':' at a fixed column, so a leading-SPACE depth measure
    saw the child at the same depth as its parent and broke the subtree
    scan immediately — a lineitem under ':- BroadcastExchange' was missed
    and the 'never broadcast the fact table' assert was vacuous."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_scale",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "bench_scale.py"),
    )
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)

    # left-branch broadcast whose child sits under the ':' column — the
    # exact shape the old leading-space measure could not see into
    plan = "\n".join([
        "*(5) BroadcastHashJoin [o_orderkey], [l_orderkey], Inner",
        ":- BroadcastExchange HashedRelationBroadcastMode",
        ":  +- *(2) Filter isnotnull(l_orderkey)",
        ":     +- FileScan parquet lineitem[l_orderkey]",
        "+- *(4) Sort [o_orderkey ASC]",
        "   +- FileScan parquet orders[o_orderkey]",
    ])
    assert bs.broadcast_subtree_contains(plan, "lineitem")
    assert not bs.broadcast_subtree_contains(plan, "orders")

    # sibling AFTER the broadcast subtree ends must not count
    plan2 = "\n".join([
        "*(5) BroadcastHashJoin [n_nationkey], [c_nationkey], Inner",
        ":- BroadcastExchange HashedRelationBroadcastMode",
        ":  +- FileScan parquet nation[n_nationkey]",
        "+- FileScan parquet lineitem[l_orderkey]",
    ])
    assert not bs.broadcast_subtree_contains(plan2, "lineitem")

    # a broadcast abandoned by AQE in the '== Initial Plan ==' section
    # must not count against the final plan
    plan3 = plan2 + "\n== Initial Plan ==\n" + plan
    assert not bs.broadcast_subtree_contains(plan3, "lineitem")


def test_word_counts_single_keyed_agg(spark):
    """BPE's corpus pass must be one partial→final keyed aggregation —
    one exchange, map-side combine before it."""
    from cnosdb_spark.operators import tokenizer
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    p = tokenizer.word_counts(docs, "text", min_count=2)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "partial_count" in p  # map-side combine
    assert p.count("Exchange") == 1
    assert "Join" not in p


def test_bpe_encode_is_narrow(spark):
    """Encoding is a pure map over a broadcast rank dict — no exchange,
    no join; it parallelizes over input splits at any corpus size."""
    from cnosdb_spark.operators import tokenizer
    from cnosdb_spark.session import read_table

    docs = read_table(spark, SF_DIR, "documents")
    model = tokenizer.train_bpe([("aab", 5), ("abab", 3)], n_merges=4)
    p = tokenizer.bpe_encode(docs, model["merges"], "text")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in p
    assert "Join" not in p
    assert "ArrowEvalPython" in p or "MapInPandas" in p  # Arrow batch, not row UDF


def test_refine_centroids_assignment_joinless(spark):
    """Lloyd assignment must stay a pure column expression — no join
    against a centroid table, no nested loop; the only exchanges are the
    k*dim-row aggregation ones."""
    from pyspark.sql import functions as F

    from cnosdb_spark.operators import similarity
    from cnosdb_spark.session import read_table

    emb = read_table(spark, SF_DIR, "embeddings").limit(200)
    cents = [r["embedding"] for r in emb.limit(3).collect()]
    v = F.col("_v")
    src = emb.select(F.col("embedding").cast("array<double>").alias("_v"))
    sims = [similarity.cosine_expr(v, F.array(*[F.lit(float(x)) for x in c])) for c in cents]
    assigned = src.select(
        (F.array_position(F.array(*sims), F.array_max(F.array(*sims))) - 1).alias("_c")
    )
    p = assigned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Join" not in p
    assert "Exchange" not in p
