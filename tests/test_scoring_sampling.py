"""Oracle-checked tests for the corpus-scoring (TF-IDF / BM25 / unigram
LM) and deterministic-sampling (stratified / mixture / SemDeDup)
pipeline operators, at sf0.001 for the heavy token explodes and sf0.01
where cheap."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cnosdb_spark.operators import curation, scoring, similarity
from cnosdb_spark.session import read_table

from .conftest import SF_SMOKE
from .oracle import compare

# DuckDB mirror of operators.text normalize+tokens (lockstep with the
# text_quality_stats fingerprint/BPE oracle arms).
_TOKS = "string_split_regex(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"
_DT = f"""
    doc_terms AS (
        SELECT doc_id AS _doc, term, CAST(count(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id, unnest({_TOKS}) AS term
            FROM documents WHERE trim(text) <> ''
        )
        GROUP BY doc_id, term
    )
"""


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    for name in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'"
        )
    yield con
    con.close()


def test_tf_idf_topk_oracle(spark, duck_smoke):
    docs = read_table(spark, SF_SMOKE, "documents")
    got = scoring.tf_idf_topk_terms(docs, k=3)
    want = duck_smoke.execute(
        f"""
        WITH {_DT},
        df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM doc_terms GROUP BY term),
        n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM documents),
        scored AS (
            SELECT _doc, doc_terms.term, tf,
                   tf * (ln((1 + _n) / (1 + df)) + 1) AS tfidf
            FROM doc_terms JOIN df_t ON doc_terms.term = df_t.term CROSS JOIN n
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY _doc ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored
        )
        SELECT _doc AS doc_id, term, tf, round(tfidf, 6) AS tfidf, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 3
        """
    ).df()
    errs = compare(got, want, "tf_idf_topk")
    assert not errs, "\n".join(errs)


def test_bm25_oracle(spark, duck_smoke):
    terms = ["the", "data", "time"]
    docs = read_table(spark, SF_SMOKE, "documents")
    got = scoring.bm25_scores(docs, terms)
    tlist = ", ".join(f"'{t}'" for t in terms)
    want = duck_smoke.execute(
        f"""
        WITH {_DT},
        qt AS (SELECT * FROM doc_terms WHERE term IN ({tlist})),
        lens AS (
            SELECT doc_id AS _doc,
                   CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END AS DOUBLE) AS dl
            FROM documents
        ),
        n AS (SELECT CAST(count(*) AS BIGINT) AS _n FROM documents),
        avgdl AS (SELECT avg(dl) AS _avgdl FROM lens),
        df_t AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM qt GROUP BY term),
        scored AS (
            SELECT qt._doc,
                   ln(1 + (_n - df + 0.5) / (df + 0.5))
                     * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / _avgdl)) AS _s
            FROM qt
            JOIN df_t ON qt.term = df_t.term
            JOIN lens ON qt._doc = lens._doc
            CROSS JOIN n CROSS JOIN avgdl
        )
        SELECT _doc AS doc_id, round(sum(_s), 6) AS bm25 FROM scored GROUP BY _doc
        """
    ).df()
    errs = compare(got, want, "bm25")
    assert not errs, "\n".join(errs)


def test_unigram_lm_oracle(spark, duck_smoke):
    docs = read_table(spark, SF_SMOKE, "documents")
    got = scoring.unigram_lm_scores(docs, add_k=0.5)
    want = duck_smoke.execute(
        f"""
        WITH {_DT},
        counts AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cw FROM doc_terms GROUP BY term),
        tot AS (SELECT CAST(sum(cw) AS BIGINT) AS _t, CAST(count(*) AS BIGINT) AS _v FROM counts),
        scored AS (
            SELECT _doc, tf, tf * log10((cw + 0.5) / (_t + 0.5 * _v)) AS _lp
            FROM doc_terms JOIN counts ON doc_terms.term = counts.term CROSS JOIN tot
        ),
        per_doc AS (
            SELECT _doc, CAST(sum(tf) AS BIGINT) AS n_tokens, sum(_lp) AS _lp_sum
            FROM scored GROUP BY _doc
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
               round(p._lp_sum / p.n_tokens, 6) AS lm_logprob
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p._doc
        """
    ).df()
    errs = compare(got, want, "unigram_lm")
    assert not errs, "\n".join(errs)

    # higher-probability tokens ⇒ score closer to 0; garbled text lowest
    rows = {r["doc_id"]: r["lm_logprob"] for r in got.collect()}
    assert all(v is None or v < 0 for v in rows.values())


_FRAC = (
    "(('0x' || substring(md5('{salt}|' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT"
    " / 4294967296.0)"
)


def test_stratified_sample_oracle(spark, duck):
    fr = {"src0": 0.25, "src1": 1.0, "src2": 0.5}
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    got = curation.stratified_sample(docs, "source", fr, salt="s1").select(
        "doc_id", "source"
    )
    frac = _FRAC.format(salt="s1")
    want = duck.execute(
        f"""
        SELECT doc_id, source FROM documents
        WHERE {frac} < CASE source
            WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 1.0 WHEN 'src2' THEN 0.5
            ELSE 0.0 END
        """
    ).df()
    errs = compare(got, want, "stratified_sample")
    assert not errs, "\n".join(errs)


def test_stratified_sample_is_stable_under_repartition(spark):
    fr = {"src0": 0.3}
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    a = {r[0] for r in curation.stratified_sample(docs, "source", fr).select("doc_id").collect()}
    b = {
        r[0]
        for r in curation.stratified_sample(docs.repartition(13), "source", fr)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_mixture_sample_oracle(spark, duck):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    wts = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    budget = 6_000
    got = curation.mixture_sample(
        docs, "source", wts, budget, token_col="n_chars", salt="m1"
    ).select("doc_id", "source", "n_chars")
    frac = _FRAC.format(salt="m1")
    want = duck.execute(
        f"""
        WITH rates AS (
            SELECT source,
                   least(1.0, (CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
                               WHEN 'src2' THEN 0.2 ELSE 0.0 END) * {budget}
                         / CAST(sum(n_chars) AS DOUBLE)) AS _rate
            FROM documents GROUP BY source HAVING sum(n_chars) > 0
        )
        SELECT doc_id, d.source, n_chars
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE {frac} < r._rate
        """
    ).df()
    errs = compare(got, want, "mixture_sample")
    assert not errs, "\n".join(errs)


def test_mixture_sample_respects_budget(spark):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    wts = {"src0": 0.6, "src1": 0.4}
    budget = 6_000
    out = curation.mixture_sample(docs, "source", wts, budget, token_col="n_chars")
    per = {
        r["source"]: r["tok"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("tok")).collect()
    }
    assert set(per) <= set(wts)
    # each stratum lands within hash-sampling noise of its allocation
    # (or is kept whole when smaller than the allocation)
    for s, wt in wts.items():
        alloc = wt * budget
        assert per[s] < alloc * 1.35


def test_semantic_dedup_oracle_properties(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = similarity.ivf_centroids(emb, "embedding", n_centroids=4)
    out = similarity.semantic_dedup(emb, cents, threshold=0.9).cache()
    n = emb.count()
    assert out.count() == n  # one verdict per vector
    kept = out.filter("is_kept")
    dropped = out.filter("NOT is_kept")
    # every dropped vector's dup_of is a KEPT-or-dropped lower id in the
    # same cluster with cosine >= threshold
    a = dropped.alias("d").join(
        out.alias("o"), F.col("d.dup_of") == F.col("o.vec_id")
    )
    bad = a.filter(F.col("d.cluster") != F.col("o.cluster")).count()
    assert bad == 0
    assert dropped.filter(F.col("dup_of") >= F.col("vec_id")).count() == 0
    # verify cosines: join vectors back for a sample of dropped rows
    vecs = emb.select(
        F.col("vec_id").alias("_i"), F.col("embedding").cast("array<double>").alias("_v")
    )
    pairs = (
        dropped.limit(50)
        .join(vecs, F.col("vec_id") == F.col("_i"))
        .withColumnRenamed("_v", "_va")
        .drop("_i")
        .join(vecs, F.col("dup_of") == F.col("_i"))
        .withColumnRenamed("_v", "_vb")
    )
    viol = pairs.filter(
        similarity.cosine_expr(F.col("_va"), F.col("_vb")) < 0.9
    ).count()
    assert viol == 0
    out.unpersist()


def test_semantic_dedup_removes_planted_duplicate(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    # plant an exact duplicate of the min-id vector under a new max id
    first = emb.orderBy("vec_id").limit(1)
    top = emb.agg(F.max("vec_id")).collect()[0][0]
    dup = first.select(
        (F.lit(top) + 1).alias("vec_id"), "embedding", "label"
    )
    cents = similarity.ivf_centroids(emb, "embedding", n_centroids=4)
    out = similarity.semantic_dedup(emb.unionByName(dup), cents, threshold=0.999)
    row = out.filter(F.col("vec_id") == top + 1).collect()[0]
    assert not row["is_kept"]
    assert row["dup_of"] == first.collect()[0]["vec_id"]


_PACK_ORDER = (
    "md5('pack|' || CAST(doc_id AS VARCHAR)) AS _h, "
    "CAST(('0x' || substring(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 4))::UBIGINT % 8 AS INT) AS _shard"
)


def test_pack_sequences_oracle(spark, duck):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    got = curation.pack_sequences(docs, "n_chars", 4096, shards=8)
    want = duck.execute(
        f"""
        WITH d AS (
            SELECT doc_id, CAST(n_chars AS BIGINT) AS t, {_PACK_ORDER}
            FROM documents WHERE n_chars > 0
        ),
        s AS (
            SELECT doc_id, _shard AS shard, t,
                   coalesce(sum(t) OVER (PARTITION BY _shard ORDER BY _h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seq_start
            FROM d
        )
        SELECT doc_id, shard, seq_start,
               CAST(floor(seq_start / 4096.0) AS BIGINT) AS first_bin,
               CAST(floor((seq_start + t - 1) / 4096.0) AS BIGINT) AS last_bin,
               CAST(floor((seq_start + t - 1) / 4096.0) - floor(seq_start / 4096.0) + 1 AS BIGINT) AS n_bins
        FROM s
        """
    ).df()
    errs = compare(got, want, "pack_sequences")
    assert not errs, "\n".join(errs)


def test_pack_chunks_reconstruct(spark):
    """Every closed bin holds exactly `capacity` tokens; every document's
    slices cover it exactly once; chunks are contiguous inside each bin."""
    cap = 4096
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    chunks = curation.pack_chunks(docs, "n_chars", cap, shards=8).cache()
    # per-document coverage: slices tile [0, n_chars)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.sum("slice_len").alias("covered"),
            F.min("slice_start").alias("lo"),
        )
        .join(docs.select("doc_id", "n_chars"), "doc_id")
    )
    assert per_doc.filter("covered <> n_chars OR lo <> 0").count() == 0
    # per-bin capacity: all bins except each shard's last are exactly full
    per_bin = chunks.groupBy("shard", "bin").agg(F.sum("slice_len").alias("fill"))
    last_bins = per_bin.groupBy("shard").agg(F.max("bin").alias("bin"))
    closed = per_bin.join(last_bins, ["shard", "bin"], "left_anti")
    assert closed.filter(F.col("fill") != cap).count() == 0
    chunks.unpersist()


def test_pack_sequences_stable_under_repartition(spark):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    a = sorted(curation.pack_sequences(docs, "n_chars", 2048).collect())
    b = sorted(
        curation.pack_sequences(docs.repartition(17), "n_chars", 2048).collect()
    )
    assert a == b


def test_cap_per_stratum_oracle(spark, duck):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    got = curation.cap_per_stratum(docs, "source", "n_chars", 5).select(
        "doc_id", "source", "n_chars"
    )
    want = duck.execute(
        """
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id ASC) AS rk
            FROM documents
        ) WHERE rk <= 5
        """
    ).df()
    errs = compare(got, want, "cap_per_stratum")
    assert not errs, "\n".join(errs)


def test_cap_per_stratum_plan_has_group_limit(spark):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    out = curation.cap_per_stratum(docs, "source", "n_chars", 5)
    p = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "WindowGroupLimit" in p  # partial top-k before the exchange


def test_chunk_documents_oracle(spark, duck_smoke):
    from cnosdb_spark.operators import text as text_ops

    docs = read_table(spark, SF_SMOKE, "documents")
    got = text_ops.chunk_documents(docs, chunk_tokens=64, overlap=16)
    want = duck_smoke.execute(
        f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n
            FROM documents WHERE trim(text) <> ''
        ),
        c AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(0, CAST(greatest(ceil((n - 16) / 48.0) - 1, 0) AS BIGINT))) AS chunk_id
            FROM t
        )
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
               CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS BIGINT) AS n_chunk_tokens,
               array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ') AS chunk_text
        FROM c
        """
    ).df()
    errs = compare(got, want, "chunk_documents")
    assert not errs, "\n".join(errs)


def test_chunk_documents_coverage_and_overlap(spark):
    from cnosdb_spark.operators import text as text_ops

    docs = read_table(spark, SF_SMOKE, "documents")
    chunks = text_ops.chunk_documents(docs, chunk_tokens=50, overlap=10).cache()
    toks = docs.select(
        "doc_id",
        F.size(text_ops.tokens(text_ops.normalize(F.col("text")))).alias("n"),
    ).filter("n > 0")
    # token-count identity: sum of chunk tokens = n + overlap * (chunks-1)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("tot"), F.count(F.lit(1)).alias("k")
    )
    bad = (
        per_doc.join(toks, "doc_id")
        .filter(F.col("tot") != F.col("n") + 10 * (F.col("k") - 1))
        .count()
    )
    assert bad == 0
    # every chunk except possibly the last per doc is exactly 50 tokens
    w_last = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last_id"))
    full = chunks.join(w_last, "doc_id").filter(
        (F.col("chunk_id") != F.col("last_id")) & (F.col("n_chunk_tokens") != 50)
    )
    assert full.count() == 0
    chunks.unpersist()


def test_shuffle_export_deterministic_and_verifiable(spark, tmp_path):
    from cnosdb_spark.operators.curation import shuffle_export, verify_export
    from cnosdb_spark.session import read_table

    docs = read_table(spark, "/root/testdata/sf0.01", "documents").select("doc_id", "text").limit(500)
    p1, p2 = str(tmp_path / "exp1"), str(tmp_path / "exp2")
    m1 = shuffle_export(docs, p1, shards=8)
    m2 = shuffle_export(docs.repartition(13), p2, shards=8)

    # layout-independent: identical manifests under any input partitioning
    a = {r["shard"]: (r["n_rows"], r["content_hash"]) for r in m1.collect()}
    b = {r["shard"]: (r["n_rows"], r["content_hash"]) for r in m2.collect()}
    assert a == b
    assert sum(n for n, _ in a.values()) == 500
    assert set(a) == set(range(8))
    # hash-uniform: no shard dominates (8 shards, 500 rows)
    counts = [n for n, _ in a.values()]
    assert max(counts) < 3 * min(counts)

    # within-shard row order is deterministic too (not just the multiset)
    r1 = spark.read.parquet(p1 + "/shard=3").collect()
    r2 = spark.read.parquet(p2 + "/shard=3").collect()
    assert [r["doc_id"] for r in r1] == [r["doc_id"] for r in r2]

    ok = verify_export(spark, p1)
    assert all(r["ok"] for r in ok.collect())

    # tamper: drop a shard's files → verify flags exactly that shard
    import shutil

    shutil.rmtree(p1 + "/shard=5")
    bad = {r["shard"]: r["ok"] for r in verify_export(spark, p1).collect()}
    assert bad[5] is False and bad[3] is True
