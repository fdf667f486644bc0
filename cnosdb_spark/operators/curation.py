"""Corpus-curation operators for large-scale training-data pipelines:
benchmark decontamination, deterministic dataset splits, PII redaction,
repetition (boilerplate) quality signals, and cross-document paragraph
dedup / boilerplate stripping.

Not part of the reference surface (CnosDB is a TSDB); these extend the
engine's LLM-pipeline family (dedup.py, text.py, similarity.py). All are
pure built-in-function plans — no Python UDFs — and deterministic, so
they are DuckDB-differential-testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import word_ngrams
from .text import normalize, tokens


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs that share any word
    ``n``-gram with a benchmark/eval set (the industry-standard 8-gram
    overlap rule for held-out-set leakage).

    Scale shape: the benchmark n-gram set is small relative to the corpus
    (eval suites are MBs, the corpus is TBs) — it is deduplicated and
    BROADCAST, so the corpus-side probe is a map-side hash join: the
    corpus shingle table is never shuffled, and only matched (doc,
    shingle) rows reach the per-doc count aggregation. Docs shorter than
    ``n`` words shingle to their whole text (word_ngrams semantics), so
    short benchmark prompts still match verbatim copies.

    Output: (id_col, matched_ngrams BIGINT, contaminated BOOLEAN) — one
    row per corpus doc, zero-match docs included.
    """
    bench_text_col = bench_text_col or text_col
    corpus_sh = corpus.select(
        F.col(id_col).alias("_id"), tokens(normalize(F.col(text_col))).alias("_toks")
    ).select("_id", F.explode(word_ngrams(F.col("_toks"), n)).alias("_sh"))
    bench_sh = (
        benchmark.select(tokens(normalize(F.col(bench_text_col))).alias("_toks"))
        .select(F.explode(word_ngrams(F.col("_toks"), n)).alias("_sh"))
        .distinct()
    )
    matched = (
        corpus_sh.join(F.broadcast(bench_sh), "_sh")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
    )
    return (
        corpus.select(F.col(id_col).alias("_id"))
        .join(matched, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("matched_ngrams"), F.lit(0)).alias("matched_ngrams"),
            (F.coalesce(F.col("matched_ngrams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def split_dataset(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash: bucket = first 8 hex digits of md5(salt || id) as a fraction of
    2^32, assigned to the first split whose cumulative weight exceeds it.

    Pure column expression — no shuffle, no RNG state, stable across
    re-runs and partitionings (the property a 100 TB pipeline needs:
    re-processing a shard cannot move a doc between splits). Weights are
    normalized; iteration order of the dict fixes the cumulative order.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    frac = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(1 << 32))
    )
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = frac < F.lit(cum)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


# PII patterns kept to syntax valid in both Java regex (Spark) and RE2
# (DuckDB): no backreferences, no lookaround. Redaction order matters —
# emails first (they contain dots/digits), then IPs, then phone numbers.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d\s().-]{7,}\d\b", "<PHONE>"),
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """PII redaction: replace emails, IPv4 addresses, and phone-like digit
    runs with typed placeholders; emit per-category match counts. Each
    category is counted on the text with the PREVIOUS categories already
    redacted, so the digits inside an email or IP are not double-counted
    as a phone.

    Pure column expressions (chained ``regexp_replace``) — a narrow map at
    any scale, no shuffle. Patterns are deliberately conservative
    (precision over recall): a curation pipeline scrubs obvious
    identifiers; entity-level NER is out of scope for a SQL engine.
    """
    # counts run against the PROGRESSIVELY redacted text, mirroring the
    # redaction chain: digits inside an already-redacted email/IP can't
    # also be counted as a phone
    red = F.col(text_col)
    counts = []
    for name, (pat, placeholder) in PII_PATTERNS.items():
        counts.append(
            F.coalesce(F.regexp_count(red, F.lit(pat)), F.lit(0)).alias(f"n_{name}")
        )
        red = F.regexp_replace(red, pat, placeholder)
    return df.select("*", *counts, red.alias(out_col))


def _nonblank(parts: Column) -> Column:
    # NOT `F.transform(parts, F.trim)`: F.trim has an optional second
    # parameter (the trim-character set), so transform's arity sniffing
    # passes the ELEMENT INDEX there — trimming each part of its index
    # digits instead of whitespace. A 1-arg lambda pins the intent.
    return F.filter(F.transform(parts, lambda x: F.trim(x)), lambda x: x != "")


def _char_sum(parts: Column) -> Column:
    return F.aggregate(
        parts, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText quality
    rules): fraction of duplicate lines and paragraphs, by count and by
    character mass. High values indicate boilerplate, scraped navigation,
    or degenerate generations.

    Lines split on single newlines, paragraphs on blank-line runs; blank
    segments are excluded from both numerator and denominator. All four
    ratios are pure array expressions over one pass of the text — no
    shuffle, no UDF, whole-stage codegen end to end.
    """
    t = F.col(text_col)

    def frac_pair(parts: Column, prefix: str) -> list[Column]:
        distinct = F.array_distinct(parts)
        n, nd = F.size(parts), F.size(distinct)
        chars, chars_d = _char_sum(parts), _char_sum(distinct)
        dup_frac = F.when(n > 0, (n - nd) / n).otherwise(0.0)
        dup_char_frac = F.when(chars > 0, (chars - chars_d) / chars).otherwise(0.0)
        return [
            dup_frac.cast("double").alias(f"dup_{prefix}_frac"),
            dup_char_frac.cast("double").alias(f"dup_{prefix}_char_frac"),
        ]

    lines = _nonblank(F.split(t, r"\n"))
    paras = _nonblank(F.split(t, r"\n{2,}"))
    return df.select("*", *frac_pair(lines, "line"), *frac_pair(paras, "para"))


def duplicate_paragraphs(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document paragraph-level dedup detector: normalized-paragraph
    hashes that occur in at least ``min_docs`` distinct documents —
    the candidate boilerplate set (site chrome, license headers, nav bars).

    Scale shape: explode to (hash, doc) then ONE keyed aggregation —
    count + approx doc-count per hash; no joins, no all-pairs. Output:
    (par_hash, n_docs, n_occurrences, example) sorted nowhere (caller
    orders if needed).
    """
    paras = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(_nonblank(F.split(F.col(text_col), r"\n{2,}"))).alias("_p"),
    ).select("_id", F.md5(normalize(F.col("_p"))).alias("par_hash"), "_p")
    return (
        paras.groupBy("par_hash")
        .agg(
            F.countDistinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("_p").alias("example"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Remove cross-document boilerplate paragraphs (those flagged by
    ``duplicate_paragraphs``) from every document, preserving original
    paragraph order, and report how much was removed.

    Scale shape: paragraphs are exploded WITH position, left-joined
    against the boilerplate hash set to mark keeps (a keyed shuffle join —
    the boilerplate set can be large, so no broadcast is assumed; AQE
    broadcasts it when small), then ONE groupBy per document computes the
    position-sorted reassembly AND both counts together (``collect_list``
    skips the NULLed-out dropped paragraphs), and one final join restores
    paragraph-less documents. Three keyed shuffles on uniform keys; the
    corpus text is exploded/hashed twice (once to derive the boilerplate
    set, once to rebuild) — persist the exploded frame upstream if the
    corpus scan dominates.
    """
    bp = (
        duplicate_paragraphs(corpus, text_col, id_col, min_docs)
        .select("par_hash")
        .withColumn("_bp", F.lit(True))
    )
    paras = corpus.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_nonblank(F.split(F.col(text_col), r"\n{2,}"))).alias("_pos", "_p"),
    ).withColumn("par_hash", F.md5(normalize(F.col("_p"))))
    marked = paras.join(bp, "par_hash", "left")
    keep = F.col("_bp").isNull()
    rebuilt = marked.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("_pos", "_p")))
                ),
                lambda s: s["_p"],
            ),
            "\n\n",
        ).alias("text_clean"),
        F.count(F.when(keep, F.lit(1))).alias("n_paras_kept"),
        F.count(F.lit(1)).alias("n_paras_total"),
    )
    return (
        corpus.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("n_paras_kept"), F.lit(0)).alias("n_paras_kept"),
            F.coalesce(F.col("n_paras_total"), F.lit(0)).alias("n_paras_total"),
        )
    )


def _hash_frac(id_col: str, salt: str) -> Column:
    """The split_dataset hash as a uniform [0,1) fraction — deterministic,
    content-independent, identical arithmetic to the DuckDB oracle."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(1 << 32))
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id-hash
    fraction falls below the stratum's sampling rate.  The workhorse of
    domain rebalancing ("keep 10% of commoncrawl, all of wikipedia").

    Unlike ``DataFrame.sampleBy`` this is reproducible across re-runs,
    partitionings, and engines (the same md5 arithmetic runs in the DuckDB
    oracle) — at 100 TB a re-processed shard MUST make the same keep/drop
    decisions as the original run.  Pure column expression: no shuffle, no
    RNG state, filter pushes to the scan.
    """
    frac = _hash_frac(id_col, salt)
    rate = None
    for name, f in fractions.items():
        cond = F.col(stratum_col) == name
        rate = F.when(cond, float(f)) if rate is None else rate.when(cond, float(f))
    rate = F.lit(float(default_fraction)) if rate is None else rate.otherwise(
        float(default_fraction)
    )
    return df.filter(frac < rate)


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    target_weights: dict[str, float],
    budget_tokens: int,
    token_col: str,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Data-mixing sampler: downsample each stratum so the output
    approaches ``budget_tokens`` total with per-stratum token share
    proportional to ``target_weights`` (weights normalized; a stratum
    smaller than its allocation is kept whole — rate capped at 1, i.e.
    no upsampling — and absent strata contribute nothing).

    Two aggregation passes, both tiny on the reduce side: (1) per-stratum
    token totals (one row per stratum), broadcast-joined back; (2) the
    deterministic ``_hash_frac`` keep decision.  No ``.collect()`` — the
    rates live in a one-row-per-stratum broadcast, so the plan is a scan →
    broadcast join → filter at any scale.
    """
    total_w = sum(target_weights.values()) or 1.0
    alloc = None
    for name, wt in target_weights.items():
        cond = F.col(stratum_col) == name
        share = float(wt) / total_w * float(budget_tokens)
        alloc = F.when(cond, share) if alloc is None else alloc.when(cond, share)
    alloc = F.lit(0.0) if alloc is None else alloc.otherwise(0.0)
    rates = (
        df.groupBy(stratum_col)
        .agg(F.sum(F.col(token_col)).cast("double").alias("_stratum_tokens"))
        .withColumn("_alloc", alloc)
        .withColumn(
            "_rate",
            F.when(F.col("_stratum_tokens") <= 0, 0.0).otherwise(
                F.least(F.lit(1.0), F.col("_alloc") / F.col("_stratum_tokens"))
            ),
        )
        .select(stratum_col, "_rate")
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(_hash_frac(id_col, salt) < F.col("_rate"))
        .drop("_rate")
    )


def pack_sequences(
    df: DataFrame,
    token_col: str,
    capacity: int,
    id_col: str = "doc_id",
    shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Concat-then-chunk sequence packing: lay documents out in a
    deterministic pseudo-random order and cut the token stream into
    fixed-``capacity`` training sequences (bins), documents spanning bin
    boundaries — the standard LM-pretraining packing that wastes zero
    tokens to padding.

    Layout order is (shard, md5(salt|id), id): each document hashes to one
    of ``shards`` independent token streams, so packing parallelizes —
    shard count scales with the cluster, each shard's running-offset
    window is one partition of the single shuffle this op performs, and
    re-runs reproduce byte-identical bins (no RNG state, no driver
    sequencing).

    Output: one row per non-empty document — (id, shard, seq_start —
    token offset inside its shard's stream, first_bin / last_bin —
    shard-local bin ids, n_bins spanned).
    """
    t = F.col(token_col).cast("long")
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    d = (
        df.filter(t > 0)
        .withColumn("_h", h)
        .withColumn(
            "_shard",
            (F.conv(F.substring(F.col("_h"), 1, 4), 16, 10).cast("long") % shards)
            .cast("int"),
        )
    )
    w = (
        Window.partitionBy("_shard")
        .orderBy("_h", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("seq_start", F.coalesce(F.sum(t).over(w), F.lit(0)))
    first_bin = F.floor(F.col("seq_start") / capacity)
    last_bin = F.floor((F.col("seq_start") + t - 1) / capacity)
    return d.select(
        F.col(id_col),
        F.col("_shard").alias("shard"),
        "seq_start",
        first_bin.cast("long").alias("first_bin"),
        last_bin.cast("long").alias("last_bin"),
        (last_bin - first_bin + 1).cast("long").alias("n_bins"),
    )


def pack_chunks(
    df: DataFrame,
    token_col: str,
    capacity: int,
    id_col: str = "doc_id",
    shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Bin-level view of :func:`pack_sequences`: one row per (document,
    bin) it occupies, with the token slice of the document that lands in
    that bin — the manifest a training-data loader materializes sequences
    from.

    Output: (shard, bin, id, slice_start — offset inside the document,
    slice_len).  Within each (shard, bin), reading documents ordered by
    slice_start at their slice offsets reconstructs the packed sequence;
    sum(slice_len) per bin == capacity for every closed bin.
    """
    packed = pack_sequences(df, token_col, capacity, id_col, shards, salt)
    toks = df.select(
        F.col(id_col), F.col(token_col).cast("long").alias("_tok")
    )
    e = packed.join(toks, id_col).select(
        "shard",
        F.col(id_col),
        "seq_start",
        "_tok",
        F.explode(F.sequence("first_bin", "last_bin")).alias("bin"),
    )
    bin_lo = F.col("bin") * capacity
    bin_hi = bin_lo + capacity
    slice_start = F.greatest(bin_lo - F.col("seq_start"), F.lit(0))
    slice_end = F.least(bin_hi - F.col("seq_start"), F.col("_tok"))
    return e.select(
        "shard",
        "bin",
        F.col(id_col),
        slice_start.cast("long").alias("slice_start"),
        (slice_end - slice_start).cast("long").alias("slice_len"),
    )


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top-``k`` rows per stratum by score (id asc tie-break) —
    the per-domain document cap every crawl-curation pipeline applies so
    no single domain dominates the mixture.

    One window per stratum partition; Spark plans it as WindowGroupLimit
    (partial top-k BEFORE the exchange since 3.5), so the shuffle carries
    at most ``k`` rows per stratum per input partition — the same
    pre-aggregation shape a 100 TB run needs.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


# ------------------------------------------------------- shuffled export
def shuffle_export(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    shards: int = 32,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic globally-shuffled shard export — the final stage of a
    training-data pipeline: lay the curated corpus out in the same
    (shard, md5(salt|id), id) pseudo-random order pack_sequences uses and
    write one parquet directory per shard, rows in-order within the shard.

    Spark-first mechanics: ONE shuffle (repartition on the shard id — all
    rows of a shard land in exactly one task), an in-task sort, and a
    partitionBy('shard') write, so every shard directory is written by a
    single task in deterministic order; re-running on the same input
    (under ANY input partitioning) reproduces identical shard contents.
    Shard count scales with the cluster, never with the driver.

    A manifest (one row per shard: row count + order-insensitive
    xxhash64 content hash) is written to ``<path>/_manifest`` and
    returned, so downstream loaders can verify shards cheaply
    (``verify_export``) without trusting the writer.
    """
    for taken in ("shard", "_h"):
        if taken in df.columns:
            raise ValueError(
                f"shuffle_export writes its own {taken!r} column — rename the "
                f"input's {taken!r} (e.g. pack_sequences' shard → pack_shard) "
                "instead of letting it be silently overwritten"
            )
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % shards
    ).cast("int")
    laid = (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .repartition(shards, F.col("shard"))
        .sortWithinPartitions("shard", "_h", id_col)
    )
    laid.drop("_h").write.mode("overwrite").partitionBy("shard").parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    manifest = (
        written.withColumn(
            "_rh",
            # bounded per-row hash so the order-insensitive sum can never
            # overflow long (ANSI-safe) below ~2^31 rows per shard
            F.pmod(
                F.xxhash64(*[F.col(c) for c in sorted(written.columns) if c != "shard"]),
                F.lit(1 << 32),
            ),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("_rh")).alias("content_hash"),
        )
        .orderBy("shard")
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return spark.read.parquet(f"{path}/_manifest")


def verify_export(spark, path: str) -> DataFrame:
    """Recompute each shard's count + content hash from the written files
    and diff against the manifest. Returns the per-shard comparison
    (ok = everything matches) — run it before pointing a trainer at the
    export."""
    written = spark.read.parquet(path)
    actual = (
        written.withColumn(
            "_rh",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in sorted(written.columns) if c != "shard"]),
                F.lit(1 << 32),
            ),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows_actual"),
            F.sum(F.col("_rh")).alias("content_hash_actual"),
        )
    )
    manifest = spark.read.parquet(f"{path}/_manifest")
    return (
        manifest.join(actual, "shard", "full_outer")
        .select(
            "shard",
            "n_rows",
            "n_rows_actual",
            (
                F.col("n_rows").eqNullSafe(F.col("n_rows_actual"))
                & F.col("content_hash").eqNullSafe(F.col("content_hash_actual"))
            ).alias("ok"),
        )
        .orderBy("shard")
    )
