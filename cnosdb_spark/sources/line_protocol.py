"""InfluxDB line-protocol ingest adapter.

Reference: /root/reference common/protocol_parser/src/line_protocol/ (and
the api/v1/write endpoint main/src/http/http_service.rs:484). Schemaless
writes auto-create tables/columns; tags are strings, fields are
float/int/uint/bool/string, timestamp is an integer suffix.

Spark-first: parse on the driver for small payloads (HTTP request
bodies, ``lines_to_tables``) or fully distributed for bulk backfills
(``lines_to_tables_distributed``: executor-side schema discovery +
mapInPandas parse — raw text never reaches the driver); output is one
DataFrame per measurement with columns time + tags + fields ready for
Catalog.insert (which performs the schema merge / auto-create).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession, types as T

from ..schema import NS_RESIDUE_COL
from . import batch_df

_UNESCAPE = re.compile(r"\\([ ,=])")


def _split_unescaped(s: str, sep: str) -> list[str]:
    """Split on unescaped ``sep`` characters outside double quotes."""
    parts: list[str] = []
    cur: list[str] = []
    in_quotes = False
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s) and not in_quotes:
            cur.append(ch)
            cur.append(s[i + 1])
            i += 2
            continue
        if ch == '"':
            in_quotes = not in_quotes
            cur.append(ch)
        elif ch == sep and not in_quotes:
            if cur:
                parts.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur))
    return parts


def _unescape(s: str) -> str:
    return _UNESCAPE.sub(r"\1", s)


def _partition_unescaped(s: str, sep: str) -> tuple[str, str, str]:
    """str.partition at the first UNESCAPED ``sep`` — a plain partition
    splits tag/field keys containing ``\\=`` at the escape (found by the
    round-trip fuzzer, tests/test_fuzz_operators.py)."""
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            i += 2
            continue
        if s[i] == sep:
            return s[:i], sep, s[i + 1 :]
        i += 1
    return s, "", ""


def parse_field_value(raw: str):
    """Field value typing per the line-protocol spec: 10i → int, 10u → uint,
    "x" → string, t/true/f/false → bool, else float."""
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        return raw[1:-1].replace('\\"', '"'), "string"
    low = raw.lower()
    if low in ("t", "true"):
        return True, "boolean"
    if low in ("f", "false"):
        return False, "boolean"
    if raw.endswith("i"):
        return int(raw[:-1]), "bigint"
    if raw.endswith("u"):
        return int(raw[:-1]), "unsigned"
    return float(raw), "double"


def parse_lines(text: str, precision: str = "ns") -> dict[str, list[dict]]:
    """Parse line-protocol text → {measurement: [row dicts]}.

    Row dict: {"time": datetime, "<tag>": str..., "<field>": val...}.
    """
    return {k: v[0] for k, v in parse_lines_meta(text, precision).items()}


def parse_lines_meta(
    text: str, precision: str = "ns"
) -> dict[str, tuple[list[dict], set[str]]]:
    """Like parse_lines but also returns the set of tag keys per
    measurement (the parser knows which section a key came from — needed
    for schema auto-creation, where a string *field* must not become a tag)."""
    mult = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}[precision]
    out: dict[str, tuple[list[dict], set[str]]] = {}
    for lineno, line in enumerate(text.splitlines(), 1):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = _split_unescaped(line, ' ')
        if len(parts) < 2:
            raise ValueError(f"line {lineno}: expected measurement+fields[+ts]: {line!r}")
        head = parts[0]
        fields_raw = parts[1]
        ts_raw = parts[2] if len(parts) > 2 else None

        head_parts = _split_unescaped(head, ',')
        measurement = _unescape(head_parts[0])
        row: dict = {}
        rows, tagkeys = out.setdefault(measurement, ([], set()))
        for tag_kv in head_parts[1:]:
            k, _, v = _partition_unescaped(tag_kv, "=")
            key = _unescape(k)
            row[key] = _unescape(v)
            tagkeys.add(key)
        for field_kv in _split_unescaped(fields_raw, ','):
            k, _, v = _partition_unescaped(field_kv, "=")
            val, _typ = parse_field_value(v)
            row[_unescape(k)] = val
        if ts_raw is not None:
            ns = int(ts_raw) * mult
            # integer µs arithmetic: float seconds would lose ns precision
            row["time"] = datetime(1970, 1, 1) + timedelta(microseconds=ns // 1000)
            if ns % 1000:
                # sub-µs residue rides along in the hidden storage column
                # so ns-distinct points stay distinct under the LWW merge
                # (the reference keys on raw i64 ns — sqlancer/
                # repeat_write.slt expects timestamps 1..3 ns as 3 rows)
                row[NS_RESIDUE_COL] = ns % 1000
        else:
            row["time"] = datetime.now(timezone.utc).replace(tzinfo=None)
        rows.append(row)
    return out


def lines_to_dfs(spark: SparkSession, text: str, precision: str = "ns") -> dict[str, DataFrame]:
    """Line protocol → {measurement: DataFrame}."""
    return {k: df for k, (df, _tags) in lines_to_tables(spark, text, precision).items()}


def lines_to_tables(
    spark: SparkSession, text: str, precision: str = "ns"
) -> dict[str, tuple[DataFrame, set[str]]]:
    """Line protocol → {measurement: (DataFrame, tag_keys)}. Schema is
    inferred per measurement from the union of keys (schemaless semantics)."""
    parsed = parse_lines_meta(text, precision)
    out = {}
    for name, (rows, tagkeys) in parsed.items():
        seen: list[str] = []
        types: dict[str, type] = {}
        for r in rows:
            for k, v in r.items():
                if k not in seen:
                    seen.append(k)
                if not isinstance(v, bool) and isinstance(v, (int, float, str)):
                    types[k] = type(v)
                elif isinstance(v, bool):
                    types[k] = bool
        # column order = time, tags sorted, fields sorted — the reference
        # creates the table from the whole write batch with name-ordered
        # columns per group (sqlancer/repeat_write.slt:24-32: f0 precedes
        # f1 although f1 arrived first)
        keys = (
            ["time"]
            + sorted(k for k in seen if k in tagkeys)
            + sorted(k for k in seen if k != "time" and k not in tagkeys)
        )
        fields = [T.StructField("time", T.TimestampType(), False)]
        for k in keys[1:]:
            py = types.get(k, str)
            spark_t = {int: T.LongType(), float: T.DoubleType(), bool: T.BooleanType(), str: T.StringType()}[py]
            fields.append(T.StructField(k, spark_t, True))
        schema = T.StructType(fields)
        data = [tuple(r.get(k) for k in keys) for r in rows]
        out[name] = (batch_df(spark, data, schema), tagkeys)
    return out


# ----------------------------------------------------- distributed (bulk)
_SCHEMA_KIND_ORDER = {"bool": 0, "int": 1, "float": 2, "str": 3}


def discover_line_schema(lines, line_col: str = "value", precision: str = "ns"):
    """Pass 1 of the bulk path: distributed schema discovery over a
    DataFrame of raw line-protocol strings (e.g. ``spark.read.text`` over
    a backfill dump). Each partition parses its lines and emits the
    DISTINCT (measurement, key, section, type) tuples; one small keyed
    aggregation resolves column types. Returns
    {measurement: (ordered_keys, tag_keys, {key: python_type})}.

    Type conflicts across shards resolve WIDEST-WINS (bool < int < float
    < str) — deterministic under any partitioning, unlike the driver
    helper's last-line-wins (documented divergence; conflicting writes
    are schema errors upstream in the reference anyway). A key seen as a
    tag in one line and a field in another resolves TAG-WINS (tags are
    strings, so the type also widens to str) — again deterministic,
    where the driver helper keeps the last line's role."""
    import pandas as pd

    from pyspark.sql import functions as F, types as T

    out_schema = T.StructType(
        [
            T.StructField("m", T.StringType()),
            T.StructField("key", T.StringType()),
            T.StructField("is_tag", T.BooleanType()),
            T.StructField("kind", T.StringType()),
        ]
    )

    def _discover(batches):
        for pdf in batches:
            seen = set()
            for line in pdf[line_col]:
                line = (line or "").strip()
                if not line or line.startswith("#"):
                    continue
                for m, (rows, tagkeys) in parse_lines_meta(line, precision).items():
                    for r in rows:
                        for k, v in r.items():
                            # NS_RESIDUE_COL rides along as an int field —
                            # dropping it here would lose ns-distinctness
                            # under the LWW merge (driver path keeps it)
                            if k == "time":
                                continue
                            kind = (
                                "bool" if isinstance(v, bool)
                                else "int" if isinstance(v, int)
                                else "float" if isinstance(v, float)
                                else "str"
                            )
                            seen.add((m, k, k in tagkeys, kind))
            yield pd.DataFrame(
                list(seen), columns=["m", "key", "is_tag", "kind"]
            )

    dist = lines.mapInPandas(_discover, out_schema).distinct().collect()
    return _resolve_discovered(
        (r["m"], r["key"], bool(r["is_tag"]), r["kind"]) for r in dist
    )


def _resolve_discovered(tuples):
    """Shared schema resolution for the bulk paths: fold distinct
    (measurement, key, is_tag, kind) observations into
    {m: (ordered_keys, tag_keys, {key: python_type})} — widest-wins on
    type conflicts, tag-wins (and str) on tag/field role conflicts;
    deterministic under any observation order."""
    schemas: dict = {}
    for m, key, is_tag, kind in tuples:
        keys = schemas.setdefault(m, {})
        prev = keys.get(key)
        if prev is not None:
            kind = max(prev[1], kind, key=lambda k: _SCHEMA_KIND_ORDER[k])
            # tag-wins on a tag/field role conflict (order-independent);
            # tags are strings, so the type widens to str alongside
            is_tag = prev[0] or is_tag
        if is_tag:
            kind = "str"
        keys[key] = (is_tag, kind)
    out = {}
    for m, keys in schemas.items():
        tagk = {k for k, (is_tag, _) in keys.items() if is_tag}
        ordered = (
            ["time"]
            + sorted(k for k in keys if k in tagk)
            + sorted(k for k in keys if k not in tagk)
        )
        py = {k: {"bool": bool, "int": int, "float": float, "str": str}[kind]
              for k, (_, kind) in keys.items()}
        out[m] = (ordered, tagk, py)
    return out


def lines_to_tables_distributed(
    spark, lines, line_col: str = "value", precision: str = "ns"
):
    """Bulk line-protocol ingest, fully distributed — the 100 TB backfill
    path the driver-side ``lines_to_tables`` (HTTP request bodies) is not:
    raw lines stay on executors end to end. Two passes per the schemaless
    contract: distributed schema discovery (``discover_line_schema``, one
    small shuffle of distinct key tuples), then one ``mapInPandas`` parse
    per measurement into its fixed schema (a narrow map — lines for other
    measurements are skipped, so m measurements cost m scans of the raw
    text, the classic trade against a driver-side schema merge).

    Returns the same {measurement: (DataFrame, tag_keys)} shape as
    ``lines_to_tables``; parity with the driver path is pytest-pinned."""
    import pandas as pd

    from pyspark.sql import types as T

    schemas = discover_line_schema(lines, line_col, precision)
    spark_t = {bool: T.BooleanType(), int: T.LongType(),
               float: T.DoubleType(), str: T.StringType()}
    out = {}
    for m, (ordered, tagkeys, py) in schemas.items():
        fields = [T.StructField("time", T.TimestampType(), False)] + [
            T.StructField(k, spark_t[py[k]], True) for k in ordered[1:]
        ]
        schema = T.StructType(fields)

        def _parse(batches, _m=m, _ordered=tuple(ordered), _py=dict(py)):
            for pdf in batches:
                rows = []
                for line in pdf[line_col]:
                    line = (line or "").strip()
                    if not line or line.startswith("#"):
                        continue
                    for mm, (rws, _tk) in parse_lines_meta(line, precision).items():
                        if mm != _m:
                            continue
                        for r in rws:
                            rows.append(
                                tuple(
                                    _coerce_kind(r.get(k), _py.get(k))
                                    if k != "time" else r["time"]
                                    for k in _ordered
                                )
                            )
                yield pd.DataFrame(rows, columns=list(_ordered))

        out[m] = (lines.mapInPandas(_parse, schema), set(tagkeys))
    return out


def lines_to_tables_single_pass(
    spark,
    lines,
    line_col: str = "value",
    precision: str = "ns",
    staging_path: str | None = None,
):
    """Single-pass variant of ``lines_to_tables_distributed`` for
    many-measurement backfills: the two-pass path re-scans the RAW text
    once per measurement (m measurements → m parses of every byte,
    documented trade there); here the text is parsed exactly ONCE into a
    long-format point table (uid, m, time, key, kind, is_tag, value_str)
    that is either persisted in memory or — with ``staging_path`` —
    written to parquet PARTITIONED BY measurement, so each measurement's
    wide table reads only its own partition (file pruning). Schema
    resolution reuses the exact widest-wins / tag-wins fold of the
    two-pass path (``_resolve_discovered``); the wide pivot is one
    groupBy(uid) per measurement over already-parsed rows, and values are
    re-materialized through the same coercion semantics as
    ``_coerce_kind`` (bool→int/float via CASE on the recorded kind, so
    'true' never hits a lossy string→number cast).

    Returns the same {measurement: (DataFrame, tag_keys)} shape;
    parity with the two-pass path is pytest-pinned."""
    import pandas as pd

    from pyspark import TaskContext
    from pyspark.sql import functions as F, types as T

    long_schema = T.StructType(
        [
            T.StructField("_uid", T.StringType(), False),
            T.StructField("m", T.StringType(), False),
            T.StructField("time", T.TimestampType(), False),
            T.StructField("key", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("is_tag", T.BooleanType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )

    def _parse_all(batches):
        pid = TaskContext.get().partitionId()
        seq = 0
        for pdf in batches:
            out = []
            for line in pdf[line_col]:
                line = (line or "").strip()
                if not line or line.startswith("#"):
                    continue
                for m, (rws, tagkeys) in parse_lines_meta(line, precision).items():
                    for r in rws:
                        uid = f"{pid}:{seq}"
                        seq += 1
                        t = r["time"]
                        for k, v in r.items():
                            if k == "time":
                                continue
                            kind = (
                                "bool" if isinstance(v, bool)
                                else "int" if isinstance(v, int)
                                else "float" if isinstance(v, float)
                                else "str"
                            )
                            vs = (
                                ("true" if v else "false")
                                if isinstance(v, bool)
                                else str(v)
                            )
                            out.append((uid, m, t, k, kind, k in tagkeys, vs))
            yield pd.DataFrame(
                out,
                columns=["_uid", "m", "time", "key", "kind", "is_tag", "v"],
            )

    long = lines.mapInPandas(_parse_all, long_schema)
    if staging_path is not None:
        long.write.mode("overwrite").partitionBy("m").parquet(staging_path)
        # the measurement comes back as a PARTITION column — read with the
        # explicit schema so the declared string type wins over partition
        # type INFERENCE, or numeric-looking names ('123', '01') come back
        # as integers, changing the dict's key type and colliding '01'
        # with '1' (diverging from the in-memory and two-pass paths,
        # where m stays a string)
        long = spark.read.schema(long_schema).parquet(staging_path)
    else:
        long = long.persist()

    disc = (
        long.select("m", "key", "is_tag", "kind").distinct().collect()
    )
    schemas = _resolve_discovered(
        (r["m"], r["key"], bool(r["is_tag"]), r["kind"]) for r in disc
    )

    spark_t = {bool: T.BooleanType(), int: T.LongType(),
               float: T.DoubleType(), str: T.StringType()}
    out = {}
    for m, (ordered, tagkeys, py) in schemas.items():
        sub = long.filter(F.col("m") == m)
        aggs = [F.first("time").alias("time")]
        for k in ordered[1:]:
            vk = F.when(F.col("key") == k, F.col("v"))
            kindk = F.when(F.col("key") == k, F.col("kind"))
            target = py[k]
            if target is bool:
                cast = vk.cast("boolean")
            elif target is int:
                # bool widened into an int column → 1/0, as _coerce_kind
                cast = (
                    F.when(kindk == "bool", (vk == "true").cast("long"))
                    .otherwise(vk.cast("long"))
                )
            elif target is float:
                cast = (
                    F.when(kindk == "bool", (vk == "true").cast("double"))
                    .otherwise(vk.cast("double"))
                )
            else:
                cast = vk  # bool/int/float were stringified at parse time
            aggs.append(F.max(cast).alias(k))
        wide = sub.groupBy("_uid").agg(*aggs).drop("_uid").select(
            F.col("time").cast(T.TimestampType()),
            *[F.col(k).cast(spark_t[py[k]]) for k in ordered[1:]],
        )
        out[m] = (wide, set(tagkeys))
    return out


def _coerce_kind(v, py):
    """Widen a parsed value to the resolved column type (int → float when
    another shard saw floats; anything → str when strings won)."""
    if v is None or py is None:
        return v
    if isinstance(v, bool):
        # bool < int < float widening makes both conflicts reachable
        # (one shard writes v=true, another v=3i or v=3.5)
        if py is int:
            return int(v)
        if py is float:
            return float(v)
    if py is float and isinstance(v, int) and not isinstance(v, bool):
        return float(v)
    if py is str and not isinstance(v, str):
        return str(v).lower() if isinstance(v, bool) else str(v)
    return v
