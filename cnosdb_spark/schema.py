"""Time-series table model: one time column, N tag columns, M field columns.

Re-expresses the reference's tskv schema
(/root/reference common/models/src/schema/tskv_table_schema.rs:36-47,531-537,
760-765; value types common/models/src/value_type.rs:8-16) as a Spark
StructType:

  Tag            -> StringType (nullable)
  Time(unit)     -> TimestampType (non-nullable; Spark is µs precision)
  Field Float    -> DoubleType
  Field Integer  -> LongType
  Field Unsigned -> LongType  (documented divergence: Spark has no u64)
  Field String   -> StringType
  Field Boolean  -> BooleanType
  Field Geometry -> StringType (WKT) + metadata {gis_subtype, srid}

The set of tag values identifies a *series* (the reference's inverted index,
tskv/src/index/ts_index.rs:84). Here a series is just `struct(*tags)`; a
derived ``series_id`` hash column supports partitioning/clustering at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

TIME_COL = "time"
# Internal column recording write order for last-write-wins merge-on-read.
INGEST_SEQ_COL = "_ingest_seq"
# Within-batch row ordinal: the reference's LWW keeps the LAST duplicate
# row inside one write batch (cases/function/common/count.slt air fixture);
# (_ingest_seq, _ingest_row) is the total write order.
INGEST_ROW_COL = "_ingest_row"
# Sub-microsecond residue (ns % 1000) of the ingested timestamp: TIME_COL
# is µs TimestampType (Spark-native), but the reference keys series points
# on raw i64 NANOSECONDS (tskv_table_schema.rs:409-415) — ns-distinct
# points must stay distinct under the LWW merge (sqlancer/repeat_write.slt
# keeps writes at 1 ns, 2 ns, 3 ns as three rows). NULL/0 = no residue.
NS_RESIDUE_COL = "_ns_res"

# humantime (the Rust crate CnosDuration displays through,
# common/utils/src/duration.rs:23): year = 365.25 d, month = 30.44 d
# (unit, seconds, pluralizable): year/month/day spell out with plural,
# sub-day units abbreviate (alter_database.slt:51 "3months 8days 16h 19m 12s")
_HUMANTIME_S = [
    ("year", 31_557_600, True),
    ("month", 2_630_016, True),
    ("day", 86_400, True),
    ("h", 3_600, False),
    ("m", 60, False),
    ("s", 1, False),
]
_HUMANTIME_PARSE_S = {
    "y": 31_557_600, "year": 31_557_600, "years": 31_557_600,
    "M": 2_630_016, "month": 2_630_016, "months": 2_630_016,
    "w": 604_800, "week": 604_800, "weeks": 604_800,
    "d": 86_400, "day": 86_400, "days": 86_400,
    "h": 3_600, "hour": 3_600, "hours": 3_600,
    "m": 60, "min": 60, "minute": 60, "minutes": 60,
    "s": 1, "sec": 1, "second": 1, "seconds": 1,
}


def display_duration(raw) -> str:
    """Render a database TTL / vnode-duration option the way the reference
    does — humantime::format_duration of the parsed value: '10d' →
    '10days', '3d' → '3days', default vnode duration → '1year'
    (ddl/alter_database.slt:23, describe_database.slt:18). 'INF' and
    unparseable strings render unchanged."""
    import re as _re

    s = str(raw).strip()
    if not s or s.upper() == "INF":
        return "INF" if s else s
    total = 0
    pos = 0
    for m in _re.finditer(r"(\d+)\s*([a-zA-Z]+)\s*", s):
        if m.start() != pos:
            return s
        per = _HUMANTIME_PARSE_S.get(m.group(2))
        if per is None:
            per = _HUMANTIME_PARSE_S.get(m.group(2).lower())
        if per is None:
            return s
        total += int(m.group(1)) * per
        pos = m.end()
    if pos != len(s) or total == 0:
        return s
    parts = []
    for name, per, plural in _HUMANTIME_S:
        n, total = divmod(total, per)
        if n:
            parts.append(f"{n}{name}{'s' if plural and n != 1 else ''}")
    return " ".join(parts)


_SIZE_BYTES = {
    "b": 1, "k": 10**3, "kb": 10**3, "m": 10**6, "mb": 10**6,
    "g": 10**9, "gb": 10**9, "kib": 2**10, "mib": 2**20, "gib": 2**30,
}


def display_size(raw) -> str:
    """Render a byte-size option as the reference does — MiB with full
    float precision: '128MiB' → '128 MiB', '300M' → '286.102294921875 MiB'
    (describe_database.slt:68)."""
    import re as _re

    m = _re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]+)\s*", str(raw))
    if not m or m.group(2).lower() not in _SIZE_BYTES:
        return str(raw)
    b = float(m.group(1)) * _SIZE_BYTES[m.group(2).lower()]
    mib = b / 2**20
    return f"{int(mib)} MiB" if mib == int(mib) else f"{mib!r} MiB"


def db_options_row(opts: dict) -> tuple:
    """The 11 DatabaseOptions+DatabaseConfig display columns shared by
    DESCRIBE DATABASE and information_schema.DATABASES
    (database_schema.rs; describe_database.slt:18,68)."""
    return (
        display_duration(opts.get("ttl") or "INF"),
        int(opts.get("shard", 1)),
        display_duration(opts.get("vnode_duration") or "1year"),
        int(opts.get("replica", 1)),
        str(opts.get("precision") or "NS").upper(),
        display_size(opts.get("max_memcache_size", "128MiB")),
        int(opts.get("memcache_partitions", 16)),
        display_size(opts.get("wal_max_file_size", "128MiB")),
        str(opts.get("wal_sync", "false")).lower() == "true",
        str(opts.get("strict_write", "false")).lower() == "true",
        int(opts.get("max_cache_readers", 32)),
    )


FIELD_TYPES: dict[str, T.DataType] = {
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "integer": T.LongType(),
    "bigint": T.LongType(),
    "unsigned": T.LongType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "geometry": T.StringType(),
}


@dataclass
class TskvTableSchema:
    """Schema of a time-series table: tenant.db.name with tags + fields."""

    tenant: str
    db: str
    name: str
    tags: list[str]
    fields: dict[str, str]  # field name -> type name (keys of FIELD_TYPES)
    schema_version: int = 1
    options: dict = field(default_factory=dict)  # ttl, shard_num, ...

    def __post_init__(self) -> None:
        for fname, ftype in self.fields.items():
            if ftype.lower() not in FIELD_TYPES:
                raise ValueError(f"unknown field type {ftype!r} for {fname!r}")
        overlap = set(self.tags) & set(self.fields)
        if overlap:
            raise ValueError(f"columns declared both tag and field: {overlap}")
        if TIME_COL in self.tags or TIME_COL in self.fields:
            raise ValueError(f"{TIME_COL!r} is reserved for the time column")

    @property
    def field_names(self) -> list[str]:
        return list(self.fields)

    def to_struct_type(self, with_ingest_seq: bool = False) -> T.StructType:
        cols = [T.StructField(TIME_COL, T.TimestampType(), nullable=False)]
        cols += [T.StructField(t, T.StringType(), nullable=True) for t in self.tags]
        cols += [
            T.StructField(f, FIELD_TYPES[ft.lower()], nullable=True)
            for f, ft in self.fields.items()
        ]
        if with_ingest_seq:
            cols.append(T.StructField(INGEST_SEQ_COL, T.LongType(), nullable=False))
            cols.append(T.StructField(INGEST_ROW_COL, T.LongType(), nullable=False))
            cols.append(T.StructField(NS_RESIDUE_COL, T.LongType(), nullable=True))
        return T.StructType(cols)

    def to_json(self) -> dict:
        return {
            "tenant": self.tenant,
            "db": self.db,
            "name": self.name,
            "tags": self.tags,
            "fields": self.fields,
            "schema_version": self.schema_version,
            "options": self.options,
        }

    @classmethod
    def from_json(cls, d: dict) -> "TskvTableSchema":
        return cls(
            tenant=d["tenant"],
            db=d["db"],
            name=d["name"],
            tags=list(d["tags"]),
            fields=dict(d["fields"]),
            schema_version=d.get("schema_version", 1),
            options=d.get("options", {}),
        )
