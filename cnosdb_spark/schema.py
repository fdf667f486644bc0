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
