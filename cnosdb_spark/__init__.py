"""cnosdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of CnosDB (reference: /root/reference), plus
first-class large-scale training-data-pipeline operators.

Layout:
  session    - tuned SparkSession factory
  schema     - tskv time/tag/field table model
  catalog    - parquet warehouse, merge-on-read LWW dedup, TTL, SHOW SERIES
  functions  - time_window/gapfill/selectors, gauge_agg, state_agg,
               data-quality aggs, ts_gen_func repairs, GIS
  operators  - dedup (exact/minhash/simhash/jaccard/embedding),
               similarity search, text analysis, multimodal plumbing
  sources    - line-protocol ingest
  streaming  - stream tables + incremental aggregation
"""

from .session import get_spark, load_tables  # noqa: F401
from .schema import TskvTableSchema  # noqa: F401
from .catalog import Catalog  # noqa: F401
