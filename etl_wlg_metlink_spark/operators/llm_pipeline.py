"""M6 LLM-data-pipeline operators (north star extension; SURVEY.md M6):
deduplication, similarity search, text analysis, multimodal plumbing —
over the `documents` and `embeddings` tables.

Everything scale-critical is banded/bucketed: near-dup detection via
MinHash banding (candidate pairs only within a band bucket, never an
all-pairs cross join), ANN via LSH buckets. Exact variants exist as the
correctness baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.tables import load

QUERIES: dict = {}
ORACLE: dict = {}
