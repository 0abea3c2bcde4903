"""M3 relational catalog (SURVEY.md §2.5 / M3): joins, aggregations,
windows, sorts, set ops — the capability categories the reference only
has in degenerate form (its D2/D4 lookups are inlined broadcast joins,
/root/reference/task.ts:225-242, 266-276), generalized to the full
relational surface a Spark engine owes its users.

Scale notes are per-query; the common rules:
- small dims (region 5 rows, nation 25) are ALWAYS broadcast —
  `F.broadcast()` pins it rather than trusting the size estimator;
- big-big joins shuffle on the join key and rely on AQE for skew;
- top-k per group is window `row_number() <= k`, never a sort-all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_wlg_metlink_spark.tables import load

QUERIES: dict = {}
ORACLE: dict = {}
