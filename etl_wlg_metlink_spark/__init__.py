"""etl_wlg_metlink_spark — a PySpark-native analytics engine with the
query and data-processing capability surface of TAK-NZ/etl-wlg-metlink.

The reference (/root/reference/task.ts) is a single-file scheduled ETL
task: HTTP JSON source -> validate -> explode -> filter -> derive ->
classify -> enrich -> dedup-by-key -> assemble -> sink.  This package
re-expresses that surface as a reusable catalog of Spark DataFrame
operators (batch + Structured Streaming), extends it with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis), and designs every operator for 100 TB scale:
declarative plans for Catalyst, broadcast joins for dims, windowed
dedup instead of driver-side maps, no collect() in any hot path.
"""

__version__ = "0.1.0"
