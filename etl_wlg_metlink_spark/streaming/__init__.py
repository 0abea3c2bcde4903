"""M5 streaming catalog: the reference's scheduled-poll lifecycle
(/root/reference/task.ts:122 `InvocationType.Schedule`) generalized to
Structured Streaming — tumbling/sliding/session windows, watermarks,
availableNow one-shot triggers — plus batch-equivalent query entries so
the windowed aggregations are oracle-checkable.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict = {}
