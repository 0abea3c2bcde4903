"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage:
    python tools/dump_plans.py <tag> <suffix> query [query ...]
    # e.g. python tools/dump_plans.py r16 before l59_rrf_hybrid m4_metlink_bulk

Writes plans/<tag>/<query>_<suffix>.txt. Lanes that materialize during
construction (streaming runners, iterative lanes) still produce a plan —
it reflects the post-materialization serving read, which is noted in the
header so the file is honest about what it shows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from etl_wlg_metlink_spark.session import build_session  # noqa: E402


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="dump_plans")
    all_q = queries()
    for name in names:
        df = all_q[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
