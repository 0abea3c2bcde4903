"""Rotating judge-style sample (VERDICT r15 item 6).

The driver's gate is frozen at the catalog's first 50 lanes; the other
145 rest on the builder's selfcheck plus whatever the judge happens to
re-run. This tool makes that residual shrink monotonically: each round
it draws a deterministic, round-seeded sample of lanes — preferring
lanes never sampled by ANY prior BARECHECK — and runs them through
``tools/check_correctness.py`` in ``SPARK_GRAFT_BARE`` mode (a bare
SparkSession with no engine confs, exactly how the external grader
drives the catalog).

Usage:
    python tools/rotate_sample.py <round> [n_lanes=30]

Writes ``BARECHECK_r{round}.txt`` (PASS/FAIL lines + a cumulative
coverage footer). Determinism: same round → same sample, so a re-run
reproduces the bank bit-for-bit.
"""

from __future__ import annotations

import glob
import json
import os
import random
import re
import subprocess
import sys

sys.path.insert(0, ".")

from __spark_entry__ import queries  # noqa: E402


def driver_checked_lanes() -> set[str]:
    """Lanes inside the driver's frozen gate (latest CORRECTNESS_r*.json)."""
    files = sorted(glob.glob("CORRECTNESS_r*.json"))
    if not files:
        return set()
    with open(files[-1]) as f:
        return set(json.load(f))


def previously_sampled() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob("BARECHECK_r*.txt"):
        with open(path) as f:
            for line in f:
                m = re.match(r"(?:PASS|FAIL|ROWS-ONLY)\s+(\S+?):?\s", line)
                if m:
                    seen.add(m.group(1))
    return seen


def pick(round_no: int, n_lanes: int) -> list[str]:
    all_lanes = sorted(queries())
    frozen = driver_checked_lanes()
    sampled = previously_sampled()
    pool = [q for q in all_lanes if q not in frozen]
    never = [q for q in pool if q not in sampled]
    again = [q for q in pool if q in sampled]
    rng = random.Random(round_no)
    rng.shuffle(never)
    rng.shuffle(again)
    # never-sampled lanes first; top up with re-runs once exhausted
    return sorted((never + again)[:n_lanes])


def main() -> int:
    round_no = int(sys.argv[1])
    n_lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    lanes = pick(round_no, n_lanes)

    env = dict(os.environ, SPARK_GRAFT_BARE="1")
    proc = subprocess.run(
        [sys.executable, "tools/check_correctness.py", sf_dir, *lanes],
        env=env,
        capture_output=True,
        text=True,
    )
    body = [
        line
        for line in proc.stdout.replace("\r", "\n").splitlines()
        if re.match(r"(PASS|FAIL|ROWS-ONLY|\d+ pass)", line)
    ]

    covered = previously_sampled() | set(lanes)
    pool = set(queries()) - driver_checked_lanes()
    footer = (
        f"cumulative bare-mode coverage: {len(covered & pool)}/{len(pool)} "
        f"non-driver lanes ({len(pool - covered)} never sampled)"
    )
    out = "\n".join(
        [f"# rotate_sample round={round_no} n={len(lanes)} sf_dir={sf_dir} "
         f"bare=1 seed={round_no}"]
        + body
        + [footer, ""]
    )
    path = f"BARECHECK_r{round_no}.txt"
    with open(path, "w") as f:
        f.write(out)
    sys.stdout.write(out)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
