"""Generate SCALE.md §sf1 — per-lane sf0.1→sf1 scaling report
(VERDICT r06 item 1): reads the banked BENCH_DETAIL.json (sf0.1) and
BENCH_DETAIL_sf1.json (10× data), computes each lane's scaling
exponent, and flags super-linear lanes.

exponent e = log(t_sf1 / t_sf0.1) / log(10) — e ≈ 0 means the lane is
dominated by fixed overhead (job setup, bounded aggregates), e ≈ 1 is
ideal linear scan scaling, e > 1 is super-linear and needs a plan
diff. Lanes faster than ~0.3 s at sf0.1 are mostly fixed overhead, so
their exponents are noise; the report orders by sf1 cost and flags on
exponent only where sf1 time is ≥ 1 s.

Cross-window churn (VERDICT r11 stretch 7): the two detail banks are
separate ~20-min sessions whose ambient throughput differs by ±20-25%,
so cheap lanes' exponents breathe ±0.1 between banks. `--adjudicate`
automates the method that cleared every r10/r11 flag by hand: rerun
ALL flagged lanes back-to-back at both scales in one window
(`bench.py --only` three times per scale, minutes apart) and report
the paired exponents' median + spread next to the banked one — a
flag is NOISE only if the MEDIAN paired exponent is ≤ 1.0 (ADVICE
r12: noise deflates exponents too — a load spike in the sf0.1
denominator or a lucky-fast sf1 run makes one pair look sub-linear —
so a single best pair cannot clear a flag), a real pathology if the
median reproduces it.

Usage: python tools/scale_report.py [--adjudicate]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK = "<!-- sf1-scale-report -->"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_scale/sf1")


def _only_run(names: list[str], env_dir: str | None) -> dict[str, float]:
    env = dict(os.environ)
    if env_dir:
        env["SPARK_GRAFT_SF_DIR"] = env_dir
    proc = subprocess.run(
        [sys.executable, "bench.py", "--only", ",".join(names)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    timings = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:  # Spark/log4j noise can also start with '{'
                d = json.loads(line)
            except ValueError:
                continue
            if isinstance(d.get("queries"), dict) and d["queries"]:
                timings = d["queries"]
    if timings is None:
        raise RuntimeError(
            f"--only run at {env_dir or 'sf0.1'} produced no timings:\n"
            f"{proc.stdout}\n{proc.stderr[-2000:]}"
        )
    return timings


ADJUDICATE_SAMPLES = 3


def _paired_run(names: list[str]) -> dict[str, dict]:
    """THREE paired same-window samples of `names` at sf0.1 then sf1
    (six bench.py --only runs, minutes apart); each lane is judged on
    the MEDIAN paired exponent with the full spread reported. Median,
    not min (ADVICE r12): ambient noise moves a paired exponent BOTH
    ways — a load spike in the sf1 run inflates it, but a spike in
    the sf0.1 denominator (or a lucky-fast sf1 run) DEFLATES it — so
    keeping the single best pair would let one lucky sample clear a
    genuinely super-linear lane. Measured l35 churn across four
    same-window pairs in one session: e = 0.82–1.03; the median of 3
    sits inside that band, the min does not have to."""
    samples = []
    for _ in range(ADJUDICATE_SAMPLES):
        s0 = _only_run(names, None)
        s1 = _only_run(names, SF1_DIR)
        samples.append((s0, s1))
    paired = {}
    for n in names:
        pts = []
        for s0, s1 in samples:
            t0, t1 = s0.get(n), s1.get(n)
            if t0 and t1 and t0 > 0 and t1 > 0:
                e = round(math.log(t1 / t0) / math.log(10.0), 2)
                pts.append((e, t0, t1))
        if not pts:
            continue
        pts.sort()
        mid = len(pts) // 2
        med_e = (
            pts[mid][0]
            if len(pts) % 2
            else round((pts[mid - 1][0] + pts[mid][0]) / 2, 2)
        )
        rep = pts[mid]  # the sample at/above the median, for t0/t1
        paired[n] = {
            "median_e": med_e,
            "spread": (pts[0][0], pts[-1][0]),
            "t0": rep[1],
            "t1": rep[2],
            "n": len(pts),
        }
    return paired


def main() -> None:
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        base = json.load(f)["queries"]
    with open(os.path.join(REPO, "BENCH_DETAIL_sf1.json")) as f:
        sf1 = json.load(f)["queries"]

    rows = []
    for name, t1 in sf1.items():
        t0 = base.get(name)
        if not t0 or t0 <= 0 or t1 <= 0:
            continue
        e = math.log(t1 / t0) / math.log(10.0)
        rows.append((name, t0, t1, round(t1 / t0, 2), round(e, 2)))
    rows.sort(key=lambda r: -r[2])

    flagged = [r for r in rows if r[2] >= 1.0 and r[4] > 1.0]
    watch = [r for r in rows if r[2] >= 1.0 and 0.8 < r[4] <= 1.0]

    lines = [
        MARK,
        "## sf1 scale proof (10× sf0.1, measured)",
        "",
        "Generated by `tools/scale_report.py` from `BENCH_DETAIL.json` "
        "(sf0.1) and `BENCH_DETAIL_sf1.json` (sf1 = 10× replicated "
        "data via `tools/gen_scale_data.py` — FK-preserving offsets, "
        "per-replica content perturbation so dedup/ANN outputs scale "
        "linearly). exponent = log10(t_sf1/t_sf0.1); 1.0 = linear.",
        "",
        f"Lanes measured at both scales: **{len(rows)}**. "
        f"Super-linear (exponent > 1.0 at ≥ 1 s): **{len(flagged)}**. "
        f"Near-linear watchlist (0.8–1.0): **{len(watch)}**.",
        "",
        "| query | sf0.1 s | sf1 s | ratio | exponent |",
        "|---|---|---|---|---|",
    ]
    for name, t0, t1, ratio, e in rows[:40]:
        flag = " ⚠" if (name, t0, t1, ratio, e) in flagged else ""
        lines.append(f"| {name}{flag} | {t0} | {t1} | {ratio} | {e} |")
    if len(rows) > 40:
        lines.append(
            f"| _… {len(rows) - 40} faster lanes elided (all ratios "
            f"≤ {rows[40][3]})_ | | | | |"
        )
    if flagged:
        paired = {}
        if "--adjudicate" in sys.argv[1:]:
            print(
                f"adjudicating {len(flagged)} flagged lane(s) with "
                f"{ADJUDICATE_SAMPLES} paired same-window reruns "
                f"({2 * ADJUDICATE_SAMPLES} bench.py --only runs)..."
            )
            paired = _paired_run([r[0] for r in flagged])
        lines += ["", "Flagged super-linear lanes (need a plan diff):", ""]
        for name, t0, t1, ratio, e in flagged:
            note = ""
            if name in paired:
                p = paired[name]
                verdict = (
                    "cleared: cross-window noise" if p["median_e"] <= 1.0
                    else "REPRODUCES — real pathology"
                )
                note = (
                    f" — median of {p['n']} paired same-window reruns: "
                    f"{p['t0']}s → {p['t1']}s (e={p['median_e']}, spread "
                    f"{p['spread'][0]}–{p['spread'][1]}, {verdict})"
                )
            lines.append(
                f"- **{name}**: {t0}s → {t1}s (×{ratio}, e={e}){note}"
            )
    lines.append("")

    scale_path = os.path.join(REPO, "SCALE.md")
    try:
        with open(scale_path) as f:
            existing = f.read()
    except OSError:
        existing = "# SCALE\n\n"
    if MARK in existing:
        existing = existing.split(MARK)[0].rstrip() + "\n\n"
    with open(scale_path, "w") as f:
        f.write(existing + "\n".join(lines))
    print(
        f"wrote sf1 section to SCALE.md: {len(rows)} lanes, "
        f"{len(flagged)} flagged, {len(watch)} watchlist"
    )
    if flagged:
        sys.exit(0)  # informational; the flag list is the deliverable


if __name__ == "__main__":
    main()
