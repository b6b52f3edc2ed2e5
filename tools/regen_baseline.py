#!/usr/bin/env python
"""Regenerate the measured DuckDB-vs-Spark table in BASELINE.md.

DuckDB side: each oracle_sql() query at sf0.1, MIN of 5 runs, warm
OS cache, result fully materialized (fetchall). Min matches the
estimator bench.py uses for Spark (min over timed passes) so the
headline ratio compares like with like — on a noisy shared host
min-vs-median would systematically favor whichever side used min.
Spark side: taken from a bench.py run — run bench.py first and pass
its JSON via --bench, or this script runs it.

Usage: python tools/regen_baseline.py [--bench B1.json [--bench B2.json ...]]
                                      [--duck-passes N]
Multiple --bench files min-merge per query (the r3 protocol: the host
is a noisy shared VM, min across suite runs estimates the undisturbed
cost); --duck-passes N (default 2) min-merges N DuckDB sessions the
same way.
Writes the markdown table to stdout and rewrites the "## Measured"
section of BASELINE.md in place.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_timings() -> dict[str, float]:
    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e

    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    out: dict[str, float] = {}
    for qid in sorted(oracles):
        sql = oracles[qid]
        runs = []
        try:
            con.execute(sql).fetchall()  # warm
            for _ in range(5):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                runs.append(time.perf_counter() - t0)
            out[qid] = round(min(runs), 4)
        except Exception as exc:
            print(f"duck: {qid} failed: {exc}", file=sys.stderr)
            out[qid] = -1.0
    return out


def classify(d: float | None, s: float) -> str:
    if d is None or d < 0:
        return "no oracle (rows-only check)"
    if s < 0:
        return "SPARK FAILED"
    r = s / d if d > 0 else float("inf")
    if r <= 2:
        return "within 2x"
    if d < 0.05:
        return "scheduling floor (duck < 50 ms)"
    return "over 2x"


def _annotate(qid: str, label: str) -> str:
    """Carry the measured scale-evidence note (tools/scale_evidence.py)
    into the status column so a regen can never drop it."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_evidence import annotate

    return annotate(qid, label)


def _min_merge(dicts: list[dict[str, float]]) -> dict[str, float]:
    """Per-query min across runs; negative (failed) entries only win
    when every run failed."""
    out: dict[str, float] = {}
    for d in dicts:
        for q, v in d.items():
            cur = out.get(q)
            if cur is None or (v > 0 and (cur < 0 or v < cur)):
                out[q] = v
    return out


def main() -> None:
    bench_paths = [
        sys.argv[i + 1]
        for i, a in enumerate(sys.argv)
        if a == "--bench"
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if bench_paths:
        benches = [json.load(open(p)) for p in bench_paths]
    else:
        subprocess.run(
            [sys.executable, "bench.py"],
            cwd=repo,
            capture_output=True,
            text=True,
            check=True,
        )
        # bench.py's final stdout line carries only the headline
        # subset (the driver's tail capture is size-limited); the full
        # per-query map lands in BENCH_full.json
        benches = [json.load(open(os.path.join(repo, "BENCH_full.json")))]
    spark_t = _min_merge([b["queries"] for b in benches])

    duck_passes = (
        int(sys.argv[sys.argv.index("--duck-passes") + 1])
        if "--duck-passes" in sys.argv
        else 2
    )
    # --duck-json FILE (repeatable): previously measured duck timing
    # maps (same layout/protocol) min-merged with the fresh passes —
    # lets a same-day spark re-merge reuse the duck side instead of
    # re-paying ~25 min of oracle runs; pass --duck-passes 0 with it.
    duck_maps = [
        json.load(open(sys.argv[i + 1]))
        for i, a in enumerate(sys.argv)
        if a == "--duck-json"
    ]
    duck_t = _min_merge(
        duck_maps + [duck_timings() for _ in range(duck_passes)]
    )

    rows = []
    tot_d = tot_s = 0.0
    for qid in sorted(spark_t):
        s = spark_t[qid]
        d = duck_t.get(qid)
        if d is not None and d > 0 and s > 0:
            tot_d += d
            tot_s += s
            ratio = f"{s / d:.2f}"
            dcell = f"{d:.4f}"
        else:
            ratio = "—"
            dcell = "—"
        rows.append(
            f"| {qid} | {dcell} | {s:.4f} | {ratio} | "
            f"{_annotate(qid, classify(d, s))} |"
        )

    n_ok = sum(1 for q in spark_t if duck_t.get(q, -1) > 0)
    verdict = (
        "within the 2x target"
        if tot_s / tot_d <= 2
        else "OVER the 2x target"
    )
    header = (
        f"Totals on the oracle-checked set ({n_ok} queries): "
        f"**DuckDB {tot_d:.2f} s, Spark {tot_s:.2f} s — "
        f"{tot_s / tot_d:.2f}x overall**, {verdict}."
    )
    table = (
        "| query ID | duckdb sec | spark sec | ratio | status |\n|---|---|---|---|---|\n"
        + "\n".join(rows)
        + "\n"
    )
    print(header)
    print(table)

    # splice into BASELINE.md: keep the prose of the Measured section,
    # refresh the totals sentence and replace the table
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BASELINE.md"
    )
    import re

    text = open(path).read()
    pre, old_tail = text.split("| query ID | duckdb sec |", 1)
    # preserve every section AFTER the old table (scaling evidence
    # etc.) — the table ends at the first blank-line + "## " heading
    m_tail = re.search(r"\n\n## ", old_tail)
    post = old_tail[m_tail.start() :] if m_tail else "\n"
    # replace the stale totals sentence (first "Totals on the
    # oracle-checked set ... target," span) in the prose
    totals_sentence = (
        f"Totals on the oracle-checked set ({n_ok} queries): "
        f"**DuckDB {tot_d:.2f} s, Spark {tot_s:.2f} s — "
        f"{tot_s / tot_d:.2f}x overall**, {verdict}"
    )
    pre = re.sub(
        r"Totals on the oracle-checked set \(\d+ queries\): \*\*DuckDB [\d.]+ s,\s*\n?"
        r"Spark [\d.]+ s — [\d.]+x overall\*\*, (within|OVER) the 2x target",
        totals_sentence,
        pre,
    )
    open(path, "w").write(pre + table + post)


if __name__ == "__main__":
    main()
