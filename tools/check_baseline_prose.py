"""Consistency check: every `<query_id> N.NNx` ratio quoted in
BASELINE.md PROSE must agree (to the printed 2 dp) with the measured
sf0.1 table at the bottom of the file — the r5/r6 verdicts both
flagged stale narrative numbers after a regen. Run after every
tools/regen_baseline.py pass; exits nonzero on any disagreement.

Only the FIRST measured table (the sf0.1 table: `| qid | duck | spark
| ratio | status |`) is the source of truth; sf1/sf3 scaling-table
ratios quoted in prose are matched against their own tables by the
`at sfN` suffix convention and skipped here.
"""

from __future__ import annotations

import os
import re
import sys

PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BASELINE.md",
)


def main() -> int:
    text = open(PATH).read()
    # the sf0.1 measured table: qid | duck | spark | ratio | status
    table: dict[str, float] = {}
    for m in re.finditer(
        r"^\| (\w+) \| ([\d.]+) \| [\d.]+ \| ([\d.]+) \| ", text, re.M
    ):
        table.setdefault(m.group(1), float(m.group(3)))
    prose = text.split("| query ID |")[0]
    bad = []
    # `qid 1.23x` or `qid NN.NNx` in prose; 'sf1:'-style follow-ups and
    # 'at sf1' quotes are scaling-table numbers, not sf0.1 claims
    for m in re.finditer(r"(\w+) (\d+\.\d+)x", prose):
        qid, val = m.group(1), float(m.group(2))
        ctx = prose[max(0, m.start() - 40): m.end() + 20]
        if qid not in table:
            continue
        if re.search(r"at sf\d|sf1[: ]|sf3[: ]|first implementation",
                     ctx):
            continue
        if abs(table[qid] - val) > 0.005:
            bad.append((qid, val, table[qid]))
    for qid, quoted, measured in bad:
        print(f"PROSE STALE: {qid} quoted {quoted}x, table {measured}x")
    print(f"{len(bad)} stale of {len(table)} table rows")

    # Classification-debt gate (r8 verdict): a bare `over 2x` status —
    # no parenthetical floor tag / measured scale point — is an
    # unclassified weak row. The r8d regen silently reintroduced 63 of
    # them; fail so a future regen can't. Evidence lives in
    # tools/scale_evidence.py's ANNOTATIONS map, which regen re-emits.
    bare = [
        m.group(1)
        for m in re.finditer(r"^\| (\w+) \| [\d.]+ \| [\d.]+ \| [\d.]+ \| over 2x \|$", text, re.M)
    ]
    for qid in bare:
        print(f"BARE STATUS: {qid} is 'over 2x' with no measured evidence")
    print(f"{len(bare)} bare over-2x rows")

    # Projection gate (r9 verdict ask #2): a status claiming the ratio
    # "crosses ~sfN" is a PROJECTION, not a measurement. Each such
    # claim must be backed by a measured point AT OR BEYOND sfN
    # somewhere in the row's own status text (an "N.NNx sfM" / "sfM:
    # N.NNx" / "N.NNx at sfM" pair with M >= N) — otherwise the row is
    # still unclassified debt and this check fails.
    projected = []
    for m in re.finditer(
        r"^\| (\w+) \| [\d.]+ \| [\d.]+ \| [\d.]+ \| (.*cross\w* ~sf([\d.]+).*) \|$",
        text,
        re.M,
    ):
        qid, status, target = m.group(1), m.group(2), float(m.group(3))
        measured = [
            float(p)
            for p in re.findall(
                r"(?:sf([\d.]+)[:\s]+[\d.]+\s*x)|(?:[\d.]+x\s+(?:at\s+)?sf([\d.]+))",
                status,
            )
            for p in p
            if p
        ]
        if not any(p >= target for p in measured):
            projected.append((qid, target))
    for qid, target in projected:
        print(
            f"PROJECTED ONLY: {qid} claims a crossing ~sf{target:g} "
            f"with no measured point at or beyond sf{target:g}"
        )
    print(f"{len(projected)} projection-only crossing rows")
    return 1 if (bad or bare or projected) else 0


if __name__ == "__main__":
    sys.exit(main())
