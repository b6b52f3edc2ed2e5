"""Mechanically rewrite every prose-quoted sf0.1 ratio in BASELINE.md
from the measured table (the inverse of check_baseline_prose.py's
detection — same matching rules). Run after every regen_baseline.py
pass, then check_baseline_prose.py must exit 0."""

from __future__ import annotations

import re
import sys

from check_baseline_prose import PATH


def main() -> int:
    text = open(PATH).read()
    table: dict[str, float] = {}
    for m in re.finditer(
        r"^\| (\w+) \| ([\d.]+) \| [\d.]+ \| ([\d.]+) \| ", text, re.M
    ):
        table.setdefault(m.group(1), float(m.group(3)))
    head, sep, tail = text.partition("| query ID |")

    def sub(m: re.Match) -> str:
        qid, val = m.group(1), float(m.group(2))
        ctx = head[max(0, m.start() - 40): m.end() + 20]
        if qid not in table or re.search(
            r"at sf\d|sf1[: ]|sf3[: ]|first implementation", ctx
        ):
            return m.group(0)
        return f"{qid} {table[qid]:.2f}x"

    new_head = re.sub(r"(\w+) (\d+\.\d+)x", sub, head)
    open(PATH, "w").write(new_head + sep + tail)
    print("synced" if new_head != head else "no changes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
