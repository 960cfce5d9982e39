"""Regenerate the harness-registry table in OPERATORS.md from sparkdu/harness.py.

Keeps the doc's trailing "Non-harness operators" section verbatim; only the
generated table between the header and that section is rewritten.

Run: python tools/gen_operators.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = os.path.join(REPO, "OPERATORS.md")

HEADER = """# OPERATORS — SURVEY.md SS2 inventory -> implementation map

Generated from sparkdu/harness.py (the driver-checked registry) by
tools/gen_operators.py. `SQL-checked` = DuckDB oracle value-hash comparison
at sf0.01; `rows-only` = engine-specific by design, backed by pytest
property tests.

| check key | kind | implementation | docstring |
|---|---|---|---|
"""

TAIL_MARK = "## Non-harness operators"


def main() -> None:
    import sparkdu.staging  # noqa: F401  (registers round-3 staged keys)
    from sparkdu.harness import ORACLES, QUERIES, ordered

    QUERIES = ordered(QUERIES)
    ORACLES = ordered(ORACLES)

    rows = []
    for name, fn in QUERIES.items():
        kind = "SQL-checked" if name in ORACLES else "rows-only"
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        first = first.replace("|", "\\|")
        rows.append(f"| `{name}` | {kind} | `harness.{fn.__name__}` | {first} |")

    with open(DOC) as f:
        old = f.read()
    tail = ""
    if TAIL_MARK in old:
        tail = "\n" + old[old.index(TAIL_MARK):]
    with open(DOC, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n" + tail)
    n_sql = sum(1 for n in QUERIES if n in ORACLES)
    print(f"wrote OPERATORS.md: {len(QUERIES)} keys ({n_sql} SQL-checked, "
          f"{len(QUERIES) - n_sql} rows-only)")


if __name__ == "__main__":
    main()
