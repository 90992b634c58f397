"""Regenerate SURVEY.md §2.13's query-name index and the README
inventory counts from registry.load_all() — run after registering any
query so tests/test_docs_sync.py stays green.

Usage: python scripts/regen_query_index.py
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from gmall_flink_210726_spark.registry import load_all  # noqa: E402


def main() -> None:
    specs = load_all()
    n = len(specs)
    n_st = sum(1 for name in specs if re.match(r"st\d+_", name))

    rows = []
    for name in sorted(specs):
        mod = inspect.getmodule(specs[name].fn)
        rel = Path(mod.__file__).relative_to(
            ROOT / "gmall_flink_210726_spark"
        )
        rows.append(f"| `{name}` | `{rel}` |")
    table = "| Query | Module |\n|---|---|\n" + "\n".join(rows)

    survey = (ROOT / "SURVEY.md").read_text()
    head_re = re.compile(
        r"(### 2\.13 .*?Counts: )\d+( queries, )\d+( streaming\.)",
        re.S,
    )
    survey, c1 = head_re.subn(rf"\g<1>{n}\g<2>{n_st}\g<3>", survey)
    table_re = re.compile(
        r"\| Query \| Module \|\n\|---\|---\|\n(?:\|.*\|\n?)*"
    )
    survey, c2 = table_re.subn(table + "\n", survey, count=1)
    assert c1 == 1 and c2 == 1, (c1, c2)
    (ROOT / "SURVEY.md").write_text(survey)

    readme = (ROOT / "README.md").read_text()
    readme, c3 = re.subn(
        r"\(\d+ queries, every one with an exact DuckDB",
        f"({n} queries, every one with an exact DuckDB",
        readme,
    )
    readme, c4 = re.subn(
        r"including\s+\d+ that execute the real `writeStream`",
        f"including\n{n_st} that execute the real `writeStream`",
        readme,
    )
    readme = re.sub(
        r"All \d+ are",
        f"All {n} are",
        readme,
    )
    assert c3 == 1 and c4 == 1, (c3, c4)
    (ROOT / "README.md").write_text(readme)
    print(f"regenerated: {n} queries, {n_st} streaming")


if __name__ == "__main__":
    main()
