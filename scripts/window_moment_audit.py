#!/usr/bin/env python
"""Window-carried integer-moment scanner (the ext_pareto_knee lesson).

The r9 margin-audit scanner captured plain SUM aliases and their
downstream integer products, but missed moments that ride a WINDOW
function: a cumulative SUM over cents is the same magnitude as the
partition total (~SF-linear -> safe alone), yet a downstream PRODUCT of
two window outputs squares that magnitude (pareto_knee's cr*nc crossed
2^63 at ~sf2.5 while every plain aggregate in the query was safe).

This scanner finds, per query-wave source file:

1. every window aggregate site — pyspark ``F.sum/F.count(...).over(...)``
   and SQL ``SUM/COUNT(...) OVER (...)`` — together with the alias it is
   bound to;
2. every later INTEGER multiplication that touches such an alias
   (``alias * other``, ``alias*alias``, ``POW(alias``, ``alias^2``)
   within the same def/SQL string, EXCLUDING sites already cast to
   DECIMAL/DOUBLE before the product (the fix pattern);

and prints each hit as ``file:line  alias  [product-line]`` for the
magnitude audit (PERFORMANCE.md round-10 table). It is a CANDIDATE
finder: classification of each hit's axis/operand magnitude at the
sf1000 design point stays a human step, recorded in PERFORMANCE.md.

    python scripts/window_moment_audit.py [--all]   # --all: list sums
                                                    # with no product too
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# window aggregate producing an integer-typed column (SUM over ints,
# COUNT, ROW_NUMBER are int; AVG/double sums are not overflow-relevant)
PY_WIN = re.compile(
    r"F\.(sum|count)\(\s*(?P<arg>[^)]*)\)\s*\.over\(", re.IGNORECASE
)
SQL_WIN = re.compile(
    r"(?P<fn>SUM|COUNT)\s*\(\s*(?P<arg>[^)]*?)\)\s+OVER\s*\(", re.IGNORECASE
)
ALIAS_PY = re.compile(r"\.alias\(\s*['\"](?P<alias>\w+)['\"]\s*\)")
ALIAS_SQL = re.compile(r"\)\s+AS\s+(?P<alias>\w+)", re.IGNORECASE)
# only DECIMAL/HUGEINT mark a site as using the overflow-fix pattern.
# CAST(... AS DOUBLE) around a product does NOT: the product is computed
# in int64 FIRST and only the overflowed result would be cast (exactly
# the ext_pareto_knee shape). A double literal (40e0*...) does widen the
# arithmetic, so a float e-notation literal ADJACENT to the * is safe.
# r11 (ADVICE): the safe-cast check is ALIAS-SPECIFIC — a line that
# widens one operand while leaving a second product of the same alias
# un-widened, or that merely mentions DECIMAL elsewhere (a different
# column's cast), no longer suppresses the flag. A product is safe when
# the widening cast wraps the flagged alias itself, wraps the operand
# directly adjacent to the *, or the adjacent operand is a float literal.
_E_LIT = r"\d+(?:\.\d+)?[eE]\d+"


def _safe_product(line: str, alias: str) -> bool:
    wide = r"(?:DECIMAL|HUGEINT|DOUBLE\s+PRECISION)"
    pats = [
        # CAST(alias ... AS DECIMAL/HUGEINT ...)  — the alias is widened
        rf"CAST\s*\(\s*{alias}\b[^()]*AS\s+{wide}",
        # DuckDB postfix cast on the alias
        rf"\b{alias}\s*::\s*{wide}",
        # the operand adjacent to the * is an explicit widening cast
        rf"AS\s+{wide}[^()]*\)\s*(?:\)\s*)*\*",
        rf"\*\s*CAST\s*\([^()]*AS\s+{wide}",
        # float e-notation literal adjacent to the *
        rf"{_E_LIT}\s*\*",
        rf"\*\s*{_E_LIT}\b",
    ]
    return any(re.search(p, line, re.IGNORECASE) for p in pats)


def window_sites(path: str):
    """Yield (lineno, kind, arg, alias, line) for each window-agg site."""
    with open(path) as f:
        lines = f.readlines()
    for i, line in enumerate(lines, 1):
        for m in list(PY_WIN.finditer(line)) + list(SQL_WIN.finditer(line)):
            # the alias usually trails on the same or next 2 lines
            tail = "".join(lines[i - 1 : i + 2])
            am = ALIAS_PY.search(tail) or ALIAS_SQL.search(tail)
            alias = am.group("alias") if am else "?"
            yield i, m.re is PY_WIN and "py" or "sql", m.group("arg"), alias, line.strip()


def integer_products(path: str, alias: str, after: int):
    """Lines after the window site — up to the next top-level ``def``
    (the enclosing query's end) — where the alias is multiplied or
    squared without DECIMAL/HUGEINT widening on the same line. Bounding
    at the def boundary keeps common aliases (cnt, n, cc) from being
    flagged against an unrelated query later in the same wave file."""
    hits = []
    pat = re.compile(
        rf"(\b{alias}\b\s*\*|\*\s*{alias}\b|POW\s*\(\s*{alias}\b|\b{alias}\s*\^)",
        re.IGNORECASE,
    )
    with open(path) as f:
        for j, line in enumerate(f, 1):
            if j <= after:
                continue
            if line.startswith("def "):
                break  # left the enclosing query (and its oracle string)
            if pat.search(line) and not _safe_product(line, alias):
                hits.append((j, line.strip()))
    return hits


def main() -> None:
    list_all = "--all" in sys.argv
    files = sorted(
        glob.glob(os.path.join(REPO, "aircan_spark", "ext", "queries_w*.py"))
    ) + [os.path.join(REPO, "aircan_spark", "ext", "_qcommon.py")]
    n_sites = n_flag = 0
    for path in files:
        rel = os.path.relpath(path, REPO)
        for lineno, kind, arg, alias, line in window_sites(path):
            n_sites += 1
            prods = integer_products(path, alias, lineno) if alias != "?" else []
            if prods:
                n_flag += 1
                print(f"FLAG {rel}:{lineno} [{kind}] {alias} <- {line[:90]}")
                for j, pl in prods[:4]:
                    print(f"     product @ {rel}:{j}  {pl[:100]}")
            elif list_all:
                print(f"     {rel}:{lineno} [{kind}] {alias} <- {line[:90]}")
    print(f"\n{n_sites} window-aggregate sites scanned, {n_flag} with an "
          "un-cast downstream integer product (audit these by magnitude)")


if __name__ == "__main__":
    main()
