"""Round-11: the window-moment scanner runs IN the suite (r10 VERDICT
item 4). Every scale decade so far surfaced a new integer-moment
overflow class (r8: plain sums; r9: pareto_knee's window-cumsum
product; r10: wilcoxon's cubic tie term), and each was caught by a
smoke or a judge, not by CI. This test pins the scanner's flag set to
the r10-audited inventory (PERFORMANCE.md round-10 table): a NEW
window-carried integer product that is not DECIMAL/HUGEINT-widened
fails the suite until it is audited by magnitude at sf1000 and either
fixed or added here WITH its PERFORMANCE.md row.

The pin is (file, alias) multiplicity, not line numbers — edits above a
site must not churn the pin; a new flag on an already-audited alias in
the same file (a second product of the same shape) DOES change the
multiset and correctly demands a fresh audit.

No SparkSession needed: the scanner is pure source-text analysis.
"""

from __future__ import annotations

import collections
import importlib.util
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The r10 magnitude-audited inventory (PERFORMANCE.md "Round 10:
# window-moment margin audit", re-verified r11 after the alias-specific
# safe-cast tightening left the set unchanged). Every entry is a
# *audited-safe* or *fixed-with-pinned-regression* site.
AUDITED_FLAGS: dict[tuple[str, str], int] = {
    ("aircan_spark/ext/queries_w04.py", "n"): 2,
    ("aircan_spark/ext/queries_w05.py", "cum"): 2,
    ("aircan_spark/ext/queries_w07.py", "p"): 1,
    ("aircan_spark/ext/queries_w09.py", "gcnt"): 1,
    ("aircan_spark/ext/queries_w13.py", "ck"): 1,
    ("aircan_spark/ext/queries_w14.py", "cc"): 1,
    ("aircan_spark/ext/queries_w16.py", "cc"): 1,
    ("aircan_spark/ext/queries_w22.py", "cr"): 1,
    ("aircan_spark/ext/queries_w24.py", "mtests"): 1,
    ("aircan_spark/ext/queries_w30.py", "cc"): 1,
    ("aircan_spark/ext/queries_w30.py", "n"): 1,
    ("aircan_spark/ext/queries_w32.py", "rk"): 1,
    ("aircan_spark/ext/queries_w33.py", "cc"): 1,
    ("aircan_spark/ext/queries_w33.py", "n"): 1,
    ("aircan_spark/ext/queries_w35.py", "S"): 1,
    ("aircan_spark/ext/queries_w35.py", "cs"): 1,
    ("aircan_spark/ext/queries_w36.py", "cc"): 1,
    ("aircan_spark/ext/queries_w36.py", "n"): 1,
    ("aircan_spark/ext/queries_w38.py", "cc"): 1,
    ("aircan_spark/ext/queries_w38.py", "ct"): 1,
    ("aircan_spark/ext/queries_w38.py", "n"): 1,
    ("aircan_spark/ext/queries_w40.py", "cc"): 1,
    ("aircan_spark/ext/queries_w40.py", "n"): 1,
    ("aircan_spark/ext/queries_w42.py", "n"): 1,
    ("aircan_spark/ext/queries_w42.py", "rank2"): 1,
    ("aircan_spark/ext/queries_w45.py", "cc"): 1,
    ("aircan_spark/ext/queries_w45.py", "n"): 1,
}


def _load_scanner():
    path = os.path.join(REPO, "scripts", "window_moment_audit.py")
    spec = importlib.util.spec_from_file_location("window_moment_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _current_flags() -> collections.Counter:
    import glob

    mod = _load_scanner()
    files = sorted(
        glob.glob(os.path.join(REPO, "aircan_spark", "ext", "queries_w*.py"))
    ) + [os.path.join(REPO, "aircan_spark", "ext", "_qcommon.py")]
    flags: collections.Counter = collections.Counter()
    for path in files:
        rel = os.path.relpath(path, REPO)
        for lineno, _kind, _arg, alias, _line in mod.window_sites(path):
            if alias == "?":
                continue
            if mod.integer_products(path, alias, lineno):
                flags[(rel, alias)] += 1
    return flags


def test_no_new_unaudited_window_moment_products():
    cur = _current_flags()
    pinned = collections.Counter(AUDITED_FLAGS)
    new = cur - pinned
    assert not new, (
        "NEW un-audited window-moment integer products (audit each by "
        "magnitude at the sf1000 design point, widen to DECIMAL/HUGEINT "
        "or record the margin in PERFORMANCE.md, then extend "
        f"AUDITED_FLAGS): {dict(new)}"
    )
    gone = pinned - cur
    assert not gone, (
        "pinned audit sites no longer flagged (site fixed/removed? — "
        f"update AUDITED_FLAGS and PERFORMANCE.md in lockstep): {dict(gone)}"
    )


def test_scanner_still_detects_the_cubic_shape(tmp_path):
    """The scanner itself must keep flagging the wilcoxon cubic shape and
    stay quiet on the DECIMAL-widened fix — the pin is only as strong as
    the scanner behind it (complements test_round10_window_moments)."""
    mod = _load_scanner()
    bad = tmp_path / "queries_w99.py"
    bad.write_text(
        'SQL = """\n'
        "SELECT SUM(cnt) OVER () AS tot,\n"
        "       tot * tot AS sq\n"
        'FROM t\n"""\n'
    )
    sites = list(mod.window_sites(str(bad)))
    assert sites and sites[0][3] == "tot"
    assert mod.integer_products(str(bad), "tot", sites[0][0])

    fixed = tmp_path / "queries_w98.py"
    fixed.write_text(
        'SQL = """\n'
        "SELECT SUM(cnt) OVER () AS tot,\n"
        "       CAST(tot AS DECIMAL(38,0)) * tot AS sq\n"
        'FROM t\n"""\n'
    )
    sites = list(mod.window_sites(str(fixed)))
    assert sites and not mod.integer_products(str(fixed), "tot", sites[0][0])


def test_alias_specific_safe_cast():
    """r11 ADVICE: a DECIMAL mention elsewhere on the line (another
    column's cast) must NOT suppress the flag for an un-widened product
    of the window alias."""
    mod = _load_scanner()
    # un-widened tot*tot next to an unrelated DECIMAL cast -> still unsafe
    line = "CAST(other AS DECIMAL(38,0)) + tot * tot AS sq"
    assert not mod._safe_product(line, "tot")
    # the alias itself widened -> safe
    assert mod._safe_product("CAST(tot AS DECIMAL(38,0)) * tot", "tot")
    # DuckDB postfix form -> safe
    assert mod._safe_product("tot::HUGEINT * tot", "tot")
    # adjacent float literal widens the arithmetic -> safe
    assert mod._safe_product("40e0 * tot", "tot")
    # e-notation inside an unrelated token must not match
    assert not mod._safe_product("col_40e9x + tot * tot", "tot")
