"""Boundary-proximity linter for round()-over-double oracles (r16,
VERDICT r15 #2/#3).

The r15 driver gate flipped two first-contact hash rows on exactly one
mechanism: an emitted ``round(x, d)`` whose pre-round double sits at (or
within float error of) a half boundary rounds differently across engines
and across DuckDB builds (decimal-exact HALF_UP vs multiply-based libm
rounding). This linter measures how close every rounded value actually
gets to a boundary, per query, per scale:

  for each un-quantized ``round(EXPR, d)`` in an oracle, the probe
  rewrites it to    abs(frac(EXPR * 10^d) - 0.5) * 1e9
  (scaled so the distance survives outer integer casts) and runs the
  rewritten SQL on DuckDB at each SF; any value < ~1 means the pre-round
  double lies within ~1e-9 of a .5*10^-d boundary — a hash flip waiting
  for a different engine or build.

Occurrences already quantized through DECIMAL (the pane-query pattern
``round(CAST(x AS DECIMAL(38,12)), d)``) are deterministic by
construction and are skipped. Rounds with non-literal digit args are
reported as unparsed. Queries that use round() inside predicates
(WHERE/ON/HAVING) get a distorted row set under rewrite and are listed
for manual review rather than trusted blindly.

Usage: python tools/round_lint.py [sf_dir ...] [--threshold N] [name ...]
Default sf_dirs: sf0.001 sf0.01 sf0.1. Exit 1 if any query is flagged.
"""

from __future__ import annotations

import re
import sys

import duckdb

sys.path.insert(0, "/root/repo")

THRESHOLD = 1.0  # scaled units of 1e-9 absolute distance to the boundary
PROBE_OFFSET = 1.0e15  # marks a probe column value; exact in float64


def _scan(sql: str):
    """Quote-aware scan for top-level ``round(...)`` spans.

    Returns (start, end, inner_expr, digits|None, quantized) tuples;
    digits None means a non-literal second argument (unparsable).
    """
    out = []
    low = sql.lower()
    i = 0
    while True:
        k = low.find("round(", i)
        if k < 0:
            break
        if k > 0 and (low[k - 1].isalnum() or low[k - 1] == "_"):
            i = k + 6
            continue
        depth = 0
        j = k + 5
        in_str = False
        while j < len(sql):
            c = sql[j]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        inner = sql[k + 6 : j]
        depth2 = 0
        comma = -1
        in_str = False
        for m, c in enumerate(inner):
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c in "([":
                depth2 += 1
            elif c in ")]":
                depth2 -= 1
            elif c == "," and depth2 == 0:
                comma = m  # keep LAST top-level comma (args are expr, d)
        if comma < 0:
            expr, digits = inner, 0
        else:
            expr, dstr = inner[:comma], inner[comma + 1 :].strip()
            digits = int(dstr) if re.fullmatch(r"-?\d+", dstr) else None
        quantized = _is_quantized(expr)
        out.append((k, j + 1, expr, digits, quantized))
        # a QUANTIZED round is skipped by the probe rewrite, so keep
        # scanning INSIDE its argument — a raw round nested there still
        # perturbs the value before quantization and must be probed; an
        # unquantized round is itself rewritten, so its nested rounds are
        # covered by the outer probe (overlapping rewrites would corrupt
        # the span arithmetic)
        i = (k + 6) if quantized else j
    return out


def _is_quantized(expr: str) -> bool:
    """True only when the round's WHOLE argument is a CAST(... AS
    DECIMAL...) — the det_round pattern. The earlier substring test
    ("AS DECIMAL" anywhere) mis-classified a raw outer round whose
    argument merely CONTAINS a quantized sub-expression, e.g.
    ``round(det_round_output / y, 2)`` — exactly the r15 flip class,
    silently exempted from probing (r16 review)."""
    e = expr.strip()
    if not re.match(r"(?i)^CAST\s*\(", e):
        return False
    # the CAST's close paren must be the END of the expression
    start = e.index("(")
    depth = 0
    in_str = False
    for idx in range(start, len(e)):
        c = e[idx]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return idx == len(e) - 1 and bool(
                    re.search(r"(?i)AS\s+DECIMAL", e)
                )
    return False


def probe_sql(sql: str):
    """Rewrite every unquantized literal-digit round() to its scaled
    boundary distance. Returns (rewritten_sql, n_rewritten, n_skipped,
    n_unparsed)."""
    spans = _scan(sql)
    n_q = sum(1 for s in spans if s[4])
    n_u = sum(1 for s in spans if s[3] is None)
    todo = [s for s in spans if not s[4] and s[3] is not None]
    for start, end, expr, d, _ in sorted(todo, reverse=True):
        scale = 10.0 ** d
        # probe values carry a 1e15 marker offset so the flag pass can
        # tell them apart from ordinary emitted floats (a raw ratio
        # column's 0.08 must not read as "0.08e-9 from a boundary")
        repl = (
            f"(abs((({expr}) * {scale!r}) - floor(({expr}) * {scale!r})"
            f" - 0.5) * 1000000000.0 + {PROBE_OFFSET!r})"
        )
        sql = sql[:start] + repl + sql[end:]
    return sql, len(todo), n_q, n_u


_PRED_RE = re.compile(
    r"\b(where|having|qualify)\b[^;]*?round\(|join[^;]*?\bon\b[^;]*?round\(",
    re.IGNORECASE | re.DOTALL,
)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    threshold = THRESHOLD
    if "--threshold" in args:
        ix = args.index("--threshold")
        threshold = float(args[ix + 1])
        del args[ix : ix + 2]
    sf_dirs = [a for a in args if "/" in a] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    only = {a for a in args if "/" not in a}

    import __spark_entry__ as entrymod
    from wallaroo_spark.session import TABLES

    oracles = entrymod.oracle_sql()
    flagged, predicate_cases, unparsed_cases = [], [], []

    for sf_dir in sf_dirs:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name, sql in oracles.items():
            if only and name not in only:
                continue
            rewritten, n_probe, n_quant, n_unparsed = probe_sql(sql)
            if n_unparsed and name not in unparsed_cases:
                unparsed_cases.append(name)
            if n_probe == 0:
                continue
            if _PRED_RE.search(sql) and name not in predicate_cases:
                predicate_cases.append(name)
            try:
                rows = con.sql(rewritten).fetchall()
            except Exception as exc:  # rewrite broke the query — report
                print(f"ERR  {name} [{sf_dir.rsplit('/', 1)[-1]}]: {exc}")
                flagged.append((name, "probe-error"))
                continue
            worst = None
            n_close = 0
            for r in rows:
                for v in r:
                    # only probe-marked values (offset band); an ordinary
                    # emitted float (a ratio 0.08, a literal 0.5 quantile
                    # label) must not read as a boundary distance
                    if isinstance(v, float) and PROBE_OFFSET <= v < 2 * PROBE_OFFSET:
                        v -= PROBE_OFFSET
                        if worst is None or v < worst:
                            worst = v
                        if v < threshold:
                            n_close += 1
            if worst is not None and worst < threshold:
                print(
                    f"FLAG {name} [{sf_dir.rsplit('/', 1)[-1]}]: "
                    f"{n_close} value(s) within {worst:.3g}e-9 of a "
                    f"round boundary ({n_probe} probes)"
                )
                flagged.append((name, sf_dir))
    if predicate_cases:
        print(
            "\npredicate-round queries (rewrite distorts the row set — "
            "review emitted columns manually):"
        )
        for n in predicate_cases:
            print(f"    {n}")
    if unparsed_cases:
        print("\nnon-literal round digits (not probed):")
        for n in unparsed_cases:
            print(f"    {n}")
    uniq = sorted({n for n, _ in flagged})
    print(f"\nflagged queries: {len(uniq)}")
    for n in uniq:
        print(f"    {n}")
    return 1 if uniq else 0


if __name__ == "__main__":
    raise SystemExit(main())
