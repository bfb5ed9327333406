#!/usr/bin/env python3
"""Oracle-portability lint: flag DuckDB oracle SQL whose COMPARED columns
could change type across DuckDB versions and fail the driver's type-sensitive
hash compare while the values are still equal (the r6 q69 bug).

Two checks, both over the FINAL projection of each oracle (the only
expressions the driver hashes):

1. un-CAST widening aggregates — DuckDB defines sum(BIGINT) -> HUGEINT
   already, and integer aggregates like count_if have widened across
   versions; every compared integer aggregate must be CAST-pinned
   (`CAST(... AS BIGINT)`).
2. bare decimal literals in compared arithmetic — DuckDB decimal literals
   are DECIMAL, not DOUBLE, so `x * 1.0` is DECIMAL arithmetic with
   version-variable precision; compared floats must be pinned via
   `CAST(... AS DOUBLE)` or a terminal `round(..., n)` (which returns
   DOUBLE for DOUBLE input and absorbs libm ulp drift too).

Additionally runs each oracle against DuckDB (schema only, LIMIT 0) and
flags result columns whose CURRENT type is already non-portable
(HUGEINT/INT128 or DECIMAL) — the case where the local DuckDB agrees with
the repo's rules but the compare would still be fragile.

Usage: python3 tools/lint_oracle.py [<sfdir>] [<verify_outdir>]
Reads <verify_outdir>/oracle_sql.json (written by graft.Verify).
Exit 0 = clean, 1 = findings.
"""
import json
import os
import re
import sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Aggregates whose integer result types have widened (or can widen) across
# DuckDB versions. avg/min/max/round keep their input-derived types; count(*)
# is contractually BIGINT.
RISKY_AGGS = ("sum", "count_if")


def strip_strings(sql: str) -> str:
    """Blank out string literals so quoted text can't fake syntax."""
    return re.sub(r"'(?:[^']|'')*'", lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", sql)


def final_projection(sql: str) -> str:
    """The select list of the outermost (final) SELECT: text between the last
    paren-depth-0 SELECT keyword and the matching depth-0 FROM/ORDER/end."""
    s = strip_strings(sql)
    depth = 0
    last_select = -1
    for m in re.finditer(r"[()]|\bSELECT\b|\bFROM\b|\bORDER\s+BY\b", s, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif tok.upper() == "SELECT" and depth == 0:
            last_select = m.end()
    if last_select < 0:
        return s
    depth = 0
    for m in re.finditer(r"[()]|\bFROM\b|\bORDER\s+BY\b", s[last_select:], re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return s[last_select:last_select + m.start()]
    return s[last_select:]


def split_top_level(expr_list: str):
    out, depth, cur = [], 0, []
    for ch in expr_list:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [e.strip() for e in out if e.strip()]


def inside_pin(expr: str, pos: int) -> bool:
    """Is position `pos` inside a CAST(...) or round(...) call?"""
    for m in re.finditer(r"\b(?:CAST|round)\s*\(", expr, re.I):
        if m.end() > pos:
            continue
        depth = 1
        i = m.end()
        while i < len(expr) and depth > 0:
            if expr[i] == "(":
                depth += 1
            elif expr[i] == ")":
                depth -= 1
            i += 1
        if pos < i:
            return True
    return False


def lint_expr(name: str, expr: str, findings: list):
    for agg in RISKY_AGGS:
        for m in re.finditer(r"\b" + agg + r"\s*\(", expr, re.I):
            if not inside_pin(expr, m.start()):
                snippet = expr if len(expr) <= 90 else expr[:90] + "..."
                findings.append(
                    (name, f"un-CAST `{agg}` in compared expression: {snippet}"))
    # bare decimal literal taking part in arithmetic (not a round() scale arg,
    # not already inside a CAST/round pin)
    for m in re.finditer(r"\d+\.\d+", expr):
        if inside_pin(expr, m.start()):
            continue
        around = expr[max(0, m.start() - 3):m.end() + 3]
        if re.search(r"[*/+\-]", around):
            findings.append((name, f"bare decimal literal `{m.group(0)}` in "
                                   f"compared arithmetic: ...{around}..."))


def main():
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    findings = []
    for name in sorted(oracle):
        proj = final_projection(oracle[name])
        for expr in split_top_level(proj):
            lint_expr(name, expr, findings)

    # Live-schema pass: current DuckDB already yielding a non-portable type.
    try:
        import duckdb
        con = duckdb.connect()
        for t in ["region", "nation", "customer", "supplier", "part", "orders",
                  "lineitem", "events", "documents", "embeddings"]:
            p = os.path.join(sfdir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for name in sorted(oracle):
            try:
                rel = con.execute(
                    f"SELECT * FROM ({oracle[name]}) LIMIT 0")
                for col, typ in zip([d[0] for d in rel.description],
                                    [str(d[1]) for d in rel.description]):
                    if any(bad in typ.upper() for bad in ("HUGEINT", "INT128", "DECIMAL")):
                        findings.append(
                            (name, f"column `{col}` has non-portable DuckDB "
                                   f"type {typ} — CAST-pin it"))
            except Exception as e:
                findings.append((name, f"oracle failed to plan: {e}"))
    except ImportError:
        print("NOTE: duckdb not importable here — textual lint only",
              file=sys.stderr)

    if findings:
        for name, msg in findings:
            print(f"LINT {name}: {msg}")
        print(f"\n{len(findings)} finding(s) across "
              f"{len(set(n for n, _ in findings))} oracle(s)")
        return 1
    print(f"lint clean: {len(oracle)} oracles, 0 findings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
