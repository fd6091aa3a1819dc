"""Seeded randomized differential testing: Spark vs DuckDB on the same SQL.

The hand-built oracle registry (151 queries) is saturated green, so the
correctness frontier is queries nobody hand-picked.  This suite drives a
seeded generator over the testdata tables, composing
filter / project / equi-join / aggregate / window / set-op shapes —
and, from seed 400 (r11), forced outer-join aggregates, RANGE frames,
and aggregate→outer-join compositions — from a
cross-engine-safe expression grammar (the same dialect discipline the
registry's oracles follow: epoch-µs BIGINT for timestamps,
``CAST(SUM(int) AS BIGINT)`` against DuckDB's HUGEINT, no pow/exp, no
engine-specific rounding), renders ONE ANSI SQL text, runs it on BOTH
engines, and compares the result multisets with a float-tolerant,
order-insensitive comparator.  On mismatch it greedily SHRINKS the query
AST (drop WHERE/HAVING/DISTINCT, collapse expressions to bare columns,
drop select items, take one set-op branch, unwrap subqueries) and reports
the minimal failing SQL.

Generalizes the reference's golden-test philosophy
(/root/reference/processor/base_processor/timeseries/tests.py:124-177 —
fixed synthetic inputs with independently computed expected outputs) from
hand-picked goldens to seeded random coverage.

Determinism discipline baked into the grammar:

- window functions order by a TOTAL key (unique id as final tiebreaker)
  so ROW_NUMBER/LAG/frames are well-defined;
- group keys, join keys and set-op columns are int/string only (float
  equality never decides membership);
- floats appear only as computed outputs and are compared with relative
  tolerance (aggregation order differs between engines);
- `%` applies only to non-negative bare columns (negative-operand
  remainder is the one arithmetic op worth no cross-engine bet);
- integer arithmetic is bounded (multiply by single-digit literals only)
  so DuckDB's checked int64 and Spark's wrapping semantics never diverge;
- ROLLUP never combines with WHERE: this grammar MEASURED a real
  engine divergence (seeds 107/111/254 before the fence) — over an
  empty input relation DuckDB emits the grand-total grouping set's
  COUNT=0 row (the ANSI/PostgreSQL reading), Spark's Expand+groupBy
  plan emits nothing — so ROLLUP runs only on provably non-empty
  input, where the engines agree;
- RANGE frame order keys are widened to BIGINT: MEASURED divergence
  #2 (seed 573 of the r11 grammar) — Spark casts the frame offset to
  the ORDER BY column's type and throws CAST_OVERFLOW for an
  86400000000 offset over an INT key, DuckDB widens and evaluates;
- CORR is fenced out of the statistical-aggregate axis: MEASURED
  divergence #3 (seed 990 of the v5 grammar draft) — over a group
  where either argument has zero variance (n=1 or an in-group
  constant), Spark under ANSI mode throws DIVIDE_BY_ZERO
  (ArithmeticException) while DuckDB returns NULL; VAR_SAMP/VAR_POP/
  STDDEV_SAMP/STDDEV_POP/COVAR_SAMP/COVAR_POP agree on the same edge
  (NULL at n=1, 0.0 for constants — probed directly), so those stay.
- LATERAL subqueries with LIMIT correlate on a BARE outer column:
  MEASURED divergence #4 (seeds 1113/1131/… of the v6 grammar draft)
  — when the correlated EQUALITY inside a LIMITed lateral compares
  against an outer-column EXPRESSION (even `outer.col + 0`), Spark's
  decorrelation returns an EMPTY lateral for every outer row (inner
  lateral drops all rows, LEFT lateral NULL-pads them) while DuckDB
  returns the correct top-k — silent wrong results, not an error.
  Bare-column equality, inequality correlations (bare or expression),
  and aggregate laterals all agree, so those stay; the equality+LIMIT
  shape keeps the expression OUT of the outer side
  (test_measured_divergence_4_lateral_limit_expr pins the behavior so
  a future Spark fix surfaces as a failing pin, not silence).

The streaming half of this discipline lives in
tests/test_streaming_differential.py (seeded replay through the
stateful twins vs the equivalent batch window queries).
"""

from __future__ import annotations

import math
import random
from decimal import Decimal

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
# Seeds 0-399 render the ORIGINAL r10 grammar byte-for-byte (their
# queries must never drift — they are the regression corpus, and three
# of them found the ROLLUP divergence).  Seeds 400+ use the r11-extended
# grammar: FORCED outer-join + aggregate compositions (null-extended
# group keys, COUNT(col) vs COUNT(*) over unmatched rows), RANGE window
# frames (value-distance framing — peers included, so deterministic
# under ties), and aggregate→outer-join compositions (FULL JOIN of two
# GROUP BY subqueries on their group keys).
# Seeds 716+ use the r12-extended grammar: window functions over JOIN
# results (total order via the child side's unique key), INTERSECT ALL /
# EXCEPT ALL under deliberately duplicated projections (multiset
# semantics), and pivot-shaped conditional aggregates (CASE-filtered
# SUM/COUNT/MAX per pooled value — NULL vs 0 discipline).  Seeds 860+
# add membership subqueries: [NOT] IN with NULLIF-injected NULLs (the
# three-valued-logic trap Spark compiles to a null-aware anti join) and
# correlated [NOT] EXISTS.  Seeds 920+ use the r12 grammar v5:
# correlated SCALAR subqueries in the select list (COUNT must be 0 over
# empty correlation, MAX/MIN NULL — Spark's rewrite to an outer-join
# aggregate is the classic "COUNT bug" site) and uncorrelated scalar
# subqueries in WHERE comparisons, DISTINCT aggregates (incl. several
# in one query — Spark plans an Expand), and statistical aggregates
# (VAR/STDDEV SAMP+POP, COVAR — float-tolerance compared; CORR
# fenced, measured divergence #3).  Seeds 1000+ use the r12 grammar
# v6: correlated LATERAL subqueries in FROM, CTE-consumed-twice reuse
# shapes, and NULLS FIRST/LAST + LIMIT/OFFSET pagination (which found
# measured divergence #4, fenced in gen_lateral).  Seeds 1250+ use
# v7: explicit GROUPING SETS with GROUPING() markers on non-empty
# bases, FULL-JOIN/COALESCE-key aggregation with null-side counters,
# and projection-position [NOT] EXISTS inside CASE.
# Seeds 0-859 keep rendering their earlier grammars byte-for-byte (the
# regression corpus that found the ROLLUP and RANGE-frame divergences).
# Seeds 1550+ use the r14 grammar v9: the portable dense_rank/max
# COUNT(DISTINCT)-per-partition rewrite (probing the engines' opposite
# window null ordering without comparing rank values), epoch-µs
# date/interval arithmetic (trunc-division bucketing, negative
# day-differences probing dividend-sign %), and explicit NULLS
# FIRST/LAST pagination over REAL outer-join nulls.
# Seeds 1350+ use the r13 grammar v8: QUALIFY-style window filters
# (windowed subquery, outer filter on the window column — top-k per
# partition, dedup-keep-first), multi-level CTE chains consumed by
# set-ops (both branches reading the same CTEs), and correlated
# aggregate subqueries in HAVING (Spark's outer-join-aggregate
# rewrite, the classic COUNT-bug site — probed portable on both
# engines before the band was added).
# Seeds 1650+ use the r14-continuation grammar v10: bounded
# WITH RECURSIVE accumulation chains (Spark 4's new recursive-CTE
# executor vs DuckDB's mature one) joined back to base tables on
# modulo keys, FILTER-clause conditional aggregation (multiple
# filtered aggregates per group + filtered HAVING), and a try_cast
# gauntlet over deterministically corrupted digit strings.  Fenced by
# construction: decimal-string -> BIGINT try_cast diverges (Spark
# NULLs, DuckDB rounds — probed before the axis was added), so BIGINT
# targets only ever see integer-format or corrupted strings.
N_SEEDS = 1750

# normalized view schemas: every timestamp is pre-projected to epoch-µs
# BIGINT in the view DDL (unix_micros in Spark, epoch_us in DuckDB), so
# the generated SQL is engine-agnostic.  types: i=int, f=float, s=string
TABLES: dict[str, list[tuple[str, str]]] = {
    "fz_region": [("r_regionkey", "i"), ("r_name", "s")],
    "fz_nation": [("n_nationkey", "i"), ("n_name", "s"), ("n_regionkey", "i")],
    "fz_customer": [
        ("c_custkey", "i"), ("c_name", "s"), ("c_nationkey", "i"),
        ("c_acctbal", "f"), ("c_mktsegment", "s"),
    ],
    "fz_supplier": [
        ("s_suppkey", "i"), ("s_name", "s"), ("s_nationkey", "i"),
        ("s_acctbal", "f"),
    ],
    "fz_part": [
        ("p_partkey", "i"), ("p_name", "s"), ("p_brand", "s"),
        ("p_type", "s"), ("p_size", "i"), ("p_retailprice", "f"),
    ],
    "fz_orders": [
        ("o_orderkey", "i"), ("o_custkey", "i"), ("o_orderstatus", "s"),
        ("o_totalprice", "f"), ("o_date_us", "i"), ("o_orderpriority", "s"),
    ],
    "fz_lineitem": [
        ("l_orderkey", "i"), ("l_partkey", "i"), ("l_suppkey", "i"),
        ("l_linenumber", "i"), ("l_quantity", "f"), ("l_extendedprice", "f"),
        ("l_discount", "f"), ("l_tax", "f"), ("l_returnflag", "s"),
        ("l_linestatus", "s"), ("l_ship_us", "i"),
    ],
    "fz_events": [
        ("event_id", "i"), ("ts_us", "i"), ("user_id", "i"),
        ("event_type", "s"), ("value", "f"), ("props", "s"),
    ],
    "fz_documents": [
        ("doc_id", "i"), ("text", "s"), ("lang", "s"), ("source", "s"),
        ("n_chars", "i"),
    ],
}

# total-order tiebreak columns per table (unique key)
UNIQUE: dict[str, list[str]] = {
    "fz_region": ["r_regionkey"],
    "fz_nation": ["n_nationkey"],
    "fz_customer": ["c_custkey"],
    "fz_supplier": ["s_suppkey"],
    "fz_part": ["p_partkey"],
    "fz_orders": ["o_orderkey"],
    # NOTE (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # testdata (1161 duplicate pairs at sf0.001 — seed 9 found this);
    # the 5-column superset below is verified unique at the pinned
    # SF_DIR.  Float tiebreaks are fine: double comparison is exact and
    # identical in both engines.
    "fz_lineitem": [
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice",
    ],
    "fz_events": ["event_id"],
    "fz_documents": ["doc_id"],
}

# equi-join pairs: (left table, left col, right table, right col)
FK_JOINS = [
    ("fz_nation", "n_regionkey", "fz_region", "r_regionkey"),
    ("fz_customer", "c_nationkey", "fz_nation", "n_nationkey"),
    ("fz_supplier", "s_nationkey", "fz_nation", "n_nationkey"),
    ("fz_orders", "o_custkey", "fz_customer", "c_custkey"),
    ("fz_lineitem", "l_orderkey", "fz_orders", "o_orderkey"),
    ("fz_lineitem", "l_partkey", "fz_part", "p_partkey"),
    ("fz_lineitem", "l_suppkey", "fz_supplier", "s_suppkey"),
    ("fz_events", "user_id", "fz_customer", "c_custkey"),
]

_VIEW_SRC = {
    "fz_orders": (
        "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        "{ep_o} AS o_date_us, o_orderpriority FROM {orders}"
    ),
    "fz_lineitem": (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "{ep_l} AS l_ship_us FROM {lineitem}"
    ),
    "fz_events": (
        "SELECT event_id, {ep_e} AS ts_us, user_id, event_type, value, "
        "props FROM {events}"
    ),
}


@pytest.fixture(scope="module")
def engines(spark):
    """Register the normalized fz_ views on both engines and sample
    deterministic literal pools from the data."""
    con = duckdb.connect()
    for name in TABLES:
        base = name[3:]
        path = f"{SF_DIR}/{base}.parquet"
        if name in _VIEW_SRC:
            tmpl = _VIEW_SRC[name]
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
                + tmpl.format(
                    ep_o="unix_micros(cast(o_orderdate as timestamp))",
                    ep_l="unix_micros(cast(l_shipdate as timestamp))",
                    ep_e="unix_micros(cast(ts as timestamp))",
                    orders=f"parquet.`{path}`",
                    lineitem=f"parquet.`{path}`",
                    events=f"parquet.`{path}`",
                )
            )
            con.execute(
                f"CREATE VIEW {name} AS "
                + tmpl.format(
                    ep_o="epoch_us(o_orderdate)",
                    ep_l="epoch_us(l_shipdate)",
                    ep_e="epoch_us(ts)",
                    orders=f"read_parquet('{path}')",
                    lineitem=f"read_parquet('{path}')",
                    events=f"read_parquet('{path}')",
                )
            )
        else:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {name} AS "
                f"SELECT * FROM parquet.`{path}`"
            )
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    pools: dict[tuple[str, str], list] = {}
    for tname, cols in TABLES.items():
        for col, typ in cols:
            if typ == "f":
                continue
            rows = con.execute(
                f"SELECT DISTINCT {col} FROM {tname} "
                f"WHERE {col} IS NOT NULL ORDER BY {col} LIMIT 7"
            ).fetchall()
            vals = [r[0] for r in rows]
            if typ == "s":
                # literal-safe: drop values with quote/LIKE metacharacters
                vals = [
                    v for v in vals
                    if "'" not in v and "%" not in v and "_" not in v
                ][:5]
            pools[(tname, col)] = vals
    yield spark, con, pools
    con.close()


# ---------------------------------------------------------------------------
# expression grammar
# ---------------------------------------------------------------------------


def _lit(typ, rng, pools, tname, cols):
    if typ == "i":
        pool_cols = [c for c, t in cols if t == "i" and pools.get((tname, c))]
        if pool_cols and rng.random() < 0.7:
            return str(rng.choice(pools[(tname, rng.choice(pool_cols))]))
        return str(rng.randint(0, 100))
    if typ == "f":
        # exponent form: Spark parses a bare decimal literal as
        # DECIMAL(p,s) (AVG then returns Decimal), DuckDB as DOUBLE —
        # `e0` pins both to double
        return f"{round(rng.uniform(-100.0, 5000.0), 3)}e0"
    pool_cols = [c for c, t in cols if t == "s" and pools.get((tname, c))]
    if pool_cols:
        v = rng.choice(pools[(tname, rng.choice(pool_cols))])
        return "'" + v + "'"
    return "'x'"


def _col(typ, rng, cols):
    cands = [c for c, t in cols if t == typ]
    return rng.choice(cands) if cands else None


def gen_expr(typ, rng, cols, pools, tname, depth=2):
    """A scalar SQL expression of the given type over ``cols``."""
    base = _col(typ, rng, cols)
    if base is None:
        return _lit(typ, rng, pools, tname, cols), None
    if depth <= 0 or rng.random() < 0.4:
        return base, base
    if typ == "i":
        k = rng.randrange(6)
        if k == 0:
            a, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            b, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            return f"({a} + {b})", base
        if k == 1:
            a, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            b, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            return f"({a} - {b})", base
        if k == 2:
            return f"({base} * {rng.randint(2, 9)})", base
        if k == 3:
            # % only on a non-negative bare column (see module docstring)
            return f"({base} % {rng.randint(2, 13)})", base
        if k == 4:
            a, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            b, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            return f"ABS({a} - {b})", base
        p = gen_pred(rng, cols, pools, tname, depth - 1)
        a, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
        b, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)", base
    if typ == "f":
        k = rng.randrange(5)
        if k == 0:
            a, _ = gen_expr("f", rng, cols, pools, tname, depth - 1)
            b, _ = gen_expr("f", rng, cols, pools, tname, depth - 1)
            return f"({a} + {b})", base
        if k == 1:
            a, _ = gen_expr("f", rng, cols, pools, tname, depth - 1)
            b, _ = gen_expr("f", rng, cols, pools, tname, depth - 1)
            return f"({a} - {b})", base
        if k == 2:
            return f"ABS({base})", base
        if k == 3:
            a, _ = gen_expr("i", rng, cols, pools, tname, depth - 1)
            return f"CAST({a} AS DOUBLE)", base
        p = gen_pred(rng, cols, pools, tname, depth - 1)
        a, _ = gen_expr("f", rng, cols, pools, tname, depth - 1)
        b, _ = gen_expr("f", rng, cols, pools, tname, depth - 1)
        return f"(CASE WHEN {p} THEN {a} ELSE {b} END)", base
    k = rng.randrange(5)
    if k == 0:
        return f"UPPER({base})", base
    if k == 1:
        return f"LOWER({base})", base
    if k == 2:
        return f"SUBSTR({base}, 1, {rng.randint(1, 8)})", base
    if k == 3:
        return f"TRIM({base})", base
    other = _col("s", rng, cols)
    return f"({base} || {other})", base


def gen_pred(rng, cols, pools, tname, depth=2):
    k = rng.randrange(12)
    if k < 4 or depth <= 0:
        typ = rng.choice(["i", "i", "f", "s"])
        a, _ = gen_expr(typ, rng, cols, pools, tname, 1)
        ops = ["<", "<=", "=", "<>", ">", ">="]
        if rng.random() < 0.5:
            b = _lit(typ, rng, pools, tname, cols)
        else:
            b, _ = gen_expr(typ, rng, cols, pools, tname, 1)
        return f"({a} {rng.choice(ops)} {b})"
    if k == 4:
        typ = rng.choice(["i", "f"])
        c = _col(typ, rng, cols)
        if c is None:
            return "(1 = 1)"
        lo = _lit(typ, rng, pools, tname, cols)
        hi = _lit(typ, rng, pools, tname, cols)
        if float(lo) > float(hi):
            lo, hi = hi, lo
        return f"({c} BETWEEN {lo} AND {hi})"
    if k == 5:
        typ = rng.choice(["i", "s"])
        c = _col(typ, rng, cols)
        if c is None:
            return "(1 = 1)"
        lits = {_lit(typ, rng, pools, tname, cols) for _ in range(3)}
        return f"({c} IN ({', '.join(sorted(lits))}))"
    if k == 6:
        c = _col("s", rng, cols)
        if c is None:
            return "(1 = 1)"
        pool = pools.get((tname.split(" ")[0], c)) or []
        frag = None
        for v in pool:
            if len(v) >= 2:
                frag = v[: rng.randint(1, min(3, len(v)))]
                break
        frag = frag or "a"
        pat = rng.choice([f"%{frag}%", f"{frag}%", f"%{frag}"])
        return f"({c} LIKE '{pat}')"
    if k == 7:
        c, _ = gen_expr(rng.choice(["i", "s"]), rng, cols, pools, tname, 1)
        return f"({c} IS NOT NULL)"
    if k in (10, 11):
        # correlated subquery predicates — the semi/anti-join shapes
        # Catalyst rewrites (EXISTS → LeftSemi, NOT EXISTS → LeftAnti,
        # IN → semi with null-aware handling).  Correlation follows a
        # real FK edge from tname in either direction; column names are
        # globally unique in this schema, so the unqualified outer
        # reference is unambiguous even when the subquery's table also
        # appears in the outer FROM (inner scope shadows it).
        joins = [j for j in FK_JOINS if tname in (j[0], j[2])]
        if not joins:
            return "(1 = 1)"
        lt, lc, rt, rc = rng.choice(joins)
        local, ot, oc = (lc, rt, rc) if lt == tname else (rc, lt, lc)
        inner_pred = ""
        if rng.random() < 0.5:
            ic, ityp = rng.choice(TABLES[ot])
            lit = _lit(ityp, rng, pools, ot, TABLES[ot])
            op = rng.choice(["<", "<=", "=", "<>", ">", ">="])
            inner_pred = f" AND {ot}.{ic} {op} {lit}"
        neg = "NOT " if rng.random() < 0.4 else ""
        if k == 10:
            return (
                f"({neg}EXISTS (SELECT 1 FROM {ot} "
                f"WHERE {ot}.{oc} = {local}{inner_pred}))"
            )
        where = f" WHERE 1 = 1{inner_pred}" if inner_pred else ""
        return f"({local} {neg}IN (SELECT {oc} FROM {ot}{where}))"
    a = gen_pred(rng, cols, pools, tname, depth - 1)
    b = gen_pred(rng, cols, pools, tname, depth - 1)
    if k == 8:
        return f"({a} AND {b})"
    return f"({a} OR NOT {b})"


# ---------------------------------------------------------------------------
# query shapes (AST = nested dicts, rendered by render())
# ---------------------------------------------------------------------------


def _source(rng):
    """Pick a FROM source: a table or an FK equi-join.  Returns
    (from_sql, cols, tname_for_pools, unique_cols)."""
    if rng.random() < 0.35:
        lt, lc, rt, rc = rng.choice(FK_JOINS)
        jt = rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN"])
        from_sql = f"{lt} {jt} {rt} ON {lt}.{lc} = {rt}.{rc}"
        cols = TABLES[lt] + TABLES[rt]
        if jt == "LEFT JOIN":
            # right-side int/string cols become nullable; that's fine for
            # the grammar (no NOT NULL assumptions)
            pass
        return from_sql, cols, lt, UNIQUE[lt]
    t = rng.choice(list(TABLES))
    return t, TABLES[t], t, UNIQUE[t]


def gen_select(rng, pools):
    from_sql, cols, tname, uniq = _source(rng)
    n_items = rng.randint(1, 4)
    items = []
    for i in range(n_items):
        typ = rng.choice(["i", "i", "f", "s"])
        sql, fallback = gen_expr(typ, rng, cols, pools, tname)
        items.append({"alias": f"c{i}", "sql": sql, "fallback": fallback,
                      "typ": typ})
    if rng.random() < 0.15:
        # uncorrelated scalar subquery over an unrelated table —
        # constant-folded by both engines, same ANSI semantics
        ot = rng.choice(list(TABLES))
        oc = _col(rng.choice(["i", "s"]), rng, TABLES[ot])
        sub = (
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {ot})"
            if oc is None or rng.random() < 0.5
            else f"(SELECT MIN({oc}) FROM {ot})"
        )
        items.append({"alias": f"c{len(items)}", "sql": sub,
                      "fallback": None,
                      "typ": "i" if "COUNT" in sub else "s"})
    q = {
        "kind": "select",
        "from": from_sql,
        "items": items,
        "where": gen_pred(rng, cols, pools, tname)
        if rng.random() < 0.8 else None,
        "group": None,
        "having": None,
        "distinct": rng.random() < 0.25
        and all(it["typ"] != "f" for it in items),
    }
    return q


def gen_limit(rng, pools):
    """ORDER BY a unique-key prefix + LIMIT: the result SET is
    deterministic (total order), so the multiset compare still
    applies."""
    t = rng.choice(list(TABLES))
    cols, uniq = TABLES[t], UNIQUE[t]
    coltypes = dict(cols)
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    extra_typ = rng.choice(["i", "f", "s"])
    ec = _col(extra_typ, rng, cols)
    if ec is not None and ec not in uniq:
        items.append({"alias": f"c{len(items)}", "sql": ec,
                      "fallback": None, "typ": extra_typ})
    direction = rng.choice(["ASC", "DESC"])
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": gen_pred(rng, cols, pools, t)
        if rng.random() < 0.5 else None,
        "group": None,
        "having": None,
        "distinct": False,
        "order_by": ", ".join(f"{u} {direction}" for u in uniq),
        "limit": rng.randint(1, 40),
    }


def gen_agg(rng, pools):
    from_sql, cols, tname, uniq = _source(rng)
    n_keys = rng.randint(1, 2)
    keys, items = [], []
    for i in range(n_keys):
        typ = rng.choice(["i", "s"])
        c = _col(typ, rng, cols)
        if c is None:
            c = _col("i", rng, cols)
            typ = "i"
        k = rng.randrange(3)
        if typ == "i" and k == 0:
            key_sql = f"({c} % {rng.randint(2, 7)})"
        elif typ == "s" and k == 1:
            key_sql = f"UPPER({c})"
        else:
            key_sql = c
        keys.append(key_sql)
        items.append({"alias": f"c{i}", "sql": key_sql, "fallback": c,
                      "typ": typ})
    n_aggs = rng.randint(1, 3)
    for j in range(n_aggs):
        k = rng.randrange(7)
        alias = f"c{n_keys + j}"
        if k == 0:
            items.append({"alias": alias, "sql": "COUNT(*)",
                          "fallback": None, "typ": "i"})
        elif k == 1:
            c = _col(rng.choice(["i", "s", "f"]), rng, cols) or _col(
                "i", rng, cols
            )
            items.append({"alias": alias, "sql": f"COUNT({c})",
                          "fallback": None, "typ": "i"})
        elif k == 2:
            c = _col(rng.choice(["i", "s"]), rng, cols) or _col(
                "i", rng, cols
            )
            items.append({"alias": alias, "sql": f"COUNT(DISTINCT {c})",
                          "fallback": None, "typ": "i"})
        elif k == 3:
            e, _ = gen_expr("i", rng, cols, pools, tname, 1)
            items.append({"alias": alias,
                          "sql": f"CAST(SUM({e}) AS BIGINT)",
                          "fallback": None, "typ": "i"})
        elif k == 4:
            e, _ = gen_expr("f", rng, cols, pools, tname, 1)
            items.append({"alias": alias, "sql": f"SUM({e})",
                          "fallback": None, "typ": "f"})
        elif k == 5:
            typ = rng.choice(["i", "f", "s"])
            c = _col(typ, rng, cols)
            if c is None:
                typ = "i"
                c = _col("i", rng, cols)
            fn = rng.choice(["MIN", "MAX"])
            items.append({"alias": alias, "sql": f"{fn}({c})",
                          "fallback": None, "typ": typ})
        else:
            e, _ = gen_expr("f", rng, cols, pools, tname, 1)
            items.append({"alias": alias, "sql": f"AVG({e})",
                          "fallback": None, "typ": "f"})
    # ROLLUP occasionally: super-aggregate rows with NULL key markers.
    # MEASURED cross-engine hazard (seeds 107/111/254 of this grammar
    # found it): over an EMPTY input relation, DuckDB emits the
    # grand-total grouping set's row (COUNT=0 — the ANSI/PostgreSQL
    # reading: the () set is a global aggregate), while Spark's
    # Expand+groupBy plan emits nothing.  The grammar therefore only
    # rolls ROLLUP with no WHERE clause — the base tables are non-empty,
    # so the divergent empty-input case cannot arise; on non-empty
    # input the engines agree.
    rollup = rng.random() < 0.2
    group = [f"ROLLUP ({', '.join(keys)})"] if rollup else keys
    return {
        "kind": "select",
        "from": from_sql,
        "items": items,
        "where": None if rollup else (
            gen_pred(rng, cols, pools, tname)
            if rng.random() < 0.6 else None
        ),
        "group": group,
        "having": f"COUNT(*) > {rng.randint(0, 3)}"
        if rng.random() < 0.4 else None,
        "distinct": False,
    }


def gen_window(rng, pools):
    t = rng.choice([n for n in TABLES if n not in ("fz_region",)])
    cols, uniq = TABLES[t], UNIQUE[t]
    part = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
    order = _col(rng.choice(["i", "f", "s"]), rng, cols) or uniq[0]
    tie = ", ".join(uniq)
    total = f"{order}, {tie}"
    k = rng.randrange(7)
    if k == 0:
        wf = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total})"
        typ = "i"
    elif k == 1:
        fn = rng.choice(["RANK", "DENSE_RANK"])
        wf = f"{fn}() OVER (PARTITION BY {part} ORDER BY {order})"
        typ = "i"
    elif k == 2:
        c = _col("f", rng, cols) or uniq[0]
        fn = rng.choice(["LAG", "LEAD"])
        wf = f"{fn}({c}, 1) OVER (PARTITION BY {part} ORDER BY {total})"
        typ = "f"
    elif k == 3:
        c = _col("f", rng, cols)
        if c is None:
            c, typ = uniq[0], "i"
        else:
            typ = "f"
        n = rng.randint(1, 5)
        inner = (
            f"SUM({c}) OVER (PARTITION BY {part} ORDER BY {total} "
            f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW)"
        )
        wf = f"CAST({inner} AS BIGINT)" if typ == "i" else inner
    elif k == 4:
        c = _col("i", rng, cols) or uniq[0]
        wf = (
            f"CAST(COUNT({c}) OVER (PARTITION BY {part}) AS BIGINT)"
        )
        typ = "i"
    elif k == 5:
        # NTILE over a TOTAL order — tile boundaries are then
        # deterministic, and both engines use the ANSI bucket formula
        wf = f"NTILE({rng.randint(2, 8)}) OVER (PARTITION BY {part} ORDER BY {total})"
        typ = "i"
    else:
        c = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
        fn = rng.choice(["FIRST_VALUE", "LAST_VALUE"])
        # LAST_VALUE needs the full-partition frame to be well-defined
        # (the default frame ends at CURRENT ROW)
        wf = (
            f"{fn}({c}) OVER (PARTITION BY {part} ORDER BY {total} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        )
        typ = dict(cols).get(c, "i")
    coltypes = dict(cols)
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    items.append({"alias": f"c{len(items)}", "sql": wf, "fallback": None,
                  "typ": typ})
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": gen_pred(rng, cols, pools, t)
        if rng.random() < 0.5 else None,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_setop(rng, pools):
    typ = rng.choice(["i", "s"])
    sides = []
    for _ in range(2):
        t = rng.choice(list(TABLES))
        cols = TABLES[t]
        c = _col(typ, rng, cols)
        while c is None:
            t = rng.choice(list(TABLES))
            cols = TABLES[t]
            c = _col(typ, rng, cols)
        sides.append({
            "kind": "select",
            "from": t,
            "items": [{"alias": "c0", "sql": c, "fallback": None,
                       "typ": typ}],
            "where": gen_pred(rng, cols, pools, t)
            if rng.random() < 0.7 else None,
            "group": None,
            "having": None,
            "distinct": False,
        })
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    return {"kind": "setop", "op": op, "left": sides[0], "right": sides[1]}


def gen_nested(rng, pools):
    inner = gen_agg(rng, pools)
    icols = [(it["alias"], it["typ"]) for it in inner["items"]]
    rng2 = rng
    items = []
    for i, (c, typ) in enumerate(icols):
        items.append({"alias": f"c{i}", "sql": c, "fallback": None,
                      "typ": typ})
    pred_cols = [(c, t) for c, t in icols if t != "f"] or icols
    pc, pt = rng2.choice(pred_cols)
    if pt == "f":
        where = f"({pc} IS NOT NULL)"
    elif pt == "i":
        where = f"({pc} {rng2.choice(['>', '<', '>='])} {rng2.randint(0, 5)})"
    else:
        where = f"({pc} IS NOT NULL)"
    return {
        "kind": "select",
        "from": None,  # filled by render via 'inner'
        "inner": inner,
        "items": items,
        "where": where,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_outer_agg(rng, pools):
    """Aggregate OVER an outer join (r11): group by a key that the join
    null-extends, so the NULL group, COUNT(col)-vs-COUNT(*) over
    unmatched rows, and SUM-ignores-NULL all get exercised — the ANSI
    corners a LEFT/FULL join feeding a groupBy actually hits."""
    lt, lc, rt, rc = rng.choice(FK_JOINS)
    jt = rng.choice(["LEFT JOIN", "FULL JOIN", "FULL JOIN"])
    from_sql = f"{lt} {jt} {rt} ON {lt}.{lc} = {rt}.{rc}"
    cols = TABLES[lt] + TABLES[rt]
    # the right side is null-extended under LEFT JOIN (both under FULL)
    key_side = rt if rng.random() < 0.7 else lt
    gk = _col(rng.choice(["i", "s"]), rng, TABLES[key_side])
    if gk is None:
        gk = _col("i", rng, TABLES[key_side])
    items = [{"alias": "c0", "sql": gk, "fallback": None,
              "typ": dict(cols)[gk]}]
    n_aggs = rng.randint(1, 3)
    for j in range(n_aggs):
        alias = f"c{1 + j}"
        k = rng.randrange(5)
        if k == 0:
            items.append({"alias": alias, "sql": "COUNT(*)",
                          "fallback": None, "typ": "i"})
        elif k == 1:
            # count a column from the OTHER side: null-extended rows
            # must not count
            other = lt if key_side == rt else rt
            c = _col(rng.choice(["i", "s"]), rng, TABLES[other]) or _col(
                "i", rng, TABLES[other]
            )
            items.append({"alias": alias, "sql": f"COUNT({c})",
                          "fallback": None, "typ": "i"})
        elif k == 2:
            c = _col("i", rng, cols)
            items.append({"alias": alias,
                          "sql": f"CAST(SUM({c}) AS BIGINT)",
                          "fallback": None, "typ": "i"})
        elif k == 3:
            c = _col(rng.choice(["i", "s"]), rng, cols) or _col(
                "i", rng, cols
            )
            items.append({"alias": alias,
                          "sql": f"COUNT(DISTINCT {c})",
                          "fallback": None, "typ": "i"})
        else:
            typ = rng.choice(["i", "f"])
            c = _col(typ, rng, cols) or _col("i", rng, cols)
            fn = rng.choice(["MIN", "MAX"])
            items.append({"alias": alias, "sql": f"{fn}({c})",
                          "fallback": None, "typ": dict(cols)[c]})
    return {
        "kind": "select",
        "from": from_sql,
        "items": items,
        "where": gen_pred(rng, cols, pools, lt)
        if rng.random() < 0.4 else None,
        "group": [gk],
        "having": f"COUNT(*) > {rng.randint(0, 2)}"
        if rng.random() < 0.3 else None,
        "distinct": False,
    }


def gen_range_window(rng, pools):
    """RANGE window frames (r11): value-distance framing over a numeric
    ORDER BY.  Deterministic without a total order — RANGE frames
    include ALL peers of the boundary values — but the order key is
    filtered non-NULL (NULL-peer framing is the one corner the engines
    read differently enough to keep out of a differential oracle)."""
    t = rng.choice([n for n in TABLES if n != "fz_region"])
    cols, uniq = TABLES[t], UNIQUE[t]
    part = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
    # MEASURED cross-engine hazard (seed 573 of this grammar found it):
    # Spark casts the frame offset to the ORDER BY column's type — an
    # 86400000000 offset over an INT order key throws CAST_OVERFLOW
    # (ArithmeticException), while DuckDB widens and evaluates.  The
    # grammar therefore widens the order key to BIGINT explicitly,
    # where the engines agree for any int64 offset.
    order_col = _col("i", rng, cols) or uniq[0]
    order = f"CAST({order_col} AS BIGINT)"
    n = rng.choice([1, 2, 5, 10, 1_000, 1_000_000, 86_400_000_000])
    m = rng.choice([1, 2, 5, 10, 1_000, 1_000_000, 86_400_000_000])
    frame = rng.choice(
        [
            f"RANGE BETWEEN {n} PRECEDING AND CURRENT ROW",
            f"RANGE BETWEEN CURRENT ROW AND {m} FOLLOWING",
            f"RANGE BETWEEN {n} PRECEDING AND {m} FOLLOWING",
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ]
    )
    direction = rng.choice(["ASC", "DESC"])
    k = rng.randrange(5)
    if k == 0:
        c = _col("i", rng, cols) or uniq[0]
        wf = (
            f"CAST(SUM({c}) OVER (PARTITION BY {part} "
            f"ORDER BY {order} {direction} {frame}) AS BIGINT)"
        )
        typ = "i"
    elif k == 1:
        wf = (
            f"CAST(COUNT(*) OVER (PARTITION BY {part} "
            f"ORDER BY {order} {direction} {frame}) AS BIGINT)"
        )
        typ = "i"
    elif k == 2:
        c = _col("i", rng, cols) or uniq[0]
        fn = rng.choice(["MIN", "MAX"])
        wf = (
            f"{fn}({c}) OVER (PARTITION BY {part} "
            f"ORDER BY {order} {direction} {frame})"
        )
        typ = "i"
    elif k == 3:
        c = _col("f", rng, cols)
        if c is None:
            c, typ = uniq[0], "i"
            wf = (
                f"CAST(SUM({c}) OVER (PARTITION BY {part} "
                f"ORDER BY {order} {direction} {frame}) AS BIGINT)"
            )
        else:
            typ = "f"
            wf = (
                f"SUM({c}) OVER (PARTITION BY {part} "
                f"ORDER BY {order} {direction} {frame})"
            )
    else:
        c = _col("f", rng, cols) or uniq[0]
        typ = "f"
        wf = (
            f"AVG({c}) OVER (PARTITION BY {part} "
            f"ORDER BY {order} {direction} {frame})"
        )
    coltypes = dict(cols)
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    items.append({"alias": f"c{len(items)}", "sql": wf,
                  "fallback": None, "typ": typ})
    where = f"({order} IS NOT NULL)"
    if rng.random() < 0.5:
        where += f" AND {gen_pred(rng, cols, pools, t)}"
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": where,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_agg_join(rng, pools):
    """Aggregate→outer-join composition (r11): FULL/LEFT JOIN of two
    independent GROUP BY subqueries on their group keys — unmatched
    groups null-extend the other side's aggregate outputs."""

    def side(alias):
        t = rng.choice(list(TABLES))
        c = _col("i", rng, TABLES[t])
        key = f"({c} % {rng.randint(2, 9)})"
        agg = rng.choice(
            [
                "COUNT(*)",
                f"CAST(SUM({c}) AS BIGINT)",
                f"MIN({c})",
                f"MAX({c})",
            ]
        )
        where = (
            f" WHERE {gen_pred(rng, TABLES[t], pools, t, 1)}"
            if rng.random() < 0.5
            else ""
        )
        return (
            f"(SELECT {key} AS k, {agg} AS v FROM {t}{where} "
            f"GROUP BY {key}) {alias}"
        )

    jt = rng.choice(["FULL JOIN", "FULL JOIN", "LEFT JOIN", "JOIN"])
    from_sql = f"{side('fa')} {jt} {side('fb')} ON fa.k = fb.k"
    items = [
        {"alias": "c0", "sql": "fa.k", "fallback": None, "typ": "i"},
        {"alias": "c1", "sql": "fb.k", "fallback": None, "typ": "i"},
        {"alias": "c2", "sql": "fa.v", "fallback": None, "typ": "i"},
        {"alias": "c3", "sql": "fb.v", "fallback": None, "typ": "i"},
    ]
    if rng.random() < 0.5:
        items.append(
            {
                "alias": "c4",
                "sql": "COALESCE(fa.v, 0) + COALESCE(fb.v, 0)",
                "fallback": None,
                "typ": "i",
            }
        )
    return {
        "kind": "select",
        "from": from_sql,
        "items": items,
        "where": "(COALESCE(fa.k, fb.k) IS NOT NULL)"
        if rng.random() < 0.3 else None,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_window_join(rng, pools):
    """r12 structural axis #1: window functions over JOIN results — the
    composition the registry exercises only in hand-built plans.  Inner
    FK equi-joins keep the child side's unique key unique in the
    result, so a total ORDER BY (order col + child key) stays total and
    every window function is deterministic."""
    lt, lc, rt, rc = rng.choice(FK_JOINS)
    from_sql = f"{lt} JOIN {rt} ON {lt}.{lc} = {rt}.{rc}"
    cols = TABLES[lt] + TABLES[rt]
    uniq = UNIQUE[lt]
    part = _col(rng.choice(["i", "s"]), rng, TABLES[rt]) or rc
    order = _col(rng.choice(["i", "f", "s"]), rng, cols) or uniq[0]
    total = f"{order}, " + ", ".join(uniq)
    k = rng.randrange(5)
    if k == 0:
        wf = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total})"
        typ = "i"
    elif k == 1:
        fn = rng.choice(["RANK", "DENSE_RANK"])
        wf = f"{fn}() OVER (PARTITION BY {part} ORDER BY {order})"
        typ = "i"
    elif k == 2:
        c = _col("f", rng, cols) or uniq[0]
        fn = rng.choice(["LAG", "LEAD"])
        wf = f"{fn}({c}, 1) OVER (PARTITION BY {part} ORDER BY {total})"
        typ = "f" if dict(cols).get(c) == "f" else "i"
    elif k == 3:
        c = _col("i", rng, TABLES[lt]) or uniq[0]
        n = rng.randint(1, 4)
        wf = (
            f"CAST(SUM({c}) OVER (PARTITION BY {part} ORDER BY {total} "
            f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS BIGINT)"
        )
        typ = "i"
    else:
        wf = f"CAST(COUNT(*) OVER (PARTITION BY {part}) AS BIGINT)"
        typ = "i"
    coltypes = dict(cols)
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    items.append({"alias": f"c{len(items)}", "sql": part, "fallback": None,
                  "typ": coltypes.get(part, "i")})
    items.append({"alias": f"c{len(items)}", "sql": wf, "fallback": None,
                  "typ": typ})
    return {
        "kind": "select",
        "from": from_sql,
        "items": items,
        "where": gen_pred(rng, TABLES[lt], pools, lt, 1)
        if rng.random() < 0.5 else None,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_setop_all(rng, pools):
    """r12 structural axis #2: INTERSECT ALL / EXCEPT ALL under
    DUPLICATES — multiset semantics (each duplicate matched at most
    once) is exactly where a naive hash-dedup implementation diverges
    from ANSI.  Both sides project deliberately NON-unique columns of
    the same table so duplicate multiplicity is high, with different
    predicates so the multisets differ."""
    t = rng.choice(["fz_lineitem", "fz_events", "fz_orders", "fz_documents"])
    cols = TABLES[t]
    picks = []
    for typ in ("s", "i"):
        c = _col(typ, rng, cols)
        if c is not None:
            picks.append((c, typ))
    picks = picks[: rng.randint(1, len(picks))]
    proj = []
    for c, typ in picks:
        if typ == "i" and rng.random() < 0.6:
            proj.append((f"({c} % {rng.randint(2, 7)})", "i"))
        else:
            proj.append((c, typ))
    op = rng.choice(["INTERSECT ALL", "EXCEPT ALL"])

    def side():
        where = (
            f" WHERE {gen_pred(rng, cols, pools, t, 1)}"
            if rng.random() < 0.7
            else ""
        )
        return {
            "kind": "select",
            "from": t + where,  # predicate folded into the from string
            "items": [
                {"alias": f"c{j}", "sql": sql, "fallback": None, "typ": typ}
                for j, (sql, typ) in enumerate(proj)
            ],
            "where": None,
            "group": None,
            "having": None,
            "distinct": False,
        }

    return {"kind": "setop", "op": op, "left": side(), "right": side()}


def gen_pivot_agg(rng, pools):
    """r12 structural axis #3: pivot-shaped conditional aggregates —
    one row per group key, K filtered aggregates over a pooled string
    column's values (the long->wide pivot every BI layer compiles to).
    SUM over an all-NULL branch must be NULL on both engines; COUNT
    must be 0."""
    t = rng.choice(["fz_events", "fz_lineitem", "fz_orders", "fz_documents"])
    cols = TABLES[t]
    s_cols = [c for c, typ in cols if typ == "s" and pools.get((t, c))]
    if not s_cols:
        return gen_agg(rng, pools)
    pc = rng.choice(s_cols)
    vals = pools[(t, pc)][: rng.randint(2, 4)]
    key_col = _col("i", rng, cols) or UNIQUE[t][0]
    key = f"({key_col} % {rng.randint(2, 9)})"
    items = [{"alias": "c0", "sql": key, "fallback": None, "typ": "i"}]
    for j, v in enumerate(vals):
        kind = rng.randrange(3)
        if kind == 0:
            sql = (
                f"CAST(COUNT(CASE WHEN {pc} = '{v}' THEN 1 END) AS BIGINT)"
            )
            typ = "i"
        elif kind == 1:
            ic = _col("i", rng, cols) or key_col
            sql = (
                f"CAST(SUM(CASE WHEN {pc} = '{v}' THEN {ic} END) AS BIGINT)"
            )
            typ = "i"
        else:
            fc = _col("f", rng, cols)
            if fc is None:
                sql = (
                    f"CAST(MAX(CASE WHEN {pc} = '{v}' THEN {key_col} END)"
                    " AS BIGINT)"
                )
                typ = "i"
            else:
                sql = f"SUM(CASE WHEN {pc} = '{v}' THEN {fc} END)"
                typ = "f"
        items.append(
            {"alias": f"c{j + 1}", "sql": sql, "fallback": None, "typ": typ}
        )
    items.append(
        {"alias": f"c{len(items)}", "sql": "COUNT(*)", "fallback": None,
         "typ": "i"}
    )
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": gen_pred(rng, cols, pools, t, 1)
        if rng.random() < 0.4 else None,
        "group": [key],
        "having": None,
        "distinct": False,
    }


# FK pairs for membership subqueries: (outer table, outer col,
# inner table, inner col)
_MEMBER_PAIRS = [
    ("fz_customer", "c_custkey", "fz_orders", "o_custkey"),
    ("fz_orders", "o_orderkey", "fz_lineitem", "l_orderkey"),
    ("fz_nation", "n_nationkey", "fz_customer", "c_nationkey"),
    ("fz_customer", "c_custkey", "fz_events", "user_id"),
    ("fz_part", "p_partkey", "fz_lineitem", "l_partkey"),
]


def gen_membership(rng, pools):
    """r12 structural axis #4 (seeds 860+): membership subqueries —
    [NOT] IN (scalar subquery column, sometimes NULL-injected via
    NULLIF so three-valued logic actually bites: NOT IN over a set
    containing NULL is never TRUE) and correlated [NOT] EXISTS.  Spark
    compiles these to (null-aware) anti/semi joins — the classic
    divergence hazard this axis hunts."""
    ot, oc, it_, ic = rng.choice(_MEMBER_PAIRS)
    neg = rng.random() < 0.5
    kind = rng.randrange(3)
    inner_pred = (
        gen_pred(rng, TABLES[it_], pools, it_, 1)
        if rng.random() < 0.6
        else None
    )
    if kind < 2:  # [NOT] IN
        expr = ic
        pool = pools.get((it_, ic)) or []
        if pool and rng.random() < 0.6:
            # inject NULLs deterministically: rows equal to a real key
            # become NULL in the membership set
            expr = f"NULLIF({ic}, {rng.choice(pool)})"
        where = f" WHERE {inner_pred}" if inner_pred else ""
        member = (
            f"{oc} {'NOT ' if neg else ''}IN "
            f"(SELECT {expr} FROM {it_}{where})"
        )
    else:  # correlated [NOT] EXISTS
        conj = f" AND {inner_pred}" if inner_pred else ""
        member = (
            f"{'NOT ' if neg else ''}EXISTS (SELECT 1 FROM {it_} "
            f"WHERE {ic} = {ot}.{oc}{conj})"
        )
    cols = TABLES[ot]
    coltypes = dict(cols)
    uniq = UNIQUE[ot]
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    extra = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
    items.append({"alias": f"c{len(items)}", "sql": extra,
                  "fallback": None, "typ": coltypes.get(extra, "i")})
    where = member
    if rng.random() < 0.4:
        where = f"({member}) AND ({gen_pred(rng, cols, pools, ot, 1)})"
    return {
        "kind": "select",
        "from": ot,
        "items": items,
        "where": where,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_scalar_sub(rng, pools):
    """r12 grammar v5 lead axis (seeds 920+): scalar subqueries.
    Correlated aggregates in the SELECT list — COUNT(*) over an empty
    correlation must be 0 (the classic "COUNT bug" in outer-join
    rewrites), MIN/MAX must be NULL — and uncorrelated scalar
    subqueries as WHERE comparison bounds."""
    ot, oc, it_, ic = rng.choice(_MEMBER_PAIRS)
    cols = TABLES[ot]
    coltypes = dict(cols)
    uniq = UNIQUE[ot]
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    inner_pred = (
        gen_pred(rng, TABLES[it_], pools, it_, 1)
        if rng.random() < 0.5
        else None
    )
    conj = f" AND {inner_pred}" if inner_pred else ""
    k = rng.randrange(4)
    if k == 0:
        sub = (
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM {it_} "
            f"WHERE {ic} = {ot}.{oc}{conj})"
        )
        typ = "i"
    elif k == 1:
        fn = rng.choice(["MIN", "MAX"])
        agg_col = _col("i", rng, TABLES[it_]) or ic
        sub = (
            f"(SELECT {fn}({agg_col}) FROM {it_} "
            f"WHERE {ic} = {ot}.{oc}{conj})"
        )
        typ = "i"
    elif k == 2:
        agg_col = _col("i", rng, TABLES[it_]) or ic
        sub = (
            f"(SELECT CAST(SUM({agg_col}) AS BIGINT) FROM {it_} "
            f"WHERE {ic} = {ot}.{oc}{conj})"
        )
        typ = "i"
    else:
        sub = (
            f"(SELECT CAST(COUNT(DISTINCT {ic}) AS BIGINT) FROM {it_} "
            f"WHERE {ic} = {ot}.{oc}{conj})"
        )
        typ = "i"
    items.append({"alias": f"c{len(items)}", "sql": sub,
                  "fallback": None, "typ": typ})
    where = None
    if rng.random() < 0.5:
        # uncorrelated scalar bound: col <= (SELECT MAX(col)*k ...)
        bc = _col("i", rng, cols) or uniq[0]
        fn = rng.choice(["MIN", "MAX"])
        cmp_op = rng.choice(["<=", ">=", "<", ">"])
        where = (
            f"{bc} {cmp_op} (SELECT {fn}({ic}) FROM {it_}) "
            f"+ {rng.randint(0, 9)}"
        )
        if rng.random() < 0.5:
            where = f"({where}) AND ({gen_pred(rng, cols, pools, ot, 1)})"
    elif rng.random() < 0.5:
        where = gen_pred(rng, cols, pools, ot, 1)
    return {
        "kind": "select",
        "from": ot,
        "items": items,
        "where": where,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_distinct_agg(rng, pools):
    """r12 grammar v5 axis #2: DISTINCT aggregates, several per query
    (Spark plans an Expand for multi-distinct) plus plain siblings."""
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    key_col = _col("i", rng, cols) or UNIQUE[t][0]
    grouped = rng.random() < 0.6
    key = f"({key_col} % {rng.randint(2, 7)})"
    items = []
    if grouped:
        items.append({"alias": "c0", "sql": key, "fallback": None,
                      "typ": "i"})
    n_aggs = rng.randint(2, 4)
    for j in range(n_aggs):
        k = rng.randrange(4)
        c = _col(rng.choice(["i", "s"]), rng, cols) or key_col
        if k == 0:
            sql = f"CAST(COUNT(DISTINCT {c}) AS BIGINT)"
        elif k == 1:
            ci = _col("i", rng, cols) or key_col
            sql = f"CAST(SUM(DISTINCT {ci}) AS BIGINT)"
        elif k == 2:
            ci = _col("i", rng, cols) or key_col
            sql = f"CAST(SUM({ci}) AS BIGINT)"
        else:
            sql = "CAST(COUNT(*) AS BIGINT)"
        items.append({"alias": f"c{len(items)}", "sql": sql,
                      "fallback": None, "typ": "i"})
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": gen_pred(rng, cols, pools, t, 1)
        if rng.random() < 0.5 else None,
        "group": [key] if grouped else None,
        "having": None,
        "distinct": False,
    }


def gen_stat_agg(rng, pools):
    """r12 grammar v5 axis #3: statistical aggregates — VAR/STDDEV
    (SAMP and POP), COVAR over float/int columns, grouped small
    so single-row groups exercise the n=1 NULL rules; compared with
    the suite's relative float tolerance."""
    t = rng.choice(["fz_lineitem", "fz_orders", "fz_events"])
    cols = TABLES[t]
    key_col = _col("i", rng, cols) or UNIQUE[t][0]
    key = f"({key_col} % {rng.randint(2, 9)})"
    fc = _col("f", rng, cols) or key_col
    ic = _col("i", rng, cols) or key_col
    items = [{"alias": "c0", "sql": key, "fallback": None, "typ": "i"}]
    n_aggs = rng.randint(1, 3)
    for j in range(n_aggs):
        k = rng.randrange(6)
        if k == 0:
            sql = f"VAR_SAMP({fc})"
        elif k == 1:
            sql = f"VAR_POP({fc})"
        elif k == 2:
            sql = f"STDDEV_SAMP({fc})"
        elif k == 3:
            sql = f"STDDEV_POP({fc})"
        elif k == 4:
            # CORR fenced out: measured divergence #3 (module docstring)
            sql = f"COVAR_SAMP({fc}, {ic})"
        else:
            sql = f"COVAR_POP({fc}, {ic})"
        items.append({"alias": f"c{j + 1}", "sql": sql,
                      "fallback": None, "typ": "f"})
    items.append({"alias": f"c{len(items)}", "sql": "CAST(COUNT(*) AS BIGINT)",
                  "fallback": None, "typ": "i"})
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": gen_pred(rng, cols, pools, t, 1)
        if rng.random() < 0.4 else None,
        "group": [key],
        "having": None,
        "distinct": False,
    }


def gen_lateral(rng, pools):
    """r12 grammar v6 lead axis (seeds 1000+): correlated LATERAL
    subqueries in FROM — Spark decorrelates these through
    DecorrelateInnerQuery; top-k-per-row laterals (ORDER BY a full
    unique key + LIMIT, so the row SET is deterministic) and lateral
    aggregates (COUNT/MIN/MAX/SUM over an inequality correlation,
    where the empty-correlation group must still yield one row: COUNT
    0, MIN/MAX/SUM NULL).  INNER laterals drop outer rows whose
    lateral is empty; LEFT JOIN LATERAL ... ON TRUE must keep them
    NULL-padded."""
    ot, oc, it_, ic = rng.choice(_MEMBER_PAIRS)
    coltypes = dict(TABLES[ot])
    uniq = UNIQUE[ot]
    iuniq = UNIQUE[it_]
    items = [f"{ot}.{u} AS c{j}" for j, u in enumerate(uniq)]
    corr_op = rng.choice(["=", "=", "<", ">", "<="])
    off = rng.randint(0, 5)
    agg_mode = rng.random() < 0.5
    if corr_op == "=" and not agg_mode:
        # measured divergence #4 (module docstring): equality + LIMIT
        # laterals must correlate on the bare outer column
        corr = f"{it_}.{ic} = {ot}.{oc}"
    else:
        corr = f"{it_}.{ic} {corr_op} {ot}.{oc} + {off}"
    if agg_mode:
        agg_col = _col("i", rng, TABLES[it_]) or ic
        fn = rng.choice(["MIN", "MAX"])
        lat = (
            f"(SELECT CAST(COUNT(*) AS BIGINT) AS ln, "
            f"{fn}({agg_col}) AS lv FROM {it_} WHERE {corr})"
        )
        lat_cols = ["ln", "lv"]
    else:
        direction = rng.choice(["ASC", "DESC"])
        order = ", ".join(f"{u} {direction}" for u in iuniq)
        proj = ", ".join(
            f"{u} AS lc{j}" for j, u in enumerate(iuniq[:2])
        )
        lat = (
            f"(SELECT {proj} FROM {it_} WHERE {corr} "
            f"ORDER BY {order} LIMIT {rng.randint(1, 3)})"
        )
        lat_cols = [f"lc{j}" for j in range(len(iuniq[:2]))]
    items += [f"lz.{c} AS c{len(uniq) + j}" for j, c in enumerate(lat_cols)]
    left = rng.random() < 0.5
    join = (
        f"{ot} LEFT JOIN LATERAL {lat} lz ON TRUE"
        if left
        else f"{ot}, LATERAL {lat} lz"
    )
    where = (
        gen_pred(rng, TABLES[ot], pools, ot, 1)
        if rng.random() < 0.5 else None
    )
    sql = f"SELECT {', '.join(items)} FROM {join}"
    no_where = sql
    if where:
        sql += f" WHERE {where}"
    shrinks = []
    if where:
        shrinks.append({"kind": "raw", "sql": no_where, "shrinks": []})
    _ = coltypes
    return {"kind": "raw", "sql": sql, "shrinks": shrinks}


def gen_cte_reuse(rng, pools):
    """r12 grammar v6 axis #2: one CTE materialized once, consumed
    TWICE through different paths (directly and via a second CTE) —
    exercises Spark's CTE dedup/reuse planning against DuckDB's."""
    lt, lc, rt, rc = rng.choice(FK_JOINS)
    agg_col = _col("i", rng, TABLES[lt]) or lc
    pred = (
        f" WHERE {gen_pred(rng, TABLES[lt], pools, lt, 1)}"
        if rng.random() < 0.5 else ""
    )
    uniq = UNIQUE[rt]
    coltypes = dict(TABLES[rt])
    keys = ", ".join(f"{rt}.{u} AS c{j}" for j, u in enumerate(uniq))
    off = rng.randint(0, 1)
    sql = (
        f"WITH fz_a AS (SELECT {lc} AS g, CAST(COUNT(*) AS BIGINT) "
        f"AS n, CAST(SUM({agg_col}) AS BIGINT) AS s FROM {lt}{pred} "
        f"GROUP BY {lc}), "
        f"fz_b AS (SELECT {keys}, {rt}.{rc} AS g2, fz_a.n AS n1 "
        f"FROM {rt} LEFT JOIN fz_a ON {rt}.{rc} = fz_a.g) "
        f"SELECT fz_b.*, a2.s AS s2 FROM fz_b "
        f"LEFT JOIN fz_a a2 ON fz_b.g2 = a2.g + {off}"
    )
    _ = coltypes
    return {"kind": "raw", "sql": sql, "shrinks": []}


def gen_null_order_page(rng, pools):
    """r12 grammar v6 axis #3: explicit NULLS FIRST/LAST ordering over
    a NULLIF/CASE-made nullable sort key plus LIMIT/OFFSET pagination
    (Spark and DuckDB have OPPOSITE default null ordering, so the
    explicit clause is load-bearing; the unique-key tiebreak keeps the
    page deterministic)."""
    t = rng.choice(list(TABLES))
    cols, uniq = TABLES[t], UNIQUE[t]
    coltypes = dict(cols)
    items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    typ = rng.choice(["i", "s"])
    sc = _col(typ, rng, cols) or uniq[0]
    if rng.random() < 0.5:
        lit = _lit(coltypes.get(sc, "i"), rng, pools, t, cols)
        sort_expr = f"NULLIF({sc}, {lit})"
    else:
        sort_expr = (
            f"CASE WHEN {gen_pred(rng, cols, pools, t, 1)} "
            f"THEN {sc} END"
        )
    items.append({"alias": f"cs", "sql": sort_expr, "fallback": sc,
                  "typ": typ})
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    tiebreak = ", ".join(f"{u} {rng.choice(['ASC', 'DESC'])}"
                         for u in uniq)
    return {
        "kind": "select",
        "from": t,
        "items": items,
        "where": gen_pred(rng, cols, pools, t, 1)
        if rng.random() < 0.4 else None,
        "group": None,
        "having": None,
        "distinct": False,
        "order_by": f"cs {direction} {nulls}, {tiebreak}",
        "limit": rng.randint(1, 30),
        "offset": rng.randint(0, 25),
    }


def gen_grouping_sets(rng, pools):
    """r12 grammar v7 lead axis (seeds 1250+): explicit GROUPING SETS
    (incl. the grand-total set and the GROUPING() marker function) on
    WHOLE tables — the ROLLUP fence's empty-input hazard (measured
    divergence #1) cannot arise because the base tables are non-empty
    and no WHERE is applied."""
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    k1 = _col("i", rng, cols) or UNIQUE[t][0]
    k2 = _col("s", rng, cols)
    if k2 is None:
        k2 = UNIQUE[t][0]
    agg_col = _col("i", rng, cols) or UNIQUE[t][0]
    sets = [f"({k1})", "()"]
    has_k2 = False
    if rng.random() < 0.7:
        sets.insert(1, f"({k2})")
        has_k2 = True
    if rng.random() < 0.5:
        sets.insert(0, f"({k1}, {k2})")
        has_k2 = True
    items = [
        f"{k1} AS g1",
        # k2 may only be projected when some grouping set contains it
        # (Spark enforces this at analysis; DuckDB NULL-fills — a
        # strictness difference, loud not silent, so the grammar emits
        # only the portable form)
        *([f"{k2} AS g2"] if has_k2 else []),
        f"CAST(GROUPING({k1}) AS BIGINT) AS gf1",
        f"CAST(COUNT(*) AS BIGINT) AS n",
        f"CAST(SUM({agg_col}) AS BIGINT) AS s",
    ]
    sql = (
        f"SELECT {', '.join(items)} FROM {t} "
        f"GROUP BY GROUPING SETS ({', '.join(sets)})"
    )
    return {"kind": "raw", "sql": sql, "shrinks": []}


def gen_full_join_agg(rng, pools):
    """r12 grammar v7 axis #2: FULL JOIN of two filtered derived
    tables on modular keys, grouped by COALESCE of the two key sides
    with null-side counters — the three-valued-logic classic."""
    (lt, lc), (rt, rc) = rng.sample(
        [
            ("fz_customer", "c_nationkey"),
            ("fz_orders", "o_custkey"),
            ("fz_lineitem", "l_suppkey"),
            ("fz_events", "user_id"),
            ("fz_nation", "n_regionkey"),
        ],
        2,
    )
    lmod = rng.randint(2, 40)
    rmod = rng.randint(2, 40)
    lpred = (
        f" WHERE {gen_pred(rng, TABLES[lt], pools, lt, 1)}"
        if rng.random() < 0.5 else ""
    )
    rpred = (
        f" WHERE {gen_pred(rng, TABLES[rt], pools, rt, 1)}"
        if rng.random() < 0.5 else ""
    )
    sql = (
        f"SELECT COALESCE(a.k, b.k) AS k, "
        f"CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS only_b, "
        f"CAST(SUM(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS only_a "
        f"FROM (SELECT {lc} % {lmod} AS k FROM {lt}{lpred}) a "
        f"FULL JOIN (SELECT {rc} % {rmod} AS k FROM {rt}{rpred}) b "
        f"ON a.k = b.k GROUP BY COALESCE(a.k, b.k)"
    )
    return {"kind": "raw", "sql": sql, "shrinks": []}


def gen_exists_case(rng, pools):
    """r12 grammar v7 axis #3: correlated [NOT] EXISTS inside a CASE
    in the SELECT list (projection-position semi-join decorrelation,
    vs the WHERE-position membership shapes of v4)."""
    ot, oc, it_, ic = rng.choice(_MEMBER_PAIRS)
    uniq = UNIQUE[ot]
    keys = ", ".join(f"{ot}.{u} AS c{j}" for j, u in enumerate(uniq))
    neg = "NOT " if rng.random() < 0.5 else ""
    inner_pred = (
        f" AND {gen_pred(rng, TABLES[it_], pools, it_, 1)}"
        if rng.random() < 0.5 else ""
    )
    other = _col("f", rng, TABLES[ot])
    second = (
        f"WHEN {other} < 0 THEN 'neg' " if other is not None else ""
    )
    sql = (
        f"SELECT {keys}, CASE WHEN {neg}EXISTS (SELECT 1 FROM {it_} "
        f"WHERE {ic} = {ot}.{oc}{inner_pred}) THEN 'hit' "
        f"{second}ELSE 'miss' END AS tag FROM {ot}"
    )
    where = (
        gen_pred(rng, TABLES[ot], pools, ot, 1)
        if rng.random() < 0.4 else None
    )
    shrinks = []
    if where:
        shrinks.append({"kind": "raw", "sql": sql, "shrinks": []})
        sql += f" WHERE {where}"
    return {"kind": "raw", "sql": sql, "shrinks": shrinks}


def gen_window_filter(rng, pools):
    """r13 grammar v8 lead axis (seeds 1350+): QUALIFY-style shapes —
    a windowed subquery whose OUTER query filters on the window
    column (top-k per partition, dedup-keep-first, running-total
    thresholds).  Deterministic: every ranking window orders by a
    total key (unique id as the final tiebreaker)."""
    t = rng.choice([n for n in TABLES if n not in ("fz_region",)])
    cols, uniq = TABLES[t], UNIQUE[t]
    coltypes = dict(cols)
    part = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
    order = _col(rng.choice(["i", "f", "s"]), rng, cols) or uniq[0]
    total = f"{order}, " + ", ".join(uniq)
    k = rng.randrange(4)
    if k == 0:
        wf = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total})"
        pred = f"wq <= {rng.randint(1, 4)}"
    elif k == 1:
        wf = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {total})"
        pred = "wq = 1"  # dedup-keep-first
    elif k == 2:
        # RANK filters can keep tied rows — still deterministic as a
        # multiset because rank ties are value-defined
        wf = f"RANK() OVER (PARTITION BY {part} ORDER BY {order})"
        pred = f"wq <= {rng.randint(1, 3)}"
    else:
        c = _col("i", rng, cols) or uniq[0]
        wf = f"CAST(COUNT({c}) OVER (PARTITION BY {part}) AS BIGINT)"
        pred = f"wq >= {rng.randint(1, 3)}"
    inner_items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    inner_items.append(
        {"alias": "wq", "sql": wf, "fallback": None, "typ": "i"}
    )
    inner = {
        "kind": "select",
        "from": t,
        "items": inner_items,
        "where": gen_pred(rng, cols, pools, t)
        if rng.random() < 0.4 else None,
        "group": None,
        "having": None,
        "distinct": False,
    }
    out_items = [
        {"alias": it["alias"], "sql": it["alias"], "fallback": None,
         "typ": it["typ"]}
        for it in inner_items
    ]
    return {
        "kind": "select",
        "from": None,
        "inner": inner,
        "items": out_items,
        "where": pred,
        "group": None,
        "having": None,
        "distinct": False,
    }


def gen_cte_chain_setop(rng, pools):
    """v8 second axis: multi-level CTE chains consumed by a set-op —
    c1 aggregates a base table, c2 filters/projects c1, and the final
    query set-ops c2 against a differently-filtered read of c1 (both
    branches reference the SAME CTEs, exercising reuse + set-op
    planning together)."""
    t = rng.choice(list(TABLES))
    cols, uniq = TABLES[t], UNIQUE[t]
    k = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
    x = _col("i", rng, cols) or uniq[0]
    thr1 = rng.randint(1, 4)
    thr2 = rng.randint(1, 3)
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT",
         "INTERSECT ALL", "EXCEPT ALL"]
    )
    cte = (
        f"WITH fz_c1 AS (SELECT {k} AS g, CAST(SUM({x}) AS BIGINT) AS s, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM {t} GROUP BY {k}), "
        f"fz_c2 AS (SELECT g, s FROM fz_c1 WHERE n >= {thr1})"
    )
    left = "SELECT g, s FROM fz_c2"
    right = f"SELECT g, s FROM fz_c1 WHERE n >= {thr2}"
    sql = f"{cte} {left} {op} {right}"
    return {
        "kind": "raw",
        "sql": sql,
        "shrinks": [
            {"kind": "raw", "sql": f"{cte} {left}", "shrinks": []},
            {"kind": "raw", "sql": f"{cte} {right}", "shrinks": []},
            {
                "kind": "raw",
                "sql": (
                    f"SELECT {k} AS g, CAST(COUNT(*) AS BIGINT) AS n "
                    f"FROM {t} GROUP BY {k}"
                ),
                "shrinks": [],
            },
        ],
    }


def gen_having_corr(rng, pools):
    """v8 third axis: correlated AGGREGATE subqueries in HAVING — the
    group's aggregate compared against a per-group correlated COUNT
    over an FK-joined table (probed portable on both engines; Spark
    rewrites to an outer-join aggregate, the classic COUNT-bug
    site)."""
    lt, lc, rt, rc = rng.choice(FK_JOINS)
    if rng.random() < 0.5:
        t, key, ot, ok = lt, lc, rt, rc
    else:
        t, key, ot, ok = rt, rc, lt, lc
    cmp_op = rng.choice([">", ">=", "<", "<=", "="])
    inner_where = ""
    icols = TABLES[ot]
    if rng.random() < 0.5:
        p = gen_pred(rng, icols, pools, ot, depth=1)
        inner_where = f" AND ({p})"
    sql = (
        f"SELECT {key} AS g, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {t} GROUP BY {key} "
        f"HAVING COUNT(*) {cmp_op} "
        f"(SELECT COUNT(*) FROM {ot} WHERE {ot}.{ok} = {t}.{key}"
        f"{inner_where})"
    )
    plain = (
        f"SELECT {key} AS g, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {t} GROUP BY {key}"
    )
    return {
        "kind": "raw",
        "sql": sql,
        "shrinks": [{"kind": "raw", "sql": plain, "shrinks": []}],
    }


def gen_distinct_window(rng, pools):
    """r14 grammar v9 lead axis (seeds 1550+): per-partition COUNT
    (DISTINCT) via the portable dense_rank/max rewrite — Spark rejects
    DISTINCT window aggregates natively while DuckDB accepts them, so
    the rewrite IS the cross-engine form.  It also walks the engines'
    OPPOSITE window null ordering (Spark ASC = NULLS FIRST, DuckDB =
    NULLS LAST): with a nullable rank key the dense_rank VALUES
    differ per row, but the partition MAX is the distinct count either
    way — only the max is emitted."""
    t = rng.choice([n for n in TABLES if n != "fz_region"])
    cols, uniq = TABLES[t], UNIQUE[t]
    coltypes = dict(cols)
    part = _col(rng.choice(["i", "s"]), rng, cols) or uniq[0]
    x = _col(rng.choice(["i", "s", "f"]), rng, cols) or uniq[0]
    if rng.random() < 0.4:
        # nullable rank key: the asymmetric-null-order probe
        lit = _lit(coltypes.get(x, "i"), rng, pools, t, cols)
        xkey = f"NULLIF({x}, {lit})"
    else:
        xkey = x
    inner_items = [
        {"alias": f"c{j}", "sql": u, "fallback": None,
         "typ": coltypes.get(u, "i")}
        for j, u in enumerate(uniq)
    ]
    inner_items.append(
        {"alias": "pk", "sql": part, "fallback": None,
         "typ": coltypes.get(part, "i")}
    )
    inner_items.append(
        {
            "alias": "dr",
            "sql": (
                f"CAST(DENSE_RANK() OVER (PARTITION BY {part} "
                f"ORDER BY {xkey}) AS BIGINT)"
            ),
            "fallback": None,
            "typ": "i",
        }
    )
    inner = {
        "kind": "select",
        "from": t,
        "items": inner_items,
        "where": gen_pred(rng, cols, pools, t)
        if rng.random() < 0.4 else None,
        "group": None,
        "having": None,
        "distinct": False,
    }
    out_items = [
        {"alias": it["alias"], "sql": it["alias"], "fallback": None,
         "typ": it["typ"]}
        for it in inner_items
        if it["alias"] != "dr"
    ]
    out_items.append(
        {
            "alias": "n_distinct",
            "sql": "MAX(dr) OVER (PARTITION BY pk)",
            "fallback": None,
            "typ": "i",
        }
    )
    return {
        "kind": "select",
        "from": None,
        "inner": inner,
        "items": out_items,
        "where": None,
        "group": None,
        "having": None,
        "distinct": False,
    }


# epoch-µs divisors with exact (x - x%d)/d double division (results
# far below 2^53)
_EPOCH_DIVS = (3600000000, 86400000000, 604800000000)
_TS_COLS = {
    "fz_orders": "o_date_us",
    "fz_lineitem": "l_ship_us",
    "fz_events": "ts_us",
}


def _trunc_div(x: str, d: int) -> str:
    """Portable truncating integer division: `div` is Spark-only and
    `//` DuckDB-only; both engines' % takes the dividend's sign, so
    (x - x%d)/d is exact trunc-toward-zero division in both, and the
    double division is exact because the numerator is a multiple of d
    with a small quotient."""
    return f"CAST(({x} - ({x} % {d})) / {d} AS BIGINT)"


def gen_epoch_bucket(rng, pools):
    """r14 grammar v9 axis #2: epoch-µs date/interval arithmetic —
    hour/day/week bucketing via the portable trunc division (with an
    optional hour-shift so bucket boundaries are walked), grouped
    aggregation on the bucket; or the FK-join day-difference form
    (ship date minus order date), whose negative differences probe
    both engines' dividend-sign %."""
    if rng.random() < 0.6:
        t = rng.choice(list(_TS_COLS))
        cols, uniq = TABLES[t], UNIQUE[t]
        ts = _TS_COLS[t]
        d = rng.choice(_EPOCH_DIVS)
        shift = rng.randint(-6, 6)
        x = f"({ts} + {shift * 3600000000})" if shift else ts
        bucket = _trunc_div(x, d)
        num = _col("f", rng, cols) or uniq[0]
        items = [
            f"{bucket} AS b",
            "CAST(COUNT(*) AS BIGINT) AS n",
            f"ROUND(SUM({num}), 4) AS s",
            f"CAST(MIN({ts}) AS BIGINT) AS lo",
            f"CAST(MAX({ts}) AS BIGINT) AS hi",
        ]
        where = (
            gen_pred(rng, cols, pools, t, 1)
            if rng.random() < 0.4 else None
        )
        sql = f"SELECT {', '.join(items)} FROM {t}"
        if where:
            sql += f" WHERE {where}"
        sql += " GROUP BY 1"
        return {"kind": "raw", "sql": sql}
    # day-difference across the orders->lineitem FK (differences can
    # be negative: the dividend-sign % probe)
    diff = "(fz_lineitem.l_ship_us - fz_orders.o_date_us)"
    dd = _trunc_div(diff, 86400000000)
    sql = (
        f"SELECT {dd} AS dd, CAST(COUNT(*) AS BIGINT) AS n, "
        f"ROUND(SUM(fz_lineitem.l_quantity), 4) AS q "
        f"FROM fz_lineitem JOIN fz_orders "
        f"ON fz_lineitem.l_orderkey = fz_orders.o_orderkey "
        f"GROUP BY 1"
    )
    if rng.random() < 0.5:
        sql += f" HAVING COUNT(*) >= {rng.randint(1, 3)}"
    return {"kind": "raw", "sql": sql}


def gen_outer_null_page(rng, pools):
    """r14 grammar v9 axis #3: explicit NULLS FIRST/LAST ordering on
    NULL-EXTENDED columns of a parent LEFT JOIN child join, under
    LIMIT/OFFSET — real outer-join nulls in the sort key (not
    NULLIF-made ones), where the engines' opposite default null order
    makes the explicit clause load-bearing; every nullable tiebreak
    key also carries an explicit clause, and the parent unique key
    closes the total order."""
    lt, lc, rt, rc = rng.choice(FK_JOINS)
    lcols, luniq = TABLES[lt], UNIQUE[lt]
    runiq = UNIQUE[rt]
    lcoltypes = dict(lcols)
    # parent (rt) LEFT JOIN child (lt): parents without children get
    # null-extended child columns
    sc = _col(rng.choice(["i", "f", "s"]), rng, lcols) or luniq[0]
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    items = [f"{rt}.{u} AS r{j}" for j, u in enumerate(runiq)]
    items += [
        f"{lt}.{u} AS l{j}" for j, u in enumerate(luniq)
    ]
    items.append(f"{lt}.{sc} AS cs")
    tiebreak = ", ".join(
        f"{lt}.{u} {rng.choice(['ASC', 'DESC'])} "
        f"{rng.choice(['NULLS FIRST', 'NULLS LAST'])}"
        for u in luniq
    )
    order = (
        f"{lt}.{sc} {direction} {nulls}, {tiebreak}, "
        + ", ".join(f"{rt}.{u}" for u in runiq)
    )
    sql = (
        f"SELECT {', '.join(items)} FROM {rt} LEFT JOIN {lt} "
        f"ON {lt}.{lc} = {rt}.{rc} ORDER BY {order} "
        f"LIMIT {rng.randint(1, 40)} OFFSET {rng.randint(0, 10)}"
    )
    return {"kind": "raw", "sql": sql}


def gen_recursive_cte(rng, pools):
    """v10 lead axis (seeds 1650+): bounded WITH RECURSIVE series —
    arithmetic accumulation chains, optionally joined back to a base
    table on a modulo key and aggregated.  Bounds are literal and
    small, so both engines terminate identically."""
    step = rng.randint(1, 7)
    bound = rng.randint(10, 60)
    start = rng.randint(0, 5)
    acc = rng.choice(
        ["s + n", "s + n * 2", "s + 1", f"s + n % {step + 2}"]
    )
    if rng.random() < 0.5:
        # plain series projection (total order by n)
        sql = (
            f"WITH RECURSIVE t(n, s) AS (SELECT {start}, {start} "
            f"UNION ALL SELECT n + {step}, {acc} FROM t "
            f"WHERE n < {bound}) "
            f"SELECT n, CAST(s AS BIGINT) AS s FROM t ORDER BY n"
        )
        if rng.random() < 0.5:
            sql += f" LIMIT {rng.randint(2, 20)}"
        return {"kind": "raw", "sql": sql}
    tbl, key = rng.choice(
        [
            ("fz_nation", "n_nationkey"),
            ("fz_region", "r_regionkey"),
            ("fz_customer", "c_custkey"),
        ]
    )
    mod = rng.randint(3, 30)
    agg = rng.choice(
        ["count(*)", "sum(t.s)", "min(t.n)", "max(t.s)"]
    )
    sql = (
        f"WITH RECURSIVE t(n, s) AS (SELECT {start}, {start} "
        f"UNION ALL SELECT n + {step}, {acc} FROM t WHERE n < {bound}) "
        f"SELECT t.n % {mod} AS g, CAST({agg} AS BIGINT) AS v "
        f"FROM t JOIN {tbl} ON {key} % {mod} = t.n % {mod} "
        f"GROUP BY t.n % {mod}"
    )
    return {"kind": "raw", "sql": sql}


def gen_filter_agg(rng, pools):
    """v10 axis #2: FILTER-clause conditional aggregation — several
    filtered aggregates per group, sometimes a filtered HAVING.
    Integer-typed aggregates only (exact compare path)."""
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    gb = _col("s", rng, cols) or _col("i", rng, cols) or UNIQUE[t][0]
    n_aggs = rng.randint(2, 4)
    parts = [f"{gb} AS g"]
    first_agg = None
    for j in range(n_aggs):
        pred = gen_pred(rng, cols, pools, t, 1)
        kind = rng.randrange(4)
        ic = _col("i", rng, cols) or UNIQUE[t][0]
        if kind == 0:
            a = f"count(*) FILTER (WHERE {pred})"
        elif kind == 1:
            a = f"CAST(sum({ic}) FILTER (WHERE {pred}) AS BIGINT)"
        elif kind == 2:
            a = f"count(DISTINCT {ic}) FILTER (WHERE {pred})"
        else:
            a = f"min({ic}) FILTER (WHERE {pred})"
        if first_agg is None and kind in (0, 2):
            first_agg = a
        parts.append(f"{a} AS a{j}")
    sql = f"SELECT {', '.join(parts)} FROM {t}"
    if rng.random() < 0.4:
        sql += f" WHERE {gen_pred(rng, cols, pools, t, 1)}"
    sql += f" GROUP BY {gb}"
    if first_agg is not None and rng.random() < 0.5:
        sql += f" HAVING {first_agg} >= {rng.randint(0, 3)}"
    return {"kind": "raw", "sql": sql}


def gen_try_cast(rng, pools):
    """v10 axis #3: try_cast over deterministically corrupted digit
    strings.  BIGINT targets only see integer-format or corrupted
    strings (the decimal-string divergence is fenced by
    construction); aggregates are integer-exact."""
    t = rng.choice(list(TABLES))
    cols = TABLES[t]
    ic = _col("i", rng, cols) or UNIQUE[t][0]
    pred = gen_pred(rng, cols, pools, t, 1)
    corrupt = rng.choice(
        [
            f"concat('x', CAST({ic} AS STRING))",
            f"concat(CAST({ic} AS STRING), '!')",
            "''",
            "'  '",
            "'99999999999999999999'",
        ]
    )
    target = rng.choice(["BIGINT", "DOUBLE"])
    expr = (
        f"try_cast(CASE WHEN {pred} THEN CAST({ic} AS STRING) "
        f"ELSE {corrupt} END AS {target})"
    )
    if target == "DOUBLE":
        # integer-source strings parse exactly in both engines;
        # compare via integer-exact reductions.  try_cast (not CAST)
        # on the reductions: the overflow corrupt literal parses to
        # 1e20 as a DOUBLE, and a plain BIGINT cast of it is
        # ANSI-mode-sensitive in Spark (full-suite session state
        # flipped it — seed 1661) while try_cast is total in both
        # engines
        sql = (
            f"SELECT count({expr}) AS c, "
            f"try_cast(min({expr}) AS BIGINT) AS lo, "
            f"try_cast(max({expr}) AS BIGINT) AS hi, count(*) AS n "
            f"FROM {t}"
        )
    else:
        sql = (
            f"SELECT CAST(sum({expr}) AS BIGINT) AS s, "
            f"count({expr}) AS c, count(*) AS n FROM {t}"
        )
    if rng.random() < 0.4:
        sql += f" WHERE {gen_pred(rng, cols, pools, t, 1)}"
    return {"kind": "raw", "sql": sql}


def gen_query_v10(rng, pools) -> dict:
    """Seeds 1650+ (r14 continuation): recursive CTEs lead, with
    FILTER-clause aggregation and the try_cast gauntlet behind."""
    shape = rng.randrange(10)
    if shape < 4:
        return gen_recursive_cte(rng, pools)
    if shape < 7:
        return gen_filter_agg(rng, pools)
    return gen_try_cast(rng, pools)


def gen_query_v9(rng, pools) -> dict:
    """Seeds 1550+ (r14): the dense_rank COUNT(DISTINCT) rewrite
    leads, with epoch-µs date arithmetic and outer-join null-ordered
    pagination behind."""
    shape = rng.randrange(10)
    if shape < 4:
        return gen_distinct_window(rng, pools)
    if shape < 7:
        return gen_epoch_bucket(rng, pools)
    return gen_outer_null_page(rng, pools)


def gen_query_v8(rng, pools) -> dict:
    """Seeds 1350+ (r13): QUALIFY-style window filters lead, with
    CTE-chain set-ops and correlated HAVING aggregates behind."""
    shape = rng.randrange(10)
    if shape < 4:
        return gen_window_filter(rng, pools)
    if shape < 7:
        return gen_cte_chain_setop(rng, pools)
    return gen_having_corr(rng, pools)


def gen_query_v7(rng, pools) -> dict:
    """Seeds 1250+: GROUPING SETS lead, FULL-JOIN/COALESCE aggregation
    and projection-position EXISTS behind."""
    shape = rng.randrange(10)
    if shape < 4:
        return gen_grouping_sets(rng, pools)
    if shape < 7:
        return gen_full_join_agg(rng, pools)
    return gen_exists_case(rng, pools)


def gen_query_v6(rng, pools) -> dict:
    """Seeds 1000+: LATERAL joins lead, with CTE reuse and
    null-ordered pagination behind."""
    shape = rng.randrange(10)
    if shape < 5:
        return gen_lateral(rng, pools)
    if shape < 8:
        return gen_cte_reuse(rng, pools)
    return gen_null_order_page(rng, pools)


def gen_query_v5(rng, pools) -> dict:
    """Seeds 920+: scalar subqueries lead, with DISTINCT and
    statistical aggregates behind."""
    shape = rng.randrange(10)
    if shape < 5:
        return gen_scalar_sub(rng, pools)
    if shape < 8:
        return gen_distinct_agg(rng, pools)
    return gen_stat_agg(rng, pools)


def gen_query_v4(rng, pools) -> dict:
    """Seeds 860+: membership subqueries lead, with the strongest v3
    shapes retained."""
    shape = rng.randrange(10)
    if shape < 6:
        return gen_membership(rng, pools)
    if shape < 8:
        return gen_window_join(rng, pools)
    if shape == 8:
        return gen_pivot_agg(rng, pools)
    return gen_setop_all(rng, pools)


def gen_query_v3(rng, pools) -> dict:
    """The r12-extended shape mix (seeds 716+): the three new
    structural axes, with the strongest v2 shape retained."""
    shape = rng.randrange(10)
    if shape < 3:
        return gen_window_join(rng, pools)
    if shape < 6:
        return gen_setop_all(rng, pools)
    if shape < 9:
        return gen_pivot_agg(rng, pools)
    return gen_outer_agg(rng, pools)


def gen_query_v2(rng, pools) -> dict:
    """The r11-extended shape mix (seeds 400+): weighted toward the
    three new compositions, with the strongest v1 shapes retained."""
    shape = rng.randrange(10)
    if shape < 3:
        return gen_outer_agg(rng, pools)
    if shape < 6:
        return gen_range_window(rng, pools)
    if shape < 8:
        return gen_agg_join(rng, pools)
    if shape == 8:
        return gen_agg(rng, pools)
    return gen_window(rng, pools)


def gen_query(seed: int, pools) -> dict:
    rng = random.Random(seed)
    if seed >= 1650:
        return gen_query_v10(rng, pools)
    if seed >= 1550:
        return gen_query_v9(rng, pools)
    if seed >= 1350:
        return gen_query_v8(rng, pools)
    if seed >= 1250:
        return gen_query_v7(rng, pools)
    if seed >= 1000:
        return gen_query_v6(rng, pools)
    if seed >= 920:
        return gen_query_v5(rng, pools)
    if seed >= 860:
        return gen_query_v4(rng, pools)
    if seed >= 716:
        return gen_query_v3(rng, pools)
    if seed >= 400:
        return gen_query_v2(rng, pools)
    shape = rng.randrange(12)
    if shape < 3:
        return gen_select(rng, pools)
    if shape < 6:
        return gen_agg(rng, pools)
    if shape < 8:
        return gen_window(rng, pools)
    if shape == 8:
        return gen_setop(rng, pools)
    if shape == 9:
        return gen_nested(rng, pools)
    if shape == 10:
        return gen_limit(rng, pools)
    # mixed: a select whose source rolled FULL JOIN more often
    return gen_select(rng, pools)


# ---------------------------------------------------------------------------
# render / run / compare / shrink
# ---------------------------------------------------------------------------


def render(q: dict) -> str:
    if q["kind"] == "raw":
        return q["sql"]
    if q["kind"] == "setop":
        return f"({render(q['left'])}) {q['op']} ({render(q['right'])})"
    items = ", ".join(f"{it['sql']} AS {it['alias']}" for it in q["items"])
    src = q["from"]
    if q.get("inner") is not None:
        src = f"({render(q['inner'])}) fz_sub"
    sql = f"SELECT {'DISTINCT ' if q['distinct'] else ''}{items} FROM {src}"
    if q.get("where"):
        sql += f" WHERE {q['where']}"
    if q.get("group"):
        sql += " GROUP BY " + ", ".join(q["group"])
    if q.get("having"):
        sql += f" HAVING {q['having']}"
    if q.get("order_by"):
        sql += f" ORDER BY {q['order_by']}"
    if q.get("limit"):
        sql += f" LIMIT {q['limit']}"
    if q.get("offset"):
        sql += f" OFFSET {q['offset']}"
    return sql


def _sort_key(v):
    if v is None:
        return (0, "", 0.0)
    if isinstance(v, bool):
        return (1, "", float(v))
    if isinstance(v, (int, float, Decimal)):
        return (2, "", float(v))
    return (3, str(v), 0.0)


def _values_close(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, (int, float, Decimal)) and isinstance(
        b, (int, float, Decimal)
    ):
        return math.isclose(float(a), float(b), rel_tol=1e-7, abs_tol=1e-9)
    return str(a) == str(b)


def compare(spark_rows, duck_rows) -> str | None:
    """None if equal (as multisets, float-tolerant); else a description."""
    if len(spark_rows) != len(duck_rows):
        return f"row count: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    key = lambda r: tuple(_sort_key(v) for v in r)  # noqa: E731
    s_sorted = sorted(spark_rows, key=key)
    d_sorted = sorted(duck_rows, key=key)
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if len(sr) != len(dr):
            return f"width: spark={len(sr)} duckdb={len(dr)}"
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if not _values_close(sv, dv):
                return (
                    f"row {i} col {j}: spark={sv!r} duckdb={dv!r} "
                    f"(spark row {tuple(sr)}, duckdb row {tuple(dr)})"
                )
    return None


def run_both(spark, con, sql: str) -> str | None:
    """Run on both engines; return None if results agree, else the
    mismatch description (an engine error counts as a mismatch)."""
    try:
        s_rows = [tuple(r) for r in spark.sql(sql).collect()]
    except Exception as e:  # noqa: BLE001
        return f"spark error: {type(e).__name__}: {str(e)[:300]}"
    try:
        d_rows = [
            tuple(
                v.item() if hasattr(v, "item") else v for v in row
            )
            for row in con.execute(sql).fetchall()
        ]
    except Exception as e:  # noqa: BLE001
        return f"duckdb error: {type(e).__name__}: {str(e)[:300]}"
    return compare(s_rows, d_rows)


def _shrink_candidates(q: dict):
    """Yield structurally smaller variants of q (shallow copies)."""
    if q["kind"] == "raw":
        yield from q.get("shrinks", [])
        return
    if q.get("offset"):
        c = dict(q)
        c["offset"] = 0
        yield c
    if q["kind"] == "setop":
        yield q["left"]
        yield q["right"]
        for side in ("left", "right"):
            for cand in _shrink_candidates(q[side]):
                c = dict(q)
                c[side] = cand
                yield c
        return
    if q.get("inner") is not None:
        yield q["inner"]
        for cand in _shrink_candidates(q["inner"]):
            c = dict(q)
            c["inner"] = cand
            yield c
    if q.get("where"):
        c = dict(q)
        c["where"] = None
        yield c
    if q.get("having"):
        c = dict(q)
        c["having"] = None
        yield c
    if q.get("distinct"):
        c = dict(q)
        c["distinct"] = False
        yield c
    if q.get("limit") and q["limit"] > 1:
        c = dict(q)
        c["limit"] = 1
        yield c
    for i, it in enumerate(q["items"]):
        if it.get("fallback") and it["sql"] != it["fallback"]:
            c = dict(q)
            c["items"] = list(q["items"])
            c["items"][i] = dict(it, sql=it["fallback"])
            if q.get("group"):
                # keep GROUP BY keys in sync with the collapsed item —
                # works for plain key lists and the composite
                # "ROLLUP (...)" string alike
                c["group"] = [
                    g.replace(it["sql"], it["fallback"])
                    for g in q["group"]
                ]
            yield c
    if len(q["items"]) > 1 and not q.get("group"):
        for i in range(len(q["items"])):
            c = dict(q)
            c["items"] = [it for j, it in enumerate(q["items"]) if j != i]
            yield c


def shrink(spark, con, q: dict, mismatch: str, max_steps: int = 60):
    """Greedy shrink: repeatedly take the first smaller variant that
    still fails.  Returns (minimal_q, mismatch)."""
    steps = 0
    while steps < max_steps:
        steps += 1
        for cand in _shrink_candidates(q):
            m = run_both(spark, con, render(cand))
            if m is not None:
                q, mismatch = cand, m
                break
        else:
            break
    return q, mismatch


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_differential(engines, seed):
    spark, con, pools = engines
    q = gen_query(seed, pools)
    sql = render(q)
    mismatch = run_both(spark, con, sql)
    if mismatch is not None:
        mq, mm = shrink(spark, con, q, mismatch)
        pytest.fail(
            f"seed {seed} diverges.\nminimal SQL: {render(mq)}\n"
            f"mismatch: {mm}\noriginal SQL: {sql}"
        )


def test_measured_divergence_4_lateral_limit_expr(engines):
    """Pin measured divergence #4: an equality-correlated LATERAL with
    LIMIT whose correlation compares against an outer-column EXPRESSION
    (here `+ 0`, semantically identical to the bare column) silently
    returns an empty lateral in Spark while DuckDB returns the true
    top-1.  If a Spark upgrade fixes the decorrelation, this pin fails
    and the grammar fence in gen_lateral should be lifted."""
    spark, con, _pools = engines
    bare = (
        "SELECT fz_customer.c_custkey AS c0, lz.lc0 AS c1 "
        "FROM fz_customer LEFT JOIN LATERAL (SELECT o_orderkey AS lc0 "
        "FROM fz_orders WHERE fz_orders.o_custkey = "
        "fz_customer.c_custkey ORDER BY o_orderkey ASC LIMIT 1) lz "
        "ON TRUE WHERE fz_customer.c_custkey < 3"
    )
    expr = bare.replace(
        "= fz_customer.c_custkey ORDER", "= fz_customer.c_custkey + 0 ORDER"
    )
    # the two engines agree on the bare-column form...
    assert run_both(spark, con, bare) is None
    # ...and the expression form diverges: Spark NULL-pads every row
    s_rows = [tuple(r) for r in spark.sql(expr).collect()]
    d_rows = con.execute(expr).fetchall()
    assert all(r[1] is None for r in s_rows), s_rows
    assert any(r[1] is not None for r in d_rows), d_rows
