"""Conservative predicate evaluation over per-file column statistics —
the shared data-skipping core of delta_lite (add.stats JSON) and
iceberg_lite (manifest lower/upper bounds).

A predicate is parsed by SPARK'S OWN SQL PARSER (so the grammar and
constant folding are exactly Spark's), folded into a small Python tree,
and evaluated per file against a domain of
``{column: (lo, hi, null_count, num_records)}``.  The contract is
one-sided: :func:`_skip_possible` may answer True for a file with no
matching rows (wasted scan), but must NEVER answer False for a file
that holds one (wrong result) — anything it does not understand keeps
the file.  Callers still apply the full predicate to surviving rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _to_session_naive(ts, tz_name: str | None):
    """tz-aware datetime -> naive wall-clock in the session timezone
    (the coordinate system collected TimestampType stats live in)."""
    import datetime

    if tz_name:
        try:
            from zoneinfo import ZoneInfo

            return ts.astimezone(ZoneInfo(tz_name)).replace(tzinfo=None)
        except Exception:
            pass
    return ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)


def _predicate_tree(spark: SparkSession, predicate: str):
    """Parse ``predicate`` with Spark's own SQL parser and fold the
    Catalyst expression into a small Python tree the skipping
    evaluator understands:

      ("and"|"or", left, right) | ("not", child)
      ("cmp", op, col, value)   op in == != < <= > >=
      ("in", col, [values]) | ("isnull", col) | ("isnotnull", col)
      ("unknown",)  — any node we refuse to reason about
      ("false",)    — a comparison against NULL (never TRUE in SQL)

    Column names are lower-cased (Spark's default case-insensitive
    resolution).  Literal sides may be any FOLDABLE expression — the
    JVM evaluates them (``CAST('2020-01-01' AS DATE)`` etc.), so the
    constant-folding semantics are exactly Spark's.  Returns None when
    the predicate does not parse (callers then skip nothing)."""
    try:
        jexpr = (
            spark._jsparkSession.sessionState()
            .sqlParser()
            .parseExpression(predicate)
        )
        empty_row = (
            spark._jvm.org.apache.spark.sql.catalyst.InternalRow.empty()
        )
        return _fold_jexpr(jexpr, empty_row, _session_tz(spark))
    except Exception:
        return None


def _session_tz(spark: SparkSession) -> str | None:
    """The session timezone TimestampType wall-clocks live in —
    spark.sql.session.timeZone, falling back to the JVM default."""
    try:
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz:
            return tz
    except Exception:
        pass
    try:
        return spark._jvm.java.util.TimeZone.getDefault().getID()
    except Exception:
        return None


_CMP_NODES = {
    "EqualTo": "==",
    "LessThan": "<",
    "LessThanOrEqual": "<=",
    "GreaterThan": ">",
    "GreaterThanOrEqual": ">=",
}
_CMP_FLIP = {
    "==": "==", "!=": "!=", "<": ">", "<=": ">=", ">": "<", ">=": "<=",
    "==ns": "==ns", "!=ns": "!=ns",
}
# NB: negating <=> is NOT "!=": NULL rows satisfy NOT(col <=> lit), so
# "!=ns" keeps any file that may hold NULLs — see _skip_possible.
_CMP_NEGATE = {
    "==": "!=", "!=": "==", "<": ">=", "<=": ">", ">": "<=", ">=": "<",
    "==ns": "!=ns", "!=ns": "==ns",
}


def _j_attr_name(jx) -> str | None:
    if jx.getClass().getSimpleName() != "UnresolvedAttribute":
        return None
    name = jx.name()
    if "." in name:  # nested fields carry no top-level stats
        return None
    return name.strip("`").lower()


def _j_literal_value(jx, empty_row, tz_name):
    """Foldable java expression -> (True, python value) or (False, _).
    A null literal returns (True, None)."""
    import datetime
    from decimal import Decimal

    try:
        if not jx.foldable():
            return False, None
        raw = jx.eval(empty_row)
        tn = jx.dataType().typeName()
    except Exception:
        return False, None
    if raw is None:
        return True, None
    if tn == "string":
        return True, str(raw)
    if tn == "date":
        return True, datetime.date(1970, 1, 1) + datetime.timedelta(
            days=int(str(raw))
        )
    if tn in ("timestamp", "timestamp_ntz"):
        micros = int(str(raw))
        base = datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        ) + datetime.timedelta(microseconds=micros)
        if tn == "timestamp":
            return True, _to_session_naive(base, tz_name)
        return True, base.replace(tzinfo=None)
    if tn.startswith("decimal"):
        return True, Decimal(str(raw))
    if tn == "boolean":
        return True, bool(raw)
    if tn in ("integer", "long", "short", "byte"):
        return True, int(str(raw))
    if tn in ("double", "float"):
        return True, float(str(raw))
    return False, None


def _fold_jexpr(jx, empty_row, tz_name):
    n = jx.getClass().getSimpleName()
    if n == "And" or n == "Or":
        return (
            n.lower(),
            _fold_jexpr(jx.left(), empty_row, tz_name),
            _fold_jexpr(jx.right(), empty_row, tz_name),
        )
    if n == "Not":
        return ("not", _fold_jexpr(jx.child(), empty_row, tz_name))
    if n in _CMP_NODES or n == "EqualNullSafe":
        op = _CMP_NODES.get(n, "==")
        col = _j_attr_name(jx.left())
        lit_side = jx.right()
        flipped = False
        if col is None:
            col = _j_attr_name(jx.right())
            lit_side = jx.left()
            flipped = True
        if col is None:
            return ("unknown",)
        ok, val = _j_literal_value(lit_side, empty_row, tz_name)
        if not ok:
            return ("unknown",)
        if val is None:
            # `col <op> NULL` is never TRUE; `col <=> NULL` is IS NULL
            return ("isnull", col) if n == "EqualNullSafe" else ("false",)
        if n == "EqualNullSafe":
            op = "==ns"
        return ("cmp", _CMP_FLIP[op] if flipped else op, col, val)
    if n == "In":
        col = _j_attr_name(jx.value())
        if col is None:
            return ("unknown",)
        vals = []
        it = jx.list().iterator()
        while it.hasNext():
            ok, v = _j_literal_value(it.next(), empty_row, tz_name)
            if not ok:
                return ("unknown",)
            if v is not None:  # a NULL member can never equal col
                vals.append(v)
        return ("in", col, vals)
    if n == "IsNull":
        col = _j_attr_name(jx.child())
        return ("isnull", col) if col else ("unknown",)
    if n == "IsNotNull":
        col = _j_attr_name(jx.child())
        return ("isnotnull", col) if col else ("unknown",)
    if n == "UnresolvedFunction":
        try:
            if str(jx.nameParts().last()).lower() != "between":
                return ("unknown",)
            args = jx.arguments()
            if args.size() != 3:
                return ("unknown",)
            col = _j_attr_name(args.apply(0))
            ok_lo, lo = _j_literal_value(args.apply(1), empty_row, tz_name)
            ok_hi, hi = _j_literal_value(args.apply(2), empty_row, tz_name)
        except Exception:
            return ("unknown",)
        if col is None or not (ok_lo and ok_hi):
            return ("unknown",)
        if lo is None or hi is None:
            return ("false",)  # BETWEEN with a NULL bound is never TRUE
        return (
            "and",
            ("cmp", ">=", col, lo),
            ("cmp", "<=", col, hi),
        )
    if n == "Like":
        col = _j_attr_name(jx.left())
        ok, pat = _j_literal_value(jx.right(), empty_row, tz_name)
        if col is None or not ok or not isinstance(pat, str):
            return ("unknown",)
        # Only the pure-prefix shape is range-reasonable: 'abc%' with
        # no other wildcards and the default escape char.
        if (
            pat.endswith("%")
            and "%" not in pat[:-1]
            and "_" not in pat
            and "\\" not in pat
            and str(jx.escapeChar()) in ("\\", "\\\\")
        ):
            return ("startswith", col, pat[:-1])
        return ("unknown",)
    return ("unknown",)


def _skip_possible(node, domain, pos: bool = True) -> bool:
    """Could any row of a file with stat ``domain`` satisfy the
    predicate ``node`` (or its negation when ``pos`` is False)?
    ``domain``: {col: (lo, hi, null_count, num_records)} — None means
    unknown.  Conservative: unknown anything -> True."""
    k = node[0]
    if k == "unknown":
        return True
    if k == "false":
        return not pos
    if k == "not":
        return _skip_possible(node[1], domain, not pos)
    if k == "and":
        if pos:
            return _skip_possible(node[1], domain) and _skip_possible(
                node[2], domain
            )
        return _skip_possible(node[1], domain, False) or _skip_possible(
            node[2], domain, False
        )
    if k == "or":
        if pos:
            return _skip_possible(node[1], domain) or _skip_possible(
                node[2], domain
            )
        return _skip_possible(node[1], domain, False) and _skip_possible(
            node[2], domain, False
        )
    if k == "in":
        if not pos:
            # NOT IN: TRUE only when col is non-null and differs from
            # every member; conservative unless every member pins the
            # whole file (all handled by the != rule).
            return any(
                _skip_possible(("cmp", "!=", node[1], v), domain)
                for v in node[2]
            ) or not node[2]
        return any(
            _skip_possible(("cmp", "==", node[1], v), domain)
            for v in node[2]
        )
    if k in ("isnull", "isnotnull"):
        col = node[1]
        if pos is False:
            k = "isnotnull" if k == "isnull" else "isnull"
        st = domain.get(col)
        if st is None:
            return True
        lo, hi, nc, nr = st
        if k == "isnull":
            return True if nc is None else nc > 0
        return True if (nc is None or nr is None) else nc < nr
    if k == "startswith":
        col, pfx = node[1], node[2]
        st = domain.get(col)
        if st is None:
            return True
        lo, hi, nc, nr = st
        if nc is not None and nr is not None and nc >= nr:
            return False  # all NULL: LIKE and NOT LIKE are both never TRUE
        if (
            lo is None
            or hi is None
            or not isinstance(lo, str)
            or not isinstance(hi, str)
        ):
            return True
        n_p = len(pfx)
        if pos:
            # lo <= s <= hi and s.startswith(p) force lo[:n] <= p <= hi[:n]
            return lo[:n_p] <= pfx <= hi[:n_p]
        # negation impossible only when EVERY value starts with pfx
        return not (lo[:n_p] == pfx == hi[:n_p])
    # k == "cmp"
    op, col, val = node[1], node[2], node[3]
    if not pos:
        op = _CMP_NEGATE[op]
    st = domain.get(col)
    if st is None:
        return True
    lo, hi, nc, nr = st
    if op == "!=ns" and (nc is None or nc > 0):
        return True  # NULL rows satisfy NOT(col <=> lit)
    if nc is not None and nr is not None and nc >= nr:
        return False  # every value NULL -> no comparison is ever TRUE
    if lo is None or hi is None:
        return True
    try:
        if op in ("==", "==ns"):
            return lo <= val <= hi
        if op in ("!=", "!=ns"):
            return not (lo == val == hi)
        if op == "<":
            return lo < val
        if op == "<=":
            return lo <= val
        if op == ">":
            return hi > val
        return hi >= val
    except TypeError:
        return True

