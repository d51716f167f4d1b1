"""SQL-plan spatial-join routing — the SqlQueryRunner analog.

The reference parses a Spark SQL query's logical plan JSON, and when
the WHERE clause contains a Geom* UDF predicate over two relations,
reroutes execution to the indexed TieredSpatialJoin instead of the
cartesian-product + per-row UDF plan Spark would pick
(analytics/spark/.../sparksql/SqlQueryRunner.java:91-246).

Engine equivalent, same detection contract plus the reference's
query-path residual split (OptimalCQLQuery.java:102-236 extracts the
geometry constraint from a compound filter and keeps the rest as a
client-side filter):

1. analyze the SQL (spark.sql → analyzed logical plan → toJSON, the
   very artifact SqlQueryRunner walks);
2. match the shape: exactly ONE Filter whose condition contains
   exactly one PythonUDF named Geom* with two binary
   AttributeReference children from different relations, reachable
   from the condition root through And nodes only (+ a literal radius
   for GeomWithinDistance) — extra AND conjuncts are the residual;
3. resolve each geometry attribute's alias → underlying view;
4. run the indexed general join over the DISTINCT geometries of each
   side and register the matched (left_geom, right_geom) pairs;
5. re-issue the query as pairs ⋈ left ⋈ right — two hash equi-joins on
   geometry equality, NO CartesianProduct / BroadcastNestedLoopJoin —
   with the original select list, the residual conjuncts, and any
   trailing GROUP BY / HAVING-free ORDER BY / LIMIT clauses reattached
   verbatim. Clause slicing is literal/paren-aware (a subquery select
   item or a string literal containing " from " slices correctly), not
   a regex.

Any other shape (OR over the spatial predicate, set operations, CTEs,
explicit JOIN syntax, >1 Geom* call, subquery-nested predicate) falls
back to plain Spark SQL, exactly like the reference's runDefaultSQL
fallback — correct, just not index-routed.
"""

from __future__ import annotations

import warnings

import json
import re

from pyspark.errors import AnalysisException, ParseException
from pyspark.sql import DataFrame, SparkSession

PRED_MAP = {
    "GeomIntersects": "intersects",
    "GeomContains": "contains",
    "GeomCovers": "covers",
    "GeomWithin": "within",
    "GeomTouches": "touches",
    "GeomCrosses": "crosses",
    "GeomOverlaps": "overlaps",
    "GeomEquals": "equals",
}


# --------------------------------------------------------- text scanning
# The re-emission needs the original query's clause TEXT (select list,
# residual conjuncts, trailing clauses). Slicing must ignore anything
# inside string literals, quoted identifiers, or parentheses — a plain
# regex up to the first FROM mis-slices subqueries and literals.


def _mask(sql: str) -> str:
    """Same-length copy of ``sql`` with every character that is inside
    a quoted region or below paren depth 0 replaced by a space — clause
    keywords are then findable with plain word-boundary searches."""
    out = []
    depth = 0
    quote = None
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if quote is not None:
            if c == quote:
                if i + 1 < n and sql[i + 1] == quote:  # doubled quote escape
                    out.append("  ")
                    i += 2
                    continue
                quote = None
            out.append(" ")
            i += 1
            continue
        if c in ("'", '"', "`"):
            quote = c
            out.append(" ")
        elif c == "(":
            depth += 1
            out.append(" ")
        elif c == ")":
            depth -= 1
            out.append(" ")
        else:
            out.append(c if depth == 0 else " ")
        i += 1
    return "".join(out)


_TAIL_KW = r"GROUP|ORDER|LIMIT|HAVING|WINDOW|QUALIFY|DISTRIBUTE|SORT|CLUSTER"


def _scan_clauses(sql: str):
    """Split a plain SELECT query into (select, from, where, tail) TEXT
    spans at the top level. Returns None for shapes the re-emitter
    can't preserve (CTEs, set operations)."""
    m = _mask(sql)
    if re.search(r"\b(UNION|INTERSECT|EXCEPT)\b", m, re.I):
        return None
    if not re.match(r"\s*SELECT\b", m, re.I):
        return None  # WITH ... / EXPLAIN ... / etc.
    sel_kw = re.match(r"\s*SELECT\b", m, re.I)
    from_kw = re.search(r"\bFROM\b", m, re.I)
    if from_kw is None:
        return None
    where_kw = re.search(r"\bWHERE\b", m, re.I)
    tail_kw = re.search(rf"\b({_TAIL_KW})\b", m, re.I)
    tail_at = tail_kw.start() if tail_kw else len(sql)
    if where_kw is None or where_kw.start() > tail_at:
        where_text = ""
        from_end = tail_at
    else:
        where_text = sql[where_kw.end() : tail_at]
        from_end = where_kw.start()
    return {
        "select": sql[sel_kw.end() : from_kw.start()].strip(),
        "from": sql[from_kw.end() : from_end].strip(),
        "where": where_text.strip(),
        "tail": sql[tail_at:].strip(),
    }


def _split_conjuncts(where_text: str):
    """Top-level AND split of a WHERE clause's text. Returns None when
    a top-level OR is present (the spatial predicate would not be a
    required conjunct).

    BETWEEN/CASE-aware: ``x BETWEEN a AND b`` contributes an And node
    to the analyzed plan but its AND is part of the BETWEEN expression,
    not a conjunct boundary — splitting there re-emits unparsable SQL
    (``WHERE (v BETWEEN 1) AND (5)``). Same for ANDs inside a
    top-level ``CASE ... END``. Token-scan the masked text in order,
    skipping the AND that pairs with a pending BETWEEN at this depth
    and any AND inside a CASE body."""
    m = _mask(where_text)
    if re.search(r"\bOR\b", m, re.I):
        return None
    boundaries = []
    pending_between = 0
    case_depth = 0
    for kw in re.finditer(r"\b(AND|BETWEEN|CASE|END)\b", m, re.I):
        tok = kw.group(1).upper()
        if tok == "CASE":
            case_depth += 1
        elif tok == "END":
            case_depth = max(case_depth - 1, 0)
        elif tok == "BETWEEN":
            if case_depth == 0:
                pending_between += 1
        else:  # AND
            if case_depth > 0:
                continue
            if pending_between > 0:
                pending_between -= 1
                continue
            boundaries.append((kw.start(), kw.end()))
    parts, last = [], 0
    for s, e in boundaries:
        parts.append(where_text[last:s])
        last = e
    parts.append(where_text[last:])
    return [p.strip() for p in parts if p.strip()]


def _balanced_inner(t: str) -> bool:
    """True when ``t`` never closes a paren it didn't open and ends at
    depth 0 (quote-aware)."""
    depth = 0
    quote = None
    for c in t:
        if quote is not None:
            if c == quote:
                quote = None
            continue
        if c in ("'", '"', "`"):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and quote is None


def _strip_outer_parens(t: str) -> str:
    t = t.strip()
    while (
        t.startswith("(")
        and t.endswith(")")
        and _balanced_inner(t[1:-1])
    ):
        t = t[1:-1].strip()
    return t


def _is_spatial_call(conjunct: str, name: str) -> bool:
    """True when the conjunct text is exactly ``name( ... )`` (modulo
    outer parens/whitespace) — the textual twin of the detected UDF.
    The argument list must be the REST of the conjunct (balanced), so
    ``GeomX(a,b) = (1=1)`` does not match."""
    t = _strip_outer_parens(conjunct)
    m = re.match(rf"{re.escape(name)}\s*\(", t, re.I)
    if not m or not t.endswith(")"):
        return False
    return _balanced_inner(t[m.end() : -1])


# --------------------------------------------------------- plan walking


def _subtree_end(nodes: list[dict], i: int) -> int:
    """End (exclusive) of the subtree rooted at pre-order index ``i``
    in a TreeNode.toJSON flattened list (every node carries
    num-children)."""
    end = i + 1
    for _ in range(int(nodes[i].get("num-children", 0))):
        end = _subtree_end(nodes, end)
    return end


def _qual(attr: dict) -> str | None:
    q = attr.get("qualifier") or ""
    q = q.strip("[]")
    return q.split(",")[-1].strip() or None


def _alias_to_view(nodes: list[dict], alias: str) -> str:
    """Resolve a FROM-clause alias to its underlying view name by
    walking the SubqueryAlias chain in the flattened plan."""
    for i, n in enumerate(nodes):
        if n["class"].endswith("logical.SubqueryAlias"):
            ident = n.get("identifier", {})
            if ident.get("name") == alias:
                child = nodes[i + 1] if i + 1 < len(nodes) else {}
                if child.get("class", "").endswith("logical.SubqueryAlias"):
                    return child["identifier"]["name"]
                return alias
    return alias


def _find_single_geom_udf(cond: list[dict]):
    """Index of the single Geom* PythonUDF in a flattened condition
    tree, provided every ancestor on the root→UDF path is an And —
    i.e. the spatial predicate is a required conjunct. None otherwise."""
    hits = [
        i
        for i, n in enumerate(cond)
        if n["class"].endswith("expressions.PythonUDF")
        and str(n.get("name", "")).startswith("Geom")
    ]
    if len(hits) != 1:
        return None
    target = hits[0]
    j = 0
    while j != target:
        if not cond[j]["class"].endswith("expressions.And"):
            return None
        k = j + 1
        nxt = None
        for _ in range(int(cond[j].get("num-children", 0))):
            e = _subtree_end(cond, k)
            if k <= target < e:
                nxt = k
                break
            k = e
        if nxt is None:
            return None
        j = nxt
    return target


def detect_spatial_predicate(spark: SparkSession, sql: str):
    """Return (udf_name, predicate, distance_u, (view1, alias1, col1),
    (view2, alias2, col2), n_residual) when the query matches the
    routable shape, else None — the SqlQueryRunner.java:109-160
    detection extended with the OptimalCQLQuery conjunct split."""
    df = spark.sql(sql)
    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())
    filters = [n for n in nodes if n["class"].endswith("logical.Filter")]
    if len(filters) != 1:
        return None
    cond = filters[0]["condition"]
    u = _find_single_geom_udf(cond)
    if u is None:
        return None
    root = cond[u]
    span = cond[u : _subtree_end(cond, u)]
    name = str(root.get("name", ""))
    distance_u = None
    if name == "GeomWithinDistance":
        predicate = "intersects"  # refine happens on the distance
        lits = [n for n in span[1:] if n["class"].endswith("expressions.Literal")]
        if len(lits) != 1:
            return None
        distance_u = float(lits[0]["value"])
    elif name in PRED_MAP:
        predicate = PRED_MAP[name]
    else:
        return None
    attrs = [
        n
        for n in span[1:]
        if n["class"].endswith("expressions.AttributeReference")
        and n.get("dataType") == "binary"
    ]
    if len(attrs) != 2:
        return None
    sides = []
    for a in attrs:
        alias = _qual(a)
        if alias is None:
            return None
        sides.append((_alias_to_view(nodes, alias), alias, a["name"]))
    if sides[0][1] == sides[1][1]:
        return None  # both args off one relation: a scalar filter, not a join
    n_residual = 0 if u == 0 else 1  # root is an And → extra conjuncts exist
    return name, predicate, distance_u, sides[0], sides[1], n_residual


_REL_RE = re.compile(r"^\s*([A-Za-z_][\w.]*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s*$", re.I)


def _from_matches(from_text: str, sides) -> bool:
    """The re-emitter regenerates the FROM clause, so the original must
    be exactly the two detected relations in comma form (optionally
    aliased) — explicit JOIN syntax or a third relation falls back."""
    m = _mask(from_text)
    parts, last = [], 0
    for c in re.finditer(",", m):
        parts.append(from_text[last : c.start()])
        last = c.end()
    parts.append(from_text[last:])
    if len(parts) != 2:
        return False
    seen = {}
    for p in parts:
        pm = _REL_RE.match(p)
        if pm is None:
            return False
        rel, alias = pm.group(1), pm.group(2) or pm.group(1)
        seen[alias.lower()] = rel.lower()
    for view, alias, _col in sides:
        if seen.get(alias.lower()) != view.lower():
            return False
    return True


def try_rewrite_spatial_sql(spark: SparkSession, sql: str) -> DataFrame | None:
    """Reroute a Geom*-predicate SQL join (plus optional residual AND
    conjuncts and trailing clauses) through the indexed general-
    geometry join. Returns the rewritten DataFrame, or None when the
    query doesn't match (caller falls back to spark.sql)."""
    from pyspark.sql import functions as F

    from geowave_spark.operators.geom_join import geom_geom_join

    hit = detect_spatial_predicate(spark, sql)
    if hit is None:
        return None
    name, predicate, distance_u, (v1, a1, g1), (v2, a2, g2), _nres = hit

    clauses = _scan_clauses(sql)
    if clauses is None or not clauses["where"]:
        return None
    if not _from_matches(clauses["from"], [(v1, a1, g1), (v2, a2, g2)]):
        return None
    conjuncts = _split_conjuncts(clauses["where"])
    if conjuncts is None:
        return None
    spatial = [c for c in conjuncts if _is_spatial_call(c, name)]
    if len(spatial) != 1:
        return None
    residual = [c for c in conjuncts if c is not spatial[0]]

    lgeoms = spark.table(v1).select(F.col(g1).alias("__lg")).distinct()
    rgeoms = spark.table(v2).select(F.col(g2).alias("__rg")).distinct()
    pairs = geom_geom_join(
        lgeoms,
        rgeoms,
        predicate,
        left_key="__lg",
        right_key="__rg",
        left_geom="__lg",
        right_geom="__rg",
        # float passthrough: geom_geom_join ceil-buffers the cover and
        # refines against the exact radius, so truncating here silently
        # dropped pairs in (int(r), r] vs the unrouted plan
        distance_u=float(distance_u) if distance_u is not None else None,
    )
    pairs.createOrReplaceTempView("__gw_pairs")
    select_list = clauses["select"]
    if select_list.strip() == "*":
        # a bare * over the rewritten FROM would also expand
        # __gw_pairs' internal __lg/__rg WKB columns and change the
        # column order vs the unrouted plan — expand to the two view
        # stars explicitly
        select_list = f"{a1}.*, {a2}.*"
    rewritten = (
        f"SELECT {select_list} FROM __gw_pairs __wp "
        f"JOIN {v1} {a1} ON {a1}.{g1} = __wp.__lg "
        f"JOIN {v2} {a2} ON {a2}.{g2} = __wp.__rg"
    )
    if residual:
        rewritten += " WHERE " + " AND ".join(f"({c})" for c in residual)
    if clauses["tail"]:
        rewritten += " " + clauses["tail"]
    try:
        return spark.sql(rewritten)
    except (AnalysisException, ParseException):
        # a residual conjunct the text slicer mis-sliced (exotic syntax
        # the splitter doesn't model) — fall back to plain spark.sql
        # rather than failing a query that worked unrouted. Warn loudly:
        # the unrouted plan is the cartesian-product shape this module
        # exists to prevent, so silent degradation would hide a real
        # routing regression at scale.
        warnings.warn(
            "spatial SQL rewrite produced unparsable SQL; query will run "
            f"UNROUTED (cartesian + per-row refine): {rewritten!r}",
            RuntimeWarning,
            stacklevel=2,
        )
        return None
