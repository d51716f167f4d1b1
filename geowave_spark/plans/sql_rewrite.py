"""SQL-plan spatial-join routing — the SqlQueryRunner analog.

The reference parses a Spark SQL query's logical plan JSON, and when
the WHERE clause is exactly one Geom* UDF predicate over two relations
(no AND/OR), reroutes execution to the indexed TieredSpatialJoin
instead of the cartesian-product + per-row UDF plan Spark would pick
(analytics/spark/.../sparksql/SqlQueryRunner.java:91-246).

Engine equivalent, same detection contract:

1. analyze the SQL (spark.sql → analyzed logical plan → toJSON, the
   very artifact SqlQueryRunner walks);
2. match the shape: exactly ONE Filter whose condition root is a
   PythonUDF named Geom* with two binary AttributeReference children
   (+ a literal radius for GeomWithinDistance);
3. resolve each geometry attribute's alias → underlying view;
4. run the indexed general join over the DISTINCT geometries of each
   side and register the matched (left_geom, right_geom) pairs;
5. re-issue the query as pairs ⋈ left ⋈ right — two hash equi-joins on
   geometry equality, NO CartesianProduct / BroadcastNestedLoopJoin —
   preserving the original select list verbatim.

Any other shape (extra conjuncts, subqueries, negative predicates)
falls back to plain Spark SQL, exactly like the reference's
runDefaultSQL fallback.
"""

from __future__ import annotations

import json
import re

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

_SELECT_RE = re.compile(r"^\s*SELECT\s+(.*?)\s+FROM\s", re.IGNORECASE | re.DOTALL)


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


def detect_spatial_predicate(spark: SparkSession, sql: str):
    """Return (predicate, distance_u, (view1, alias1, col1),
    (view2, alias2, col2)) when the query matches the routable shape,
    else None — the SqlQueryRunner.java:109-160 detection."""
    df = spark.sql(sql)
    nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())
    filters = [n for n in nodes if n["class"].endswith("logical.Filter")]
    if len(filters) != 1:
        return None
    cond = filters[0]["condition"]
    root = cond[0]
    if not root["class"].endswith("expressions.PythonUDF"):
        return None
    name = root.get("name", "")
    distance_u = None
    if name == "GeomWithinDistance":
        predicate = "intersects"  # refine happens on the distance
        lits = [n for n in cond[1:] if n["class"].endswith("expressions.Literal")]
        if len(lits) != 1:
            return None
        distance_u = float(lits[0]["value"])
    elif name in PRED_MAP:
        predicate = PRED_MAP[name]
    else:
        return None
    attrs = [
        n
        for n in cond[1:]
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
    return predicate, distance_u, sides[0], sides[1]


def try_rewrite_spatial_sql(spark: SparkSession, sql: str) -> DataFrame | None:
    """Reroute a single-Geom*-predicate SQL join through the indexed
    general-geometry join. Returns the rewritten DataFrame, or None
    when the query doesn't match (caller falls back to spark.sql)."""
    from pyspark.sql import functions as F

    from geowave_spark.operators.geom_join import geom_geom_join

    hit = detect_spatial_predicate(spark, sql)
    if hit is None:
        return None
    m = _SELECT_RE.match(sql)
    if m is None:
        return None
    select_list = m.group(1)
    predicate, distance_u, (v1, a1, g1), (v2, a2, g2) = hit

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
        distance_u=int(distance_u) if distance_u is not None else None,
    )
    pairs.createOrReplaceTempView("__gw_pairs")
    rewritten = (
        f"SELECT {select_list} FROM __gw_pairs __wp "
        f"JOIN {v1} {a1} ON {a1}.{g1} = __wp.__lg "
        f"JOIN {v2} {a2} ON {a2}.{g2} = __wp.__rg"
    )
    return spark.sql(rewritten)
