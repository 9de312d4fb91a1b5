"""Geo-spatial predicates over stored lat/lon columns — the Lucene
LatLonPoint / LatLonDocValuesField surface (core geo since Lucene 7:
newDistanceQuery, newBoxQuery, newDistanceSort). The reference app
would reach these through the same Lucene delegation as every query
surface (/root/reference/README.md:53-57 "subset of Lucene's
features"); here they are pure Catalyst column math, so Parquet
row-group min/max stats on the lat/lon columns prune the scan the way
LatLonPoint's BKD tree prunes leaves.

Everything is double-precision haversine with a FIXED radians
constant and a fixed operation order, reproduced verbatim in the
DuckDB oracle twins — no Python in any plan.

Scale shape: distance_query is a conservative bounding-box
prefilter (sargable comparisons on plain columns -> min/max row-group
skipping + partition pruning if the table is lat-bucketed) followed by
the exact haversine on survivors; nearest_k is a TakeOrdered over the
(optionally box-bounded) scan — no global sort, no shuffle beyond the
top-k reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# degrees -> radians, bit-identical literal in engine and oracle
_DEG = 0.017453292519943295
# mean Earth radius (meters); Lucene's GeoUtils uses its own constant —
# any fixed R gives the same ORDERING, which is what rank checks pin
_R = 6371000.0
# conservative meters-per-degree-latitude for the bounding box
# (true value ~111194.9; smaller divisor -> wider, always-safe box)
_M_PER_DEG = 111000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (double). Fixed op order:
    2R * asin(sqrt(sin^2(dlat/2) + cos(a)cos(b)sin^2(dlon/2)))."""
    p1 = lat1 * F.lit(_DEG)
    p2 = lat2 * F.lit(_DEG)
    dp = (lat2 - lat1) * F.lit(_DEG)
    dl = (lon2 - lon1) * F.lit(_DEG)
    a = (
        F.sin(dp / 2) * F.sin(dp / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    )
    return F.lit(2.0 * _R) * F.asin(F.sqrt(a))


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The DuckDB twin of haversine_m — same constants, same order."""
    p1 = f"({lat1}) * {_DEG}"
    p2 = f"({lat2}) * {_DEG}"
    dp = f"(({lat2}) - ({lat1})) * {_DEG}"
    dl = f"(({lon2}) - ({lon1})) * {_DEG}"
    a = (
        f"sin(({dp}) / 2) * sin(({dp}) / 2) + "
        f"cos({p1}) * cos({p2}) * sin(({dl}) / 2) * sin(({dl}) / 2)"
    )
    return f"{2.0 * _R} * asin(sqrt({a}))"


def _bbox_filter(
    lat_col: str, lon_col: str, center_lat: float, center_lon: float, radius_m: float
) -> Column:
    """Conservative bounding box containing the radius — a SUPERSET of
    the true disk (correctness never depends on it; the exact
    haversine filters after). Sargable comparisons only, so Parquet
    min/max stats skip row groups. Near the poles or the antimeridian
    the box widens to the full lon range rather than risk a miss."""
    dlat = radius_m / _M_PER_DEG
    lo_lat, hi_lat = center_lat - dlat, center_lat + dlat
    cond = F.col(lat_col).between(lo_lat, hi_lat)
    # min |cos| over the lat band bounds the lon shrink factor
    import math

    band_max = min(90.0, max(abs(lo_lat), abs(hi_lat)))
    min_cos = math.cos(band_max * _DEG)
    if hi_lat < 89.0 and lo_lat > -89.0 and min_cos > 1e-6:
        dlon = radius_m / (_M_PER_DEG * min_cos)
        if dlon < 180.0:
            lo_lon, hi_lon = center_lon - dlon, center_lon + dlon
            if lo_lon >= -180.0 and hi_lon <= 180.0:
                cond = cond & F.col(lon_col).between(lo_lon, hi_lon)
            # antimeridian wrap: skip the lon cut, keep the lat cut
    return cond


def distance_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    dist_name: str = "dist_m",
) -> DataFrame:
    """LatLonPoint.newDistanceQuery: rows within radius_m of the
    center, with the exact distance attached. Bounding-box prefilter
    (row-group-prunable) -> exact haversine."""
    if radius_m <= 0:
        raise ValueError("radius_m must be positive")
    d = haversine_m(
        F.col(lat_col).cast("double"), F.col(lon_col).cast("double"),
        F.lit(float(center_lat)), F.lit(float(center_lon)),
    )
    return (
        df.filter(_bbox_filter(lat_col, lon_col, center_lat, center_lon, radius_m))
        .withColumn(dist_name, d)
        .filter(F.col(dist_name) <= float(radius_m))
    )


def box_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """LatLonPoint.newBoxQuery: pure sargable range predicate."""
    return df.filter(
        F.col(lat_col).between(float(min_lat), float(max_lat))
        & F.col(lon_col).between(float(min_lon), float(max_lon))
    )


def _polygon_bbox(vertices: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    lats = [float(v[0]) for v in vertices]
    lons = [float(v[1]) for v in vertices]
    return min(lats), max(lats), min(lons), max(lons)


def _ring_edges(vertices: list[tuple[float, float]]):
    """Non-horizontal edges of one closed ring as (yi, xi, yj, xj)."""
    n = len(vertices)
    for i in range(n):
        yi, xi = float(vertices[i][0]), float(vertices[i][1])
        yj, xj = float(vertices[(i + 1) % n][0]), float(vertices[(i + 1) % n][1])
        if yi != yj:  # a horizontal edge can never straddle the ray
            yield yi, xi, yj, xj


def polygon_contains(
    lat: Column,
    lon: Column,
    vertices: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> Column:
    """Even-odd ray casting (the point-in-polygon test Lucene's
    Polygon/Tessellator BKD relation bottoms out in): cast a ray in
    the +lon direction and count edge crossings; odd = inside. The
    polygon is a driver-side literal (bounded vertex list), so each
    edge unrolls to one branch-free Catalyst expression — whole-stage
    codegen, no UDF. An edge is counted when the point's latitude lies
    strictly between the edge endpoints' latitudes on exactly one side
    ((lat_i > lat) != (lat_j > lat), which also guarantees the
    crossing-longitude division is well-defined) and the crossing sits
    east of the point. Boundary points follow the half-open even-odd
    convention — deterministic, and reproduced verbatim in the SQL
    twin (polygon_sql).

    `holes` (Lucene's Polygon(lats, lons, Polygon... holes)): interior
    rings whose edges join the SAME crossing count — even-odd then
    excludes points inside a hole automatically (outer odd + hole odd
    = even), and re-includes islands inside holes if a hole itself
    contains a ring."""
    if len(vertices) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    for h in holes or []:
        if len(h) < 3:
            raise ValueError("every hole needs >= 3 vertices")
    crossings: Column | None = None
    for ring in [vertices] + list(holes or []):
        for yi, xi, yj, xj in _ring_edges(ring):
            straddles = (F.lit(yi) > lat) != (F.lit(yj) > lat)
            cross_lon = (
                F.lit(xj - xi) * (lat - F.lit(yi)) / F.lit(yj - yi) + F.lit(xi)
            )
            hit = F.when(straddles & (lon < cross_lon), F.lit(1)).otherwise(F.lit(0))
            crossings = hit if crossings is None else crossings + hit
    if crossings is None:  # degenerate: every edge horizontal
        return F.lit(False)
    return (crossings % 2) == 1


def polygon_sql(
    lat: str,
    lon: str,
    vertices: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> str:
    """DuckDB twin of polygon_contains — same edges (outer ring +
    holes), same literals, same even-odd convention."""
    parts = []
    for ring in [vertices] + list(holes or []):
        for yi, xi, yj, xj in _ring_edges(ring):
            parts.append(
                f"(CASE WHEN (({yi} > ({lat})) <> ({yj} > ({lat}))) AND "
                f"(({lon}) < {xj - xi} * (({lat}) - {yi}) / {yj - yi} + {xi}) "
                "THEN 1 ELSE 0 END)"
            )
    if not parts:  # degenerate: every edge horizontal
        return "(FALSE)"
    return f"((({' + '.join(parts)}) % 2) = 1)"


def polygon_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    vertices: list[tuple[float, float]],
    holes: list[list[tuple[float, float]]] | None = None,
) -> DataFrame:
    """LatLonPoint.newPolygonQuery: rows inside the polygon (minus any
    holes). Sargable bounding-box prefilter from the OUTER ring
    (Parquet row-group min/max skip, the BKD outer-box analogue) ->
    exact even-odd ray cast on the survivors, all whole-stage-codegen
    column math."""
    lo_lat, hi_lat, lo_lon, hi_lon = _polygon_bbox(vertices)
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    return df.filter(
        F.col(lat_col).between(lo_lat, hi_lat)
        & F.col(lon_col).between(lo_lon, hi_lon)
    ).filter(polygon_contains(lat, lon, vertices, holes))


def nearest_k(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    k: int,
    radius_m: float | None = None,
) -> DataFrame:
    """LatLonDocValuesField.newDistanceSort / nearest-neighbor search:
    the k closest rows to the center (distance asc, id asc ties).
    Optional radius_m bounds the scan with the same prunable box.
    Plan: scan -> per-partition TakeOrdered partials -> single bounded
    reduction; no global sort."""
    d = haversine_m(
        F.col(lat_col).cast("double"), F.col(lon_col).cast("double"),
        F.lit(float(center_lat)), F.lit(float(center_lon)),
    )
    out = df
    if radius_m is not None:
        out = distance_query(df, lat_col, lon_col, center_lat, center_lon, radius_m)
        return (
            out.select(F.col(id_col), F.col("dist_m"))
            .orderBy(F.asc("dist_m"), F.asc(id_col))
            .limit(int(k))
        )
    return (
        out.select(F.col(id_col), d.alias("dist_m"))
        .orderBy(F.asc("dist_m"), F.asc(id_col))
        .limit(int(k))
    )


# ---- LatLonShape / ShapeField box relations (Lucene core shapes) ----
#
# Lucene 7.x+ indexes polygons/lines as tessellated triangles in a BKD
# tree and answers LatLonShape.newBoxQuery(field, QueryRelation, box)
# with INTERSECTS / WITHIN / DISJOINT / CONTAINS relations. Here a
# shape is two parallel per-row arrays (lats, lons) — Lucene Polygon's
# own constructor shape — and every relation is closed-form column
# math over the vertex/edge arrays (higher-order functions, whole-
# stage codegen, no UDF), reproduced operator-for-operator in the SQL
# twins. Boundary convention: sign tests are boundary-INCLUSIVE
# (touching counts as intersecting), and collinear overlap counts as
# crossing — deterministic, and pinned identically in both engines.


def _cross(ox, oy, ax, ay, bx, by):
    """2D cross product (a - o) x (b - o) as a Column expression."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _segs_intersect(ax, ay, bx, by, cx, cy, dx, dy):
    """Boundary-inclusive segment intersection via orientation signs:
    AB meets CD iff C and D sit on opposite (or touching) sides of AB
    AND A and B sit on opposite (or touching) sides of CD."""
    d1 = _cross(cx, cy, dx, dy, ax, ay)
    d2 = _cross(cx, cy, dx, dy, bx, by)
    d3 = _cross(ax, ay, bx, by, cx, cy)
    d4 = _cross(ax, ay, bx, by, dx, dy)
    return (d1 * d2 <= F.lit(0.0)) & (d3 * d4 <= F.lit(0.0))


def _box_edges(box: tuple[float, float, float, float]):
    """The 4 corner segments of (min_lat, max_lat, min_lon, max_lon)
    as ((y1, x1), (y2, x2)) pairs, y = lat, x = lon."""
    la0, la1, lo0, lo1 = (float(v) for v in box)
    c = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0)]
    return [(c[i], c[(i + 1) % 4]) for i in range(4)]


def shape_box_relations(
    lats_col: str, lons_col: str, box: tuple[float, float, float, float]
) -> dict[str, Column]:
    """Column expressions for the Lucene QueryRelation set of a closed
    polygon ring (parallel lats/lons arrays) against a lat/lon box:

    - intersects: any vertex inside the box, OR any box corner inside
      the polygon (even-odd), OR any polygon edge crossing any box
      edge — the three ways two simple regions can share a point.
    - within (shape INSIDE box): every vertex inside — sufficient and
      necessary because the box is convex.
    - contains (box INSIDE shape): all 4 box corners inside the
      polygon AND no polygon edge crosses a box edge (a simple ring
      entering the box must cross its boundary).
    - disjoint: NOT intersects.
    """
    la0, la1, lo0, lo1 = (float(v) for v in box)
    lats, lons = F.col(lats_col), F.col(lons_col)
    n = F.size(lats)
    idx = F.sequence(F.lit(0), n - 1)

    def vy(i):
        return F.element_at(lats, i + 1)

    def vx(i):
        return F.element_at(lons, i + 1)

    def ny(i):  # next vertex (ring wraps)
        return F.element_at(lats, (i + 1) % n + 1)

    def nx(i):
        return F.element_at(lons, (i + 1) % n + 1)

    vertex_in = lambda i: (
        (vy(i) >= F.lit(la0)) & (vy(i) <= F.lit(la1))
        & (vx(i) >= F.lit(lo0)) & (vx(i) <= F.lit(lo1))
    )
    any_vertex_in = F.exists(idx, vertex_in)
    all_vertices_in = F.forall(idx, vertex_in)

    def corner_in(py: float, px: float) -> Column:
        # even-odd ray cast with per-row array edges: same half-open
        # convention as polygon_contains (strict > on lat straddle,
        # crossing strictly east of the point)
        def hit(acc, i):
            straddles = (vy(i) > F.lit(py)) != (ny(i) > F.lit(py))
            cross_lon = (
                (nx(i) - vx(i)) * (F.lit(py) - vy(i)) / (ny(i) - vy(i)) + vx(i)
            )
            return acc + F.when(
                straddles & (F.lit(px) < cross_lon), F.lit(1)
            ).otherwise(F.lit(0))

        return (F.aggregate(idx, F.lit(0), hit) % 2) == 1

    corners = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0)]
    corner_tests = [corner_in(cy, cx) for cy, cx in corners]
    any_corner_in = corner_tests[0]
    all_corners_in = corner_tests[0]
    for t in corner_tests[1:]:
        any_corner_in = any_corner_in | t
        all_corners_in = all_corners_in & t

    def edge_crosses(i):
        c = F.lit(False)
        for (y1, x1), (y2, x2) in _box_edges(box):
            c = c | _segs_intersect(
                vx(i), vy(i), nx(i), ny(i),
                F.lit(x1), F.lit(y1), F.lit(x2), F.lit(y2),
            )
        return c

    any_edge_cross = F.exists(idx, edge_crosses)
    intersects = any_vertex_in | any_corner_in | any_edge_cross
    return {
        "intersects": intersects,
        "within": all_vertices_in,
        "contains": all_corners_in & ~any_edge_cross,
        "disjoint": ~intersects,
    }


def shape_box_query(
    df: DataFrame,
    lats_col: str,
    lons_col: str,
    box: tuple[float, float, float, float],
    relation: str = "intersects",
) -> DataFrame:
    """LatLonShape.newBoxQuery(field, QueryRelation.X, box): rows whose
    polygon ring stands in `relation` to the box. Empty/degenerate
    rings (< 3 vertices) never match any relation but disjoint."""
    rels = shape_box_relations(lats_col, lons_col, box)
    if relation not in rels:
        raise ValueError(f"relation must be one of {sorted(rels)}")
    guard = (F.size(F.col(lats_col)) >= 3) & (
        F.size(F.col(lats_col)) == F.size(F.col(lons_col))
    )
    if relation == "disjoint":
        return df.filter(~guard | rels["disjoint"])
    return df.filter(guard & rels[relation])


def shape_box_sql(
    lats: str, lons: str, box: tuple[float, float, float, float]
) -> dict[str, str]:
    """DuckDB twins of shape_box_relations — same vertex/edge walks,
    same sign tests, same literals. `lats`/`lons` are SQL expressions
    for DOUBLE[] arrays (1-indexed, like Spark element_at)."""
    la0, la1, lo0, lo1 = (float(v) for v in box)
    n = f"len({lats})"
    idx = f"range(1, {n} + 1)"

    def vy(i):
        return f"{lats}[{i}]"

    def vx(i):
        return f"{lons}[{i}]"

    def ny(i):
        return f"{lats}[({i} % {n}) + 1]"

    def nx(i):
        return f"{lons}[({i} % {n}) + 1]"

    vin = (
        f"i -> {vy('i')} >= {la0} AND {vy('i')} <= {la1} "
        f"AND {vx('i')} >= {lo0} AND {vx('i')} <= {lo1}"
    )
    any_vertex = f"len(list_filter({idx}, {vin})) > 0"
    all_vertex = f"len(list_filter({idx}, {vin})) = {n}"

    def corner_in(py: float, px: float) -> str:
        straddle = f"(({vy('i')} > {py}) <> ({ny('i')} > {py}))"
        cross_lon = (
            f"(({nx('i')} - {vx('i')}) * ({py} - {vy('i')})"
            f" / ({ny('i')} - {vy('i')}) + {vx('i')})"
        )
        return (
            f"(len(list_filter({idx}, i -> {straddle} AND {px} < {cross_lon})) % 2 = 1)"
        )

    corners = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0)]
    any_corner = "(" + " OR ".join(corner_in(cy, cx) for cy, cx in corners) + ")"
    all_corner = "(" + " AND ".join(corner_in(cy, cx) for cy, cx in corners) + ")"

    def cross_sql(ox, oy, ax, ay, bx, by):
        return f"(({ax} - {ox}) * ({by} - {oy}) - ({ay} - {oy}) * ({bx} - {ox}))"

    def seg_int(ax, ay, bx, by, cx, cy, dx, dy):
        d1 = cross_sql(cx, cy, dx, dy, ax, ay)
        d2 = cross_sql(cx, cy, dx, dy, bx, by)
        d3 = cross_sql(ax, ay, bx, by, cx, cy)
        d4 = cross_sql(ax, ay, bx, by, dx, dy)
        return f"({d1} * {d2} <= 0.0 AND {d3} * {d4} <= 0.0)"

    edge_terms = " OR ".join(
        seg_int(
            vx("i"), vy("i"), nx("i"), ny("i"),
            str(x1), str(y1), str(x2), str(y2),
        )
        for (y1, x1), (y2, x2) in _box_edges(box)
    )
    any_edge = f"len(list_filter({idx}, i -> {edge_terms})) > 0"
    intersects = f"({any_vertex} OR {any_corner} OR {any_edge})"
    return {
        "intersects": intersects,
        "within": f"({all_vertex})",
        "contains": f"({all_corner} AND NOT {any_edge})",
        "disjoint": f"(NOT {intersects})",
    }


def shape_line_relations(
    lats_col: str, lons_col: str, box: tuple[float, float, float, float]
) -> dict[str, Column]:
    """LatLonShape line (open polyline) vs box relations: a line
    INTERSECTS iff any vertex lies in the box or any segment crosses a
    box edge (no corner-in test — a line has no interior); WITHIN iff
    every vertex is inside (box convexity); CONTAINS is always false
    (a 1-D shape cannot contain a 2-D box — Lucene returns no docs for
    QueryRelation.CONTAINS over lines); DISJOINT = NOT intersects."""
    la0, la1, lo0, lo1 = (float(v) for v in box)
    lats, lons = F.col(lats_col), F.col(lons_col)
    n = F.size(lats)
    vidx = F.sequence(F.lit(0), n - 1)

    def vy(i):
        return F.element_at(lats, i + 1)

    def vx(i):
        return F.element_at(lons, i + 1)

    vertex_in = lambda i: (
        (vy(i) >= F.lit(la0)) & (vy(i) <= F.lit(la1))
        & (vx(i) >= F.lit(lo0)) & (vx(i) <= F.lit(lo1))
    )
    any_vertex_in = F.exists(vidx, vertex_in)
    all_vertices_in = F.forall(vidx, vertex_in)

    eidx = F.sequence(F.lit(0), n - 2)  # open: n-1 segments, no wrap

    def edge_crosses(i):
        c = F.lit(False)
        for (y1, x1), (y2, x2) in _box_edges(box):
            c = c | _segs_intersect(
                vx(i), vy(i), vx(i + 1), vy(i + 1),
                F.lit(x1), F.lit(y1), F.lit(x2), F.lit(y2),
            )
        return c

    any_edge_cross = F.when(n >= 2, F.exists(eidx, edge_crosses)).otherwise(F.lit(False))
    intersects = any_vertex_in | any_edge_cross
    return {
        "intersects": intersects,
        "within": all_vertices_in,
        "contains": F.lit(False),
        "disjoint": ~intersects,
    }


def shape_line_query(
    df: DataFrame,
    lats_col: str,
    lons_col: str,
    box: tuple[float, float, float, float],
    relation: str = "intersects",
) -> DataFrame:
    """LatLonShape.newBoxQuery over indexed LINES: rows whose polyline
    stands in `relation` to the box. A single-vertex line degenerates
    to a point (vertex-in-box decides)."""
    rels = shape_line_relations(lats_col, lons_col, box)
    if relation not in rels:
        raise ValueError(f"relation must be one of {sorted(rels)}")
    guard = (F.size(F.col(lats_col)) >= 1) & (
        F.size(F.col(lats_col)) == F.size(F.col(lons_col))
    )
    if relation == "disjoint":
        return df.filter(~guard | rels["disjoint"])
    return df.filter(guard & rels[relation])


def shape_line_sql(
    lats: str, lons: str, box: tuple[float, float, float, float]
) -> dict[str, str]:
    """DuckDB twins of shape_line_relations (same walks, same sign
    tests; open polyline — no wrap edge, no corner casts)."""
    la0, la1, lo0, lo1 = (float(v) for v in box)
    n = f"len({lats})"
    vidx = f"range(1, {n} + 1)"
    eidx = f"range(1, {n})"
    vin = (
        f"i -> {lats}[i] >= {la0} AND {lats}[i] <= {la1} "
        f"AND {lons}[i] >= {lo0} AND {lons}[i] <= {lo1}"
    )
    any_vertex = f"len(list_filter({vidx}, {vin})) > 0"
    all_vertex = f"len(list_filter({vidx}, {vin})) = {n}"

    def cross_sql(ox, oy, ax, ay, bx, by):
        return f"(({ax} - {ox}) * ({by} - {oy}) - ({ay} - {oy}) * ({bx} - {ox}))"

    def seg_int(ax, ay, bx, by, cx, cy, dx, dy):
        d1 = cross_sql(cx, cy, dx, dy, ax, ay)
        d2 = cross_sql(cx, cy, dx, dy, bx, by)
        d3 = cross_sql(ax, ay, bx, by, cx, cy)
        d4 = cross_sql(ax, ay, bx, by, dx, dy)
        return f"({d1} * {d2} <= 0.0 AND {d3} * {d4} <= 0.0)"

    edge_terms = " OR ".join(
        seg_int(
            f"{lons}[i]", f"{lats}[i]", f"{lons}[i + 1]", f"{lats}[i + 1]",
            str(x1), str(y1), str(x2), str(y2),
        )
        for (y1, x1), (y2, x2) in _box_edges(box)
    )
    any_edge = f"({n} >= 2 AND len(list_filter({eidx}, i -> {edge_terms})) > 0)"
    intersects = f"({any_vertex} OR {any_edge})"
    return {
        "intersects": intersects,
        "within": f"({all_vertex})",
        "contains": "(FALSE)",
        "disjoint": f"(NOT {intersects})",
    }
