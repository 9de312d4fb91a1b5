"""Geo predicates (LatLonPoint / LatLonDocValuesField analogue).

Oracle: an independent pure-Python haversine over the raw rows; the
bounding-box prefilter is additionally pinned as a strict superset of
the disk (the gate's exact-over-all twin would hash-fail an
over-aggressive box, this test fails an under-aggressive one).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from fdblucene_spark.operators import geo

_DEG = 0.017453292519943295
_R = 6371000.0


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = lat1 * _DEG, lat2 * _DEG
    dp, dl = (lat2 - lat1) * _DEG, (lon2 - lon1) * _DEG
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * _R * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def geo_df(spark):
    rng = np.random.default_rng(17)
    rows = [
        {
            "pid": i,
            "lat": float(rng.uniform(-89.9, 89.9)),
            "lon": float(rng.uniform(-180.0, 180.0)),
        }
        for i in range(600)
    ]
    return rows, spark.createDataFrame(rows)


@pytest.mark.parametrize(
    "center,radius",
    [((10.0, 20.0), 2_500_000.0), ((-60.0, 170.0), 4_000_000.0), ((88.0, 0.0), 1_000_000.0)],
)
def test_distance_query_matches_brute(geo_df, center, radius):
    rows, df = geo_df
    got = {
        int(r["pid"]): float(r["dist_m"])
        for r in geo.distance_query(df, "lat", "lon", center[0], center[1], radius).collect()
    }
    want = {
        r["pid"]: _hav(r["lat"], r["lon"], center[0], center[1])
        for r in rows
        if _hav(r["lat"], r["lon"], center[0], center[1]) <= radius
    }
    assert set(got) == set(want)
    for pid, d in got.items():
        assert abs(d - want[pid]) < 1e-6
    assert len(want) > 0  # the parameters actually select something


def test_bbox_is_superset_of_disk(geo_df):
    rows, df = geo_df
    center, radius = (45.0, -120.0), 3_000_000.0
    boxed = {
        int(r["pid"])
        for r in df.filter(
            geo._bbox_filter("lat", "lon", center[0], center[1], radius)
        ).collect()
    }
    disk = {
        r["pid"] for r in rows if _hav(r["lat"], r["lon"], *center) <= radius
    }
    assert disk <= boxed


def test_nearest_k_ordering(geo_df):
    rows, df = geo_df
    center = (0.0, 0.0)
    got = [
        (int(r["pid"]), float(r["dist_m"]))
        for r in geo.nearest_k(df, "pid", "lat", "lon", center[0], center[1], 15).collect()
    ]
    want = sorted(
        ((r["pid"], _hav(r["lat"], r["lon"], *center)) for r in rows),
        key=lambda t: (t[1], t[0]),
    )[:15]
    assert [p for p, _ in got] == [p for p, _ in want]
    # radius-bounded variant agrees with the unbounded one
    got_r = [
        int(r["pid"])
        for r in geo.nearest_k(
            df, "pid", "lat", "lon", center[0], center[1], 15,
            radius_m=max(d for _, d in want) + 1.0,
        ).collect()
    ]
    assert got_r == [p for p, _ in got]


def test_box_query_and_guards(geo_df):
    rows, df = geo_df
    got = {
        int(r["pid"])
        for r in geo.box_query(df, "lat", "lon", -10.0, 10.0, 100.0, 140.0).collect()
    }
    want = {
        r["pid"] for r in rows
        if -10.0 <= r["lat"] <= 10.0 and 100.0 <= r["lon"] <= 140.0
    }
    assert got == want
    with pytest.raises(ValueError):
        geo.distance_query(df, "lat", "lon", 0.0, 0.0, -5.0)


# ---- polygon containment (LatLonPoint.newPolygonQuery) ----

_CHEVRON = [(-30.0, -60.0), (45.0, -40.0), (10.0, 0.0), (45.0, 40.0), (-30.0, 60.0)]


def _ray_cast(lat, lon, verts):
    n, cross = len(verts), 0
    for i in range(n):
        yi, xi = verts[i]
        yj, xj = verts[(i + 1) % n]
        if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            cross += 1
    return cross % 2 == 1


def test_polygon_query_matches_brute(geo_df):
    rows, df = geo_df
    got = {int(r["pid"]) for r in
           geo.polygon_query(df, "lat", "lon", _CHEVRON).collect()}
    want = {r["pid"] for r in rows if _ray_cast(r["lat"], r["lon"], _CHEVRON)}
    assert got == want and len(want) > 0


def test_polygon_concave_notch(spark):
    # planted points: center of each wing inside, the notch and the
    # bbox corners outside — a convex or bbox-only test would differ
    pts = [
        {"pid": 0, "lat": 0.0, "lon": -40.0},   # left wing: inside
        {"pid": 1, "lat": 0.0, "lon": 40.0},    # right wing: inside
        {"pid": 2, "lat": 40.0, "lon": 0.0},    # notch: inside bbox, OUTSIDE polygon
        {"pid": 3, "lat": 44.0, "lon": -59.0},  # bbox corner: outside
        {"pid": 4, "lat": -50.0, "lon": 0.0},   # below bbox: outside
    ]
    got = {int(r["pid"]) for r in geo.polygon_query(
        spark.createDataFrame(pts), "lat", "lon", _CHEVRON).collect()}
    assert got == {0, 1}


def test_polygon_sql_twin_identity(spark, geo_df):
    import duckdb

    rows, df = geo_df
    got = sorted(int(r["pid"]) for r in
                 geo.polygon_query(df, "lat", "lon", _CHEVRON).collect())
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame(rows))
    exp = sorted(
        r[0] for r in con.sql(
            f"SELECT pid FROM pts WHERE {geo.polygon_sql('lat', 'lon', _CHEVRON)}"
        ).fetchall()
    )
    assert got == exp


def test_polygon_guards():
    import pytest as _pt

    with _pt.raises(ValueError):
        geo.polygon_contains(F.lit(0.0), F.lit(0.0), [(0.0, 0.0), (1.0, 1.0)])


# ---- polygon holes (Lucene Polygon(lats, lons, holes...)) ----

_HOLE = [(-20.0, -30.0), (15.0, -30.0), (15.0, 30.0), (-20.0, 30.0)]
_ISLAND = [(-10.0, -12.0), (5.0, -12.0), (5.0, 12.0), (-10.0, 12.0)]


def _ray_cast_rings(lat, lon, rings):
    cross = 0
    for verts in rings:
        n = len(verts)
        for i in range(n):
            yi, xi = verts[i]
            yj, xj = verts[(i + 1) % n]
            if yi == yj:
                continue
            if (yi > lat) != (yj > lat) and lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
                cross += 1
    return cross % 2 == 1


def test_polygon_holes_matches_brute(geo_df):
    rows, df = geo_df
    got = {int(r["pid"]) for r in geo.polygon_query(
        df, "lat", "lon", _CHEVRON, holes=[_HOLE, _ISLAND]).collect()}
    want = {r["pid"] for r in rows
            if _ray_cast_rings(r["lat"], r["lon"], [_CHEVRON, _HOLE, _ISLAND])}
    assert got == want
    # the holes actually subtract something on this grid
    plain = {int(r["pid"]) for r in
             geo.polygon_query(df, "lat", "lon", _CHEVRON).collect()}
    assert got < plain


def test_polygon_holes_planted_points(spark):
    # annulus (inside hole, outside island) excluded; island center
    # re-included; wing outside the hole stays in
    pts = [
        {"pid": 0, "lat": 0.0, "lon": -40.0},   # left wing: inside
        {"pid": 1, "lat": 12.0, "lon": -25.0},  # annulus: excluded by hole
        {"pid": 2, "lat": 0.0, "lon": 0.0},     # island center: re-included
        {"pid": 3, "lat": 40.0, "lon": 0.0},    # notch: outside outer ring
    ]
    got = {int(r["pid"]) for r in geo.polygon_query(
        spark.createDataFrame(pts), "lat", "lon", _CHEVRON,
        holes=[_HOLE, _ISLAND]).collect()}
    assert got == {0, 2}


def test_polygon_holes_sql_twin_identity(spark, geo_df):
    import duckdb

    rows, df = geo_df
    got = sorted(int(r["pid"]) for r in geo.polygon_query(
        df, "lat", "lon", _CHEVRON, holes=[_HOLE]).collect())
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame(rows))
    exp = sorted(r[0] for r in con.sql(
        f"SELECT pid FROM pts WHERE {geo.polygon_sql('lat', 'lon', _CHEVRON, holes=[_HOLE])}"
    ).fetchall())
    assert got == exp


def test_polygon_holes_guards():
    import pytest as _pt

    with _pt.raises(ValueError):
        geo.polygon_contains(
            F.lit(0.0), F.lit(0.0), _CHEVRON, holes=[[(0.0, 0.0), (1.0, 1.0)]]
        )


# ---- LatLonShape box relations (Lucene core shapes) ----

_SBOX = (0.0, 10.0, 0.0, 10.0)


def _py_cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def _py_segs(ax, ay, bx, by, cx, cy, dx, dy):
    d1 = _py_cross(cx, cy, dx, dy, ax, ay)
    d2 = _py_cross(cx, cy, dx, dy, bx, by)
    d3 = _py_cross(ax, ay, bx, by, cx, cy)
    d4 = _py_cross(ax, ay, bx, by, dx, dy)
    return d1 * d2 <= 0.0 and d3 * d4 <= 0.0


def _py_relations(lats, lons, box):
    la0, la1, lo0, lo1 = box
    n = len(lats)
    vin = [la0 <= lats[i] <= la1 and lo0 <= lons[i] <= lo1 for i in range(n)]

    def corner_in(py, px):
        cross = 0
        for i in range(n):
            yi, xi = lats[i], lons[i]
            yj, xj = lats[(i + 1) % n], lons[(i + 1) % n]
            if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi) + xi:
                cross += 1
        return cross % 2 == 1

    corners = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0)]
    cin = [corner_in(cy, cx) for cy, cx in corners]
    box_edges = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    ecross = any(
        _py_segs(lons[i], lats[i], lons[(i + 1) % n], lats[(i + 1) % n], x1, y1, x2, y2)
        for i in range(n)
        for (y1, x1), (y2, x2) in box_edges
    )
    inter = any(vin) or any(cin) or ecross
    return {
        "intersects": inter,
        "within": all(vin),
        "contains": all(cin) and not ecross,
        "disjoint": not inter,
    }


def _shape_rows(seed=7, n_rows=250):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        n = int(rng.integers(3, 7))
        # three regimes so every relation shows up: tiny rings near the
        # box center (within), huge rings around the box (contains),
        # and wild ones (intersect/disjoint/partial)
        if i % 3 == 0:
            cy, cx = float(rng.uniform(2, 8)), float(rng.uniform(2, 8))
            rad = rng.uniform(0.3, 2.0, size=n)
        elif i % 3 == 1:
            cy, cx = float(rng.uniform(3, 7)), float(rng.uniform(3, 7))
            rad = rng.uniform(12, 30, size=n)
        else:
            cy, cx = float(rng.uniform(-15, 25)), float(rng.uniform(-15, 25))
            rad = rng.uniform(0.5, 18, size=n)
        # star-shaped ring around the center: angle-sorted vertices so
        # the ring is simple (non-self-intersecting)
        angs = np.sort(rng.uniform(0, 2 * np.pi, size=n))
        rows.append({
            "id": i,
            "lats": [round(cy + float(r * np.sin(a)), 4) for r, a in zip(rad, angs)],
            "lons": [round(cx + float(r * np.cos(a)), 4) for r, a in zip(rad, angs)],
        })
    return rows


def test_shape_box_relations_brute(spark):
    rows = _shape_rows()
    df = spark.createDataFrame(rows)
    rels = geo.shape_box_relations("lats", "lons", _SBOX)
    got = {
        r["id"]: (r["i"], r["w"], r["c"], r["d"])
        for r in df.select(
            "id", rels["intersects"].alias("i"), rels["within"].alias("w"),
            rels["contains"].alias("c"), rels["disjoint"].alias("d"),
        ).collect()
    }
    hit = [0, 0, 0, 0]
    for r in rows:
        want = _py_relations(r["lats"], r["lons"], _SBOX)
        w = (want["intersects"], want["within"], want["contains"], want["disjoint"])
        assert got[r["id"]] == w, (r, want)
        hit = [h + int(x) for h, x in zip(hit, w)]
    # the random corpus exercises every relation
    assert all(h > 0 for h in hit), hit


def test_shape_box_planted_relations(spark):
    rows = [
        {"id": 0, "lats": [1.0, 9.0, 5.0], "lons": [1.0, 1.0, 9.0]},          # within
        {"id": 1, "lats": [-20.0, 30.0, 5.0], "lons": [-20.0, -20.0, 40.0]},  # contains
        {"id": 2, "lats": [20.0, 30.0, 25.0], "lons": [20.0, 20.0, 30.0]},    # disjoint
        {"id": 3, "lats": [5.0, 15.0, 15.0], "lons": [5.0, 5.0, 15.0]},       # overlap
        {"id": 4, "lats": [-5.0, -5.0, 20.0], "lons": [4.0, 6.0, 5.0]},       # spike through
    ]
    df = spark.createDataFrame(rows)
    assert {r["id"] for r in geo.shape_box_query(df, "lats", "lons", _SBOX).collect()} \
        == {0, 1, 3, 4}
    assert {r["id"] for r in geo.shape_box_query(df, "lats", "lons", _SBOX, "within").collect()} == {0}
    assert {r["id"] for r in geo.shape_box_query(df, "lats", "lons", _SBOX, "contains").collect()} == {1}
    assert {r["id"] for r in geo.shape_box_query(df, "lats", "lons", _SBOX, "disjoint").collect()} == {2}


def test_shape_box_sql_twin_identity(spark):
    import duckdb
    import pandas as pd

    rows = _shape_rows(seed=11, n_rows=120)
    df = spark.createDataFrame(rows)
    rels = geo.shape_box_relations("lats", "lons", _SBOX)
    got = sorted(
        (r["id"], r["i"], r["w"], r["c"])
        for r in df.select(
            "id", rels["intersects"].alias("i"), rels["within"].alias("w"),
            rels["contains"].alias("c"),
        ).collect()
    )
    sql = geo.shape_box_sql("lats", "lons", _SBOX)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    exp = sorted(con.sql(
        f"SELECT id, {sql['intersects']}, {sql['within']}, {sql['contains']} FROM t"
    ).fetchall())
    assert got == exp


def test_shape_box_guards(spark):
    import pytest as _pt

    df = spark.createDataFrame([{"id": 0, "lats": [1.0, 2.0], "lons": [1.0, 2.0]}])
    with _pt.raises(ValueError):
        geo.shape_box_query(df, "lats", "lons", _SBOX, "touches")
    # degenerate ring (< 3 vertices): only disjoint admits it
    assert geo.shape_box_query(df, "lats", "lons", _SBOX).count() == 0
    assert geo.shape_box_query(df, "lats", "lons", _SBOX, "disjoint").count() == 1


# ---- LatLonShape LINE relations ----

def _py_line_relations(lats, lons, box):
    la0, la1, lo0, lo1 = box
    n = len(lats)
    vin = [la0 <= lats[i] <= la1 and lo0 <= lons[i] <= lo1 for i in range(n)]
    corners = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0)]
    box_edges = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
    ecross = any(
        _py_segs(lons[i], lats[i], lons[i + 1], lats[i + 1], x1, y1, x2, y2)
        for i in range(n - 1)
        for (y1, x1), (y2, x2) in box_edges
    )
    inter = any(vin) or ecross
    return {"intersects": inter, "within": all(vin), "disjoint": not inter}


def test_shape_line_relations_brute(spark):
    rows = _shape_rows(seed=19, n_rows=200)  # open: same vertex soup
    df = spark.createDataFrame(rows)
    rels = geo.shape_line_relations("lats", "lons", _SBOX)
    got = {
        r["id"]: (r["i"], r["w"], r["d"])
        for r in df.select(
            "id", rels["intersects"].alias("i"), rels["within"].alias("w"),
            rels["disjoint"].alias("d"),
        ).collect()
    }
    hit = [0, 0, 0]
    for r in rows:
        want = _py_line_relations(r["lats"], r["lons"], _SBOX)
        w = (want["intersects"], want["within"], want["disjoint"])
        assert got[r["id"]] == w, (r, want)
        hit = [h + int(x) for h, x in zip(hit, w)]
    assert all(h > 0 for h in hit), hit


def test_shape_line_vs_polygon_and_twin(spark):
    import duckdb
    import pandas as pd

    rows = _shape_rows(seed=23, n_rows=120)
    df = spark.createDataFrame(rows)
    # a big ring crossing the box boundary intersects as BOTH shapes;
    # contains is line-impossible
    assert geo.shape_line_query(df, "lats", "lons", _SBOX, "contains").count() == 0
    # twin identity
    rels = geo.shape_line_relations("lats", "lons", _SBOX)
    got = sorted(
        (r["id"], r["i"], r["w"])
        for r in df.select("id", rels["intersects"].alias("i"),
                           rels["within"].alias("w")).collect()
    )
    sql = geo.shape_line_sql("lats", "lons", _SBOX)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows))
    exp = sorted(con.sql(
        f"SELECT id, {sql['intersects']}, {sql['within']} FROM t"
    ).fetchall())
    assert got == exp
    # a "through" line with both endpoints outside still intersects
    thru = spark.createDataFrame(
        [{"id": 0, "lats": [-5.0, 20.0], "lons": [5.0, 5.0]}])
    assert geo.shape_line_query(thru, "lats", "lons", _SBOX).count() == 1
    # single-vertex degenerate: point-in-box decides
    pt = spark.createDataFrame([
        {"id": 0, "lats": [3.0], "lons": [3.0]},
        {"id": 1, "lats": [30.0], "lons": [30.0]},
    ])
    assert {r["id"] for r in geo.shape_line_query(pt, "lats", "lons", _SBOX).collect()} == {0}


def test_shape_query_length_mismatch_guard(spark):
    # a row whose lats/lons arrays disagree in length is malformed:
    # it never matches a positive relation (disjoint admits it)
    df = spark.createDataFrame(
        [{"id": 0, "lats": [1.0, 9.0, 5.0], "lons": [1.0, 1.0]}])
    assert geo.shape_box_query(df, "lats", "lons", _SBOX).count() == 0
    assert geo.shape_box_query(df, "lats", "lons", _SBOX, "disjoint").count() == 1
    assert geo.shape_line_query(df, "lats", "lons", _SBOX).count() == 0
