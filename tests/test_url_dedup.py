"""URL canonicalization + URL-level dedup (CCNet-style first-stage
web-crawl curation): rule-by-rule canonicalization laws, the min-id
keeper law, and byte-identity between the Catalyst chain and the
DuckDB SQL twin on messy URLs.
"""

import duckdb
import pytest

from fdblucene_spark.operators import curation

MESSY = [
    "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
    "http://example.com:80/a/b",
    "http://sub.Example.com/path/?fbclid=zz",
    "https://example.com/?z=9&a=1&a=0&flag",
    "https://example.com",
    "  http://www.x.y/p/q//?ref=r&utm_campaign=c&k=v#x ",
    "ftp://Host.Com:80/file",  # non-http scheme: port survives
    "https://example.com:8080/keep:443?utm=notmatched",  # utm (no _) kept
    "http://a.com/?gclid=1&msclkid=2&mc_eid=3&ref_src=t",
    "https://WWW.WWW.com/www.",
]

EXPECT = {
    "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag": "https://example.com/a/b?a=1&b=2",
    "http://example.com:80/a/b": "http://example.com/a/b",
    "http://sub.Example.com/path/?fbclid=zz": "http://sub.example.com/path",
    "https://example.com/?z=9&a=1&a=0&flag": "https://example.com?a=0&a=1&flag&z=9",
    "https://example.com": "https://example.com",
    "  http://www.x.y/p/q//?ref=r&utm_campaign=c&k=v#x ": "http://x.y/p/q?k=v",
    "ftp://Host.Com:80/file": "ftp://host.com:80/file",
    "https://example.com:8080/keep:443?utm=notmatched": "https://example.com:8080/keep:443?utm=notmatched",
    "http://a.com/?gclid=1&msclkid=2&mc_eid=3&ref_src=t": "http://a.com",
    "https://WWW.WWW.com/www.": "https://www.com/www.",
}


@pytest.fixture(scope="module")
def messy_df(spark):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(MESSY)], "id int, url string"
    )


def test_canonical_rules(spark, messy_df):
    got = {
        r["url"]: r["c"]
        for r in messy_df.select(
            "url", curation.canonical_url(messy_df.url).alias("c")
        ).collect()
    }
    for u, want in EXPECT.items():
        assert got[u] == want, u


def test_twin_byte_identity(spark, messy_df):
    got = {
        r["id"]: r["c"]
        for r in messy_df.select(
            "id", curation.canonical_url(messy_df.url).alias("c")
        ).collect()
    }
    con = duckdb.connect()
    expr = curation.canonical_url_sql("url")
    rows = con.sql(
        "SELECT id, "
        + expr
        + " AS c FROM (SELECT unnest(range(%d)) AS id, unnest(%r) AS url)"
        % (len(MESSY), MESSY)
    ).fetchall()
    for i, c in rows:
        assert got[i] == c, MESSY[i]


def test_url_dedup_keeper_law(spark):
    # three spellings of one URL + one distinct URL
    rows = [
        (7, "https://WWW.Site.com/x/?utm_source=a"),
        (3, "https://site.com:443/x"),
        (9, "HTTPS://site.com/x/"),
        (5, "https://site.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = curation.url_dedup(df, "doc_id", "url").toPandas()
    by_id = {int(r.doc_id): (r.canon_url, bool(r.keeper)) for r in out.itertuples()}
    assert by_id[7][0] == by_id[3][0] == by_id[9][0] == "https://site.com/x"
    assert by_id[3][1] and not by_id[7][1] and not by_id[9][1]  # min-id keeps
    assert by_id[5] == ("https://site.com/y", True)


def test_url_dedup_sql_twin(spark):
    rows = [(i, u) for i, u in enumerate(MESSY)] + [
        (100 + i, u) for i, u in enumerate(MESSY[:4])
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = (
        curation.url_dedup(df, "doc_id", "url")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{u}')" for i, u in rows)
    exp = con.sql(
        curation.url_dedup_sql(
            f"SELECT * FROM (VALUES {vals}) t(doc_id, url)", "doc_id", "url"
        )
        + " ORDER BY doc_id"
    ).df()
    assert got["canon_url"].tolist() == exp["canon_url"].tolist()
    assert got["keeper"].astype(bool).tolist() == exp["keeper"].astype(bool).tolist()
