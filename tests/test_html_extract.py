"""WET-style HTML text extraction: rule-by-rule extraction laws and
byte-identity between the Catalyst chain and the DuckDB SQL twin.
"""

import duckdb
import pandas as pd
import pytest

from fdblucene_spark.operators import curation

DOCS = [
    "<html><head><title>T</title><style>p{x:1}</style></head><body>"
    "<h1>Doc &amp; one</h1><p>Hello <b>world</b>.</p>"
    "<p>Second&nbsp;para &lt;tag&gt; &#39;q&#39;</p>"
    "<script>if(a<b){alert('x')}</script><div>tail</div></body></html>",
    "plain text no tags",
    "<p>a</p><!-- hidden\nmultiline comment --><p>b</p>",
    "<ul><li>one</li><li>two</li></ul><table><tr><td>c1</td><td>c2</td></tr></table>",
    "<P>UPPER</P><BR>next<SCRIPT>drop()</SCRIPT>done",
    "&amp;lt; stays encoded once",
    "  <div>  spaced   out  </div>  ",
    "",
]

EXPECT = [
    "T Doc & one\nHello world .\nSecond para <tag> 'q'\ntail",
    "plain text no tags",
    "a\nb",
    "one\ntwo\nc1\nc2",
    "UPPER\nnext done",
    "&lt; stays encoded once",
    "spaced out",
    "",
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "id int, html string"
    )
    return {
        r["id"]: r["t"]
        for r in df.select("id", curation.extract_html(df.html).alias("t")).collect()
    }


def test_extract_rules(extracted):
    for i, want in enumerate(EXPECT):
        assert extracted[i] == want, DOCS[i]


def test_twin_byte_identity(extracted):
    con = duckdb.connect()
    con.register("tdocs", pd.DataFrame({"id": range(len(DOCS)), "html": DOCS}))
    rows = con.sql(
        "SELECT id, " + curation.extract_html_sql("html") + " AS t FROM tdocs"
    ).fetchall()
    for i, t in rows:
        assert extracted[i] == t, DOCS[i]


def test_null_html_is_empty(spark):
    df = spark.createDataFrame([(0, None)], "id int, html string")
    assert df.select(curation.extract_html(df.html).alias("t")).collect()[0]["t"] == ""


def test_composes_with_clean_c4(spark):
    # extraction feeds the line-level cleaner: terminal-punctuation
    # lines survive, the stub line drops
    html = "<p>This sentence is long enough to keep and ends well.</p><div>stub</div>"
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    ext = df.select("doc_id", curation.extract_html(df.html).alias("text"))
    out = curation.clean_c4(ext, "doc_id", "text", min_words=3, min_lines=1).toPandas()
    assert (
        out.iloc[0]["clean_text"]
        == "This sentence is long enough to keep and ends well."
    )
    assert int(out.iloc[0]["n_lines_kept"]) == 1
    assert int(out.iloc[0]["n_lines_total"]) == 2
