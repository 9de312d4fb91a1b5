"""Deduplication operators for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> md5 minhash -> band ->
bucket join), SimHash, and n-gram Jaccard. Everything is Catalyst
expressions + joins — no Python in the hot path; each operator has an
exact DuckDB SQL twin (md5 is the shared deterministic hash, so Spark
and the oracle agree bit-for-bit).

Scale notes (the 100 TB story):
- exact/fingerprint dedup: one shuffle on the hash; AQE handles skew.
- MinHash signatures: tokens explode -> per-(doc, hash_i) min — a
  single partial+final aggregate; signatures are ~k*8 bytes/doc.
- LSH candidate pairs: self-join on the band key only (never on raw
  shingles); band buckets are capped via a per-bucket limit guard to
  stop a degenerate bucket from exploding the join.
- n-gram Jaccard: candidate generation via a shingle-equality join is
  quadratic per shingle bucket; intended for verification of LSH
  candidates, not as the primary path at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import tokens_col, _TOKENIZE_SQL

DEFAULT_NUM_HASHES = 8
DEFAULT_BAND_SIZE = 2
SHINGLE_N = 3


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, exact_hash, dup_rank, is_dup): rank 1 = canonical keeper."""
    h = F.md5(F.to_binary(F.col(text_col), F.lit("utf-8"))).alias("exact_hash")
    w = Window.partitionBy("exact_hash").orderBy(F.col(id_col))
    return (
        df.select(F.col(id_col), h)
        .withColumn("dup_rank", F.row_number().over(w).cast("long"))
        .withColumn("is_dup", F.col("dup_rank") > 1)
    )


def exact_duplicates_sql(table: str, id_col: str, text_col: str) -> str:
    return f"""
SELECT {id_col}, md5({text_col}) AS exact_hash,
       row_number() OVER (PARTITION BY md5({text_col}) ORDER BY {id_col})::BIGINT AS dup_rank,
       row_number() OVER (PARTITION BY md5({text_col}) ORDER BY {id_col}) > 1 AS is_dup
FROM {table}
"""


def shingles_col(text_col: str, n: int = SHINGLE_N):
    """Array of word n-gram shingle strings (JVM higher-order funcs).

    The tokens array is bound ONCE via a nested transform: Catalyst
    does not common-subexpression-eliminate through lambda bodies, so
    naively writing slice(tokenize(text), i, n) re-tokenizes the text
    per shingle — a size(toks)-fold blowup measured at >10x wall time.
    transform(array(tokens), ts -> ...) materializes it per row.
    """
    def over_tokens(ts):
        return F.when(
            F.size(ts) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", ts)))

    return F.element_at(
        F.transform(F.array(tokens_col(text_col)), over_tokens), 1
    )


def _shingles_sql(text_col: str, n: int = SHINGLE_N) -> str:
    join = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return f"""(
  CASE WHEN len(ts) >= {n}
       THEN list_transform(range(1, len(ts) - {n - 2}), i -> {join})
       ELSE [array_to_string(ts, ' ')] END
)"""


def _shingle_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, _shs) — each doc's DISTINCT word-shingle array, the shared
    intermediate of minhash signatures (map-only folds over the array)
    and exact-jaccard verification (explode on demand); fuzzy_dedup
    computes it once and persists it."""
    from ._spread import spread

    return spread(df).select(
        F.col(id_col), F.array_distinct(shingles_col(text_col)).alias("_shs")
    )


def _shingle_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, shingle) — one row per DISTINCT word-shingle per doc."""
    return _explode_shingles(_shingle_arrays(df, id_col, text_col), id_col)


def _explode_shingles(arrs: DataFrame, id_col: str) -> DataFrame:
    return arrs.select(F.col(id_col), F.explode("_shs").alias("shingle"))


def _minhash_from_arrays(
    arrs: DataFrame, id_col: str, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """Signatures as MAP-ONLY folds over each doc's shingle array:
    h_i = array_min(transform(shingles, s -> hash_i(s))) — no explode,
    no shuffle (the old shape exploded one row per shingle and pushed
    the whole relation through a groupBy(id) aggregate). One md5
    transform per 4 hash values is shared across its chunk extracts."""
    n_md5 = (num_hashes + 3) // 4

    # closure factories: a 2-arg lambda handed to F.transform would
    # receive (element, array_index) — never use defaults to bind the
    # loop variable here
    def md5_arr(a: int):
        return F.transform(
            F.col("_shs"),
            lambda s: F.md5(F.to_binary(F.concat(F.lit(f"{a}:"), s), F.lit("utf-8"))),
        ).alias(f"_m{a}")

    def h_min(a: int, b: int):
        return F.array_min(
            F.transform(
                F.col(f"_m{a}"),
                lambda m: F.conv(F.substring(m, 1 + 8 * b, 8), 16, 10).cast("long"),
            )
        )

    base = arrs.select(F.col(id_col), *[md5_arr(a) for a in range(n_md5)])
    cols = [h_min(*divmod(i, 4)).alias(f"h{i}") for i in range(num_hashes)]
    return base.select(F.col(id_col), *cols)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = DEFAULT_NUM_HASHES
) -> DataFrame:
    """(id, h0..h{k-1}): minhash over word-shingles.

    Hash family: each md5 yields four 32-bit hash values (one per
    8-hex-char chunk), so k hashes cost ceil(k/4) md5 evaluations per
    shingle — md5 dominates this operator's cost at scale. Chunking:
    h_{4a+b} = int(md5(a ':' s)[8b : 8b+8], 16). Deterministic and
    bit-identical in DuckDB SQL. Whole-stage-codegen map pass, zero
    shuffles (per-doc min over the shingle array).
    """
    return _minhash_from_arrays(
        _shingle_arrays(df, id_col, text_col), id_col, num_hashes
    )


def _minhash_sql_core(table: str, id_col: str, text_col: str, num_hashes: int) -> str:
    hs = ",\n         ".join(
        f"min(('0x' || substr(md5('{i // 4}:' || shingle), {1 + 8 * (i % 4)}, 8))::BIGINT) AS h{i}"
        for i in range(num_hashes)
    )
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), sh AS (
  SELECT {id_col}, unnest(list_distinct({_shingles_sql(text_col)})) AS shingle FROM toks
)
SELECT {id_col}, {hs}
FROM sh GROUP BY {id_col}
"""


def minhash_signatures_sql(table: str, id_col: str, text_col: str, num_hashes: int = DEFAULT_NUM_HASHES) -> str:
    return _minhash_sql_core(table, id_col, text_col, num_hashes)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    max_bucket: int = 1000,
    _sh: DataFrame | None = None,
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing >= 1 LSH band.

    Bands of `band_size` consecutive minhashes; the self-join runs on
    the band (band_idx, key) only. max_bucket caps degenerate buckets
    (the skew guard): buckets larger than that are dropped with the
    assumption that a near-universal shingle is not dedup signal.
    _sh: optional prebuilt (id, _shs) shingle-ARRAY table (fuzzy_dedup
    passes a persisted one so signature and verify stages share ONE
    tokenize+shingle pass); result is identical either way.
    """
    sig = _minhash_from_arrays(
        _sh if _sh is not None else _shingle_arrays(df, id_col, text_col),
        id_col, num_hashes,
    )
    # Band table via ONE explode over the signature relation — the old
    # per-band UNION evaluated the minhash aggregate once per branch
    # (Catalyst does not CSE across union arms), and the window +
    # self-join below then evaluated that whole union TWICE more: the
    # signature aggregation ran ~2*n_bands times per call. One explode
    # runs it once.
    all_bands = _explode_bands(sig, id_col, num_hashes, band_size)
    # Bucketize in ONE shuffle (groupBy) instead of window + self-join
    # (which cost 3 more shuffles of the band table): pairs are
    # generated inside each bucket from the sorted id array. Bucket
    # size is capped at max_bucket (same skew guard as before), so the
    # per-bucket pair array is bounded by max_bucket^2/2.
    buckets = (
        all_bands.groupBy("band", "band_key")
        .agg(F.collect_list(id_col).alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket))
        .select(F.array_sort("_ids").alias("_ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("_p")
    )
    return pairs.select(F.col("_p.id_a"), F.col("_p.id_b")).distinct()


def _explode_bands(
    sig: DataFrame, key_col: str, num_hashes: int, band_size: int
) -> DataFrame:
    """(key, band, band_key) — one explode pass over the signature
    relation (never a per-band union, which re-evaluates the minhash
    aggregate per branch)."""
    n_bands = num_hashes // band_size
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
            ).alias("band_key"),
        )
        for b in range(n_bands)
    ]
    return sig.select(F.col(key_col), F.explode(F.array(*entries)).alias("_bk")).select(
        F.col(key_col), F.col("_bk.band").alias("band"), F.col("_bk.band_key").alias("band_key")
    )


def lsh_candidate_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> str:
    n_bands = num_hashes // band_size
    band_rows = []
    for b in range(n_bands):
        key = " || '_' || ".join(f"h{b * band_size + j}" for j in range(band_size))
        band_rows.append(f"SELECT {id_col}, {b} AS band, {key} AS band_key FROM sig")
    bands_union = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH sig AS ({_minhash_sql_core(table, id_col, text_col, num_hashes)}),
bands AS ({bands_union})
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.{id_col} < b.{id_col}
"""


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, bits: int = 16) -> DataFrame:
    """(id, simhash): tf-weighted sign sum over md5-derived term bits."""
    from ._spread import spread

    df = spread(df)
    toks = df.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("term")
    ).groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    th = toks.withColumn(
        "thash", F.conv(F.substring(F.md5(F.to_binary(F.col("term"), F.lit("utf-8"))), 1, 8), 16, 10).cast("long")
    )
    exploded = th.select(
        F.col(id_col),
        F.col("tf"),
        F.col("thash"),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    ).withColumn(
        # dynamic shift amount needs the SQL form (pyspark's shiftright
        # helper only accepts a literal count)
        "contrib",
        F.when(F.expr("(thash >> bit) & 1") == 1, F.col("tf")).otherwise(-F.col("tf")),
    )
    return (
        exploded.groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
        .withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def simhash_signatures_sql(table: str, id_col: str, text_col: str, bits: int = 16) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '')) AS term
  FROM {table}
), tf AS (
  SELECT {id_col}, term, count(*)::BIGINT AS tf,
         ('0x' || substr(md5(term), 1, 8))::BIGINT AS thash
  FROM toks GROUP BY {id_col}, term
), bitsum AS (
  SELECT {id_col}, b.bit,
         sum(CASE WHEN (thash >> b.bit) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM tf, (SELECT unnest(range(0, {bits})) AS bit) b
  GROUP BY {id_col}, b.bit
)
SELECT {id_col},
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM bitsum GROUP BY {id_col}
"""


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    max_bucket: int | None = None,
    candidates: DataFrame | None = None,
    _sh: DataFrame | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) over distinct word-shingle sets — EXACT
    jaccard for every emitted pair; with the defaults, EXACT recall
    too (every qualifying pair emitted).

    max_bucket (OPT-IN skew guard for the quadratic-bucket hazard of a
    raw shingle self-join at corpus scale): when set, candidate pairs
    are generated only from shingles whose doc-bucket is <= max_bucket
    (a near-universal shingle would make the join quadratic while
    discriminating nothing); the intersection count for each surviving
    candidate is still computed EXACTLY over the full shingle sets, so
    jaccard values are never approximated — the only recall loss is a
    pair whose EVERY shared shingle is hotter than max_bucket. The cap
    is opt-in precisely because that loss is silent (e.g. short
    near-duplicate boilerplate built entirely from hot shingles).
    Alternatively pass `candidates` (id_a, id_b) from
    lsh_candidate_pairs to skip generation entirely (the
    verify-LSH-candidates role at 100 TB).
    _sh: optional prebuilt (id, _shs) shingle-ARRAY table, same
    contract as lsh_candidate_pairs."""
    arrs = _sh if _sh is not None else _shingle_arrays(df, id_col, text_col)
    if candidates is not None:
        # Candidate-driven verify: only docs appearing in a candidate
        # pair contribute to any inner join below, so reduce the
        # shingle-array table FIRST with a semi-join on the candidate
        # id set (bounded by 2x|candidates|; AQE broadcasts it when
        # small). Every downstream shuffle then carries
        # candidate-involved docs' shingles instead of the corpus's.
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        arrs = arrs.join(cand_ids, id_col, "left_semi")
    if candidates is None:
        sh = _explode_shingles(arrs, id_col)
        cold = sh
        if max_bucket is not None:
            hot = (
                sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > max_bucket)
                .select("shingle")
            )
            cold = sh.join(F.broadcast(hot), "shingle", "left_anti")
        a, b = cold.alias("a"), cold.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .distinct()
        )
    # exact |A ∩ B| per candidate pair: attach both shingle ARRAYS to
    # the pair row and intersect in the JVM (array_intersect over the
    # already-distinct arrays) — two candidate-keyed joins and a map,
    # replacing the old explode -> per-(pair, shingle) join -> groupBy
    # count -> two size joins chain (which shuffled sum(|A|) rows per
    # candidate plus the exploded shingle relation twice). |A| / |B|
    # ride the same rows as array lengths. Bounded by candidates x
    # max shingle-set size; the semi-join above keeps the array side
    # candidate-sized at any corpus scale.
    aa = arrs.select(F.col(id_col).alias("id_a"), F.col("_shs").alias("_sa"))
    bb = arrs.select(F.col(id_col).alias("id_b"), F.col("_shs").alias("_sb"))
    return (
        candidates.join(aa, "id_a")
        .join(bb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_sa", "_sb")).cast("long").alias("inter"),
            F.size("_sa").cast("long").alias("na"),
            F.size("_sb").cast("long").alias("nb"),
        )
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(table: str, id_col: str, text_col: str, threshold: float = 0.4) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), sh AS (
  SELECT {id_col}, unnest(list_distinct({_shingles_sql(text_col)})) AS shingle FROM toks
), sizes AS (
  SELECT {id_col}, count(*)::BIGINT AS n_sh FROM sh GROUP BY {id_col}
), inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*)::BIGINT AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
  GROUP BY a.{id_col}, b.{id_col}
)
SELECT i.id_a, i.id_b,
       round(i.inter / (sa.n_sh + sb.n_sh - i.inter)::DOUBLE, 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.{id_col} = i.id_a
JOIN sizes sb ON sb.{id_col} = i.id_b
WHERE round(i.inter / (sa.n_sh + sb.n_sh - i.inter)::DOUBLE, 4) >= {threshold}
"""


def connected_components(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    max_iter: int = 25,
    freeze_dir: str | None = None,
) -> DataFrame:
    """Dedup cluster resolution: (id, component) where component = the
    MIN id reachable through the candidate-pair graph — the step after
    LSH/jaccard that turns pairwise duplicates into groups with one
    canonical keeper (`component == id`).

    Algorithm: iterative min-label propagation over the undirected
    edge list — each round is one join + partial/final min aggregate
    (all Catalyst; labels and edges shuffle on the same key), with an
    EXACT convergence check (sum of label changes == 0), so the result
    is correct whenever the loop returns. Rounds needed = graph
    diameter; duplicate clusters are near-cliques (diameter 2-3), so
    3-4 rounds close a typical corpus. A pathological million-node
    chain would need the O(log n) large-star/small-star alternation
    instead — raise max_iter or pre-cut such chains with a similarity
    threshold; the loop RAISES rather than returning wrong labels if
    it has not converged.

    freeze_dir: optional directory to materialize labels each round
    (breaks the growing lineage exactly like the build's freeze
    pattern; required for >5ish rounds at scale)."""
    import os as _os

    spark = df.sparkSession
    # The edge list (and, each round, the current labels) is cached AND
    # lineage-truncated via localCheckpoint: every round's neighbor-min
    # job and convergence count would otherwise re-derive `pairs` from
    # scratch (for the composed fuzzy_dedup pipeline that meant
    # re-running the whole LSH + exact-jaccard chain once per round),
    # and — because each round's plan embeds the previous round's plan
    # TWICE plus the edges pipeline — a plain persist leaves the
    # LOGICAL plan doubling per round (measured: a 4-round run's final
    # plan carried ~4,000 Exchange nodes that Catalyst re-analyzed on
    # every downstream action even though execution was cached).
    # Edges/labels are bounded relations (one row per edge direction /
    # per doc); checkpoint blocks spill to disk at scale.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = df.select(F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("comp"))
    for it in range(max_iter):
        # neighbor minimum in one shuffle: candidate label for dst =
        # min over incoming neighbors' current labels
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["dst"], "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("_chg"),
            )
        )
        if freeze_dir is not None:
            p = _os.path.join(freeze_dir, f"cc_round_{it}")
            new_labels.write.mode("errorifexists").parquet(p)
            new_labels = spark.read.parquet(p)
        else:
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.agg(
            F.sum(F.when(F.col("_chg"), 1).otherwise(0)).alias("n")
        ).first()["n"]
        labels = new_labels.drop("_chg")
        if not changed:
            return labels.select(F.col("id").alias(id_col), F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter); raise max_iter"
    )


def connected_components_sql(
    table: str, id_col: str, text_col: str,
    num_hashes: int = DEFAULT_NUM_HASHES, band_size: int = DEFAULT_BAND_SIZE,
) -> str:
    """DuckDB twin: recursive transitive closure over the LSH candidate
    pairs, component = min reachable id."""
    pairs = lsh_candidate_pairs_sql(table, id_col, text_col, num_hashes, band_size)
    return f"""
WITH RECURSIVE cand AS ({pairs}),
cedges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION
  SELECT id_b, id_a FROM cand
),
reach(id, comp) AS (
  SELECT {id_col}, {id_col}::BIGINT FROM {table}
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN cedges e ON e.src = r.id
)
SELECT id AS {id_col}, min(comp)::BIGINT AS component FROM reach GROUP BY id
"""


# --------------------------------------------------- composed fuzzy dedup
def fuzzy_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    max_iter: int = 25,
    freeze_dir: str | None = None,
) -> DataFrame:
    """END-TO-END fuzzy dedup (the MinHash pipeline of Lee et al. /
    Dolma / RefinedWeb): LSH candidate pairs -> EXACT-jaccard verify
    >= threshold -> connected components over the verified pairs ->
    keeper = the MIN id of each duplicate cluster. One call composes
    the four operators this module ships separately; every stage
    stays in its bucketed/bounded shape (no all-pairs join anywhere),
    so the composition scales exactly as its parts do.

    Returns (id, component, keep): component is the cluster's
    canonical id, keep is True for exactly one doc per cluster (every
    singleton keeps itself). Filter `keep` to materialize the
    deduplicated corpus; join back on component for provenance."""
    sh = _shingle_arrays(df, id_col, text_col).persist()
    verified = cands = None
    try:
        # persisted: the verify stage references the candidate pairs
        # TWICE (the candidate-id semi-join reduction of the shingle
        # table, then the intersect join) — without a persist the whole
        # LSH pipeline would run once per reference. Bounded relation
        # (one row per candidate pair, the bucket caps bound it).
        cands = lsh_candidate_pairs(
            df, id_col, text_col, num_hashes, band_size, _sh=sh
        ).persist()
        # persisted: connected_components builds its edge list as the
        # UNION of both pair directions — two references to this frame,
        # which would otherwise run the whole LSH + exact-jaccard
        # pipeline twice when the edges materialize
        verified = ngram_jaccard_pairs(
            df, id_col, text_col, threshold, candidates=cands, _sh=sh
        ).select("id_a", "id_b").persist()
        # connected_components materializes its labels while iterating,
        # so both caches are releasable once it returns
        comp = connected_components(
            df, id_col, verified, max_iter=max_iter, freeze_dir=freeze_dir
        )
    finally:
        sh.unpersist()
        if cands is not None:
            cands.unpersist()
        if verified is not None:
            verified.unpersist()
    return comp.select(
        F.col(id_col),
        "component",
        (F.col("component") == F.col(id_col)).alias("keep"),
    )


def fuzzy_dedup_sql(
    table: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.4,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> str:
    """DuckDB twin of fuzzy_dedup: the LSH-pair twin feeds an exact
    jaccard verify (same round-to-4 comparison), then the recursive
    transitive closure, then min-id keepers."""
    pairs = lsh_candidate_pairs_sql(table, id_col, text_col, num_hashes, band_size)
    return f"""
WITH RECURSIVE cand AS ({pairs}),
jtoks AS (
  SELECT {id_col},
         list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
  FROM {table}
), jsh AS (
  SELECT DISTINCT {id_col} AS id, unnest({_shingles_sql(text_col)}) AS shingle
  FROM jtoks
), jsizes AS (
  SELECT id, count(*)::BIGINT AS n_sh FROM jsh GROUP BY id
), jinter AS (
  SELECT c.id_a, c.id_b, count(*)::BIGINT AS inter
  FROM cand c
  JOIN jsh a ON a.id = c.id_a
  JOIN jsh b ON b.id = c.id_b AND b.shingle = a.shingle
  GROUP BY c.id_a, c.id_b
), verified AS (
  SELECT i.id_a, i.id_b
  FROM jinter i
  JOIN jsizes sa ON sa.id = i.id_a
  JOIN jsizes sb ON sb.id = i.id_b
  WHERE round(i.inter::DOUBLE / (sa.n_sh + sb.n_sh - i.inter), 4) >= {float(threshold)!r}
), cedges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION
  SELECT id_b, id_a FROM verified
),
reach(id, comp) AS (
  SELECT {id_col}, {id_col}::BIGINT FROM {table}
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN cedges e ON e.src = r.id
)
SELECT id AS {id_col}, min(comp)::BIGINT AS component,
       (min(comp) = id) AS keep
FROM reach GROUP BY id
"""


def decontaminate_fuzzy(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """FUZZY benchmark decontamination (the Llama/GPT-4-report-style
    complement of the exact 8-gram filter in curation.decontaminate):
    a corpus doc is contaminated when its word-shingle set has EXACT
    jaccard >= threshold against ANY benchmark doc, with MinHash/LSH
    band buckets generating the candidates so nothing all-pairs ever
    runs. Returns one row per corpus doc: (id, contaminated,
    max_jaccard) — max_jaccard NULL for docs with no verified
    candidate.

    Scale shape: the corpus side streams through signature + band
    explode exactly as lsh_candidate_pairs; the BENCHMARK side is
    small by definition, so its band table and its shingle table
    BROADCAST — the corpus is never shuffled, and the only exchanges
    key on candidate pairs (bounded by bands x bucket overlap).
    Verification recomputes jaccard EXACTLY over the full shingle
    sets, so threshold decisions are never approximate; LSH only
    bounds recall (a pair sharing no band), tunable via
    num_hashes/band_size like every MinHash stage here."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from ._spread import spread

    corpus = spread(corpus)
    bid, btx = f"_b_{id_col}", f"_b_{text_col}"
    bench_r = bench.select(F.col(id_col).alias(bid), F.col(text_col).alias(btx))

    bands_c = _explode_bands(
        minhash_signatures(corpus, id_col, text_col, num_hashes), id_col,
        num_hashes, band_size,
    )
    bands_b = _explode_bands(
        minhash_signatures(bench_r, bid, btx, num_hashes), bid,
        num_hashes, band_size,
    )
    cands = (
        bands_c.join(F.broadcast(bands_b), ["band", "band_key"])
        .select(id_col, bid)
        .distinct()
    )
    sh_c = corpus.select(
        F.col(id_col), F.explode(F.array_distinct(shingles_col(text_col))).alias("shingle")
    )
    sh_b = bench_r.select(
        F.col(bid), F.explode(F.array_distinct(shingles_col(btx))).alias("shingle")
    )
    n_a = sh_c.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_a"))
    n_b = sh_b.groupBy(bid).agg(F.count(F.lit(1)).alias("n_b"))
    inter = (
        cands.join(sh_c, id_col)
        .join(F.broadcast(sh_b), [bid, "shingle"])
        .groupBy(id_col, bid)
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(n_a, id_col)
        .join(F.broadcast(n_b), bid)
        .select(
            F.col(id_col),
            (F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))).alias("j"),
        )
        .groupBy(id_col)
        .agg(F.max("j").alias("max_jaccard"))
    )
    return corpus.select(id_col).join(jac, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("max_jaccard") >= threshold, F.lit(False)).alias("contaminated"),
        "max_jaccard",
    )


def decontaminate_fuzzy_sql(
    table: str,
    id_col: str,
    text_col: str,
    bench_where: str,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> str:
    """DuckDB twin of decontaminate_fuzzy with the benchmark defined
    as `SELECT * FROM table WHERE bench_where` (the deterministic
    derived-benchmark pattern of decontaminate_sql)."""
    n_bands = num_hashes // band_size

    def bands_sql(src: str, idc: str) -> str:
        rows = []
        for b in range(n_bands):
            key = " || '_' || ".join(f"h{b * band_size + j}" for j in range(band_size))
            rows.append(f"SELECT {idc}, {b} AS band, {key} AS band_key FROM {src}")
        return "\nUNION ALL\n".join(rows)

    bench_src = f"(SELECT * FROM {table} WHERE {bench_where}) bsrc"
    return f"""
WITH sig_c AS (SELECT * FROM ({_minhash_sql_core(table, id_col, text_col, num_hashes)}) x),
sig_b AS (SELECT * FROM ({_minhash_sql_core(bench_src, id_col, text_col, num_hashes)}) x),
bands_c AS ({bands_sql('sig_c', id_col)}),
bands_b AS ({bands_sql('sig_b', id_col)}),
cands AS (
  SELECT DISTINCT c.{id_col} AS cid, b.{id_col} AS bid
  FROM bands_c c JOIN bands_b b ON c.band = b.band AND c.band_key = b.band_key
),
sh_c AS (
  SELECT {id_col}, unnest(list_distinct({_shingles_sql(text_col)})) AS shingle
  FROM (SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
        FROM {table}) t
),
sh_b AS (
  SELECT {id_col}, unnest(list_distinct({_shingles_sql(text_col)})) AS shingle
  FROM (SELECT {id_col},
               list_filter(string_split_regex(lower({text_col}), '{_TOKENIZE_SQL}'), t -> t <> '') AS ts
        FROM {table} WHERE {bench_where}) t
),
na AS (SELECT {id_col}, count(*)::BIGINT AS n_a FROM sh_c GROUP BY {id_col}),
nb AS (SELECT {id_col}, count(*)::BIGINT AS n_b FROM sh_b GROUP BY {id_col}),
inter AS (
  SELECT c.cid, c.bid, count(*)::BIGINT AS inter
  FROM cands c
  JOIN sh_c a ON a.{id_col} = c.cid
  JOIN sh_b b ON b.{id_col} = c.bid AND b.shingle = a.shingle
  GROUP BY c.cid, c.bid
),
jac AS (
  SELECT i.cid, max(i.inter::DOUBLE / (na.n_a + nb.n_b - i.inter)) AS max_jaccard
  FROM inter i JOIN na ON na.{id_col} = i.cid JOIN nb ON nb.{id_col} = i.bid
  GROUP BY i.cid
)
SELECT d.{id_col},
       coalesce(j.max_jaccard >= {float(threshold)!r}, FALSE) AS contaminated,
       j.max_jaccard
FROM {table} d LEFT JOIN jac j ON j.cid = d.{id_col}
"""


def winnow_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
) -> DataFrame:
    """MOSS-style near-dup candidates from winnowing fingerprints
    (Schleimer et al. 2003 §5 — the index MOSS builds): docs sharing
    >= min_shared DISTINCT selected fingerprints become a candidate
    pair, with the shared count as the match signal. Because
    winnowing guarantees a shared fingerprint for any shared run of
    >= k+window-1 tokens, this catches contiguous-passage reuse
    (boilerplate, quotes, plagiarized spans) that whole-document
    MinHash dilutes away on long documents — the two dedup paths are
    complementary and both feed connected_components / keeper rules.

    Scale shape (the LSH-pairs discipline): the self-join runs ONLY
    on the fingerprint key; fingerprints held by more than max_bucket
    docs are dropped first (a near-universal fingerprint is
    boilerplate, not dedup signal — the same skew guard as
    lsh_candidate_pairs); per-pair aggregation is one partial+final
    count. Returns (id_a, id_b, shared_fps) with id_a < id_b."""
    if int(min_shared) < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    from .textstats import winnow_fingerprints

    fps = winnow_fingerprints(df, id_col, text_col, k=k, window=window).select(
        F.col(id_col), "fp"
    ).distinct()
    # One groupBy bucketizes each fingerprint (replacing the window +
    # self-join, which shuffled the fingerprint table 4x and evaluated
    # its derivation twice); pairs are generated inside each <=
    # max_bucket bucket from the sorted id array, then counted per
    # pair — identical (id_a < id_b, one instance per shared fp).
    buckets = (
        fps.groupBy("fp")
        .agg(F.collect_list(id_col).alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= int(max_bucket)))
        .select(F.array_sort("_ids").alias("_ids"))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("_ids"),
                    lambda x, i: F.transform(
                        F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
                        lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                    ),
                )
            )
        ).alias("_p")
    )
    return (
        pairs.groupBy(F.col("_p.id_a").alias("id_a"), F.col("_p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= int(min_shared))
    )


def winnow_candidate_pairs_sql(
    table: str,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int = 1000,
) -> str:
    """DuckDB twin of winnow_candidate_pairs — same fingerprints,
    same bucket cap, same pair count/threshold."""
    from .textstats import winnow_fingerprints_sql

    inner = winnow_fingerprints_sql(table, id_col, text_col, k=k, window=window)
    return f"""
WITH wcp_f AS (
  SELECT DISTINCT {id_col}, fp FROM ({inner})
), wcp_s AS (
  SELECT * FROM (
    SELECT {id_col}, fp, count(*) OVER (PARTITION BY fp) AS bucket_n FROM wcp_f
  ) WHERE bucket_n <= {int(max_bucket)}
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*)::BIGINT AS shared_fps
FROM wcp_s a JOIN wcp_s b ON a.fp = b.fp AND a.{id_col} < b.{id_col}
GROUP BY a.{id_col}, b.{id_col}
HAVING count(*) >= {int(min_shared)}
"""
