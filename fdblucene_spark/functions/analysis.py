"""Text analysis: versioned tokenizer as a vectorized pandas UDF.

The reference delegates analysis to Lucene's default analyzer on
TextField (reference: SimpleFDBDirectoryTest.java:204, pom.xml:35-39)
and pins config per directory at creation (reference:
FDBDirectory.java:416-428 getOrSetPageSize pattern). We rebuild it as
a versioned analyzer whose id is recorded in the index manifest, so a
reader can refuse an index built with a different analyzer.

standard_v1: NFC-free lowercase + Unicode word extraction (\\w+).
standard_v2: standard_v1 + English stopword removal (the classic
Lucene StopFilter over EnglishAnalyzer's default stop set). Two real
analyzers make the manifest pin meaningful: an index built with one
refuses appends built with the other, and a Searcher analyzes query
text with the index's pinned version.

Tokenization runs Series-at-a-time inside an Arrow-batched pandas UDF
(BASELINE.json input_hint: no per-row Python UDFs). A pure-JVM
expression variant (split on non-word chars) is provided for corpora
known to be ASCII — it produces identical tokens there and keeps the
whole stage in codegen.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANALYZER_VERSION = "standard_v1"
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (the classic 33-word
# StopAnalyzer list — public Lucene constant)
ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

# analyzer registry: name -> stop set applied after \w+ lowercasing.
# Extending = one entry here; the manifest pin / append refusal /
# query-side analysis all key off the name.
ANALYZERS: dict[str, frozenset[str]] = {
    "standard_v1": frozenset(),
    "standard_v2": ENGLISH_STOPWORDS,
    # v3 = v2 + minimal English plural stemming (Lucene
    # EnglishMinimalStemFilter; Harman's S-stemmer) AFTER the stop
    # filter — the filter-chain order is part of the pinned contract
    "standard_v3": ENGLISH_STOPWORDS,
    # v4 = v1 + word-bigram shingles appended after the unigrams
    # (Lucene ShingleFilter, maxShingleSize=2, tokenSeparator=" ") —
    # the classic phrase-accelerator chain: a 2-word phrase becomes
    # ONE term lookup. Norm semantics follow Lucene's
    # discountOverlaps=true: doc length counts unigrams only (a
    # shingle is emitted at its first member's position, posinc 0),
    # and shingle positions ARE the first member's ordinal
    "standard_v4": frozenset(),
    # v5 = v1 + ASCIIFoldingFilter (analysis-common): accented /
    # decomposed Latin folds to its ASCII skeleton straight after
    # tokenization — NFKD + combining-mark strip + the
    # non-decomposable special cases (ae/oe/ss/o/d/th/l). Covers the
    # Latin-1 Supplement / Latin Extended-A blocks that dominate
    # European text; Lucene's full table reaches further scripts —
    # out-of-table characters pass through unchanged, documented
    "standard_v5": frozenset(),
    # v6 = v1 + EdgeNGramTokenFilter(minGram=2, maxGram=5,
    # preserveOriginal=true) — the SearchAsYouTypeField index chain:
    # each token also indexes its 2..5-char prefixes so a typed
    # prefix is ONE term lookup (no termdict expansion at query
    # time). All grams of a token share its ordinal (posinc 0) and
    # dl counts original tokens only (discountOverlaps norm
    # semantics, like the v4 shingle chain). INDEX-TIME ONLY: like
    # Lucene's SearchAsYouTypeField, query text analyzes with the
    # plain v1 chain (search_analyzer maps v6 -> v1) — expanding the
    # user's query into its own prefixes would be wrong
    "standard_v6": frozenset(),
    # v7 = v1 tokenization + CJK bigrams (Lucene CJKAnalyzer:
    # StandardTokenizer + CJKBigramFilter): inside each \w+ token,
    # runs of CJK codepoints (Han, Hiragana, Katakana, Hangul +
    # compatibility blocks) re-emit as overlapping character BIGRAMS
    # (a length-1 run keeps its unigram); non-CJK runs pass through.
    # Bigrams REPLACE the stream — each advances one position and dl
    # counts emitted tokens (Lucene's norm over the bigram stream).
    # Query text analyzes with v7 too (CJKAnalyzer is symmetric).
    "standard_v7": frozenset(),
}

# analyzers that run the minimal-stem filter after stop removal
STEM_ANALYZERS = frozenset({"standard_v3"})

# analyzers that append word-bigram shingles after the unigram stream
SHINGLE_ANALYZERS = frozenset({"standard_v4"})

# analyzers that ASCII-fold tokens straight after tokenization
FOLD_ANALYZERS = frozenset({"standard_v5"})

# analyzers that append edge n-grams (index-time only; search side
# maps to standard_v1 via search_analyzer)
EDGE_ANALYZERS = frozenset({"standard_v6"})
EDGE_MIN, EDGE_MAX = 2, 5  # pinned with the analyzer name

# analyzers that re-emit CJK runs as character bigrams (CJKAnalyzer)
CJK_ANALYZERS = frozenset({"standard_v7"})
# Hangul Jamo, Hiragana+Katakana, Hangul Compat Jamo, Hangul
# Syllables, CJK Unified Ideographs, CJK Compat Ideographs — the
# blocks CJKBigramFilter pairs by default
_CJK_RANGE = (
    "\u1100-\u11ff\u3040-\u30ff\u3130-\u318f"
    "\uac00-\ud7af\u4e00-\u9fff\uf900-\ufaff"
)
_CJK_RUN_RE = re.compile(f"[{_CJK_RANGE}]+|[^{_CJK_RANGE}]+")
_CJK_FIRST_RE = re.compile(f"[{_CJK_RANGE}]")


def cjk_bigrams(token: str) -> list[str]:
    """CJKBigramFilter for one (lowercased) token: CJK runs become
    overlapping character bigrams (length-1 runs keep the unigram),
    non-CJK runs pass through whole, in surface order."""
    if not _CJK_FIRST_RE.search(token):
        return [token]
    out: list[str] = []
    for run in _CJK_RUN_RE.findall(token):
        if _CJK_FIRST_RE.match(run):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        else:
            out.append(run)
    return out


def cjk(analyzer: str = ANALYZER_VERSION) -> bool:
    stop_set(analyzer)  # validate the name
    return analyzer in CJK_ANALYZERS

# non-decomposable folds (NFKD leaves these alone); tokens are
# lowercased before folding, so the lowercase forms suffice
_FOLD_SPECIALS = str.maketrans(
    {"æ": "ae", "œ": "oe", "ß": "ss", "ø": "o", "đ": "d", "ð": "d",
     "þ": "th", "ł": "l", "ħ": "h", "ŋ": "n", "ı": "i"}
)
_COMBINING_RE = re.compile("[\u0300-\u036f]")


def ascii_fold(token: str) -> str:
    """ASCIIFoldingFilter for one (lowercased) token: NFKD
    decomposition, combining-mark strip, special-case table. A token
    that would fold to empty keeps its surface — the Lucene filter
    never erases a token."""
    import unicodedata

    folded = _COMBINING_RE.sub(
        "", unicodedata.normalize("NFKD", token).translate(_FOLD_SPECIALS)
    )
    return folded if folded else token


def folds(analyzer: str = ANALYZER_VERSION) -> bool:
    stop_set(analyzer)  # validate the name
    return analyzer in FOLD_ANALYZERS


def shingles(analyzer: str = ANALYZER_VERSION) -> bool:
    stop_set(analyzer)  # validate the name
    return analyzer in SHINGLE_ANALYZERS


def edge_grams(analyzer: str = ANALYZER_VERSION) -> bool:
    stop_set(analyzer)  # validate the name
    return analyzer in EDGE_ANALYZERS


def edge_expand(token: str) -> list[str]:
    """EdgeNGramTokenFilter(EDGE_MIN, EDGE_MAX, preserveOriginal) for
    one token: its EDGE_MIN..min(len, EDGE_MAX) prefixes, plus the
    original surface when it is not already among them (longer than
    EDGE_MAX, or shorter than EDGE_MIN)."""
    n = len(token)
    if n < EDGE_MIN:
        return [token]
    grams = [token[:g] for g in range(EDGE_MIN, min(n, EDGE_MAX) + 1)]
    if n > EDGE_MAX:
        grams.append(token)
    return grams


def search_analyzer(analyzer: str = ANALYZER_VERSION) -> str:
    """The QUERY-TIME analyzer for an index pinned to `analyzer`.
    Identity for every chain except the edge-gram one: like Lucene's
    SearchAsYouTypeField, standard_v6 applies edge n-grams at index
    time only, so query text analyzes with the plain v1 chain (the
    typed prefix IS the term to look up)."""
    stop_set(analyzer)  # validate the name
    return "standard_v1" if analyzer in EDGE_ANALYZERS else analyzer


def stems(analyzer: str = ANALYZER_VERSION) -> bool:
    stop_set(analyzer)  # validate the name
    return analyzer in STEM_ANALYZERS


def min_stem(w: str) -> str:
    """Lucene EnglishMinimalStemFilter, char-for-char (the public
    EnglishMinimalStemmer.stem rules): strip plural -s with the
    guards -us/-ss keep, -ies -> -y (unless -aies/-eies), and
    -ies/-aes/-oes/-ees length-3 vowel-e keeps."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c2 = w[-2]
    if c2 == "u" or c2 == "s":
        return w
    if c2 == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
        return w[:-1]
    return w[:-1]

KEYWORD_ANALYZER = "keyword_v1"  # whole value = single term, no lowercase
                                 # (reference: StringField("_id", ...),
                                 #  SimpleFDBDirectoryTest.java:205)


# Custom StopFilter chains (Lucene StopFilter with a user-supplied
# CharArraySet — the everyday "StandardAnalyzer(myStopWords)" setup):
# analyzer name 'stop:w1,w2,...' = standard_v1 + that stop set. The
# manifest pin is the NAME, and config checks are string equality, so
# only the canonical form (lowercase, deduped, sorted, comma-joined)
# is accepted here; build_index canonicalizes user input first via
# canonical_analyzer.
CUSTOM_STOP_PREFIX = "stop:"


def canonical_analyzer(name: str) -> str:
    """Canonical form of an analyzer name: registry names validate and
    pass through; 'stop:...' chains lowercase, dedupe and sort their
    words (each must be one analyzer token) so equal sets always pin
    equal strings."""
    if not name.startswith(CUSTOM_STOP_PREFIX):
        if name not in ANALYZERS:
            raise ValueError(
                f"unknown analyzer {name!r}; have {sorted(ANALYZERS)} "
                f"or '{CUSTOM_STOP_PREFIX}w1,w2,...'"
            )
        return name
    words = sorted(
        {w.strip().lower() for w in name[len(CUSTOM_STOP_PREFIX):].split(",") if w.strip()}
    )
    if not words:
        raise ValueError("custom stop analyzer needs at least one word")
    for w in words:
        if not _TOKEN_RE.fullmatch(w):
            raise ValueError(f"stop word {w!r} is not a single analyzer token")
    return CUSTOM_STOP_PREFIX + ",".join(words)


def stop_set(analyzer: str = ANALYZER_VERSION) -> frozenset[str]:
    if analyzer.startswith(CUSTOM_STOP_PREFIX):
        canon = canonical_analyzer(analyzer)
        if canon != analyzer:
            raise ValueError(
                f"custom stop analyzer must be canonical {canon!r}, got {analyzer!r} "
                "(build_index canonicalizes for you)"
            )
        return frozenset(canon[len(CUSTOM_STOP_PREFIX):].split(","))
    if analyzer not in ANALYZERS:
        raise ValueError(
            f"unknown analyzer {analyzer!r}; have {sorted(ANALYZERS)} "
            f"or '{CUSTOM_STOP_PREFIX}w1,w2,...'"
        )
    return ANALYZERS[analyzer]


def tokenize_text(text: str | None, analyzer: str = ANALYZER_VERSION) -> list[str]:
    """Reference tokenizer for the pytest oracle — same regex, plain Python."""
    if text is None:
        return []
    stops = stop_set(analyzer)
    toks = _TOKEN_RE.findall(text.lower())
    if folds(analyzer):
        toks = [t if t.isascii() else ascii_fold(t) for t in toks]
    if cjk(analyzer):
        toks = [g for t in toks for g in cjk_bigrams(t)]
    if stops:
        toks = [t for t in toks if t not in stops]
    if stems(analyzer):
        toks = [min_stem(t) for t in toks]
    if shingles(analyzer):
        toks = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if edge_grams(analyzer):
        toks = [g for t in toks for g in edge_expand(t)]
    return toks


def _make_tokens_udf(analyzer: str):
    stops = stop_set(analyzer)
    do_stem = stems(analyzer)
    do_shingle = shingles(analyzer)
    do_fold = folds(analyzer)
    do_edge = edge_grams(analyzer)
    do_cjk = cjk(analyzer)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _udf(texts: pd.Series) -> pd.Series:
        found = texts.fillna("").str.lower().str.findall(_TOKEN_RE)
        if do_fold:
            found = found.apply(
                lambda ts: [t if t.isascii() else ascii_fold(t) for t in ts]
            )
        if do_cjk:
            found = found.apply(lambda ts: [g for t in ts for g in cjk_bigrams(t)])
        if stops:
            found = found.apply(lambda ts: [t for t in ts if t not in stops])
        if do_stem:
            found = found.apply(lambda ts: [min_stem(t) for t in ts])
        if do_shingle:
            found = found.apply(
                lambda ts: ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]
            )
        if do_edge:
            found = found.apply(
                lambda ts: [g for t in ts for g in edge_expand(t)]
            )
        return found

    return _udf


_UDF_CACHE: dict[str, object] = {}


def tokens_udf_for(analyzer: str = ANALYZER_VERSION):
    """Arrow-batched analyzer UDF: Series in, Series of token lists out."""
    if analyzer not in _UDF_CACHE:
        _UDF_CACHE[analyzer] = _make_tokens_udf(analyzer)
    return _UDF_CACHE[analyzer]


tokens_udf = tokens_udf_for(ANALYZER_VERSION)  # back-compat alias


def min_stem_expr(t: Column) -> Column:
    """Catalyst twin of min_stem (pure JVM, codegen-friendly):
    1-based Column.substr arithmetic mirrors the char tests."""
    n = F.length(t)
    last = t.substr(n, F.lit(1))
    c2 = t.substr(n - 1, F.lit(1))
    c3 = t.substr(n - 2, F.lit(1))
    c4 = t.substr(n - 3, F.lit(1))
    drop1 = t.substr(F.lit(1), n - 1)
    return (
        F.when((n < 3) | (last != F.lit("s")), t)
        .when(c2.isin("u", "s"), t)
        .when(
            c2 == F.lit("e"),
            F.when(
                (n > 3) & (c3 == F.lit("i")) & ~c4.isin("a", "e"),
                F.concat(t.substr(F.lit(1), n - 3), F.lit("y")),
            )
            .when(c3.isin("i", "a", "o", "e"), t)
            .otherwise(drop1),
        )
        .otherwise(drop1)
    )


def tokenize_expr_ascii(col: Column, analyzer: str = ANALYZER_VERSION) -> Column:
    """JVM-only tokenizer for ASCII corpora: identical to the named
    analyzer when text contains no non-ASCII word chars. Stays in
    whole-stage codegen (no Python at all)."""
    stops = stop_set(analyzer)
    arr = F.split(F.lower(col), r"[^a-z0-9_]+")
    if stops:
        stop_arr = F.array(*[F.lit(s) for s in sorted(stops)])
        arr = F.filter(
            arr, lambda t: (t != F.lit("")) & ~F.array_contains(stop_arr, t)
        )
    else:
        arr = F.filter(arr, lambda t: t != F.lit(""))
    if stems(analyzer):
        arr = F.transform(arr, min_stem_expr)
    if shingles(analyzer):
        # bind the filtered array ONCE (lambda bodies are not CSE'd)
        def _append_bigrams(ts):
            bigr = F.when(
                F.size(ts) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - 1),
                    lambda i: F.concat_ws(" ", F.slice(ts, i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
            return F.concat(ts, bigr)

        arr = F.element_at(
            F.transform(F.array(arr), _append_bigrams), 1
        )
    if edge_grams(analyzer):
        # EdgeNGram expansion as pure codegen array ops (per-token
        # prefix list, original appended when longer than EDGE_MAX);
        # CaseWhen evaluates lazily per row, so the sequence() never
        # sees a start > stop for sub-EDGE_MIN tokens
        def _gram_list(t):
            n = F.length(t)
            grams = F.transform(
                F.sequence(F.lit(EDGE_MIN), F.least(n, F.lit(EDGE_MAX))),
                lambda g: t.substr(F.lit(1), g),
            )
            grams = F.when(
                n > F.lit(EDGE_MAX), F.concat(grams, F.array(t))
            ).otherwise(grams)
            return F.when(n < F.lit(EDGE_MIN), F.array(t)).otherwise(grams)

        arr = F.flatten(F.transform(arr, _gram_list))
    return arr


def with_tokens(
    df: DataFrame, text_col: str = "text", out_col: str = "tokens",
    ascii_fast_path: bool = False, analyzer: str = ANALYZER_VERSION,
) -> DataFrame:
    """Add a token-array column using the versioned analyzer."""
    expr = (
        tokenize_expr_ascii(F.col(text_col), analyzer)
        if ascii_fast_path
        else tokens_udf_for(analyzer)(F.col(text_col))
    )
    return df.withColumn(out_col, expr)


def exploded_terms(
    df: DataFrame, doc_col: str = "doc", text_col: str = "text", ascii_fast_path: bool = False
) -> DataFrame:
    """(doc, text) -> (doc, pos, term) — one row per token occurrence.

    posexplode runs JVM-side; only the token extraction touches Python
    (and not at all on the ascii fast path).
    """
    toks = with_tokens(df, text_col=text_col, ascii_fast_path=ascii_fast_path)
    return toks.select(
        F.col(doc_col).alias("doc"), F.posexplode("tokens").alias("pos", "term")
    )
