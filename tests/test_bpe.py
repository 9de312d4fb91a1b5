"""Distributed BPE trainer/applier vs a pure-Python reference
(Sennrich et al. 2016 greedy pair merging).

Laws pinned:
- merge table identity on a synthetic corpus (freq + deterministic
  (freq desc, left asc, right asc) tie-break)
- greedy left-to-right non-overlap inside one merge ("aaa" with pair
  (a,a) segments [aa, a]) — the replace() semantics both engines share
- early stop when the best pair falls under min_count
- apply: trained-vocab join path and OOV replace-chain path both
  reproduce the reference tokenization (chain-in-rank-order is valid
  because training topologically orders merges: any operand symbol of
  merge r exists only via merges < r)
"""

from collections import Counter

import pytest

from fdblucene_spark.functions.analysis import tokenize_text
from fdblucene_spark.operators.curation import (
    BPE_EOW,
    apply_bpe,
    train_bpe,
)


def _ref_train(word_counts, n_merges, min_count=2):
    vocab = {w: tuple(list(w) + [BPE_EOW]) for w in word_counts}
    merges = []
    for r in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((r, a, b, c))
        for w, syms in vocab.items():
            vocab[w] = _ref_merge_once(syms, a, b)
    return merges, vocab


def _ref_merge_once(syms, a, b):
    # greedy left-to-right non-overlapping, replace() semantics
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_apply(word, merges):
    syms = tuple(list(word) + [BPE_EOW])
    for _, a, b, _c in merges:
        syms = _ref_merge_once(syms, a, b)
    return list(syms)


CORPUS = [
    "the sort merge join",
    "the sorted merge",
    "sort sort sort the merge",
    "aaa aaa banana banana bandana",
    "scan the table then sort",
    "merge then rescan the sorted table",
]


def _word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(tokenize_text(t))
    return dict(c)


@pytest.fixture(scope="module")
def bpe_df(spark):
    return spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(CORPUS)]
    )


def test_train_matches_reference(spark, bpe_df):
    merges, vocab = train_bpe(bpe_df, "text", n_merges=10, min_count=2)
    ref_merges, ref_vocab = _ref_train(_word_counts(CORPUS), 10, min_count=2)
    assert merges == ref_merges
    got = {r["w"]: tuple(r["tokens"]) for r in vocab.collect()}
    assert got == ref_vocab


def test_greedy_overlap_law(spark):
    # 'aaaa' + pair (a,a): greedy left-to-right gives [aa, aa, </w>],
    # never [a, aa, a] — pinned against the reference fold
    df = spark.createDataFrame([{"doc_id": 0, "text": "aaaa aaaa aa"}])
    merges, vocab = train_bpe(df, "text", n_merges=1, min_count=2)
    assert merges[0][1:3] == ("a", "a")
    got = {r["w"]: list(r["tokens"]) for r in vocab.collect()}
    assert got["aaaa"] == ["aa", "aa", BPE_EOW]
    assert got["aa"] == ["aa", BPE_EOW]


def test_early_stop_and_guards(spark):
    df = spark.createDataFrame([{"doc_id": 0, "text": "xy xy zq"}])
    # round0: (x,y) freq 2; any further pair has freq < 2 except
    # (xy,</w>) freq 2, then all freq-1 -> stops before n_merges
    merges, _ = train_bpe(df, "text", n_merges=50, min_count=2)
    assert 0 < len(merges) < 50
    ref, _ = _ref_train(_word_counts(["xy xy zq"]), 50, min_count=2)
    assert merges == ref
    with pytest.raises(ValueError):
        train_bpe(df, "text", n_merges=0)
    with pytest.raises(ValueError):
        train_bpe(df, "text", n_merges=1, min_count=0)


def test_apply_vocab_and_oov_paths(spark, bpe_df):
    merges, vocab = train_bpe(bpe_df, "text", n_merges=10, min_count=2)
    # seen words ride the vocab join; 'resorted'/'bananas' are OOV and
    # take the merge replace chain
    target = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "the sorted merge"},
            {"doc_id": 1, "text": "resorted bananas sort"},
        ]
    )
    got = {r["doc_id"]: list(r["tokens"]) for r in
           apply_bpe(target, "doc_id", "text", vocab, merges).collect()}
    for doc_id, text in [(0, "the sorted merge"), (1, "resorted bananas sort")]:
        want = []
        for w in tokenize_text(text):
            want.extend(_ref_apply(w, merges))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_tie_break_is_lexicographic(spark):
    # (a,b) and (c,d) both freq 2: winner is (a,b)
    df = spark.createDataFrame([{"doc_id": 0, "text": "ab ab cd cd"}])
    merges, _ = train_bpe(df, "text", n_merges=1, min_count=2)
    assert merges[0][1:3] == ("a", "b")
