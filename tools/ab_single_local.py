"""Same-window interleaved A/B: pre-acb16ba or-kernel vs the unified
boolean kernel on the driver-local single-query path.

BENCH_r03 showed bm25_single_local 154 -> 210 ms vs r2 — inside this
host's documented 2x minute-to-minute drift, but the unified kernel
(commit acb16ba routes or-mode through _score_shard_boolean) is a
plausible constant-overhead suspect. Cross-window absolutes cannot
settle it; this tool loads the pre-acb16ba query module side by side
with the current one and alternates single queries between them inside
ONE process/window, reporting per-variant medians and the ratio.

Usage: python tools/ab_single_local.py [n_convs] [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIN = "acb16ba^"  # last commit before the unified kernel


def load_old_query_module():
    src = subprocess.run(
        ["git", "show", f"{PIN}:fdblucene_spark/operators/query.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix="ab-r2-"), "query_r2.py")
    with open(path, "w") as f:
        f.write(src)
    # named inside the real package so its relative imports resolve
    spec = importlib.util.spec_from_file_location(
        "fdblucene_spark.operators.query_r2", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from fdblucene_spark.data import synth
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.operators import query as query_new
    from fdblucene_spark.session import get_spark

    old = load_old_query_module()
    spark = get_spark("ab-single-local", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    work = tempfile.mkdtemp(prefix="ab-idx-")
    root = os.path.join(work, "idx")
    df = synth.transcripts(spark, n_convs=n_convs)
    build_index(spark, df, root, key_cols=["conv_id", "turn_idx"], n_shards=32)

    s_new = query_new.Searcher(spark, root)
    s_old = old.Searcher(spark, root)
    terms = ["term00042", "term01500", "needlealpha"]

    # identical results first (rank AND score)
    a = s_new.search_local(terms, 10)
    b = s_old.search_local(terms, 10)
    assert a["doc"].tolist() == b["doc"].tolist(), "rank mismatch old vs new"
    assert a["score"].tolist() == b["score"].tolist(), "score mismatch old vs new"

    for s in (s_new, s_old):  # warm file/driver caches identically
        for _ in range(3):
            s.search_local(terms, 10)

    t_new: list[float] = []
    t_old: list[float] = []
    for i in range(rounds):
        order = [("new", s_new, t_new), ("old", s_old, t_old)]
        if i % 2:  # alternate order to cancel slow drift inside the window
            order.reverse()
        for _, s, sink in order:
            t0 = time.perf_counter()
            s.search_local(terms, 10)
            sink.append((time.perf_counter() - t0) * 1000)

    med_new = statistics.median(t_new)
    med_old = statistics.median(t_old)
    out = {
        "metric": "ab_bm25_single_local",
        "n_convs": n_convs,
        "rounds": rounds,
        "new_ms_median": round(med_new, 1),
        "old_ms_median": round(med_old, 1),
        "new_ms_p10": round(sorted(t_new)[max(0, rounds // 10)], 1),
        "old_ms_p10": round(sorted(t_old)[max(0, rounds // 10)], 1),
        "new_over_old": round(med_new / med_old, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
