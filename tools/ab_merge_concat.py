"""Same-window interleaved A/B: pre-14bf49a merge write path (stats
via post-write read-back jobs) vs the current Observation-metrics
write path, on the identical 2-segment concat workload.

BENCH_r04 showed merge_concat 2.94 s (r3) -> 10.24 s (r4), +248%,
while driver-local stages in the same window were flat. Commit
14bf49a rewrote merge's write path that round, so it is the suspect;
the alternative explanation is this host's documented minute-scale
streaming-bandwidth throttling (writes are bandwidth-bound). Cross-
window absolutes cannot separate the two; this tool loads the
pre-14bf49a merge module side by side with the current one and
alternates full concat merges between them inside ONE process/window
(ABBA order), reporting per-variant medians and the ratio.

The 2-segment index is built ONCE; each iteration copies it to a
fresh root (file copy, excluded from timing) and merges there, so
both variants see byte-identical input.

Usage: python tools/ab_merge_concat.py [n_convs] [rounds_per_variant]
Prints one JSON line.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIN = "14bf49a^"  # last commit before observed-metrics merge writes


def load_old_merge_module():
    src = subprocess.run(
        ["git", "show", f"{PIN}:fdblucene_spark/operators/merge.py"],
        capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    path = os.path.join(tempfile.mkdtemp(prefix="ab-merge-r3-"), "merge_r3.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "fdblucene_spark.operators.merge_r3", path
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from pyspark.sql import functions as F

    from fdblucene_spark.data import synth
    from fdblucene_spark.operators import merge as merge_new
    from fdblucene_spark.operators.build import build_index
    from fdblucene_spark.session import get_spark

    old = load_old_merge_module()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-merge-concat", cores=cpus)
    work = tempfile.mkdtemp(prefix="ab-merge-")
    base_root = os.path.join(work, "base_idx")

    # one 2-segment index, mirroring bench.py's append_segment shape
    convs = synth.transcripts(spark, n_convs=n_convs)
    build_index(spark, convs, base_root, key_cols=["conv_id", "turn_idx"],
                n_shards=max(16, cpus), fingerprint="ab-base")
    extra = synth.transcripts(spark, n_convs=n_convs + max(200, n_convs // 10)).filter(
        F.col("conv_id") >= f"conv_{n_convs:06d}"
    )
    build_index(spark, extra, base_root, key_cols=["conv_id", "turn_idx"],
                n_shards=max(16, cpus), append=True, fingerprint="ab-extra")

    def one(mod, i):
        root = os.path.join(work, f"m{i}")
        shutil.copytree(base_root, root)  # excluded from timing
        t0 = time.time()
        m = mod.merge_segments(spark, root, mode="concat")
        dt = time.time() - t0
        assert len(m.segments) == 1
        return dt, m.n_docs

    # warmup (JIT/codegen caches) with the NEW path, discarded
    one(merge_new, "warm")

    times = {"old_readback": [], "new_observed": []}
    ndocs = set()
    order = []
    for r in range(rounds):
        order += (["A", "B", "B", "A"] if r % 2 == 0 else ["B", "A", "A", "B"])[:2]
    for i, v in enumerate(order):
        mod = old if v == "A" else merge_new
        key = "old_readback" if v == "A" else "new_observed"
        dt, nd = one(mod, i)
        times[key].append(round(dt, 3))
        ndocs.add(nd)

    med_a = statistics.median(times["old_readback"])
    med_b = statistics.median(times["new_observed"])
    print(json.dumps({
        "workload": {"n_convs": n_convs, "segments": 2, "cpus": cpus},
        "old_readback_s": times["old_readback"],
        "new_observed_s": times["new_observed"],
        "median_old_s": round(med_a, 3),
        "median_new_s": round(med_b, 3),
        "new_over_old": round(med_b / med_a, 3),
        "stats_agree": len(ndocs) == 1,
    }))


if __name__ == "__main__":
    main()
