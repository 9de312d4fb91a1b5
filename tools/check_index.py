"""CheckIndex CLI: fast manifest/checksum pass + deep distributed
block-invariant pass. Exit 0 = healthy.

Usage: python tools/check_index.py <index_root> [version] [--exorcise]

--exorcise (Lucene CheckIndex -exorcise): commit a new snapshot
without the structurally-corrupt segments — their documents are LOST.
Runs the fast pass only (corrupt files can't be deep-checked)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fdblucene_spark.operators.check import check_index  # noqa: E402
from fdblucene_spark.session import get_spark  # noqa: E402
from fdblucene_spark.sources.manifest import IndexCatalog  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--exorcise"]
    do_exorcise = "--exorcise" in sys.argv[1:]
    root = args[0]
    version = int(args[1]) if len(args) > 1 else None
    cat = IndexCatalog(root)
    if do_exorcise:
        from fdblucene_spark.operators.check import exorcise

        spark = get_spark("check-index", cores=8,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
        m, dropped = exorcise(spark, root)
        for sid in dropped:
            print("DROPPED:", sid)
        print(f"COMMITTED: version {m.version}, {len(m.segments)} segments")
        return 0
    fast = cat.verify_segments(cat.load(version))
    for p in fast:
        print("FILE:", p)
    spark = get_spark("check-index", cores=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    deep = check_index(spark, root, version).collect()
    for r in deep:
        print(f"BLOCK: {r['field']}/{r['term']} shard={r['shard']} "
              f"block={r['block_id']}: {r['problem']}")
    n = len(fast) + len(deep)
    print("PROBLEMS:", n)
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
