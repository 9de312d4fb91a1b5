"""Quick host-window probe: aggregate streaming tasks/sec at 2 and 8
procs + the ratio (ideal 4.0). Run before timing-sensitive sessions;
spawn-safe because it lives in a real file (a stdin script cannot be
re-imported by multiprocessing spawn workers).

Usage: python tools/probe_window.py
"""
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cal_task  # noqa: E402


def main() -> None:
    out = {}
    for procs in (2, 8):
        with mp.get_context("spawn").Pool(procs) as pool:
            t0 = time.time()
            pool.map(_cal_task, range(procs * 3))
            out[procs] = round(procs * 3 / (time.time() - t0), 3)
    print(
        f"tps2={out[2]} tps8={out[8]} ratio={round(out[8] / max(out[2], 1e-9), 2)}"
        " (ideal 4.0; quiet >= 2.0 and tps8 >= 10)"
    )


if __name__ == "__main__":
    main()
