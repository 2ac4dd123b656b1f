"""Same-window ABAB of the flagship dedup query between two checkouts.

Why: the round-5 scaling legs ran at `f4f7093`; commits after launch
(notably the band_key-only bucket-stream partitioning) touch the measured
job.  BENCH/BASELINE.md argues from the plan that HEAD strictly reduces
shuffle volume; this script turns that argument into a measurement by
timing `minhash_dedup_clusters` at sf0.1 in alternating fresh processes
(A=repo HEAD, B=pinned worktree), warm runs discarded, min-of-3 per
process.  Same protocol as BENCH/ab_r4 (min wall, one window, interleaved
so host phase hits both revs equally).

Usage: python scripts/ab_flagship.py <checkout_a> <checkout_b> [rounds]
Prints one JSON line; the caller records it in BENCH/.
"""
import json
import subprocess
import sys

WORKER = r"""
import time, sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from qalsh_spark.queries import QUERIES
sf = "/root/testdata/sf0.1"
QUERIES["minhash_dedup_clusters"](spark, sf).count()  # warm: codegen + page cache
QUERIES["minhash_dedup_clusters"](spark, sf).count()
walls = []
for _ in range(3):
    t = time.time()
    QUERIES["minhash_dedup_clusters"](spark, sf).count()
    walls.append(time.time() - t)
print("WALLS=" + ",".join(f"{w:.3f}" for w in walls))
spark.stop()
"""


def leg(checkout: str) -> list[float]:
    out = subprocess.run(
        [sys.executable, "-c", WORKER], cwd=checkout,
        capture_output=True, text=True, timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("WALLS="):
            return [float(x) for x in line[6:].split(",")]
    raise RuntimeError(f"no WALLS from {checkout}: {out.stderr[-500:]}")


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    runs: dict[str, list[float]] = {a: [], b: []}
    for _ in range(rounds):  # ABAB interleave: host phase hits both revs
        for c in (a, b):
            runs[c].extend(leg(c))
            print(f"{c}: {runs[c]}", file=sys.stderr, flush=True)
    print(json.dumps({
        "query": "minhash_dedup_clusters", "sf": "sf0.1",
        "protocol": "ABAB fresh processes, 2 warm + 3 timed each, min wall",
        "legs": {c: {"walls": runs[c], "min": min(runs[c])} for c in runs},
    }))


if __name__ == "__main__":
    main()
