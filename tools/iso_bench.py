"""Isolate one or more bench entries through the noop sink (guide §1.4).

Usage: python tools/iso_bench.py <entry> [entry ...] [--n N]

Times each named entry from ``bench.py build_benches`` min-of-N after
one warm-up pass, exactly like the bench's timed loop but without the
other 37 entries. For A/B work during optimization rounds only — the
official number is always the full ``bench.py`` line.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import build_benches
    from cuvs_spark import get_spark

    spark = get_spark("iso_bench")
    spark.sparkContext.setLogLevel("ERROR")
    benches = build_benches(spark, sf_dir)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name in args:
        fn = benches[name]
        spark.sparkContext.setJobDescription(f"iso:{name}:warmup")
        noop(fn())                        # warm-up (index/cache build)
        times = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"iso:{name}:{i}")
            t0 = time.time()
            noop(fn())
            times.append(round(time.time() - t0, 3))
        print(f"ISO {name} min={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
