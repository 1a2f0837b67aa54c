"""Streaming-Bloom state-size constancy probe (VERDICT r7 next #6).

Drives ``streaming/bloom_stream.py`` through N micro-batch ingests
with a growing duplicate fraction and records the on-disk state size
after each commit. The O(m) claim is that state is a function of
``m_bits`` alone — NOT of how many documents have flowed through — so
the probe asserts the byte size stays within one filesystem block of
its maximum from the first commit to the last, while the accepted
count keeps growing. Also reports per-batch ingest seconds (the probe
shape: the merge cost is bounded by m/63 words, not corpus size).

Usage: python tools/bloom_stream_probe.py [n_batches] [batch_rows]
                                          [m_words]
Writes /tmp only; not part of the gate.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    m_words = int(sys.argv[3]) if len(sys.argv) > 3 else 16_384

    from cuvs_spark import get_spark
    from cuvs_spark.streaming import bloom_dedup_batch_against_state

    spark = get_spark("bloom_stream_probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = "/tmp/bloom_stream_probe"
    shutil.rmtree(work, ignore_errors=True)
    state = os.path.join(work, "state")

    sizes, secs, accepted_total = [], [], 0
    for b in range(n_batches):
        # 25% of each batch (after the first) replays texts from the
        # previous batch; the rest are novel
        rows = []
        for i in range(batch_rows):
            gid = b * batch_rows + i
            if b > 0 and i % 4 == 0:
                src = (b - 1) * batch_rows + i
                rows.append((gid, f"probe doc {src} payload words"))
            else:
                rows.append((gid, f"probe doc {gid} payload words"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        t0 = time.time()
        n_ok = bloom_dedup_batch_against_state(
            df, state, m_bits=63 * m_words, k=4).count()
        secs.append(round(time.time() - t0, 2))
        accepted_total += n_ok
        sizes.append(_du(os.path.join(state, "bloom")))

    flat = max(sizes) - min(sizes) <= 4096   # within one fs block
    print(json.dumps({
        "n_batches": n_batches, "batch_rows": batch_rows,
        "m_words": m_words,
        "state_bytes_first": sizes[0], "state_bytes_last": sizes[-1],
        "state_bytes_max": max(sizes),
        "state_size_constant": bool(flat),
        "accepted_total": accepted_total,
        "ingest_sec_per_batch": secs,
    }))
    assert flat, f"state grew: {sizes}"
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
