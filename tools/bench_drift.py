"""Attribute bench movement: compare two bench.py JSON lines.

Usage: python tools/bench_drift.py OLD.json NEW.json [threshold]

Prints, for every query present in both files, the raw new/old ratio
AND the canary-normalized ratio (raw divided by the runs' median-canary
ratio — host/JVM-session drift moves the canary too, a real plan
regression does not), then flags queries whose NORMALIZED ratio exceeds
the threshold (default 1.25, the r7-verdict bar). Exit code 1 when
anything is flagged, so the check can gate scripts.

Normalization source, in preference order (r12 verdict #1/#3):

* **3-shape canary basket** (both files carry `canary_basket`, r12+):
  the median per-shape factor — the calibrated path. The printed
  `norm` column divides by the MEDIAN shape factor; a query is
  FLAGGED only when it exceeds the bar under EVERY per-shape
  normalization (r12 verdict #7 — equivalently raw > thr × the MAX
  shape factor). Rationale, measured r13: per-shape ratios spread
  ~19% even on a same-host back-to-back pair (0.89/1.03/1.08), so a
  query whose cost profile matches the fastest-moving shape gets up
  to ~10% of spurious normalized inflation under the median; the
  AND-rule removes exactly that class while keeping full sensitivity
  when the shapes agree (on the r13 cross-host pair it cut 14
  median-flags to 3, converging on the 2 raw flags).
* **Scalar-canary FALLBACK** (no usable 3-shape basket pair — at
  least one file predates the basket, or the files' common shape set
  is smaller than the 3 expected shapes after a schema drift): the
  single JVM-aggregate canary is exactly the over-correction the
  basket was built to fix (r11: canary 0.91x while the suite ran
  ~1.12x; the r11<->r12 cross-epoch table flagged 22 queries in
  modules the round never touched). In this mode the tool prints a
  loud banner, SUPPRESSES the normalized column/flags, and flags on
  RAW ratios only — the documented cross-epoch adjudication (raw
  totals + module-diff correlation, see README).
* **No canary at all**: raw ratios, same raw-only flagging.
"""

from __future__ import annotations

import json
import statistics
import sys

# the r12 canary basket spans exactly these many shapes
# (shuffle-heavy / Arrow-heavy / parquet-scan); the every-shape
# AND-rule is only calibrated over the full set (ADVICE r13 #1)
_EXPECTED_BASKET_SHAPES = 3


def _canary_median(doc: dict) -> float | None:
    c = doc.get("canary")
    if not c:
        return None
    vals = [v for v in c.values() if isinstance(v, (int, float))]
    return statistics.median(vals) if vals else None


def _basket_ratios(old: dict, new: dict) -> dict[str, float] | None:
    """Per-shape host factors from the 3-shape canary basket (r11
    verdict #4): the new/old median ratio of each shape. Spanning a
    shuffle-heavy, an Arrow-heavy and a scan-heavy shape tracks
    suite-level host state where the single JVM aggregate didn't (the
    r11 run: canary said 0.91× while the whole suite ran ~1.12×)."""
    bo, bn = old.get("canary_basket"), new.get("canary_basket")
    if not bo or not bn:
        return None
    ratios = {}
    for shape in sorted(set(bo) & set(bn)):
        o = [v for v in bo[shape] if isinstance(v, (int, float))]
        n = [v for v in bn[shape] if isinstance(v, (int, float))]
        if o and n and statistics.median(o) > 0:
            ratios[shape] = statistics.median(n) / statistics.median(o)
    if not ratios:
        return None
    for shape, r in ratios.items():
        print(f"canary basket {shape}: {r:.2f}x")
    if len(ratios) < _EXPECTED_BASKET_SHAPES:
        # a partial intersection (shape dropped/renamed between rounds)
        # would silently degrade the every-shape AND-rule to a
        # one/two-shape normalization while still being presented as
        # the calibrated basket path (ADVICE r13 #1) — refuse it
        print("=" * 70)
        print(f"DEGRADED BASKET — the files share only "
              f"{sorted(ratios)} of the {_EXPECTED_BASKET_SHAPES} "
              "expected basket shapes.")
        print("The every-shape AND-rule is not calibrated on a partial "
              "shape set;")
        print("dropping to the raw-only fallback.")
        print("=" * 70)
        return None
    return ratios


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2

    def load(path):
        doc = json.load(open(path))
        # driver BENCH_r{N}.json files wrap the bench line in "parsed"
        return doc.get("parsed", doc)

    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

    shape_ratios = _basket_ratios(old, new)
    basket = shape_ratios is not None
    host = statistics.median(shape_ratios.values()) if basket else None
    max_shape = max(shape_ratios.values()) if basket else None
    if host is None:
        # pre-r12 files carry only the scalar canary — fall back
        co, cn = _canary_median(old), _canary_median(new)
        host = (cn / co) if (co and cn) else None
        if host is not None:
            print("=" * 70)
            print("SCALAR-CANARY FALLBACK — no usable 3-shape basket "
                  "pair (at least one")
            print("file predates the r12 canary basket, or the common "
                  "shape set is")
            print("degraded — see above).")
            print("The single JVM-aggregate canary over-corrects "
                  "cross-epoch/cross-host")
            print("(r11: canary 0.91x vs suite ~1.12x). Normalized "
                  "ratios are UNRELIABLE")
            print("here and are suppressed; flags below are RAW-ratio "
                  "flags. Adjudicate")
            print("on raw totals + module-diff correlation (README).")
            print("=" * 70)
    if host is None:
        print("WARN: no usable canary pair (scalar canary missing in "
              "one or both files) — raw ratios only")

    qo, qn = old.get("queries", {}), new.get("queries", {})
    common = sorted(set(qo) & set(qn))
    flagged = []
    norm_hdr = f" {'norm':>6s}" if basket else ""
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'raw':>6s}{norm_hdr}")
    for q in common:
        if not qo[q]:
            continue
        raw = qn[q] / qo[q]
        if basket:
            norm = raw / host
            # flag only when the query exceeds the bar under EVERY
            # per-shape normalization (r12 verdict #7): raw > thr·max
            flag = raw > thr * max_shape
            mark = " <-- " if flag else ""
            print(f"{q:34s} {qo[q]:7.2f} {qn[q]:7.2f} {raw:6.2f} "
                  f"{norm:6.2f}{mark}")
            if flag:
                flagged.append(q)
        else:
            mark = " <-- raw" if raw > thr else ""
            print(f"{q:34s} {qo[q]:7.2f} {qn[q]:7.2f} {raw:6.2f}{mark}")
            if raw > thr:
                flagged.append(q)
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    if not common or tot_o == 0:
        print("no common queries (or zero old total) — nothing to "
              "compare; check the entry names in both files")
        return 2
    print(f"\ncommon total: {tot_o:.2f}s -> {tot_n:.2f}s "
          f"(raw {tot_n / tot_o:.2f}x"
          + (f", basket host factor {host:.2f}x, normalized "
             f"{tot_n / tot_o / host:.2f}x" if basket else
             (f"; scalar-canary factor {host:.2f}x shown for reference "
              "ONLY — not used" if host else "")) + ")")
    kind = (f"every-shape-normalized, i.e. raw > {thr}x * max-shape "
            f"{max_shape:.2f}x" if basket else f"raw > {thr}x")
    if flagged:
        print(f"FLAGGED ({kind}): {', '.join(flagged)}")
        return 1
    print(f"no query over the bar ({kind})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
