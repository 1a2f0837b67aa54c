"""Pins for tools/bench_drift.py's flag logic (r12 verdict #3/#7).

The tool is load-bearing for round-over-round adjudication, so its
three modes are pinned: basket-to-basket (AND-rule flags: a query is
flagged only when raw > thr × the MAX per-shape factor), scalar-canary
fallback (loud banner, normalized column suppressed, RAW-ratio flags),
and no-canary (raw-ratio flags). No Spark needed.
"""
from __future__ import annotations

import json
import sys

import pytest


def _run(tmp_path, monkeypatch, capsys, old: dict, new: dict, thr=None):
    sys.modules.pop("tools.bench_drift", None)
    import tools.bench_drift as BD
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    argv = ["bench_drift", str(po), str(pn)]
    if thr is not None:
        argv.append(str(thr))
    monkeypatch.setattr(sys, "argv", argv)
    code = BD.main()
    return code, capsys.readouterr().out


BASKET_FLAT = {"shuffle": [1.0] * 3, "arrow": [1.0] * 3, "scan": [1.0] * 3}


def test_basket_and_rule_flags_only_over_max_shape(tmp_path, monkeypatch,
                                                   capsys):
    """Shapes 1.0/1.0/1.3 (median 1.0, max 1.3): a 1.35x raw query is
    over the median-normalized bar (1.35 > 1.25) but NOT over every
    per-shape normalization (1.35/1.3 < 1.25) -> not flagged; a 1.7x
    raw query exceeds the bar under every shape -> flagged."""
    old = {"queries": {"a": 1.0, "b": 1.0}, "canary_basket": BASKET_FLAT}
    new = {"queries": {"a": 1.35, "b": 1.7},
           "canary_basket": {"shuffle": [1.3] * 3, "arrow": [1.0] * 3,
                             "scan": [1.0] * 3}}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert code == 1
    assert "FLAGGED" in out and "b" in out.split("FLAGGED")[1]
    assert "a" not in out.split("FLAGGED")[1].split(":")[1]
    assert "SCALAR-CANARY FALLBACK" not in out


def test_basket_no_flags_when_under_bar(tmp_path, monkeypatch, capsys):
    old = {"queries": {"a": 1.0}, "canary_basket": BASKET_FLAT}
    new = {"queries": {"a": 1.2}, "canary_basket": BASKET_FLAT}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert code == 0
    assert "no query over the bar" in out


def test_scalar_fallback_is_loud_and_raw_only(tmp_path, monkeypatch,
                                              capsys):
    """Old file predates the basket: banner printed, normalized column
    suppressed, flags computed on RAW ratios (a scalar canary of 0.5x
    must NOT inflate a 1.2x raw query into a 2.4x 'normalized' flag)."""
    old = {"queries": {"a": 1.0, "b": 1.0}, "canary": {"x": 1.0}}
    new = {"queries": {"a": 1.2, "b": 1.3}, "canary": {"x": 0.5},
           "canary_basket": BASKET_FLAT}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert "SCALAR-CANARY FALLBACK" in out
    header = next(ln for ln in out.splitlines() if ln.startswith("query"))
    assert " norm" not in header  # normalized column suppressed
    # a (1.2x raw) survives; b (1.3x raw) is the only flag
    assert code == 1
    flagged = out.split("FLAGGED")[1]
    assert "b" in flagged and "a" not in flagged.split(":")[1]
    assert "shown for reference ONLY" in out


def test_degraded_basket_drops_to_fallback(tmp_path, monkeypatch, capsys):
    """ADVICE r13 #1: when the two files share fewer than the 3
    expected basket shapes (schema drift / renamed shape), the
    every-shape AND-rule is not calibrated — the tool must refuse the
    basket path loudly and drop to the fallback instead of silently
    normalizing by a 1–2 shape subset."""
    old = {"queries": {"a": 1.0}, "canary": {"x": 1.0},
           "canary_basket": BASKET_FLAT}
    new = {"queries": {"a": 1.4}, "canary": {"x": 1.0},
           "canary_basket": {"shuffle": [1.0] * 3, "arrow": [1.0] * 3}}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert "DEGRADED BASKET" in out
    assert "SCALAR-CANARY FALLBACK" in out  # both carry a scalar canary
    header = next(ln for ln in out.splitlines() if ln.startswith("query"))
    assert " norm" not in header  # basket path refused
    assert code == 1  # 1.4x raw > 1.25 raw bar


def test_degraded_basket_without_scalar_goes_raw(tmp_path, monkeypatch,
                                                 capsys):
    """Degraded basket and no scalar canary anywhere: raw-only mode
    with the (reworded, ADVICE r13 #2) no-usable-pair warning."""
    old = {"queries": {"a": 1.0},
           "canary_basket": {"shuffle": [1.0] * 3}}
    new = {"queries": {"a": 1.1},
           "canary_basket": {"shuffle": [1.0] * 3}}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert "DEGRADED BASKET" in out
    assert "no usable canary pair" in out
    assert code == 0


def test_one_sided_scalar_canary_warn_wording(tmp_path, monkeypatch,
                                              capsys):
    """ADVICE r13 #2: exactly one file carries a scalar canary — the
    ratio needs both, so the warning must say 'missing in one or both
    files', not claim neither file has one."""
    old = {"queries": {"a": 1.0}, "canary": {"x": 1.0}}
    new = {"queries": {"a": 1.5}}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert "no usable canary pair" in out
    assert code == 1


def test_no_canary_raw_flags(tmp_path, monkeypatch, capsys):
    old = {"queries": {"a": 1.0}}
    new = {"queries": {"a": 1.5}}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new)
    assert code == 1
    assert "WARN: no usable canary pair" in out


def test_driver_parsed_wrapper_and_threshold_arg(tmp_path, monkeypatch,
                                                 capsys):
    """Driver BENCH_r{N}.json files wrap the line in 'parsed'; a custom
    threshold argument is honored."""
    old = {"parsed": {"queries": {"a": 1.0}, "canary_basket": BASKET_FLAT}}
    new = {"queries": {"a": 1.4}, "canary_basket": BASKET_FLAT}
    code, out = _run(tmp_path, monkeypatch, capsys, old, new, thr=1.5)
    assert code == 0
    code, out = _run(tmp_path, monkeypatch, capsys, old, new, thr=1.3)
    assert code == 1
