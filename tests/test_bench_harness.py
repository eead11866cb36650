"""Unit tests for bench.py's harness plumbing (no rendering).

The autotune flow (tools/autotune.py + BENCH_TUNING.json, round 4)
depends on three small bench.py behaviors that nothing else exercises:
environment precedence of the tuning file, the BENCH_DETAILS_PATH
redirect (trial runs must never clobber the canonical details), and the
incremental _emit_partial merge (a mid-run tunnel death must keep every
already-measured section)."""

import importlib.util
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench(tmp_path, monkeypatch):
    """Import bench.py fresh with its module __file__ left at the repo
    root (tuning lookup) but details redirected into tmp_path."""
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_details_path_redirect(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    monkeypatch.delenv("BENCH_DETAILS_PATH", raising=False)
    assert b._details_path() == os.path.join(_REPO, "BENCH_DETAILS.json")
    redirect = str(tmp_path / "trial.json")
    monkeypatch.setenv("BENCH_DETAILS_PATH", redirect)
    assert b._details_path() == redirect


def test_emit_partial_merges_sections(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    out = str(tmp_path / "details.json")
    monkeypatch.setenv("BENCH_DETAILS_PATH", out)
    monkeypatch.delenv("BENCH_NO_DETAILS", raising=False)
    b._emit_partial({"a": 1})
    b._emit_partial({"b": 2})
    with open(out) as f:
        data = json.load(f)
    assert data["a"] == 1 and data["b"] == 2 and data["_partial"] is True
    # the first write of a fresh run REPLACES stale content
    b2 = _load_bench(tmp_path, monkeypatch)
    b2._emit_partial({"c": 3})
    with open(out) as f:
        data = json.load(f)
    assert "a" not in data and data["c"] == 3


def test_emit_partial_respects_no_details(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    out = str(tmp_path / "details.json")
    monkeypatch.setenv("BENCH_DETAILS_PATH", out)
    monkeypatch.setenv("BENCH_NO_DETAILS", "1")
    b._emit_partial({"a": 1})
    assert not os.path.exists(out)


def test_apply_tuning_env_wins(tmp_path, monkeypatch):
    # BENCH_TUNING_PATH redirects the read (a REAL repo-root
    # BENCH_TUNING.json exists since round 5 — tests must not touch it)
    b = _load_bench(tmp_path, monkeypatch)
    tuning_path = str(tmp_path / "BENCH_TUNING.json")
    monkeypatch.setenv("BENCH_TUNING_PATH", tuning_path)
    with open(tuning_path, "w") as f:
        json.dump(
            {
                "BENCH_FM": "1",
                "BENCH_CSORT": "1",
                "VOLPRIM_FFWALK_ERF": "poly",
                "_decided_by": "test",
                "NOT_A_BENCH_KEY": "1",
            },
            f,
        )
    try:
        monkeypatch.delenv("BENCH_FM", raising=False)
        monkeypatch.setenv("BENCH_CSORT", "0")  # explicit env must win
        monkeypatch.delenv("NOT_A_BENCH_KEY", raising=False)
        monkeypatch.delenv("VOLPRIM_FFWALK_ERF", raising=False)
        b._apply_tuning()
        assert os.environ["BENCH_FM"] == "1"
        assert os.environ["BENCH_CSORT"] == "0"
        assert os.environ["VOLPRIM_FFWALK_ERF"] == "poly"
        assert "NOT_A_BENCH_KEY" not in os.environ
    finally:
        # set by _apply_tuning, not by monkeypatch — they would leak
        # into later tests otherwise
        os.environ.pop("BENCH_FM", None)
        os.environ.pop("VOLPRIM_FFWALK_ERF", None)


def test_apply_tuning_missing_file_is_noop(tmp_path, monkeypatch):
    b = _load_bench(tmp_path, monkeypatch)
    monkeypatch.setenv(
        "BENCH_TUNING_PATH", str(tmp_path / "no_such_tuning.json")
    )
    before = dict(os.environ)
    b._apply_tuning()
    assert dict(os.environ) == before
