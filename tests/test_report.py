"""The published performance numbers are generated, not hand-typed.

``tools/report.py`` owns the marked blocks in README.md and
docs/scale/bench.md, regenerating them from the newest driver-archived
``BENCH_r*.json``.  This gate makes staleness a test failure: if a new bench
archive lands (or the generator changes) without re-running the tool, the
suite goes red instead of the README silently drifting from the archive —
the round-3 failure mode where three surfaces quoted three different
actor-feed numbers.
"""
import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

import report  # noqa: E402


def test_generated_blocks_up_to_date():
    stale = report.run(check=True)
    assert stale == [], (
        f"generated number blocks out of date in {stale}; run tools/report.py"
    )


def test_fmt_three_sig_figs():
    assert report.fmt(166_555_304) == "167M"
    assert report.fmt(2_244_022) == "2.24M"
    assert report.fmt(17_771_910) == "17.8M"
    assert report.fmt(2_422) == "2.42k"
    assert report.fmt(None) == "—"


def test_splice_roundtrip(tmp_path):
    p = tmp_path / "doc.md"
    p.write_text("head\n<!-- x:begin -->\nold\n<!-- x:end -->\ntail\n")
    assert report.splice(p, "x", "new", check=False) is True
    assert p.read_text() == "head\n<!-- x:begin -->\nnew\n<!-- x:end -->\ntail\n"
    # idempotent
    assert report.splice(p, "x", "new", check=False) is False
    # check mode never writes
    assert report.splice(p, "x", "other", check=True) is True
    assert "new" in p.read_text()


def test_latest_bench_picks_highest_round(tmp_path):
    for n, v in ((3, 10), (10, 20)):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"parsed": {"value": v, "vs_baseline": 1.0}})
        )
    n, parsed = report.latest_bench(tmp_path)
    assert (n, parsed["value"]) == (10, 20)


def test_local_bench_supersedes_matching_round(tmp_path):
    (tmp_path / "BENCH_r04.json").write_text(
        json.dumps({"parsed": {"value": 10, "vs_baseline": 1.0}})
    )
    (tmp_path / "BENCH_local.json").write_text(
        json.dumps({"supersedes": 4, "parsed": {"value": 99, "vs_baseline": 2.0}})
    )
    n, _ = report.latest_bench(tmp_path)
    assert report.local_bench(tmp_path, n)["value"] == 99
    # A newer driver archive makes the local file stale: ignored.
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"parsed": {"value": 20, "vs_baseline": 1.0}})
    )
    n, parsed = report.latest_bench(tmp_path)
    assert report.local_bench(tmp_path, n) is None
    assert parsed["value"] == 20


def test_missing_marker_raises(tmp_path):
    p = tmp_path / "doc.md"
    p.write_text("no markers here\n")
    with pytest.raises(ValueError, match="marker"):
        report.splice(p, "x", "new", check=True)
