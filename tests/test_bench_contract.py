"""Bench-harness contract tests (r10 VERDICT #10).

The honest-bench protocol is frozen: no base-table cache env, clearCache
before every timed attempt, and ONE parseable JSON line on stdout.  These
tests pin the contract so a future round cannot silently regress it.
"""

from __future__ import annotations

import io
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bench_source_never_sets_cache_tables():
    """bench.py must not re-enable the r3-r9 base-table cache gaming."""
    src = open(os.path.join(REPO, "bench.py")).read()
    # the knob may be MENTIONED in comments/history but never assigned in code
    for line in src.splitlines():
        code = line.split("#", 1)[0]
        assert "SPARK_GRAFT_CACHE_TABLES" not in code, line
    # clearCache-per-attempt stays in place
    assert "clearCache" in src


def test_bench_emits_one_parseable_json_line(spark, sf_dir, monkeypatch):
    """Run bench.py's main() over a 2-query registry slice and check the
    driver contract: one JSON line with metric/value/unit/queries/sf."""
    import bench
    import dsq_spark.queries as Q

    assert os.environ.get("SPARK_GRAFT_CACHE_TABLES") is None

    keep = {n: Q.REGISTRY[n] for n in ("baseline_groupby", "limit_offset")}
    monkeypatch.setattr(Q, "REGISTRY", keep)
    monkeypatch.setattr(bench, "SF_DIR", sf_dir)

    out_path = "/tmp/test_bench_contract_out.json"
    monkeypatch.setattr(bench, "BENCH_OUT", out_path)

    # capture the REAL stdout fd that bench writes its final line to
    r, w = os.pipe()
    saved = os.dup(1)
    os.dup2(w, 1)
    try:
        bench.main()
    finally:
        os.dup2(saved, 1)
        os.close(saved)
        os.close(w)
    line = os.fdopen(r).read()

    d = json.loads(line)
    assert d["unit"] == "sec"
    assert set(d["queries"]) == set(keep)
    assert d["value"] == pytest.approx(sum(d["queries"].values()), abs=0.01)
    assert json.loads(open(out_path).read()) == d
    # bench must not have exported the cache knob as a side effect
    assert os.environ.get("SPARK_GRAFT_CACHE_TABLES") is None
