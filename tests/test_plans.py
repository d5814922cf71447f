"""Physical-plan quality gates: catch regressions that stay correct but stop
scaling (lost pushdown, lost broadcast, lost column pruning, Python in the
hot path). The 100 TB story depends on these staying true."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

import dsq_spark.queries as Q


def n_nodes(plan: str, op: str) -> int:
    """Count physical-plan nodes of a type; explain('formatted') prints each
    node twice (tree + detail section), so count unique '(N) Op' headers."""
    return len(set(re.findall(r"\((\d+)\) " + op, plan)))


def plan_of(spark, sf_dir, name: str) -> str:
    df = Q.REGISTRY[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    # date predicate reaches the parquet scan
    assert "LessThanOrEqual(l_shipdate" in plan
    # column pruning: l_orderkey/l_partkey/l_suppkey not read
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema
    # partial + final aggregation split
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed to scan


def test_no_python_udfs_in_relational_suite(spark, sf_dir):
    """Every reference-parity operator must stay JVM-side (SURVEY §3: no
    Python in the hot path). mapInPandas appears only in multimodal ops."""
    for name in ("q1_pricing_summary", "q5_local_supplier_volume", "agg_stats",
                 "window_topn_per_group", "dedup_minhash_lsh", "text_token_stats",
                 "sim_topk_bruteforce"):
        plan = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_multimodal_prunes_binary_column(spark, sf_dir):
    """Metadata aggregation must not drag the media payload further than
    the decode stage: plan contains exactly one Python stage."""
    plan = plan_of(spark, sf_dir, "mm_image_meta")
    assert n_nodes(plan, "MapInPandas") == 1


def test_topk_is_single_shuffle_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_topn_per_group")
    # ranking windows shuffle once on the partition key; the filter on rn
    # must not add extra exchanges (broadcast exchange for the dim is ok)
    assert n_nodes(plan, "Exchange") <= 2
