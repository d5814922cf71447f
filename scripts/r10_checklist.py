"""Emit the OPTIMIZATION_r10.md per-query checklist table: every registered
query with its baseline (inherited tree, no cache) and after-round bench
seconds.  Usage:

    python scripts/r10_checklist.py BASELINE.json AFTER.json
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOUCHED = {
    "dialect_groups_frame": "frames typed-zero + hoist passes (Hotspot #1)",
    "dialect_exclude_frames": "frames typed-zero literals (23.8 KB → 2.0 KB emission)",
    "dialect_windowed_aggregates": "per-row chain hoisting",
    "dialect_scalar_minmax": "rebalance/spread=True (5-way render chains per row; 2.8 → 0.7 s)",
    "date_modifier_functions": "rebalance (single-task scan → all cores)",
    "julianday_functions": "rebalance",
    "strftime_code_coverage": "rebalance",
    "unpivot_charge_components": "aggregate-then-melt (Expand over 9 rows, not 6M)",
    "text_contamination_check": "one-pass left-broadcast join (was 2 aggs + join)",
    "text_dup_ngram_fraction": "xxhash64 gram keys; one left join + one doc agg",
    "text_remove_dup_spans": "xxhash64 gram keys for both gram exchanges",
    "sim_kmeans_refine": "Lloyd driver round-trip + map-side assign (4.30 -> 1.76)",
    "sim_ivf_kmeans_topk": "Lloyd driver round-trip + map-side assign (4.02 -> 1.61)",
    "sim_ivf_kmeans_recall": "Lloyd driver round-trip + map-side assign (3.41 -> 2.22)",
    "dedup_semantic": "Lloyd driver round-trip + map-side assign (3.34 -> 2.48)",
    "dedup_minhash_lsh": "sizes ride minhash agg; mh+cand persisted; semi-join prune (4.3 → 1.8 s)",
    "dedup_incremental_lsh": "same; semi-join prune bounds old-corpus verify exchange at scale",
    "sim_ivfpq_topk": "coarse cents + residual codebook driver round-trip; encode/LUT pure maps (4.60 -> 2.69)",
    "sim_ivf_incremental": "frozen centroids driver round-trip; index+batch assign map-side (2.72 -> 1.55)",
    "sim_pq_topk": "codebook driver round-trip; encode/LUT pure maps (2.58 -> 2.06)",
    "sim_pq_recall": "same literal-codebook _pq_parts (not benched)",
    "streaming_window_counts": "replay pruned to 4 cols + repartition(4): real 2-trigger replay (4.2 → 3.1 s)",
    "agg_approx_quantile": "rebalance tried + REVERTED (exchange > win; sort-agg shuffles anyway)",
    "q9_product_profit": "rebalance tried + REVERTED (broadcast probes cheaper than exchange)",
    "q10_returned_items": "rebalance filtered lineitem probe side (KEPT: 1.14 → 0.92)",
    "q21_sole_returner": "rebalance tried + REVERTED (distinct digest shuffles on l_orderkey anyway)",
}
REBALANCED_DIALECT = ("examined; rebalance tried + REVERTED (exchange cost > per-row win; "
                      "spread= stays opt-in)")


def main():
    base = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    import dsq_spark.queries as Q

    rows = []
    for name in sorted(Q.REGISTRY):
        if not Q.REGISTRY[name].bench:
            note = TOUCHED.get(name, "correctness-only (not benched)")
            rows.append((name, None, None, note))
            continue
        b, a = base.get(name), after.get(name)
        note = TOUCHED.get(name)
        if note is None and name.startswith("dialect_"):
            note = REBALANCED_DIALECT
        if note is None:
            note = "examined; left alone (see prose)"
        rows.append((name, b, a, note))
    print("| query | baseline s | after s | change |")
    print("|---|---|---|---|")
    for name, b, a, note in rows:
        bs = f"{b:.2f}" if b is not None else "—"
        as_ = f"{a:.2f}" if a is not None else "—"
        print(f"| {name} | {bs} | {as_} | {note} |")
    tb = sum(v for _, v, _, _ in rows if v is not None)
    ta = sum(v for _, _, v, _ in rows if v is not None)
    print(f"\ntotals: baseline {tb:.1f} s, after {ta:.1f} s")


if __name__ == "__main__":
    main()
