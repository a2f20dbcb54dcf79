"""Physical-plan audits: the queries must not just be correct — they
must compile to the plan shape that survives 100× scale. Each assertion
pins the property that makes the query scale-safe (broadcast instead of
shuffle, single Expand instead of N scans, pushdown reaching the scan).
Plan text is version-sensitive, so assertions target operator names, not
full plan strings."""

from __future__ import annotations

from mknssh_11_bigdata_spark.queries import QUERIES

from conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = QUERIES[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_band_join_is_broadcast_nested_loop(spark):
    """Tiny interval dim must broadcast — a shuffle or cartesian here
    would be catastrophic at scale."""
    plan = _plan(spark, "part_price_band_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_grouping_sets_single_expand_no_union(spark):
    """GROUPING SETS compiles to ONE Expand over one scan — not a UNION
    of per-marginal scans (which would read the fact table twice)."""
    plan = _plan(spark, "nation_priority_grouping_sets")
    assert plan.count("Expand") >= 1
    assert "Union" not in plan


def test_cube_single_expand_no_union(spark):
    plan = _plan(spark, "segment_priority_cube")
    assert "Expand" in plan and "Union" not in plan


def test_pricing_summary_pushdown_and_pruning(spark):
    """The scan-heavy aggregation must push its date filter into the
    parquet scan and prune to the referenced columns only."""
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned read schema: no l_orderkey/l_partkey in the scan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_salted_agg_two_aggregation_phases(spark):
    """Salted plan = partial-by-(key,salt) then combine-by-key: at least
    two HashAggregate pairs and exactly one exchange keyed on the salt
    phase (plus the final single-key exchange)."""
    plan = _plan(spark, "salted_status_totals")
    assert plan.count("HashAggregate") >= 4  # 2 logical phases x partial/final


def test_top_revenue_orders_take_ordered(spark):
    """orderBy+limit must compile to TakeOrderedAndProject, never a
    global sort of the full aggregate."""
    plan = _plan(spark, "top_revenue_orders")
    assert "TakeOrderedAndProject" in plan


def test_membership_flag_no_bnl_join(spark):
    """The membership-flag query (reference's regex J7 reimplemented)
    must stay an equi-join family plan — broadcast hash or sort-merge —
    never a nested-loop over the id list."""
    plan = _plan(spark, "top_customer_order_flags")
    assert "BroadcastNestedLoopJoin" not in plan


def test_cc_propagation_round_single_shuffle_join(spark):
    """One label-propagation round of connected components compiles to
    exactly ONE join — the tagged-union trick must not reintroduce a
    second join for the old labels, because at scale each extra join is
    a full shuffle of the label table per iteration."""
    from mknssh_11_bigdata_spark.operators.dedup import _propagate_round

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "id long, component long"
    )
    plan = (
        _propagate_round(edges, labels)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = sum(plan.count(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert joins == 1, plan
    aggs = plan.count("HashAggregate")
    # one logical aggregation = partial + final pair (2), nothing more
    assert aggs <= 2, plan


def test_deterministic_split_prunes_text_column(spark):
    """The split assignment is a pure function of doc_id — the scan must
    not read the (huge) text column at 100 TB."""
    import re

    plan = _plan(spark, "doc_deterministic_split")
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, plan
    assert "text" not in m.group(1), m.group(1)
    assert "doc_id" in m.group(1), m.group(1)
