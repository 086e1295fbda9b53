"""Executed-plan scan metrics — the honest probe for partition pruning.

Plan TEXT cannot certify pruning: a formatted explain shows the
dynamic-partition-pruning subquery Catalyst inserted, but Spark's
reuse/cost machinery may degrade it to ``dynamicpruningexpression(true)``
at physical planning (observed for window-shaped broadcast build sides
— the r18 finding that moved every pruning gate in this repo from plan
text to executed metrics), and ``DataFrame.inputFiles()`` lists the
relation's entire FileIndex regardless of pruning. The only signal that
reflects what a run actually opened is the executed plan's per-scan SQL
metrics (``numPartitions``, ``numFiles``), which this module extracts.

Promoted from tests/test_plans.py into the package (r19) so the
``static_prune="auto"`` serving-path decision rule
(`similarity._auto_pruned`) and the pytest gates share one walker —
the operator deciding "did DPP actually prune?" must measure exactly
what the tests gate on.
"""

from __future__ import annotations


def executed_scan_metrics(df) -> list[dict]:
    """Execute the DataFrame and return each parquet scan's SQL metrics
    (numFiles, numPartitions, ...) from the EXECUTED plan. AQE wraps
    stages in QueryStageExec nodes, so the walk unwraps those via
    ``.plan()`` (and the root AdaptiveSparkPlan via ``.executedPlan()``).

    Cost: one full execution of ``df`` (results are not returned — the
    caller wants the metrics, not the rows). Scans that are not
    partitioned simply carry no ``numPartitions`` key; callers filter.
    """
    df.collect()

    scans = []

    def walk(node):
        name = node.nodeName()
        if "QueryStage" in name:
            walk(node.plan())
            return
        if name.startswith("AdaptiveSparkPlan"):
            walk(node.executedPlan())
            return
        if name.startswith("Scan"):
            scans.append(node)
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    out = []
    for s in scans:
        metrics = s.metrics()
        keys = metrics.keysIterator()
        d = {}
        while keys.hasNext():
            k = keys.next()
            d[k] = metrics.apply(k).value()
        out.append(d)
    return out


def partitioned_scans_within(df, max_partitions: int) -> bool:
    """True when every PARTITIONED scan in ``df``'s executed plan
    opened at most ``max_partitions`` partitions — the pruning
    acceptance predicate (executes ``df`` once; see
    `executed_scan_metrics`). A plan with no partitioned scan at all
    returns False: the caller asked whether pruning happened on a
    layout it believes is partitioned, and "nothing partitioned found"
    means the premise is wrong, which must not read as success."""
    counts = [
        s["numPartitions"]
        for s in executed_scan_metrics(df)
        if "numPartitions" in s
    ]
    return bool(counts) and max(counts) <= max_partitions
