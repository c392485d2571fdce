"""Runtime plan metrics: what a query ACTUALLY shuffled, spilled, and
scanned — read from the executed physical plan's SQLMetrics after an
action, as numbers instead of eyeballs.

`plans.audit` answers the static question ("does the plan contain a
Cartesian product? how many Exchanges?"); this module answers the dynamic
one ("how many bytes crossed those Exchanges? did anything spill? what was
peak per-task memory?"). Together they are the 'measure, don't guess'
half of the scale story: a join can look broadcast-clean in `explain` and
still shuffle 100x its useful output because a filter sat above instead of
below it — only the runtime counters expose that.

Usage:
    df = some_query(spark, sf_dir)
    rows = df.collect()                # any action on the SAME DataFrame
    m = runtime_metrics(df)            # walks df's executed plan
    print(m.shuffle_bytes_written, m.spill_bytes, m.peak_task_memory)

The walk handles AQE (`AdaptiveSparkPlan` -> `.executedPlan()`, QueryStage
nodes -> `.plan()`) and dedupes reused exchanges/stages by plan-node id so
a ReusedExchange never double-counts its producer's bytes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class NodeMetrics:
    name: str
    metrics: dict[str, int]


@dataclass
class RuntimeMetrics:
    """Aggregated counters over one executed physical plan."""

    shuffle_bytes_written: int = 0   # sum over Exchange nodes
    shuffle_records_written: int = 0
    broadcast_bytes: int = 0         # sum of BroadcastExchange dataSize
    spill_bytes: int = 0             # any '*spill*' metric, plan-wide
    peak_task_memory: int = 0        # max peakMemory over all nodes
    scan_output_rows: int = 0        # rows leaving leaf scan nodes
    output_rows: int = 0             # rows leaving the root node
    nodes: list[NodeMetrics] = field(default_factory=list)

    def row(self) -> dict[str, float]:
        """Compact dict for tables/JSON (bytes in MiB, 2 dp)."""
        mib = 1024 * 1024
        return {
            "shuffle_MiB": round(self.shuffle_bytes_written / mib, 2),
            "broadcast_MiB": round(self.broadcast_bytes / mib, 2),
            "spill_MiB": round(self.spill_bytes / mib, 2),
            "peak_task_MiB": round(self.peak_task_memory / mib, 2),
            "scan_rows": self.scan_output_rows,
            "out_rows": self.output_rows,
        }


def _node_metric_values(node) -> dict[str, int]:
    vals: dict[str, int] = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        try:
            vals[kv._1()] = kv._2().value()
        except Exception:  # metric never set on a skipped node
            pass
    return vals


def runtime_metrics(df: DataFrame) -> RuntimeMetrics:
    """Aggregate SQLMetrics from ``df``'s executed plan.

    The caller must have run an action on this exact DataFrame first
    (``collect()``/``toPandas()`` — they execute the DataFrame's own
    QueryExecution, which is where the metric accumulators live; a
    ``df.write`` creates a *different* execution and leaves these zero).
    """
    out = RuntimeMetrics()
    seen: set[int] = set()
    root = df._jdf.queryExecution().executedPlan()

    def walk(node, is_root: bool) -> None:
        node_id = node.id()
        if node_id in seen:  # reused exchange/stage: count bytes once
            return
        seen.add(node_id)
        name = node.nodeName()
        vals = _node_metric_values(node)
        if any(vals.values()):
            out.nodes.append(NodeMetrics(name, {
                k: v for k, v in vals.items() if v not in (0, -1)}))
        rows = vals.get("numOutputRows", 0)
        if is_root and rows:
            out.output_rows = rows
        if name == "Exchange":
            out.shuffle_bytes_written += max(
                vals.get("shuffleBytesWritten", 0), 0)
            out.shuffle_records_written += max(
                vals.get("shuffleRecordsWritten", 0), 0)
        elif name == "BroadcastExchange":
            out.broadcast_bytes += max(vals.get("dataSize", 0), 0)
        for key, v in vals.items():
            if "spill" in key.lower() and "time" not in key.lower() and v > 0:
                out.spill_bytes += v
        out.peak_task_memory = max(out.peak_task_memory,
                                   vals.get("peakMemory", 0))
        if name.startswith("Scan") or name == "Range" or "FileScan" in name:
            out.scan_output_rows += max(rows, 0)

        children = node.children()
        n = children.size()
        descended = False
        for i in range(n):
            walk(children.apply(i), False)
            descended = True
        # AQE wrappers keep their real subtree off children():
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), is_root and not descended)
        elif "QueryStage" in name:
            walk(node.plan(), is_root)

    walk(root, True)
    if not out.output_rows:  # root was a wrapper chain; take first real rows
        for nm in out.nodes:
            if nm.metrics.get("numOutputRows"):
                out.output_rows = nm.metrics["numOutputRows"]
                break
    return out
