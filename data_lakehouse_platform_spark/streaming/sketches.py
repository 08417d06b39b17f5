"""Streaming sketches: HLL uniques and Misra-Gries heavy hitters on
unbounded streams.

The ingest tier of a training-data pipeline needs cardinality and
frequency answers CONTINUOUSLY — "how many distinct users so far",
"which tokens are flooding the crawl" — and at 100 TB/day the exact
answers (streaming COUNT DISTINCT, a full token count table) are
precisely the states that grow without bound and OOM the state store.
Both operators here keep state bounded by sketch capacity:

* HLL: the register table IS a streaming MAX aggregation —
  ``groupBy(group, reg).agg(max(rho))`` over the shared map-side
  projection (operators/sketches.hll_rho_projection). Spark's agg
  state is exactly ``|groups| x 64`` rows forever, the sketch merges
  register-wise by construction, and a batch job over the same rows
  produces bit-identical registers (tested), so stream and backfill
  agree exactly.
* Misra-Gries: per-shard capacity-bounded counter state in
  ``applyInPandasWithState`` — the streaming twin of
  operators/heavy_hitters.py, with the same mergeable-summaries
  reduction and the same guarantee (every item with share >
  1/(capacity+1) of the shard's stream survives in state).

Reference analog: the reference's consumers count per-customer order
events in Redis with TTLs (orders_consumer.py) — unbounded keys, the
shape that falls over first; these are the bounded-state versions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_lakehouse_platform_spark.operators.sketches import hll_rho_projection


def hll_register_stream(
    events: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Streaming HLL register table: ``(group_col, reg, m)``, complete/
    update mode.

    Declarative on purpose: the sketch state is Spark's own aggregation
    state (bounded at ``|groups| x 64`` rows), checkpointed and
    exactly-once like any streaming agg — no custom state code to get
    wrong. Downstream, ``operators.sketches.hll_estimate`` turns any
    snapshot of this table into estimates; registers from this stream
    and from a batch backfill merge with a plain ``MAX`` because both
    sides share the identical hash/rho projection.
    """
    return (
        hll_rho_projection(events, [group_col], value_col)
        .groupBy(group_col, "reg")
        .agg(F.max("__rho").alias("m"))
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters
# ---------------------------------------------------------------------------

MG_INPUT_SCHEMA = "shard int, item string"
MG_OUTPUT_SCHEMA = "shard int, item string, weight long, batch_seq long"
MG_STATE_SCHEMA = "items array<string>, weights array<long>, batch_seq long"


def _mg_update(capacity: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return

        if state.exists:
            items, weights, batch_seq = state.get
            run = dict(zip(items, weights))
        else:
            run, batch_seq = {}, 0

        for pdf in pdfs:
            for item in pdf["item"]:
                run[item] = run.get(item, 0) + 1
                if len(run) > capacity:
                    # Mergeable-summaries reduction (same as the batch
                    # kernel): subtract the (c+1)-th largest counter,
                    # drop non-positive — ≤ capacity survivors.
                    d = sorted(run.values())[-(capacity + 1)]
                    run = {k: v - d for k, v in run.items() if v > d}

        batch_seq += 1
        state.update((list(run.keys()), list(run.values()), batch_seq))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(run),
                "item": list(run.keys()),
                "weight": list(run.values()),
                "batch_seq": [batch_seq] * len(run),
            }
        )

    return update


def heavy_hitter_stream(
    items: DataFrame,
    item_col: str,
    *,
    capacity: int = 64,
    shards: int = 4,
) -> DataFrame:
    """Streaming Misra-Gries summary per shard, update mode.

    Items hash into ``shards`` state partitions; each keeps at most
    ``capacity`` counters in the state store NO MATTER how large the
    vocabulary grows — the property that makes this safe where a
    streaming ``groupBy(item).count()`` accumulates a counter per
    distinct item forever. Every batch re-emits the shard's current
    summary stamped with ``batch_seq``; consumers take the latest
    emission per shard. Guarantee (same proof as the batch kernel):
    any item with more than ``stream_len/(capacity+1)`` occurrences
    within its shard is present in the final summary.
    """
    sharded = items.select(
        F.pmod(F.hash(F.col(item_col)), F.lit(shards)).cast("int").alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_update(capacity),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
