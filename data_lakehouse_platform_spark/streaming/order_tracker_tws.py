"""Stateful order-completion tracking on the transformWithState API
(Spark 4.x `transformWithStateInPandas`) — the modern twin of
order_tracker.py's applyInPandasWithState implementation.

Same semantics as the reference's Redis + two-consumer correlation
(orders_consumer.py:44-77): items accumulate per order until the
distinct-product count reaches ``num_products`` (emit 'complete',
clear state); a processing-time TIMER emits 'timeout' for orders that
never complete (the Redis TTL analog).

Why keep both implementations: applyInPandasWithState is the widely
deployed API; transformWithState is its successor with explicit
typed state handles (value/list/map), per-key timers, state TTL, and
initial-state bootstrap — on a 1000-executor cluster both shard the
state store by key, but transformWithState lets this tracker hold the
product set as LIST state (append-only RocksDB writes per item)
instead of rewriting one blob value per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from data_lakehouse_platform_spark.streaming.order_tracker import (
    OUTPUT_SCHEMA,
)

_DEFAULT_TIMEOUT_MS = 120_000  # the reference's Redis TTL


class OrderCompletionProcessor(StatefulProcessor):
    """Per-order state: LIST of seen product_ids + a VALUE with
    (num_products, customer_id); one processing-time timer per order
    plays the Redis TTL."""

    def __init__(self, timeout_ms: int = _DEFAULT_TIMEOUT_MS):
        self._timeout_ms = timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._products = handle.getListState("products", "product_id string")
        self._meta = handle.getValueState(
            "meta", "num_products int, customer_id long"
        )

    def _emit(self, order_id, products, customer_id, status) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "order_id": [order_id],
                "customer_id": [customer_id],
                "n_products": [len(products)],
                "product_ids": [sorted(products)],
                "status": [status],
            }
        )

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (order_id,) = key
        seen = [t[0] for t in self._products.get()]
        num_products, customer_id = (
            self._meta.get() if self._meta.exists() else (None, None)
        )

        fresh = []
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                if row.product_id not in seen and row.product_id not in fresh:
                    fresh.append(row.product_id)
                if row.num_products is not None:
                    num_products = int(row.num_products)
                if row.customer_id is not None:
                    customer_id = int(row.customer_id)

        all_products = seen + fresh
        if num_products is not None and len(all_products) >= num_products:
            self._products.clear()
            self._meta.clear()
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            yield self._emit(order_id, all_products, customer_id, "complete")
            return

        if fresh:
            self._products.appendList([(p,) for p in fresh])
        self._meta.update((num_products, customer_id))
        # (Re)arm the TTL timer relative to current processing time.
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timerValues.getCurrentProcessingTimeInMs() + self._timeout_ms
        )

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (order_id,) = key
        seen = [t[0] for t in self._products.get()]
        _, customer_id = self._meta.get() if self._meta.exists() else (None, None)
        self._products.clear()
        self._meta.clear()
        yield self._emit(order_id, seen, customer_id, "timeout")

    def close(self) -> None:
        pass


def track_order_completion_tws(
    items: DataFrame, timeout_ms: int = _DEFAULT_TIMEOUT_MS
) -> DataFrame:
    """items: streaming DataFrame with order_tracker.ITEM_SCHEMA
    columns. Returns the same completed/timed-out order stream as
    track_order_completion, built on transformWithStateInPandas."""
    return items.groupBy("order_id").transformWithStateInPandas(
        statefulProcessor=OrderCompletionProcessor(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
    )
