"""Stateful order-completion tracking (applyInPandasWithState).

Re-expresses the reference's Redis + two-consumer correlation
(orders_consumer.py / order_details_consumer.py): items for an order
arrive one by one; when the distinct-product count reaches the
expected ``num_products`` the order is emitted as complete — the
analog of publishing to 'order_ready_for_checking'
(orders_consumer.py:44-56). A processing-time timeout plays the role
of the Redis TTL (expire 120s, orders_consumer.py:77): orders that
never complete are flushed as 'timeout'.

Why this shape scales: state lives in Spark's state store partitioned
by order_id — no external Redis round-trip per message, no
multiprocessing worker pools (the reference runs 2-3 python processes
per consumer); 1000 executors each own a shard of the keyspace.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# input rows: one per ordered item
ITEM_SCHEMA = "order_id string, product_id string, num_products int, customer_id long"

OUTPUT_SCHEMA = (
    "order_id string, customer_id long, n_products int, "
    "product_ids array<string>, status string"
)
STATE_SCHEMA = "product_ids array<string>, num_products int, customer_id long"

_DEFAULT_TIMEOUT_MS = 120_000  # the reference's Redis TTL


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (order_id,) = key

    if state.hasTimedOut:
        product_ids, num_products, customer_id = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "order_id": [order_id],
                "customer_id": [customer_id],
                "n_products": [len(product_ids)],
                "product_ids": [list(product_ids)],
                "status": ["timeout"],
            }
        )
        return

    if state.exists:
        product_ids, num_products, customer_id = state.get
        product_ids = list(product_ids)
    else:
        product_ids, num_products, customer_id = [], None, None

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            if row.product_id not in product_ids:
                product_ids.append(row.product_id)
            # Arrow hands null ints to pandas as float NaN — `is not
            # None` passes for NaN and int(NaN) would crash the task
            # permanently (every replay re-fails); guard with notna.
            if pd.notna(row.num_products):
                num_products = int(row.num_products)
            if pd.notna(row.customer_id):
                customer_id = int(row.customer_id)

    if num_products is not None and len(product_ids) >= num_products:
        state.remove()  # order complete → emit and clear (reference: delete keys)
        yield pd.DataFrame(
            {
                "order_id": [order_id],
                "customer_id": [customer_id],
                "n_products": [len(product_ids)],
                "product_ids": [sorted(product_ids)],
                "status": ["complete"],
            }
        )
    else:
        state.update((product_ids, num_products, customer_id))
        state.setTimeoutDuration(_DEFAULT_TIMEOUT_MS)


def track_order_completion(items: DataFrame) -> DataFrame:
    """items: streaming DataFrame with ITEM_SCHEMA columns. Returns a
    stream of completed (or timed-out) orders."""
    return items.groupBy("order_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
