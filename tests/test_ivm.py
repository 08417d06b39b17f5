"""Incremental view maintenance over the snapshot table's change data
feed: applying CDF deltas to a grouped-aggregate view must be
bit-identical to a full rebuild at the target version — including
updates, inserts, deletes, group births, and group deaths."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_platform_spark.operators.ivm import (
    agg_state,
    apply_delta,
    changes_to_delta,
)
from data_lakehouse_platform_spark.sources.table_format import SnapshotTable

_SCHEMA = "k bigint, grp string, amount double"

_V0 = [
    (1, "a", 10.25),
    (2, "a", 5.50),
    (3, "b", 7.00),
    (4, "b", 1.75),
    (5, "c", 100.00),  # group c dies in v1
]

_V1 = [
    (1, "a", 10.25),   # unchanged
    (2, "a", 9.99),    # updated amount
    (3, "b", 7.00),    # unchanged
    # 4 deleted
    (6, "b", 2.25),    # inserted
    (7, "d", 50.00),   # group d born
]


def _canon(df):
    return sorted(
        tuple(r) for r in df.select("grp", "n", "amount_fp").collect()
    )


def test_cdf_delta_apply_equals_full_rebuild(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    v0 = tbl.write_snapshot(spark.createDataFrame(_V0, _SCHEMA))
    v1 = tbl.write_snapshot(spark.createDataFrame(_V1, _SCHEMA))

    measures = {"amount": "amount"}
    view = agg_state(tbl.read(spark, v0), ["grp"], measures)

    cdf = tbl.changes(spark, ["k"], v0, v1)
    delta = changes_to_delta(cdf, ["grp"], measures)
    maintained = apply_delta(view, delta, ["grp"], ["amount"])

    rebuilt = agg_state(tbl.read(spark, v1), ["grp"], measures)
    assert _canon(maintained) == _canon(rebuilt)
    # group c (all rows deleted) is gone; group d (born) is present
    grps = {r.grp for r in maintained.collect()}
    assert "c" not in grps and "d" in grps


def test_delta_chain_across_many_versions(spark, tmp_path):
    """Maintaining the view through a chain of versions — apply each
    version's delta in turn — still matches the final full rebuild."""
    tbl = SnapshotTable(str(tmp_path / "chain"))
    rows = {k: ("g" + str(k % 3), float(k)) for k in range(1, 21)}

    def snap():
        return tbl.write_snapshot(
            spark.createDataFrame(
                [(k, g, a) for k, (g, a) in sorted(rows.items())], _SCHEMA
            )
        )

    versions = [snap()]
    # v1: update a third of the keys
    for k in range(1, 21, 3):
        g, a = rows[k]
        rows[k] = (g, a + 0.125)
    versions.append(snap())
    # v2: delete evens, insert a new block in a fresh group
    for k in list(rows):
        if k % 2 == 0:
            del rows[k]
    for k in range(100, 105):
        rows[k] = ("g_new", float(k) / 8)
    versions.append(snap())

    measures = {"amount": "amount"}
    view = agg_state(tbl.read(spark, versions[0]), ["grp"], measures)
    for frm, to in zip(versions, versions[1:]):
        cdf = tbl.changes(spark, ["k"], frm, to)
        view = apply_delta(
            view, changes_to_delta(cdf, ["grp"], measures), ["grp"], ["amount"]
        )

    rebuilt = agg_state(tbl.read(spark, versions[-1]), ["grp"], measures)
    assert _canon(view) == _canon(rebuilt)


def test_unchanged_groups_survive_and_zero_delta_noop(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "noop"))
    v0 = tbl.write_snapshot(spark.createDataFrame(_V0, _SCHEMA))
    v1 = tbl.write_snapshot(spark.createDataFrame(_V0, _SCHEMA))  # no change

    measures = {"amount": "amount"}
    view = agg_state(tbl.read(spark, v0), ["grp"], measures)
    cdf = tbl.changes(spark, ["k"], v0, v1)
    assert cdf.count() == 0  # fingerprint diff: nothing changed
    maintained = apply_delta(
        view, changes_to_delta(cdf, ["grp"], measures), ["grp"], ["amount"]
    )
    assert _canon(maintained) == _canon(view)


# ---------------------------------------------------------------------------
# Property: for ANY random chain of inserts/updates/deletes, maintaining
# the view by CDF deltas equals the full rebuild at the final version.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# one edit: (key 0..9, group 0..2, amount-units, op) where op deletes
# when the key exists and amount is odd, else upserts
_edit = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=400),
)
_chain = st.lists(
    st.lists(_edit, min_size=1, max_size=6), min_size=1, max_size=4
)


@given(_chain)
@settings(**_SETTINGS)
def test_ivm_property_random_chains(spark, tmp_path_factory, chain):
    tbl = SnapshotTable(str(tmp_path_factory.mktemp("ivmprop")))
    state: dict[int, tuple[str, float]] = {
        k: ("g0", float(k)) for k in range(3)
    }

    def snap():
        rows = [(k, g, a) for k, (g, a) in sorted(state.items())]
        if not rows:
            rows = [(-1, "g_sentinel", 0.0)]  # keep snapshots non-empty
        return tbl.write_snapshot(spark.createDataFrame(rows, _SCHEMA))

    versions = [snap()]
    for batch in chain:
        for k, g, a in batch:
            if k in state and a % 2 == 1:
                del state[k]
            else:
                state[k] = (f"g{g}", a / 8)
        versions.append(snap())

    measures = {"amount": "amount"}
    view = agg_state(tbl.read(spark, versions[0]), ["grp"], measures)
    for frm, to in zip(versions, versions[1:]):
        cdf = tbl.changes(spark, ["k"], frm, to)
        view = apply_delta(
            view, changes_to_delta(cdf, ["grp"], measures), ["grp"], ["amount"]
        )
    rebuilt = agg_state(tbl.read(spark, versions[-1]), ["grp"], measures)
    assert _canon(view) == _canon(rebuilt)
