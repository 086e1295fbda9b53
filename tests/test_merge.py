"""Unit tests for MERGE-style upsert and SCD2 versioning
(operators/merge.py) — the catalog keys merge_upsert / scd2_history
cover the oracle equivalence; these pin the operator semantics on
hand-built frames."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_upsert_update_insert_keep(spark):
    from github_event_etl_spark.operators.merge import upsert

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k long, v double"
    )
    changes = spark.createDataFrame(
        [(2, 99.0), (3, 30.0)], "k long, v double"
    )
    got = {r.k: (r.v, r.action) for r in upsert(base, changes, "k").collect()}
    assert got == {
        1: (10.0, "keep"),
        2: (99.0, "update"),
        3: (30.0, "insert"),
    }


def test_upsert_change_row_replaces_wholesale(spark):
    """SCD1 semantics: a matched change row replaces the base row —
    including columns the change carries as null (null is a value, not
    'leave as was')."""
    from github_event_etl_spark.operators.merge import upsert

    base = spark.createDataFrame([(1, "old", 5.0)], "k long, s string, v double")
    changes = spark.createDataFrame(
        [(1, None, 7.0)], "k long, s string, v double"
    )
    row = upsert(base, changes, "k").collect()[0]
    assert (row.k, row.s, row.v, row.action) == (1, None, 7.0, "update")


def test_upsert_rejects_schema_mismatch(spark):
    from github_event_etl_spark.operators.merge import upsert

    base = spark.createDataFrame([(1, 1.0)], "k long, v double")
    changes = spark.createDataFrame([(1, 1.0, "x")], "k long, v double, s string")
    with pytest.raises(ValueError, match="one schema"):
        upsert(base, changes, "k")


def test_scd2_versions_intervals_and_current(spark):
    from github_event_etl_spark.operators.merge import scd2_versions

    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", 1.0),
            (1, 101, "2024-01-02 00:00:00", 2.0),
            (2, 200, "2024-01-05 00:00:00", 9.0),
        ],
        "k long, seq long, ts_s string, v double",
    ).select("k", "seq", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {
        r.seq: r
        for r in scd2_versions(df, key="k", ts_col="ts", seq_col="seq").collect()
    }
    assert out[100].valid_to == out[101].valid_from
    assert not out[100].is_current
    assert out[101].valid_to is None and out[101].is_current
    assert out[200].valid_to is None and out[200].is_current


def test_scd2_same_timestamp_ties_stay_ordered(spark):
    """Two changes at the same instant must both survive as versions,
    ordered by the tie-break sequence (the first gets a zero-length
    interval; the second is current)."""
    from github_event_etl_spark.operators.merge import scd2_versions

    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", 1.0),
            (1, 101, "2024-01-01 00:00:00", 2.0),
        ],
        "k long, seq long, ts_s string, v double",
    ).select("k", "seq", F.to_timestamp("ts_s").alias("ts"), "v")
    out = {
        r.seq: r
        for r in scd2_versions(df, key="k", ts_col="ts", seq_col="seq").collect()
    }
    assert len(out) == 2
    assert out[100].valid_from == out[100].valid_to  # zero-length
    assert not out[100].is_current
    assert out[101].is_current


def test_upsert_null_key_rows_keep_their_side(spark):
    """NULL merge keys never match (SQL null equality): a null-key base
    row is 'keep', a null-key change row is 'insert' — never silently
    relabeled by the key's nullability."""
    from github_event_etl_spark.operators.merge import upsert

    base = spark.createDataFrame([(None, 1.0)], "k long, v double")
    changes = spark.createDataFrame([(None, 2.0)], "k long, v double")
    got = sorted(
        (r.v, r.action) for r in upsert(base, changes, "k").collect()
    )
    assert got == [(1.0, "keep"), (2.0, "insert")]


def test_profile_columns_rejects_empty_selection(spark):
    from github_event_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(df, columns=[])


def test_salted_skew_join_input_validation(spark):
    """n_salts < 1 would NULL every salt (or divide by zero under
    ANSI) and silently empty the join; a reserved-salt-column input
    would be overwritten and dropped — both must fail fast."""
    from github_event_etl_spark.operators.skew import salted_skew_join

    b = spark.createDataFrame([(1, 2.0)], "k long, v double")
    s = spark.createDataFrame([(1, 3.0)], "k long, w double")
    with pytest.raises(ValueError, match="n_salts"):
        salted_skew_join(b, s, "k", n_salts=0)
    bad = b.withColumnRenamed("v", "__salt")
    with pytest.raises(ValueError, match="reserved salt"):
        salted_skew_join(bad, s, "k")


def test_salted_skew_join_tolerates_map_columns(spark):
    """A map payload column on the big side must not break the
    drop-in contract (Spark's hash expressions reject MapType; the
    salt derives from the hashable columns only)."""
    from pyspark.sql import functions as F

    from github_event_etl_spark.operators.skew import salted_skew_join

    b = spark.createDataFrame([(1, 5.0)], "k long, v double").select(
        "k", "v", F.create_map(F.lit("a"), F.lit(1)).alias("payload")
    )
    s = spark.createDataFrame([(1, 9.0)], "k long, w double")
    got = salted_skew_join(b, s, "k", n_salts=4).collect()
    assert len(got) == 1 and got[0].w == 9.0 and got[0].payload == {"a": 1}


def test_upsert_assert_unique_fails_fast_on_duplicate_keys(spark):
    """The opt-in unique-key precondition check: duplicate keys on
    either side would fan out through the full-outer join (where SQL
    MERGE raises on multiple source matches), so assert_unique=True
    must fail fast naming the offending side; unique inputs pass
    through unchanged, and null keys never count as duplicates (they
    never join)."""
    from github_event_etl_spark.operators.merge import upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dup_changes = spark.createDataFrame(
        [(2, "x"), (2, "y")], "k long, v string"
    )
    with pytest.raises(ValueError, match="changes side"):
        upsert(base, dup_changes, key="k", assert_unique=True)
    dup_base = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    ok_changes = spark.createDataFrame([(3, "z")], "k long, v string")
    with pytest.raises(ValueError, match="base side"):
        upsert(dup_base, ok_changes, key="k", assert_unique=True)
    # unique keys (plus harmless duplicate NULL keys) pass
    null_changes = spark.createDataFrame(
        [(3, "z"), (None, "n1"), (None, "n2")], "k long, v string"
    )
    rows = upsert(base, null_changes, key="k", assert_unique=True).collect()
    acts = sorted((r.k, r.action) for r in rows if r.k is not None)
    assert acts == [(1, "keep"), (2, "keep"), (3, "insert")]
    assert sum(1 for r in rows if r.k is None) == 2  # inserts


def test_snapshot_diff_classifies_and_lists_columns(spark):
    """snapshot_diff on hand-built frames: added / removed / changed
    with per-column attribution, unchanged keys emit no row, and null
    transitions count as changes (null-safe comparison both ways)."""
    from github_event_etl_spark.operators.merge import snapshot_diff

    prev = spark.createDataFrame(
        [
            (1, "a", "x"),   # unchanged
            (2, "b", "y"),   # text changes
            (3, "c", None),  # lang null -> value: changed
            (4, "d", "z"),   # removed
            (6, None, "w"),  # text value <- null: changed
        ],
        "k long, text string, lang string",
    )
    cur = spark.createDataFrame(
        [
            (1, "a", "x"),
            (2, "B", "y"),
            (3, "c", "fr"),
            (5, "e", "v"),   # added
            (6, "now", "w"),
        ],
        "k long, text string, lang string",
    )
    got = {
        r.k: (r.change_type, r.changed_cols)
        for r in snapshot_diff(prev, cur, "k", ["text", "lang"]).collect()
    }
    assert got == {
        2: ("changed", ["text"]),
        3: ("changed", ["lang"]),
        4: ("removed", None),
        5: ("added", None),
        6: ("changed", ["text"]),
    }


def test_snapshot_diff_assert_unique_fails_fast(spark):
    """snapshot_diff shares upsert's unique-key precondition; the
    opt-in assert_unique=True check fails fast naming the offending
    snapshot side, and unique inputs diff normally (ADVICE r16)."""
    from github_event_etl_spark.operators.merge import snapshot_diff

    prev = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dup_cur = spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string")
    with pytest.raises(ValueError, match="cur snapshot"):
        snapshot_diff(prev, dup_cur, "k", ["v"], assert_unique=True)
    dup_prev = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    ok_cur = spark.createDataFrame([(3, "z")], "k long, v string")
    with pytest.raises(ValueError, match="prev snapshot"):
        snapshot_diff(dup_prev, ok_cur, "k", ["v"], assert_unique=True)
    rows = snapshot_diff(prev, ok_cur, "k", ["v"], assert_unique=True).collect()
    assert sorted((r.k, r.change_type) for r in rows) == [
        (1, "removed"), (2, "removed"), (3, "added")
    ]


def test_snapshot_diff_multi_column_order(spark):
    """changed_cols preserves compare_cols declaration order when
    several columns move at once (the key's oracle concatenates its
    CASE list in the same order)."""
    from github_event_etl_spark.operators.merge import snapshot_diff

    prev = spark.createDataFrame([(1, "a", "x", "s")],
                                 "k long, t string, l string, s string")
    cur = spark.createDataFrame([(1, "A", "x", "S")],
                                "k long, t string, l string, s string")
    rows = snapshot_diff(prev, cur, "k", ["t", "l", "s"]).collect()
    assert [(r.k, r.change_type, r.changed_cols) for r in rows] == [
        (1, "changed", ["t", "s"])
    ]


# ------------------------------------------------------- reconcile (CDC net)


def test_reconcile_change_log_verdict_algebra(spark):
    """Every cell of the net-verdict table, one key each: single
    verdicts pass through; added→changed nets 'added'; changed→removed
    nets 'removed'; added→removed vanishes; removed→added nets
    'changed'; payload is last-wins; a key absent from the log emits
    nothing."""
    from github_event_etl_spark.operators.merge import reconcile_change_log

    rows = [
        # (key, change_type, text payload, seq)
        (1, "changed", "v2", 1),                      # single changed
        (2, "added", "new", 1),                       # single added
        (3, "removed", None, 1),                      # single removed
        (4, "added", "v1", 1), (4, "changed", "v2", 2),   # → added, v2
        (5, "changed", "v1", 1), (5, "removed", None, 2),  # → removed
        (6, "added", "v1", 1), (6, "removed", None, 2),    # → no row
        (7, "removed", None, 1), (7, "added", "back", 2),  # → changed
        (8, "changed", "a", 1), (8, "changed", "b", 2),
        (8, "changed", "c", 3),                       # → changed, c
    ]
    log = spark.createDataFrame(
        rows, "doc_id long, change_type string, text string, seq int"
    )
    got = {
        r.doc_id: (r.change_type, r.text)
        for r in reconcile_change_log(
            log, "doc_id", "seq", ["text"]
        ).collect()
    }
    assert got == {
        1: ("changed", "v2"),
        2: ("added", "new"),
        3: ("removed", None),
        4: ("added", "v2"),
        5: ("removed", None),
        7: ("changed", "back"),
        8: ("changed", "c"),
    }
    assert 6 not in got


def test_reconcile_change_log_assert_order_guards(spark):
    """The opt-in precondition guard: (key, order) ties and null
    orders/keys fail fast instead of producing a nondeterministic or
    silently-vanishing verdict; a clean log passes with the guard on."""
    import pytest

    from github_event_etl_spark.operators.merge import reconcile_change_log

    schema = "doc_id long, change_type string, text string, seq int"
    clean = spark.createDataFrame(
        [(1, "changed", "v1", 1), (1, "removed", None, 2)], schema
    )
    got = reconcile_change_log(
        clean, "doc_id", "seq", ["text"], assert_order=True
    ).collect()
    assert [(r.doc_id, r.change_type) for r in got] == [(1, "removed")]

    tied = spark.createDataFrame(
        [(1, "changed", "v1", 7), (1, "removed", None, 7)], schema
    )
    with pytest.raises(ValueError, match="not unique"):
        reconcile_change_log(tied, "doc_id", "seq", ["text"],
                             assert_order=True)

    null_order = spark.createDataFrame(
        [(1, "changed", "v1", None)], schema
    )
    with pytest.raises(ValueError, match="null"):
        reconcile_change_log(null_order, "doc_id", "seq", ["text"],
                             assert_order=True)
    # unguarded, the null-order key would silently vanish — the
    # documented hazard the guard exists for
    assert reconcile_change_log(
        null_order, "doc_id", "seq", ["text"]
    ).count() == 0


def test_upsert_and_scd2_column_collision_guards(spark):
    """Name-collision hardening: a data column literally named
    'present' must not break the presence markers; a colliding
    action_col and pre-existing SCD2 validity columns fail fast
    instead of emitting duplicate column names."""
    import pytest

    from github_event_etl_spark.operators.merge import (
        scd2_versions,
        upsert,
    )

    schema = "k long, present string"
    base = spark.createDataFrame([(1, "old"), (2, "keep")], schema)
    changes = spark.createDataFrame([(1, "new"), (3, "ins")], schema)
    got = {
        r.k: (r.present, r.action)
        for r in upsert(base, changes, "k").collect()
    }
    assert got == {
        1: ("new", "update"), 2: ("keep", "keep"), 3: ("ins", "insert"),
    }

    with pytest.raises(ValueError, match="action_col"):
        upsert(base, changes, "k", action_col="present")

    versioned = scd2_versions(
        spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b")], "k long, ts long, v string"
        ),
        "k",
    )
    with pytest.raises(ValueError, match="valid_from"):
        scd2_versions(versioned, "k")
