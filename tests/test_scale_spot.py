"""Spot oracle checks at the BENCH scale factor (sf0.1).

The driver's correctness gate runs at sf0.01 and the bench at sf0.1 —
these spot checks close that gap for one representative key per major
family (agg, window, join, dedup, time-series), asserting the same
strict row/schema/value-hash comparison holds at the scale the
performance numbers are quoted at. A handful of representative keys
(len(_SPOT_KEYS), grown round over round), not the full registry: the
full matrix belongs to the sf0.01 gate; this is a scale-regression
tripwire
(e.g. an overflow, a skew-triggered plan change, or a float
re-association that only appears with more data/partitions).
"""

from __future__ import annotations

import os

import pytest

from github_event_etl_spark.plans.catalog import all_specs

from .oracle_harness import compare_query, duckdb_connection

SF_BENCH = "/root/testdata/sf0.1"

_SPOT_KEYS = [
    "agg_multi",             # decimal-exact multi-aggregate (B4)
    "window_running_sum",    # window frame over the full corpus (B5)
    "join_inner_equi",       # shuffle join (B3)
    "dedup_event_id",        # A9 dedup
    "gapfill_locf_reading",  # densify + locf over the shared cache (B5b)
    "agg_quantile_clip",     # discrete-percentile clamp: bound picks are
                             # rank-position-sensitive, so more data is a
                             # real second regime for them
    "llm_dedup_incremental_minhash",  # r13: planted groups grow to ~250
                             # members at sf0.1 (vs ~15 at the driver SF)
                             # — the band-bucket candidate volume and the
                             # per-side cap windows see a genuinely
                             # different regime
    "llm_split_leakage_safe",  # r13: component chains grow linearly with
                             # SF (~143-edge paths at sf0.1), exercising
                             # more star rounds than the driver SF does
    "llm_dedup_incremental_semantic",  # r14: 10k-vector planted corpus
                             # at sf0.1 (vs 1k at the driver SF) — RHP
                             # bucket occupancy and the all-pairs oracle
                             # both see a genuinely denser regime
    "llm_incremental_e2e_report",  # r16: the planted cross-stage
                             # fixture's %53 classes grow to ~94
                             # members at sf0.1 (vs ~10 at the driver
                             # SF) and docs 2000-4999 have NO embedding
                             # row — the missing-vector fall-through
                             # only exists at this SF
    "llm_corpus_snapshot_diff",  # r16: ~10x the change volume, and
                             # the %19/%23/%17 class overlaps (CRT
                             # collisions) first appear above 500 ids
    "llm_embed_random_projection",  # r16: 2k planted pairs through the
                             # Arrow matmul + rounded-float parity at a
                             # denser regime
    "llm_index_apply_diff",  # r17: ~10x the maintenance volume (5k
                             # docs), the residue-class CRT overlaps of
                             # the snapshot fixture, and a 10x larger
                             # materialized prev index behind the
                             # anti-join — the fold's row accounting at
                             # a genuinely denser regime
    "llm_ivf_apply_diff",    # r17: 2k vectors over 16 frozen lists
                             # (~125/list vs ~31 at the driver SF) —
                             # denser list occupancy, more edit-class
                             # re-assignments, and the cosine argmin
                             # tie-break exercised across 4x the
                             # boundary candidates
    "llm_ann_ivf_pq_refine",  # r18: ~10x the list occupancy means the
                             # ADC shortlist's cut line sits in a far
                             # denser near-tie band — the exact re-rank
                             # reorders many more quantization-blurred
                             # candidates, and the (sim DESC, nid)
                             # tie-break is exercised where it matters
]


# module-level skip: decided at collection time, BEFORE the
# session-scoped spark fixture pays JVM startup for tests that would
# only skip anyway
pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_BENCH), reason=f"{SF_BENCH} not present"
)


@pytest.fixture(scope="module")
def duck_bench():
    con = duckdb_connection(SF_BENCH)
    yield con
    con.close()


@pytest.mark.parametrize("name", _SPOT_KEYS)
def test_query_matches_oracle_at_bench_sf(spark, duck_bench, name):
    spec = all_specs()[name]
    assert spec.oracle is not None, f"{name} must be a full-oracle key"
    result = compare_query(
        spark, duck_bench, name, spec.fn, spec.oracle, SF_BENCH
    )
    assert result.ok, f"{name}@sf0.1: {result.detail}"
