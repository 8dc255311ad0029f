"""Semantic invariants for the deterministic sketches — the oracle
parity test proves cross-engine equality; these prove the sketch MATH
does what a sketch must (accuracy bound, one-sided error), so a broken
hash split or register fold fails loudly even if both engines break
identically."""

from __future__ import annotations

from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.sketches import (
    sketch_countmin_heavy_hitters,
    sketch_hll_distinct,
)

from .conftest import SF_SMOKE


def test_hll_estimate_within_error_bound(spark, sf_dir):
    """HLL with m=256 registers has relative σ ≈ 1.04/√256 ≈ 6.5%; a
    20% bound (> 3σ) only trips on real breakage, not sketch noise."""
    rows = sketch_hll_distinct(spark, sf_dir).collect()
    assert rows, "no groups"
    for r in rows:
        rel_err = abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        assert rel_err < 0.20, (
            f"{r.o_orderpriority}: estimate {r.hll_estimate} vs exact "
            f"{r.exact_distinct} (rel err {rel_err:.3f})"
        )


def test_hll_registers_bounded(spark):
    rows = sketch_hll_distinct(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0 <= r.empty_registers <= 256


def test_countmin_estimate_never_undercounts(spark, sf_dir):
    """Count-min error is ONE-SIDED: estimate ≥ true count, always —
    the defining sketch invariant (collisions only inflate cells)."""
    rows = sketch_countmin_heavy_hitters(spark, sf_dir).collect()
    assert rows, "no probes"
    for r in rows:
        assert r.cms_estimate >= r.true_count, (
            f"{r.term}: CMS {r.cms_estimate} < true {r.true_count}"
        )


def test_countmin_top_term_exactish(spark, sf_dir):
    """With 4×512 cells over this vocabulary the heavy hitters should
    estimate within 2× of truth — a broken position hash (all terms in
    one cell) blows far past this."""
    rows = sketch_countmin_heavy_hitters(spark, sf_dir).collect()
    for r in rows:
        assert r.cms_estimate <= 2 * r.true_count, (
            f"{r.term}: CMS {r.cms_estimate} vs true {r.true_count} — "
            "cell collisions out of bounds"
        )
