"""Pin the exact integer-unit money-sum scheme (plans/relational.py
module helper block): the hi/lo BIGINT split, the post-agg half-up
recombination identity, and cross-engine determinism on crafted
.005-boundary data — the class the r9 10x sweep caught in q1's
double-sum form (Spark .35 vs DuckDB .34 on sum_charge)."""

from decimal import ROUND_HALF_UP, Decimal


def _hi_lo_cents(units: list[int], unit: int) -> int:
    """The production recombination, in plain Python: two partial sums
    (cents part + sub-cent remainder), then the integer half-up identity
    ``(U*a + b + U//2) div U = a + (b + U//2) div U``."""
    a = sum(u // unit for u in units)
    b = sum(u % unit for u in units)
    return a + (b + unit // 2) // unit


def test_hi_lo_split_matches_decimal_reference_fuzz():
    """Randomized pin against an INDEPENDENT spec: Decimal quantize to
    whole cents with ROUND_HALF_UP on the exact rational SUM(units)/U.
    Non-circular — the production form never materializes SUM(units)
    (that is the whole point of the split: per-group accumulators stay
    under 2^63), while the reference does, in exact decimal. Forces
    exact half-boundary remainders into the sample so the half-up
    branch is exercised, and includes per-row values at the documented
    per-row ceilings (~1.2e11 e6-units) so a sum that WOULD overflow a
    single e6 accumulator at scale still recombines exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=120_000_000_000),
                 min_size=1, max_size=60),
        st.sampled_from([100, 10_000]),
        st.booleans(),
    )
    def check(units, unit, force_tie):
        if force_tie:
            # retune the last row so SUM(units) % U == U/2 exactly —
            # the .005-of-a-cent boundary where half-up must round UP
            # and any float carrier is a coin flip
            total = sum(units)
            units[-1] += (unit // 2 - total % unit) % unit
        got = _hi_lo_cents(units, unit)
        want = int((Decimal(sum(units)) / Decimal(unit))
                   .quantize(Decimal(1), ROUND_HALF_UP))
        assert got == want, (units, unit)

    check()


def test_q1_money_sums_halfup_ties_cross_engine(spark, tmp_path):
    """Craft lineitem rows whose money sums land EXACTLY on the .005
    rounding boundary, run the real q1 plan AND its DuckDB oracle on
    them, and assert equality plus the absolute half-up values:

    - group (A, F): one row, extprice=0.25, disc=0, tax=0.02 →
      charge = 0.255 exactly. The nearest IEEE double to 0.255 is
      BELOW it, so a double carrier rounds to 0.25; exact integer
      half-up must say 0.26.
    - group (N, O): one row, extprice=0.25, disc=0.98 →
      disc_price = 0.005 exactly → half-up 0.01 (double says 0.00).

    This pins the semantics so they cannot silently drift back to
    either engine's native float rounding (the r9 q1 regression class).
    """
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # flag, status, qty, extprice, disc, tax
        ("A", "F", 1.00, 0.25, 0.00, 0.02),   # charge tie → 0.26
        ("N", "O", 2.00, 0.25, 0.98, 0.00),   # disc_price tie → 0.01
        # a plain bulk row per group so sums aren't degenerate
        ("A", "F", 3.00, 100.00, 0.10, 0.05),
        ("N", "O", 4.00, 200.00, 0.20, 0.08),
    ]
    pdf = pd.DataFrame(rows, columns=[
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax"])
    pdf["l_shipdate"] = pd.Timestamp("1997-06-01").as_unit("us")
    pq.write_table(pa.Table.from_pandas(pdf),
                   str(tmp_path / "lineitem.parquet"))

    from mapreduce_4sl08_spark.plans.relational import (
        Q1_SQL, q1_pricing_summary)
    got = (q1_pricing_summary(spark, str(tmp_path))
           .toPandas().reset_index(drop=True))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{tmp_path}/lineitem.parquet')")
    want = con.execute(Q1_SQL).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    by_grp = got.set_index(["l_returnflag", "l_linestatus"])
    # (A,F): disc_price = 0.25 + 90.00 = 90.25 (no tie — control value);
    # charge = 0.255 + 94.50 = 94.755 → tie → 94.76
    assert by_grp.loc[("A", "F"), "sum_disc_price"] == 90.25
    assert by_grp.loc[("A", "F"), "sum_charge"] == 94.76
    # (N,O): disc_price = 0.005 + 160.00 = 160.005 → 160.01 (not 160.0);
    # charge = 0.005 + 172.80 = 172.805 → 172.81
    assert by_grp.loc[("N", "O"), "sum_disc_price"] == 160.01
    assert by_grp.loc[("N", "O"), "sum_charge"] == 172.81
