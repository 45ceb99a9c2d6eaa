"""Reference-semantics tests on reference-shaped fixtures (FIXTURES.md):
the three pipeline assemblies plus every idempotent write pattern, with
the properties the reference's unique keys / GREATEST merges guarantee.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from merl_etl_spark.plans.jobs import activity_report, derive_top100, ingest_transfers
from merl_etl_spark.sinks import cursor_merge, insert_ignore, snapshot_replace, upsert_last_wins
from tests.fixtures import (
    ASOF,
    HOLDERS_SPARK_SCHEMA,
    TOKENS,
    TRANSFER_SPARK_SCHEMA,
    cursors_pdf,
    holders_pdf,
    holders_with_replays,
    transfers_pdf,
)


@pytest.fixture(scope="module")
def holders(spark):
    return spark.createDataFrame(holders_pdf(), schema=HOLDERS_SPARK_SCHEMA).cache()


@pytest.fixture(scope="module")
def transfers(spark):
    return spark.createDataFrame(
        transfers_pdf(holders_pdf()), schema=TRANSFER_SPARK_SCHEMA
    ).cache()


def test_derive_top100_shape_and_determinism(holders):
    top = derive_top100(holders, TOKENS[0]).cache()
    rows = top.collect()
    assert 0 < len(rows) <= 100
    assert all(r.contract_address == TOKENS[0] for r in rows)
    # single (latest) bucket only
    assert len({r.bucket_start_utc for r in rows}) == 1
    # rank is gapless 1..n (tie-break on unique holder makes RANK == ROW_NUMBER)
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    # deterministic: same result on re-derivation (idempotent snapshot)
    again = derive_top100(holders, TOKENS[0])
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))
    # balance ordering holds with address tie-break
    by_rank = sorted(rows, key=lambda r: r.rnk)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.balance, b.holder_address) >= (b.balance, a.holder_address) or a.balance > b.balance


def test_top100_uses_token_decimal_not_18d(spark):
    """The reference's dual-scaling behavior (SURVEY §1.3): top-100 ranks by
    raw/10^token_decimal, so a 6-decimal holder with smaller raw outranks an
    18-decimal holder with bigger raw."""
    import pandas as pd

    pdf = holders_pdf(n_holders=4, n_buckets=1).head(4).copy()
    pdf["token_decimal"] = [18, 6, 18, 18]
    pdf["quantity_raw"] = ["1" + "0" * 18, "2" + "0" * 6, "3" + "0" * 17, "5" + "0" * 17]
    pdf["contract_address"] = TOKENS[0]
    df = spark.createDataFrame(pdf, schema=HOLDERS_SPARK_SCHEMA)
    top = derive_top100(df, TOKENS[0]).orderBy("rnk").collect()
    # scaled balances: 1.0, 2.0, 0.3, 0.5 → the 6-decimal holder wins
    assert top[0].token_decimal == 6
    assert top[0].balance == Decimal("2.000000")


def test_top100_rank_exact_beyond_38_digit_whole(spark):
    """ADVICE r2 (high): lpad TRUNCATES inputs longer than the pad width,
    so a 38-wide whole key compared >38-digit wholes by their leading 38
    chars — a 39-digit 9… ranked above a 40-digit 1….  The key is now
    78-wide (uint256 max digits); the 40-digit whole must win."""
    pdf = holders_pdf(n_holders=3, n_buckets=1).head(3).copy()
    pdf["token_decimal"] = [18, 18, 18]
    # wholes: 40 digits (1 then 39 zeros), 39 digits (all 9s), 1 digit
    pdf["quantity_raw"] = [
        "1" + "0" * 39 + "0" * 18,
        "9" * 39 + "0" * 18,
        "7" + "0" * 18,
    ]
    pdf["contract_address"] = TOKENS[0]
    df = spark.createDataFrame(pdf, schema=HOLDERS_SPARK_SCHEMA)
    top = derive_top100(df, TOKENS[0]).orderBy("rnk").collect()
    assert [r.balance_raw for r in top] == [
        "1" + "0" * 39 + "0" * 18,
        "9" * 39 + "0" * 18,
        "7" + "0" * 18,
    ]
    # >32-digit wholes stay under the documented overflow→NULL display policy
    assert top[0].balance is None and top[1].balance is None
    assert top[2].balance == Decimal("7.000000")


def test_top100_balance_rounds_half_up_at_6dp(spark):
    """ADVICE r2 (medium): display balance must round HALF_UP at 6 dp
    (reference: numeric quantity_raw / POW(10, decimal) cast to
    NUMERIC(38,6)), not truncate the 7th fractional digit."""
    pdf = holders_pdf(n_holders=2, n_buckets=1).head(2).copy()
    pdf["token_decimal"] = [18, 18]
    pdf["quantity_raw"] = [
        "1" + "2345675" + "0" * 11,  # 1.2345675 → 1.234568 (up), not 1.234567
        "2" + "2345674" + "0" * 11,  # 2.2345674 → 2.234567 (down)
    ]
    pdf["contract_address"] = TOKENS[0]
    df = spark.createDataFrame(pdf, schema=HOLDERS_SPARK_SCHEMA)
    top = derive_top100(df, TOKENS[0]).orderBy("rnk").collect()
    by_raw = {r.balance_raw: r.balance for r in top}
    assert by_raw["1" + "2345675" + "0" * 11] == Decimal("1.234568")
    assert by_raw["2" + "2345674" + "0" * 11] == Decimal("2.234567")


def test_upsert_last_wins_replays(spark):
    base = holders_pdf()
    raw = spark.createDataFrame(holders_with_replays(base), schema=HOLDERS_SPARK_SCHEMA)
    keys = ["bucket_start_utc", "contract_address", "holder_address"]
    deduped = upsert_last_wins(
        raw, keys, [F.col("updated_at").desc(), F.col("quantity_raw").desc()]
    ).cache()
    assert deduped.count() == len(base)
    assert deduped.groupBy(*keys).count().filter("count > 1").count() == 0
    # replayed keys kept the newer (+777) row
    replayed = raw.groupBy(*keys).count().filter("count > 1").drop("count")
    kept = deduped.join(replayed, keys).select("quantity_raw").collect()
    assert kept and all(int(r.quantity_raw) % 1000 == 777 % 1000 for r in kept)


def test_ingest_transfers_idempotent(spark, transfers):
    cursors = spark.createDataFrame(cursors_pdf())
    empty = transfers.limit(0)
    new_rows, merged = ingest_transfers(transfers, empty, cursors)
    n1 = new_rows.count()
    assert 0 < n1 < transfers.count()  # replays dropped
    # replaying the same batch against the now-populated target appends nothing
    again, _ = ingest_transfers(transfers, new_rows, cursors)
    assert again.count() == 0
    # cursor monotonicity: merged cursor >= every original cursor value
    joined = (
        merged.alias("m")
        .join(spark.createDataFrame(cursors_pdf()).alias("c"), "stream")
        .filter("m.last_scanned_block < c.last_scanned_block")
    )
    assert joined.count() == 0


def test_cursor_merge_commutative_and_monotone(spark):
    c = spark.createDataFrame(cursors_pdf())
    a = c.filter("last_page = 5")
    b = c.filter("last_page = 9")
    ab = {r.stream: (r.last_scanned_block, r.last_page) for r in cursor_merge(a, b).collect()}
    ba = {r.stream: (r.last_scanned_block, r.last_page) for r in cursor_merge(b, a).collect()}
    assert ab == ba
    for stream, (blk, page) in ab.items():
        olds = [r for r in c.collect() if r.stream == stream]
        assert blk == max(o.last_scanned_block for o in olds)
        assert page == max(o.last_page for o in olds)


def test_activity_report(spark, holders, transfers):
    top = derive_top100(holders, TOKENS[0])
    totals, movers = activity_report(transfers, top, TOKENS[0], ASOF)
    t = totals.collect()[0]
    m = movers.collect()
    assert t.active_wallets >= 0 and t.net == t.total_in - t.total_out
    assert len(m) <= 10
    top_wallets = {r.holder_address for r in top.collect()}
    assert all(r.wallet_address in top_wallets for r in m)
    # movers ordered by max_flow desc (ties by txs desc, wallet asc)
    flows = [r.max_flow for r in m]
    assert flows == sorted(flows, reverse=True)
    # rendered columns present
    assert all(r.wallet_link.startswith('<a href="') for r in m)


def test_snapshot_replace_no_stale_rows(spark, holders, tmp_path):
    """Re-deriving into the same bucket partition replaces it — holders that
    dropped out do NOT linger (the delete+insert semantics,
    sql/top100_from_latest_bucket.sql:119-158)."""
    path = str(tmp_path / "top100")
    top = derive_top100(holders, TOKENS[0], k=100)
    snapshot_replace(top, path, ["contract_address", "bucket_start_utc"])
    # second derivation with a smaller k → fewer rows; stale ranks must vanish
    top50 = derive_top100(holders, TOKENS[0], k=50)
    snapshot_replace(top50, path, ["contract_address", "bucket_start_utc"])
    readback = spark.read.parquet(path)
    assert readback.count() == top50.count()
    assert readback.agg(F.max("rnk")).collect()[0][0] <= 50


def test_insert_ignore_null_tx_index_key(spark, transfers):
    """COALESCE(transaction_index, 0) in the dedup key (schema.sql:123):
    a null-index duplicate of an index-0 row must be treated as the same key."""
    one = transfers.filter(F.col("transaction_index").isNull()).limit(1)
    if one.count() == 0:
        pytest.skip("fixture produced no null transaction_index")
    clone = one.withColumn("transaction_index", F.lit(0))
    both = one.unionByName(clone)
    appended = insert_ignore(
        both.withColumn("tx_index_key", F.coalesce(F.col("transaction_index"), F.lit(0))),
        transfers.limit(0).withColumn("tx_index_key", F.lit(0)),
        ["tx_hash", "contract_address", "wallet_address", "value_raw", "tx_index_key"],
        [F.col("block_number").asc()],
    )
    assert appended.count() == 1


def test_adapt_to_destination_renamed_binary_table(spark, holders, tmp_path):
    """information_schema-style destination adaptation end-to-end
    (sql/top100_from_latest_bucket.sql:46-117): derive Top-100, adapt it
    onto a destination whose every column is a synonym rename with bytea
    (binary) addresses, write + read back, and check values survived."""
    import datetime as dt

    from pyspark.sql import types as T

    from merl_etl_spark.sinks import adapt_to_destination

    dest_schema = T.StructType(
        [
            T.StructField("bucket_utc", T.TimestampType()),
            T.StructField("token", T.BinaryType()),
            T.StructField("address", T.BinaryType()),
            T.StructField("position", T.IntegerType()),
            T.StructField("decimals", T.IntegerType()),
            T.StructField("raw_balance", T.StringType()),
            T.StructField("qty", T.DecimalType(38, 6)),
            T.StructField("updated_at", T.TimestampType()),
        ]
    )
    top = derive_top100(holders, TOKENS[0])
    stamp = dt.datetime(2024, 1, 1)
    adapted = adapt_to_destination(top, dest_schema, inserted_at=stamp)
    assert adapted.columns == [
        "bucket_utc", "token", "address", "position",
        "decimals", "raw_balance", "qty", "updated_at",
    ]
    path = str(tmp_path / "renamed_top100")
    adapted.write.parquet(path)
    back = spark.read.parquet(path)
    src = {r.rnk: r for r in top.collect()}
    for r in back.collect():
        s = src[r.position]
        # binary address round-trips to the original 0x hex form
        assert "0x" + r.address.hex() == s.holder_address.lower()
        assert "0x" + r.token.hex() == s.contract_address.lower()
        assert r.raw_balance == s.balance_raw and r.qty == s.balance
        assert r.updated_at == stamp


def test_adapt_to_destination_missing_required_raises(spark, holders):
    from pyspark.sql import types as T

    from merl_etl_spark.sinks import adapt_to_destination

    top = derive_top100(holders, TOKENS[0])
    no_holder = T.StructType(
        [T.StructField("token", T.StringType()), T.StructField("rank", T.LongType())]
    )
    with pytest.raises(ValueError, match="holder_address"):
        adapt_to_destination(top, no_holder)


def test_adapt_to_destination_optional_columns_dropped(spark, holders):
    """A destination without bucket/inserted_at columns just doesn't get
    them (the reference's has_bucket=0 branch)."""
    from pyspark.sql import types as T

    from merl_etl_spark.sinks import adapt_to_destination

    top = derive_top100(holders, TOKENS[0])
    minimal = T.StructType(
        [
            T.StructField("contract", T.StringType()),
            T.StructField("owner_address", T.StringType()),
            T.StructField("rank", T.LongType()),
            T.StructField("token_decimals", T.LongType()),
            T.StructField("qty_raw", T.StringType()),
            T.StructField("balance_decimal", T.DecimalType(38, 6)),
        ]
    )
    adapted = adapt_to_destination(top, minimal)
    assert adapted.columns == [
        "contract", "owner_address", "rank", "token_decimals", "qty_raw", "balance_decimal"
    ]
    assert adapted.count() == top.count()


def test_adapt_to_destination_emits_destination_column_order(spark, holders):
    """Positional sinks (insertInto, positional JDBC INSERT) rely on the
    projection matching the destination's physical column order — synonym-
    dict order must NOT leak through."""
    from pyspark.sql import types as T

    from merl_etl_spark.sinks import adapt_to_destination

    top = derive_top100(holders, TOKENS[0])
    scrambled = T.StructType(
        [
            T.StructField("qty", T.DecimalType(38, 6)),
            T.StructField("position", T.IntegerType()),
            T.StructField("owner_address", T.StringType()),
            T.StructField("contract", T.StringType()),
            T.StructField("token_decimals", T.LongType()),
            T.StructField("raw_balance", T.StringType()),
        ]
    )
    adapted = adapt_to_destination(top, scrambled)
    assert adapted.columns == [
        "qty", "position", "owner_address", "contract", "token_decimals", "raw_balance"
    ]


def test_adapt_to_destination_malformed_hex_raises(spark):
    """The reference's decode(...,'hex') aborts on bad input; unhex→NULL
    silently writing a NULL address key must not replace that."""
    from pyspark.sql import types as T
    from pyspark.sql import utils as _u  # noqa: F401

    from merl_etl_spark.sinks import adapt_to_destination

    bad = spark.createDataFrame(
        [("0xZZ", "0xabcd", 1, 18, "1", "1.000000")],
        "holder_address string, contract_address string, rnk long, "
        "token_decimal long, balance_raw string, balance string",
    ).withColumn("balance", F.col("balance").cast("decimal(38,6)"))
    dest = T.StructType(
        [
            T.StructField("token", T.BinaryType()),
            T.StructField("address", T.BinaryType()),
            T.StructField("rank", T.LongType()),
            T.StructField("decimals", T.LongType()),
            T.StructField("balance_raw", T.StringType()),
            T.StructField("qty", T.DecimalType(38, 6)),
        ]
    )
    with pytest.raises(Exception, match="malformed hex"):
        adapt_to_destination(bad, dest).collect()


def test_adapt_to_destination_unmapped_column_raises(spark, holders):
    """A destination column no synonym covers must not silently vanish —
    positional sinks would shift every later value one slot left
    (ADVICE r3; sql/top100_from_latest_bucket.sql's column-list discovery
    always emits the full physical list)."""
    from pyspark.sql import types as T

    from merl_etl_spark.sinks import adapt_to_destination

    top = derive_top100(holders, TOKENS[0])
    with_extra = T.StructType(
        [
            T.StructField("contract", T.StringType()),
            T.StructField("owner_address", T.StringType()),
            T.StructField("rank", T.LongType()),
            T.StructField("token_decimals", T.LongType()),
            T.StructField("qty_raw", T.StringType()),
            T.StructField("balance_decimal", T.DecimalType(38, 6)),
            T.StructField("chain_id", T.LongType()),  # no synonym maps here
        ]
    )
    with pytest.raises(ValueError, match="chain_id"):
        adapt_to_destination(top, with_extra)

    # opt-in policy: typed-NULL fill keeps positional alignment
    adapted = adapt_to_destination(top, with_extra, unmapped="null")
    assert adapted.columns[-1] == "chain_id"
    assert dict(adapted.dtypes)["chain_id"] == "bigint"
    assert adapted.filter(F.col("chain_id").isNotNull()).count() == 0

    # NOT NULL unmapped columns can never be filled — always loud
    not_null = T.StructType(
        with_extra.fields[:-1] + [T.StructField("chain_id", T.LongType(), nullable=False)]
    )
    with pytest.raises(ValueError, match="NOT NULL"):
        adapt_to_destination(top, not_null, unmapped="null")
