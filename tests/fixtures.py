"""Deterministic reference-shaped fixtures (FIXTURES.md) — holders,
transfers, cursors — generated with a fixed seed so every invariant the
reference enforces (6h-aligned buckets, lowercase addresses, exact ties
for the rank tie-break, duplicate replays, wallet∈{from,to}) is present.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import numpy as np
import pandas as pd

SEED = 42
ASOF = dt.datetime(2024, 3, 1, 12, 0, 0)
TOKENS = ["0x" + f"{i:040x}" for i in (0xA, 0xB)]


def _addr(rng: np.random.Generator) -> str:
    return "0x" + "".join(rng.choice(list("0123456789abcdef"), 40))


def holders_pdf(n_holders: int = 800, n_buckets: int = 4) -> pd.DataFrame:
    """holders_raw-shaped snapshots: 6h-aligned buckets, heavy-tailed
    balances, deliberate exact ties, a few non-18 token_decimal rows."""
    rng = np.random.default_rng(SEED)
    addrs = sorted({_addr(rng) for _ in range(n_holders)})
    rows = []
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    for b in range(n_buckets):
        bucket = base + dt.timedelta(hours=6 * b)
        trig = bucket.strftime("%Y/%m/%d-%H:%M")
        for token in TOKENS:
            for i, h in enumerate(addrs):
                mag = 10 ** int(rng.integers(15, 27))
                qty = int(rng.integers(1, 1000)) * mag
                if i % 97 == 0:  # exact scaled ties → exercises addr tie-break
                    qty = 5 * 10**20
                dec = 18 if i % 50 else int(rng.choice([6, 8]))
                rows.append(
                    (
                        trig,
                        bucket,
                        token,
                        h,
                        dec,
                        str(qty),
                        Decimal(qty) / Decimal(10**18),
                        ASOF,
                        ASOF + dt.timedelta(seconds=b),
                    )
                )
    return pd.DataFrame(
        rows,
        columns=[
            "trigger_id",
            "bucket_start_utc",
            "contract_address",
            "holder_address",
            "token_decimal",
            "quantity_raw",
            "quantity_18d",
            "inserted_at",
            "updated_at",
        ],
    )


def holders_with_replays(base: pd.DataFrame) -> pd.DataFrame:
    """Raw-ingest variant: duplicate keys with differing qty and increasing
    updated_at (page replays) — last-wins upsert must keep the newest."""
    dups = base.sample(frac=0.1, random_state=SEED).copy()
    dups["quantity_raw"] = (dups["quantity_raw"].astype(object)).map(lambda s: str(int(s) + 777))
    # keep the generated-column invariant (quantity_18d == raw/10^18,
    # schema.sql:51-52) consistent on the replay rows too
    dups["quantity_18d"] = dups["quantity_raw"].map(lambda s: Decimal(s) / Decimal(10**18))
    dups["updated_at"] = dups["updated_at"] + pd.Timedelta(hours=1)
    return pd.concat([base, dups], ignore_index=True)


def transfers_pdf(holders: pd.DataFrame, n_rows: int = 4000) -> pd.DataFrame:
    """wallet_transactions-shaped event log ending at ASOF, dense in the
    final 60 minutes; every row's wallet_address equals exactly one of
    from/to; ~5% exact duplicate replays appended."""
    rng = np.random.default_rng(SEED + 1)
    wallets = holders["holder_address"].unique()
    rows = []
    t0 = ASOF - dt.timedelta(hours=48)
    for i in range(n_rows):
        # half the rows in the last hour (sliding-window density)
        if i % 2:
            ts = ASOF - dt.timedelta(seconds=int(rng.integers(0, 3600)))
        else:
            ts = t0 + dt.timedelta(seconds=int(rng.integers(0, 48 * 3600)))
        # naive .timestamp() would read the MACHINE timezone — pin UTC so
        # the fixed-seed fixture is byte-identical everywhere
        unix = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
        wallet = wallets[int(rng.integers(0, len(wallets)))]
        other = wallets[int(rng.integers(0, len(wallets)))]
        inbound = bool(rng.integers(0, 2))
        frm, to = (other, wallet) if inbound else (wallet, other)
        raw = int(rng.integers(1, 1000)) * 10 ** int(rng.integers(15, 24))
        rows.append(
            (
                wallet,
                None,
                None,
                TOKENS[int(rng.integers(0, len(TOKENS)))],
                1_000_000 + unix // 3,
                unix,
                dt.datetime.utcfromtimestamp(unix),
                "0x" + "".join(rng.choice(list("0123456789abcdef"), 64)),
                int(rng.integers(0, 10**6)),
                "0x" + "".join(rng.choice(list("0123456789abcdef"), 64)),
                frm,
                to,
                str(raw),
                Decimal(raw) / Decimal(10**18),
                "Merlin",
                "MERL",
                18,
                int(rng.integers(0, 300)) if rng.random() > 0.1 else None,
                int(rng.integers(21000, 1_000_000)),
                int(rng.integers(21000, 500_000)),
                int(rng.integers(21000, 10_000_000)),
                int(rng.integers(1, 1000)),
                Decimal(int(rng.integers(10**9, 10**11))),
                "0x",
                ASOF,
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=[
            "wallet_address",
            "wallet_name",
            "wallet_tag",
            "contract_address",
            "block_number",
            "block_time_unix",
            "block_time_utc",
            "tx_hash",
            "nonce",
            "block_hash",
            "from_address",
            "to_address",
            "value_raw",
            "value_18d",
            "token_name",
            "token_symbol",
            "token_decimal",
            "transaction_index",
            "gas",
            "gas_used",
            "cumulative_gas_used",
            "confirmations",
            "gas_price",
            "input",
            "ingested_at",
        ],
    )
    replays = pdf.sample(frac=0.05, random_state=SEED)
    return pd.concat([pdf, replays], ignore_index=True)


TRANSFER_SPARK_SCHEMA = """
    wallet_address string, wallet_name string, wallet_tag string,
    contract_address string, block_number long, block_time_unix long,
    block_time_utc timestamp, tx_hash string, nonce long, block_hash string,
    from_address string, to_address string, value_raw string,
    value_18d decimal(38,18), token_name string, token_symbol string,
    token_decimal short, transaction_index int, gas long, gas_used long,
    cumulative_gas_used long, confirmations long, gas_price decimal(38,0),
    input string, ingested_at timestamp
"""

HOLDERS_SPARK_SCHEMA = """
    trigger_id string, bucket_start_utc timestamp, contract_address string,
    holder_address string, token_decimal short, quantity_raw string,
    quantity_18d decimal(38,18), inserted_at timestamp, updated_at timestamp
"""


def cursors_pdf() -> pd.DataFrame:
    """ingestion_cursors-shaped with conflicting per-stream updates."""
    rows = []
    for i in range(20):
        stream = f"tokentx:0x{i:040x}:{TOKENS[0]}"
        rows.append((stream, 1000 + i, 5, ASOF, "{}"))
        if i % 3 == 0:  # conflicting older snapshot — GREATEST must win
            rows.append((stream, 900 + i, 9, ASOF, "{}"))
    return pd.DataFrame(
        rows,
        columns=["stream", "last_scanned_block", "last_page", "updated_at_utc", "metadata"],
    )
