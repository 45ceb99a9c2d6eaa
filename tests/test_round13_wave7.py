"""Semantic test for the round-13 wave-7 operator: the per-source
dataset card."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from merl_etl_spark.registry import QUERIES, load_all
from merl_etl_spark.sources.tables import load_table

load_all()


def _card_replay(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("source").isNotNull())
        .select("source", "lang", "text")
        .collect()
    )
    per = defaultdict(lambda: {
        "n_docs": 0, "n_tokens": 0, "n_bytes": 0,
        "hashes": set(), "langs": Counter(),
    })
    for r in docs:
        a = per[r.source]
        a["n_docs"] += 1
        a["n_tokens"] += len([w for w in r.text.split(" ") if w != ""])
        a["n_bytes"] += len(r.text.encode())
        a["hashes"].add(hashlib.md5(r.text.encode()).hexdigest())
        if r.lang is not None:
            a["langs"][r.lang] += 1
    exp = {}
    for source, a in per.items():
        top_lang, top_n = min(a["langs"].items(), key=lambda kv: (-kv[1], kv[0]))
        uniq = len(a["hashes"])
        exp[source] = (
            a["n_docs"], a["n_tokens"], a["n_bytes"], uniq,
            len(a["langs"]), top_lang,
            top_n * 1_000_000 // a["n_docs"],
            (a["n_docs"] - uniq) * 1_000_000 // a["n_docs"],
            a["n_bytes"] // a["n_docs"],
        )
    return exp


def test_dataset_card_matches_python_replay(spark, sf_dir):
    exp = _card_replay(spark, sf_dir)
    got = {
        r.source: (
            r.n_docs, r.n_tokens, r.n_bytes, r.n_unique_texts, r.n_langs,
            r.top_lang, r.top_lang_ppm, r.dup_ppm, r.avg_bytes,
        )
        for r in QUERIES["curate-dataset-card"](spark, sf_dir).collect()
    }
    assert got == exp


def test_dataset_card_invariants(spark, sf_dir):
    rows = QUERIES["curate-dataset-card"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_unique_texts <= r.n_docs
        assert 0 <= r.dup_ppm < 1_000_000
        assert 0 < r.top_lang_ppm <= 1_000_000
        assert r.n_langs >= 1 and r.top_lang is not None
        assert r.avg_bytes * r.n_docs <= r.n_bytes < (r.avg_bytes + 1) * r.n_docs
