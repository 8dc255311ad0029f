"""Semantic tests for the LLM-corpus prep operators beyond oracle
parity: chunk coverage/overlap, packing bounds, PII removal, sampling
rates, mix-share normalization."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from spotify_serverless_etl_pipeline_engineering_with_azure_spark import registry
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.catalog import table
from spotify_serverless_etl_pipeline_engineering_with_azure_spark.plans.llm_corpus import (
    CHUNK_S,
    CHUNK_W,
    PACK_BUDGET,
    SAMPLE_DEFAULT,
    SAMPLE_RATES,
    _EMAIL_RE,
    _PHONE_RE,
)

ALL = registry.load_all()


def test_chunks_cover_and_reassemble(spark, sf_dir):
    """Every token of every doc appears in some chunk; consecutive
    chunks overlap by exactly W-S tokens; stride-prefixes of the chunks
    concatenate back to the original text."""
    chunks = ALL["text_chunk_windows"].fn(spark, sf_dir).toPandas()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in table(spark, sf_dir, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks.itertuples():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        toks = docs[doc_id]
        rows.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in rows] == list(range(len(rows)))
        # coverage: last chunk reaches the final token
        last = rows[-1]
        assert last.start_tok - 1 + last.n_chunk_tokens == len(toks)
        # each chunk matches the source slice
        for r in rows:
            lo = r.start_tok - 1
            assert r.chunk_text == " ".join(toks[lo : lo + CHUNK_W])
        # reassembly from stride-prefixes
        rebuilt: list[str] = []
        for r in rows:
            rebuilt.extend(r.chunk_text.split(" ")[: CHUNK_S] if r is not rows[-1] else r.chunk_text.split(" "))
        # overlapping tail tokens duplicate; prefix-of-stride removes them
        assert rebuilt[: len(toks)] == toks


def test_pack_bins_respect_budget(spark, sf_dir):
    """Each bin's packed tokens stay below budget + one max doc (a doc
    may straddle a boundary but bins never skip: bin ids per shard are
    dense from 0)."""
    out = ALL["corpus_pack_sequences"].fn(spark, sf_dir).toPandas()
    max_doc_tokens = (
        table(spark, sf_dir, "documents")
        .select(F.max(F.size(F.split("text", " "))))
        .first()[0]
    )
    assert (out.n_tokens_packed <= PACK_BUDGET + max_doc_tokens).all()
    for shard, grp in out.groupby("shard"):
        bins = sorted(grp.bin)
        assert bins == list(range(len(bins))), f"shard {shard} has gaps: {bins}"
    assert (abs(out.fill_ratio - out.n_tokens_packed / PACK_BUDGET) < 1e-12).all()


def test_pii_redaction_removes_all_matches(spark, sf_dir):
    out = ALL["text_pii_redaction"].fn(spark, sf_dir).toPandas()
    email, phone = re.compile(_EMAIL_RE), re.compile(_PHONE_RE)
    assert (out.n_emails > 0).any() and (out.n_phones > 0).any()
    for r in out.itertuples():
        assert not email.search(r.redacted), r.redacted
        assert not phone.search(r.redacted), r.redacted
        if r.doc_id % 5 == 0:
            assert r.n_emails >= 1 and "<EMAIL>" in r.redacted
        if r.doc_id % 7 == 0:
            assert r.n_phones >= 1 and "<PHONE>" in r.redacted


def test_stratified_sample_rates(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    totals = {r.lang: r["count"] for r in docs}
    kept = (
        ALL["corpus_sample_stratified"].fn(spark, sf_dir).groupBy("lang").count().collect()
    )
    kept_by_lang = {r.lang: r["count"] for r in kept}
    for lang, total in totals.items():
        rate = SAMPLE_RATES.get(lang, SAMPLE_DEFAULT) / 100
        frac = kept_by_lang.get(lang, 0) / total
        if rate == 1.0:
            assert frac == 1.0, f"{lang}: default stratum must keep everything"
        else:
            # hash-mod sampling: binomial-ish tolerance on small strata
            assert abs(frac - rate) < 0.2, f"{lang}: kept {frac:.2f}, want ~{rate}"


def test_mix_shares_sum_to_one(spark, sf_dir):
    out = ALL["corpus_mix_stats"].fn(spark, sf_dir).toPandas()
    assert abs(out.token_share.sum() - 1.0) < 1e-9
    assert (out.n_tokens > 0).all()


def test_repetition_signals_bounds(spark, sf_dir):
    out = ALL["text_repetition_signals"].fn(spark, sf_dir).toPandas()
    assert ((out.dup_token_frac >= 0) & (out.dup_token_frac < 1)).all()
    assert ((out.top_token_frac > 0) & (out.top_token_frac <= 1)).all()
    assert ((out.top_bigram_frac > 0) & (out.top_bigram_frac <= 1)).all()
    # a small shared vocab forces real repetition: the signals must vary
    assert out.dup_token_frac.nunique() > 10
