"""Unit tests for the corpus-curation wave: repetition metrics,
decontamination scrub, stratified sampling, bigram stats.

(The registered queries themselves are additionally oracle-checked by
tests/test_oracle_parity.py at sf0.01, same as every other query.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.functions import text as TX
from mknssh_11_bigdata_spark.queries_curation import (
    STRATA_RATES_PM,
    stratified_sample,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], "text string")


def test_bigrams_edges(spark):
    rows = (
        spark.createDataFrame(
            [("a b c",), ("solo",), ("",), ("x  y",)], "text string"
        )
        .select(TX.bigrams(F.col("text")).alias("bg"))
        .collect()
    )
    assert rows[0].bg == ["a b", "b c"]
    assert rows[1].bg == []  # < 2 tokens -> empty, not null
    assert rows[2].bg == []
    assert rows[3].bg == ["x y"]  # double space collapsed by tokenizer


def test_dup_ratios(spark):
    df = spark.createDataFrame(
        [
            ("a a a a",),  # 4 tokens, 1 distinct -> 0.75
            ("a b c d",),  # all unique -> 0.0
            ("",),  # no tokens -> NULL
            ("a b a b a b",),  # bigrams: 5 total {a b, b a} -> 3/5
        ],
        "text string",
    )
    got = df.select(
        TX.dup_token_ratio(F.col("text")).alias("dtr"),
        TX.dup_bigram_ratio(F.col("text")).alias("dbr"),
    ).collect()
    assert got[0].dtr == 0.75
    assert got[1].dtr == 0.0
    assert got[2].dtr is None and got[2].dbr is None
    assert abs(got[3].dbr - 0.6) < 1e-12


def test_scrub_terms_word_boundaries(spark):
    row = (
        _one(spark, "spark and sparkly spark-shuffle sparks")
        .select(
            TX.scrub_terms(F.col("text"), ("spark", "shuffle")).alias("s"),
            TX.term_match_count(F.col("text"), ("spark", "shuffle")).alias(
                "n"
            ),
        )
        .collect()[0]
    )
    # whole words only: 'sparkly'/'sparks' untouched; hyphen is a boundary
    assert row.s == "[REDACTED] and sparkly [REDACTED]-[REDACTED] sparks"
    assert row.n == 3


def test_scrub_regex_metachars_escaped(spark):
    row = (
        _one(spark, "cost is 3.50 here")
        .select(TX.scrub_terms(F.col("text"), ("3.50",)).alias("s"))
        .collect()[0]
    )
    # '.' must match literally after escaping, and '3x50' must NOT match
    assert row.s == "cost is [REDACTED] here"
    row2 = (
        _one(spark, "ratio 3x50 here")
        .select(TX.scrub_terms(F.col("text"), ("3.50",)).alias("s"))
        .collect()[0]
    )
    assert row2.s == "ratio 3x50 here"


def test_stratified_sample_deterministic_and_growth_stable(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    a = {r.doc_id for r in stratified_sample(df, "doc_id", "lang", STRATA_RATES_PM).collect()}
    b = {r.doc_id for r in stratified_sample(df, "doc_id", "lang", STRATA_RATES_PM).collect()}
    assert a == b  # no RNG: identical across runs

    # growth stability: adding rows never flips an existing row's fate
    bigger = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    c = {
        r.doc_id
        for r in stratified_sample(bigger, "doc_id", "lang", STRATA_RATES_PM).collect()
    }
    assert a == {i for i in c if i < 2000}

    # rates roughly honored (md5 buckets are uniform; wide tolerance)
    n_en = sum(1 for i in a if i % 2 == 0)
    n_zh = sum(1 for i in a if i % 2 == 1)
    assert 300 <= n_en <= 500  # 40% of 1000
    assert n_zh == 1000  # keep-all stratum keeps everything

    # unknown stratum -> dropped
    unk = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    assert stratified_sample(unk, "doc_id", "lang", STRATA_RATES_PM).count() == 0


def test_pack_sequences_contiguous_fill(spark):
    from mknssh_11_bigdata_spark.queries_curation import pack_sequences

    # 6 docs in one source, sharded to one stream, budget 10 tokens:
    # tokens 4,4,4,9,12,1 -> cum_before 0,4,8,12,21,33
    # -> seq_id 0,0,0,1,2,3
    docs = spark.createDataFrame(
        [
            (i, "w " * n, "s0")
            for i, n in enumerate([4, 4, 4, 9, 12, 1])
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.seq_id): (r.n_docs, r.seq_tokens, r.first_doc, r.last_doc)
        for r in pack_sequences(
            docs, "doc_id", "text", budget=10, shards=1
        ).collect()
    }
    assert out == {
        0: (3, 12, 0, 2),
        1: (1, 9, 3, 3),
        2: (1, 12, 4, 4),
        3: (1, 1, 5, 5),
    }


def test_pack_sequences_sharding_is_deterministic_partition(spark):
    from mknssh_11_bigdata_spark.queries_curation import pack_sequences

    docs = spark.createDataFrame(
        [(i, "a b c", "s%d" % (i % 2)) for i in range(40)],
        "doc_id long, text string, source string",
    )
    rows = pack_sequences(
        docs, "doc_id", "text", budget=6, shards=4
    ).collect()
    # every (source, shard) stream packs independently: shard of every
    # member doc == doc_id % shards, and within a stream the doc ranges
    # of consecutive sequences don't overlap
    assert all(r.first_doc % 4 == r.shard for r in rows)
    by_stream: dict = {}
    for r in rows:
        by_stream.setdefault((r.source, r.shard), []).append(r)
    for rs in by_stream.values():
        rs.sort(key=lambda r: r.seq_id)
        for a, b in zip(rs, rs[1:]):
            assert a.last_doc < b.first_doc


def test_mixing_weights_temperature_math(spark):
    from mknssh_11_bigdata_spark.queries_curation import mixing_weights

    # two sources, 90%/10% token split; alpha=0.5 pulls target shares
    # toward each other: 3:1 instead of 9:1
    docs = spark.createDataFrame(
        [(i, "w " * 9, "big") for i in range(100)]
        + [(i + 100, "w " * 1, "small") for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in mixing_weights(docs, "source", "text").collect()}
    assert out["big"].n_tokens == 900 and out["small"].n_tokens == 100
    assert abs(out["big"].natural_share - 0.9) < 1e-9
    assert abs(out["big"].target_share - 0.75) < 1e-9
    assert abs(out["small"].target_share - 0.25) < 1e-9
    # sampling factor: small is oversampled 2.5x, big downsampled
    assert abs(out["small"].sampling_factor - 2.5) < 1e-6
    assert abs(out["big"].sampling_factor - (0.75 * 1000 / 900)) < 1e-6
    # budget conservation: expected tokens sum back to the corpus size
    assert abs(sum(r.expected_tokens for r in out.values()) - 1000) < 1e-3


def test_quality_funnel_stages_monotonic(spark):
    from mknssh_11_bigdata_spark.queries_curation import quality_funnel
    from mknssh_11_bigdata_spark.sources.readers import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = quality_funnel(d, "source", "text").collect()
    assert rows
    for r in rows:
        # successive gates only ever shrink the surviving set
        assert (
            r.n_docs
            >= r.pass_length
            >= r.pass_wordlen
            >= r.pass_repetition
            >= r.pass_all
            >= 0
        )
    # thresholds were chosen to actually split the corpus: some doc
    # fails somewhere, and some doc survives everything
    assert sum(r.pass_all for r in rows) > 0
    assert sum(r.n_docs - r.pass_all for r in rows) > 0


def test_shuffle_manifest_is_balanced_partition(spark):
    from mknssh_11_bigdata_spark.queries_curation import shuffle_manifest
    from mknssh_11_bigdata_spark.sources.readers import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = d.count()
    rows = shuffle_manifest(d, "doc_id", "text", n_buckets=8).collect()
    # complete partition of the corpus, deterministic across runs
    assert sum(r.n_docs for r in rows) == n
    assert len(rows) == 8
    rows2 = shuffle_manifest(d, "doc_id", "text", n_buckets=8).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # salted-hash balance: no bucket holds more than 3x its fair share
    assert max(r.n_docs for r in rows) <= 3 * (n / 8)


def test_pii_scrub_counts_and_redaction(spark):
    from mknssh_11_bigdata_spark.queries_curation import pii_scrub_profile

    df = spark.createDataFrame(
        [
            # organic email AND phone in the text itself
            (7, "write to bob.smith@corp.io or dial 555-9999 now", "a"),
            # no organic PII — only the injected contact block counts
            (8, "plain text with no contacts at all", "a"),
            # organic IPv4
            (9, "server at 192.168.1.10 responded", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r["source"]: r
        for r in pii_scrub_profile(df, "source", "text").collect()
    }
    # every doc gets 1 injected email/phone/IP; doc 7 adds one organic
    # email + phone, doc 9 one organic IP
    assert rows["a"]["emails_found"] == 3
    assert rows["a"]["phones_found"] == 3
    assert rows["a"]["ips_found"] == 2
    assert rows["b"]["emails_found"] == 1
    assert rows["b"]["phones_found"] == 1
    assert rows["b"]["ips_found"] == 2
    assert rows["a"]["chars_redacted"] > 0
    assert rows["b"]["chars_redacted"] > 0


def test_pii_scrub_redacts_not_mangles(spark):
    """The replacement tokens must survive and non-PII text must be
    untouched — run the same expressions standalone on one row."""
    from mknssh_11_bigdata_spark.queries_curation import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
    )

    red = (
        spark.createDataFrame(
            [("ping alice@web.example.org at 10.1.2.3 or 555-0001 ok",)],
            "s string",
        )
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("s"), PII_EMAIL_RE, "<EMAIL>"),
                    PII_PHONE_RE,
                    "<PHONE>",
                ),
                PII_IP_RE,
                "<IP>",
            ).alias("red")
        )
        .collect()[0]["red"]
    )
    assert red == "ping <EMAIL> at <IP> or <PHONE> ok"


def test_token_budget_selection_greedy_prefix_contract(spark, tmp_path):
    """Planted-boundary contract for the budget cut: selection is
    exactly the greedy prefix of the (score DESC, doc_id) order whose
    INCLUSIVE cumulative token count fits the budget — the cut can
    land mid-source and partially-selected sources report honest
    partial counts."""
    import pathlib

    from pyspark.sql import functions as F

    from mknssh_11_bigdata_spark.queries_curation import (
        BUDGET_DIV,
        curation_token_budget_selection,
    )

    # 6 docs, 10 tokens each => total 60, budget 60//4 = 15 tokens =>
    # exactly one full doc + the cut rejecting the 2nd (10+10 > 15).
    # Scores: distinct-ratio ladder via repeated tokens.
    def text(n_distinct):
        toks = [f"w{i}" for i in range(n_distinct)] + ["w0"] * (
            10 - n_distinct
        )
        return " ".join(toks)

    rows = [
        (0, "a", text(10)),  # score 1.0  -> rank 1, cum 10 <= 15: SELECTED
        (1, "a", text(9)),   # score 0.9  -> rank 2, cum 20 > 15: out
        (2, "b", text(8)),
        (3, "b", text(7)),
        (4, "c", text(6)),
        (5, "c", text(5)),
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    p = tmp_path / "documents.parquet"
    d.coalesce(1).write.mode("overwrite").parquet(str(p))
    # the loader reads <dir>/documents.parquet
    out = {
        r["source"]: (r["n_selected"], r["selected_tokens"], r["n_docs"])
        for r in curation_token_budget_selection(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        "a": (1, 10, 2),  # only the rank-1 doc fits the 15-token budget
        "b": (0, 0, 2),
        "c": (0, 0, 2),
    }
    assert BUDGET_DIV == 4  # the contract the arithmetic above encodes


def test_source_calibrated_quality_rank_contract(spark, tmp_path):
    """Planted contract for the per-source calibration: ranks are the
    (score DESC, doc_id) total order WITHIN each source, calib_ppm is
    the exact integer percentile ((rank-1)*1e6 DIV (n-1)), a
    single-doc source pins to 0, and ties break on doc_id."""
    from mknssh_11_bigdata_spark.queries_curation import (
        quality_source_calibrated,
    )

    def text(n_distinct):
        toks = [f"w{i}" for i in range(n_distinct)] + ["w0"] * (
            10 - n_distinct
        )
        return " ".join(toks)

    rows = [
        (0, "a", text(10)),  # a: rank 1 -> calib 0
        (1, "a", text(5)),   # a: rank 2 -> calib 500000
        (2, "a", text(1)),   # a: rank 3 -> calib 1000000
        (3, "b", text(7)),   # b: tie on score with doc 4 ...
        (4, "b", text(7)),   # ... broken by doc_id: 3 -> rank 1
        (5, "c", text(4)),   # singleton source -> calib 0
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["src_rank"], r["calib_ppm"])
        for r in quality_source_calibrated(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (1, 0),
        1: (2, 500000),
        2: (3, 1000000),
        3: (1, 0),
        4: (2, 1000000),
        5: (1, 0),
    }


def test_capped_budget_selection_both_constraints_bind(spark, tmp_path):
    """Planted contract for the two-stage cut: the per-source cap
    truncates every source to its best doc (stage 1), then the global
    budget keeps only the best capped docs (stage 2) — partially
    capped AND budget-rejected sources both report honest profiles."""
    from mknssh_11_bigdata_spark.queries_curation import (
        BUDGET_DIV,
        SRC_CAP_DIV,
        curation_capped_budget_selection,
    )

    def text(n_distinct):
        toks = [f"w{i}" for i in range(n_distinct)] + ["w0"] * (
            10 - n_distinct
        )
        return " ".join(toks)

    # 16 sources x 2 docs x 10 tokens = 320 total
    # budget = 320//4 = 80; src_cap = 80//8 = 10 => ONE doc per source
    # best docs: sources 0-7 score 1e6 (ids 0..7), sources 8-15 score
    # 5e5 (ids 8..15); second docs score 1e5 (ids 16+i).
    rows = []
    for i in range(16):
        src = f"s{i:02d}"
        rows.append((i, src, text(10 if i < 8 else 5)))
        rows.append((16 + i, src, text(1)))
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r["source"]: (
            r["n_docs"],
            r["total_tokens"],
            r["n_pool"],
            r["n_selected"],
            r["selected_tokens"],
        )
        for r in curation_capped_budget_selection(
            spark, str(tmp_path)
        ).collect()
    }
    # stage 1: every source pools exactly its best doc (cap 10 tokens);
    # stage 2: global cum of the 8 score-1e6 docs reaches exactly 80
    # (inclusive boundary) — the score-5e5 pool docs are rejected.
    for i in range(16):
        src = f"s{i:02d}"
        if i < 8:
            assert got[src] == (2, 20, 1, 1, 10), (src, got[src])
        else:
            assert got[src] == (2, 20, 1, 0, 0), (src, got[src])
    assert BUDGET_DIV == 4 and SRC_CAP_DIV == 8  # the planted arithmetic
