"""Word-statistics operators on a NON-degenerate vocabulary.

The driver's synthetic documents table has a 31-word vocabulary (CLAUDE.md),
so the vocab / BM25 / tf-idf / entropy family's provable per-bucket cuts
(per-bucket top-K ⊇ global top-K because a word is whole within its hash
bucket) are never exercised under real frequency competition there. This
fixture builds a deterministic Zipf-distributed corpus with a few thousand
distinct words and hash-gates every word-stat query against its own oracle
SQL on that corpus — the same strict compare scripts/check_queries.py uses.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

RICH_DIR = "/tmp/llmsr_richdocs_v1"
N_DOCS = 1200
VOCAB = 3000
SOURCES = 7

# queries whose decided quantity is a corpus-frequency statistic
WORD_STAT_QUERIES = [
    "vocab_top_terms",
    "vocab_top_terms_by_source",
    "vocab_bpe_pairs",
    "doc_unigram_scores",
    "doc_rarest_term",
    "doc_tfidf_top_terms",
    "doc_bigram_scores",
    "source_divergence",
    "doc_bm25_topk",
    "doc_search_terms",
    # MG sketch trimming is a no-op on a 31-word vocab — the rich corpus
    # is where the sketch→candidates→exact-recount guarantee is exercised
    "vocab_heavy_hitters",
]


@pytest.fixture(scope="module")
def rich_dir():
    path = os.path.join(RICH_DIR, "documents.parquet")
    if not os.path.exists(path):
        os.makedirs(RICH_DIR, exist_ok=True)
        rng = np.random.RandomState(1234)
        # Zipf-ranked vocabulary: wNNNN tokens plus a handful of real words
        # so the BM25/search-term queries' fixed probe terms still hit.
        # includes curation.SEARCH_TERMS and the BM25/probe terms so the
        # retrieval queries return non-empty results on this corpus;
        # synthetic words must be PURELY alphabetic — the '[a-z'']+'
        # tokenizer both sides use would split digits out of "w0042"
        probes = ["query", "vector", "stream", "data", "index", "spark", "window"]

        def b26(i: int) -> str:
            s = ""
            for _ in range(4):
                s += chr(ord("a") + i % 26)
                i //= 26
            return "x" + s  # prefix keeps them disjoint from the probes

        words = np.array(probes + [b26(i) for i in range(VOCAB - len(probes))])
        ranks = np.arange(1, VOCAB + 1, dtype=np.float64)
        p = (1.0 / ranks) / (1.0 / ranks).sum()
        texts = []
        for _ in range(N_DOCS):
            n = int(rng.randint(40, 160))
            texts.append(" ".join(words[rng.choice(VOCAB, size=n, p=p)]))
        df = pd.DataFrame(
            {
                "doc_id": np.arange(N_DOCS, dtype=np.int64),
                "text": texts,
                "lang": ["en"] * N_DOCS,
                "source": [f"src{i % SOURCES}" for i in range(N_DOCS)],
            }
        )
        df["n_chars"] = df["text"].str.len().astype(np.int64)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return RICH_DIR


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    return df


@pytest.mark.parametrize("name", WORD_STAT_QUERIES)
def test_word_stat_query_hash_matches_on_rich_vocab(ray_session, rich_dir, name):
    from llm_scraper_ray.pipelines.queries import all_oracle_sql, all_queries

    got = all_queries()[name](rich_dir)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{rich_dir}/documents.parquet')"
    )
    want = con.sql(all_oracle_sql()[name]).df()
    g, w = _norm(got), _norm(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w), f"{name}: rows {len(g)} != {len(w)}"
    assert [g[c].dtype.kind for c in g.columns] == [
        w[c].dtype.kind for c in w.columns
    ], f"{name}: dtype kind drift"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)


def test_bpe_train_matches_sequential_oracle_on_rich_vocab(ray_session, rich_dir):
    """The iterative BPE trainer's distributed rounds (bucket-grouped pair
    partials, per-bucket provable top-1 cut, closure-broadcast merge) must
    reproduce the sequential dict trainer merge-for-merge on a corpus with
    real pair-frequency competition."""
    from llm_scraper_ray.pipelines.curation import BPE_MERGES, q_vocab_bpe_train
    from llm_scraper_ray.pipelines.oracle_analysis import persist_expected_bpe

    got = q_vocab_bpe_train(rich_dir)
    want = pd.read_parquet(persist_expected_bpe(rich_dir, BPE_MERGES))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_bpe_encode_matches_sequential_oracle_on_rich_vocab(ray_session, rich_dir):
    """Tokenizer APPLICATION: the actor-pool encoder with the in-engine
    merge table must reproduce the sequential encode (sequentially-trained
    table) token-stream-for-token-stream (crc32-pinned), and token counts
    must be bounded by character counts and shrink vs no-merge encoding."""
    from llm_scraper_ray.pipelines.curation import BPE_MERGES
    from llm_scraper_ray.pipelines.oracle_analysis import persist_expected_bpe_encode
    from llm_scraper_ray.pipelines.queries import all_queries

    got = all_queries()["doc_bpe_encode"](rich_dir)
    want = pd.read_parquet(persist_expected_bpe_encode(rich_dir, BPE_MERGES))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
    docs = pd.read_parquet(os.path.join(rich_dir, "documents.parquet"))
    merged = got.merge(docs[["doc_id", "n_chars"]], on="doc_id")
    assert (merged["n_tokens_bpe_trained"] <= merged["n_chars"]).all()
    # with BPE_MERGES > 0 the trained table must actually compress: fewer
    # tokens than the character-level (no-merge) encoding for most docs
    char_level = docs["text"].str.count(r"[a-zA-Z']").astype("int64")
    assert (got["n_tokens_bpe_trained"].to_numpy() < char_level.to_numpy()).mean() > 0.9
