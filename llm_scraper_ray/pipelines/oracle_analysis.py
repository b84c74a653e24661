"""Sequential oracles for the page-analysis pipelines — persisted expected
tables (the ``pipelines/oracle.py`` pattern applied to E8 / M4 / M6 / M9).

Each function reproduces the reference's SEQUENTIAL orchestration — a plain
per-page / per-claim loop over per-record kernel methods, no batching, no
actor pools, no joins — and persists the expected output to Parquet so the
distributed engine's equality is a green, hash-checked CORRECTNESS row.

Bump ``ANALYSIS_ORACLE_VERSION`` when any covered kernel's semantics change.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ANALYSIS_ORACLE_VERSION = 1


def _cache_path(sf_dir: str, name: str) -> str:
    from ..sources.pages import GEN_VERSION

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    os.makedirs(base, exist_ok=True)
    return os.path.join(
        base, f"expected-{name}-{tag}-g{GEN_VERSION}-a{ANALYSIS_ORACLE_VERSION}.parquet"
    )


def _pages_table(sf_dir: str) -> pa.Table:
    import pyarrow.dataset as pads

    from ..sources.pages import generate_corpus

    corpus = generate_corpus(sf_dir)
    return pads.dataset(corpus.pages_dir, format="parquet").to_table(
        columns=["url_hash", "html"]
    )


def _write(path: str, df: pd.DataFrame) -> str:
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


def persist_expected_cascade(sf_dir: str, config: dict) -> str:
    """E8 — per page, the 3-tier fallback decided sequentially
    (``crawl4ai_extraction.py:99-184``'s own loop shape)."""
    path = _cache_path(sf_dir, "cascade")
    if os.path.exists(path):
        return path
    from .evalpr import CascadeExtract

    ex = CascadeExtract(config)
    rows = []
    t = _pages_table(sf_dir)
    for h, html in zip(t["url_hash"].to_pylist(), t["html"].to_pylist()):
        name, n, tier = ex.extract_one(bytes(html))
        rows.append((h.hex(), name, n, tier))
    return _write(
        path, pd.DataFrame(rows, columns=["url_hash", "product_name", "n_fields", "tier"])
    )


def persist_expected_image_entities(sf_dir: str) -> str:
    """M4/A3 — per page, classify each image, summarize+NER only DETAILED
    ones, union with the text path's NER (``image_analysis.py:19-160``'s
    sequential loop)."""
    path = _cache_path(sf_dir, "imageents")
    if os.path.exists(path):
        return path
    from ..functions.content import image_refs
    from ..functions.html_text import extract_text
    from ..stages.llmshim import (
        EntityExtractor,
        ImageClassifier,
        ImageSummarizerNER,
        _stable_unit,
    )

    ner = EntityExtractor()
    summ = ImageSummarizerNER()
    rows = []
    t = _pages_table(sf_dir)
    for h, html in zip(t["url_hash"].to_pylist(), t["html"].to_pylist()):
        raw = bytes(html)
        ents = set(ner.extract(extract_text(raw)))
        for src, alt in image_refs(raw):
            cls = ImageClassifier.CLASSES[int(_stable_unit(src, "imgcls") * 3)]
            if cls == "DETAILED":
                ents |= set(ner.extract(summ.summarize(alt)))
        rows.extend((h.hex(), e) for e in ents)
    return _write(path, pd.DataFrame(rows, columns=["url_hash", "entity"]))


def persist_expected_pr_macro(sf_dir: str, threshold: float = 90.0) -> str:
    """M9/A5 — macro P/R/F1 as one sequential pass over the documents
    (``precision_recall.py:495-518``'s global averaging)."""
    path = _cache_path(sf_dir, "prmacro")
    if os.path.exists(path):
        return path
    from .evalpr import PrecisionRecallEval

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ev = PrecisionRecallEval(threshold=threshold)
    ps, rs, f1s = [], [], []
    for d, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        _, _, p, r, f1 = ev.eval_one(f"doc{d:08d}", text)
        ps.append(p)
        rs.append(r)
        f1s.append(f1)
    n = len(ps)
    macro = pd.DataFrame(
        [
            {
                "n_urls": n,
                "macro_precision": round(sum(ps) / n, 4),
                "macro_recall": round(sum(rs) / n, 4),
                "macro_f1": round(sum(f1s) / n, 4),
            }
        ]
    )
    return _write(path, macro)


def persist_expected_judgments(sf_dir: str, gate_keywords: tuple[str, ...]) -> str:
    """M6 — the judge panel's vote merge per triplet claim, sequentially
    over the sequential triplet oracle's rows (``mult_validation.py:81-254``)."""
    path = _cache_path(sf_dir, "judgments")
    if os.path.exists(path):
        return path
    from ..stages.llmshim import JudgePanel
    from .oracle_triplets import persist_expected_triplets

    trips = pq.read_table(persist_expected_triplets(sf_dir, gate_keywords))
    panel = JudgePanel()
    rows = []
    for s, p, o in zip(
        trips["subj_name"].to_pylist(),
        trips["pred"].to_pylist(),
        trips["obj_name"].to_pylist(),
    ):
        claim = f"{s} {p} {o}"
        votes = [panel.judge_one(j, claim) for j in panel.JUDGES]
        n_yes = sum(v for v, _ in votes)
        rows.append(
            (
                claim,
                n_yes * 2 > len(votes),
                round(sum(c for _, c in votes) / len(votes), 4),
            )
        )
    return _write(path, pd.DataFrame(rows, columns=["claim", "is_correct", "confidence"]))
