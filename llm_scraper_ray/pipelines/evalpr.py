"""Evaluation + fallback-extraction pipelines.

Two reference pipelines the round-1 build left unwired:

  - **precision/recall/F1 eval** (M9 + A5): the reference's
    ``precision_recall.py`` judges generated triplets against the user's
    input triplet file per URL (precision ``:78-185``, fuzzy fallback
    ``:334-348``), estimates recall from the matched share of the inputs
    (``:187-311``) and macro-averages P/R/F1 across URLs (``:495-518``).
    Here: an actor-pool stage computes per-URL P/R/F1 (judge state in
    ``__init__``) with the "input triplets" materialized through the
    LEGACY raw-line format and its E16/E17 parser — the ingestion path a
    reference user actually has on disk — then a global Mean aggregate
    produces the macro row.

  - **3-tier fallback extraction cascade** (E8): the reference's
    ``crawl4ai_extraction.py:99-184`` tries the declarative CSS schema,
    falls back to the browser+manual parser on empty results, then to the
    LLM. The reference decides the fallback PER PAGE, so the cascade fuses
    into one actor-pool pass (CascadeExtract): each row falls through the
    tiers inside its batch — no failure-set broadcast, no corpus re-reads,
    no driver materialization between tiers.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Mean

from ..functions.triplets import Triplet
from ..sources.legacy import read_raw_triplet_lines
from ..stages.llmshim import EntityExtractor, PrecisionRecallJudge, TripletGenerator

# ---------------------------------------------------------------------------
# M9/A5 — precision / recall / F1


class PrecisionRecallEval:
    """Per-URL P/R/F1 actor (judge + generator state once per worker).

    The "input" (reference) triplet set per URL stands in for the user's
    existing validated-triplet file: the generator over a narrowed entity
    view, rendered to the reference's raw line format
    ``"(triplet) weight url datetime"`` (``scrape_eccomerce.py:285``) and
    re-parsed through ``read_raw_triplet_lines`` — so the eval exercises
    the same ingestion surface the reference's eval does."""

    def __init__(self, threshold: float = 70.0, ref_entities: int = 3):
        self.judge = PrecisionRecallJudge(threshold)
        self.ner = EntityExtractor()
        self.gen = TripletGenerator()
        self.ref_entities = ref_entities

    def eval_one(self, url: str, text: str) -> tuple[int, int, float, float, float]:
        ents = self.ner.extract(text)
        generated = self.gen.generate(ents)
        refs = self.gen.generate(ents[: 1 + self.ref_entities])
        if ents:
            # one input triplet the generator never emits (a 'regulation'
            # edge) → recall < 1: the eval measures something real
            refs.append(
                (("device", ents[0]), "follows", ("regulation", "Iso27001Policy"))
            )
        lines = [
            f"{t!r} 50.0 https://legacy.example/{url} 2024-01-01 00:00:00"
            for t in refs
        ]
        parsed = read_raw_triplet_lines(lines)
        reference: list[Triplet] = [
            ((st, sn), p, (ot, on))
            for st, sn, p, ot, on in zip(
                parsed["subj_type"].to_pylist(),
                parsed["subj_name"].to_pylist(),
                parsed["pred"].to_pylist(),
                parsed["obj_type"].to_pylist(),
                parsed["obj_name"].to_pylist(),
            )
        ]
        # precision: matched generated / |generated| (precision_recall.py:176-177)
        # recall estimate: matched inputs / |inputs|    (:301-303)
        p = self.judge.precision(generated, reference)
        r = self.judge.precision(reference, generated)
        f1 = round(2 * p * r / (p + r), 4) if (p + r) else 0.0
        return len(generated), len(reference), p, r, f1

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        rows = [self.eval_one(u, t) for u, t in zip(batch["url_hash"], batch["text"])]
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(batch["url_hash"], pa.string()),
                "n_gen": pa.array([r[0] for r in rows], pa.int64()),
                "n_ref": pa.array([r[1] for r in rows], pa.int64()),
                "precision": pa.array([r[2] for r in rows], pa.float64()),
                "recall": pa.array([r[3] for r in rows], pa.float64()),
                "f1": pa.array([r[4] for r in rows], pa.float64()),
            }
        )


def precision_recall_eval(
    docs: rd.Dataset, concurrency: int = 2, threshold: float = 70.0
) -> pd.DataFrame:
    """docs (url_hash, text) → one macro row (A5 global averages,
    ``precision_recall.py:495-518``): per-URL scores stream through the
    actor pool; only the Mean partials cross the wire."""
    out = (
        docs.map_batches(
            PrecisionRecallEval,
            fn_constructor_kwargs={"threshold": threshold},
            concurrency=concurrency,
            batch_size=256,
            batch_format="pandas",
            num_cpus=0.25,
        )
        .aggregate(
            Count(alias_name="n_urls"),
            Mean("precision", alias_name="macro_precision"),
            Mean("recall", alias_name="macro_recall"),
            Mean("f1", alias_name="macro_f1"),
        )
    )
    df = pd.DataFrame([out])
    for c in ("macro_precision", "macro_recall", "macro_f1"):
        df[c] = df[c].round(4)
    return df[["n_urls", "macro_precision", "macro_recall", "macro_f1"]]


# ---------------------------------------------------------------------------
# E8 — 3-tier fallback extraction cascade


class CascadeExtract:
    """The whole schema → module → LLM cascade as ONE actor (all three
    tiers' state built once per worker in ``__init__``). The reference's
    fallback is decided per page (``crawl4ai_extraction.py:99-184`` tries
    the next strategy on the page that failed), so the routing never needs
    to leave the batch: each row runs tier 1, falls to tier 2 only on
    empty fields, to tier 3 only when the module parse is empty too.

    One pass over the pages corpus — no failure-set broadcast, no
    re-reads, no driver materialization (round 2's shape collected every
    tier's output on the driver and broadcast failed url_hash sets; at
    unbounded tier-1 failure mass that was neither driver- nor
    object-store-safe)."""

    def __init__(self, config: dict, module_name: str = "generic"):
        from ..functions.content import MODULES

        self.config = config          # tier 1: declarative selector schema
        self.module = MODULES[module_name]  # tier 2: host-module parser
        self.ner = EntityExtractor()  # tier 3: LLM-shim last resort

    def extract_one(self, raw: bytes) -> tuple[str, int, str]:
        import ast

        from ..functions.dom import parse_dom
        from ..functions.fields import extract_fields
        from ..functions.fuzzy import deduplicate_fields
        from ..functions.html_text import extract_text

        # tier 1 — E2/E8 schema path (crawl4ai_extraction.py:19-48)
        fields = deduplicate_fields(extract_fields(raw, self.config))
        if fields:
            return fields.get("product_name", ""), len(fields), "schema"
        # tier 2 — host-module content parser (E4/E5 fallback, :135-158)
        text, _ = self.module.parse_products(parse_dom(raw))
        product = ast.literal_eval(text)
        n = sum(1 for v in product.values() if v)
        if n:
            return product.get("name") or "", n, "module"
        # tier 3 — LLM shim over the cleaned text (:160-184)
        ents = self.ner.extract(extract_text(raw))
        return (ents[0] if ents else ""), (1 if ents else 0), "llm"

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self.extract_one(bytes(h.as_py())) for h in batch["html"]]
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(
                    [h.as_py().hex() for h in batch["url_hash"]], pa.string()
                ),
                "product_name": pa.array([r[0] for r in rows], pa.string()),
                "n_fields": pa.array([r[1] for r in rows], pa.int64()),
                "tier": pa.array([r[2] for r in rows], pa.string()),
            }
        )


def extract_cascade(pages_dir: str, config: dict, concurrency: int = 2) -> pd.DataFrame:
    """schema → module → LLM fallback cascade, fused into one actor-pool
    pass (see CascadeExtract). Output: one row per page with the winning
    tier; only the final per-page result rows are collected."""
    out = (
        rd.read_parquet(pages_dir, columns=["url_hash", "html"])
        .map_batches(
            CascadeExtract,
            fn_constructor_kwargs={"config": config},
            concurrency=concurrency,
            batch_size=256,
            batch_format="pyarrow",
            num_cpus=0.25,
        )
        .to_pandas()
    )
    return out.sort_values("url_hash").reset_index(drop=True)
