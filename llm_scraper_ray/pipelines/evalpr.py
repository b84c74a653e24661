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
    LLM. Here: tier-1 schema extraction over every page, then each
    fallback tier re-reads ONLY the failed pages (failure-mass-bounded
    broadcast semi-join) — the filter+union two-pass shape.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
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


class SchemaTier:
    """Tier 1 — declarative selector-config extraction (E2/E8 schema path,
    ``crawl4ai_extraction.py:19-48``)."""

    def __init__(self, config: dict):
        self.config = config

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.fields import extract_fields
        from ..functions.fuzzy import deduplicate_fields

        out = {"url_hash": [], "product_name": [], "n_fields": []}
        for h, html in zip(batch["url_hash"], batch["html"]):
            fields = deduplicate_fields(extract_fields(bytes(html.as_py()), self.config))
            out["url_hash"].append(h.as_py().hex())
            out["product_name"].append(fields.get("product_name", ""))
            out["n_fields"].append(len(fields))
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(out["url_hash"], pa.string()),
                "product_name": pa.array(out["product_name"], pa.string()),
                "n_fields": pa.array(out["n_fields"], pa.int64()),
            }
        )


class ModuleTier:
    """Tier 2 — host-module content parser (E4/E5 fallback,
    ``crawl4ai_extraction.py:135-158``'s manual-extraction arm; module
    registry dispatch per SURVEY.md §2.10)."""

    def __init__(self, module_name: str = "generic"):
        from ..functions.content import MODULES

        self.module = MODULES[module_name]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ast

        from ..functions.dom import parse_dom

        out = {"url_hash": [], "product_name": [], "n_fields": []}
        for h, html in zip(batch["url_hash"], batch["html"]):
            text, _ = self.module.parse_products(parse_dom(bytes(html.as_py())))
            product = ast.literal_eval(text)
            out["url_hash"].append(h.as_py().hex())
            out["product_name"].append(product.get("name") or "")
            out["n_fields"].append(sum(1 for v in product.values() if v))
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(out["url_hash"], pa.string()),
                "product_name": pa.array(out["product_name"], pa.string()),
                "n_fields": pa.array(out["n_fields"], pa.int64()),
            }
        )


class LLMTier:
    """Tier 3 — LLM-shim extraction over the cleaned text (the reference's
    last-resort ``LLMExtractionStrategy``, ``crawl4ai_extraction.py:160-184``)."""

    def __init__(self):
        self.ner = EntityExtractor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.html_text import extract_text

        out = {"url_hash": [], "product_name": [], "n_fields": []}
        for h, html in zip(batch["url_hash"], batch["html"]):
            ents = self.ner.extract(extract_text(bytes(html.as_py())))
            out["url_hash"].append(h.as_py().hex())
            out["product_name"].append(ents[0] if ents else "")
            out["n_fields"].append(1 if ents else 0)
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(out["url_hash"], pa.string()),
                "product_name": pa.array(out["product_name"], pa.string()),
                "n_fields": pa.array(out["n_fields"], pa.int64()),
            }
        )


def _tag_tier(ds: rd.Dataset, tier: str) -> rd.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        return t.append_column("tier", pa.array([tier] * t.num_rows, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_cascade(pages_dir: str, config: dict, concurrency: int = 2) -> pd.DataFrame:
    """schema → module → LLM fallback cascade as filter+union passes.

    Every page runs tier 1; each fallback pass re-reads ONLY the pages the
    previous tier failed on (broadcast semi-filter on the failed url_hash
    set — failure-mass-bounded, never the corpus). Output: one row per
    page with the winning tier."""
    kw = dict(concurrency=concurrency, batch_size=256, batch_format="pyarrow", num_cpus=0.25)

    t1 = rd.read_parquet(pages_dir, columns=["url_hash", "html"]).map_batches(
        SchemaTier, fn_constructor_kwargs={"config": config}, **kw
    ).materialize()
    ok1 = _tag_tier(t1.filter(expr="n_fields > 0"), "schema")
    miss1 = set(
        pd.concat(
            [b["url_hash"] for b in t1.filter(expr="n_fields == 0").iter_batches(batch_format="pandas")]
            or [pd.Series([], dtype="object")]
        )
    )
    if not miss1:
        out = ok1.to_pandas()
        return out.sort_values("url_hash").reset_index(drop=True)

    miss1_ref = ray.put(miss1)

    def only_missed(ref):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            failed = ray.get(ref)
            hexes = pa.array([h.hex() for h in t["url_hash"].to_pylist()], pa.string())
            return t.filter(pc.is_in(hexes, value_set=pa.array(sorted(failed), pa.string())))

        return fn

    pages2 = rd.read_parquet(pages_dir, columns=["url_hash", "html"]).map_batches(
        only_missed(miss1_ref), batch_format="pyarrow"
    )
    t2 = pages2.map_batches(ModuleTier, **kw).materialize()
    ok2 = _tag_tier(t2.filter(expr="n_fields > 0"), "module")
    miss2 = set(
        pd.concat(
            [b["url_hash"] for b in t2.filter(expr="n_fields == 0").iter_batches(batch_format="pandas")]
            or [pd.Series([], dtype="object")]
        )
    )

    parts = [ok1.to_pandas(), ok2.to_pandas()]
    if miss2:
        miss2_ref = ray.put(miss2)
        pages3 = rd.read_parquet(pages_dir, columns=["url_hash", "html"]).map_batches(
            only_missed(miss2_ref), batch_format="pyarrow"
        )
        t3 = _tag_tier(pages3.map_batches(LLMTier, **kw), "llm")
        parts.append(t3.to_pandas())

    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("url_hash").reset_index(drop=True)
