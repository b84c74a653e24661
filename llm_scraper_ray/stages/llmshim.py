"""Deterministic stand-ins for the reference's model stages (SURVEY.md §2.4).

The reference's M1–M12 stages call LLMs through Ollama with up to 3 retries
and accept whatever parses (``analysis/entity_analysis.py:31-50``) — their
outputs are nondeterministic by construction, so this engine reproduces the
*stage shapes* (stateful actor pools: prompt/model/config loaded once in
``__init__``, batches scored in ``__call__``; SURVEY.md §2.4 mapping column)
with deterministic, testable logic. Swapping a shim's body for a real model
client changes nothing about the pipeline: the Arrow schemas and the actor
contract are the product here.

Every shim accepts ``prompt``-style constructor state mirroring the
reference CLI (``main.py:62-67`` loads prompts per site type — S4).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.fuzzy import partial_ratio
from ..functions.textnorm import (
    normalize_alnum,
    remove_think_tags,
    split_camel_case,
    split_sentences,
)
from ..functions.triplets import (
    Triplet,
    camelize_quoted_phrases,
    format_triplet,
    parse_triplets,
)

_CAP_PHRASE = re.compile(r"\b([A-Z][a-zA-Z0-9]+(?:\s+[A-Z][a-zA-Z0-9]+){0,3})\b")
_IOT_KEYWORDS = (
    "sensor", "smart", "camera", "device", "hub", "thermostat", "wifi",
    "bluetooth", "monitor", "tracker", "speaker", "bulb",
)


def _stable_unit(s: str, salt: str = "") -> float:
    """Deterministic pseudo-random in [0,1) from content (NOT RNG — replays
    identically on any worker)."""
    h = hashlib.blake2b((salt + s).encode(), digest_size=8).digest()
    return int.from_bytes(h, "little") / 2**64


class EntityExtractor:
    """M1 — NER stage shape (``analysis/entity_analysis.py:21-85``).

    Deterministic heuristic: capitalized phrases, deduped first-wins,
    think-tag scrubbing applied as in the reference's response path."""

    def __init__(self, prompt: str = "", max_entities: int = 16):
        self.prompt = prompt
        self.max_entities = max_entities

    _WORD = re.compile(r"[a-z]{3,}")
    _STOP = frozenset("the and for with from this that are was".split())

    def extract(self, text: str) -> list[str]:
        text = remove_think_tags(text)
        seen: dict[str, None] = {}
        for m in _CAP_PHRASE.findall(text):
            for article in ("The ", "A ", "An "):
                if m.startswith(article):
                    m = m[len(article):]
                    break
            if len(m) > 2 and m not in seen:
                seen[m] = None
            if len(seen) >= self.max_entities:
                break
        if not seen:
            # lowercase corpora: fall back to the most frequent salient
            # terms, Title-cased — deterministic stand-in for what a model
            # NER still returns on case-less text
            counts: dict[str, int] = {}
            for w in self._WORD.findall(text.lower()):
                if w not in self._STOP:
                    counts[w] = counts.get(w, 0) + 1
            top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for w, _ in top[: min(6, self.max_entities)]:
                seen[w.title()] = None
        return list(seen)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        entities = [self.extract(t) for t in batch["text"]]
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(batch["url_hash"], pa.string()),
                "text": pa.array(batch["text"], pa.string()),
                "entities": pa.array(entities, pa.list_(pa.string())),
            }
        )


class TripletGenerator:
    """M2 — triplet-generation stage shape
    (``analysis/relationship_analysis.py:24-86``). Emits triplet SYNTAX and
    re-parses it through the reference grammar (E17) — the parse path is the
    real artifact, the generation rule is a deterministic stand-in."""

    def __init__(self, prompt: str = ""):
        self.prompt = prompt

    def generate(self, entities: list[str]) -> list[Triplet]:
        if not entities:
            return []
        subject = entities[0]
        lines = []
        for obj in entities[1:5]:
            if obj.endswith("Corp"):
                pred, otype = "manufacturedBy", "manufacturer"
            elif any(k in obj.lower() for k in ("sensor", "camera", "monitor")):
                pred, otype = "hasSensor", "sensor"
            else:
                pred, otype = "compatibleWith", "device"
            lines.append(f"(('device', '{subject}'), '{pred}', ('{otype}', '{obj}'))")
        # E15 step 2 (``response_cleaner.py:48-51``): quoted multi-word
        # entities camelize before the grammar parse — the reference's
        # validated-triplet files carry CamelCase entity names throughout
        return parse_triplets(camelize_quoted_phrases("\n".join(lines)))

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        out = {
            "url_hash": [], "subj_type": [], "subj_name": [], "pred": [],
            "obj_type": [], "obj_name": [],
        }
        for h, ents in zip(batch["url_hash"], batch["entities"]):
            for (st, sn), p, (ot, on) in self.generate(list(ents)):
                out["url_hash"].append(h)
                out["subj_type"].append(st)
                out["subj_name"].append(sn)
                out["pred"].append(p)
                out["obj_type"].append(ot)
                out["obj_name"].append(on)
        return pa.Table.from_pydict({k: pa.array(v, pa.string()) for k, v in out.items()})


class IoTClassifier:
    """M3 — binary IOT/NOT-IOT flag (``analysis/iot_classification.py:14-81``);
    keyword rule instead of the few-shot model, suffix-match answer shape,
    default False preserved."""

    def __init__(self, prompt: str = "", keywords: tuple[str, ...] | None = None):
        self.keywords = keywords or _IOT_KEYWORDS

    def classify(self, product_name: str) -> bool:
        name = product_name.lower()
        return any(k in name for k in self.keywords)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["is_iot"] = [self.classify(t) for t in batch["text"]]
        return batch


class ImageAnalysisStub:
    """M4 — 3-way UNRENDERED/LOGO/DETAILED image classify + summarize
    (``analysis/image_analysis.py:19-160``), flattened to one stage. Real
    decode is impossible here (no vision model): class is derived from the
    payload hash, DETAILED summaries from the alt text."""

    CLASSES = ("UNRENDERED", "LOGO", "DETAILED")

    def __init__(self):
        self.ner = EntityExtractor()

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        cls, ents = [], []
        for src, alt in zip(batch["image_src"], batch["alt_text"]):
            c = self.CLASSES[int(_stable_unit(src, "imgcls") * 3)]
            cls.append(c)
            ents.append(self.ner.extract(alt) if c == "DETAILED" else [])
        return pa.Table.from_pydict(
            {
                "image_src": pa.array(batch["image_src"], pa.string()),
                "img_class": pa.array(cls, pa.string()),
                "entities": pa.array(ents, pa.list_(pa.string())),
            }
        )


class ImageClassifier:
    """M4 stage 1 — the 3-way UNRENDERED/LOGO/DETAILED classify
    (``image_analysis.py:40-105``; retry exhaustion falls back to
    UNRENDERED deterministically). Class derives from the image src hash —
    the same kernel ImageAnalysisStub flattens — so the composed chain and
    the flattened stub stay comparable."""

    CLASSES = ImageAnalysisStub.CLASSES

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        cls = [
            self.CLASSES[int(_stable_unit(src, "imgcls") * 3)]
            for src in batch["image_src"]
        ]
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(batch["url_hash"], pa.string()),
                "image_src": pa.array(batch["image_src"], pa.string()),
                "alt_text": pa.array(batch["alt_text"], pa.string()),
                "img_class": pa.array(cls, pa.string()),
            }
        )


class ImageSummarizerNER:
    """M4 stage 2 — the CONDITIONAL second model pass: summarize the
    DETAILED image then NER the summary (``image_analysis.py:107-121``
    calling ``summarize`` :126-167 then ``analyze_text_elements``). The
    summary derives from the alt text (no vision model); the prefix is
    lowercase so it never injects capitalized pseudo-entities."""

    def __init__(self):
        self.ner = EntityExtractor()

    def summarize(self, alt_text: str) -> str:
        return f"a detailed image showing {alt_text}"

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        summaries = [self.summarize(a) for a in batch["alt_text"]]
        return pa.Table.from_pydict(
            {
                "url_hash": pa.array(batch["url_hash"], pa.string()),
                "image_src": pa.array(batch["image_src"], pa.string()),
                "summary": pa.array(summaries, pa.string()),
                "entities": pa.array(
                    [self.ner.extract(s) for s in summaries], pa.list_(pa.string())
                ),
            }
        )


class NLIScorer:
    """M5 — per-sentence entailment vs query, max-aggregated
    (``llm_validation_playwright.py:19-20,65-107``). BART-MNLI replaced by a
    deterministic lexical-overlap score; the weights-in-__init__ /
    score-per-batch actor contract is identical."""

    def __init__(self):
        self.word = re.compile(r"[a-z0-9']+")

    def entailment(self, premise: str, hypothesis: str) -> float:
        p = set(self.word.findall(premise.lower()))
        h = set(self.word.findall(hypothesis.lower()))
        if not h:
            return 0.0
        return len(p & h) / len(h)

    def score(self, text: str, query: str) -> float:
        best = 0.0
        for sent in split_sentences(text):
            best = max(best, self.entailment(sent, query))
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["nli_score"] = [
            round(100 * self.score(t, q), 2) for t, q in zip(batch["text"], batch["query"])
        ]
        return batch


class SearchCountValidator:
    """M7 — search-count weight stub (``search_validation_playwright.py:27-83``):
    weight = normal/(normal+opposing); counts are content-hash-derived
    (browser sessions are not reproducible, the weighting math is)."""

    def counts(self, phrase: str) -> int:
        return int(_stable_unit(phrase, "serp") * 1_000_000)

    def weight(self, triplet: Triplet) -> float | None:
        variants = format_triplet(triplet)
        if not variants:
            return None
        normal = max(self.counts(v) for v in variants)
        opposing = max(self.counts(v + " not") for v in variants)
        if normal + opposing == 0:
            return 0.0
        return round(100.0 * normal / (normal + opposing), 4)


class ValidationCascade:
    """M8 — search-validation, else NLI-validation, thresholds at 50
    (``validation_pipeline.py:7-29``)."""

    def __init__(self):
        self.search = SearchCountValidator()
        self.nli = NLIScorer()

    def validate(self, triplet: Triplet, source_text: str) -> tuple[float, str]:
        w = self.search.weight(triplet)
        if w is not None and w >= 50.0:
            return w, "search"
        (st, sn), p, (ot, on) = triplet
        # E12 (``precision_recall.py:60-72``): entity names arrive
        # camelized from the E15 generation chain — split them back apart
        # so the NLI query's tokens can match the spaced source text
        query = f"{split_camel_case(sn)} {p} {split_camel_case(on)}"
        nli = round(100 * self.nli.score(source_text, query), 4)
        return nli, "nli"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        weights, methods = [], []
        for row in batch.itertuples(index=False):
            trip = ((row.subj_type, row.subj_name), row.pred, (row.obj_type, row.obj_name))
            w, m = self.validate(trip, getattr(row, "text", ""))
            weights.append(w)
            methods.append(m)
        batch = batch.copy()
        batch["weight"] = weights
        batch["method"] = methods
        return batch


class JudgePanel:
    """M6 — multi-LLM judge panel + vote merge
    (``validation/mult_validation.py:81-254``): N judges emit
    {isCorrect, confidence}; merged verdict = majority, mean confidence."""

    JUDGES = ("gemma3", "qwq", "llama3", "deepseek")

    def judge_one(self, judge: str, claim: str) -> tuple[bool, float]:
        u = _stable_unit(claim, judge)
        return u >= 0.35, round(0.5 + u / 2, 4)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        verdicts, confidences = [], []
        for claim in batch["claim"]:
            votes = [self.judge_one(j, claim) for j in self.JUDGES]
            n_yes = sum(v for v, _ in votes)
            verdicts.append(n_yes * 2 > len(votes))
            confidences.append(round(sum(c for _, c in votes) / len(votes), 4))
        batch = batch.copy()
        batch["is_correct"] = verdicts
        batch["confidence"] = confidences
        return batch


class PrecisionRecallJudge:
    """M9 — fuzzy precision judge (``precision_recall.py:334-348``): a
    generated triplet counts as matched when its normalized rendering has
    partial_ratio ≥ 70 against any input triplet (the reference's
    non-LLM fallback, threshold 60 at eval time — both exposed)."""

    def __init__(self, threshold: float = 70.0):
        self.threshold = threshold

    @staticmethod
    def render(t: Triplet) -> str:
        (st, sn), p, (ot, on) = t
        return normalize_alnum(f"{sn} {p} {on}")

    def precision(self, generated: list[Triplet], reference: list[Triplet]) -> float:
        if not generated:
            return 0.0
        refs = [self.render(r) for r in reference]
        matched = sum(
            1
            for g in generated
            if any(partial_ratio(self.render(g), r) >= self.threshold for r in refs)
        )
        return round(matched / len(generated), 4)


class GraphReconciler:
    """M10 — synonym→allowed-vocab mapping (``analysis/merge_duplicate.py:29-91``)
    with a broadcast vocabulary instead of an LLM."""

    SYNONYMS = {
        "madeBy": "manufacturedBy", "producedBy": "manufacturedBy",
        "builtBy": "manufacturedBy", "worksWith": "compatibleWith",
        "supports": "compatibleWith", "contains": "hasSensor",
        "includes": "hasSensor", "does": "performs", "runs": "performs",
    }

    def __init__(self, allowed: set[str] | None = None):
        self.allowed = allowed or {
            "manufacturedBy", "compatibleWith", "hasSensor", "performs",
            "hasPolicy", "statesInPolicy", "follows", "developedBy",
        }

    def reconcile(self, pred: str) -> str | None:
        if pred in self.allowed:
            return pred
        mapped = self.SYNONYMS.get(pred)
        return mapped if mapped in self.allowed else None

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["pred"] = [self.reconcile(p) for p in batch["pred"]]
        return batch[batch["pred"].notna()]


class WhisperStub:
    """M11/S13 — transcription stage shape (``util/media/media_downloader.py``).
    No audio stack in this environment: ``transcribe`` raises
    NotImplementedError unless ``fake=True``, which emits a deterministic
    payload-hash transcript so the Ray plumbing (binary column in, string
    column out, actor pool) is fully exercised."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def transcribe(self, audio: bytes) -> str:
        if not self.fake:
            raise NotImplementedError("no whisper/audio stack in this environment")
        h = hashlib.blake2b(audio, digest_size=8).hexdigest()
        return f"transcript-{h}"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["transcript"] = [self.transcribe(bytes(b)) for b in batch["payload"]]
        return batch


class DeviceListFilter:
    """M12/J2 — broadcast small-side semi-join: keep rows whose rendered
    triple substring-matches any known device (``method2.py:15-28,49``)."""

    def __init__(self, devices: list[str]):
        self.devices = [d.lower() for d in devices]

    def keep(self, triple_text: str) -> bool:
        t = triple_text.lower()
        return any(d in t for d in self.devices)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mask = [self.keep(f"{s} {p} {o}") for s, p, o in
                zip(batch["subj_name"], batch["pred"], batch["obj_name"])]
        return batch[np.array(mask, dtype=bool)]
