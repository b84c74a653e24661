"""Deterministic model-shim stages (SURVEY.md §2.4 M1-M12 shapes)."""

import pandas as pd

from llm_scraper_ray.functions.fuzzy import partial_ratio
from llm_scraper_ray.stages.llmshim import (
    DeviceListFilter,
    EntityExtractor,
    GraphReconciler,
    IoTClassifier,
    JudgePanel,
    NLIScorer,
    PrecisionRecallJudge,
    SearchCountValidator,
    TripletGenerator,
    ValidationCascade,
    WhisperStub,
)


def test_entity_extractor_cap_and_fallback():
    ner = EntityExtractor()
    ents = ner.extract("The Govee Smart Bar works with Alexa Hub near the wall.")
    assert "Govee Smart Bar" in ents and "Alexa Hub" in ents
    # lowercase fallback: frequent salient terms, title-cased
    ents2 = ner.extract("stream stream stream vector vector the query")
    assert ents2[0] == "Stream" and "Vector" in ents2
    # deterministic
    assert ner.extract("a b stream Stream") == ner.extract("a b stream Stream")


def test_triplet_generator_roundtrips_grammar():
    gen = TripletGenerator()
    trips = gen.generate(["Light Bar", "Acme Corp", "Motion Sensor", "Alexa"])
    # multi-word quoted entities camelize per E15 (response_cleaner.py:48-51);
    # single-word names pass through untouched
    assert (("device", "LightBar"), "manufacturedBy", ("manufacturer", "AcmeCorp")) in trips
    assert (("device", "LightBar"), "hasSensor", ("sensor", "MotionSensor")) in trips
    assert (("device", "LightBar"), "compatibleWith", ("device", "Alexa")) in trips


def test_iot_classifier():
    c = IoTClassifier()
    assert c.classify("Smart WiFi Camera") is True
    assert c.classify("Plain Wooden Chair") is False
    c2 = IoTClassifier(keywords=("chair",))
    assert c2.classify("Plain Wooden Chair") is True


def test_nli_scorer_overlap():
    s = NLIScorer()
    assert s.entailment("the bar is made by acme", "bar made by acme") == 1.0
    assert s.entailment("unrelated words here", "bar made by acme") < 0.5
    assert s.score("First thing. The bar is made by acme corp.", "bar acme") == 1.0


def test_validation_cascade_thresholds():
    v = ValidationCascade()
    trip = (("device", "Light Bar"), "manufacturedBy", ("manufacturer", "Acme"))
    w, method = v.validate(trip, "the light bar is manufacturedBy acme indeed.")
    assert method in ("search", "nli")
    if method == "search":
        assert w >= 50.0
    # unknown predicate → no search variants → NLI path
    trip2 = (("device", "X"), "unknownPred", ("device", "Y"))
    w2, m2 = v.validate(trip2, "x unknownPred y.")
    assert m2 == "nli" and w2 > 0


def test_judge_panel_merge():
    jp = JudgePanel()
    df = jp(pd.DataFrame({"claim": ["a b c", "d e f"]}))
    assert set(df.columns) >= {"claim", "is_correct", "confidence"}
    df2 = jp(pd.DataFrame({"claim": ["a b c", "d e f"]}))
    pd.testing.assert_frame_equal(df, df2)  # deterministic


def test_precision_judge_fuzzy():
    pr = PrecisionRecallJudge(threshold=70)
    ref = [(("device", "Light Bar"), "manufacturedBy", ("manufacturer", "Acme"))]
    gen_match = [(("device", "light bar"), "manufacturedBy", ("manufacturer", "acme!"))]
    gen_miss = [(("device", "Router"), "performs", ("process", "routing"))]
    assert pr.precision(gen_match, ref) == 1.0
    assert pr.precision(gen_miss, ref) == 0.0
    assert pr.precision(gen_match + gen_miss, ref) == 0.5


def test_partial_ratio_window():
    assert partial_ratio("abc", "zzabczz") == 100.0
    assert partial_ratio("abc", "abc") == 100.0
    assert partial_ratio("", "") == 100.0
    assert 0 <= partial_ratio("abc", "xyz") < 40


def test_graph_reconciler():
    r = GraphReconciler()
    assert r.reconcile("manufacturedBy") == "manufacturedBy"
    assert r.reconcile("madeBy") == "manufacturedBy"
    assert r.reconcile("totallyUnknown") is None


def test_whisper_stub_and_device_filter():
    w = WhisperStub(fake=True)
    assert w.transcribe(b"abc") == w.transcribe(b"abc")
    import pytest

    with pytest.raises(NotImplementedError):
        WhisperStub(fake=False).transcribe(b"abc")
    f = DeviceListFilter(["light bar"])
    df = pd.DataFrame(
        {"subj_name": ["Light Bar", "Chair"], "pred": ["performs", "performs"],
         "obj_name": ["tracking", "sitting"]}
    )
    out = f(df)
    assert list(out["subj_name"]) == ["Light Bar"]


def test_search_validator_deterministic():
    v = SearchCountValidator()
    trip = (("device", "Light Bar"), "manufacturedBy", ("manufacturer", "Acme"))
    assert v.weight(trip) == v.weight(trip)
    assert v.weight((("device", "X"), "noSuchPred", ("device", "Y"))) is None
