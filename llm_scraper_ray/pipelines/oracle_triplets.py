"""Sequential oracle for the triplet chain (SURVEY.md §3.1) — the analog of
``pipelines/oracle.py`` for the analysis pipeline.

The reference runs this path as a plain per-URL loop
(``scrape_eccomerce.py:161-292``: gate → NER → triplet gen → validation);
this module reproduces that SEQUENTIAL orchestration — one document at a
time, per-record shim methods, no batching, no join, no actor pools — and
persists the expected triplet rows to Parquet so the distributed engine's
equality shows up as green, hash-checked CORRECTNESS rows (the dedup / KG
node / top-vertex oracles are then derived from the persisted rows IN SQL,
re-implementing the groupby semantics independently).

Bump ``TRIPLET_ORACLE_VERSION`` whenever shim semantics change.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TRIPLET_ORACLE_VERSION = 1
PAGERANK_ORACLE_VERSION = 1

_COLS = [
    "url_hash", "subj_type", "subj_name", "pred", "obj_type", "obj_name",
    "weight", "method",
]


def sequential_triplets(
    docs: pd.DataFrame, gate_keywords: tuple[str, ...] | None
) -> pd.DataFrame:
    """(url_hash, text) rows → validated triplet rows, one doc at a time."""
    from ..stages.llmshim import (
        EntityExtractor,
        IoTClassifier,
        TripletGenerator,
        ValidationCascade,
    )

    iot = IoTClassifier(keywords=gate_keywords)
    ner = EntityExtractor()
    gen = TripletGenerator()
    val = ValidationCascade()
    rows = []
    for url_hash, text in zip(docs["url_hash"], docs["text"]):
        if not iot.classify(text):
            continue
        for trip in gen.generate(ner.extract(text)):
            (st, sn), p, (ot, on) = trip
            w, m = val.validate(trip, text)
            rows.append((url_hash, st, sn, p, ot, on, w, m))
    return pd.DataFrame(rows, columns=_COLS)


def sequential_pagerank(tri: pd.DataFrame) -> pd.DataFrame:
    """Expected triplet rows → (node_type, node_key, pagerank): plain
    dict-based weighted PageRank with uniform dangling redistribution, one
    edge at a time — independent of the distributed bucket-grouped rounds
    in ``pipelines/graph.py`` (same spec constants, different dataflow; no
    node hashing, so a hash collision on the engine side would hash-fail
    here). Node identity = (type, graph_key(name)); edge weight = number
    of distinct triplets between the node pair."""
    from ..functions.textnorm import graph_key
    from .graph import DAMPING, PR_ITERATIONS, PR_ROUND

    dedup = tri.drop_duplicates(
        ["subj_type", "subj_name", "pred", "obj_type", "obj_name"]
    )
    edges: dict[tuple, float] = {}
    nodes: set[tuple] = set()
    for st, sn, ot, on in zip(
        dedup["subj_type"], dedup["subj_name"], dedup["obj_type"], dedup["obj_name"]
    ):
        a = (st, graph_key(sn))
        b = (ot, graph_key(on))
        edges[(a, b)] = edges.get((a, b), 0.0) + 1.0
        nodes.add(a)
        nodes.add(b)
    order = sorted(nodes)
    n = len(order)
    if n == 0:
        return pd.DataFrame(
            {"node_type": pd.Series([], dtype=object),
             "node_key": pd.Series([], dtype=object),
             "pagerank": pd.Series([], dtype="float64")}
        )
    out_w: dict[tuple, float] = {}
    for (a, _b), w in edges.items():
        out_w[a] = out_w.get(a, 0.0) + w
    d = DAMPING
    rank = {v: 1.0 / n for v in order}
    for _ in range(PR_ITERATIONS):
        dang = sum(rank[v] for v in order if v not in out_w)
        nxt = {v: (1.0 - d) / n + d * dang / n for v in order}
        for (a, b), w in edges.items():
            nxt[b] += d * rank[a] * w / out_w[a]
        rank = nxt
    return pd.DataFrame(
        {
            "node_type": [t for t, _ in order],
            "node_key": [k for _, k in order],
            "pagerank": [round(rank[v], PR_ROUND) for v in order],
        }
    )


def persist_expected_pagerank(sf_dir: str, gate_keywords: tuple[str, ...]) -> str:
    """Sequential PageRank over the persisted expected triplets; cached per
    (sf, corpus size, triplet + pagerank oracle versions)."""
    tri_path = persist_expected_triplets(sf_dir, gate_keywords)
    path = tri_path.replace(
        "expected-triplets-", "expected-pagerank-"
    ).replace(".parquet", f".p{PAGERANK_ORACLE_VERSION}.parquet")
    if os.path.exists(path):
        return path
    expected = sequential_pagerank(pq.read_table(tri_path).to_pandas())
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(expected, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


def persist_expected_triplets(sf_dir: str, gate_keywords: tuple[str, ...]) -> str:
    """Run the sequential oracle over the sf_dir documents table (the same
    ``doc%08d`` surrogate url_hash the pipeline uses) and persist the
    expected triplets; cached per (sf, n_docs, oracle version)."""
    docs_t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    path = os.path.join(
        base,
        f"expected-triplets-{tag}-n{docs_t.num_rows}-o{TRIPLET_ORACLE_VERSION}.parquet",
    )
    if os.path.exists(path):
        return path
    docs = pd.DataFrame(
        {
            "url_hash": [f"doc{d:08d}" for d in docs_t["doc_id"].to_pylist()],
            "text": docs_t["text"].to_pylist(),
        }
    )
    expected = sequential_triplets(docs, gate_keywords)
    os.makedirs(base, exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(expected, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


KCORE_ORACLE_VERSION = 1


def sequential_kcore(tri: pd.DataFrame, k: int) -> pd.DataFrame:
    """Expected triplet rows → (node_type, node_key, in_kcore): plain
    set-based iterative peeling over the undirected distinct entity graph,
    run to a true fixpoint (no round budget) — independent of the
    bucket-grouped kill-notice cascade in ``pipelines/graph.kcore`` (no
    hashing, no buckets), so the engine's hash equality also proves its
    round budget converged. Node identity = (type, graph_key(name))."""
    from ..functions.textnorm import graph_key

    dedup = tri.drop_duplicates(
        ["subj_type", "subj_name", "pred", "obj_type", "obj_name"]
    )
    adj: dict[tuple, set] = {}
    for st, sn, ot, on in zip(
        dedup["subj_type"], dedup["subj_name"], dedup["obj_type"], dedup["obj_name"]
    ):
        a = (st, graph_key(sn))
        b = (ot, graph_key(on))
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for v in [v for v in alive if len(adj[v]) < k]:
            changed = True
            for u in adj[v]:
                adj[u].discard(v)
            adj[v] = set()
            alive.discard(v)
    nodes = sorted(
        set(
            [(t, graph_key(n)) for t, n in zip(tri["subj_type"], tri["subj_name"])]
            + [(t, graph_key(n)) for t, n in zip(tri["obj_type"], tri["obj_name"])]
        )
    )
    return pd.DataFrame(
        {
            "node_type": [t for t, _ in nodes],
            "node_key": [key for _, key in nodes],
            "in_kcore": [int(v in alive) for v in nodes],
        }
    )


def persist_expected_kcore(
    sf_dir: str, gate_keywords: tuple[str, ...], k: int
) -> str:
    """Sequential k-core over the persisted expected triplets; cached per
    (sf, corpus size, triplet + kcore oracle versions, k)."""
    tri_path = persist_expected_triplets(sf_dir, gate_keywords)
    path = tri_path.replace("expected-triplets-", "expected-kcore-").replace(
        ".parquet", f".k{k}v{KCORE_ORACLE_VERSION}.parquet"
    )
    if os.path.exists(path):
        return path
    expected = sequential_kcore(pq.read_table(tri_path).to_pandas(), k)
    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(expected, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path
