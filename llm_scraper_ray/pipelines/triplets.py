"""The downstream analysis pipeline: extracted text → entities → triplets →
validation weights → knowledge-graph tables (SURVEY.md §3.1 restated).

Ray-native restatement of ``main.py``'s ecommerce path
(``scrape_eccomerce.py:161-292``): per-row field dedup (E10) → IoT gate
(M3 + filter) → NER (M1) → triplet generation (M2) → validation weight
(M8) → triplet sink (S10), then the KG load (``KG.py:447-471``, S12/J4):
node dedup by sanitized key, edge table with weights, per-vertex edge
count top-k (J5/A7/O4). All model stages are the deterministic shims of
stages/llmshim (actor pools; the stage SHAPES are the product — swap a shim
body for a model client and nothing else changes).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Min

from ..functions.textnorm import graph_key
from ..stages.llmshim import (
    EntityExtractor,
    IoTClassifier,
    TripletGenerator,
    ValidationCascade,
)

KG_NODE_TYPES = [
    "device", "manufacturer", "application", "process", "sensor",
    "observation", "inference", "research", "privacyPolicy", "regulation",
]  # KG.py:444


def triplet_dataset(
    docs: rd.Dataset,
    concurrency: int = 2,
    gate_keywords: tuple[str, ...] | None = None,
    join_partitions: int = 8,
) -> rd.Dataset:
    """text rows (url_hash, text) → validated triplet rows.

    Chain of actor-pool map_batches stages; every stage is an actor class
    with its config in ``__init__`` (SURVEY.md §2.4 mapping).
    ``gate_keywords`` parameterizes the M3 domain gate (the reference's
    IoT few-shot prompt ↔ our keyword rule)."""
    # fractional CPUs: shim stages are light — chained pools must not
    # reserve the whole session (4 stages x N actors x 1 CPU would starve
    # the read/write tasks and deadlock small sessions)
    iot = docs.map_batches(
        IoTClassifier,
        fn_constructor_kwargs={"keywords": gate_keywords},
        concurrency=concurrency, batch_size=256, batch_format="pandas",
        num_cpus=0.25,
    ).map_batches(lambda df: df[df["is_iot"]][["url_hash", "text"]], batch_format="pandas")
    entities = iot.map_batches(
        EntityExtractor, concurrency=concurrency, batch_size=256, batch_format="pandas",
        num_cpus=0.25,
    )
    trips = entities.map_batches(
        TripletGenerator, concurrency=concurrency, batch_size=256, batch_format="pandas",
        num_cpus=0.25,
    )
    # J1: the validation cascade's NLI branch scores sentences of the
    # SOURCE text (reference ``validation_pipeline.py:7-29`` via
    # ``precision_recall.py:32-47``'s url→{text, triplets} dict), so the
    # triplet rows re-attach their document by a hash-partitioned join on
    # url_hash — large⋈large at corpus scale, never a text broadcast.
    with_text = trips.join(
        docs, "inner", num_partitions=join_partitions, on=("url_hash",)
    )
    validated = with_text.map_batches(
        ValidationCascade, concurrency=concurrency, batch_size=256, batch_format="pandas",
        num_cpus=0.25,
    ).map_batches(
        lambda df: df[[
            "url_hash", "subj_type", "subj_name", "pred", "obj_type",
            "obj_name", "weight", "method",
        ]],
        batch_format="pandas",
    )
    return validated


def dedup_triplets(validated: rd.Dataset) -> rd.Dataset:
    """A2 — distinct triplets before the KG load (``KG.py:450``): groupby the
    full triplet key, keep max weight + provenance count."""
    return validated.groupby(
        ["subj_type", "subj_name", "pred", "obj_type", "obj_name"]
    ).aggregate(
        Max("weight", alias_name="weight"),
        Count(alias_name="n_sources"),
        Min("url_hash", alias_name="first_url_hash"),
    )


def kg_tables(triplets: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """S12/J4 — node + edge DATASETS with the reference's key discipline:
    node key = whitespace-stripped, forbidden-chars→'_' name (E19,
    ``KG.py:48-52,63-81``); nodes deduped by (type, key) first-wins; edges
    carry float weights (``KG.py:84-103``). Both stay Datasets end-to-end
    so the sink streams — nothing KG-table-sized touches the driver."""

    def explode_nodes(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in batch.itertuples(index=False):
            rows.append((r.subj_type, graph_key(r.subj_name), r.subj_name))
            rows.append((r.obj_type, graph_key(r.obj_name), r.obj_name))
        return pd.DataFrame(rows, columns=["node_type", "node_key", "name"])

    nodes = (
        triplets.map_batches(explode_nodes, batch_format="pandas")
        .groupby(["node_type", "node_key"])
        .aggregate(Min("name", alias_name="name"))
    )

    def edge_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "from_type": batch["subj_type"],
                "from_key": [graph_key(n) for n in batch["subj_name"]],
                "relationship": batch["pred"],
                "to_type": batch["obj_type"],
                "to_key": [graph_key(n) for n in batch["obj_name"]],
                "weight": batch["weight"].round(4),
            }
        )

    edges = triplets.map_batches(edge_rows, batch_format="pandas")
    return nodes, edges


def write_kg_json(nodes: rd.Dataset, edges: rd.Dataset, out_dir: str) -> dict:
    """S12 terminal stage + S8 JSON sink: the reference loads nodes (deduped
    by key) then edges into ArangoDB (``KG.py:447-471``); with no graph DB
    here the load becomes partitioned JSON-lines collections a bulk importer
    consumes — one directory per collection, resumable by re-writing a
    directory. Each collection materializes in the OBJECT STORE (so the
    manifest count doesn't re-run the upstream groupby) and streams to
    ``write_json`` — no driver pandas round-trip."""
    import shutil

    counts, paths = {}, {}
    for name, ds in (("nodes", nodes), ("edges", edges)):
        p = os.path.join(out_dir, name)
        shutil.rmtree(p, ignore_errors=True)
        os.makedirs(p, exist_ok=True)
        ds = ds.materialize()
        ds.write_json(p)
        counts[name] = ds.count()
        paths[name] = p
    return {
        "nodes": counts["nodes"],
        "edges": counts["edges"],
        "node_files": len(os.listdir(paths["nodes"])),
        "edge_files": len(os.listdir(paths["edges"])),
    }


def top_vertices_by_edges(edges: rd.Dataset, k: int = 10) -> pd.DataFrame:
    """J5/A7/O4 — per-vertex inbound edge count, top-k
    (``search_validation_playwright.py:214-226`` AQL restated): Dataset
    groupby+count, then sort+limit — only k rows reach the driver."""
    return (
        edges.groupby(["to_type", "to_key"])
        .aggregate(Count(alias_name="n_edges"))
        .sort(["n_edges", "to_key"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
