"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1-F3).

Builds the engine's primary input table with exactly the input_hint schema
``pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` — synthesized, no external data — derived deterministically
from an sf_dir's ``documents.parquet`` (doc_id, text, lang), so every scale
factor yields a reproducible corpus:

  - hosts are Zipf-skewed (``host000.example`` hottest) to model the
    reference's one-site-dominates-a-batch behavior (SURVEY.md §4 skew row);
  - published URLs are *messy* variants (uppercase host, default port,
    dot-segments, percent-encoding, fragments) of a unique canonical URL per
    doc, exercising F15 canonicalization;
  - HTML mixes the two reference page shapes — product pages (selector
    targets of ``config_files/best_buy_config.json`` + ``modules/amazon.py``)
    and privacy-policy pages (heading/paragraph runs for the
    ``scrape_pp.py:26-47`` sessionizer) — with inline script/style blocks,
    comments, entities, tables and a "currently unavailable" skip variant
    (``scrape_eccomerce.py:66-74``);
  - each page embeds ``<a href>`` links to other pages (relative, absolute,
    messy, cross-host, dangling) forming the crawl graph;
  - the ``text`` column is the E1 cleaner's output — the byte-identity target.

Layout (cached under /tmp, atomic rename + COMPLETE marker):

  pages/bucket=NN/part.parquet   # hash-bucketed by url_sha1[0] % NB for keyed
                                 # fetch lookup; at cluster scale this is
                                 # write_parquet(partition_cols=['bucket'])
  meta.parquet                   # (url_hash, canon_url, host, warc_ts) —
                                 # the frontier-metadata index
  seeds.parquet                  # (url, rank) — FIXTURES.md F2
  politeness.parquet             # (host, max_per_round, robots_disallow) — F3
"""

from __future__ import annotations

import json
import os
import random
import shutil
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq  # noqa: E402

from ..functions.html_text import extract_text
from ..functions.urls import canonicalize_url, url_sha1

GEN_VERSION = 9
GEN_SEED = 42
NUM_BUCKETS = 256  # fetch parallelism is bucket-affine; 256 keeps bucket→actor assignment balanced (≤6% skew at 30 actors)
PAGE_RG_ROWS = 512  # row-group size of the bucketed pages layout (range-read granularity)
# corpus-derived bucket scaling (VERDICT r4: fixed NUM_BUCKETS made the
# decoded per-bucket slice grow with the corpus until a 2M-page leg OOMed).
# A bucket's decoded working set is bounded by _BUCKET_TARGET_BYTES; the
# count only GROWS past the 256 floor, so every corpus small enough for
# 256 buckets keeps the historical byte-identical layout (and its cache).
_BUCKET_TARGET_BYTES = 128 << 20
_PAGE_BYTES_EST = 2048  # decoded html bytes per unit body_weight (~32 KB at w=16)


def buckets_for(n_pages: int, body_weight: int) -> int:
    """Bucket count so one bucket's decoded pages stay ~memory-sized."""
    raw = (n_pages * _PAGE_BYTES_EST * max(1, body_weight)) // _BUCKET_TARGET_BYTES
    return max(NUM_BUCKETS, 64 * -(-int(raw) // 64))


def bucket_of(digest: bytes, num_buckets: int) -> int:
    """Pages bucket of a url_hash digest. ≤256 buckets reads one byte (the
    historical layout — existing corpora stay byte-identical); beyond that
    it widens to the first two bytes so >256 buckets all receive traffic."""
    if num_buckets <= 256:
        return digest[0] % num_buckets
    return ((digest[0] << 8) | digest[1]) % num_buckets


# 2025-06-01T00:00:00Z in microseconds since epoch (fixed constant — no
# local-timezone dependence; engine-internal warc_ts is always int64 us,
# declared as Arrow timestamp[us] only in published tables)
_TS_BASE_US = 1_748_736_000_000_000
_30D_US = 30 * 24 * 3600 * 1_000_000

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("url_hash", pa.binary(20)),  # engine key: sha1(canonical url)
    ]
)


def _rng_for(doc_id: int, salt: int = 0) -> random.Random:
    return random.Random(GEN_SEED * 1_000_003 + doc_id * 7 + salt)


def num_hosts(n_docs: int) -> int:
    return max(4, n_docs // 64)


def page_identity(doc_id: int, n_docs: int) -> tuple[str, str, str]:
    """(host, path, canonical_url) for a doc — pure, callable anywhere."""
    rng = _rng_for(doc_id, salt=1)
    h = num_hosts(n_docs)
    host_idx = min(h - 1, int(h * (rng.random() ** 4)))  # Zipf-ish: density ∝ k^-3/4
    host = f"host{host_idx:03d}.example"
    if rng.random() < 0.05:
        path = f"/private/item{doc_id}"
    else:
        path = f"/cat{rng.randrange(8)}/item{doc_id}"
    return host, path, f"https://{host}{path}"


def messy_url(doc_id: int, n_docs: int, variant_rng: random.Random) -> str:
    """A published URL variant that canonicalizes back to the canonical URL."""
    host, path, canon = page_identity(doc_id, n_docs)
    style = variant_rng.randrange(7)
    if style == 0:
        return canon
    if style == 1:
        return f"https://{host.upper()}{path}"
    if style == 2:
        return f"https://{host}:443{path}"
    if style == 3:
        head, _, tail = path.rpartition("/")
        return f"https://{host}{head}/./{tail}"
    if style == 4:
        head, _, tail = path.rpartition("/")
        return f"https://{host}{head}/x/../{tail}"
    if style == 5:
        return canon + "#sec" + str(variant_rng.randrange(9))
    # percent-encode the 'i' of "item" (unreserved → canonicalizes away)
    head, _, tail = path.rpartition("/")
    return f"https://{host}{head}/{tail.replace('item', '%69tem', 1)}"


_WORDS_FALLBACK = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do".split()


def _words_of(text: str) -> list[str]:
    w = text.split()
    return w if w else _WORDS_FALLBACK


def render_html(
    doc_id: int, n_docs: int, doc_text: str, weight: int = 1, truth: dict | None = None
) -> str:
    """Deterministic page HTML for one doc (product or policy template).

    ``weight`` scales body size (bullets/paragraph runs/word pools) so bench
    corpora can match realistic Common-Crawl page sizes (~10-50 KB) while
    tests stay small; it is part of the corpus cache identity.

    ``truth``, if given, is filled with the generator's embedded ground
    truth (is_product / unavailable / product_name / manufacturer) — the
    independent oracle for the field-extraction pipeline. Capturing it does
    not perturb the rng stream: the captured expressions are hoisted in
    exactly their template evaluation order, so output bytes are identical
    (pinned by tests/test_fields.py::test_render_truth_is_byte_neutral)."""
    rng = _rng_for(doc_id, salt=2)
    host, path, canon = page_identity(doc_id, n_docs)
    words = _words_of(doc_text) * max(1, weight)
    pick = lambda k: " ".join(rng.choices(words, k=k))  # noqa: E731

    # outlinks: mixed forms, ~0-12 targets, some dangling
    n_links = rng.randrange(0, 13)
    anchors = []
    for _ in range(n_links):
        if rng.random() < 0.06:
            target = n_docs + rng.randrange(50)  # dangling: no such page
            thost, tpath, _ = page_identity(target % n_docs, n_docs)
            href = f"https://{thost}/cat0/item{target + n_docs}"
        else:
            target = rng.randrange(n_docs)
            thost, tpath, tcanon = page_identity(target, n_docs)
            if thost == host and rng.random() < 0.5:
                href = tpath if rng.random() < 0.5 else ".." + tpath
            else:
                href = messy_url(target, n_docs, rng)
        anchors.append(f'<a href="{href}">{pick(2)}</a>')
    links_html = "\n".join(anchors)

    style = "<style>body { font-family: 'Helvetica'; } .x > em { color: #333; }</style>"
    script = f"<script>var t = {{'k': '<b>{doc_id}</b>', 'n': {doc_id} }}; if (t.n > 1) console.log('&amp;');</script>"
    comment = f"<!-- rendered doc {doc_id} for {host} -->"

    if rng.random() < 0.5:
        # product template (best_buy_config.json / modules/amazon.py shapes)
        unavailable = (
            '<div id="unavailable">This item is currently unavailable.</div>'
            if rng.random() < 0.05
            else ""
        )
        bullets = "".join(
            f"<li>{pick(4)}</li>" for _ in range(rng.randrange(2, 6) * weight)
        )
        spec_rows = "".join(
            f"<tr><td>{pick(1)}</td><td>{pick(2)}</td></tr>" for _ in range(rng.randrange(2, 5))
        )
        body_words = " ".join(words[: rng.randrange(40, 160) * weight])
        # hoisted in template evaluation order (rng stream unchanged)
        head_title = pick(3)
        h1_text = f"{pick(3).title()} {doc_id}"
        brand_n = rng.randrange(20)
        manufacturer = f"{pick(1).title()} Corp"
        if truth is not None:
            truth.update(
                is_product=True,
                unavailable=bool(unavailable),
                product_name=h1_text,
                manufacturer=manufacturer,
            )
        return f"""<!DOCTYPE html>
<html><head><title>{head_title} &amp; more</title>{style}{script}</head>
<body>{comment}
{unavailable}
<div id="main">
<h1 class="h4">{h1_text}</h1>
<a class="c-button-link" href="/brand{brand_n}">{manufacturer}</a>
<div class="mb-200 pb-200"><ul>{bullets}</ul></div>
<div class="body-copy-lg">{body_words}</div>
<table><tr><th>Spec</th><th>Value</th></tr>{spec_rows}</table>
<img src="/img/{doc_id}.jpg" alt="{pick(2)}"/>
<code>{{"sku": {doc_id}, "host": "{host}"}}</code>
<p>Rated 4.{rng.randrange(10)} &lt;stars&gt; by {rng.randrange(5, 500)} buyers.</p>
</div>
<nav>{links_html}</nav>
</body></html>"""

    # privacy-policy template (heading/paragraph runs for the sessionizer)
    if truth is not None:
        truth.update(
            is_product=False, unavailable=False, product_name="", manufacturer="",
            headings=[],
        )
    sections = []
    n_words = len(words)
    for s in range(rng.randrange(2, 5) * weight):
        level = rng.choice(["h1", "h2", "h3"])
        title = pick(3).title()
        sections.append(f"<{level}>{title}</{level}>")
        if truth is not None:
            truth["headings"].append(f"{level.upper()}: {title}")
        if rng.random() < 0.3:  # consecutive-heading run
            run_title = pick(2).title()
            sections.append(f"<h3>{run_title}</h3>")
            if truth is not None:
                truth["headings"].append(f"H3: {run_title}")
        for _ in range(rng.randrange(1, 4)):
            start = rng.randrange(max(1, n_words - 60))
            para = " ".join(words[start : start + rng.randrange(15, 60) * weight])
            sections.append(f"<p>{para}</p>")
            if truth is not None:
                truth["headings"].append(f"P: {para}")
    return f"""<!DOCTYPE html>
<html><head><title>Policy of {host}</title>{style}{script}</head>
<body>{comment}
<article>
{"".join(sections)}
</article>
<footer>{links_html}</footer>
</body></html>"""


def render_page_row(
    doc_id: int, n_docs: int, doc_text: str, lang: str, weight: int = 1
) -> dict:
    rng = _rng_for(doc_id, salt=3)
    _, _, canon = page_identity(doc_id, n_docs)
    html = render_html(doc_id, n_docs, doc_text, weight)
    return {
        "url": messy_url(doc_id, n_docs, rng),
        "warc_ts": _TS_BASE_US + rng.randrange(_30D_US),
        "html": html.encode("utf-8"),
        "text": extract_text(html),
        "lang": lang,
        "url_hash": url_sha1(canon),
        "canon_url": canon,
    }


TRUTH_VERSION = 2


def persist_truth(sf_dir: str) -> str:
    """Write (or reuse) the generator's embedded ground-truth tables for the
    DEFAULT (pages_per_doc=1) corpus of an sf_dir:

      fields.parquet   — one row per page: the product fields the renderer
                         placed in the HTML (generator-writes vs
                         parser-reads — an independent oracle for the
                         field-extraction pipeline);
      sessions.parquet — per policy page, the expected heading sections:
                         the generator's recorded heading/paragraph stream
                         folded through ``functions.fields.sessionize``
                         (independent of the DOM parse + heading-extraction
                         path the pipeline exercises; the fold itself is
                         shared kernel code, golden-tested separately).

    Returns the truth DIRECTORY. Cached beside the pages corpus caches."""
    from ..functions.fields import sessionize

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    n_docs = docs.num_rows
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    root = os.path.join(
        base, f"truth-{tag}-n{n_docs}-s{GEN_SEED}-v{GEN_VERSION}-t{TRUTH_VERSION}"
    )
    marker = os.path.join(root, "COMPLETE")
    if os.path.exists(marker):
        return root
    fields: dict[str, list] = {
        "url_hash": [], "is_product": [], "unavailable": [],
        "product_name": [], "manufacturer": [],
    }
    sessions: dict[str, list] = {"url_hash": [], "heading_path": [], "body": []}
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        truth: dict = {}
        render_html(doc_id, n_docs, text, truth=truth)
        _, _, canon = page_identity(doc_id, n_docs)
        uh = url_sha1(canon).hex()
        fields["url_hash"].append(uh)
        fields["is_product"].append(truth["is_product"])
        fields["unavailable"].append(truth["unavailable"])
        fields["product_name"].append(truth["product_name"])
        fields["manufacturer"].append(truth["manufacturer"])
        # split(":", 1) in the fold keeps the leading space of each content
        # — feed the recorded stream through the same entry format the
        # heading extractor emits ("TAG: text")
        for key, val in sessionize(truth.get("headings", [])).items():
            sessions["url_hash"].append(uh)
            sessions["heading_path"].append(key)
            sessions["body"].append(val)
    tmp = root + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.Table.from_pydict(fields), os.path.join(tmp, "fields.parquet"))
    pq.write_table(pa.Table.from_pydict(sessions), os.path.join(tmp, "sessions.parquet"))
    open(os.path.join(tmp, "COMPLETE"), "w").close()
    shutil.rmtree(root, ignore_errors=True)
    os.replace(tmp, root)
    return root


@dataclass
class PagesCorpus:
    root: str
    n_pages: int
    n_hosts: int
    num_buckets: int = NUM_BUCKETS

    @property
    def pages_dir(self) -> str:
        return os.path.join(self.root, "pages")

    def bucket_path(self, b: int) -> str:
        return os.path.join(self.pages_dir, f"bucket={b:02d}", "part.parquet")

    @property
    def meta_path(self) -> str:
        return os.path.join(self.root, "meta.parquet")

    @property
    def seeds_path(self) -> str:
        return os.path.join(self.root, "seeds.parquet")

    @property
    def politeness_path(self) -> str:
        return os.path.join(self.root, "politeness.parquet")


def _cache_root(sf_dir: str, n_docs: int, weight: int, num_buckets: int) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.environ.get("LLMSR_CACHE", "/tmp/llmsr_cache")
    # the -b suffix appears only past the 256-bucket floor so every
    # previously generated corpus keeps its cache directory
    suffix = "" if num_buckets == NUM_BUCKETS else f"-b{num_buckets}"
    return os.path.join(
        base, f"pages-{tag}-n{n_docs}-w{weight}-s{GEN_SEED}-v{GEN_VERSION}{suffix}"
    )


def generate_corpus(
    sf_dir: str, force: bool = False, pages_per_doc: int = 1, body_weight: int = 1
) -> PagesCorpus:
    """Build (or reuse cached) pages corpus for an sf_dir. Deterministic.

    ``pages_per_doc`` > 1 synthesizes that many distinct pages per source
    document (word-rotated text variants; used by bench to reach crawl-scale
    page counts from small document tables). Page rendering is distributed
    over Ray when a session is live and the corpus is large; the output
    bytes are identical either way because every row derives only from
    (page_id, n_pages, page_text, lang).
    """
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    n_docs = docs.num_rows * pages_per_doc
    nb = buckets_for(n_docs, body_weight)
    root = _cache_root(sf_dir, n_docs, body_weight, nb)
    marker = os.path.join(root, "COMPLETE.json")
    if os.path.exists(marker) and not force:
        info = json.load(open(marker))
        return PagesCorpus(
            root, info["n_pages"], info["n_hosts"], info.get("num_buckets", NUM_BUCKETS)
        )

    tmp = root + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)

    base_texts = docs["text"].to_pylist()
    base_langs = docs["lang"].to_pylist()

    # STREAMING bucket build (round-1 liability: all rows through driver
    # RAM): rendered batches route to per-bucket accumulators that spill to
    # unsorted chunk files whenever the global in-memory row count crosses
    # _FLUSH_ROWS; each bucket then externally sorts (read chunks → sort →
    # one part.parquet) and appends its meta slice. Driver memory is bounded
    # by _FLUSH_ROWS rendered rows + one bucket, at any corpus size. Final
    # bytes are identical to the materialize-everything build (same rows,
    # same per-bucket sort, same writer call).
    _FLUSH_ROWS = 32_768
    pending: list[list[pa.Table]] = [[] for _ in range(nb)]
    pending_rows = 0
    chunk_n = [0] * nb

    def _flush_all():
        nonlocal pending_rows
        for b in range(nb):
            if not pending[b]:
                continue
            d = os.path.join(tmp, "pages", f"bucket={b:02d}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.concat_tables(pending[b]),
                os.path.join(d, f"chunk-{chunk_n[b]:04d}.parquet"),
            )
            chunk_n[b] += 1
            pending[b] = []
        pending_rows = 0

    for t in _iter_rendered(base_texts, base_langs, n_docs, body_weight):
        hashes = t["url_hash"].to_pylist()
        bucket_ids = pa.array([bucket_of(h, nb) for h in hashes], pa.int32())
        import pyarrow.compute as pc

        for b in pc.unique(bucket_ids).to_pylist():
            pending[b].append(t.filter(pc.equal(bucket_ids, b)))
        pending_rows += t.num_rows
        if pending_rows >= _FLUSH_ROWS:
            _flush_all()
    _flush_all()

    host_counts: dict[str, int] = {}
    meta_writer = pq.ParquetWriter(
        os.path.join(tmp, "meta.parquet"),
        pa.schema(
            [
                ("url_hash", pa.binary(20)),
                ("canon_url", pa.string()),
                ("host", pa.string()),
                ("warc_ts", pa.timestamp("us")),
            ]
        ),
    )
    for b in range(nb):
        d = os.path.join(tmp, "pages", f"bucket={b:02d}")
        os.makedirs(d, exist_ok=True)
        chunks = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.startswith("chunk-")
        )
        if chunks:
            t = pa.concat_tables([pq.read_table(c) for c in chunks])
            # combine_chunks: chunk boundaries depend on arrival order (the
            # Ray render path is order-nondeterministic); one contiguous
            # layout keeps the written parquet bytes deterministic too
            t = t.sort_by("url_hash").combine_chunks()
        else:
            t = _RENDER_SCHEMA.empty_table()
        table = pa.Table.from_pydict(
            {
                "url": t["url"],
                "warc_ts": t["warc_ts"].cast(pa.timestamp("us")),
                "html": t["html"].cast(pa.binary()),
                "text": t["text"],
                "lang": t["lang"],
                "url_hash": t["url_hash"].cast(pa.binary(20)),
            }
        )
        # small row groups: the fetch actors range-read by url_hash row-group
        # statistics — group size bounds per-lookup read amplification AND
        # the actor's cache granularity at 10^10-URL bucket sizes
        pq.write_table(table, os.path.join(d, "part.parquet"), row_group_size=PAGE_RG_ROWS)
        for c in chunks:
            os.remove(c)
        bucket_hosts = [
            u.split("://", 1)[1].split("/", 1)[0] for u in t["canon_url"].to_pylist()
        ]
        for hh in bucket_hosts:
            host_counts[hh] = host_counts.get(hh, 0) + 1
        meta_writer.write_table(
            pa.Table.from_pydict(
                {
                    "url_hash": table["url_hash"],
                    "canon_url": t["canon_url"],
                    "host": pa.array(bucket_hosts, pa.string()),
                    "warc_ts": table["warc_ts"],
                }
            )
        )
    meta_writer.close()

    # seeds (F2): messy variants of a deterministic doc sample + fetch-misses
    srng = random.Random(GEN_SEED * 31 + n_docs)
    n_seeds = max(8, n_docs // 25)
    seed_docs = srng.sample(range(n_docs), min(n_seeds, n_docs))
    seed_urls = [messy_url(d, n_docs, srng) for d in seed_docs]
    seed_urls += [f"https://host000.example/cat0/item{n_docs + 10_000 + i}" for i in range(3)]
    pq.write_table(
        pa.Table.from_pydict(
            {"url": seed_urls, "rank": list(range(len(seed_urls)))}
        ),
        os.path.join(tmp, "seeds.parquet"),
    )

    # politeness (F3): per-host budget + robots for a minority of hosts.
    # Budgets scale with host size (≈16 rounds drain the hottest host at any
    # sf) so the crawl's round count is scale-invariant — the analog of the
    # reference provisioning more SLURM tasks for bigger crawls.
    h = num_hosts(n_docs)
    hosts = [f"host{i:03d}.example" for i in range(h)]
    prng = random.Random(GEN_SEED * 17 + h)
    budgets = [
        max(2, host_counts.get(host, 0) // 16 + prng.randrange(0, 3)) for host in hosts
    ]
    robots = [["/private"] if prng.random() < 0.25 else [] for _ in hosts]
    pq.write_table(
        pa.Table.from_pydict(
            {
                "host": hosts,
                "max_per_round": pa.array(budgets, pa.int32()),
                "robots_disallow": pa.array(robots, pa.list_(pa.string())),
            }
        ),
        os.path.join(tmp, "politeness.parquet"),
    )

    with open(os.path.join(tmp, "COMPLETE.json"), "w") as f:
        json.dump(
            {"n_pages": n_docs, "n_hosts": h, "version": GEN_VERSION, "num_buckets": nb}, f
        )
    os.rename(tmp, root)
    return PagesCorpus(root, n_docs, h, nb)


_RENDER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.int64()),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("url_hash", pa.binary(20)),
        ("canon_url", pa.string()),
    ]
)


def _page_text(base_texts: list[str], pid: int) -> str:
    """Page pid's text: the source doc's words, rotated deterministically —
    every page distinct, derived from sf data only."""
    words = base_texts[pid % len(base_texts)].split()
    rot = (pid // len(base_texts)) * 17 % max(1, len(words))
    return " ".join(words[rot:] + words[:rot])


def _rows_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
            "url_hash": [r["url_hash"] for r in rows],
            "canon_url": [r["canon_url"] for r in rows],
        },
        schema=_RENDER_SCHEMA,
    )


def _iter_rendered(base_texts, base_langs, n_docs, weight: int = 1):
    """Yield rendered page rows as Arrow tables, STREAMING — no all-rows
    list anywhere (round-1 liability at >1M-page corpora). Ray-parallel
    when a session is live and the corpus is large (only the base sf docs
    broadcast; page texts derive in-task), else chunked inline. Output rows
    are identical either way; arrival order is irrelevant because the
    caller re-sorts per bucket."""
    import ray

    nb = len(base_texts)
    if n_docs >= 4000 and ray.is_initialized():
        import ray.data as rd

        base_ref = ray.put((base_texts, base_langs))

        def render_batch(batch: pa.Table) -> pa.Table:
            bt, bl = ray.get(base_ref)
            rows = []
            for pid in batch["id"].to_pylist():
                rows.append(
                    render_page_row(pid, n_docs, _page_text(bt, pid), bl[pid % nb], weight)
                )
            return _rows_table(rows)

        yield from rd.range(n_docs).map_batches(
            render_batch, batch_format="pyarrow", batch_size=1024
        ).iter_batches(batch_size=4096, batch_format="pyarrow")
        return
    for start in range(0, n_docs, 2048):
        rows = [
            render_page_row(
                pid, n_docs, _page_text(base_texts, pid), base_langs[pid % nb], weight
            )
            for pid in range(start, min(start + 2048, n_docs))
        ]
        yield _rows_table(rows)
