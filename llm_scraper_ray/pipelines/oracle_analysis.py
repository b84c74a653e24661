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

ANALYSIS_ORACLE_VERSION = 3


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


def persist_expected_fields(sf_dir: str, config: dict) -> str:
    """E2/E10 — the full field-extraction row set (incl. the fuzzy-dedup
    n_fields count) as a plain per-page loop over the same kernels."""
    path = _cache_path(sf_dir, "fields")
    if os.path.exists(path):
        return path
    from ..functions.fields import extract_fields
    from ..functions.fuzzy import deduplicate_fields

    rows = []
    t = _pages_table(sf_dir)
    for h, html in zip(t["url_hash"].to_pylist(), t["html"].to_pylist()):
        fields = deduplicate_fields(extract_fields(bytes(html), config))
        rows.append(
            (
                h.hex(),
                fields.get("product_name", ""),
                fields.get("manufacturer", ""),
                len(fields),
                len(fields) == 0,
            )
        )
    return _write(
        path,
        pd.DataFrame(
            rows,
            columns=["url_hash", "product_name", "manufacturer", "n_fields", "skipped"],
        ),
    )


def _sequential_minhash_candidates(sf_dir: str):
    """Shared sequential core: per-doc shingle sets + the deduped LSH
    candidate pair set (pre-verification)."""
    import hashlib as _h

    import numpy as np

    from ..functions import analysis as A
    from .neardup import (
        _MASK63,
        DF_CAP,
        JACCARD_K,
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_PERMS,
    )

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    a_co, b_co = A.minhash_coeffs(MINHASH_PERMS, seed=1)
    rpb = MINHASH_PERMS // MINHASH_BANDS
    shingle_sets: dict[int, np.ndarray] = {}
    buckets: dict[int, list[int]] = {}
    for d, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        hs = A.shingle_hashes(text, JACCARD_K)
        masked = (hs & np.uint64(_MASK63)).astype(np.int64)
        masked.sort()
        shingle_sets[d] = masked
        if masked.size == 0:
            continue
        sig = A.minhash_signature(masked.astype(np.uint64), a_co, b_co)
        for b in range(MINHASH_BANDS):
            band = sig[b * rpb : (b + 1) * rpb]
            digest = _h.blake2b(band.tobytes() + bytes([b]), digest_size=8).digest()
            buckets.setdefault(
                int.from_bytes(digest, "little") & _MASK63, []
            ).append(int(d))
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if not (2 <= len(members) <= DF_CAP):
            continue
        ms = sorted(set(members))
        pairs.update(
            (ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))
        )
    return shingle_sets, sorted(pairs)


def persist_expected_minhash(sf_dir: str) -> str:
    """MinHash+LSH near-dup pairs, sequentially: per-doc signature → band
    digests → per-band-bucket pair emission with the 2..DF_CAP keep-band →
    pair dedup → exact-Jaccard verification (``neardup.py`` semantics as a
    plain dict-of-buckets loop)."""
    path = _cache_path(sf_dir, "minhash")
    if os.path.exists(path):
        return path
    import numpy as np

    from .neardup import JACCARD_THRESHOLD

    shingle_sets, pairs = _sequential_minhash_candidates(sf_dir)
    rows = []
    for a, b in pairs:
        aa, bb = shingle_sets[a], shingle_sets[b]
        inter = np.intersect1d(aa, bb, assume_unique=True).size
        denom = aa.size + bb.size - inter
        jac = round(inter / denom, 4) if denom else 1.0
        if jac >= JACCARD_THRESHOLD:
            rows.append((a, b, jac))
    return _write(path, pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]))


def persist_expected_minhash_cands(sf_dir: str) -> str:
    """The UNVERIFIED LSH candidate pair set (the quantity ``neardup_eval``
    grades for precision/recall against the exact pairs)."""
    path = _cache_path(sf_dir, "minhashcands")
    if os.path.exists(path):
        return path
    _, pairs = _sequential_minhash_candidates(sf_dir)
    return _write(
        path,
        pd.DataFrame(pairs, columns=["doc_a", "doc_b"]).astype("int64")
        if pairs
        else pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        ),
    )


def persist_expected_simhash(sf_dir: str) -> str:
    """SimHash near-dup pairs, sequentially: 4×16-bit band blocking with
    the 2..DF_CAP keep-band, Hamming ≤6 (``neardup.simhash_buckets``
    semantics as a plain loop)."""
    path = _cache_path(sf_dir, "simhash")
    if os.path.exists(path):
        return path
    from ..functions import analysis as A
    from .neardup import DF_CAP

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    sims: dict[int, int] = {}
    buckets: dict[int, list[int]] = {}
    for d, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        s = A.simhash64(text)
        sims[d] = s
        for b in range(4):
            buckets.setdefault((b << 16) | ((s >> (16 * b)) & 0xFFFF), []).append(d)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if not (2 <= len(members) <= DF_CAP):
            continue
        ms = sorted(set(members))
        pairs.update(
            (ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))
        )
    rows = [
        (a, b, A.hamming64(sims[a], sims[b]))
        for a, b in sorted(pairs)
        if A.hamming64(sims[a], sims[b]) <= 6
    ]
    return _write(path, pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]))


def persist_expected_media(sf_dir: str) -> str:
    """S13 — media decode/feature/frame-sample plumbing, sequentially per
    document (the stubs are deterministic payload-hash functions)."""
    path = _cache_path(sf_dir, "media")
    if os.path.exists(path):
        return path
    from ..stages.multimodal import FeatureExtractStub, FrameSampleStub

    fe = FeatureExtractStub()
    every_n = FrameSampleStub().every_n
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    kinds = ["image", "audio", "video"]
    rows = []
    for d, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        payload = text.encode("utf-8")
        emb = fe.features(payload)
        kind = kinds[d % 3]
        n_frames = (
            len(range(0, max(1, len(payload) // 256), every_n)) if kind == "video" else 0
        )
        rows.append((f"m{d:08d}", len(emb), round(float(emb[0]), 6), n_frames))
    return _write(
        path, pd.DataFrame(rows, columns=["media_id", "dim", "e0", "n_frames"])
    )


def persist_expected_discovery(sf_dir: str) -> str:
    """F12/F13 — the search-discovery pagination, sequentially: one
    SearchDiscovery index, a plain loop over the same (host, query) seed
    frame the query uses."""
    path = _cache_path(sf_dir, "discovery")
    if os.path.exists(path):
        return path
    from ..sources.pages import generate_corpus
    from ..stages.discovery import PAGE_SIZE, SearchDiscovery, search_url

    corpus = generate_corpus(sf_dir)
    sd = SearchDiscovery(corpus.pages_dir, corpus.num_buckets)
    h = min(corpus.n_hosts, 8)
    rows = []
    for i in range(h):
        host = f"host{i:03d}.example"
        for q in ("query", "vector", "stream"):
            for rank, url in enumerate(sd.search(host, q)):
                rows.append(
                    (host, q, url, rank, search_url(host, q, rank // PAGE_SIZE))
                )
    return _write(
        path,
        pd.DataFrame(rows, columns=["host", "query", "url", "rank", "search_url"]),
    )


def persist_expected_embdups_lsh(sf_dir: str, threshold: float) -> str:
    """Banded hyperplane-LSH embedding near-dup pairs, sequentially: the
    same planes/band keys as the query, a dict-of-buckets loop with the
    2..DF_CAP keep-band, exact-cosine verification."""
    path = _cache_path(sf_dir, "embdupslsh")
    if os.path.exists(path):
        return path
    import math

    import numpy as np

    from .neardup import DF_CAP

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = t["vec_id"].to_numpy().astype(np.int64)
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    n, dim = mat.shape
    n_bits = max(5, int(math.ceil(math.log2(max(2, n / 16)))))
    n_bands = 24
    planes = np.random.RandomState(11).randn(n_bands, dim, n_bits)
    weights = np.int64(1) << np.arange(n_bits, dtype=np.int64)
    buckets: dict[int, list[int]] = {}
    for b in range(n_bands):
        keys = (np.int64(b) << np.int64(n_bits)) | (
            ((mat @ planes[b]) > 0) @ weights
        ).astype(np.int64)
        for vid, k in zip(ids, keys):
            buckets.setdefault(int(k), []).append(int(vid))
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        if not (2 <= len(members) <= DF_CAP):
            continue
        ms = sorted(set(members))
        pairs.update(
            (ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))
        )
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    row_of = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for a, b in sorted(pairs):
        cos = round(float(norm[row_of[a]] @ norm[row_of[b]]), 4)
        if cos >= threshold:
            rows.append((a, b, cos))
    return _write(path, pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos_sim"]))


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


def persist_expected_bpe(sf_dir: str, merges: int) -> str:
    """BPE merge-table induction, SEQUENTIALLY: a plain dict-based trainer
    over the corpus word-frequency table — Counter pair counts, argmax by
    (count DESC, pair ASC), greedy merge application via the shared
    per-word kernel (``analysis.bpe_apply_merge``) — independent of the
    engine's bucket-grouped distributed rounds."""
    path = _cache_path(sf_dir, f"bpe{merges}")
    if os.path.exists(path):
        return path
    from collections import Counter

    from ..functions.analysis import _WORD, bpe_apply_merge

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    freq: Counter = Counter()
    for txt in docs["text"].to_pylist():
        freq.update(_WORD.findall(txt.lower()))
    symbols = {w: list(w) for w in freq}
    rows = []
    for r in range(1, merges + 1):
        pairs: Counter = Counter()
        for w, f in freq.items():
            s = symbols[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rows.append((r, left, right, count))
        for w in freq:
            symbols[w] = bpe_apply_merge(symbols[w], left, right)
    return _write(
        path,
        pd.DataFrame(rows, columns=["round", "left", "right", "count"]).astype(
            {"round": "int64", "count": "int64"}
        ),
    )


def persist_expected_bpe_encode(sf_dir: str, merges: int) -> str:
    """Corpus encoded with the SEQUENTIALLY-trained merge table: per doc,
    every word's symbols run through the merge list in order (shared
    per-word kernel ``bpe_apply_merge``); output = token count + crc32 of
    the token stream. Independent of the engine's actor-pool encode and
    its distributed trainer (whose table parity ``vocab_bpe_train``
    gates separately)."""
    path = _cache_path(sf_dir, f"bpeenc{merges}")
    if os.path.exists(path):
        return path
    import zlib

    from ..functions.analysis import _WORD, bpe_apply_merge

    mt = pd.read_parquet(persist_expected_bpe(sf_dir, merges))
    table = [(str(l), str(r)) for l, r in zip(mt["left"], mt["right"])]
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    memo: dict = {}
    rows = []
    for d, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        toks: list = []
        for w in _WORD.findall(txt.lower()):
            t = memo.get(w)
            if t is None:
                t = list(w)
                for left, right in table:
                    t = bpe_apply_merge(t, left, right)
                memo[w] = t
            toks.extend(t)
        rows.append((int(d), len(toks), zlib.crc32(" ".join(toks).encode())))
    return _write(
        path,
        pd.DataFrame(
            rows, columns=["doc_id", "n_tokens_bpe_trained", "tok_crc"]
        ).astype("int64"),
    )


def persist_expected_media_resize(sf_dir: str) -> str:
    """Expected 2×2 box-downsample of every PGM payload, sequentially and
    with an INDEPENDENT formulation (reshape-based block mean vs the
    engine's strided slicing): per image the resized dims, exact integer
    pixel sum and crc32 of the resized raster bytes."""
    path = _cache_path(sf_dir, "mediaresize")
    if os.path.exists(path):
        return path
    import zlib

    import numpy as np

    from ..sources.media import render_media
    from ..stages.multimodal import decode_image

    ids = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    rows = []
    for d in sorted(int(x) for x in ids):
        kind, payload = render_media(d)
        if kind != "image":
            continue
        w, h, arr = decode_image(payload)
        w2, h2 = w // 2, h // 2
        blocks = arr[: h2 * 2, : w2 * 2].astype(np.int64).reshape(h2, 2, w2, 2)
        small = blocks.sum(axis=(1, 3)) // 4
        rows.append(
            (
                d,
                w2,
                h2,
                int(small.sum()),
                zlib.crc32(small.astype(np.uint8).tobytes()),
            )
        )
    return _write(
        path,
        pd.DataFrame(
            rows, columns=["media_id", "out_w", "out_h", "out_sum", "out_crc"]
        ).astype("int64"),
    )


def persist_expected_embedding_pca(sf_dir: str) -> str:
    """Expected PCA spectrum, sequentially with the DIRECT formulation:
    one numpy matmul over ALL quantized rows at once (vs the engine's
    batch-folded mergeable sketch), python-int centering, same
    eigensolver on the identical integer-derived matrix."""
    path = _cache_path(sf_dir, "embpca")
    if os.path.exists(path):
        return path
    import numpy as np

    from .analytics import DIMSTATS_QSCALE

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    arr = t["embedding"].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(arr), -1).astype(np.float64)
    q = np.floor(mat * DIMSTATS_QSCALE).astype(np.int64)
    n, d = q.shape
    gram = (q.T @ q).astype(object)
    s = q.sum(axis=0).astype(object)
    scatter = gram * n - s[:, None] * s[None, :]
    cov = (scatter / (float(n) * n * DIMSTATS_QSCALE * DIMSTATS_QSCALE)).astype(
        np.float64
    )
    evals = np.linalg.eigvalsh(cov)[::-1]
    tot = float(evals.sum())
    df = pd.DataFrame(
        {
            "comp": np.arange(d, dtype=np.int64),
            "eigval": np.round(evals, 9),
            "evr": np.round(evals / tot, 6),
            "trace_scatter": pd.Series([str(int(scatter.trace()))] * d, dtype=object),
        }
    )
    return _write(path, df)


def persist_expected_audio_features(sf_dir: str) -> str:
    """Expected transcript-proxy rows, sequentially and with an INDEPENDENT
    formulation: per-frame python slice sums (vs the engine's one
    cumulative-sum pass) and an explicit run-walk segmenter (vs the
    engine's vectorized run-start mask)."""
    path = _cache_path(sf_dir, "audiofeat")
    if os.path.exists(path):
        return path
    import numpy as np

    from ..sources.media import render_media
    from ..stages.multimodal import (
        FRAME_LEN,
        FRAME_STRIDE,
        ZC_PER_TOKEN,
        decode_wav,
    )

    ids = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    rows = []
    for d in sorted(int(x) for x in ids):
        kind, payload = render_media(d)
        if kind != "audio":
            continue
        _, pcm = decode_wav(payload)
        frames = []
        for start in range(0, pcm.size - FRAME_LEN + 1, FRAME_STRIDE):
            seg = pcm[start : start + FRAME_LEN].astype(np.int64)
            sb = np.signbit(seg)
            frames.append((int(np.abs(seg).sum()), int(np.count_nonzero(sb[1:] != sb[:-1]))))
        if not frames:
            continue
        nf = len(frames)
        total = sum(e for e, _ in frames)
        n_speech = n_segments = zc_speech = 0
        in_run = False
        for e, z in frames:
            if e * nf > total:
                n_speech += 1
                zc_speech += z
                if not in_run:
                    n_segments += 1
                in_run = True
            else:
                in_run = False
        rows.append((d, nf, n_speech, n_segments, zc_speech // ZC_PER_TOKEN))
    return _write(
        path,
        pd.DataFrame(
            rows,
            columns=["media_id", "n_frames", "n_speech", "n_segments", "est_tokens"],
        ).astype("int64"),
    )


def persist_expected_compression(sf_dir: str) -> str:
    """Expected compression-ratio rows: plain sequential per-doc loop over
    the same zlib level-6 parameters (the byte counts are facts of the
    published DEFLATE format, like the media container truths)."""
    path = _cache_path(sf_dir, "compratio")
    if os.path.exists(path):
        return path
    import zlib

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = []
    for d, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        b = text.encode("utf-8")
        c = len(zlib.compress(b, 6))
        rows.append((int(d), len(b), c, 5 * c >= len(b)))
    df = pd.DataFrame(rows, columns=["doc_id", "raw_bytes", "comp_bytes", "keep"])
    return _write(path, df.sort_values("doc_id").reset_index(drop=True))


def persist_expected_media_frames(sf_dir: str) -> str:
    """Expected strided audio frames (len 1024, stride 512), sequentially
    and with an INDEPENDENT formulation (per-frame slice sums vs the
    engine's cumulative-sum pass): per frame the exact integer energy and
    zero-crossing count."""
    path = _cache_path(sf_dir, "mediaframes")
    if os.path.exists(path):
        return path
    import numpy as np

    from ..sources.media import render_media
    from ..stages.multimodal import FRAME_LEN, FRAME_STRIDE, decode_wav

    ids = (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )
    rows = []
    for d in sorted(int(x) for x in ids):
        kind, payload = render_media(d)
        if kind != "audio":
            continue
        _, pcm = decode_wav(payload)
        sb = np.signbit(pcm)
        for fno, start in enumerate(range(0, pcm.size - FRAME_LEN + 1, FRAME_STRIDE)):
            seg = pcm[start : start + FRAME_LEN].astype(np.int64)
            sseg = sb[start : start + FRAME_LEN]
            rows.append(
                (
                    d,
                    fno,
                    int(np.abs(seg).sum()),
                    int(np.count_nonzero(sseg[1:] != sseg[:-1])),
                )
            )
    return _write(
        path,
        pd.DataFrame(
            rows, columns=["media_id", "frame_no", "energy", "zero_crossings"]
        ).astype("int64"),
    )


def persist_expected_media_phash(sf_dir: str) -> str:
    """Expected perceptual-near-dup image pairs (hamming ≤ PHASH_HAM_T),
    sequentially and with INDEPENDENT formulations on both axes: the
    average-hash bit is decided by an exact ``fractions.Fraction`` mean
    comparison over direct per-block slice sums (vs the engine's reduceat
    integral sums + integer cross-multiplication), and the pair set is a
    brute-force O(n²) hamming scan over all images (vs the engine's
    banded multi-index LSH join)."""
    path = _cache_path(sf_dir, "mediaphash")
    if os.path.exists(path):
        return path
    from fractions import Fraction

    import numpy as np

    from ..sources.media import render_image_variant
    from ..stages.multimodal import decode_image

    ids = sorted(
        int(x)
        for x in pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
        )
        .column("doc_id")
        .to_pylist()
    )
    hashes = []
    for d in ids:
        w, h, arr = decode_image(render_image_variant(d))
        a = arr.astype(np.int64)
        gmean = Fraction(int(a.sum()), h * w)
        bits = 0
        for by in range(8):
            y0, y1 = by * h // 8, (by + 1) * h // 8
            for bx in range(8):
                x0, x1 = bx * w // 8, (bx + 1) * w // 8
                blk = a[y0:y1, x0:x1]
                if Fraction(int(blk.sum()), blk.size) > gmean:
                    bits |= 1 << (by * 8 + bx)
        hashes.append(bits)
    hs = np.array(hashes, dtype=np.uint64)
    idv = np.array(ids, dtype=np.int64)
    pairs = []
    from ..stages.multimodal import PHASH_HAM_T, popcount64

    for i in range(len(hs)):
        ham = popcount64((hs[i] ^ hs[i + 1 :]).view(np.int64))
        close = np.flatnonzero(ham <= PHASH_HAM_T)
        for j in close:
            pairs.append((int(idv[i]), int(idv[i + 1 + j]), int(ham[j])))
    df = pd.DataFrame(pairs, columns=["doc_a", "doc_b", "hamming"]).astype("int64")
    df = df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return _write(path, df)
