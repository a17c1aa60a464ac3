"""Deterministic Common-Crawl-style corpus generator (FIXTURES.md §1).

Emits the exact input_hint shape: ``(url string, warc_ts timestamp,
html binary, text string, lang string)`` plus a stable ``doc_id``.

Design properties (seed fixed → byte-reproducible):
- ~5,000-term vocabulary, Zipfian (s≈1.1): head terms in >30% of docs
  (exercises salting / skew handling), long tail with df=1.
- Log-normal doc lengths, ~10–2,000 tokens (BM25 length normalization).
- ~1% duplicate bodies under distinct urls (tie-break determinism).
- Edge rows at the head of the corpus: missing <body>, empty body,
  malformed HTML, non-ASCII (accented pt words), NULL html.

IMPORTANT (test honesty): ``text`` is computed here by a *direct
construction* from the token stream (we know what
``body.get_text(" ", strip=True)`` must yield for the HTML we emit),
NOT by calling the engine's extractor — so the byte-identity invariant
test (extract(html) == text per url) is a real cross-check, not a
tautology.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
LANGS = ["en", "pt", "es", "de", None]

_SYLLABLES = [
    "ba", "be", "bi", "bo", "bu", "ca", "ce", "ci", "co", "cu",
    "da", "de", "di", "do", "du", "fa", "fe", "fi", "fo", "fu",
    "ga", "ge", "gi", "go", "gu", "la", "le", "li", "lo", "lu",
    "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
    "pa", "pe", "pi", "po", "pu", "ra", "re", "ri", "ro", "ru",
    "sa", "se", "si", "so", "su", "ta", "te", "ti", "to", "tu",
]
_ACCENTED = ["ação", "coração", "informação", "segurança", "análise",
             "página", "conteúdo", "tecnologia", "descrição", "índice"]


def build_vocab(size: int = VOCAB_SIZE) -> list[str]:
    """Deterministic pronounceable vocabulary; a few accented pt words.

    Sizes ≤ VOCAB_SIZE reproduce the round-1 vocabulary byte-for-byte
    (indexes/benches built against it stay comparable). Larger sizes
    extend it with vectorized ``z``-prefixed base-60 syllable encodings
    of the index — no base syllable contains ``z``, so the extension is
    collision-free by construction and O(size) to build (the rejection
    loop would thrash near syllable-space saturation at 10^5-10^6)."""
    rng = np.random.default_rng(SEED + 1)
    words: list[str] = list(_ACCENTED)
    seen = set(words)
    base = min(size, VOCAB_SIZE)
    while len(words) < base:
        n_syl = int(rng.integers(2, 5))
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n_syl))
        if len(w) >= 3 and w not in seen:
            seen.add(w)
            words.append(w)
    if size <= VOCAB_SIZE:
        return words[:size]
    n_extra = size - VOCAB_SIZE
    syl = np.array(_SYLLABLES)
    n_dig = max(2, int(np.ceil(np.log(max(n_extra, 2)) / np.log(60))))
    rem = np.arange(n_extra, dtype=np.int64)
    parts = []
    for _ in range(n_dig):
        parts.append(syl[rem % 60])
        rem //= 60
    ext = np.full(n_extra, "z", dtype=f"U{1 + 2 * n_dig}")
    for p in reversed(parts):
        ext = np.char.add(ext, p)
    return words + ext.tolist()


#: Heaps-law constants for web text: V ≈ k·(total tokens)^β with
#: k≈30, β≈0.5 (Baeza-Yates & Ribeiro-Neto, Modern Information
#: Retrieval §6; mean doc length ≈ 150-170 tokens at the fast
#: generator's log-normal(4.5, 1.0) clipped to [50, 2000] plus burst
#: events — an order-of-magnitude input to the vocabulary estimate,
#: not a calibration constant).
HEAPS_K = 30.0
HEAPS_BETA = 0.5
MEAN_DL = 160
VOCAB_CAP = 1_000_000


def heaps_vocab_size(n_docs: int) -> int:
    """Realistic Zipf-universe size for an n_docs web corpus."""
    est = int(HEAPS_K * (n_docs * MEAN_DL) ** HEAPS_BETA)
    return max(VOCAB_SIZE, min(VOCAB_CAP, est))


def _zipf_probs(size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def _body_tokens(rng: np.random.Generator, vocab: np.ndarray,
                 probs: np.ndarray) -> list[str]:
    # log-normal length, clipped to [10, 2000]
    dl = int(np.clip(rng.lognormal(mean=4.5, sigma=1.0), 10, 2000))
    idx = rng.choice(len(vocab), size=dl, p=probs)
    return [str(vocab[i]) for i in idx]


def _make_html(title: str, desc: str, kw: str, paragraphs: list[list[str]]) -> str:
    paras = "".join(
        f"<p>{' '.join(p)}</p>\n" for p in paragraphs
    )
    return (
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta name="description" content="{desc}">'
        f'<meta name="keywords" content="{kw}">'
        "</head>\n<body>\n"
        f"<h1>{title}</h1>\n{paras}"
        "</body></html>"
    )


def _expected_text(title: str, paragraphs: list[list[str]]) -> str:
    """What get_text(" ", strip=True) yields for _make_html's body:
    the h1 text node and each <p> text node, stripped, space-joined."""
    parts = [title] + [" ".join(p) for p in paragraphs]
    return " ".join(s.strip() for s in parts if s.strip())


def generate_corpus(n_docs: int, seed: int = SEED) -> dict[str, list]:
    """Columnar dict: url, warc_ts, html(bytes|None), text, lang, doc_id."""
    rng = np.random.default_rng(seed)
    vocab = np.array(build_vocab())
    probs = _zipf_probs(len(vocab))
    base_ts = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    span = dt.timedelta(days=30)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    dup_pool: list[tuple[str, str]] = []  # (html, text) for 1% duplicates

    for i in range(n_docs):
        url = f"https://site{i % 97}.example/page/{i}"
        ts = base_ts + span * (i / max(n_docs - 1, 1))
        lang = LANGS[int(rng.integers(0, len(LANGS)))]

        if i == 0:  # NULL html → NULL text
            html, text = None, None
        elif i == 1:  # no <body> → ""
            html = "<html><head><title>no body here</title></head></html>"
            text = ""
        elif i == 2:  # empty body
            html = "<html><body>   \n  </body></html>"
            text = ""
        elif i == 3:  # malformed: unclosed tags, stray close
            html = (
                "<html><body><p>broken page unclosed"
                "<div>nested still text</i></body>"
            )
            text = "broken page unclosed nested still text"
        elif i == 4:  # non-ASCII heavy
            toks = [_ACCENTED[int(rng.integers(0, len(_ACCENTED)))]
                    for _ in range(30)]
            html = _make_html("página de informação", "descrição útil",
                              "ação, índice", [toks])
            text = _expected_text("página de informação", [toks])
        elif dup_pool and rng.random() < 0.01:
            html, text = dup_pool[int(rng.integers(0, len(dup_pool)))]
        else:
            toks = _body_tokens(rng, vocab, probs)
            n_para = max(1, len(toks) // 80)
            paras = [list(toks[j::n_para]) for j in range(n_para)]
            title = " ".join(toks[: min(5, len(toks))])
            desc = " ".join(toks[: min(12, len(toks))])
            kw = ", ".join(sorted(set(toks[:6])))
            html = _make_html(title, desc, kw, paras)
            text = _expected_text(title, paras)
            if rng.random() < 0.05:
                dup_pool.append((html, text))

        urls.append(url)
        tss.append(ts)
        htmls.append(None if html is None else html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)

    return {
        "doc_id": list(range(n_docs)),
        "url": urls,
        "warc_ts": tss,
        "html": htmls,
        "text": texts,
        "lang": langs,
    }


CORPUS_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


#: burst-event model (Church & Gale burstiness): each doc picks
#: ``BURSTS_PER_DOC`` terms UNIFORMLY from the torso pool
#: [BURST_LO, BURST_HI) and repeats each m extra times with the
#: heavy-tailed m = min(floor(1/U), BURST_CAP)  (P(m ≥ k) = 1/k).
#: Uniform — not Zipf — pool picks are deliberate: every pool term
#: gets ~n_docs·BURSTS_PER_DOC/|pool| rare high-tf "about" docs
#: REGARDLESS of its incidental Zipf df, which is the real-webtext
#: shape (a few pages are about a term and mention it many times;
#: its other postings stay tf≈1). iid Zipf draws alone give tf ∝
#: rate·dl — flat block maxima that NO exact max-score algorithm
#: (BMW/WAND) can prune; the rare-burst tail is the regime
#: block-max pruning exists for.
BURST_LO = 50
BURST_HI = 100_000
BURST_CAP = 100


def _fast_batch(
    rng: np.random.Generator,
    vocab: np.ndarray,
    cdf: np.ndarray,
    start_id: int,
    n: int,
    hapax_frac: float,
    include_html: bool,
    bursts_per_doc: int = 3,
) -> dict[str, list]:
    """One vectorized batch of the stress-scale generator.

    The per-token work (Zipf draw via one searchsorted, string lookup,
    length accounting) is all numpy; the per-DOC loop only slices a
    single pre-joined string — O(docs) cheap ops, not O(tokens).

    The doc-length floor is 50 tokens — post-filter webtext (Gopher
    rule 1 drops <50-word pages, and CC-style corpora are consumed
    after that filter). Realism aside, a floor of 10 makes BM25's
    tf=1 ceiling weight(tf=1, dl=10) ≈ 0.74 ≈ the burst-doc score,
    and since ~2% of docs sit near it, every 128-posting block
    carries one — flattening block maxima into the unprunable regime
    for reasons that have nothing to do with real text."""
    dl = np.clip(rng.lognormal(mean=4.5, sigma=1.0, size=n), 50, 2000).astype(
        np.int64
    )
    idx = np.searchsorted(cdf, rng.random(int(dl.sum())), side="right")
    toks = vocab[idx]
    tok_lens = np.char.str_len(toks)
    joined = " ".join(toks.tolist())
    # char offset where token j starts inside `joined`
    pos = np.zeros(len(toks) + 1, dtype=np.int64)
    np.cumsum(tok_lens + 1, out=pos[1:])
    doc_tok = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dl, out=doc_tok[1:])
    # hapax tail: a fraction of docs carry one globally-unique term
    # ('q' + base-60 doc_id — disjoint from every vocab word), the
    # ids/typos/serials tail that dominates real web dictionaries
    hapax_mask = rng.random(n) < hapax_frac
    # burst events (see BURST_* note above); all draws are taken
    # unconditionally and independently of include_html so the token
    # stream is reproducible across html on/off runs
    burst_hi = min(BURST_HI, len(vocab))
    do_burst = bursts_per_doc > 0 and burst_hi > BURST_LO
    if do_burst:
        bterm = rng.integers(BURST_LO, burst_hi, size=(n, bursts_per_doc))
        bcnt = np.minimum(
            (1.0 / rng.random((n, bursts_per_doc))).astype(np.int64),
            BURST_CAP,
        )
    syl = np.array(_SYLLABLES)
    texts: list[str | None] = []
    htmls: list[bytes | None] = []
    for i in range(n):
        s, e = doc_tok[i], doc_tok[i + 1]
        cs, ce = pos[s], pos[e] - 1
        body = joined[cs:ce]
        title = joined[cs : pos[min(s + 5, e)] - 1]
        if do_burst:
            body = body + " " + " ".join(
                np.repeat(vocab[bterm[i]], bcnt[i]).tolist()
            )
        if hapax_mask[i]:
            did, hap = start_id + i, "q"
            while True:
                hap += syl[did % 60]
                did //= 60
                if did == 0:
                    break
            body = body + " " + hap
        texts.append(_expected_text(title, [[body]]))
        if include_html:
            htmls.append(
                _make_html(title, joined[cs : pos[min(s + 12, e)] - 1],
                           title, [[body]]).encode("utf-8")
            )
        else:
            htmls.append(None)
    # ~1% duplicate bodies under distinct urls (within-batch pool)
    dup = np.flatnonzero(rng.random(n) < 0.01)
    for i in dup:
        if i > 0:
            j = int(rng.integers(0, i))
            texts[i] = texts[j]
            htmls[i] = htmls[j]
    return {"dl": dl, "texts": texts, "htmls": htmls,
            "langs": rng.integers(0, len(LANGS), size=n)}


def write_corpus_parquet_fast(
    path: str,
    n_docs: int,
    seed: int = SEED,
    vocab_size: int | None = None,
    hapax_frac: float = 0.3,
    include_html: bool = True,
    batch_rows: int = 16384,
    bursts_per_doc: int = 3,
) -> dict:
    """Stress-scale corpus writer: vectorized, streaming, realistic
    vocabulary. Returns {"path", "vocab_size", "n_docs"}.

    Differences from :func:`write_corpus_parquet` (the loop generator,
    kept byte-stable for the per-round bench corpus): the Zipf universe
    defaults to :func:`heaps_vocab_size` (10^5-10^6 at stress scale,
    not 5k), ~``hapax_frac`` of docs append one globally-unique term
    (the df=1 dictionary tail), ``bursts_per_doc`` burst events per doc
    give torso terms the rare heavy-tailed within-doc tf real webtext
    carries (see the BURST_* note — 0 disables), docs are
    single-paragraph, duplicates pool within a batch, and batches
    stream through a ParquetWriter so 10M docs never materialize in
    memory. ``include_html=False`` writes NULL html (the index build
    reads only doc_id+text — column-pruned — so html at 10M is
    synthesis cost, not engine work)."""
    rng = np.random.default_rng(seed)
    v = heaps_vocab_size(n_docs) if vocab_size is None else vocab_size
    vocab = np.array(build_vocab(v))
    cdf = np.cumsum(_zipf_probs(len(vocab)))
    cdf[-1] = 1.0  # guard float round-off at the tail
    base_us = int(
        dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    span_us = int(dt.timedelta(days=30).total_seconds() * 1e6)
    writer = pq.ParquetWriter(path, CORPUS_ARROW_SCHEMA)
    try:
        for start in range(0, n_docs, batch_rows):
            n = min(batch_rows, n_docs - start)
            b = _fast_batch(rng, vocab, cdf, start, n, hapax_frac,
                            include_html, bursts_per_doc=bursts_per_doc)
            ids = np.arange(start, start + n, dtype=np.int64)
            ts = base_us + (ids * span_us) // max(n_docs - 1, 1)
            table = pa.table(
                {
                    "doc_id": pa.array(ids),
                    "url": pa.array(
                        [f"https://site{i % 97}.example/page/{i}"
                         for i in ids]
                    ),
                    "warc_ts": pa.array(ts).cast(
                        pa.timestamp("us", tz="UTC")
                    ),
                    "html": pa.array(b["htmls"], type=pa.binary()),
                    "text": pa.array(b["texts"], type=pa.string()),
                    "lang": pa.array(
                        [LANGS[int(x)] for x in b["langs"]]
                    ),
                },
                schema=CORPUS_ARROW_SCHEMA,
            )
            writer.write_table(table, row_group_size=4096)
    finally:
        writer.close()
    return {"path": path, "vocab_size": int(v), "n_docs": int(n_docs)}


def write_corpus_parquet(path: str, n_docs: int, seed: int = SEED) -> str:
    """Write the corpus as a single parquet file; returns path.

    Small row groups (4096 rows) so Spark can split the scan — a
    single-row-group file serializes the whole tokenize stage into one
    task (observed: 200k docs, zero scan parallelism at local[32]).
    """
    cols = generate_corpus(n_docs, seed)
    table = pa.table(cols, schema=CORPUS_ARROW_SCHEMA)
    pq.write_table(table, path, row_group_size=4096)
    return path
