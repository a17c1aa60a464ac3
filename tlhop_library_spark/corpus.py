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
    """Deterministic pronounceable vocabulary; a few accented pt words."""
    rng = np.random.default_rng(SEED + 1)
    words: list[str] = list(_ACCENTED)
    seen = set(words)
    while len(words) < size:
        n_syl = int(rng.integers(2, 5))
        w = "".join(rng.choice(_SYLLABLES) for _ in range(n_syl))
        if len(w) >= 3 and w not in seen:
            seen.add(w)
            words.append(w)
    return words[:size]


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
