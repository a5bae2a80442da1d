"""Synthetic Common-Crawl-style pages table + deterministic generation.

Per ``BASELINE.json.input_hint`` the engine's front-end input is a Parquet
table of web pages with columns ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)``. The reference library has no
ingest surface (it starts at ``from_coo`` — reference ``matrix.py:818``);
this module defines the fixed page universe and the byte-exact content of
every page as a pure function of ``(page_id, n_pages)``, so:

- generation parallelizes trivially (``ray.data.range → map_batches``),
- the per-url extracted text is reproducible **byte-identical** anywhere
  (the correctness invariant in BASELINE.md),
- the link graph is deterministic: page i links to ``OUT_DEGREE(i)`` other
  pages chosen by a splitmix64-style hash — power-law-ish in-degree because
  targets are drawn with a squared-bias toward low ids (hubs).

No external data; everything derives from the seed constants below.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = np.uint64(0x9E3779B97F4A7C15)
LANGS = ["en", "de", "fr", "es", "it"]
EPOCH_US = 1_700_000_000_000_000  # fixed warc_ts base (2023-11-14T22:13:20Z)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic avalanche hash (public splitmix64 constants);
    uint64 wraparound is the point — suppress the overflow warning."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _h(i: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _splitmix64(np.asarray(i, dtype=np.uint64) ^
                           (SEED * np.uint64(salt + 1)))


def url_of(page_ids: np.ndarray) -> list[str]:
    """Stable URL per page id: 256 sites, path = page id."""
    site = (np.asarray(page_ids, dtype=np.uint64) *
            np.uint64(2654435761)) % np.uint64(256)
    return [f"https://site{int(s):03d}.example.org/page/{int(p)}"
            for s, p in zip(site, page_ids)]


def out_links(page_ids: np.ndarray, n_pages: int, return_counts=False):
    """(flat_src_ids, flat_dst_ids): deterministic out-links per page.

    Out-degree in [1, 8] by hash; k-th target of page i is
    ``(h(i, k) % n)²-biased`` toward low ids → skewed in-degree (hubs),
    exercising the engine's skew handling. Self-links dropped.
    ``return_counts=True`` additionally returns the kept-link count per
    input page (rows appear grouped in input-page order)."""
    ids = np.asarray(page_ids, dtype=np.int64)
    deg = (1 + (_h(ids, 0) % np.uint64(8))).astype(np.int64)
    src = np.repeat(ids, deg)
    if len(deg):
        starts = np.concatenate([[0], np.cumsum(deg)[:-1]])
        k = np.arange(int(deg.sum()), dtype=np.int64) - np.repeat(starts, deg)
    else:
        k = np.array([], dtype=np.int64)
    raw = _h(src.astype(np.uint64) * np.uint64(31) + k.astype(np.uint64), 7)
    u = (raw % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30)
    dst = np.floor((u * u) * n_pages).astype(np.int64)  # quadratic bias → hubs
    keep = src != dst
    if return_counts:
        drop_per_page = np.bincount(
            np.repeat(np.arange(len(ids)), deg)[~keep], minlength=len(ids))
        return src[keep], dst[keep], deg - drop_per_page
    return src[keep], dst[keep]


_WORDS = ("the of web graph page rank link node edge crawl data index "
          "search query engine ray arrow sparse matrix vector semiring "
          "distributed parallel shuffle partition actor block stream").split()


_WORDS_ARR = np.array(_WORDS, dtype=object)


def text_of(page_ids: np.ndarray, n_pages: int) -> list[str]:
    """Deterministic body text per page (the byte-identical invariant).
    12-40 words chosen by hash; same function is the single source of truth
    for both generation and the extraction oracle test. Vectorized: ONE
    hash pass over every (page, word-slot) pair, then per-page joins over
    slices — byte-identical to the original per-page formulation."""
    ids = np.asarray(page_ids, dtype=np.int64)
    if len(ids) == 0:
        return []
    with np.errstate(over="ignore"):
        nw = (12 + (_h(ids.astype(np.uint64), 3) %
                    np.uint64(29)).astype(np.int64))
        total = int(nw.sum())
        # flat (page, k) slots: k resets per page
        pid_flat = np.repeat(ids.astype(np.uint64), nw)
        starts = np.concatenate([[0], np.cumsum(nw)[:-1]])
        k_flat = (np.arange(total, dtype=np.uint64) -
                  np.repeat(starts.astype(np.uint64), nw))
        ws = _h(pid_flat * np.uint64(131) + k_flat, 11) % np.uint64(
            len(_WORDS))
    words = _WORDS_ARR[ws.astype(np.int64)]
    bounds = np.append(starts, total)
    return [" ".join(words[bounds[i]:bounds[i + 1]])
            for i in range(len(ids))]


def html_of(page_ids: np.ndarray, n_pages: int) -> list[bytes]:
    """Deterministic HTML: title + anchor tags for each out-link + body
    text. Extraction must invert this exactly. Vectorized: out-links and
    anchor strings for ALL pages in one pass (self-link drops can make a
    page anchor-less, exactly as the per-page form did)."""
    ids = np.asarray(page_ids, dtype=np.int64)
    if len(ids) == 0:
        return []
    texts = text_of(ids, n_pages)
    src, dst, counts = out_links(ids, n_pages, return_counts=True)
    hrefs = np.array([f'<a href="{u}">link</a>' for u in url_of(dst)],
                     dtype=object)
    # per-page anchor join over the input-page-ordered link slices
    cut = np.concatenate([[0], np.cumsum(counts)])
    out = []
    for i, (pid, body) in enumerate(zip(ids, texts)):
        anchors = "".join(hrefs[cut[i]:cut[i + 1]])
        html = (f"<html><head><title>page {pid}</title></head>"
                f"<body><p>{body}</p>{anchors}</body></html>")
        out.append(html.encode("utf-8"))
    return out


def lang_of(page_ids: np.ndarray) -> list[str]:
    idx = _h(np.asarray(page_ids, dtype=np.uint64), 5) % np.uint64(len(LANGS))
    return [LANGS[int(i)] for i in idx]


def pages_batch(page_ids: np.ndarray, n_pages: int) -> pa.Table:
    """One Arrow batch of the pages table for the given ids."""
    ids = np.asarray(page_ids, dtype=np.int64)
    ts = pa.array(EPOCH_US + ids * 1_000_000, type=pa.timestamp("us"))
    return pa.table({
        "url": pa.array(url_of(ids), type=pa.string()),
        "warc_ts": ts,
        "html": pa.array(html_of(ids, n_pages), type=pa.binary()),
        "text": pa.array(text_of(ids, n_pages), type=pa.string()),
        "lang": pa.array(lang_of(ids), type=pa.string()),
    })


def pages_dataset(n_pages: int, parallelism: int = 8):
    """Distributed generation: ``ray.data.range → map_batches`` — each task
    generates its id range independently (pure function, no broadcast)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pages_batch(ids, n_pages)

    return ray.data.range(n_pages, override_num_blocks=parallelism).map_batches(
        gen, batch_format="pyarrow")


def write_pages_parquet(path: str, n_pages: int, parallelism: int = 8):
    """Materialize the pages table to partitioned Parquet (test fixture /
    bench input)."""
    pages_dataset(n_pages, parallelism).write_parquet(path)
    return path
