"""Pages → edge-table ingest (the engine's front-end; SURVEY.md §1.4).

``read_parquet(pages) → map_batches(extract) → edge table`` — the stage the
reference does not have (it starts at ``from_coo``, reference
``matrix.py:818``). Extraction is defined here once and is byte-exact:

- ``extract_text(html) -> str``: strip tags, collapse whitespace — the
  per-url byte-identical invariant (BASELINE.md) is tested by comparing the
  distributed output against this same function run single-process.
- ``extract_links(html) -> list[url]``: ``<a href="...">`` regex.

Vertex ids: urls are hashed to int64 via a deterministic splitmix64 of the
url bytes when no id map is given (``vid_from_url``), or resolved against
a page-id scheme when the universe is known (synthetic pages encode the id
in the path). At 100 TB scale the hash-vid path is the right one: no
global dictionary build, collision probability ~E²/2⁶⁴.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_HREF_RE = re.compile(rb'<a\s+href="([^"]+)"')
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(rb"\s+")


def extract_text(html: bytes) -> str:
    """Byte-exact text extraction: drop tags, collapse whitespace, strip."""
    no_tags = _TAG_RE.sub(b" ", html)
    collapsed = _WS_RE.sub(b" ", no_tags).strip()
    return collapsed.decode("utf-8")


def extract_links(html: bytes) -> list:
    return [m.decode("utf-8") for m in _HREF_RE.findall(html)]


def _splitmix64_bytes(data: bytes) -> int:
    """Deterministic 64-bit hash of bytes (FNV-1a folded through
    splitmix64 finalizer) — pure-python REFERENCE form; the hot path is
    the vectorized twin ``vid_from_url`` (parity-pinned in
    ``tests/test_ingest.py``)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    # splitmix64 finalizer
    h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    h = (h ^ (h >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return (h ^ (h >> 31)) & 0x7FFFFFFFFFFFFFFF  # int64-positive


def vid_from_url(urls) -> np.ndarray:
    """Vectorized url → vid: FNV-1a 64 over the Arrow string buffers
    (``dedup._fnv1a_str_vec`` — one numpy pass per byte position over the
    DISTINCT urls, gathered back through dictionary indices) folded
    through a vectorized splitmix64 finalizer. Byte-identical to
    ``_splitmix64_bytes(u.encode('utf-8'))`` per url; no per-byte Python
    on the real-crawl ingest hot path."""
    from .dedup import _fnv1a_str_vec

    arr = urls if isinstance(urls, (pa.Array, pa.ChunkedArray)) else \
        pa.array(list(urls), type=pa.string())
    h = _fnv1a_str_vec(arr)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = (h ^ (h >> np.uint64(31))) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return h.astype(np.int64)


_PAGE_PATH_RE = re.compile(r"/page/(\d+)$")


def vid_from_synthetic_url(urls) -> np.ndarray:
    """Synthetic pages encode the page id in the url path — gives dense
    [0, n) vids so vertex vectors are plain arrays. Vectorized: one Arrow
    regex kernel + int cast over the whole url array (urls is one row per
    LINK — the hottest column in ingest)."""
    if isinstance(urls, pa.ChunkedArray):
        arr = urls.combine_chunks()
    elif isinstance(urls, pa.Array):
        arr = urls
    else:
        arr = pa.array(list(urls), type=pa.string())
    m = pa.compute.extract_regex(arr, r"/page/(?P<id>\d+)$")
    return pa.compute.struct_field(m, "id").cast(pa.int64()).to_numpy(
        zero_copy_only=False)


class LinkExtractor:
    """Link-extraction batch callable. Deliberately NOT an actor pool:
    its only state is two module-level compiled regexes, and measured at
    sf0.1/32 cpus the plain task path (one slot per core) ingests 2.3×
    faster than an autoscaling actor pool capped below the core count
    (4.1 s vs 9.3 s). Actor pools are for genuinely heavy per-actor state
    (see ``dedup.MinHasher``)."""

    def __init__(self, synthetic_ids=True):
        self.synthetic = synthetic_ids
        # regexes are module-level compiled; held here to pin per-actor
        self.href_re = _HREF_RE
        self.tag_re = _TAG_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        # per-doc findall is one C regex scan per document; the dst urls
        # flatten into ONE Arrow array hashed in a single vectorized
        # pass, and each SOURCE url is hashed once per page (not once
        # per out-link) then repeated by its link count.
        links_per_doc = [extract_links(h) for h in htmls]
        counts = np.fromiter((len(ls) for ls in links_per_doc),
                             dtype=np.int64, count=len(links_per_doc))
        dst_arr = pa.array(
            [link for ls in links_per_doc for link in ls],
            type=pa.string())
        vid = vid_from_synthetic_url if self.synthetic else vid_from_url
        src = np.repeat(vid(batch["url"]), counts)
        dst = vid(dst_arr) if len(dst_arr) else np.array([], dtype=np.int64)
        return pa.table({
            "src": src,
            "dst": dst,
            "val": np.ones(len(src), dtype=np.float64),
        })


def extract_edges(pages_ds, synthetic_ids=True, batch_size=2048):
    """pages Dataset → edge Dataset (src, dst, val) as a stateless task
    stage (see ``LinkExtractor`` for why not an actor pool). Column-pruned
    read is the caller's job (``read_parquet(columns=['url','html'])``)."""
    return pages_ds.map_batches(
        LinkExtractor(synthetic_ids),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


def extract_text_table(pages_ds):
    """pages Dataset → (url, text) extracted-text table (byte-identical
    invariant surface)."""

    def kern(batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        return pa.table({"url": batch["url"],
                         "extracted_text": pa.array(texts, type=pa.string())})

    return pages_ds.map_batches(kern, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL canonicalization (crawl-dedup front-end)
# ---------------------------------------------------------------------------

class URLCanonicalizer:
    """Canonicalize crawl URLs so that tracking-parameter / case / port
    variants of the same page collapse to one vertex BEFORE vid hashing —
    the standard crawl-frontier normalization (cf. the URL-normalization
    rules web crawlers apply ahead of dedup). Without it, ``?utm_...``
    variants multiply both the page dedup keys and the link-graph
    vertices.

    Fixed, documented rule chain — every rule is one RE2 pass over the
    whole batch in Arrow kernels (``replace_substring_regex`` /
    ``extract_regex``), no Python row loop, and each rule has an exact
    DuckDB ``regexp_replace`` twin (the ``docs_url_canon`` oracle):

    1. trim surrounding whitespace
    2. strip the fragment (``#...``)
    3. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``) and
       repair separators (``&&``→``&``, ``?&``→``?``, trailing ``?``/``&``)
    4. lowercase scheme and host, strip a leading ``www.``, strip the
       scheme-default port (``http…:80``, ``https…:443``)
    5. strip one trailing ``/`` (query-less path-end only)

    Query-parameter ORDER is preserved (sorting params can change
    semantics on some sites and is not RE2-expressible; documented
    non-rule). Non-URL strings (no ``scheme://``) pass through rules
    1-3 and 5 unchanged by rule 4.
    """

    TRACKING = r"(?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"
    SPLIT = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
             r"(?P<host>[^/?#]*)(?P<rest>.*)$")

    def __init__(self, url_col="url", out_col="canon_url"):
        self.url_col = url_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = batch[self.url_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        u = pc.fill_null(u, "")
        u = pc.utf8_trim_whitespace(u)
        u = pc.replace_substring_regex(u, r"#.*$", replacement="")
        u = pc.replace_substring_regex(u, self.TRACKING, replacement="")
        u = pc.replace_substring_regex(u, r"&{2,}", replacement="&")
        u = pc.replace_substring_regex(u, r"\?&", replacement="?")
        u = pc.replace_substring_regex(u, r"[?&]+$", replacement="")
        parts = pc.extract_regex(u, self.SPLIT)
        is_url = pc.is_valid(parts)
        scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
        host = pc.utf8_lower(pc.struct_field(parts, "host"))
        host = pc.replace_substring_regex(host, r"^www\.", replacement="")
        host = pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, r":80$", replacement=""),
            pc.if_else(
                pc.equal(scheme, "https"),
                pc.replace_substring_regex(host, r":443$", replacement=""),
                host))
        rebuilt = pc.binary_join_element_wise(
            scheme, "://", host, pc.struct_field(parts, "rest"), "")
        u = pc.if_else(is_url, rebuilt, u)
        u = pc.replace_substring_regex(u, r"/$", replacement="")
        out = {c: batch[c] for c in batch.column_names}
        out[self.out_col] = u
        return pa.table(out)


def canonicalize_urls(ds, url_col="url", out_col="canon_url"):
    """Dataset stage: add ``out_col`` with the canonical form of
    ``url_col`` (see ``URLCanonicalizer`` for the rule chain)."""
    return ds.map_batches(URLCanonicalizer(url_col, out_col),
                          batch_format="pyarrow")
