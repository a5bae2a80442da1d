"""Ingest invariants (BASELINE.json input_hint / north rule):

1. per-url extracted text from the DISTRIBUTED pipeline is byte-identical
   to the single-process extraction function AND to the pages table's own
   ground-truth ``text`` column;
2. the distributed link extraction reproduces the generative out_links
   exactly.
"""

import numpy as np
import pyarrow as pa
import ray.data

from python_graphblas_ray.pipelines.ingest import (
    extract_edges,
    extract_text,
    extract_text_table,
    vid_from_url,
)
from python_graphblas_ray.sources.pages import (
    out_links,
    pages_batch,
    pages_dataset,
)

N = 800


def _collect(ds):
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                            promote_options="permissive")


def test_extracted_text_byte_identical():
    pages = pages_dataset(N, parallelism=4)
    out = _collect(extract_text_table(pages)).to_pandas() \
        .set_index("url")["extracted_text"]
    # ground truth: single-process generation + single-process extraction
    truth = pages_batch(np.arange(N), N).to_pandas().set_index("url")
    assert len(out) == N
    for url, row in truth.iterrows():
        got = out[url]
        ref = extract_text(row["html"])
        # the byte-identity invariant: distributed output == the fixed
        # single-process extraction function, byte for byte
        assert got.encode("utf-8") == ref.encode("utf-8"), url
        # and the extractor inverts the generator: title + verbatim body
        pid = int(url.rsplit("/", 1)[1])
        assert got.startswith(f"page {pid} ")
        assert row["text"] in got


def test_extracted_links_match_generator():
    pages = pages_dataset(N, parallelism=4)
    t = _collect(extract_edges(pages)).to_pandas()
    got = set(zip(t.src.tolist(), t.dst.tolist()))
    s, d = out_links(np.arange(N), N)
    expect = set(zip(s.tolist(), d.tolist()))
    assert got == expect


def test_hash_vid_deterministic():
    urls = ["https://a.example/x", "https://b.example/y"]
    v1 = vid_from_url(urls)
    v2 = vid_from_url(urls)
    np.testing.assert_array_equal(v1, v2)
    assert v1[0] != v1[1]
    assert (v1 >= 0).all()  # int64-positive contract


def test_hash_vid_vectorized_matches_scalar_reference():
    """The Arrow-buffer FNV+splitmix path is byte-identical to the
    pure-python reference hash, including empty / non-ascii / repeated
    urls (dictionary-encode gather path)."""
    from python_graphblas_ray.pipelines.ingest import _splitmix64_bytes

    urls = (["https://a.example/x", "", "üñîçødé/☃", "https://a.example/x"]
            + [f"http://h{i}.example/p?q={i * 7}" for i in range(500)])
    got = vid_from_url(urls)
    ref = np.array([_splitmix64_bytes(u.encode("utf-8")) for u in urls],
                   dtype=np.int64)
    np.testing.assert_array_equal(got, ref)
    # and the chunked-array entry point used by LinkExtractor
    ca = pa.chunked_array([pa.array(urls[:3]), pa.array(urls[3:])])
    np.testing.assert_array_equal(vid_from_url(ca), ref)


def test_extract_edges_hashed_vids():
    """Non-synthetic (real-crawl) vid path: same edge STRUCTURE as the
    synthetic path, vids = the reference hash of the url strings."""
    from python_graphblas_ray.pipelines.ingest import _splitmix64_bytes
    from python_graphblas_ray.sources.pages import url_of

    n = 120
    pages = pages_dataset(n, parallelism=3)
    t = _collect(extract_edges(pages, synthetic_ids=False)).to_pandas()
    s, d = out_links(np.arange(n), n)
    uniq = np.unique(np.concatenate([s, d]))
    h = {int(i): _splitmix64_bytes(u.encode("utf-8"))
         for i, u in zip(uniq, url_of(uniq))}
    expect = {(h[int(a)], h[int(b)]) for a, b in zip(s, d)}
    assert set(zip(t.src.tolist(), t.dst.tolist())) == expect


def test_url_canonicalizer_rule_chain():
    import pyarrow as pa

    from python_graphblas_ray.pipelines.ingest import URLCanonicalizer

    cases = {
        # case + www + default port + tracking + fragment
        "  HTTP://WWW.Example.COM:80/A/B?utm_source=x&id=3#frag ":
            "http://example.com/A/B?id=3",
        # https default port + trailing slash
        "https://Site.ORG:443/path/": "https://site.org/path",
        # mid-query tracking param: separators repaired, order kept
        "http://a.com/p?a=1&utm_campaign=z&b=2": "http://a.com/p?a=1&b=2",
        # all params tracking: query gone entirely
        "http://b.com/q?utm_a=1&utm_b=2&gclid=9": "http://b.com/q",
        # path case preserved; non-default port preserved
        "http://C.com:8080/Mixed/Case": "http://c.com:8080/Mixed/Case",
        # non-http scheme: :80 is NOT that scheme's default — kept
        "ftp://Host.Net:80/file": "ftp://host.net:80/file",
        # non-URL strings pass through (trim only)
        " not a url ": "not a url",
    }
    t = pa.table({"url": list(cases)})
    got = URLCanonicalizer()(t)["canon_url"].to_pylist()
    assert got == list(cases.values())


def test_url_canonicalizer_collapses_variants_to_one_vid():
    import pyarrow as pa

    from python_graphblas_ray.pipelines.ingest import (URLCanonicalizer,
                                                       vid_from_url)

    variants = [
        "http://example.com/page",
        "HTTP://WWW.EXAMPLE.COM:80/page",
        "http://example.com/page?utm_source=feed",
        "http://example.com/page#top",
        "http://example.com/page/",
    ]
    canon = URLCanonicalizer()(pa.table({"url": variants}))
    vids = vid_from_url(canon["canon_url"].to_pylist())
    assert len(set(vids.tolist())) == 1
