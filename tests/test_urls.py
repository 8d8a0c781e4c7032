"""URL curation kernels: domain extraction, per-domain stats, per-site cap."""

import pandas as pd
import pyarrow as pa


def test_domain_of_vectorized():
    from xs_vlm_ocr_ray.functions.urls import domain_of

    urls = pa.array(
        [
            "https://Example.COM/path?q=1",
            "http://sub.site.org:8080/x",
            "file:///local/file.html",
            "not a url",
            None,
        ]
    )
    got = domain_of(urls).to_pylist()
    assert got[0] == "example.com"
    assert got[1] == "sub.site.org"  # port stripped
    assert got[2] is None  # file:// has an empty authority -> no domain
    assert got[3] is None and got[4] is None


def test_domain_stats(ray_session):
    import ray.data as rd

    from xs_vlm_ocr_ray.functions.urls import domain_stats

    rows = [
        {"url": "https://a.com/1", "extracted_text": "xxxx"},
        {"url": "https://a.com/2", "extracted_text": "yy"},
        {"url": "https://b.org/1", "extracted_text": "z"},
        {"url": "garbage", "extracted_text": "ignored"},
    ]
    out = domain_stats(rd.from_items(rows))
    assert out.to_dict("records") == [
        {"domain": "a.com", "total_chars": 6, "n_pages": 2},
        {"domain": "b.org", "total_chars": 1, "n_pages": 1},
    ]


def test_cap_per_domain(ray_session):
    import ray.data as rd

    from xs_vlm_ocr_ray.functions.urls import cap_per_domain

    rows = [
        {"url": f"https://{d}/p{i}", "shard_id": 0, "row_idx": n, "v": n}
        for n, (d, i) in enumerate(
            [("a.com", i) for i in range(5)] + [("b.org", i) for i in range(2)]
        )
    ]
    out = cap_per_domain(rd.from_items(rows), max_per_domain=3).to_pandas()
    # a.com capped to its FIRST 3 rows in lineage order; b.org untouched
    assert len(out) == 5
    kept_a = sorted(out[out["url"].str.contains("a.com")]["row_idx"])
    assert kept_a == [0, 1, 2]
    assert len(out[out["url"].str.contains("b.org")]) == 2
    assert "_domain" not in out.columns and "_bucket" not in out.columns


def test_q_domain_stats_matches_duckdb(ray_session):
    """The q_domain_stats registry entry matches its DuckDB oracle at
    sf0.001 (same derived urls, same lowercase/port/no-scheme rules)."""
    import duckdb
    import pandas as pd

    from xs_vlm_ocr_ray.pipelines.queries import _DOMAIN_STATS_SQL, q_domain_stats

    sf = "/root/testdata/sf0.001"
    got = q_domain_stats(sf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(_DOMAIN_STATS_SQL).df().astype(
        {"total_chars": "int64", "n_pages": "int64"}
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_filter_domains(ray_session):
    """Blocklist filter: exact and parent-domain matches drop; others
    and unparseable urls keep (by default)."""
    import pandas as pd

    import ray.data as rd
    from xs_vlm_ocr_ray.functions.urls import filter_domains

    df = pd.DataFrame(
        {
            "url": [
                "https://spam.example/page",        # exact block
                "https://ads.spam.example/x",       # subdomain of block
                "https://fine.example/y",           # kept
                "https://notspam.example/z",        # NOT a suffix match
                "no-scheme-here",                   # unparseable
            ],
            "v": [1, 2, 3, 4, 5],
        }
    )
    out = filter_domains(rd.from_pandas(df), ["spam.example"]).to_pandas()
    assert sorted(out["v"]) == [3, 4, 5]
    out2 = filter_domains(
        rd.from_pandas(df), ["spam.example"], keep_unparseable=False
    ).to_pandas()
    assert sorted(out2["v"]) == [3, 4]


def test_filter_domains_wildcard_and_depths(ray_session):
    """'*.d.com' ≡ 'd.com' (ADVICE round 3: the wildcard form must not
    silently match nothing); entries of different label depths are each
    matched at their own depth; unsupported wildcards raise."""
    import pandas as pd
    import pytest

    import ray.data as rd
    from xs_vlm_ocr_ray.functions.urls import filter_domains, normalize_blocklist

    df = pd.DataFrame(
        {
            "url": [
                "https://x.ads.net/1",      # blocked via *.ads.net
                "https://ads.net/2",        # blocked (wildcard ≡ parent)
                "https://deep.a.b.c.org/3", # blocked via 3-label a.b.c.org
                "https://b.c.org/4",        # kept (only a.b.c.org blocked)
                "https://clean.com/5",      # kept
            ],
            "v": [1, 2, 3, 4, 5],
        }
    )
    out = filter_domains(rd.from_pandas(df), ["*.ads.net", "a.b.c.org"]).to_pandas()
    assert sorted(out["v"]) == [4, 5]
    assert normalize_blocklist([" *.Ads.NET ", ".b.com"]) == {"ads.net", "b.com"}
    with pytest.raises(ValueError):
        normalize_blocklist(["a.*.com"])
    with pytest.raises(ValueError):
        normalize_blocklist(["*."])
