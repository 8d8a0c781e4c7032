"""Unbounded micro-batch session (S3/D2): last-value dedup across batch
boundaries, batch-path byte parity."""

import pyarrow as pa

from xs_vlm_ocr_ray.extract import extract_html
from xs_vlm_ocr_ray.fixtures import gen_page
from xs_vlm_ocr_ray.sources.stream import MicroBatchSession


def _batch(pages):
    return pa.table(
        {
            "url": pa.array([p["url"] for p in pages], pa.string()),
            "html": pa.array([p["html"] for p in pages], pa.binary()),
        }
    )


def test_consecutive_dups_dropped_across_batches():
    p1, p2, p3 = gen_page(1), gen_page(2), gen_page(3)
    s = MicroBatchSession()
    # batch 1 ends with p2; batch 2 starts with p2 again → dropped
    out1 = s.process(_batch([p1, p2, p2]))      # in-batch repeat dropped
    out2 = s.process(_batch([p2, p3]))          # cross-batch repeat dropped
    assert len(out1) == 2 and len(out2) == 1
    assert s.n_seen == 5 and s.n_dropped == 2
    # non-consecutive repeat is NOT dropped (last-value only, D2)
    out3 = s.process(_batch([p1]))
    assert len(out3) == 1


def test_empty_payload_never_deduped():
    s = MicroBatchSession()
    empty = {"url": "e", "html": b""}
    out = s.process(_batch([empty, empty]))
    assert len(out) == 2
    assert (~out["success"].to_pandas()).all()


def test_stream_matches_batch_path():
    s = MicroBatchSession()
    pages = [gen_page(i) for i in range(10, 16)]
    out = s.process(_batch(pages)).to_pandas().set_index("url")
    for p in pages:
        assert out.loc[p["url"], "extracted_text"] == extract_html(p["html"]).full_text


def test_all_duplicate_micro_batch(ray_session):
    """A micro-batch whose every row is deduped away must yield an
    empty result, not an ArrowNotImplementedError from take([])."""
    import pyarrow as pa

    from xs_vlm_ocr_ray.sources.stream import MicroBatchSession

    s = MicroBatchSession()
    page = b"<p>hello hello hello hello hello hello hello hello</p>"
    first = s.process(pa.table({"url": ["u1"], "html": pa.array([page], pa.binary())}))
    assert first.num_rows == 1
    again = s.process(pa.table({"url": ["u2"], "html": pa.array([page], pa.binary())}))
    assert again.num_rows == 0
    assert s.n_dropped == 1
