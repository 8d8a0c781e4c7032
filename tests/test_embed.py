"""Embedding-generation stage: determinism, normalization, and the
text -> embed -> ANN / near-dup end-to-end path."""

import numpy as np
import pyarrow as pa


def test_embedder_deterministic_and_normalized():
    from xs_vlm_ocr_ray.stages.embed import TextEmbedder

    e1, e2 = TextEmbedder(), TextEmbedder()  # separate "actors"
    texts = ["hello world", "hello world", "different text entirely", ""]
    t = pa.table({"doc_id": list(range(4)), "text": texts})
    a = np.stack([np.asarray(v) for v in e1(t)["embedding"].to_pylist()])
    b = np.stack([np.asarray(v) for v in e2(t)["embedding"].to_pylist()])
    assert np.array_equal(a, b)                       # cross-actor determinism
    assert np.array_equal(a[0], a[1])                 # same text, same vector
    assert not np.array_equal(a[0], a[2])
    assert np.allclose(np.linalg.norm(a[:3], axis=1), 1.0, atol=1e-5)
    assert np.array_equal(a[3], np.zeros(64))         # empty text -> zero vec


def test_embedder_similarity_orders_sensibly():
    from xs_vlm_ocr_ray.stages.embed import TextEmbedder

    e = TextEmbedder()
    base = " ".join(f"tok{i}" for i in range(50))
    near = base + " extra"
    far = " ".join(f"other{i}" for i in range(50))
    t = pa.table({"doc_id": [0, 1, 2], "text": [base, near, far]})
    v = np.stack([np.asarray(x) for x in e(t)["embedding"].to_pylist()])
    assert v[0] @ v[1] > v[0] @ v[2]  # near-dup text is cosine-closer


def test_text_to_ann_end_to_end(ray_session):
    """documents text -> add_embeddings -> brute-force ANN: the top-1
    neighbor of any doc's own vector is itself."""
    import ray.data as rd

    from xs_vlm_ocr_ray.stages.ann import brute_force_topk
    from xs_vlm_ocr_ray.stages.embed import add_embeddings

    rows = [
        {"vec_id": i, "text": " ".join(f"w{i}_{j}" for j in range(30))}
        for i in range(20)
    ]
    ds = add_embeddings(rd.from_items(rows))
    emb = ds.to_pandas()
    q = np.asarray(emb.loc[emb["vec_id"] == 7, "embedding"].iloc[0], dtype=np.float64)
    top = brute_force_topk(ds, q, k=3)
    assert int(top.iloc[0]["vec_id"]) == 7
    assert abs(top.iloc[0]["sim"] - 1.0) < 1e-5
