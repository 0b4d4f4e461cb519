"""Pipeline transforms, multimodal plumbing, streaming ingest, OPQ,
quantized-index scoring, index transfer/consolidate/iteration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkforward.encoders import LambdaEncoder
from sparkforward.index import Mode, VectorIndex, build_index, transfer_index
from sparkforward.ranking import Ranking

VECTORS = np.array(
    [[1, 0, 0, 0, 0], [1, 1, 0, 0, 0], [1, 1, 1, 0, 0],
     [1, 1, 1, 1, 0], [1, 1, 1, 1, 1]], dtype=np.float32,
)
DOC_IDS = ["d0", "d0", "d1", "d2", "d3"]
QUERIES = {"q1": "query 1", "q2": "query 2"}
ENCODER = LambdaEncoder(lambda _: np.array([1, 1, 1, 1, 1], dtype=np.float32))


# ------------------------------------------------------------- pipeline #
def test_ff_score_and_interpolate_transforms(spark):
    """P1/P2 (ref util/pyterrier.py): PyTerrier column contract end-to-end."""
    from sparkforward.pipeline import ff_interpolate, ff_score_transform

    index = VectorIndex.empty(spark).add(VECTORS, doc_ids=DOC_IDS)
    run = spark.createDataFrame(
        [("q1", "query 1", "d0", 100.0), ("q1", "query 1", "d3", 4.0)],
        "qid string, query string, docno string, score double",
    )
    scored = ff_score_transform(run, index, encoder=ENCODER, mode=Mode.MAXP)
    rows = {r["docno"]: r for r in scored.collect()}
    assert rows["d0"]["score"] == 2.0  # max dot over d0's two passages
    assert rows["d0"]["score_0"] == 100.0  # sparse score preserved
    assert rows["d3"]["score"] == 5.0
    assert set(scored.columns) >= {"qid", "docno", "score", "score_0", "rank"}

    final = ff_interpolate(scored, alpha=0.5)
    frows = {r["docno"]: r for r in final.collect()}
    assert frows["d0"]["score"] == pytest.approx(51.0)  # .5*100 + .5*2
    assert frows["d3"]["score"] == pytest.approx(4.5)
    assert frows["d0"]["rank"] == 0  # pyterrier ranks start at 0


# ------------------------------------------------------------ multimodal #
def test_multimodal_decode_and_features(spark):
    from sparkforward.multimodal import (
        decode_media, extract_features, sample_frames, synthesize_media,
    )

    media = synthesize_media(spark, 30, num_partitions=3)
    meta = decode_media(media).toPandas()
    assert len(meta) == 30
    assert (meta["n_bytes"] == meta["width"] * meta["height"] * meta["channels"] + 9).all()

    feats = extract_features(media, dim=16).toPandas()
    assert len(feats) == 30
    assert all(len(v) == 16 for v in feats["feature"])
    # deterministic across partitionings
    feats2 = extract_features(synthesize_media(spark, 30, num_partitions=1), dim=16).toPandas()
    a = {m: np.asarray(v) for m, v in zip(feats["media_id"], feats["feature"])}
    b = {m: np.asarray(v) for m, v in zip(feats2["media_id"], feats2["feature"])}
    assert all(np.allclose(a[m], b[m]) for m in a)

    frames = sample_frames(media, frame_bytes=256, every_nth=2).toPandas()
    assert (frames["frame_no"] % 2 == 0).all()
    assert len(frames) > 0

    # non-FAKE payload -> NotImplementedError surfaces (decode is stubbed)
    bad = spark.createDataFrame(
        [(99, "image", bytearray(b"PNG\x89: not our container"))],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="NotImplementedError|FAKE"):
        decode_media(bad).collect()


# ------------------------------------------------------------- streaming #
def test_stream_ingest_matches_batch_build(spark, tmp_path):
    """Streamed partials + compaction == batch build, rank-identically."""
    import pandas as pd

    from sparkforward.postings import build_inverted_index
    from sparkforward.streaming import compact_streamed_index, stream_ingest
    from sparkforward.wand import wand_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # batch reference
    batch_idx = build_inverted_index(
        docs.repartition(4), str(tmp_path / "batch"), num_partitions=4
    )
    # streamed: feed the same parquet through a file stream
    src_dir = str(tmp_path / "src")
    docs.repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )
    q = stream_ingest(stream, str(tmp_path / "stream"))
    q.awaitTermination(120)
    streamed_idx = compact_streamed_index(
        spark, str(tmp_path / "stream"), num_partitions=4
    )

    qdf = spark.createDataFrame(
        [("q1", "spark query join"), ("q2", "big small value")],
        "q_id string, query string",
    )
    a = wand_topk(batch_idx, qdf, k=10).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    b = wand_topk(streamed_idx, qdf, k=10).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------------ OPQ #
def test_opq_beats_or_matches_pq(spark):
    from sparkforward.quantize import OPQ, ProductQuantizer, deserialize_quantizer

    rng = np.random.default_rng(5)
    # correlated data: rotation should help
    base = rng.standard_normal((600, 4)).astype(np.float32)
    X = np.hstack([base, base @ rng.standard_normal((4, 12)).astype(np.float32)])
    pq = ProductQuantizer(M=4, Ks=16).fit(X)
    opq = OPQ(M=4, Ks=16, rotation_iters=3).fit(X)
    mse_pq = float(((pq.decode(pq.encode(X)) - X) ** 2).mean())
    mse_opq = float(((opq.decode(opq.encode(X)) - X) ** 2).mean())
    assert mse_opq <= mse_pq * 1.05  # OPQ no worse (usually much better)
    # serialize round trip restores the rotation
    opq2 = deserialize_quantizer(opq.serialize())
    assert type(opq2).__name__ == "OPQ"
    assert np.array_equal(opq2.encode(X), opq.encode(X))


def test_quantized_index_end_to_end(spark):
    """build_index with a quantizer -> write/load -> scoring still ranks."""
    import tempfile

    from sparkforward.quantize import ProductQuantizer
    from sparkforward.score import ff_score

    rng = np.random.default_rng(11)
    dim = 16
    corpus = spark.createDataFrame(
        [(f"d{i}", f"text {i}") for i in range(40)], "doc_id string, text string"
    )
    enc = LambdaEncoder(
        lambda t: rng.standard_normal(dim).astype(np.float32)
        if False
        else np.asarray(
            np.random.default_rng(abs(hash(t)) % (2**31)).standard_normal(dim),
            dtype=np.float32,
        )
    )
    q = ProductQuantizer(M=4, Ks=16)
    idx = build_index(corpus, enc, quantizer=q, quantizer_fit_sample=40)
    path = tempfile.mkdtemp(prefix="qidx_")
    reloaded = VectorIndex.load(spark, idx.write(path).path)
    assert reloaded.quantizer is not None

    run = {"q1": {f"d{i}": float(i) for i in range(40)}}
    ranking = Ranking.from_run(spark, run, queries={"q1": "probe"})
    out = ff_score(
        ranking, reloaded, encoder=enc, mode=Mode.MAXP, check_missing=True
    )
    scores = out["q1"]
    assert len(scores) == 40  # all candidates scored from decoded codes


def test_transfer_consolidate_iter(spark):
    from sparkforward.quantize import ProductQuantizer

    idx = VectorIndex.empty(spark).add(
        np.tile(VECTORS, (1, 2)).astype(np.float32), doc_ids=DOC_IDS
    )  # dim 10, not divisible constraints: M=2 -> dsub 5
    # transfer with quantization (ref Indexer.from_index)
    q = ProductQuantizer(M=2, Ks=4)
    tq = transfer_index(idx, quantizer=q, quantizer_fit_sample=5)
    assert tq.quantizer is not None
    assert len(tq) == 5
    # transfer back to float (dequantize path)
    tf = transfer_index(tq)
    assert tf.quantizer is None
    assert tf.dim == 10

    # consolidate keeps content
    c = idx.consolidate()
    assert len(c) == 5 and c.doc_ids == set(DOC_IDS)

    # batch_iter yields insertion order
    batches = list(idx.batch_iter(batch_size=2))
    all_docs = [d for _, ds, _ in batches for d in ds]
    assert all_docs == DOC_IDS
    assert sum(v.shape[0] for v, _, _ in batches) == 5


def test_index_from_dicts_insertion_order(spark):
    """Indexer.from_dicts parity (ref util/indexer.py:151-167): FIRSTP sees
    the first-inserted vector even without psg ids."""
    from sparkforward.index import index_from_dicts
    from sparkforward.score import ff_score

    calls = []

    def enc_fn(text):
        calls.append(text)
        return np.array([float(len(text)), 1.0], dtype=np.float32)

    corpus = [
        {"doc_id": "d0", "text": "xx"},      # first inserted for d0 -> len 2
        {"doc_id": "d0", "text": "xxxxxx"},  # second
        {"doc_id": "d1", "text": "xxxx"},
    ]
    idx = index_from_dicts(spark, iter(corpus), LambdaEncoder(enc_fn))
    run = {"q1": {"d0": 1.0, "d1": 2.0}}
    ranking = Ranking.from_run(spark, run, queries={"q1": "q"})
    qenc = LambdaEncoder(lambda _: np.array([1.0, 0.0], dtype=np.float32))
    firstp = ff_score(ranking, idx, encoder=qenc, mode=Mode.FIRSTP,
                      batch_size=7)  # batch_size accepted for API parity
    assert firstp["q1"] == {"d0": 2.0, "d1": 4.0}
    maxp = ff_score(ranking, idx, encoder=qenc, mode=Mode.MAXP)
    assert maxp["q1"] == {"d0": 6.0, "d1": 4.0}
