"""Document chunking (operators/chunking)."""

import pandas as pd
import pytest

from geeflow_spark.operators import chunking


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    out = chunking.chunk_documents(df, **kw).toPandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def test_chunk_windows_exact(spark):
    text = " ".join(f"t{i}" for i in range(10))
    out = _chunks(spark, [text], max_tokens=4, overlap=1)
    # stride 3, ceil((10-1)/3) = 3 chunks: [0:4], [3:7], [6:10]
    assert out["chunk_id"].tolist() == [0, 1, 2]
    assert out["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert out["chunk_tokens"].tolist() == [4, 4, 4]


def test_chunk_short_and_empty_docs(spark):
    out = _chunks(spark, ["only two", ""], max_tokens=5, overlap=2)
    # short doc passes through whole; empty text -> one empty chunk
    assert len(out) == 2
    assert out.loc[0, "chunk_text"] == "only two"
    assert out.loc[0, "chunk_tokens"] == 2
    assert out.loc[1, "chunk_text"] == ""


def test_chunk_tail_partial_window(spark):
    text = " ".join(f"t{i}" for i in range(7))
    out = _chunks(spark, [text], max_tokens=4, overlap=0)
    assert out["chunk_text"].tolist() == ["t0 t1 t2 t3", "t4 t5 t6"]
    assert out["chunk_tokens"].tolist() == [4, 3]


def test_chunk_overlap_validation(spark):
    df = None
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, max_tokens=4, overlap=-1)


def test_pack_sequences_prefix_math(spark):
    # tokens [5,4,3,2,6] in rank order, budget 7: exclusive prefixes
    # [0,5,9,12,14] -> packs [0,0,1,1,2], offsets [0,5,2,5,0]; row 1
    # straddles packs 0/1 (offset 5 + 4 tokens > 7) - allowed by the
    # concatenate-and-cut contract. bucket_size=2 forces the
    # multi-bucket offset path.
    pdf = pd.DataFrame({"rank": [0, 1, 2, 3, 4],
                        "chunk_tokens": [5, 4, 3, 2, 6]})
    out = chunking.pack_sequences(
        spark.createDataFrame(pdf).repartition(3), budget=7,
        order_col="rank", bucket_size=2).toPandas() \
        .sort_values("rank").reset_index(drop=True)
    assert out["prefix_tokens"].tolist() == [0, 5, 9, 12, 14]
    assert out["pack_id"].tolist() == [0, 0, 1, 1, 2]
    assert out["pack_offset"].tolist() == [0, 5, 2, 5, 0]
    with pytest.raises(ValueError):
        chunking.pack_sequences(None, budget=0, order_col="rank")


@pytest.mark.parametrize("m,o", [(3, 0), (5, 2), (8, 3), (4, 1)])
def test_chunk_reconstruction_property(spark, m, o):
    # Lossless-coverage property over a seeded sweep of doc lengths
    # 0..60: chunk 0's tokens plus every later chunk's tokens after
    # dropping the first `o` (the overlap) reassemble the original
    # token sequence exactly - no token lost, duplicated, or
    # reordered, for any (max_tokens, overlap).
    import numpy as np
    rng = np.random.RandomState(7)
    texts = [" ".join(f"w{rng.randint(100)}_{j}" for j in range(n))
             for n in list(range(0, 15)) + list(rng.randint(15, 61, 40))]
    out = _chunks(spark, texts, max_tokens=m, overlap=o)
    for i, text in enumerate(texts):
        orig = text.split() if text else [""]
        chunks = out[out.doc_id == i].sort_values("chunk_id")
        rebuilt = []
        for j, ct in enumerate(chunks["chunk_text"]):
            toks = ct.split(" ") if ct != "" or orig == [""] else []
            rebuilt.extend(toks if j == 0 else toks[o:])
        if orig == [""]:
            assert chunks["chunk_text"].tolist() == [""]
        else:
            assert rebuilt == orig, (i, m, o)


def test_chunk_null_text(spark):
    # NULL text must behave like empty text: one empty chunk with
    # chunk_tokens >= 0 (size(NULL) is -1 under non-ANSI Spark - a
    # -1 would silently shift every later pack prefix).
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": [None, "two words"]}))
    out = chunking.chunk_documents(df, max_tokens=4).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "chunk_text"] == ""
    assert out.loc[0, "chunk_tokens"] >= 0
    assert (out["chunk_tokens"] >= 0).all()
