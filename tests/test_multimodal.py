"""Empty/NULL payload conventions of the multimodal UDF plumbing (ADVICE r1:
the engine and the SQL oracle must agree on zero-length and NULL payloads,
not rely on the fixture never containing one)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_image_spark.functions.localrel import values_df
from dask_image_spark.operators import multimodal


def _docs(spark):
    d = values_df(
        spark, "doc_id, text",
        [(1, "hello"), (2, ""), (3, "x" * 250)],
    )
    null_row = values_df(spark, "doc_id", [(4,)]).withColumn(
        "text", F.lit(None).cast("string")
    )
    return d.unionByName(null_row)


def test_image_meta_empty_and_null(spark):
    got = {
        r["doc_id"]: r
        for r in multimodal.image_meta(
            multimodal.with_binary_payload(_docs(spark))
        ).collect()
    }
    assert got[1]["byte_len"] == 5
    assert got[1]["first_byte"] == ord("h")
    assert got[1]["checksum"] == sum(b"hello") % 65536
    # empty payload: length 0, NULL first byte, zero checksum
    assert got[2]["byte_len"] == 0
    assert got[2]["first_byte"] is None
    assert got[2]["checksum"] == 0
    # NULL payload: everything NULL
    assert got[4]["byte_len"] is None
    assert got[4]["first_byte"] is None
    assert got[4]["checksum"] is None


def test_pgm_codec_roundtrip():
    from dask_image_spark.operators.multimodal import decode_pgm, encode_pgm

    pixels = [(i * 37 + 5) % 256 for i in range(12)]
    payload = encode_pgm(pixels, 4, 3)
    assert payload.startswith(b"P5\n4 3\n255\n")
    w, h, got = decode_pgm(payload)
    assert (w, h, got) == (4, 3, pixels)
    # comment-tolerant header parsing (netpbm allows # comments)
    commented = b"P5\n# made by a tool\n4 3\n255\n" + bytes(bytearray(pixels))
    assert decode_pgm(commented) == (4, 3, pixels)


def test_pgm_codec_rejects_bad_payloads():
    import pytest as _pytest

    from dask_image_spark.operators.multimodal import decode_pgm, encode_pgm

    with _pytest.raises(ValueError, match="not a binary PGM"):
        decode_pgm(b"P6\n1 1\n255\nx")
    with _pytest.raises(ValueError, match="truncated"):
        decode_pgm(encode_pgm([1, 2, 3, 4], 2, 2)[:-2])


def test_frame_sample_empty_and_null(spark):
    rows = multimodal.frame_sample(
        multimodal.with_binary_payload(_docs(spark))
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 1  # 5 bytes -> 1 frame
    assert 2 not in by_doc  # empty payload -> ZERO frames
    assert 4 not in by_doc  # NULL payload -> zero frames
    f3 = sorted(by_doc[3], key=lambda r: r["frame_no"])
    assert [r["frame_len"] for r in f3] == [100, 100, 50]
