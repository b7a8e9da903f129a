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


def test_png_codec_roundtrip():
    import numpy as np

    from dask_image_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    pixels = list(rng.integers(0, 256, size=5 * 4).astype(int))
    payload = encode_png(pixels, 5, 4)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(payload) == (5, 4, pixels)


def test_png_decoder_unfilters_all_spec_types():
    """Hand-construct an IDAT using every filter type (None/Sub/Up/Average/
    Paeth) and check the decoder reproduces the intended pixels."""
    import struct
    import zlib

    from dask_image_spark.operators.multimodal import decode_png

    width, height = 4, 5
    img = [
        [10, 20, 30, 40],
        [15, 25, 35, 45],
        [100, 110, 120, 130],
        [90, 95, 105, 115],
        [80, 85, 90, 200],
    ]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = [0] * width
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        line = img[r]
        raw.append(ftype)
        for i in range(width):
            left = line[i - 1] if i else 0
            up = prev[i]
            ul = prev[i - 1] if i else 0
            if ftype == 0:
                raw.append(line[i] & 0xFF)
            elif ftype == 1:
                raw.append((line[i] - left) & 0xFF)
            elif ftype == 2:
                raw.append((line[i] - up) & 0xFF)
            elif ftype == 3:
                raw.append((line[i] - (left + up) // 2) & 0xFF)
            else:
                raw.append((line[i] - paeth(left, up, ul)) & 0xFF)
        prev = line

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, got = decode_png(payload)
    assert (w, h) == (width, height)
    assert got == [v for row in img for v in row]


def test_png_decoder_rejects_bad_payloads():
    import pytest as _pytest

    from dask_image_spark.operators.multimodal import decode_png, encode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    good = encode_png([1, 2, 3, 4], 2, 2)
    corrupted = bytearray(good)
    corrupted[-18] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(corrupted))


def test_tiff_codec_roundtrip_and_strips():
    """Encode->decode identity for baseline grayscale TIFF, covering the
    two-strip layout, odd heights (uneven strips), and the single-strip
    inline-offset path."""
    import numpy as np

    from dask_image_spark.operators.multimodal import decode_tiff, encode_tiff

    rng = np.random.default_rng(7)
    for w, h in [(64, 64), (5, 7), (9, 1)]:
        px = rng.integers(0, 256, w * h).astype("uint8")
        got = decode_tiff(encode_tiff(px, w, h))
        assert got == (w, h, list(px))


def test_tiff_decoder_reads_big_endian():
    """The decoder honors the MM byte-order mark and inline SHORT values —
    files our little-endian encoder never produces."""
    import struct

    from dask_image_spark.operators.multimodal import decode_tiff

    data = bytes([10, 20, 30, 40])
    hdr = struct.pack(">2sHI", b"MM", 42, 8 + len(data))

    def entry(tag, typ, count, val):
        return struct.pack(">HHII", tag, typ, count, val)

    def short(tag, val):  # SHORT packs in the field's first two bytes
        return struct.pack(">HHIHH", tag, 3, 1, val, 0)

    entries = [
        entry(256, 4, 1, 2), entry(257, 4, 1, 2), short(258, 8),
        short(259, 1), short(262, 1), entry(273, 4, 1, 8),
        short(277, 1), entry(278, 4, 1, 2), entry(279, 4, 1, 4),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    assert decode_tiff(hdr + data + ifd) == (2, 2, [10, 20, 30, 40])


def test_tiff_decoder_rejects_bad_payloads():
    import pytest

    from dask_image_spark.operators.multimodal import decode_tiff, encode_tiff

    with pytest.raises(ValueError):
        decode_tiff(b"GIF89a..")
    good = bytearray(encode_tiff([1, 2, 3, 4], 2, 2))
    good[2] = 41  # wrong magic
    with pytest.raises(ValueError):
        decode_tiff(bytes(good))


def test_wav_roundtrip_and_edge_samples():
    from dask_image_spark.operators.multimodal import decode_wav, encode_wav

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    rate, out = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert out == samples


def test_wav_decoder_rejects_bad_payloads():
    import struct

    import pytest

    from dask_image_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError):
        decode_wav(b"OggS....")
    # stereo fmt chunk -> unsupported
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(payload)
    # truncated data chunk
    good = bytearray(encode_wav([1, 2, 3], 8000))
    with pytest.raises(ValueError):
        decode_wav(bytes(good[:-2]))


def test_y4m_roundtrip_multiframe():
    from dask_image_spark.operators.multimodal import decode_y4m, encode_y4m

    frames = [
        [i % 256 for i in range(16 * 8)],
        [(i * 3 + 7) % 256 for i in range(16 * 8)],
        [0] * (16 * 8),
    ]
    w, h, fps, ys = decode_y4m(encode_y4m(frames, 16, 8, 30))
    assert (w, h, fps) == (16, 8, 30)
    assert [list(y) for y in ys] == frames


def test_y4m_decoder_rejects_bad_payloads():
    import pytest

    from dask_image_spark.operators.multimodal import decode_y4m, encode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"RIFF....WAVE\n")
    good = encode_y4m([[1] * 4], 2, 2)
    with pytest.raises(ValueError):
        decode_y4m(good[:-2])  # truncated frame
    with pytest.raises(NotImplementedError):
        decode_y4m(good.replace(b"C420", b"C444"))


def test_tiff_multipage_roundtrip_chained_ifds():
    from dask_image_spark.operators.multimodal import (
        decode_tiff,
        decode_tiff_pages,
        encode_tiff_multipage,
    )

    frames = [
        ([(i * 13 + k) % 256 for i in range(w * h)], w, h)
        for k, (w, h) in enumerate([(16, 16), (16, 16), (7, 5), (3, 1)])
    ]
    payload = encode_tiff_multipage(frames)
    pages = decode_tiff_pages(payload)
    assert len(pages) == 4
    for (px, w, h), (dw, dh, dpx) in zip(frames, pages):
        assert (dw, dh) == (w, h)
        assert dpx == px
    # single-page surface reads the first page of a multi-page container
    assert decode_tiff(payload) == pages[0]


def test_tiff_multipage_single_page_equals_encode_tiff():
    from dask_image_spark.operators.multimodal import (
        decode_tiff_pages,
        encode_tiff,
        encode_tiff_multipage,
    )

    px = [(i * 5) % 256 for i in range(12 * 4)]
    assert encode_tiff(px, 12, 4) == encode_tiff_multipage([(px, 12, 4)])
    assert decode_tiff_pages(encode_tiff(px, 12, 4)) == [(12, 4, px)]


def test_tiff_multipage_rejects_cyclic_chain():
    import struct

    import pytest

    from dask_image_spark.operators.multimodal import (
        decode_tiff_pages,
        encode_tiff_multipage,
    )

    payload = bytearray(
        encode_tiff_multipage([([1] * 4, 2, 2), ([2] * 4, 2, 2)])
    )
    # point the SECOND page's next-IFD pointer back at the first IFD
    (first_ifd,) = struct.unpack("<I", payload[4:8])
    second_next = first_ifd + 2 + 12 * 9 + 4 + 16 + 2 + 12 * 9
    payload[second_next : second_next + 4] = struct.pack("<I", first_ifd)
    with pytest.raises(ValueError, match="cyclic"):
        decode_tiff_pages(bytes(payload))


def test_tiff_compressed_roundtrip_all_codecs():
    """LZW (5), DEFLATE (8), and PackBits (32773) strips all round-trip
    through the same IFD walk — single page and multi-page — and the
    compressed payload actually differs from (and, on runny data,
    undercuts) the uncompressed encoding."""
    from dask_image_spark.operators.multimodal import (
        decode_tiff,
        decode_tiff_pages,
        encode_tiff,
        encode_tiff_multipage,
    )

    runny = [(i // 16) % 256 for i in range(64 * 64)]  # 16-byte runs
    mixed = [(i * 7 + 13) % 256 for i in range(64 * 64)]
    plain = encode_tiff(runny, 64, 64)
    for comp in (5, 8, 32773):
        for px in (runny, mixed):
            payload = encode_tiff(px, 64, 64, compression=comp)
            assert decode_tiff(payload) == (64, 64, px), comp
        packed = encode_tiff(runny, 64, 64, compression=comp)
        assert packed != plain
        assert len(packed) < len(plain), comp  # runs must compress
        frames = [(runny, 16, 16), (mixed[:256], 16, 16)]
        multi = encode_tiff_multipage(
            [(f[0][:256], 16, 16) for f in frames], compression=comp
        )
        assert decode_tiff_pages(multi) == [
            (16, 16, runny[:256]), (16, 16, mixed[:256])
        ], comp


def test_tiff_lzw_known_vector():
    """The TIFF 6.0 §13 walk-through input 7 7 7 8 8 7 7 6 6 must emit the
    hand-derived code sequence 256,7,258,8,8,258,6,6,257 (ClearCode, then
    string codes with the KwKwK 258 reuse, then EOI) — packed MSB-first at
    9 bits. The expected bytes are packed by an independent in-test packer,
    so encoder and decoder are not merely checked against each other."""
    from dask_image_spark.operators.multimodal import _lzw_decode, _lzw_encode

    data = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    codes = [256, 7, 258, 8, 8, 258, 6, 6, 257]
    bits = "".join(format(c, "09b") for c in codes)
    bits += "0" * (-len(bits) % 8)
    expected = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert _lzw_encode(data) == expected
    assert _lzw_decode(expected, len(data)) == data


def test_tiff_lzw_early_change_and_width_growth():
    """A low-redundancy strip long enough to push the string table past
    510 and 1022 entries exercises the 9->10->11 bit early-change width
    bumps on both sides."""
    from dask_image_spark.operators.multimodal import _lzw_decode, _lzw_encode

    data = bytes(((i * i * 31 + i * 7) // 3) % 256 for i in range(6000))
    packed = _lzw_encode(data)
    assert _lzw_decode(packed, len(data)) == data


def test_packbits_spec_vector():
    """The worked example in the PackBits section of the TIFF 6.0 spec:
    its packed form must decode to the 24-byte unpacked row, and our
    per-row encoder must round-trip the same row."""
    from dask_image_spark.operators.multimodal import (
        _packbits_decode,
        _packbits_encode,
    )

    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xaa" * 10
    spec_packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert _packbits_decode(spec_packed, len(unpacked)) == unpacked
    assert (
        _packbits_decode(_packbits_encode(unpacked), len(unpacked)) == unpacked
    )
    # -128 is a spec'd no-op byte the decoder must skip
    assert _packbits_decode(b"\x80\x00\x41", 1) == b"A"


def test_tiff_deflate_big_endian():
    """A big-endian (MM) DEFLATE-compressed file — a shape our
    little-endian encoder never emits — decodes through the same tag
    walk: byte order, SHORT inlining, and per-strip inflation compose."""
    import struct
    import zlib

    from dask_image_spark.operators.multimodal import decode_tiff

    px = bytes([10, 20, 30, 40])
    data = zlib.compress(px)
    hdr = struct.pack(">2sHI", b"MM", 42, 8 + len(data))

    def entry(tag, typ, count, val):
        return struct.pack(">HHII", tag, typ, count, val)

    def short(tag, val):
        return struct.pack(">HHIHH", tag, 3, 1, val, 0)

    entries = [
        entry(256, 4, 1, 2), entry(257, 4, 1, 2), short(258, 8),
        short(259, 8), short(262, 1), entry(273, 4, 1, 8),
        short(277, 1), entry(278, 4, 1, 2), entry(279, 4, 1, len(data)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    assert decode_tiff(hdr + data + ifd) == (2, 2, [10, 20, 30, 40])


def test_lzw_packbits_property_roundtrip():
    """Hypothesis: arbitrary byte strips round-trip through both
    from-scratch compressors."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dask_image_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
        _packbits_decode,
        _packbits_encode,
    )

    @settings(deadline=None, max_examples=60)
    @given(st.binary(min_size=0, max_size=800))
    def check(data):
        if data:
            assert _lzw_decode(_lzw_encode(data), len(data)) == data
        assert _packbits_decode(_packbits_encode(data), len(data)) == data

    check()


def test_contiguity_guard_rejects_gapped_slice():
    """VERDICT r7 item 2: the order-sensitive encode fixtures must REFUSE
    an id-gapped data regeneration instead of silently zero-filling the
    hole and grading a plausible-but-wrong number. The shared guard
    accepts a contiguous slice and raises on one with an interior gap."""
    import pandas as pd
    import pytest

    from dask_image_spark.queries.pipeline import assert_contiguous_positions

    ok = pd.DataFrame({"pos": [0, 1, 2, 3], "u": [5, 6, 7, 8]})
    assert assert_contiguous_positions(ok, "clip 0") == 4
    gapped = pd.DataFrame({"pos": [0, 1, 3], "u": [5, 6, 8]})  # 2 missing
    with pytest.raises(ValueError, match="interior event_id gap"):
        assert_contiguous_positions(gapped, "clip 0")


def test_tiff_predictor_and_16bit_roundtrip():
    """Predictor=2 (per-row horizontal differencing) and BitsPerSample=16
    round-trip through every compression tier, and the predictor
    genuinely helps: smooth 16-bit data under LZW must compress strictly
    smaller with differencing than without (the reason real microscopy
    writers pair them)."""
    from dask_image_spark.operators.multimodal import (
        decode_tiff,
        decode_tiff_pages,
        encode_tiff,
        encode_tiff_multipage,
    )

    big = [(i * 257 + 12345) % 65536 for i in range(64 * 64)]
    smooth = [(i // 8) * 16 % 65536 for i in range(64 * 64)]
    for comp in (1, 5, 8, 32773):
        for pred in (1, 2):
            for px in (big, smooth):
                p = encode_tiff(
                    px, 64, 64, compression=comp, predictor=pred, bits=16
                )
                assert decode_tiff(p) == (64, 64, px), (comp, pred)
    mixed8 = [(i * 7 + 13) % 256 for i in range(64 * 64)]
    for comp in (5, 8, 32773):
        p = encode_tiff(mixed8, 64, 64, compression=comp, predictor=2)
        assert decode_tiff(p) == (64, 64, mixed8), comp
    no_pred = len(encode_tiff(smooth, 64, 64, compression=5, bits=16))
    pred = len(
        encode_tiff(smooth, 64, 64, compression=5, predictor=2, bits=16)
    )
    assert pred < no_pred
    multi = encode_tiff_multipage(
        [(big[:256], 16, 16), (smooth[:256], 16, 16)],
        compression=8, predictor=2, bits=16,
    )
    assert decode_tiff_pages(multi) == [
        (16, 16, big[:256]), (16, 16, smooth[:256])
    ]


def test_tiff_16bit_big_endian():
    """Big-endian (MM) 16-bit samples — the decoder must honor the byte
    order when widening strips to sample values."""
    import struct

    from dask_image_spark.operators.multimodal import decode_tiff

    px = [256, 513, 65535, 0]
    data = struct.pack(">4H", *px)
    hdr = struct.pack(">2sHI", b"MM", 42, 8 + len(data))

    def entry(tag, typ, count, val):
        return struct.pack(">HHII", tag, typ, count, val)

    def short(tag, val):
        return struct.pack(">HHIHH", tag, 3, 1, val, 0)

    entries = [
        entry(256, 4, 1, 2), entry(257, 4, 1, 2), short(258, 16),
        short(259, 1), short(262, 1), entry(273, 4, 1, 8),
        short(277, 1), entry(278, 4, 1, 2), entry(279, 4, 1, len(data)),
    ]
    ifd = struct.pack(">H", len(entries)) + b"".join(entries) + struct.pack(">I", 0)
    assert decode_tiff(hdr + data + ifd) == (2, 2, px)


def test_png_multichannel_roundtrip_and_bpp_stride():
    """RGB (color type 2) and RGBA (6) roundtrips — including a
    construction that would break a bpp-unaware Sub unfilter: a
    constant-color row becomes all-zero deltas ONLY with the 3-byte
    stride, so a 1-byte-stride decoder shifts every channel."""
    import random

    from dask_image_spark.operators.multimodal import (
        decode_png,
        decode_png_any,
        encode_png,
    )

    random.seed(9)
    for ct, bpp in ((2, 3), (6, 4)):
        px = [random.randrange(256) for _ in range(24 * 16 * bpp)]
        assert decode_png_any(encode_png(px, 24, 16, color_type=ct)) == (
            24, 16, bpp, px,
        )
    # constant-color RGB rows (odd rows Sub-filtered)
    solid = [200, 30, 90] * (8 * 6)
    assert decode_png_any(encode_png(solid, 8, 6, color_type=2)) == (
        8, 6, 3, solid,
    )
    # the grayscale surface refuses color payloads instead of garbling
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="grayscale surface"):
        decode_png(encode_png(solid, 8, 6, color_type=2))


def test_bmp_codec_roundtrip_and_stride_padding():
    from dask_image_spark.operators.multimodal import (
        decode_bmp_rgb,
        encode_bmp_rgb,
    )

    w, h = 63, 4  # 63*3 = 189 -> stride 192: 3 pad bytes per row
    px = [((i * 7) % 256, (i * 11) % 256, (i * 3) % 256) for i in range(w * h)]
    payload = encode_bmp_rgb(px, w, h)
    # header claims offset 54; padded stride means 192 bytes per row
    assert len(payload) == 54 + 192 * h
    w2, h2, out = decode_bmp_rgb(payload)
    assert (w2, h2) == (w, h)
    assert out == px
    # raw layout: FIRST stored row is the BOTTOM image row, in BGR
    r, g, b = px[(h - 1) * w]
    assert payload[54:57] == bytes((b, g, r))


def test_bmp_decoder_rejects_bad_payloads():
    import struct

    import pytest

    from dask_image_spark.operators.multimodal import (
        decode_bmp_rgb,
        encode_bmp_rgb,
    )

    good = encode_bmp_rgb([(1, 2, 3)] * 4, 2, 2)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp_rgb(b"PNG" + good[2:])
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)  # claim 8-bit palette
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp_rgb(bytes(bad_bpp))
    topdown = bytearray(good)
    struct.pack_into("<i", topdown, 22, -2)  # negative height
    with pytest.raises(ValueError, match="top-down"):
        decode_bmp_rgb(bytes(topdown))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp_rgb(good[:-4])


def test_gif_codec_roundtrip_and_dict_reset():
    import random

    from dask_image_spark.operators.multimodal import (
        decode_gif_gray,
        encode_gif_gray,
    )

    random.seed(11)
    for w, h in [(64, 64), (63, 17), (5, 1)]:
        px = [random.randrange(256) for _ in range(w * h)]
        assert decode_gif_gray(encode_gif_gray(px, w, h)) == (w, h, px)
    # constant run exercises KwKwK + width growth; 27k px forces the
    # 4096-entry dictionary reset (clear code mid-stream)
    px = ([7] * 9000) + [random.randrange(256) for _ in range(9000)] * 2
    assert decode_gif_gray(encode_gif_gray(px, 150, 180)) == (150, 180, px)


def test_gif_decoder_reads_canonical_public_vector():
    """The ubiquitous 1x1 tracking-pixel GIF89a — THIRD-PARTY bytes, not
    our own encoder's: proves the dialect (LSB-first packing, clear code
    first, truncated-EOI tolerance, GCE extension skip, 2-entry
    palette) against a file the whole web serves."""
    import base64

    from dask_image_spark.operators.multimodal import decode_gif_gray

    payload = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert decode_gif_gray(payload) == (1, 1, [0])


def test_gif_decoder_rejects_bad_payloads():
    import pytest

    from dask_image_spark.operators.multimodal import (
        decode_gif_gray,
        encode_gif_gray,
    )

    good = bytearray(encode_gif_gray([1, 2, 3, 4], 2, 2))
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif_gray(b"JIF87a" + bytes(good[6:]))
    colored = bytearray(good)
    colored[13 + 3 * 5] = 99  # palette entry 5: break r==g==b
    with pytest.raises(ValueError, match="non-grayscale"):
        decode_gif_gray(bytes(colored))
    interlaced = bytearray(good)
    # image descriptor starts after 13-byte header + 768-byte GCT
    interlaced[13 + 768 + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif_gray(bytes(interlaced))
    # truncated pixel stream: 2x2 image claiming 3x3
    import struct

    short = bytearray(good)
    struct.pack_into("<HH", short, 13 + 768 + 5, 3, 3)
    with pytest.raises(ValueError, match="truncated GIF pixel"):
        decode_gif_gray(bytes(short))


def test_ppm_codec_roundtrip():
    """P6 color roundtrip preserves every channel in order; the header
    comment must be skipped by the tokenizer."""
    from dask_image_spark.operators.multimodal import decode_ppm, encode_ppm

    rgb = [((i * 5) % 256, (i * 9) % 256, (i * 3) % 256) for i in range(12)]
    payload = encode_ppm(rgb, 4, 3)
    assert payload.startswith(b"P6")
    assert b"#" in payload.split(b"255")[0]  # comment line survived
    w, h, out = decode_ppm(payload)
    assert (w, h) == (4, 3)
    assert out == rgb


def test_ppm_codec_rejects_bad_payloads():
    import pytest

    from dask_image_spark.operators.multimodal import decode_ppm, encode_ppm

    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    good = encode_ppm([(1, 2, 3)], 1, 1)
    with pytest.raises(ValueError, match="truncated PPM"):
        decode_ppm(good[:-1])


def test_pgm_ascii_codec_roundtrip_and_comments():
    """P2 tokens roundtrip; comments and arbitrary whitespace are both
    legal separators per the netpbm spec."""
    from dask_image_spark.operators.multimodal import (
        decode_pgm_ascii,
        encode_pgm_ascii,
    )

    px = [(i * 17) % 256 for i in range(20)]
    payload = encode_pgm_ascii(px, 5, 4)
    assert payload.startswith(b"P2")
    w, h, out = decode_pgm_ascii(payload)
    assert (w, h, out) == (5, 4, px)
    # inject a mid-stream comment and fold whitespace: still decodes
    mangled = payload.replace(b"\n255\n", b"\n255\n# mid comment\n")
    assert decode_pgm_ascii(mangled)[2] == px


def test_pgm_ascii_rejects_bad_payloads():
    import pytest

    from dask_image_spark.operators.multimodal import (
        decode_pgm_ascii,
        encode_pgm_ascii,
    )

    with pytest.raises(ValueError, match="not an ASCII PGM"):
        decode_pgm_ascii(b"P5\n1 1\n255\n\x00")
    good = encode_pgm_ascii([7, 8], 2, 1)
    truncated = good.rsplit(b" ", 1)[0] + b"\n"
    with pytest.raises(ValueError, match="truncated P2 pixel"):
        decode_pgm_ascii(truncated)
