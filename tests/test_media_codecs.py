"""Unit tests for the stdlib media codecs (PNG/BMP/WAV) and the real
multimodal decode path built on them."""

from __future__ import annotations

import hashlib

import pytest

from etl_upc_syllabus_spark.operators.media_codecs import (
    MediaFormatError,
    _lzw_decode,
    _lzw_encode,
    decode_avi,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_wav,
    encode_avi,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_wav,
    sniff,
)
from etl_upc_syllabus_spark.operators.multimodal import (
    _encode_payload,
    _image_dims,
    _image_pixels,
    _video_dims,
    _video_frames,
    decode_audio,
    decode_image,
    decode_video,
)


@pytest.mark.parametrize(
    "w,h,ch", [(1, 1, 1), (4, 4, 1), (13, 11, 1), (16, 14, 1), (7, 9, 3), (5, 1, 3)]
)
def test_png_roundtrip(w, h, ch):
    px = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    got = decode_png(encode_png(w, h, px, ch))
    assert got == (w, h, ch, px)


def test_png_exercises_every_filter():
    # 6 rows -> filter types 0,1,2,3,4,0; wrong/skipped reversal breaks bytes.
    w, h = 8, 6
    px = bytes((i * 201 + 17) % 256 for i in range(w * h))
    enc = encode_png(w, h, px)
    raw_filters = set()
    import struct
    import zlib

    pos = 8
    while pos + 8 <= len(enc):
        (length,) = struct.unpack_from(">I", enc, pos)
        tag = enc[pos + 4 : pos + 8]
        if tag == b"IDAT":
            raw = zlib.decompress(enc[pos + 8 : pos + 8 + length])
            raw_filters = {raw[y * (w + 1)] for y in range(h)}
        pos += 12 + length
    assert raw_filters == {0, 1, 2, 3, 4}
    assert decode_png(enc)[3] == px


def test_png_crc_corruption_detected():
    enc = bytearray(encode_png(4, 4, bytes(16)))
    enc[20] ^= 0xFF
    with pytest.raises(MediaFormatError, match="CRC"):
        decode_png(bytes(enc))


@pytest.mark.parametrize("w,h,ch", [(1, 7, 1), (4, 4, 1), (13, 11, 1), (5, 3, 3)])
def test_bmp_roundtrip(w, h, ch):
    # widths chosen to hit 0..3 bytes of row padding
    px = bytes((i * 53 + 7) % 256 for i in range(w * h * ch))
    assert decode_bmp(encode_bmp(w, h, px, ch)) == (w, h, ch, px)


@pytest.mark.parametrize("n", [16, 97, 111])  # 111 = odd -> RIFF pad byte
def test_wav_roundtrip(n):
    pcm = bytes((i * 31 + 3) % 256 for i in range(n))
    assert decode_wav(encode_wav(pcm)) == (n, 8000, pcm)


def test_wav_tolerates_extra_chunks():
    import struct

    pcm = bytes(range(32))
    enc = encode_wav(pcm)
    # splice an unknown LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = enc[:fmt_end] + extra + enc[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (32, 8000, pcm)


@pytest.mark.parametrize("w,h,n", [(1, 1, 2), (4, 4, 2), (10, 8, 13), (64, 64, 3)])
def test_gif_roundtrip(w, h, n):
    frames = [bytes((f * 7 + i) % 256 for i in range(w * h)) for f in range(n)]
    assert decode_gif(encode_gif(w, h, frames)) == (w, h, frames)


def test_gif_lzw_table_reset():
    # >4096 LZW codes forces a mid-stream clear + table rebuild
    data = bytes((i * i * 31 + i * 17 + 5) % 256 for i in range(300 * 300))
    assert _lzw_decode(_lzw_encode(data)) == data


def test_gif_rejects_garbage():
    with pytest.raises(MediaFormatError):
        decode_gif(b"GIF89a\x00")


def test_decode_video_true_frames():
    payload = _encode_payload(5, "video")  # doc_id 5 -> video row
    meta = decode_video(payload)
    w, h, nf = _video_dims(5)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, nf)
    assert meta["content_hash"] == hashlib.md5(b"".join(_video_frames(5))).hexdigest()


def test_decode_video_compressed_raises_not_implemented():
    # a real compressed codec payload is honest ffmpeg territory
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00\x00\x00\x18ftypmp42 fake mp4 header")


@pytest.mark.parametrize("w,h,n", [(4, 4, 1), (6, 5, 4), (7, 3, 2), (13, 2, 3)])
def test_avi_roundtrip(w, h, n):
    # widths 6/7/13 exercise the 4-byte DIB row padding reversal
    frames = [bytes((f * 7 + i) % 256 for i in range(w * h)) for f in range(n)]
    assert decode_avi(encode_avi(w, h, frames)) == (w, h, frames)


def test_avi_rejects_garbage_and_compressed():
    with pytest.raises(MediaFormatError):
        decode_avi(b"RIFF\x00\x00\x00\x00AVI ")  # no headers/frames
    with pytest.raises(MediaFormatError):
        decode_avi(b"not even riff")
    # a '00dc' (compressed) frame chunk is refused, not misread
    good = encode_avi(4, 2, [bytes(8)])
    with pytest.raises(MediaFormatError):
        decode_avi(good.replace(b"00db", b"00dc"))


def test_decode_video_avi_true_frames():
    payload = _encode_payload(2, "video")  # doc_id 2 % 6 == 2 -> AVI row
    assert sniff(payload) == "avi"
    meta = decode_video(payload)
    w, h, nf = _video_dims(2)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, nf)
    assert meta["content_hash"] == hashlib.md5(b"".join(_video_frames(2))).hexdigest()
    # the GIF twin of the same dims/frames hashes identically (container-
    # agnostic oracle contract)
    assert sniff(_encode_payload(5, "video")) == "gif"


def test_metadata_stage_quarantines_corrupt_media(spark):
    """ADVICE r5: corrupt/truncated payloads (MediaFormatError or the
    struct/zlib errors a malformed header surfaces) must DEGRADE to
    length-derived features like unknown codecs do -- never fail the
    stage."""
    from etl_upc_syllabus_spark.operators.multimodal import extract_media_metadata

    good_png = _encode_payload(6, "image")
    rows = [
        (1, "image", good_png[:20]),              # truncated PNG -> struct/format error
        (2, "image", good_png[:-4] + b"\x00\x00\x00\x00"),  # bad CRC -> MediaFormatError
        (3, "audio", b"RIFF\x08\x00\x00\x00WAVEjunk"),      # missing fmt/data
        (4, "video", b"\x00\x00\x00\x18ftypmp42 compressed"),  # NotImplementedError
        (5, "image", good_png),                   # control: still really decodes
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media_type string, payload binary")
    got = {r["doc_id"]: r for r in extract_media_metadata(df).collect()}
    assert len(got) == 5
    w, h = _image_dims(6)
    assert (got[5]["width"], got[5]["height"]) == (w, h)
    assert got[5]["content_hash"] == hashlib.md5(_image_pixels(6)).hexdigest()
    for i in (1, 2, 3, 4):  # degraded rows: md5 of the raw payload bytes
        assert got[i]["content_hash"] == hashlib.md5(bytes(rows[i - 1][2])).hexdigest()


def test_sniff():
    assert sniff(encode_png(2, 2, bytes(4))) == "png"
    assert sniff(encode_bmp(2, 2, bytes(4))) == "bmp"
    assert sniff(encode_wav(b"ab")) == "wav"
    assert sniff(encode_gif(2, 2, [bytes(4)])) == "gif"
    assert sniff(b"plain text") is None


@pytest.mark.parametrize("doc_id", [0, 3, 6, 9, 12, 78])  # alternating PNG/BMP
def test_decode_image_true_dimensions_and_pixels(doc_id):
    payload = _encode_payload(doc_id, "image")
    meta = decode_image(payload)
    w, h = _image_dims(doc_id)
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["content_hash"] == hashlib.md5(_image_pixels(doc_id)).hexdigest()
    # fake-by-length would differ: dims are NOT a function of payload length
    assert (len(payload) % 640, (len(payload) * 7) % 480) != (w, h)


def test_decode_audio_true_sample_count():
    payload = _encode_payload(7, "audio")
    meta = decode_audio(payload)
    assert meta["n_frames"] == 7 % 97 + 16
    assert meta["width"] == 0 and meta["height"] == 0


def test_decode_image_rejects_non_image():
    with pytest.raises(MediaFormatError):
        decode_image(b"not an image at all")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _dims = st.tuples(st.integers(1, 24), st.integers(1, 24))

    @settings(max_examples=40, deadline=None)
    @given(dims=_dims, seed=st.integers(0, 2**31), ch=st.sampled_from([1, 3]))
    def test_png_roundtrip_property(dims, seed, ch):
        w, h = dims
        px = bytes((seed + i * 2654435761) % 256 for i in range(w * h * ch))
        assert decode_png(encode_png(w, h, px, ch)) == (w, h, ch, px)

    @settings(max_examples=40, deadline=None)
    @given(dims=_dims, seed=st.integers(0, 2**31), ch=st.sampled_from([1, 3]))
    def test_bmp_roundtrip_property(dims, seed, ch):
        w, h = dims
        px = bytes((seed + i * 40503) % 256 for i in range(w * h * ch))
        assert decode_bmp(encode_bmp(w, h, px, ch)) == (w, h, ch, px)

    @settings(max_examples=40, deadline=None)
    @given(pcm=st.binary(min_size=1, max_size=4096))
    def test_wav_roundtrip_property(pcm):
        assert decode_wav(encode_wav(pcm)) == (len(pcm), 8000, pcm)

    @settings(max_examples=25, deadline=None)
    @given(dims=_dims, seed=st.integers(0, 2**31), n=st.integers(1, 8))
    def test_gif_roundtrip_property(dims, seed, n):
        w, h = dims
        frames = [
            bytes((seed + f * 131 + i * 31) % 256 for i in range(w * h))
            for f in range(n)
        ]
        assert decode_gif(encode_gif(w, h, frames)) == (w, h, frames)

    @settings(max_examples=30, deadline=None)
    @given(data=st.binary(min_size=0, max_size=8192))
    def test_lzw_roundtrip_property(data):
        assert _lzw_decode(_lzw_encode(data)) == data

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_scene_change_detects_planted_cut(spark):
    from etl_upc_syllabus_spark.operators.multimodal import detect_scene_changes

    w, h = 4, 3
    quiet = bytes([32] * (w * h))
    nearly = bytes([33] * (w * h))  # mean |diff| = 1: below threshold
    cut = bytes([200] * (w * h))  # mean |diff| = 167: hard cut
    frames = [quiet, nearly, cut, cut]
    media = spark.createDataFrame(
        [(1, "video", encode_gif(w, h, frames)), (2, "video", encode_avi(w, h, frames)),
         (3, "image", b"not a video")],
        "doc_id long, media_type string, payload binary",
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r
        for r in detect_scene_changes(media).collect()
    }
    # image row filtered out; both containers produce identical analysis
    assert set(rows) == {(d, f) for d in (1, 2) for f in (1, 2, 3)}
    for d in (1, 2):
        assert rows[(d, 1)]["abs_diff_sum"] == w * h  # 32 -> 33
        assert rows[(d, 1)]["is_cut"] == 0
        assert rows[(d, 2)]["abs_diff_sum"] == 167 * w * h  # 33 -> 200
        assert rows[(d, 2)]["is_cut"] == 1
        assert rows[(d, 3)]["abs_diff_sum"] == 0  # identical frames
        assert rows[(d, 3)]["is_cut"] == 0


def test_scene_change_single_frame_video_emits_nothing(spark):
    from etl_upc_syllabus_spark.operators.multimodal import detect_scene_changes

    media = spark.createDataFrame(
        [(1, "video", encode_gif(2, 2, [bytes(4)]))],
        "doc_id long, media_type string, payload binary",
    )
    assert detect_scene_changes(media).count() == 0


def test_ahash_container_independent(spark):
    from etl_upc_syllabus_spark.operators.multimodal import perceptual_ahash

    w, h = 10, 7
    px = bytes((x * 23 + y * 7) % 200 for y in range(h) for x in range(w))
    other = bytes(255 - b for b in px)
    media = spark.createDataFrame(
        [
            (1, "image", encode_png(w, h, px)),
            (2, "image", encode_bmp(w, h, px)),   # same pixels, other codec
            (3, "image", encode_png(w, h, other)),
            (4, "video", b"ignored"),
        ],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in perceptual_ahash(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["ahash"] == rows[2]["ahash"]  # container-independent
    assert rows[1]["ahash"] != rows[3]["ahash"]
    assert len(rows[1]["ahash"]) == 64 and set(rows[1]["ahash"]) <= {"0", "1"}
    assert (rows[1]["src_w"], rows[1]["src_h"]) == (w, h)


def test_audio_fingerprint_energy_deltas(spark):
    from etl_upc_syllabus_spark.operators.multimodal import audio_fingerprint

    # 24 samples = 3 full windows: energies 8*10, 8*200, 8*50 -> bits "10"
    pcm = bytes([10] * 8 + [200] * 8 + [50] * 8)
    short = bytes([99] * 7)  # 0 full windows -> empty fingerprint
    media = spark.createDataFrame(
        [(1, "audio", encode_wav(pcm)), (2, "audio", encode_wav(short)),
         (3, "image", b"ignored")],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r["doc_id"]: r for r in audio_fingerprint(media).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["fingerprint"] == "10" and rows[1]["n_frames"] == 3
    assert rows[2]["fingerprint"] == "" and rows[2]["n_frames"] == 0


def test_multimodal_dedup_e2e_collapses_reencoded(spark):
    from etl_upc_syllabus_spark.operators.multimodal import perceptual_ahash
    from pyspark.sql import functions as F

    w, h = 8, 8
    px = bytes((x * 31 + y * 3) % 180 for y in range(h) for x in range(w))
    media = spark.createDataFrame(
        [(1, "image", encode_png(w, h, px)), (2, "image", encode_bmp(w, h, px)),
         (3, "image", encode_png(w, h, bytes(255 - b for b in px)))],
        "doc_id long, media_type string, payload binary",
    )
    groups = (
        perceptual_ahash(media)
        .groupBy("ahash")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_n = sorted((r["n"], r["keeper"]) for r in groups)
    assert by_n == [(1, 3), (2, 1)]  # PNG+BMP twins collapse, keeper = min id
