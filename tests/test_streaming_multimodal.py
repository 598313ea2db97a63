from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import multimodal
from iris_project_database_refresh_spark.streaming import joins as sj
from iris_project_database_refresh_spark.streaming import pipeline as sp

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted({**multimodal.QUERIES, **sp.QUERIES, **sj.QUERIES}))
def test_matches_oracle(spark, oracle, name):
    merged_q = {**multimodal.QUERIES, **sp.QUERIES, **sj.QUERIES}
    merged_o = {**multimodal.ORACLES, **sp.ORACLES, **sj.ORACLES}
    assert_matches_oracle(merged_q[name](spark, SF_CORRECT), oracle, merged_o[name])


def test_streaming_rollup_equals_batch(spark):
    got = sp.run_available_now(spark, SF_CORRECT, table="rollup_test")
    want = sp.events_tumbling_agg(spark, SF_CORRECT)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w, f"streaming/batch divergence: {len(g ^ w)} rows differ"


def test_stateful_sessionizer_closes_sessions(spark):
    """availableNow drain of the stateful sessionizer: every closed
    session must agree with the batch sessionize result for that user."""
    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.operators.relational import sessionize
    from iris_project_database_refresh_spark.streaming.sessions import streaming_sessionize

    stream = sp.read_events_stream(spark, SF_CORRECT).select("user_id", "event_id", "ts")
    q = (
        streaming_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sessions_test").collect()
    assert got, "no sessions closed"
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in sessionize(spark, SF_CORRECT).collect()
    }
    matched = 0
    for r in got:
        key = (r.user_id, r.session_start, r.session_end)
        assert key in batch, f"streamed session not in batch result: {key}"
        assert batch[key] == r.n_events
        matched += 1
    assert matched == len(got)


def test_decode_features_batching(spark):
    media = multimodal.media_table(spark, SF_CORRECT)
    feats = multimodal.decode_features(media)
    assert feats.count() == media.count()
    row = feats.first()
    assert 0.0 <= row.f0 <= 1.0 and 0.0 <= row.f1 <= 1.0
    assert row.decoder == "fake-md5-v1"


def test_image_header_parser():
    """The stdlib middle tier of the decode seam reads real container
    headers: constructed PNG/GIF/BMP/JPEG byte strings yield their
    planted dimensions; text payloads (including a 'BM'-prefixed one)
    fall through to None so the graded md5-stub path is untouched."""
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 480) + b"\x08"
    assert multimodal.parse_image_header(png) == ("png", 640, 480)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    assert multimodal.parse_image_header(gif) == ("gif", 320, 200)

    bmp = (
        b"BM" + struct.pack("<IHHI", 1062, 0, 0, 54)
        + struct.pack("<I", 40) + struct.pack("<ii", 16, -32) + b"\x00" * 8
    )
    assert multimodal.parse_image_header(bmp) == ("bmp", 16, 32)

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
        + b"\x03" + b"\x00" * 9
    )
    assert multimodal.parse_image_header(jpeg) == ("jpeg", 640, 480)

    assert multimodal.parse_image_header(b"plain document text") is None
    assert multimodal.parse_image_header(b"BMW sales rose in fiscal 2024 by ") is None

    (f0, f1), name = multimodal.decode_payload(png)
    assert name in ("pil", "header-png") and (f0, f1) == (0.64, 0.48)
    _, name = multimodal.decode_payload(b"plain document text")
    assert name == "fake-md5-v1"


def test_streaming_dedup_matches_batch(spark):
    """dropDuplicatesWithinWatermark over the self-unioned stream must
    reproduce the batch distinct exactly."""
    from iris_project_database_refresh_spark.streaming.dedup import (
        events_dedup,
        run_dedup_available_now,
    )

    got = run_dedup_available_now(spark, SF_CORRECT)
    want = events_dedup(spark, SF_CORRECT)
    assert got.count() == want.count()
    key = lambda r: (r.event_id,)  # noqa: E731
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_stream_join_equals_batch(spark):
    """The watermarked stream-stream interval join must produce exactly
    the batch join's pairs once the directory is drained (watermark
    eviction may not drop any legitimate match)."""
    got = sj.run_join_available_now(spark, SF_CORRECT, table="vp_join_test")
    want = sj.events_view_purchase_join(spark, SF_CORRECT)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_static_enrichment_equals_batch(spark):
    from iris_project_database_refresh_spark.streaming import enrich

    got = enrich.run_enriched_available_now(spark, SF_CORRECT, table="enrich_test")
    want = enrich.events_enriched_agg(spark, SF_CORRECT)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_ewma_equals_batch(spark):
    """availableNow drain of the stateful EWMA: the final smoothed value
    per user must equal the batch fold's last row exactly (identical
    IEEE op order in both paths)."""
    from iris_project_database_refresh_spark.operators.timeseries import events_ewma
    from iris_project_database_refresh_spark.streaming.ewma import streaming_ewma

    stream = sp.read_events_stream(spark, SF_CORRECT).select(
        "user_id", "event_id", "ts", "value"
    )
    q = (
        streaming_ewma(stream)
        .writeStream.format("memory")
        .queryName("ewma_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {}
    n_streamed = {}
    for r in spark.table("ewma_test").collect():
        # multiple micro-batches re-emit a user; keep the latest state
        if r.user_id not in n_streamed or r.n_events > n_streamed[r.user_id]:
            n_streamed[r.user_id] = r.n_events
            got[r.user_id] = (r.last_ts, r.ewma)

    last_batch = {}
    for r in events_ewma(spark, SF_CORRECT).collect():
        cur = last_batch.get(r.user_id)
        if cur is None or (r.ts, r.event_id) > cur[0]:
            last_batch[r.user_id] = ((r.ts, r.event_id), r.ewma)

    assert set(got) == set(last_batch)
    for uid, (last_ts, ewma) in got.items():
        (batch_ts, _), batch_ewma = last_batch[uid]
        assert last_ts == batch_ts
        # batch output is floor-rounded to 6dp; state keeps full precision
        assert abs(ewma - batch_ewma) < 1e-6


def test_phash_finds_planted_exact_copies(spark):
    """Every planted exact copy (doc_id + 100000) must pair with its
    original at Hamming distance 0; the banded join may surface more
    near pairs, never fewer."""
    from iris_project_database_refresh_spark.operators.multimodal import (
        multimodal_phash_dedup,
    )

    rows = multimodal_phash_dedup(spark, SF_CORRECT).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in rows}
    import duckdb  # count planted copies

    n_planted = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_CORRECT}/documents.parquet') WHERE doc_id % 7 = 0"
    ).fetchone()[0]
    found = [d for (a, b), d in pairs.items() if b == a + 100000]
    assert len(found) == n_planted
    assert all(d == 0 for d in found)


def test_wav_header_parser_rejects_non_audio():
    from iris_project_database_refresh_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(b"this is just document text, not RIFF") is None
    assert parse_wav_header(b"RIFF\x00\x00\x00\x00JUNK") is None
    assert parse_wav_header(b"") is None
    # a minimal valid container round-trips its fields
    import struct

    data = b"ab" * 10
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    assert parse_wav_header(hdr + data) == (16000, 2, 16, 5)


def test_streaming_llm_costs_equals_batch(spark):
    from iris_project_database_refresh_spark.operators.monitor import monitor_llm_costs
    from iris_project_database_refresh_spark.streaming.costs import (
        run_llm_costs_available_now,
    )

    got = run_llm_costs_available_now(spark, SF_CORRECT)
    want = monitor_llm_costs(spark, SF_CORRECT)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_y4m_stream_parser_rejects_non_video():
    from iris_project_database_refresh_spark.operators.multimodal import parse_y4m_stream

    assert parse_y4m_stream(b"plain document text") is None
    assert parse_y4m_stream(b"YUV4MPEG2 W4 H4") is None  # no newline
    assert parse_y4m_stream(b"YUV4MPEG2 W4 H4\nJUNK") is None  # bad frame marker
    assert parse_y4m_stream(b"YUV4MPEG2 W4 H4 F25:1\nFRAME\nxx") is None  # truncated
    # a minimal valid stream round-trips header fields and frame count
    frame = b"y" * 16 + b"u" * 4 + b"v" * 4  # 4x4 C420 = 24 bytes
    stream = b"YUV4MPEG2 W4 H4 F30:1 Ip A1:1 C420\n" + (b"FRAME\n" + frame) * 3
    assert parse_y4m_stream(stream) == (4, 4, 30, 1, 3)
    # chroma variants change the frame size
    s422 = b"YUV4MPEG2 W4 H4 F24:1 C422\n" + b"FRAME\n" + b"x" * 32
    assert parse_y4m_stream(s422) == (4, 4, 24, 1, 1)


def test_streaming_hopping_equals_batch(spark):
    """availableNow drain of the hopping-window rollup must equal the
    batch events_hopping_agg bit-for-bit (every event in exactly
    window/slide = 2 windows on both paths)."""
    from iris_project_database_refresh_spark.operators.olap import events_hopping_agg

    got = sp.run_hopping_available_now(spark, SF_CORRECT)
    want = events_hopping_agg(spark, SF_CORRECT)
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w, f"streaming/batch divergence: {len(g ^ w)} rows differ"


def test_stateful_rate_limiter_matches_batch(spark):
    """availableNow drain of the stateful token-bucket limiter: the
    final per-user summaries must equal the batch replay operator
    bit-for-bit (same integer arithmetic, same event order)."""
    from iris_project_database_refresh_spark.operators.timeseries import (
        events_rate_limit_sim,
    )
    from iris_project_database_refresh_spark.streaming.pipeline import (
        read_events_stream,
    )
    from iris_project_database_refresh_spark.streaming.rate_limit import (
        streaming_rate_limit,
    )

    q = (
        streaming_rate_limit(read_events_stream(spark, SF_CORRECT))
        .writeStream.format("memory")
        .queryName("rate_limit_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one cumulative row per (user, batch); the
    # final state per user is the row with the largest n_events
    emitted = spark.table("rate_limit_test").collect()
    assert emitted
    final = {}
    for r in emitted:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    got = {
        u: (r.n_events, r.n_allowed, r.n_rejected, r.final_tokens)
        for u, r in final.items()
    }
    want = {
        r.user_id: (r.n_events, r.n_allowed, r.n_rejected, r.final_tokens)
        for r in events_rate_limit_sim(spark, SF_CORRECT).collect()
    }
    assert got == want


def test_wav_data_words_kernel():
    """_wav_data_words: rejection on non-WAV bytes; signed LE word
    decode on a hand-built WAV with known samples."""
    import struct

    from iris_project_database_refresh_spark.operators.multimodal import (
        _wav_data_words,
    )

    assert _wav_data_words(b"not riff at all") is None
    assert _wav_data_words(b"") is None
    samples = [0, 1000, -1000, 32767, -32768]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    assert _wav_data_words(hdr + data) == (8000, 1, samples)


def test_streaming_drift_monitor_matches_batch(spark):
    """Frozen-baseline drift binning on the stream == the same binning
    computed batch-side (bin convention shared with quantile_drift_psi)."""
    from iris_project_database_refresh_spark.sources.tables import load_table
    from iris_project_database_refresh_spark.streaming.drift_monitor import (
        drift_bin_counts,
        freeze_baseline,
        run_drift_monitor_available_now,
    )

    got = {
        tuple(r)
        for r in run_drift_monitor_available_now(spark, SF_CORRECT).collect()
    }
    mid, edges = freeze_baseline(spark, SF_CORRECT)
    want = {
        tuple(r)
        for r in drift_bin_counts(
            load_table(spark, SF_CORRECT, "events"), edges, mid
        ).collect()
    }
    assert got == want and len(got) > 0


def test_tiff_header_parser_rejects_non_image():
    from iris_project_database_refresh_spark.operators.multimodal import parse_tiff_header

    assert parse_tiff_header(b"plain document text, not a TIFF") is None
    assert parse_tiff_header(b"") is None
    assert parse_tiff_header(b"II\x2b\x00\x08\x00\x00\x00") is None  # wrong magic
    assert parse_tiff_header(b"II\x2a\x00\xff\xff\xff\xff") is None  # IFD out of range


def test_tiff_header_parser_both_byte_orders():
    import struct

    from iris_project_database_refresh_spark.operators.multimodal import parse_tiff_header

    def build(fmt, order):
        entries = [(0x0100, 320), (0x0101, 240), (0x0112, 5), (0x0128, 3)]
        ifd = struct.pack(fmt + "H", len(entries))
        for tag, val in entries:
            ifd += struct.pack(fmt + "HHI", tag, 3, 1) + struct.pack(fmt + "H", val) + b"\x00\x00"
        ifd += struct.pack(fmt + "I", 0)
        return order + struct.pack(fmt + "H", 42) + struct.pack(fmt + "I", 8) + ifd

    for fmt, order in (("<", b"II"), (">", b"MM")):
        parsed = parse_tiff_header(build(fmt, order))
        assert parsed == {
            "byte_order": order.decode(),
            "width": 320,
            "height": 240,
            "orientation": 5,
            "resolution_unit": 3,
        }


def test_stateful_topk_matches_reference(spark):
    """availableNow drain of the Misra-Gries top-K tracker: the final
    per-type summaries must equal a reference replay of the same
    ordered events (same fold, plain Python)."""
    from iris_project_database_refresh_spark.sources.tables import load_table
    from iris_project_database_refresh_spark.streaming.pipeline import (
        read_events_stream,
    )
    from iris_project_database_refresh_spark.streaming.topk import (
        TOPK_K,
        mg_update,
        streaming_topk,
    )

    q = (
        streaming_topk(read_events_stream(spark, SF_CORRECT))
        .writeStream.format("memory")
        .queryName("topk_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("topk_test").collect()
    assert emitted
    latest_seen: dict[str, int] = {}
    for r in emitted:
        latest_seen[r.event_type] = max(latest_seen.get(r.event_type, 0), r.n_seen)
    got = {
        (r.event_type, r.user_id): (r.mg_count, r.rank)
        for r in emitted
        if r.n_seen == latest_seen[r.event_type]
    }

    rows = (
        load_table(spark, SF_CORRECT, "events")
        .select("event_type", "user_id", "ts", "event_id")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.ts, r.event_id)):
        by_type.setdefault(r.event_type, []).append(r.user_id)
    want = {}
    for etype, users in by_type.items():
        counters: dict[int, int] = {}
        for u in users:
            mg_update(counters, int(u), TOPK_K)
        items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (u, c) in enumerate(items, 1):
            want[(etype, u)] = (c, rank)
    assert got == want


def test_png_parser_rejects_and_audits():
    import struct
    import zlib

    from iris_project_database_refresh_spark.operators.multimodal import parse_png

    assert parse_png(b"plain document text, not a PNG") is None
    assert parse_png(b"") is None
    assert parse_png(b"\x89PNG\r\n\x1a\n") is None  # signature only, no IHDR

    def chunk(ctype, data, xor=0):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) ^ xor)
        )

    ihdr = struct.pack(">IIBBBBB", 320, 240, 8, 2, 0, 0, 1)
    good = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", b"x" * 10)
        + chunk(b"IDAT", b"y" * 6)
        + chunk(b"IEND", b"")
    )
    parsed = parse_png(good)
    assert parsed == {
        "width": 320,
        "height": 240,
        "bit_depth": 8,
        "color_type": 2,
        "interlace": 1,
        "n_chunks": 4,
        "idat_bytes": 16,
        "crc_bad": 0,
        "iend_ok": 1,
    }
    # corrupted IHDR CRC: fields still recovered, corruption counted
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr, xor=1)
        + chunk(b"IEND", b"")
    )
    parsed = parse_png(bad)
    assert parsed["width"] == 320 and parsed["crc_bad"] == 1 and parsed["iend_ok"] == 1
    # truncated final chunk: walk stops cleanly at the boundary
    parsed = parse_png(good[:-4])
    assert parsed is not None and parsed["n_chunks"] == 3


def test_id3_parser_syncsafe_and_rejection():
    import struct

    from iris_project_database_refresh_spark.operators.multimodal import parse_id3

    assert parse_id3(b"plain text, not an mp3") is None
    assert parse_id3(b"") is None
    # syncsafe byte with bit 7 set is invalid
    assert parse_id3(b"ID3\x03\x00\x00\x80\x00\x00\x00") is None

    def frame(fid, text):
        data = b"\x00" + text.encode("latin-1")
        return fid + struct.pack(">I", len(data)) + b"\x00\x00" + data

    frames = frame(b"TIT2", "A Title") + frame(b"TRCK", "7")
    n = len(frames)
    # size 200 needs two syncsafe bytes: 200 = 1<<7 | 72
    assert n < 128
    hdr = b"ID3\x03\x00\x00" + bytes([0, 0, n >> 7, n & 0x7F])
    parsed = parse_id3(hdr + frames + b"trailing audio bytes")
    assert parsed == {
        "version": 3,
        "tag_size": n,
        "n_frames": 2,
        "track": 7,
        "title": "A Title",
        "artist": "",
        "album": "",
    }
    # a 129-byte tag exercises the multi-byte syncsafe path: plain
    # big-endian readers would decode 0x0101 as 257, syncsafe gives 129
    pad = frame(b"TALB", "x" * (129 - n - 11))
    frames2 = frames + pad
    assert len(frames2) == 129
    hdr2 = b"ID3\x03\x00\x00" + bytes([0, 0, 1, 1])
    parsed = parse_id3(hdr2 + frames2)
    assert parsed is not None and parsed["tag_size"] == 129 and parsed["n_frames"] == 3


def test_jpeg_kernel_rejects_and_truncation():
    """parse_jpeg: non-JPEG bytes are rejected; a truncated stream still
    accounts its entropy bytes and reports eoi_ok=0."""
    from iris_project_database_refresh_spark.operators.multimodal import parse_jpeg

    assert parse_jpeg(b"") is None
    assert parse_jpeg(b"\x89PNG\r\n\x1a\n") is None
    assert parse_jpeg(b"\xff\xd8\xff\xe0") is None  # header but no SOF

    def seg(marker, data):
        return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00")
    sof = seg(0xC0, bytes([8]) + (24).to_bytes(2, "big") + (32).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0]) + b"\x00\x3f\x00")
    entropy = b"ABCDEF0123"  # ascii-hex, no 0xFF
    full = b"\xff\xd8" + app0 + sof + sos + entropy + b"\xff\xd9"
    p = parse_jpeg(full)
    assert p == {
        "width": 32, "height": 24, "precision_bits": 8, "n_components": 1,
        "progressive": 0, "n_segments": 5, "com_bytes": 0,
        "entropy_bytes": 10, "has_jfif": 1, "eoi_ok": 1,
    }
    # truncated before EOI: every entropy byte still counted
    trunc = b"\xff\xd8" + app0 + sof + sos + entropy
    p2 = parse_jpeg(trunc)
    assert p2["eoi_ok"] == 0 and p2["entropy_bytes"] == 10 and p2["n_segments"] == 4
    # progressive SOF2 flagged
    sof2 = seg(0xC2, bytes([8]) + (24).to_bytes(2, "big") + (32).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    p3 = parse_jpeg(b"\xff\xd8" + app0 + sof2 + sos + entropy + b"\xff\xd9")
    assert p3["progressive"] == 1


def test_gif_kernel_rejects_and_walks():
    """parse_gif: non-GIF rejected; LE dims; GCT skipped by size; the
    sub-block chain is walked to its terminator."""
    from iris_project_database_refresh_spark.operators.multimodal import parse_gif

    assert parse_gif(b"") is None
    assert parse_gif(b"GIF00a" + b"\x00" * 10) is None
    assert parse_gif(b"\xff\xd8\xff\xe0") is None

    lsd = (300).to_bytes(2, "little") + (200).to_bytes(2, "little") + bytes([0x91, 0, 0])
    gct = b"\x01\x02\x03" * 4  # N=1 -> 4 colors
    img = b"\x2c" + b"\x00\x00\x00\x00" + (300).to_bytes(2, "little") + (200).to_bytes(2, "little") + b"\x00" + b"\x08"
    data = b"\x05" + b"ABCDE" + b"\x03" + b"XYZ" + b"\x00"
    gif = b"GIF89a" + lsd + gct + img + data + b"\x3b"
    p = parse_gif(gif)
    assert p == {
        "version": 89, "width": 300, "height": 200, "gct_colors": 4,
        "n_images": 1, "n_extensions": 0, "data_bytes": 8,
        "n_subblocks": 2, "trailer_ok": 1,
    }
    # no GCT flag: same bytes minus table, 87a, no trailer
    lsd2 = (16).to_bytes(2, "little") + (16).to_bytes(2, "little") + bytes([0x11, 0, 0])
    img2 = b"\x2c" + b"\x00\x00\x00\x00" + (16).to_bytes(2, "little") + (16).to_bytes(2, "little") + b"\x00" + b"\x08"
    p2 = parse_gif(b"GIF87a" + lsd2 + img2 + b"\x02" + b"OK" + b"\x00")
    assert p2["version"] == 87 and p2["gct_colors"] == 0
    assert p2["trailer_ok"] == 0 and p2["data_bytes"] == 2


def test_streaming_cusum_equals_batch(spark):
    """availableNow drain of the stateful CUSUM: every CLOSED day's
    alarm must match the batch operator exactly (the final open day per
    type is the standard completeness lag)."""
    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.operators.timeseries import (
        events_cusum_alarm,
    )
    from iris_project_database_refresh_spark.sources.tables import load_table
    from iris_project_database_refresh_spark.streaming.cusum import streaming_cusum

    # frozen targets: the batch operator's own full-series mean per type
    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x"))
    )
    targets = daily.groupBy("event_type").agg(
        F.expr("sum(x) div count(*)").cast("bigint").alias("target")
    )
    last_day = {
        r.event_type: r.m
        for r in daily.groupBy("event_type").agg(F.max("day").alias("m")).collect()
    }

    stream = sp.read_events_stream(spark, SF_CORRECT).select(
        "event_type", "event_id", "ts", "value"
    )
    q = (
        streaming_cusum(stream, targets)
        .writeStream.format("memory")
        .queryName("cusum_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.event_type, r.day, r.x, r.cusum)
        for r in spark.table("cusum_test").collect()
    }
    batch = {
        (r.event_type, r.day, r.x, r.cusum)
        for r in events_cusum_alarm(spark, SF_CORRECT).collect()
        if r.day < last_day[r.event_type]
    }
    assert streamed == batch
    assert len(batch) > 0


def test_flac_kernel_bit_unpacking():
    """parse_flac: non-FLAC rejected; a hand-built STREAMINFO with
    awkward bit values (odd sample rate, 7 channels, 20 bps) unpacks
    exactly; padding blocks counted; last-flag stops the walk."""
    from iris_project_database_refresh_spark.operators.multimodal import parse_flac

    assert parse_flac(b"") is None
    assert parse_flac(b"RIFF1234") is None

    sr, ch, bits, total = 44101, 7, 20, (1 << 35) + 12345
    pack = (sr << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
    body = (
        (4096).to_bytes(2, "big")
        + (4096).to_bytes(2, "big")
        + (0).to_bytes(3, "big")
        + (0).to_bytes(3, "big")
        + pack.to_bytes(8, "big")
        + bytes(range(16))
    )
    payload = b"fLaC" + bytes([0x00]) + (34).to_bytes(3, "big") + body
    payload += bytes([0x81]) + (5).to_bytes(3, "big") + b"\x00" * 5
    p = parse_flac(payload + b"EXTRA-GARBAGE-AFTER-LAST")
    assert p["sample_rate"] == sr and p["channels"] == ch
    assert p["bits_per_sample"] == bits and p["total_samples"] == total
    assert p["duration_ms"] == total * 1000 // sr
    assert p["n_blocks"] == 2 and p["padding_bytes"] == 5
    assert p["audio_md5"] == bytes(range(16)).hex()


def test_bmp_kernel_signed_height():
    """parse_bmp: signed LE height decodes top-down DIBs; palette
    implied for low depths when biClrUsed is 0; stride padded to 4."""
    import struct

    from iris_project_database_refresh_spark.operators.multimodal import parse_bmp

    assert parse_bmp(b"") is None
    assert parse_bmp(b"PK\x03\x04" + b"\x00" * 60) is None

    def bmp(width, height, bpp, clr_used):
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, 0, 2835, 2835, clr_used, 0
        )
        off = 54 + clr_used * 4
        return b"BM" + struct.pack("<IHHI", off, 0, 0, off) + info

    p = parse_bmp(bmp(7, -9, 24, 0))
    assert p["top_down"] == 1 and p["height"] == 9
    assert p["row_stride"] == (7 * 24 + 31) // 32 * 4 == 24
    assert p["pixel_bytes"] == 24 * 9
    # 4bpp with biClrUsed=0 implies a full 16-color palette
    p2 = parse_bmp(bmp(10, 5, 4, 0))
    assert p2["palette_colors"] == 16 and p2["top_down"] == 0


def test_zip_kernel_eocd_and_crc():
    """parse_zip: backward EOCD scan past a trailing comment; a central
    directory whose CRC disagrees with the local data is counted."""
    import struct
    import zlib

    from iris_project_database_refresh_spark.operators.multimodal import parse_zip

    assert parse_zip(b"not a zip at all") is None

    name, data = b"a.txt", b"HELLOHELLO"
    crc = zlib.crc32(data)
    local = (
        b"PK\x03\x04" + struct.pack("<HHHHH", 20, 0, 0, 0, 0)
        + struct.pack("<III", crc, len(data), len(data))
        + struct.pack("<HH", len(name), 0) + name + data
    )
    central = (
        b"PK\x01\x02" + struct.pack("<HHHHHH", 20, 20, 0, 0, 0, 0)
        + struct.pack("<III", crc ^ 1, len(data), len(data))  # corrupted CRC
        + struct.pack("<HHHHH", len(name), 0, 0, 0, 0) + struct.pack("<I", 0)
        + struct.pack("<I", 0) + name
    )
    comment = b"trailing!"
    eocd = (
        b"PK\x05\x06" + struct.pack("<HHHH", 0, 0, 1, 1)
        + struct.pack("<II", len(central), len(local))
        + struct.pack("<H", len(comment)) + comment
    )
    p = parse_zip(local + central + eocd)
    assert p["n_entries"] == 1 and p["comment_len"] == len(comment)
    assert p["crc_bad"] == 1 and p["total_uncompressed"] == len(data)


def test_mp4_kernel_largesize_and_recursion():
    """parse_mp4: container recursion reaches tkhd dims; the size=1
    largesize escape is honored; non-BMFF rejected."""
    import struct

    from iris_project_database_refresh_spark.operators.multimodal import parse_mp4

    assert parse_mp4(b"\x00" * 16) is None

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", 1000, 5000)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 8 + struct.pack(">I", 3) + b"\x00" * 56
        + struct.pack(">II", 640 << 16, 480 << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    data = b"0123456789"
    mdat_large = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(data)) + data
    )
    p = parse_mp4(box(b"ftyp", b"isom\x00\x00\x00\x00") + moov + mdat_large)
    assert p["timescale"] == 1000 and p["duration"] == 5000 and p["duration_ms"] == 5000
    assert p["track_id"] == 3 and (p["width"], p["height"]) == (640, 480)
    assert p["mdat_bytes"] == len(data) and p["used_largesize"] == 1
    assert p["n_boxes"] == 6


def test_streaming_holt_winters_equals_replay(spark):
    """availableNow drain of the vector-state HW twin: the final state
    per type equals a python replay of the batch fold over every CLOSED
    day (the last open day is the standard completeness lag)."""
    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.operators import timeseries
    from iris_project_database_refresh_spark.sources.tables import load_table
    from iris_project_database_refresh_spark.streaming.holt_winters import (
        streaming_holt_winters,
    )

    stream = sp.read_events_stream(spark, SF_CORRECT).select("event_type", "event_id", "ts")
    q = (
        streaming_holt_winters(stream)
        .writeStream.format("memory")
        .queryName("hw_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {}
    for r in spark.table("hw_test").collect():
        cur = got.get(r.event_type)
        if cur is None or r.days_closed > cur.days_closed:
            got[r.event_type] = r

    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.x))

    def tdiv(a, b):
        qq = abs(a) // b
        return qq if a >= 0 else -qq

    P = timeseries.HW_PERIOD
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts][:-1]  # last day never closes in the stream
        if len(xs) < P:
            assert et not in got
            continue
        l = sum(xs[:P]) * 1000 // P
        b = 0
        s = [xs[j] * 1000 - l for j in range(P)]
        rr = list(xs[:P])
        sae = nsae = 0
        for i in range(P, len(xs)):
            x = xs[i]
            slot = i % P
            sae += abs(x * 1000 - (l + b + s[slot]))
            nsae += abs(x - rr[slot]) * 1000
            lnew = tdiv(200 * (x * 1000 - s[slot]) + 800 * (l + b), 1000)
            bnew = tdiv(100 * (lnew - l) + 900 * b, 1000)
            snew = tdiv(300 * (x * 1000 - lnew) + 700 * s[slot], 1000)
            l, b = lnew, bnew
            s[slot] = snew
            rr[slot] = x
        g = got[et]
        assert g.days_closed == len(xs)
        assert (g.level_milli, g.trend_milli) == (l, b)
        assert g.season_csv == ",".join(str(v) for v in s)
        assert (g.hw_sae_milli, g.snaive_sae_milli) == (sae, nsae)


def test_tar_kernel_octal_and_checksum():
    """parse_tar: octal sizes decoded (not decimal), checksum re-summed
    with the field masked to spaces, missing terminator flagged."""
    from iris_project_database_refresh_spark.operators.multimodal import (
        _tar_header_hex,
        parse_tar,
    )

    assert parse_tar(b"\x00" * 600) is None
    hdr = bytes.fromhex(_tar_header_hex("big.bin", 0o777))  # 511 bytes of data
    payload = hdr + b"A" * 512 + b"\x00" * 1024
    p = parse_tar(payload)
    assert p["n_members"] == 1
    assert p["total_size"] == 0o777  # 511 — a decimal reader would say 777
    assert p["chksum_bad"] == 0 and p["terminated"] == 1
    bad = bytes.fromhex(_tar_header_hex("x", 32, bump_chksum=3)) + b"B" * 512
    assert parse_tar(bad)["chksum_bad"] == 1


def test_pdf_kernel_verifies_offsets():
    """parse_pdf: startxref honored, xref entries verified against
    object headers, the planted off-by-one counted."""
    from iris_project_database_refresh_spark.operators.multimodal import (
        _PDF_MARK,
        _PDF_TEMPLATES,
        parse_pdf,
    )

    assert parse_pdf(b"not a pdf") is None
    good, _ = _PDF_TEMPLATES[(3, False)]
    p = parse_pdf(good.replace(_PDF_MARK, "c" * 33).encode())
    assert p["n_pages"] == 3 and p["n_in_use"] == 8 and p["n_free"] == 1
    assert p["bad_offsets"] == 0 and p["has_root"] == 1
    bad, _ = _PDF_TEMPLATES[(3, True)]
    assert parse_pdf(bad.replace(_PDF_MARK, "c" * 33).encode())["bad_offsets"] == 1


def test_sniff_router_total_recall(spark):
    """Every planted payload must be sniffed as its own type and parsed
    by its own parser — across all thirteen formats."""
    from iris_project_database_refresh_spark.operators import multimodal as mm

    from .conftest import SF_CORRECT

    rows = mm.multimodal_sniff_router(spark, SF_CORRECT).collect()
    assert {r.true_type for r in rows} == {n for n, _b, _s in mm._SNIFF_BUILDERS}
    for r in rows:
        assert r.n_items > 0
        assert r.sniffed_correct == r.n_items, r
        assert r.parsed_ok == r.n_items, r


def test_sniff_media_disambiguates():
    from iris_project_database_refresh_spark.operators.multimodal import sniff_media

    assert sniff_media(b"%PDF-1.4 rest") == "pdf"
    assert sniff_media(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert sniff_media(b"RIFF\x00\x00\x00\x00AVI LIST") == "unknown"
    assert sniff_media(b"ID3\x03\x00") == "id3"
    assert sniff_media(b"\x00" * 257 + b"ustar\x00" + b"\x00" * 10) == "tar"
    assert sniff_media(b"\x00\x00\x00\x18ftypisom") == "mp4"
    assert sniff_media(b"BM" + b"\x00" * 52) == "bmp"  # BM checked LAST (weakest magic)
    assert sniff_media(b"total junk") == "unknown"


def test_ogg_parser_rejects_junk_and_counts_zero_lacing(spark):
    from iris_project_database_refresh_spark.operators.multimodal import (
        _ogg_crc,
        parse_ogg,
    )

    assert parse_ogg(b"not an ogg stream") is None
    assert parse_ogg(b"OggS\x01" + b"\x00" * 30) is None  # bad version
    # 510-byte packet = lacing [255, 255, 0]: the zero byte terminates
    hdr = (
        b"OggS\x00\x06"
        + (42).to_bytes(8, "little")
        + (7).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    tail = bytes([3, 255, 255, 0]) + b"\xab" * 510
    crc = _ogg_crc(hdr + b"\x00\x00\x00\x00" + tail)
    page = hdr + crc.to_bytes(4, "little") + tail
    got = parse_ogg(page)
    assert got == {
        "n_pages": 1,
        "serial": 7,
        "final_granule": 42,
        "n_packets": 1,
        "body_bytes": 510,
        "bos_ok": 1,
        "eos_ok": 1,
        "crc_bad": 0,
    }



def test_webp_vp8l_lsb_first_not_msb(spark):
    from iris_project_database_refresh_spark.operators.multimodal import (
        parse_webp_vp8l,
    )

    assert parse_webp_vp8l(b"RIFFxxxxWAVE" + b"\x00" * 20) is None
    # width 100, height 7: LSB-first pack; an MSB-first reader would
    # decode garbage dimensions from the same bytes
    packed = (99) | (6 << 14) | (1 << 28)
    p = (
        b"RIFF" + (17).to_bytes(4, "little") + b"WEBP" + b"VP8L"
        + (5).to_bytes(4, "little") + b"\x2f" + packed.to_bytes(4, "little")
    )
    got = parse_webp_vp8l(p)
    assert got == {
        "width": 100,
        "height": 7,
        "has_alpha": 1,
        "vp8l_version": 0,
        "riff_size": 17,
    }


class _FakeGroupState:
    """Minimal stand-in for GroupState: exists/get/update only."""

    def __init__(self, value=None):
        self._value = value

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value


def test_streaming_cusum_drops_cross_batch_stragglers():
    """An event whose day precedes the already-open day (possible only
    across micro-batches — within one batch events are sorted) must be
    dropped and counted in state, never folded into the open day's sum."""
    import pandas as pd

    from iris_project_database_refresh_spark.streaming.cusum import _cusum_fn

    def batch(rows):
        return pd.DataFrame(
            rows, columns=["event_type", "target", "event_id", "ts", "value"]
        )

    day_ns = 86_400 * 10**9
    st = _FakeGroupState()
    # batch 1: day 10 (closes) then day 11 opens
    list(
        _cusum_fn(
            ("click", 100),
            [batch([("click", 100, 1, pd.Timestamp(10 * day_ns), 5.0),
                    ("click", 100, 2, pd.Timestamp(11 * day_ns), 7.0)])],
            st,
        )
    )
    s1, open_day1, open_sum1, n_late1 = st.get
    assert (open_day1, open_sum1, n_late1) == (11, 700, 0)
    # batch 2: a straggler for day 9 + a real day-11 event
    list(
        _cusum_fn(
            ("click", 100),
            [batch([("click", 100, 3, pd.Timestamp(9 * day_ns), 999.0),
                    ("click", 100, 4, pd.Timestamp(11 * day_ns), 3.0)])],
            st,
        )
    )
    s2, open_day2, open_sum2, n_late2 = st.get
    assert (open_day2, open_sum2) == (11, 1000)  # 700 + 300, straggler excluded
    assert n_late2 == 1


def test_streaming_holt_winters_drops_cross_batch_stragglers():
    import pandas as pd

    from iris_project_database_refresh_spark.streaming.holt_winters import _hw_fn

    def batch(rows):
        return pd.DataFrame(rows, columns=["event_type", "event_id", "ts"])

    day_ns = 86_400 * 10**9
    st = _FakeGroupState()
    list(
        _hw_fn(
            ("click",),
            [batch([("click", 1, pd.Timestamp(10 * day_ns)),
                    ("click", 2, pd.Timestamp(11 * day_ns))])],
            st,
        )
    )
    *_, open_day1, open_cnt1, n_late1 = st.get
    assert (open_day1, open_cnt1, n_late1) == (11, 1, 0)
    list(
        _hw_fn(
            ("click",),
            [batch([("click", 3, pd.Timestamp(9 * day_ns)),
                    ("click", 4, pd.Timestamp(11 * day_ns))])],
            st,
        )
    )
    *_, open_day2, open_cnt2, n_late2 = st.get
    assert (open_day2, open_cnt2) == (11, 2)
    assert n_late2 == 1


def test_parse_pdf_text_kernel():
    """Escape handling, Kids-order assembly, /Length verification, and
    non-PDF rejection for the content-stream text extractor."""
    import hashlib

    from iris_project_database_refresh_spark.operators.multimodal import (
        _PDF_TEXT_MARKS,
        _PDF_TEXT_TEMPLATES,
        parse_pdf_text,
    )

    assert parse_pdf_text(b"not a pdf") is None
    marks = {p: hashlib.md5(f"m{p}".encode()).hexdigest() for p in range(3)}
    t = _PDF_TEXT_TEMPLATES[(3, False)]
    for p in range(3):
        t = t.replace(_PDF_TEXT_MARKS[p], marks[p])
    r = parse_pdf_text(t.encode())
    # pages must come back in Kids order even though the file stores
    # page objects reversed; each page text resolves every escape class
    pages = [f"Page {marks[p]}ABC)DEABC" for p in range(3)]
    assert r["text_md5"] == hashlib.md5("\n".join(pages).encode()).hexdigest()
    assert r["n_pages"] == 3 and r["n_text_ops"] == 9 and r["n_td"] == 6
    assert r["n_fonts"] == 2 and r["kern_sum"] == -210
    assert r["length_bad"] == 0 and r["total_chars"] == 138
    # corrupt-length variant: counted, text still extracted
    t2 = _PDF_TEXT_TEMPLATES[(1, True)].replace(_PDF_TEXT_MARKS[0], marks[0])
    r2 = parse_pdf_text(t2.encode())
    assert r2["length_bad"] == 1
    assert r2["text_md5"] == hashlib.md5(pages[0].encode()).hexdigest()


def test_parse_ooxml_kernel(spark):
    """docx paragraph/run walk, xlsx sst resolution incl. #REF! and the
    short-dimension pitfall, and non-zip rejection."""
    import hashlib

    from iris_project_database_refresh_spark.operators.multimodal import (
        ooxml_table,
        parse_ooxml,
    )

    assert parse_ooxml(b"PK\x05\x06 not really") is None
    rows = (
        ooxml_table(spark, SF_CORRECT)
        .where("media_id IN (8, 63, 33, 13)")  # docx / xlsx(bad sst) / xlsx(dim) / xlsx
        .collect()
    )
    by_id = {r.media_id: parse_ooxml(bytes(r.payload)) for r in rows}
    d = by_id[8]  # docx: n_p = 8%4+1 = 1
    assert d["kind"] == "docx" and d["n_paragraphs"] == 1 and d["n_runs"] == 2
    assert d["text_chars"] == 32
    assert d["content_md5"] == hashlib.md5(
        hashlib.md5(b"8:dx0").hexdigest().encode()
    ).hexdigest()
    x = by_id[63]  # xlsx, doc 63 % 9 == 0 -> row 1's sst ref out of range
    assert x["kind"] == "xlsx" and x["bad_sst_refs"] == 1 and x["dim_ok"] == 1
    assert x["n_rows"] == 63 % 7 + 2 and x["n_cells"] == 2 * x["n_rows"]
    x2 = by_id[33]  # 33 % 11 == 0 -> dimension one row short
    assert x2["dim_ok"] == 0 and x2["bad_sst_refs"] == 0
    x3 = by_id[13]
    assert x3["dim_ok"] == 1 and x3["bad_sst_refs"] == 0
    # grid md5: resolved sst text + B values in row order
    n = 13 % 7 + 2
    grid = "".join(
        f"S{r - 1}_" + hashlib.md5(f"13:ss{r - 1}".encode()).hexdigest()[:12]
        + str(10000 + (13 * 31 + r) % 80000)
        for r in range(1, n + 1)
    )
    assert x3["content_md5"] == hashlib.md5(grid.encode()).hexdigest()


def test_ogg_crc_verification():
    """The bespoke Ogg CRC-32 (0x04C11DB7 MSB-first, init 0) must catch
    a single flipped bit in a stored page CRC."""
    from iris_project_database_refresh_spark.operators.multimodal import (
        _ogg_crc,
        parse_ogg,
    )

    # one BOS page, one packet of 3 bytes
    hdr = b"OggS" + b"\x00\x02" + (0).to_bytes(8, "little") + (7).to_bytes(4, "little")
    hdr += (0).to_bytes(4, "little")
    body = b"\x01\x03" + b"abc"  # nseg=1, lacing [3], body 'abc'
    page_zero = hdr + b"\x00\x00\x00\x00" + body
    crc = _ogg_crc(page_zero)
    page = hdr + crc.to_bytes(4, "little") + body
    good = parse_ogg(page)
    assert good["crc_bad"] == 0 and good["n_packets"] == 1 and good["body_bytes"] == 3
    bad_page = hdr + (crc ^ 1).to_bytes(4, "little") + body
    assert parse_ogg(bad_page)["crc_bad"] == 1


def test_parse_pdf_flate_kernel():
    """Inflate + text walk, /Title recovery, corrupt-deflate counting,
    and non-PDF rejection."""
    import hashlib
    import zlib

    from iris_project_database_refresh_spark.operators.multimodal import (
        _PDF_FLATE_STREAMS,
        _pdf_flate_extracted,
        parse_pdf_flate,
    )

    assert parse_pdf_flate(b"junk") is None
    data = _PDF_FLATE_STREAMS[2]
    title = hashlib.md5(b"t").hexdigest()
    body = (
        f"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        f"4 0 obj\n<< /Length {len(data)} /Filter /FlateDecode >>\nstream\n"
    ).encode()
    tail = (
        f"\nendstream\nendobj\n5 0 obj\n<< /Title ({title}) >>\nendobj\n"
        f"trailer\n<< /Root 1 0 R /Info 5 0 R >>\n%%EOF"
    ).encode()
    r = parse_pdf_flate(body + data + tail)
    assert r["decode_failed"] == 0 and r["n_text_ops"] == 6
    assert r["text_md5"] == hashlib.md5(_pdf_flate_extracted(2).encode()).hexdigest()
    assert r["title_md5"] == hashlib.md5(title.encode()).hexdigest()
    assert zlib.decompress(data)  # the planted stream really is deflate
    bad = bytes([data[0] ^ 0xFF]) + data[1:]
    r2 = parse_pdf_flate(body + bad + tail)
    assert r2["decode_failed"] == 1 and r2["inflated_chars"] == 0


def test_parse_zip_deflate_kernel(spark):
    """Method-8 entries inflate with CRC verified over UNCOMPRESSED
    bytes; a corrupted deflate body is counted, not raised."""
    import hashlib
    import io
    import zipfile

    import pytest as _pytest

    from iris_project_database_refresh_spark.operators.multimodal import (
        _ZDEF_STREAMS,
        _ZDEF_TEXTS,
        parse_zip_deflate,
        zip_deflate_table,
    )

    assert parse_zip_deflate(b"junk") is None
    row = zip_deflate_table(spark, SF_CORRECT).where("media_id = 7").first()
    payload = bytes(row.payload)
    r = parse_zip_deflate(payload)
    v = 7 % 4
    assert r["deflated_ok"] == 1 and r["stored_ok"] == 1
    assert r["crc_bad"] == 0
    assert r["comp_bytes"] == len(_ZDEF_STREAMS[v])
    assert r["content_md5"] == hashlib.md5(_ZDEF_TEXTS[v].encode()).hexdigest()
    # flip one byte inside the deflate body: zipfile refuses the CRC on
    # read and the kernel COUNTS it (never raises — one corrupt payload
    # must not kill the whole mapInPandas task)
    idx = payload.index(_ZDEF_STREAMS[v][:8]) + 4
    bad = payload[:idx] + bytes([payload[idx] ^ 0xFF]) + payload[idx + 1 :]
    with _pytest.raises(zipfile.BadZipFile):
        zipfile.ZipFile(io.BytesIO(bad)).read("content.xml")
    rbad = parse_zip_deflate(bad)
    assert rbad["crc_bad"] == 1 and rbad["deflated_ok"] == 0


def test_parse_pdf_merged_kernel(spark):
    """The merged-PDF walker must verify the plant end-to-end (every
    xref offset on its object, page census == /Count, full bookmark
    chain) and must CATCH a corrupted xref offset rather than trust
    the table."""
    import hashlib

    from iris_project_database_refresh_spark.operators.multimodal import (
        parse_pdf_merged,
        pdf_merge_write_table,
    )

    assert parse_pdf_merged(b"junk") is None
    row = pdf_merge_write_table(spark, SF_CORRECT).where("grp = 1").first()
    payload = bytes(row.payload)
    r = parse_pdf_merged(payload)
    assert r["xref_ok"] == 1 and r["pages_ok"] == 1 and r["outline_ok"] == 1
    assert r["n_src"] == 3  # grp 1 members: doc_ids 23, 30, 37 (%7==2, %5<>1)
    assert r["outline_md5"] == hashlib.md5(b"S23|S30|S37").hexdigest()
    assert r["file_bytes"] == len(payload)
    # flip one digit inside the SECOND xref entry's offset: the walker
    # must refuse it (offset no longer lands on "0002 0 obj")
    idx = payload.rindex(b"xref\n0 ") + len(b"xref\n0 NNNN\n") + 20 + 5
    bad = payload[:idx] + b"9" + payload[idx + 1 :]
    rbad = parse_pdf_merged(bad)
    assert rbad["xref_ok"] == 0 and rbad["pages_ok"] == 1


def test_streaming_hll_matches_batch_sketch(spark):
    """availableNow drain of the streaming HLL: the final registers —
    and therefore the estimate, computed with the batch operator's
    exact integer-denominator arithmetic — must equal the batch
    approx_distinct_hll result bit-for-bit per event type (max-merge is
    order-free, so micro-batching cannot change the sketch)."""
    from iris_project_database_refresh_spark.operators.sketches import (
        approx_distinct_hll,
    )
    from iris_project_database_refresh_spark.streaming.hll import (
        run_hll_available_now,
    )

    got = {r.event_type: (r.hll_est, r.n_regs) for r in
           run_hll_available_now(spark, SF_CORRECT).collect()}
    want = {r.event_type: r.hll_est for r in
            approx_distinct_hll(spark, SF_CORRECT).collect()}
    assert set(got) == set(want)
    for et, (est, n_regs) in got.items():
        assert est == want[et], et
        assert 0 < n_regs <= 64


def test_streaming_resume_ledger_equals_batch(spark):
    """availableNow drain of the stateful page-resume ledger: every
    document's final row (longest completed prefix, first failure,
    lost-after-gap, resume point) must equal the batch operator
    bit-for-bit — out-of-order page completion within the stream is
    absorbed by the per-doc outcome state."""
    from iris_project_database_refresh_spark.operators.monitor import (
        page_resume_ledger,
    )
    from iris_project_database_refresh_spark.streaming.resume_ledger import (
        page_events,
        streaming_resume_ledger,
    )

    stream = page_events(spark, SF_CORRECT, streaming=True)
    q = (
        streaming_resume_ledger(stream)
        .writeStream.format("memory")
        .queryName("resume_ledger_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    cols = (
        "doc_id total_pages done_prefix first_failed_page lost_after_gap "
        "resume_from is_complete remaining_bp"
    ).split()
    streamed = {tuple(r[c] for c in cols) for r in spark.table("resume_ledger_test").collect()}
    batch = {tuple(r[c] for c in cols) for r in page_resume_ledger(spark, SF_CORRECT).collect()}
    assert streamed == batch
    assert len(batch) > 0
