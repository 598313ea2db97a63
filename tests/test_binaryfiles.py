"""Binary-file intake source: real files on disk -> sniffed manifest.

The reference reads actual PDF files off the NAS before parsing
(`semantic search - ey prep/stage_00_pdf_to_markdown.py`); this drives
the same intake against a temp directory of REAL container payloads —
one valid WAV, one valid JPEG, one text impostor, and one truncated
(structurally invalid) WAV — and asserts the sniff/verify split.
"""

from __future__ import annotations

import struct

import pytest

from iris_project_database_refresh_spark.session import get_session
from iris_project_database_refresh_spark.sources.binaryfiles import (
    media_intake_manifest,
    read_binary_dir,
)


@pytest.fixture(scope="module")
def spark():
    return get_session("test-binaryfiles")


def _wav_bytes() -> bytes:
    data = b"ab" * 10
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _jpeg_bytes() -> bytes:
    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
        + b"\x03" + b"\x00" * 9
        + b"\xff\xd9"
    )


def _adpcm_wav_bytes() -> bytes:
    """Sniffs as WAV but the fmt chunk declares bits=4 (IMA ADPCM):
    ``bits // 8 == 0`` makes the frame-count division RAISE inside the
    kernel — the malformed-but-sniffable class that must quarantine,
    not crash the batch."""
    data = b"ab" * 10
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 17, 1, 8000, 4000, 1, 4)
        + b"data" + struct.pack("<I", len(data)) + data
    )


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("intake")
    (d / "good.wav").write_bytes(_wav_bytes())
    (d / "good.jpg").write_bytes(_jpeg_bytes())
    (d / "notes.txt").write_bytes(b"plain document text, no magic at all")
    # sniffs as wav (RIFF/WAVE magic) but the fmt chunk is missing ->
    # the structural kernel must reject it
    (d / "trunc.wav").write_bytes(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # sniffs as wav and HAS a fmt chunk, but 4-bit ADPCM makes the
    # kernel raise -> quarantine row with parse_error, batch survives
    (d / "adpcm.wav").write_bytes(_adpcm_wav_bytes())
    return str(d)


def test_read_binary_dir_rows(spark, media_dir):
    rows = read_binary_dir(spark, media_dir).collect()
    assert len(rows) == 5
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert by_name["good.wav"].length == len(_wav_bytes())
    assert bytes(by_name["good.jpg"].content) == _jpeg_bytes()


def test_read_binary_dir_glob(spark, media_dir):
    rows = read_binary_dir(spark, media_dir, glob="*.wav").collect()
    assert {r.path.rsplit("/", 1)[-1] for r in rows} == {
        "good.wav",
        "trunc.wav",
        "adpcm.wav",
    }


def test_media_intake_manifest(spark, media_dir):
    got = {r.file_name: r for r in media_intake_manifest(spark, media_dir).collect()}
    assert set(got) == {"good.wav", "good.jpg", "notes.txt", "trunc.wav", "adpcm.wav"}
    assert (got["good.wav"].sniffed, got["good.wav"].parsed_ok) == ("wav", 1)
    assert (got["good.jpg"].sniffed, got["good.jpg"].parsed_ok) == ("jpeg", 1)
    assert (got["notes.txt"].sniffed, got["notes.txt"].parsed_ok) == ("unknown", 0)
    # sniff says wav, structure says no — the quarantine row
    assert (got["trunc.wav"].sniffed, got["trunc.wav"].parsed_ok) == ("wav", 0)
    assert got["trunc.wav"].parse_error is None  # clean reject, no exception
    # sniff says wav, kernel RAISES (bits=4 -> bits//8 == 0) — still a
    # quarantine row, with the exception recorded; the batch survived
    assert (got["adpcm.wav"].sniffed, got["adpcm.wav"].parsed_ok) == ("wav", 0)
    assert "ZeroDivisionError" in got["adpcm.wav"].parse_error
    assert got["good.wav"].parse_error is None
    import hashlib

    assert got["good.wav"].content_md5 == hashlib.md5(_wav_bytes()).hexdigest()
    assert got["good.wav"].n_bytes == len(_wav_bytes())


def test_streaming_media_intake_equals_batch_and_is_incremental(spark, tmp_path):
    """availableNow drain of the streaming intake == the batch manifest
    bit-for-bit; a second drain over the SAME checkpoint after a new
    file lands emits ONLY the new file's row — the reference's
    seen-file skip ledger, held by the stream checkpoint."""
    from iris_project_database_refresh_spark.sources.binaryfiles import (
        media_intake_manifest,
    )
    from iris_project_database_refresh_spark.streaming.media_intake import (
        stream_binary_dir,
        streaming_media_manifest,
    )

    # own dir (NOT the shared media_dir fixture): this test adds a file
    media_dir = str(tmp_path / "watched")
    import pathlib

    pathlib.Path(media_dir).mkdir()
    pathlib.Path(media_dir, "good.wav").write_bytes(_wav_bytes())
    pathlib.Path(media_dir, "good.jpg").write_bytes(_jpeg_bytes())
    pathlib.Path(media_dir, "notes.txt").write_bytes(b"plain text")
    pathlib.Path(media_dir, "trunc.wav").write_bytes(
        b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    )

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain(qname):
        q = (
            streaming_media_manifest(stream_binary_dir(spark, media_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    cols = "file_name n_bytes sniffed parsed_ok parse_error content_md5".split()
    drain("intake_drain1")
    streamed = {tuple(r[c] for c in cols) for r in spark.read.parquet(out).collect()}
    batch = {
        tuple(r[c] for c in cols)
        for r in media_intake_manifest(spark, media_dir).collect()
    }
    assert streamed == batch and len(batch) == 4

    # a new file lands between refresh cycles
    pathlib.Path(media_dir, "late.gif").write_bytes(
        b"GIF89a" + (7).to_bytes(2, "little") + (9).to_bytes(2, "little") + b"\x00" * 6
    )
    drain("intake_drain2")
    after = {tuple(r[c] for c in cols) for r in spark.read.parquet(out).collect()}
    new_rows = after - streamed
    assert {r[0] for r in new_rows} == {"late.gif"}, new_rows
    assert next(iter(new_rows))[2] == "gif"


def test_byte_class_profile_exact(spark, media_dir):
    """The intake byte-class QC must equal a plain-python replay of the
    same classification over the same capped prefixes — per (dir,
    sniffed type), exact distinct-byte counts (bit_or of presence
    masks) and exact modal lead byte included."""
    from iris_project_database_refresh_spark.operators.multimodal import sniff_media
    from iris_project_database_refresh_spark.sources.binaryfiles import (
        BYTE_CLASS_PREFIX,
        byte_class_profile,
    )

    got = {
        # binaryFile paths come back as file: URIs; normalize to the
        # plain filesystem path the replay below uses
        (r.source_dir.removeprefix("file:"), r.sniffed): r
        for r in byte_class_profile(read_binary_dir(spark, media_dir)).collect()
    }

    import collections
    import pathlib

    expect: dict[tuple, dict] = {}
    for p in pathlib.Path(media_dir).iterdir():
        full = p.read_bytes()
        b = full[:BYTE_CLASS_PREFIX]
        key = (str(p.parent), sniff_media(full))
        a = expect.setdefault(
            key,
            {"n": 0, "plen": 0, "pr": 0, "ct": 0, "hb": 0, "nul": 0,
             "seen": set(), "lead": collections.Counter()},
        )
        a["n"] += 1
        a["plen"] += len(b)
        a["pr"] += sum(1 for x in b if 0x20 <= x <= 0x7E)
        a["ct"] += sum(1 for x in b if x < 0x20 and x != 0)
        a["hb"] += sum(1 for x in b if x >= 0x80)
        a["nul"] += b.count(0)
        a["seen"].update(b)
        a["lead"][b[0]] += 1

    assert set(got) == set(expect)
    for key, a in expect.items():
        r = got[key]
        p = max(a["plen"], 1)
        assert r.n_files == a["n"] and r.prefix_bytes == a["plen"]
        assert r.printable_bp == a["pr"] * 10000 // p
        assert r.control_bp == a["ct"] * 10000 // p
        assert r.highbit_bp == a["hb"] * 10000 // p
        assert r.nul_bp == a["nul"] * 10000 // p
        assert r.distinct_bytes == len(a["seen"]), key
        best = max(a["lead"].values())
        assert r.lead_byte_mode == min(k for k, v in a["lead"].items() if v == best)
