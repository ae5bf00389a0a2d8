"""Binary download feeder (sources/binary.py — reference
zoom_load.py:148-206 parity): chunked fetch, atomic landing, per-file
error isolation. Pure driver-side; no Spark session needed."""

import os

import pytest

from datalake_scripts_spark.sources import binary as B


def fake_stream(payloads, chunk=4):
    def _open(url):
        if url not in payloads:
            raise IOError(f"404 {url}")
        data = payloads[url]
        for i in range(0, len(data), chunk):
            yield data[i : i + chunk]

    return _open


def test_stream_download_chunked_and_atomic(tmp_path):
    data = b"0123456789" * 7
    dest = str(tmp_path / "deep" / "dir" / "obj.bin")
    n = B.stream_download(
        "http://x/a", dest, open_stream=fake_stream({"http://x/a": data})
    )
    assert n == len(data)
    with open(dest, "rb") as f:
        assert f.read() == data
    assert not os.path.exists(dest + ".part")  # temp never left behind


def test_stream_download_failure_leaves_nothing(tmp_path):
    dest = str(tmp_path / "obj.bin")
    with pytest.raises(IOError):
        B.stream_download(
            "http://x/missing", dest, open_stream=fake_stream({}), max_attempts=2
        )
    assert not os.path.exists(dest) and not os.path.exists(dest + ".part")


def test_stream_download_retries_then_succeeds(tmp_path):
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("flaky")
        yield b"ok"

    dest = str(tmp_path / "obj.bin")
    assert B.stream_download("http://x/a", dest, open_stream=flaky) == 2
    assert calls["n"] == 3


def test_recording_file_name_reference_layout():
    rec = {"recording_type": "shared_screen", "id": "abc123",
           "file_extension": "MP4"}
    assert B.recording_file_name(rec) == "shared-screen-abc123.MP4"


def test_mirror_recordings_isolation_and_layout(tmp_path):
    meetings = [
        {
            "id": 42,
            "recording_files": [
                {"recording_type": "audio_only", "id": "r1",
                 "file_extension": "m4a", "download_url": "http://x/r1"},
                {"recording_type": "video", "id": "r2",
                 "file_extension": "mp4", "download_url": "http://x/gone"},
            ],
        },
        {"id": 43, "recording_files": [
            {"recording_type": "chat", "id": "r3",
             "file_extension": "txt", "download_url": "http://x/r3"}]},
    ]
    payloads = {"http://x/r1?tok=t": b"AUDIO", "http://x/r3?tok=t": b"CHAT"}
    res = B.mirror_recordings(
        meetings, str(tmp_path), open_stream=fake_stream(payloads),
        url_suffix="?tok=t", max_attempts=1,
    )
    by_url = {r.url: r for r in res}
    ok1 = by_url["http://x/r1?tok=t"]
    assert ok1.n_bytes == 5 and ok1.error is None
    assert ok1.path == str(tmp_path / "42" / "audio-only-r1.m4a")
    assert open(ok1.path, "rb").read() == b"AUDIO"
    # the failed object reports but does not abort the rest
    bad = by_url["http://x/gone?tok=t"]
    assert bad.n_bytes is None and "404" in bad.error
    assert os.path.exists(str(tmp_path / "43" / "chat-r3.txt"))


def test_mirror_recordings_malformed_record_is_isolated(tmp_path):
    """A record missing required keys becomes an error row; the rest of
    the run proceeds (spec construction is inside the try boundary)."""
    meetings = [
        {"id": 1, "recording_files": [
            {"recording_type": "chat", "id": "r1"},  # no extension/url
            {"recording_type": "audio_only", "id": "r2",
             "file_extension": "m4a", "download_url": "http://x/r2"},
        ]},
    ]
    res = B.mirror_recordings(
        meetings, str(tmp_path), open_stream=fake_stream({"http://x/r2": b"OK"}),
        max_attempts=1,
    )
    assert len(res) == 2
    assert res[0].error is not None and "KeyError" in res[0].error
    assert res[1].n_bytes == 2 and res[1].error is None


def test_stream_download_rejects_zero_attempts(tmp_path):
    with pytest.raises(ValueError, match="max_attempts"):
        B.stream_download("http://x/a", str(tmp_path / "f"),
                          open_stream=fake_stream({}), max_attempts=0)
