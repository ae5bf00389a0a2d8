"""Binary download feeder (reference S13 load side: zoom_load.py:148-206
``load_meetings_data_chunks`` — chunked recording download to a scratch
file, then upload into a per-meeting landing-zone prefix, per-file error
isolation, continue-on-failure).

Engine design: like the other loaders this is a DRIVER-SIDE feeder — it
fills the landing zone that `io.read_binary_files` (S13 read side) and
`operators.multimodal` then process distributedly. The actual byte
stream is an injectable ``open_stream`` callable (url -> iterator of
chunks); the default is stdlib urllib with a timeout, constructed only
on first use so tests never touch the network. Files land via
write-to-temp-then-rename so a crashed download never leaves a
half-written object visible under its final name.

At real scale the feeder parallelizes trivially: build a DataFrame of
download specs and run :func:`sources.rest.distributed_fetch` — the
executor-side path — when objects are small enough to pass through
Arrow batches; keep THIS chunked path for multi-GB recordings that must
never be materialized in memory whole.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

StreamTransport = Callable[[str], Iterator[bytes]]

_DEFAULT_CHUNK = 1 << 20  # 1 MiB — the reference's chunk_size knob


def _default_open_stream(
    url: str, timeout: float = 60.0, chunk_size: int = _DEFAULT_CHUNK
) -> Iterator[bytes]:
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 - feeder URL
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            yield chunk


def stream_download(url: str, dest: str, open_stream: StreamTransport | None = None,
                    max_attempts: int = 3) -> int:
    """Chunked fetch of ``url`` into ``dest``; returns bytes written.

    Mirrors the reference's read-loop (zoom_load.py:163-170) but commits
    atomically: bytes go to ``dest.part`` and only an os.rename exposes
    ``dest``. Retries restart the whole object (the default transport
    has no range support; an injected one may resume internally).
    """
    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    opener = open_stream or _default_open_stream
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    last_err: Exception | None = None
    for _ in range(max_attempts):
        written = 0
        try:
            with open(tmp, "wb") as f:
                for chunk in opener(url):
                    f.write(chunk)
                    written += len(chunk)
            os.rename(tmp, dest)
            return written
        except Exception as e:  # noqa: BLE001 - retry any transport error
            last_err = e
            if os.path.exists(tmp):
                os.remove(tmp)
    raise last_err  # type: ignore[misc]


def recording_file_name(recording: dict) -> str:
    """``{type with _ -> -}-{id}.{ext}`` — the reference's layout
    (zoom_load.py:154-158), kept byte-identical so a landing zone
    written by either feeder is interchangeable."""
    return "{}-{}.{}".format(
        str(recording["recording_type"]).replace("_", "-"),
        recording["id"],
        recording["file_extension"],
    )


@dataclass
class FetchResult:
    url: str
    path: str
    n_bytes: int | None
    error: str | None


def mirror_recordings(
    meetings: Iterable[dict],
    landing_dir: str,
    open_stream: StreamTransport | None = None,
    url_suffix: str = "",
    max_attempts: int = 3,
) -> list[FetchResult]:
    """Fan the per-meeting ``recording_files`` lists out into
    ``{landing_dir}/{meeting_id}/{type}-{id}.{ext}`` (reference
    zoom_load.py:148-182). One failed object never aborts the run —
    failures come back as :class:`FetchResult` rows with ``error`` set,
    the feeder's manifest for retry/alerting (the reference only
    logged). ``url_suffix`` carries the auth token query string the
    reference appended to every download_url."""
    results: list[FetchResult] = []
    for meeting in meetings:
        for rec in meeting.get("recording_files", []):
            # spec construction stays INSIDE the isolation boundary: a
            # malformed record (missing download_url/id/file_extension)
            # must become a FetchResult row, not abort the mirror run
            url = dest = ""
            try:
                url = str(rec["download_url"]) + url_suffix
                dest = os.path.join(
                    landing_dir, str(meeting["id"]), recording_file_name(rec)
                )
                n = stream_download(
                    url, dest, open_stream=open_stream, max_attempts=max_attempts
                )
                results.append(FetchResult(url, dest, n, None))
            except Exception as e:  # noqa: BLE001 - per-file isolation
                results.append(FetchResult(url, dest, None, repr(e)))
    return results
