"""HTTP conditional-PUT commit store (VERDICT r5 ask #1): the
object-store half of the LogStore split, speaking a *generic* HTTP
protocol — RFC 7232 conditional requests over plain ``urllib`` — so the
versioned layer's CAS contract is proven against a real network
boundary (sockets, lost responses, retries), not just an in-process
dict. No cloud SDK: ``If-None-Match: *`` is exactly the primitive S3
(since 2024-08), GCS (``x-goods-if-generation-match: 0`` analogue), and
Azure (``If-None-Match: *``) expose for create-if-absent, so a real
deployment swaps the URL and auth header and keeps this class.

Protocol (the server half is :class:`LocalObjectStoreServer`, an
in-process stdlib ``http.server`` used by tests and local dev):

- ``PUT /<ns>/<name>`` with ``If-None-Match: *`` -> ``201`` created,
  ``412`` already exists (the CAS), ``400`` on short body (a torn
  upload never publishes — Content-Length is authoritative);
- ``PUT /<ns>/<name>`` unconditional -> ``200`` (pointer overwrites);
- ``GET`` / ``HEAD`` -> ``200`` body / ``404``;
- ``GET /<ns>/`` -> ``200``, newline-joined object names (LIST);
- ``DELETE`` -> ``204`` / ``404``.

THE retry problem this class exists to solve: a PUT whose *response*
is lost (timeout, connection reset) may or may not have landed. The
naive retry re-issues the conditional PUT, gets ``412``, and reports
"conflict" — the commit layer would then retry at version N+2 and
APPEND THE SAME FILES TWICE. :meth:`HttpCommitStore.put_if_absent`
disambiguates the way Delta's S3 log stores do: on a 412 after a
network error, it GETs the published object and compares bytes —
identical means OUR earlier attempt landed (success); different means
a concurrent writer genuinely won (conflict). Manifest bytes embed
uuid-named staged files, so cross-writer byte collisions cannot occur.

Reference parity note: the reference keeps all state on an object
store and relies on Spark's last-writer-wins overwrite (zoom_proc.py
S3 writes); this store is what lets the SAME layout carry transactions
there. See SURVEY.md §2 (versioned lake).
"""

from __future__ import annotations

import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .commitstore import CommitStore

_POINTER_NAME = "_latest"


class _ObjHandler(BaseHTTPRequestHandler):
    """One namespace-per-table blob server with conditional PUT.
    State lives on ``self.server``: ``objects`` (ns -> name -> bytes)
    guarded by ``lock`` — the single mutation point is the locked
    setdefault inside :meth:`do_PUT`, which is the whole CAS."""

    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # quiet: tests read assertions, not logs
        pass

    def _split(self) -> tuple[str, str]:
        # split BEFORE unquoting: the namespace is a single url-quoted
        # segment whose decoded form contains slashes
        path = self.path.split("?", 1)[0]
        ns, _, name = path.lstrip("/").partition("/")
        return urllib.parse.unquote(ns), urllib.parse.unquote(name)

    def _respond(self, code: int, body: bytes = b"") -> None:
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    def _fault(self, kind: str) -> bool:
        """Consume one scheduled fault of ``kind`` (thread-safe)."""
        with self.server.lock:
            n = self.server.faults.get(kind, 0)
            if n > 0:
                self.server.faults[kind] = n - 1
                return True
        return False

    def do_PUT(self) -> None:
        ns, name = self._split()
        want = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(want)
        if len(body) != want or self._fault("torn_request"):
            # torn upload: NOTHING publishes (atomic-PUT object-store
            # semantics — an incomplete body is a failed request)
            self._respond(400)
            return
        conditional = self.headers.get("If-None-Match") == "*"
        with self.server.lock:
            objs = self.server.objects.setdefault(ns, {})
            if conditional and name in objs:
                created = False
            else:
                objs[name] = body
                created = True
        if self._fault("drop_response"):
            # the write LANDED but the response is lost mid-flight —
            # the client sees a network error and must disambiguate
            self.close_connection = True
            try:
                self.connection.close()
            except OSError:
                pass
            return
        if not conditional:
            self._respond(200)
        else:
            self._respond(201 if created else 412)

    def do_GET(self) -> None:
        ns, name = self._split()
        with self.server.lock:
            objs = dict(self.server.objects.get(ns, {}))
        if not name:  # LIST
            self._respond(200, "\n".join(sorted(objs)).encode())
            return
        if name in objs:
            self._respond(200, objs[name])
        else:
            self._respond(404)

    do_HEAD = do_GET

    def do_DELETE(self) -> None:
        ns, name = self._split()
        with self.server.lock:
            existed = self.server.objects.get(ns, {}).pop(name, None)
        self._respond(204 if existed is not None else 404)


class LocalObjectStoreServer:
    """In-process conditional-PUT object store (stdlib http.server,
    threaded). Test double / local-dev stand-in for any store exposing
    ``If-None-Match: *``. ``faults`` is a mutable schedule the tests
    arm: ``{"drop_response": 1}`` loses the next PUT's response AFTER
    applying the write; ``{"torn_request": 1}`` fails the next PUT
    before anything publishes."""

    def __init__(self) -> None:
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), _ObjHandler)
        self._httpd.objects = {}
        self._httpd.lock = threading.Lock()
        self._httpd.faults = {}
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    @property
    def faults(self) -> dict:
        return self._httpd.faults

    def object_names(self, ns: str) -> list[str]:
        with self._httpd.lock:
            return sorted(self._httpd.objects.get(ns, {}))

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)


class HttpCommitStore(CommitStore):
    """CommitStore over the conditional-PUT protocol above.

    The log namespace is the url-quoted table path — the table_dir
    string is a pure namespace key here (nothing writes beneath it),
    mirroring how an S3 deployment keys the log by table URI while
    data files ride ordinary blob writes.

    ``put_if_absent`` retries transport errors up to ``attempts``
    times; a retry answered ``412`` runs the ambiguous-success check
    (GET + byte compare) described in the module docstring."""

    def __init__(self, base_url: str, attempts: int = 4) -> None:
        self.base_url = base_url.rstrip("/")
        self.attempts = attempts

    # -- transport ---------------------------------------------------
    def _url(self, table_dir: str, name: str = "") -> str:
        ns = urllib.parse.quote(table_dir, safe="")
        return f"{self.base_url}/{ns}/{urllib.parse.quote(name, safe='')}"

    def _request(
        self,
        method: str,
        url: str,
        data: bytes | None = None,
        headers: dict | None = None,
    ) -> tuple[int, bytes]:
        req = urllib.request.Request(
            url, data=data, method=method, headers=headers or {}
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()

    # -- contract ----------------------------------------------------
    def ensure_log(self, table_dir: str) -> None:
        pass  # namespaces are implicit (object stores have no mkdir)

    def put_if_absent(self, table_dir: str, name: str, data: bytes) -> bool:
        url = self._url(table_dir, name)
        sent_once = False
        last_err: Exception | None = None
        for _ in range(self.attempts):
            try:
                code, _ = self._request(
                    "PUT", url, data, {"If-None-Match": "*"}
                )
            except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
                # response lost — the PUT may or may not have landed;
                # loop to retry, remembering the ambiguity
                sent_once = True
                last_err = e
                continue
            if code == 201:
                return True
            if code == 412:
                if sent_once:
                    # disambiguate: if the published bytes are OURS, an
                    # earlier attempt landed and this commit SUCCEEDED —
                    # reporting conflict here would make the caller
                    # re-commit the same files at the next version
                    try:
                        return self.read(table_dir, name) == data
                    except FileNotFoundError:
                        continue  # vanished between PUT and GET: retry
                return False
            if code == 400:
                continue  # torn upload: nothing published, plain retry
            raise RuntimeError(f"conditional PUT {url} -> HTTP {code}")
        raise ConnectionError(
            f"conditional PUT {url} failed after {self.attempts} attempts"
        ) from last_err

    def read(self, table_dir: str, name: str) -> bytes:
        code, body = self._request("GET", self._url(table_dir, name))
        if code == 404:
            raise FileNotFoundError(f"{table_dir}/{name}")
        if code != 200:
            raise RuntimeError(f"GET {name} -> HTTP {code}")
        return body

    def exists(self, table_dir: str, name: str) -> bool:
        code, _ = self._request("HEAD", self._url(table_dir, name))
        return code == 200

    def list_log(self, table_dir: str) -> list[str]:
        code, body = self._request("GET", self._url(table_dir))
        if code == 404:
            return []  # genuinely-missing log: an uncommitted table
        if code != 200:
            # a transient 5xx must NOT look like an empty log — with a
            # missing pointer, current_version's listing fallback would
            # resolve to 0 and readers would spuriously report "no
            # committed version"
            raise RuntimeError(f"list {table_dir} -> HTTP {code}")
        names = [n for n in body.decode().splitlines() if n]
        return [n for n in names if n != _POINTER_NAME]

    def delete(self, table_dir: str, name: str) -> None:
        self._request("DELETE", self._url(table_dir, name))

    def read_pointer(self, table_dir: str) -> int | None:
        try:
            return int(self.read(table_dir, _POINTER_NAME).strip())
        except (FileNotFoundError, ValueError):
            return None

    def replace_pointer(self, table_dir: str, version: int) -> None:
        # unconditional PUT: the pointer is an advance-only cache and
        # last-writer-wins is inside the contract (see commitstore)
        try:
            self._request(
                "PUT", self._url(table_dir, _POINTER_NAME), str(version).encode()
            )
        except (urllib.error.URLError, ConnectionError, TimeoutError):
            pass  # cache write: safe to lose, current_version heals it
