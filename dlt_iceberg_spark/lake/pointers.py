"""Pointer stores — who owns a table's branch heads.

The commit protocol's one atomic step is the branch-pointer swap.  On
POSIX/HDFS storage the swap is an atomic file rename (the default,
:class:`FilePointerStore` semantics inlined in ``LakeTable``).  Object
stores cannot rename atomically, which is why real Iceberg moves the swap
into a catalog: the REST catalog's ``updateTable`` commit carries an
``assert-ref-snapshot-id`` requirement and the server answers 409 when the
ref moved — a compare-and-swap.  This module is that design:

- :class:`RestPointerStore` — HTTP client for a CAS pointer service.  The
  endpoint shapes mirror the Iceberg REST commit model (requirement =
  expected head, 409 = CommitFailedException); auth rides the same
  bearer-token surface ``lake/iceberg_config.py`` configures.
- :class:`MockCatalogServer` — a real in-process HTTP server (stdlib,
  thread + lock) implementing the CAS contract, so the catalog-commit
  path is EXERCISED live in tests rather than skipped: object-store-style
  (rename-less) storage + catalog CAS commits end-to-end
  (tests/test_rest_pointer.py).  A production deployment swaps the URL
  for Nessie/Lakekeeper/Polaris; the client code path is identical.

Reference surface: the reference integration-tests its REST catalogs in
tests/test_destination_rest_catalog.py:44-681 (Nessie + Lakekeeper); no
live endpoint exists in this sandbox, so the mock serves the same
contract in-process.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from typing import Any


class RestPointerStore:
    """Branch-pointer CAS over HTTP.

    Endpoints (table_id = URL-quoted table location):

    - ``GET  {base}/v1/tables/{id}/refs`` → ``{"refs": {name: version}}``
    - ``POST {base}/v1/tables/{id}/commit`` with
      ``{"ref": name, "expected": int|null, "new": int}`` → 200, or 409
      when the ref's head is not ``expected`` (the CAS failure).
    - ``DELETE {base}/v1/tables/{id}/refs/{name}``

    ``token`` is sent as a Bearer header (the REST-catalog auth shape).
    """

    def __init__(self, base_url: str, table_location: str, token: str | None = None):
        self.base_url = base_url.rstrip("/")
        self.table_id = urllib.parse.quote(table_location, safe="")
        self.token = token

    def _req(self, method: str, path: str, body: dict | None = None) -> tuple[int, Any]:
        url = f"{self.base_url}/v1/tables/{self.table_id}{path}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=10) as resp:
                payload = resp.read()
                return resp.status, json.loads(payload) if payload else None
        except urllib.error.HTTPError as err:
            return err.code, None

    def get(self, ref: str) -> int | None:
        status, body = self._req("GET", "/refs")
        if status != 200:
            raise ConnectionError(f"pointer catalog GET refs -> {status}")
        return (body or {}).get("refs", {}).get(ref)

    def refs(self) -> dict[str, int]:
        status, body = self._req("GET", "/refs")
        if status != 200:
            raise ConnectionError(f"pointer catalog GET refs -> {status}")
        return dict((body or {}).get("refs", {}))

    def cas(self, ref: str, expected: int | None, new: int) -> bool:
        """True = the swap happened; False = the ref moved (commit lost)."""
        status, _ = self._req(
            "POST", "/commit", {"ref": ref, "expected": expected, "new": new}
        )
        if status == 200:
            return True
        if status == 409:
            return False
        raise ConnectionError(f"pointer catalog commit -> {status}")

    def delete_ref(self, ref: str) -> None:
        status, _ = self._req("DELETE", f"/refs/{urllib.parse.quote(ref, safe='')}")
        if status == 404:
            raise FileNotFoundError(ref)
        if status != 200:
            raise ConnectionError(f"pointer catalog DELETE ref -> {status}")


def rest_commit_transaction(
    base_url: str, changes: list[dict], token: str | None = None
) -> bool:
    """Multi-ref CAS — the Iceberg REST ``commitTransaction`` shape.

    ``changes``: ``[{"table": location, "ref": name, "expected": int|None,
    "new": int}, ...]``.  The server applies ALL swaps under one lock or
    none (409).  True = committed; False = some ref moved."""
    url = f"{base_url.rstrip('/')}/v1/transactions"
    body = json.dumps({"changes": changes}).encode()
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status == 200
    except urllib.error.HTTPError as err:
        if err.code == 409:
            return False
        raise ConnectionError(f"pointer catalog transaction -> {err.code}")


class MockCatalogServer:
    """In-process CAS pointer service (stdlib HTTP, true compare-and-swap
    under a lock).  ``start()`` returns the base URL; ``stop()`` tears it
    down.  Optionally requires a bearer token (auth-wiring test)."""

    def __init__(self, token: str | None = None):
        self._token = token
        self._tables: dict[str, dict[str, int]] = {}
        self._lock = threading.Lock()
        self._httpd = None
        self._thread = None

    # -- server ------------------------------------------------------------

    def start(self) -> str:
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence
                pass

            def _send(self, code: int, body: dict | None = None):
                payload = json.dumps(body).encode() if body is not None else b""
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def _auth_ok(self) -> bool:
                if outer._token is None:
                    return True
                return self.headers.get("Authorization") == f"Bearer {outer._token}"

            def _parse(self):
                # /v1/tables/{id}/refs[/{ref}] | /v1/tables/{id}/commit
                parts = self.path.split("/")
                if len(parts) < 5 or parts[1] != "v1" or parts[2] != "tables":
                    return None
                table = urllib.parse.unquote(parts[3])
                return table, parts[4:]

            def do_GET(self):
                if not self._auth_ok():
                    return self._send(401)
                parsed = self._parse()
                if not parsed or parsed[1] != ["refs"]:
                    return self._send(404)
                with outer._lock:
                    refs = dict(outer._tables.get(parsed[0], {}))
                self._send(200, {"refs": refs})

            def do_POST(self):
                if not self._auth_ok():
                    return self._send(401)
                if self.path == "/v1/transactions":
                    # multi-ref CAS (Iceberg REST commitTransaction): every
                    # change validates under ONE lock hold, then every swap
                    # applies — indivisible for any concurrent client
                    n = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    changes = body.get("changes", [])
                    with outer._lock:
                        for c in changes:
                            refs = outer._tables.setdefault(c["table"], {})
                            if refs.get(c["ref"]) != c.get("expected"):
                                return self._send(409)
                        for c in changes:
                            outer._tables[c["table"]][c["ref"]] = int(c["new"])
                    return self._send(200, {"committed": len(changes)})
                parsed = self._parse()
                if not parsed or parsed[1] != ["commit"]:
                    return self._send(404)
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                ref, expected, new = body["ref"], body.get("expected"), body["new"]
                with outer._lock:  # the CAS
                    refs = outer._tables.setdefault(parsed[0], {})
                    if refs.get(ref) != expected:
                        return self._send(409)
                    refs[ref] = int(new)
                self._send(200, {"ref": ref, "version": int(new)})

            def do_DELETE(self):
                if not self._auth_ok():
                    return self._send(401)
                parsed = self._parse()
                if not parsed or len(parsed[1]) != 2 or parsed[1][0] != "refs":
                    return self._send(404)
                name = urllib.parse.unquote(parsed[1][1])
                with outer._lock:
                    refs = outer._tables.get(parsed[0], {})
                    if name not in refs:
                        return self._send(404)
                    del refs[name]
                self._send(200, {})

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        host, port = self._httpd.server_address
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd:
            self._httpd.shutdown()
            self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
