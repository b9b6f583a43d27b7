"""REST catalog facade over a lake warehouse — the S18 service role.

The reference deploys an Iceberg REST catalog service that every engine
talks to for table metadata and commit CAS (docker-compose.yml:126-137
runs the catalog container; trino/iceberg.properties:2-6 points Trino at
``rest`` + S3 FileIO; README.md:129-133 shows a second engine reading
the same tables through it). This module serves that role for the
snapshot-log stand-in: a localhost HTTP service over a warehouse
directory, speaking the REST-catalog interaction shapes —

- ``GET  /v1/config``                      → warehouse root
- ``GET  /v1/tables``                      → table identifiers
- ``GET  /v1/tables/{name}``               → current table metadata:
  schema, properties, current version, the snapshot document, and the
  snapshot's data/delete files resolved to ABSOLUTE paths (the FileIO
  role: a reader needs no knowledge of the warehouse layout)
- ``GET  /v1/tables/{name}/snapshots/{N}`` → the same at version N
  (time travel)
- ``POST /v1/tables/{name}/commit``        → compare-and-swap the
  VERSION pointer: body ``{"requirements": {"expected-version": N},
  "updates": {"set-current-version": M}}`` flips N→M atomically UNDER
  THE SAME COMMIT SECTION every writer uses (flock or coordinator
  service — lake/coordinator.py), answering 409 on a stale expectation
  (the Iceberg REST ``CommitFailedException`` shape). M must name an
  existing staged/published snapshot — the facade moves pointers, it
  never invents state.

What this proves (and what it doesn't): a SECOND PROCESS with no engine
code — a plain pyarrow/DuckDB script — can discover and read a committed
table's current snapshot through the facade, and pointer flips serialize
through the catalog service across processes
(tests/test_rest_catalog.py). The metadata/data FORMAT remains the
stand-in's (snapshot-log JSON + parquet), not Iceberg's binary
manifests — the remaining third of S18, untestable without the
Spark–Iceberg runtime jars.

Deliberately Spark-free: readers (and the server) import only the
standard library, so a consumer process needs no JVM.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.request
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from fluss_iceberg_spark.lake import coordinator


def enable_for_writers(warehouse: str, endpoint: str) -> None:
    """Route every future single-table pointer commit in ``warehouse``
    through the facade at ``endpoint`` (lake/table._commit stages under
    rest-v{N}.json and POSTs the CAS instead of flipping the pointer
    itself — the deployment topology where writers never touch catalog
    state directly; multi-table txn publishes and WAP fast_forward keep
    their direct lock-held flips under the same section). Atomic merge
    into _catalog.json so a commit-coordinator opt-in coexists."""
    coordinator.merge_catalog_key(warehouse, "rest-catalog", endpoint)


def _is_valid_name(name: str) -> bool:
    """Same rule as LakeCatalog.create_table (lake/table.py): a table
    name resolves to a DIRECT child of the warehouse, never outside."""
    return bool(name) and name not in (".", "..") and "/" not in name and "\\" not in name


@contextmanager
def _commit_section(warehouse: str):
    """The SAME critical section every writer's pointer flip takes
    (lake/table._commit_lock): coordinator service when the warehouse
    opted in via _catalog.json, else flock on _commit.lock. Reimplemented
    here (not imported) so the facade stays importable without pyspark;
    the lock file name and coordinator scope string match table.py's
    byte-for-byte — tests pin mutual exclusion across both entry
    points."""
    import fcntl

    wh = os.path.abspath(warehouse).rstrip(os.sep)
    endpoint = coordinator.endpoint_for(wh)
    if endpoint:
        client = coordinator.CoordinatorClient(endpoint, scope=wh)
        try:
            yield
        finally:
            client.close()
        return
    fd = os.open(os.path.join(wh, "_commit.lock"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _current_version(tpath: str) -> int:
    """-1 when no commit has happened yet — same semantics as
    LakeTable.current_version (a fresh table has no VERSION file)."""
    vf = os.path.join(tpath, "meta", "VERSION")
    if not os.path.exists(vf):
        return -1
    with open(vf) as f:
        return int(f.read().strip())


def _table_doc(warehouse: str, name: str, version: int | None = None) -> dict:
    """Assemble the metadata document a reader needs: table meta,
    resolved snapshot, absolute file paths. Raises FileNotFoundError /
    ValueError for the handler to map to 404/400."""
    tpath = os.path.join(warehouse, name)
    with open(os.path.join(tpath, "meta", "table.json")) as f:
        meta = json.load(f)
    current = _current_version(tpath)
    v = current if version is None else int(version)
    if v < 0:  # empty table: no snapshot yet
        snap = None
    else:
        with open(os.path.join(tpath, "meta", f"v{v}.json")) as f:
            snap = json.load(f)
    doc = {
        "name": name,
        "location": tpath,
        "schema": meta.get("schema"),
        "primary-key": meta.get("primary_key") or [],
        "properties": meta.get("properties") or {},
        "current-version": current,
        "snapshot-version": v,
        "snapshot": snap,
    }
    if snap is not None:
        doc["data-files"] = [os.path.join(tpath, f) for f in snap.get("files", [])]
        doc["delete-files"] = [
            os.path.join(tpath, f) for f in snap.get("delete_files", []) or []
        ]
    else:
        doc["data-files"] = []
        doc["delete-files"] = []
    return doc


def _cas_commit(warehouse: str, name: str, body: dict) -> dict:
    """Pointer CAS under the shared commit section. Returns the new
    state dict; raises _Conflict/_BadRequest for HTTP mapping."""
    req = body.get("requirements") or {}
    upd = body.get("updates") or {}
    try:
        expected = int(req["expected-version"])
        target = int(upd["set-current-version"])
    except (KeyError, TypeError, ValueError):
        raise _BadRequest(
            "body needs integer requirements.expected-version and "
            "updates.set-current-version"
        )
    tpath = os.path.join(warehouse, name)
    with _commit_section(warehouse):
        vf = os.path.join(tpath, "meta", "VERSION")
        current = _current_version(tpath)
        if current != expected:
            raise _Conflict(
                f"expected v{expected} but {name} is at v{current}"
            )
        # target resolution, all UNDER the section (a concurrent
        # expire_snapshots between an outside check and the flip could
        # otherwise wedge the pointer on a deleted snapshot): either an
        # already-published snapshot (pure pointer move — rollback), or
        # a writer's staged rest-v{N}.json, which the facade LINKS into
        # its public place here — the staged name stays invisible to
        # readers until this exact moment, so a routed commit that
        # never reaches this point leaves no phantom snapshot.
        snap_file = os.path.join(tpath, "meta", f"v{target}.json")
        if not os.path.exists(snap_file):
            staged = os.path.join(tpath, "meta", f"rest-v{target}.json")
            try:
                os.link(staged, snap_file)
                os.remove(staged)  # consumed; client cleanup is a no-op
            except FileNotFoundError:
                raise _BadRequest(
                    f"v{target} is neither a published snapshot of "
                    f"{name} nor staged for publication"
                )
        tmp = f"{vf}.casa.tmp"
        with open(tmp, "w") as f:
            f.write(str(target))
        os.replace(tmp, vf)  # atomic, same as every writer's flip
    return {"name": name, "current-version": target}


class _BadRequest(ValueError):
    pass


class _Conflict(ValueError):
    pass


class _Handler(BaseHTTPRequestHandler):
    server_version = "FlussLakeRestCatalog/1"

    def log_message(self, *a):  # quiet: tests assert on payloads
        pass

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _route(self):
        wh = self.server.warehouse  # type: ignore[attr-defined]
        parts = [p for p in self.path.split("?")[0].split("/") if p]
        if parts == ["v1", "config"]:
            return {"warehouse": wh, "defaults": {}, "overrides": {}}
        if parts == ["v1", "tables"]:
            names = sorted(
                n
                for n in os.listdir(wh)
                if os.path.exists(os.path.join(wh, n, "meta", "table.json"))
            )
            return {"identifiers": names}
        if len(parts) >= 3 and parts[:2] == ["v1", "tables"]:
            name = parts[2]
            if not _is_valid_name(name):
                raise _BadRequest(f"invalid table name {name!r}")
            if len(parts) == 3:
                return _table_doc(wh, name)
            if len(parts) == 5 and parts[3] == "snapshots":
                try:
                    v = int(parts[4])
                except ValueError:
                    raise _BadRequest(
                        f"snapshot version must be an integer, got {parts[4]!r}"
                    )
                return _table_doc(wh, name, version=v)
        raise FileNotFoundError(self.path)

    def do_GET(self):
        try:
            self._send(200, self._route())
        except (FileNotFoundError, NotADirectoryError):
            self._send(404, {"error": f"not found: {self.path}"})
        except _BadRequest as e:
            self._send(400, {"error": str(e)})
        except Exception as e:  # a broken request must not kill the server
            self._send(500, {"error": f"{type(e).__name__}: {e}"})

    def do_POST(self):
        wh = self.server.warehouse  # type: ignore[attr-defined]
        try:
            parts = [p for p in self.path.split("/") if p]
            if len(parts) != 4 or parts[:2] != ["v1", "tables"] or parts[3] != "commit":
                raise FileNotFoundError(self.path)
            name = parts[2]
            if not _is_valid_name(name):
                raise _BadRequest(f"invalid table name {name!r}")
            n = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(n) or b"{}")
            self._send(200, _cas_commit(wh, name, body))
        except FileNotFoundError:
            self._send(404, {"error": f"not found: {self.path}"})
        except _Conflict as e:
            self._send(409, {"error": str(e)})
        except (_BadRequest, json.JSONDecodeError) as e:
            self._send(400, {"error": str(e)})
        except Exception as e:
            self._send(500, {"error": f"{type(e).__name__}: {e}"})


class RestCatalogServer:
    """Localhost HTTP facade over one warehouse. ``start()`` binds an
    ephemeral port and serves from a daemon thread; ``endpoint`` is the
    base URL a client passes to the helpers below."""

    def __init__(self, warehouse: str, host: str = "127.0.0.1", port: int = 0):
        self.warehouse = os.path.abspath(warehouse)
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.warehouse = self.warehouse  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def endpoint(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> "RestCatalogServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


# ---- client helpers (stdlib-only; usable from an engine-free process) ----


def http_json(url: str, body: dict | None = None, timeout: float = 10.0):
    """GET (body None) or POST json; returns (status, payload)."""
    data = None if body is None else json.dumps(body).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def fetch_table(endpoint: str, name: str, version: int | None = None) -> dict:
    url = f"{endpoint}/v1/tables/{name}"
    if version is not None:
        url += f"/snapshots/{version}"
    status, doc = http_json(url)
    if status != 200:
        raise RuntimeError(f"GET {url} -> {status}: {doc}")
    return doc


def cas_commit(endpoint: str, name: str, expected: int, target: int) -> tuple:
    """(status, payload) of a pointer CAS through the facade."""
    return http_json(
        f"{endpoint}/v1/tables/{name}/commit",
        body={
            "requirements": {"expected-version": expected},
            "updates": {"set-current-version": target},
        },
    )
