"""REST catalog facade over a lake warehouse — the S18 service role.

The reference deploys an Iceberg REST catalog service that every engine
talks to for table metadata and commit CAS (docker-compose.yml:126-137
runs the catalog container; trino/iceberg.properties:2-6 points Trino at
``rest`` + S3 FileIO; README.md:129-133 shows a second engine reading
the same tables through it). This module serves that role for the
snapshot-log stand-in: a localhost HTTP service over a warehouse
directory, speaking the REST-catalog interaction shapes —

- ``GET  /v1/config``                      → warehouse root
- ``GET  /v1/namespaces``                  → the single namespace
  (``["default"]`` — directory-per-table warehouses are flat)
- ``GET  /v1/namespaces/default/tables``   → table identifiers in the
  spec's ``{"identifiers": [{"namespace": [...], "name": ...}]}`` shape
- ``GET  /v1/namespaces/default/tables/{name}`` → current table
  metadata: schema, properties, current version, the snapshot document,
  and the snapshot's data/delete files resolved to ABSOLUTE paths (the
  FileIO role: a reader needs no knowledge of the warehouse layout);
  plus ``metadata-location`` when an Iceberg-format metadata export
  exists (lake/iceberg_meta.py)
- ``GET  /v1/namespaces/default/tables/{name}/snapshots/{N}`` → the
  same at version N (time travel; a stand-in extension — the spec
  exposes time travel through the metadata document itself)
- ``POST /v1/namespaces/default/tables/{name}`` → the spec's
  updateTable commit shape: body ``{"requirements": [{"type":
  "assert-current-version", "version": N}], "updates": [{"action":
  "set-current-version", "version": M}]}`` compare-and-swaps the
  VERSION pointer N→M atomically UNDER THE SAME COMMIT SECTION every
  writer uses (flock or coordinator service — lake/coordinator.py),
  answering 409 on a stale expectation (the Iceberg REST
  ``CommitFailedException`` shape). M must name an existing
  staged/published snapshot — the facade moves pointers, it never
  invents state.
- ``POST /v1/transactions/commit``         → the spec's
  commitTransaction shape: ``{"table-changes": [{"name": ...,
  "requirements": [...], "updates": [...], "staged-versions": [...]},
  ...]}`` — ALL tables' expectations verified, ALL staged snapshots
  linked public, an intent file written (the commit point — the same
  ``_txn/`` roll-forward protocol LakeCatalog recovery replays), then
  every pointer flipped, all under ONE commit section. Any failure
  before the intent aborts every table; readers never observe a
  partial transaction.

Legacy flat routes (``/v1/tables...``, POST ``.../commit`` with the
dict-shaped body) remain as aliases. Route/payload divergence from the
Iceberg REST spec, stated: paths omit the ``{prefix}`` segment; the
requirement/update type names are stand-in ones (``assert-current-
version`` / ``set-current-version``) because the underlying metadata
model is a VERSION pointer over snapshot-log JSON, not Iceberg's
``metadata_location`` + snapshot-id refs (the spec's
``assert-ref-snapshot-id`` / ``add-snapshot``); ``staged-versions`` in
the transaction body is a stand-in extension (the spec ships staged
metadata inside the update objects themselves).

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
    """Route every future pointer commit in ``warehouse`` through the
    facade at ``endpoint`` — single-table commits stage under
    rest-v{N}.json and POST the CAS (lake/table._commit), multi-table
    transactions POST the whole publish to /v1/transactions/commit
    (CatalogTransaction._commit_via_rest) — the deployment topology
    where writers never touch catalog state directly. WAP
    fast_forward keeps its direct lock-held flip under the same
    section. Atomic merge into _catalog.json so a commit-coordinator
    opt-in coexists."""
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
    # VERSION is read OUTSIDE the commit section (GETs must not queue
    # behind commits), so a racing expire_snapshots or pointer flip can
    # delete v{current}.json between the pointer read and the open. For
    # a CURRENT-snapshot request that is transient by construction —
    # re-read the pointer and retry once; only an explicit version=N
    # request may legitimately 404.
    for attempt in (0, 1):
        current = _current_version(tpath)
        v = current if version is None else int(version)
        try:
            if v < 0:  # empty table: no snapshot yet
                snap = None
            else:
                with open(os.path.join(tpath, "meta", f"v{v}.json")) as f:
                    snap = json.load(f)
            break
        except FileNotFoundError:
            if version is not None or attempt:
                raise
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
    # Iceberg-format metadata export, when one exists (the spec's
    # LoadTableResult carries metadata-location; lake/iceberg_meta.py
    # writes metadata/v{K}.metadata.json + version-hint.text)
    hint = os.path.join(tpath, "metadata", "version-hint.text")
    try:
        with open(hint) as f:
            k = int(f.read().strip())
        mloc = os.path.join(tpath, "metadata", f"v{k}.metadata.json")
        if os.path.exists(mloc):
            doc["metadata-location"] = mloc
    except (OSError, ValueError):
        pass
    return doc


def _parse_change(body: dict) -> tuple[int, int]:
    """(expected, target) from EITHER commit-body shape: the spec's
    list form — requirements ``[{"type": "assert-current-version",
    "version": N}]``, updates ``[{"action": "set-current-version",
    "version": M}]`` — or the legacy dict form
    ``{"expected-version": N} / {"set-current-version": M}``."""
    req, upd = body.get("requirements") or {}, body.get("updates") or {}
    try:
        if isinstance(req, list):
            (expected,) = [
                int(r["version"])
                for r in req
                if r.get("type") == "assert-current-version"
            ]
        else:
            expected = int(req["expected-version"])
        if isinstance(upd, list):
            (target,) = [
                int(u["version"])
                for u in upd
                if u.get("action") == "set-current-version"
            ]
        else:
            target = int(upd["set-current-version"])
    except (KeyError, TypeError, ValueError):
        raise _BadRequest(
            "commit body needs exactly one assert-current-version "
            "requirement and one set-current-version update (spec list "
            "form) or integer requirements.expected-version and "
            "updates.set-current-version (legacy dict form)"
        )
    return expected, target


def _cas_commit(warehouse: str, name: str, body: dict) -> dict:
    """Pointer CAS under the shared commit section. Returns the new
    state dict; raises _Conflict/_BadRequest for HTTP mapping."""
    expected, target = _parse_change(body)
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


def _txn_commit(warehouse: str, body: dict) -> dict:
    """Multi-table atomic commit under ONE commit section — the Iceberg
    REST spec's commitTransaction role, speaking the SAME write-ahead-
    intent protocol as CatalogTransaction.commit (lake/table.py), so a
    crash mid-publish is rolled forward by the same LakeCatalog
    recovery sweep:

    1. verify every table's pointer matches its assert-current-version
       requirement (any mismatch → 409, nothing touched);
    2. hard-link every table's staged ``txn-v{N}.json`` into its public
       ``v{N}.json`` place (a racing writer that claimed an id → 409,
       OUR links rolled back by inode identity — never a racer's file);
    3. write the ``_txn/txn-<id>.json`` intent (THE commit point);
    4. flip every pointer, drop the intent and the staged names.

    Body: ``{"table-changes": [{"name", "requirements", "updates",
    "staged-versions": [every snapshot version the txn staged for the
    table — intermediate ones too, all needing publication]}]}``."""
    import uuid

    changes = body.get("table-changes")
    if not isinstance(changes, list) or not changes:
        raise _BadRequest("body needs a non-empty table-changes list")
    parsed = []  # (name, tpath, expected, target, [versions to link])
    for ch in changes:
        name = ch.get("name") or (ch.get("identifier") or {}).get("name")
        if not name or not _is_valid_name(name):
            raise _BadRequest(f"invalid table name {name!r}")
        expected, target = _parse_change(ch)
        versions = ch.get("staged-versions") or [target]
        try:
            versions = sorted({int(v) for v in versions} | {target})
        except (TypeError, ValueError):
            raise _BadRequest("staged-versions must be integers")
        parsed.append(
            (name, os.path.join(warehouse, name), expected, target, versions)
        )
    with _commit_section(warehouse):
        for name, tpath, expected, _, _ in parsed:
            current = _current_version(tpath)
            if current != expected:
                raise _Conflict(
                    f"expected v{expected} but {name} is at v{current}"
                )
        linked: list[tuple[str, str]] = []  # (staged, public) WE created
        try:
            for name, tpath, _, _, versions in parsed:
                for v in versions:
                    staged = os.path.join(tpath, "meta", f"txn-v{v}.json")
                    public = os.path.join(tpath, "meta", f"v{v}.json")
                    try:
                        os.link(staged, public)
                    except FileExistsError:
                        raise _Conflict(
                            f"concurrent writer claimed snapshot v{v} "
                            f"of {name}"
                        )
                    except FileNotFoundError:
                        raise _BadRequest(
                            f"v{v} of {name} is not staged for "
                            "publication (txn-v{N}.json missing — "
                            "expired or never staged)"
                        )
                    linked.append((staged, public))
        except Exception:
            # pre-intent abort: remove only the links WE made (inode
            # identity — mirror CatalogTransaction._abort), leave the
            # staged names for the client's own abort path
            for staged, public in linked:
                try:
                    if os.path.exists(public) and os.path.samefile(
                        staged, public
                    ):
                        os.remove(public)
                except FileNotFoundError:
                    pass
            raise
        intent_dir = os.path.join(warehouse, "_txn")
        os.makedirs(intent_dir, exist_ok=True)
        intent_path = os.path.join(intent_dir, f"txn-{uuid.uuid4().hex}.json")
        tmp = f"{intent_path}.tmp"
        with open(tmp, "w") as f:
            f.write(
                json.dumps(
                    {
                        "entries": [
                            {"path": tpath, "version": target}
                            for _, tpath, _, target, _ in parsed
                        ]
                    }
                )
            )
        os.replace(tmp, intent_path)  # the commit point
        # post-intent: durably committed — publish and clean up; any
        # failure here is repaired by LakeCatalog._recover_transactions
        for name, tpath, _, target, versions in parsed:
            vf = os.path.join(tpath, "meta", "VERSION")
            tmp = f"{vf}.txnc.tmp"
            with open(tmp, "w") as f:
                f.write(str(target))
            os.replace(tmp, vf)
        os.remove(intent_path)
        for name, tpath, _, _, versions in parsed:
            for v in versions:
                try:
                    os.remove(os.path.join(tpath, "meta", f"txn-v{v}.json"))
                except FileNotFoundError:
                    pass
    return {
        "results": [
            {"name": name, "current-version": target}
            for name, _, _, target, _ in parsed
        ]
    }


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
        if parts == ["v1", "namespaces"]:
            return {"namespaces": [["default"]]}
        # spec-shaped namespace-scoped paths alias the flat legacy ones
        # (single flat namespace — see module docstring)
        if len(parts) >= 3 and parts[:2] == ["v1", "namespaces"]:
            if parts[2] != "default":
                raise FileNotFoundError(self.path)
            spec = True
            parts = ["v1"] + parts[3:]
        else:
            spec = False
        if parts == ["v1", "tables"]:
            names = sorted(
                n
                for n in os.listdir(wh)
                if os.path.exists(os.path.join(wh, n, "meta", "table.json"))
            )
            if spec:
                return {
                    "identifiers": [
                        {"namespace": ["default"], "name": n} for n in names
                    ]
                }
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
            n = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(n) or b"{}")
            if parts == ["v1", "transactions", "commit"]:
                self._send(200, _txn_commit(wh, body))
                return
            # spec updateTable: POST /v1/namespaces/default/tables/{name}
            if (
                len(parts) == 5
                and parts[:3] == ["v1", "namespaces", "default"]
                and parts[3] == "tables"
            ):
                name = parts[4]
            # legacy: POST /v1/tables/{name}/commit
            elif (
                len(parts) == 4
                and parts[:2] == ["v1", "tables"]
                and parts[3] == "commit"
            ):
                name = parts[2]
            else:
                raise FileNotFoundError(self.path)
            if not _is_valid_name(name):
                raise _BadRequest(f"invalid table name {name!r}")
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
    """(status, payload) of a pointer CAS through the facade — the
    spec's updateTable route and list-shaped body."""
    return http_json(
        f"{endpoint}/v1/namespaces/default/tables/{name}",
        body={
            "requirements": [
                {"type": "assert-current-version", "version": expected}
            ],
            "updates": [{"action": "set-current-version", "version": target}],
        },
    )


def commit_transaction(endpoint: str, changes: list[dict]) -> tuple:
    """(status, payload) of a multi-table atomic commit through the
    facade. ``changes``: [{"name", "expected", "target",
    "staged_versions"}] — translated to the commitTransaction body."""
    return http_json(
        f"{endpoint}/v1/transactions/commit",
        body={
            "table-changes": [
                {
                    "name": c["name"],
                    "requirements": [
                        {
                            "type": "assert-current-version",
                            "version": c["expected"],
                        }
                    ],
                    "updates": [
                        {
                            "action": "set-current-version",
                            "version": c["target"],
                        }
                    ],
                    "staged-versions": c.get("staged_versions")
                    or [c["target"]],
                }
                for c in changes
            ]
        },
    )
