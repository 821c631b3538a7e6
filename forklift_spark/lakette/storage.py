"""Storage backend seam for the lakette commit path (VERDICT r3 #5).

The table's COMMIT protocol needs exactly six primitives, each with a
direct object-store mapping — this interface makes that mapping code, not
a docstring claim, and lets the crash-window tests run against a
fault-injecting backend:

  ===================  =========================  ==========================
  primitive            posix impl                 object-store mapping
  ===================  =========================  ==========================
  put_json /           tmp + fsync + os.replace   PUT (last-writer-wins
  write_text_atomic                               overwrite; atomic per key)
  put_json_exclusive   tmp + os.link (hard-link   conditional PUT
  (the commit CAS)     create-if-absent)          (If-None-Match: * /
                                                  x-amz-conditional-write)
  read_text/read_json  open().read()              GET
  listdir              os.listdir                 LIST prefix
  remove               os.remove                  DELETE
  mtime                os.path.getmtime           LastModified from LIST
  ===================  =========================  ==========================

  (makedirs is a posix-only nicety — object stores have no directories;
  the memory backend treats it as a no-op, same as S3/GCS would.)

Row DATA always moves through Spark jobs against real files — the seam
covers the driver-side metadata protocol only (version files, manifest
shards, CURRENT swap, epoch markers, vacuum's list/delete), which is
exactly the part whose object-store behavior needed to be testable.

`MemoryStorage` adds fault injection for the crash-window tests:
  * `fail_after_put(substr)` — the write LANDS but the caller sees an
    error (a lost CAS acknowledgement: the canonical conditional-PUT
    ambiguity on object stores),
  * `crash_after_put(substr)` — process dies right after a write (the
    classic between-version-file-and-CURRENT-swap window),
  * `delay_visibility(substr)` — a PUT is not visible to exists/read/list
    until `settle()` (eventual-visibility races vs vacuum).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any


class SimulatedCrash(BaseException):
    """Raised by MemoryStorage crash hooks. Derives from BaseException so
    engine code's `except Exception` recovery paths cannot accidentally
    swallow a simulated process death."""


class Storage:
    """Abstract commit-path storage. Paths are plain strings (posix paths
    or object keys); callers compose them with os.path.join either way."""

    # --- reads
    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def read_json(self, path: str) -> dict[str, Any]:
        return json.loads(self.read_text(path))

    # --- writes
    def write_text_atomic(self, path: str, text: str) -> None:
        raise NotImplementedError

    def put_json(self, path: str, payload: dict) -> None:
        self.write_text_atomic(
            path, json.dumps(payload, indent=None, separators=(",", ":"))
        )

    def put_json_exclusive(self, path: str, payload: dict) -> None:
        """Create-if-absent (compare-and-swap). Raises FileExistsError when
        the key already exists — the caller turns that into its conflict."""
        raise NotImplementedError

    # --- namespace
    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        raise NotImplementedError


class PosixStorage(Storage):
    """The production-local backend: durable atomic writes (tmp + fsync +
    rename) and a hard-link create-if-absent CAS."""

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def put_json_exclusive(self, path: str, payload: dict) -> None:
        tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=None, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        try:
            # atomic create-if-absent (POSIX hard link fails on existing
            # target) — two committers racing to create the same version
            # file: exactly one succeeds, the other gets a clean conflict
            os.link(tmp, path)
        finally:
            os.remove(tmp)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def remove(self, path: str) -> None:
        os.remove(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)


class MemoryStorage(Storage):
    """In-memory backend with object-store semantics + fault injection.
    Thread-safe enough for the commit tests (GIL + atomic dict ops on the
    commit-critical paths)."""

    def __init__(self, now_fn=time.time):
        self._now = now_fn
        self._obj: dict[str, str] = {}
        self._mtime: dict[str, float] = {}
        self._hidden: dict[str, str] = {}  # written but not yet visible
        # fault knobs: substring-matched against the path being written
        self._fail_after: list[str] = []
        self._crash_after: list[str] = []
        self._delay: list[str] = []
        self.ops: list[tuple[str, str]] = []  # (op, path) audit log

    # ---- fault injection API
    def fail_after_put(self, substr: str) -> None:
        """Next write matching `substr` LANDS but raises to the caller —
        the lost-acknowledgement CAS ambiguity."""
        self._fail_after.append(substr)

    def crash_after_put(self, substr: str) -> None:
        """Next write matching `substr` lands, then SimulatedCrash."""
        self._crash_after.append(substr)

    def delay_visibility(self, substr: str) -> None:
        """Next write matching `substr` is durably staged but invisible to
        exists/read/list until settle() — eventual visibility."""
        self._delay.append(substr)

    def settle(self) -> None:
        """Make all delayed writes visible."""
        for k, v in self._hidden.items():
            self._obj[k] = v
            self._mtime[k] = self._now()
        self._hidden.clear()

    def _pop_match(self, knobs: list[str], path: str) -> bool:
        for i, s in enumerate(knobs):
            if s in path:
                knobs.pop(i)
                return True
        return False

    def _post_write(self, path: str) -> None:
        if self._pop_match(self._crash_after, path):
            raise SimulatedCrash(f"crash after write of {path}")
        if self._pop_match(self._fail_after, path):
            raise IOError(f"injected: write of {path} landed but ack was lost")

    def _store(self, path: str, text: str) -> None:
        if self._pop_match(self._delay, path):
            self._hidden[path] = text
        else:
            self._obj[path] = text
            self._mtime[path] = self._now()
        self.ops.append(("put", path))
        self._post_write(path)

    # ---- Storage impl
    def read_text(self, path: str) -> str:
        self.ops.append(("get", path))
        try:
            return self._obj[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    def write_text_atomic(self, path: str, text: str) -> None:
        self._store(path, text)

    def put_json_exclusive(self, path: str, payload: dict) -> None:
        if path in self._obj or path in self._hidden:
            raise FileExistsError(path)
        self._store(
            path, json.dumps(payload, indent=None, separators=(",", ":"))
        )

    def exists(self, path: str) -> bool:
        return path in self._obj or self.isdir(path)

    def isdir(self, path: str) -> bool:
        prefix = path.rstrip("/") + "/"
        return any(k.startswith(prefix) for k in self._obj)

    def listdir(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        names = {
            k[len(prefix):].split("/", 1)[0]
            for k in self._obj
            if k.startswith(prefix)
        }
        return sorted(names)

    def remove(self, path: str) -> None:
        self.ops.append(("delete", path))
        if path not in self._obj:
            raise FileNotFoundError(path)
        del self._obj[path]
        self._mtime.pop(path, None)

    def makedirs(self, path: str) -> None:  # object stores have no dirs
        return None

    def mtime(self, path: str) -> float:
        try:
            return self._mtime[path]
        except KeyError:
            raise FileNotFoundError(path) from None
