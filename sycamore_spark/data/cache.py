"""Pluggable key-value caches for LLM completions and other memoizable
per-item work.

Reference parity: ``utils/cache.py`` — ``Cache`` base with hit/miss
counters (cache.py:37-66), ``DiskCache`` with file://-prefix stripping,
file-per-key JSON entries, mtime-touch-on-read, and newest-``max_ents``
LRU eviction (cache.py:126-190), ``S3Cache`` with lazy boto3 client,
``cached_at`` freshness check, and picklable wrapper (cache.py:201-260),
``NullCache`` (cache.py:282-291), and the ``cache_from_path`` scheme
dispatcher (cache.py:263-279).

Differences from the reference, on purpose:
- Disk writes are ATOMIC (tmp file in the same dir + ``os.replace``):
  many Spark tasks share one cache dir (executor-local disk or NFS), and
  the reference's plain ``open(...,"w")`` can expose torn JSON to a
  concurrent reader.
- ``S3Cache`` takes an injectable client factory — boto3 is not in this
  container, so the transport is an honestly-gated seam exactly like the
  DB connectors (``connectors.py``): construction works, first use
  without boto3 or an injected client raises with a clear message.
- No global mutex: each Spark task process has its own cache object; the
  atomicity that matters is cross-PROCESS and comes from ``os.replace``.

All cache values are JSON-serializable objects (the reference pickles
some values; JSON keeps entries inspectable and cross-version safe).
"""

from __future__ import annotations

import heapq
import json
import os
import tempfile
import time
from collections.abc import Callable
from typing import Any, Optional


class Cache:
    """get/set + hit/miss accounting (reference cache.py:37-66)."""

    def __init__(self) -> None:
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Any:
        raise NotImplementedError

    def set(self, key: str, value: Any) -> None:
        raise NotImplementedError

    def get_hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


def _strip_file_uri(loc: str) -> str:
    # reference cache.py:129-132: accept file:// URIs for the disk cache
    if loc.startswith("file://localhost/"):
        return loc[16:]  # keep the leading slash
    if loc.startswith("file:///"):
        return loc[7:]
    if loc.startswith("file:/") and not loc.startswith("file://"):
        # Hadoop-style single-slash URI (file:/tmp/x) as produced by
        # Path.toUri — materialize.py emits these; accept them too.
        return loc[5:]
    return loc


class DiskCache(Cache):
    """File-per-key JSON entries under a directory, bounded to the newest
    ``max_ents`` files by an amortized LRU sweep (reference
    cache.py:126-190: evict on construction and every ``max_ents//100``
    sets; reads ``os.utime`` the entry so mtime approximates LRU)."""

    def __init__(self, cache_loc: str, max_ents: int = 1000):
        super().__init__()
        self._cache_loc = _strip_file_uri(cache_loc)
        self._max_ents = max_ents
        self._every = max(1, max_ents // 100)
        self._sets = 0
        os.makedirs(self._cache_loc, exist_ok=True)
        # DELIBERATE deviation from the reference (cache.py:126 evicts on
        # construction too): the reference builds ONE long-lived cache per
        # process, but _cached_factory constructs one per Spark TASK — an
        # eager sweep would charge every task an O(max_ents) scandir+stat
        # on a (possibly shared-FS) directory before its first call. The
        # amortized set-path sweep below bounds the directory the same way.

    def _path(self, key: str) -> str:
        if os.sep in key or key in (".", ".."):
            raise ValueError(f"cache key must be a bare filename, got {key!r}")
        return os.path.join(self._cache_loc, key)

    def get(self, key: str) -> Any:
        fn = self._path(key)
        try:
            with open(fn, encoding="utf-8") as fp:
                val = json.load(fp)
            os.utime(fn)  # mtime = now; atime is unreliable (relatime mounts)
            self.hits += 1
            return val
        except (OSError, ValueError):
            # missing file OR torn/corrupt JSON both count as a miss; the
            # caller recomputes and set() overwrites the bad entry
            self.misses += 1
            return None

    def set(self, key: str, value: Any) -> None:
        fn = self._path(key)
        fd, tmp = tempfile.mkstemp(dir=self._cache_loc, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as fp:
                json.dump(value, fp)
            os.replace(tmp, fn)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        self._sets += 1
        if (self._sets % self._every) == 0:
            self.lru()

    def lru(self) -> None:
        """Delete all but the newest ``max_ents`` entries (reference
        cache.py:162-177 min-heap sweep: single pass, O(n log max_ents))."""
        heap: list[tuple[float, str]] = []
        heapified = False
        for rec in self._gen_entries():
            if len(heap) < self._max_ents:
                heap.append(rec)
            else:
                if not heapified:
                    heapq.heapify(heap)
                    heapified = True
                if rec[0] <= heap[0][0]:
                    _remove_file(os.path.join(self._cache_loc, rec[1]))
                else:
                    old = heapq.heappushpop(heap, rec)
                    _remove_file(os.path.join(self._cache_loc, old[1]))

    def _gen_entries(self):
        with os.scandir(self._cache_loc) as scan:
            for ent in scan:
                if ent.is_file(follow_symlinks=False) and not ent.name.endswith(".tmp"):
                    st = ent.stat(follow_symlinks=False)
                    yield (st.st_mtime, ent.name)

    def __reduce__(self):
        # picklable wrapper, not file handles (reference cache.py:187-190)
        return (DiskCache, (self._cache_loc, self._max_ents))


class S3Cache(Cache):
    """Object-per-key JSON entries under an s3:// prefix with an optional
    freshness window (reference cache.py:201-260). The boto3 client is
    built lazily on first use and never pickled (reference __reduce__);
    ``client_factory`` injects a fake transport for tests / containers
    without boto3."""

    def __init__(
        self,
        s3_path: str,
        freshness_in_seconds: int = -1,
        client_factory: Optional[Callable[[], Any]] = None,
    ) -> None:
        super().__init__()
        self._s3_path = s3_path
        self._freshness_in_seconds = freshness_in_seconds
        self._client_factory = client_factory
        self._client: Any = None

    def _bucket_and_key(self, key: str) -> tuple[str, str]:
        parts = self._s3_path.replace("s3://", "").replace("s3a://", "").strip("/").split("/", 1)
        return parts[0], f"{parts[1]}/{key}" if len(parts) == 2 else key

    def _ensure_client(self):
        if self._client is None:
            if self._client_factory is not None:
                self._client = self._client_factory()
            else:
                try:
                    import boto3  # type: ignore[import-not-found]
                except ImportError as e:  # honest gate: no S3 SDK in container
                    raise NotImplementedError(
                        "S3Cache needs boto3 (not installed) or an injected "
                        "client_factory"
                    ) from e
                self._client = boto3.client("s3")
        return self._client

    def get(self, key: str) -> Any:
        client = self._ensure_client()
        bucket, full_key = self._bucket_and_key(key)
        try:
            response = client.get_object(Bucket=bucket, Key=full_key)
        except Exception as e:  # noqa: BLE001 - NoSuchKey shape varies by SDK
            code = getattr(e, "response", {}).get("Error", {}).get("Code", "")
            if code in ("NoSuchKey", "404"):
                self.misses += 1
                return None
            raise
        content = json.loads(response["Body"].read())
        if (
            self._freshness_in_seconds >= 0
            and self._freshness_in_seconds + content.get("cached_at", 0) < time.time()
        ):
            self.misses += 1
            return None
        self.hits += 1
        return content["value"]

    def set(self, key: str, value: Any) -> None:
        client = self._ensure_client()
        bucket, full_key = self._bucket_and_key(key)
        body = json.dumps({"value": value, "cached_at": time.time()}, sort_keys=True)
        client.put_object(Body=body.encode("utf-8"), Bucket=bucket, Key=full_key)

    def __reduce__(self):
        return (S3Cache, (self._s3_path, self._freshness_in_seconds, self._client_factory))


class NullCache(Cache):
    """Always-miss cache (reference cache.py:282-291) — disables caching
    without changing call sites."""

    def get(self, key: str) -> Any:
        self.misses += 1
        return None

    def set(self, key: str, value: Any) -> None:
        pass


def cache_from_path(path: Optional[str]) -> Optional[Cache]:
    """Scheme dispatcher (reference cache.py:263-279): s3://|s3a:// →
    S3Cache, null:// → NullCache, file:// / absolute / existing dir →
    DiskCache (created if absolute and missing)."""
    if path is None:
        return None
    if path.startswith(("s3://", "s3a://")):
        return S3Cache(path)
    if path.startswith("null://"):
        return NullCache()
    if path.startswith("file:"):
        return DiskCache(path)
    if path.startswith("/") or os.path.isdir(path):
        return DiskCache(path)
    raise ValueError(
        f"Unable to interpret {path!r} as a cache path. Expected s3://, "
        "file://, null://, an absolute path, or an existing directory"
    )


def _remove_file(p: str) -> None:
    try:
        os.unlink(p)
    except OSError:
        pass
