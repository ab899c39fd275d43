"""Index aliases: atomic name -> index indirection for zero-downtime
reindex (the Elasticsearch alias API / blue-green deployment shape).

An alias is a tiny JSON file ``{"index": "<abs index dir>"}``; consumers
open it anywhere an index path is accepted (``QueryEngine`` resolves it
in ``__init__``).  Swapping is ``os.replace`` of a same-directory temp
file — atomic on POSIX, so a reader either sees the old target or the
new one, never a partial file.  The serving rollover recipe:

    build_index(corpus, idx_green)            # new generation, offline
    alias.set_alias("prod.alias", idx_green)  # atomic cutover
    # idx_blue can be deleted once draining actors retire

Actors resolve the alias ONCE in ``__init__`` (index residency is per
actor), so a swap takes effect for newly constructed pools — exactly
Elasticsearch's search-context semantics, where in-flight contexts pin
the old segments.  Reference analogue: splade recreates its Milvus
collection in place (ingest.py drop/create); the alias keeps the old
generation queryable until the new one is cut in.
"""

from __future__ import annotations

import json
import os

# an alias chain longer than this is a config error, not a use case
_MAX_HOPS = 4


def set_alias(alias_path: str, index_dir: str) -> None:
    """Create or atomically repoint ``alias_path`` at ``index_dir``.

    The target must look like an index or another alias NOW — catching a
    typo at swap time, not at first query.  The temp file lands in the
    alias's own directory so ``os.replace`` never crosses filesystems.
    """
    index_dir = os.path.abspath(index_dir)
    if not (os.path.isfile(os.path.join(index_dir, "MANIFEST.json"))
            or _is_alias(index_dir)):
        raise ValueError(f"alias target {index_dir!r} is not an index "
                         f"(no MANIFEST.json) nor an alias")
    alias_path = os.path.abspath(alias_path)
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"index": index_dir}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, alias_path)


def read_alias(alias_path: str) -> str:
    with open(alias_path) as f:
        return json.load(f)["index"]


def _is_alias(path: str) -> bool:
    if not os.path.isfile(path):
        return False
    try:
        with open(path) as f:
            return isinstance(json.load(f).get("index"), str)
    except (ValueError, OSError, AttributeError):
        return False


def resolve_index(path: str) -> str:
    """Follow alias indirection(s) to a real index directory.

    A directory passes through untouched (the common case costs one
    isfile stat).  Chains of up to ``_MAX_HOPS`` aliases resolve (the
    +1 check below accepts the final non-alias target); longer ones —
    cycles — are refused loudly, naming the path the CALLER passed."""
    start = path
    for _ in range(_MAX_HOPS + 1):
        if not _is_alias(path):
            return path
        path = read_alias(path)
    raise ValueError(f"alias chain from {start!r} exceeds {_MAX_HOPS} "
                     f"hops (cycle?)")
