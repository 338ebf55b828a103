"""Per-session scratch directories under the system temp root.

Several certification queries materialize small throwaway stores (the
K2 append-only depth table, the streaming-ingest corpus, the S13 seed
CSV) keyed by the Spark ``applicationId`` so concurrent harness
processes never share a root. The flip side of per-session keying is
that dead sessions leave their roots behind; ``session_scratch_dir``
both hands out the current session's root and sweeps stale siblings,
bounding the debris at roughly one day's sessions.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

# Old enough that no live session can still own it (rounds run ~10 h),
# young enough that /tmp never accumulates more than a day of debris.
STALE_AFTER_S = 24 * 3600.0


def session_scratch_dir(spark, family: str, *parts: str) -> str:
    """Return ``$TMPDIR/<family>/<applicationId>/<parts...>`` (not created),
    first removing sibling session roots older than ``STALE_AFTER_S``.

    The age guard is what makes the sweep safe against a CONCURRENT
    session on the same box: a live sibling's root is hours old at most
    and is left alone; only roots no process can still own are reclaimed.
    """
    root = os.path.join(tempfile.gettempdir(), family)
    app = spark.sparkContext.applicationId
    if os.path.isdir(root):
        cutoff = time.time() - STALE_AFTER_S
        for entry in os.listdir(root):
            p = os.path.join(root, entry)
            try:
                if entry != app and os.path.isdir(p) and os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # raced with another sweeper; the loser just moves on
    # heartbeat: a directory's mtime only moves when direct children
    # change, so a long-lived session writing in nested subdirs would age
    # past the cutoff and get swept by a concurrent sibling — touch the
    # owning root on every call to keep it visibly alive
    own = os.path.join(root, app)
    try:
        os.utime(own)
    except OSError:
        pass  # not created yet; the first writer stamps a fresh mtime
    return os.path.join(own, *parts)


def corpus_key(sf_dir: str) -> str:
    """Stable per-corpus key: ``<basename>-<sha256(realpath)[:16]>``.

    The basename keeps scratch roots human-readable; the full-resolved-path
    digest is the correctness part — two corpora sharing a basename
    (parallel checkouts, regenerated fixtures under different parents)
    must NEVER share a cached store/index. Every at-rest store and
    catalog-table name keyed by a corpus goes through this one helper so
    the discipline cannot silently diverge between queries.
    """
    import hashlib

    base = os.path.basename(sf_dir.rstrip("/"))
    digest = hashlib.sha256(os.path.realpath(sf_dir).encode("utf-8")).hexdigest()[:16]
    return f"{base}-{digest}"
