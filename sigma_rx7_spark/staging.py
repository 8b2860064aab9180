"""Cross-process staging discipline for deterministic index artifacts.

Several operators stage deterministic build artifacts to parquet under
``.staging/`` (trained IVF centroids, PQ codes, domain fixtures, the MV
rollup, the indexed-lineitem layout) so that (a) repeat probes read a
persisted index instead of re-running the build, and (b) the DuckDB
oracle reads the exact bytes the Spark plan consumed. Two process-safety
rules, learned from incidents:

1. **A COMPLETED staging is never overwritten** (round-5 incident: a
   concurrent session re-staged a path mid-read; the other process's
   already-planned scans failed with FAILED_READ_FILE on the vanished
   files). Completion = the ``_layout_v.txt`` marker holds the expected
   stamp AND every staged dir carries the ``_SUCCESS`` Hadoop committer
   file.

2. **A rebuild first invalidates the parent marker** (round-6 advice:
   for multi-subdir stagings the subdir ``overwrite`` does not delete
   the parent's marker, so between the first subdir rewrite and the
   final re-mark an old-version process saw a marker matching ITS stamp
   over half-rewritten subdirs — complete to it, mid-rebuild in fact).
   ``begin_staging`` writes a ``BUILDING`` sentinel to the marker before
   the first byte moves; no stamp ever equals the sentinel, so every
   process treats the staging as incomplete until ``mark_staged``
   restores a real stamp after the last part lands.

Stamps are DERIVED, not hand-maintained (round-6 advice: one shared
integer guarded four artifacts, and a forgotten bump on a builder change
would silently serve stale bytes): ``src_stamp`` hashes the *builder
functions' source* via ``inspect.getsource``, so any change to the code
that produces an artifact — including a changed constant inside the
function body — automatically invalidates prior stagings of exactly
that artifact. The cost of over-invalidation (a docstring edit forces
one rebuild) is deliberate: rebuilds are cheap and correct, stale bytes
are silent and wrong. Module-level constants a builder merely *reads*
(EMB_DIM, PQ_SUBS …) are not in the closure hash — pass them via
``extra`` when the artifact depends on them.
"""

from __future__ import annotations

import hashlib
import inspect
import os

_BUILDING = "BUILDING"  # sentinel: staging in progress, never a stamp


def src_stamp(*builders, extra: str = "") -> str:
    """12-hex digest of the builders' source (+ optional extra salt).

    Deterministic across processes and hosts for the same code revision
    (``inspect.getsource`` returns the literal file text), different
    whenever any builder's source changes — the automatic version bump.
    """
    h = hashlib.sha256()
    for b in builders:
        h.update(inspect.getsource(b).encode())
    if extra:
        h.update(b"\x00" + extra.encode())
    digest = h.hexdigest()[:12]
    assert digest != _BUILDING
    return digest


def staging_ok(path: str, stamp: str, *subdirs: str) -> bool:
    """True iff ``path`` holds a COMPLETED staging for ``stamp``: the
    marker matches (a BUILDING sentinel never does) and every staged
    dir has its _SUCCESS."""
    try:
        with open(os.path.join(path, "_layout_v.txt")) as fh:
            marker = fh.read().strip()
        # the sentinel matches NOTHING — not even a caller who passes
        # the literal string (src_stamp can't emit it, but a staging
        # mid-rebuild must never read as complete under any stamp)
        if marker == _BUILDING or marker != stamp:
            return False
    except OSError:
        return False
    return all(os.path.exists(os.path.join(path, d, "_SUCCESS"))
               for d in (subdirs or ("",)))


def begin_staging(path: str) -> None:
    """Invalidate ``path``'s marker BEFORE rewriting any staged bytes.

    Makes the mid-rebuild state unambiguous to every process and code
    version: the sentinel matches no stamp, so concurrent readers on
    ANY revision see "incomplete" until mark_staged lands. Must be
    called before the first subdir write of a multi-part staging."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_layout_v.txt"), "w") as fh:
        fh.write(_BUILDING)


def mark_staged(path: str, stamp: str) -> None:
    """Record ``stamp`` as the completed layout of ``path`` — only call
    after every staged part (and its _SUCCESS) is on disk."""
    with open(os.path.join(path, "_layout_v.txt"), "w") as fh:
        fh.write(stamp)
