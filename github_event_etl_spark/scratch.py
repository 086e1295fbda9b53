"""Per-dataset scratch paths for materialize-once layouts.

Every ensure_*/replay face materializes derived files ONCE per source
dataset under the shared tempdir and trusts them on later calls. That
contract needs a scratch key with the same identity rule everywhere:
this module keys by the sf_dir's BASENAME (human-readable in `ls`)
plus a short hash of its canonical REALPATH — two datasets that share
a basename (e.g. `/a/sf0.01` and `/b/sf0.01`) get distinct scratch
trees instead of silently serving each other's materialized content.
`_GAPFILL_CACHE` (plans/queries_relational.py) keys realpath for the
same reason; this is the on-disk analog of that rule.

Shared caveat, inherited by every caller: the key is the PATH, not the
data. Regenerated files under an unchanged sf_dir still serve the old
layout for as long as the scratch files exist — use a distinct
directory per dataset (the TESTDATA sf-dir contract) or clear the
scratch tree.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def _tag_of(real: str) -> str:
    """Tag for an ALREADY-resolved realpath (lets scratch_dir resolve
    once for both components)."""
    return hashlib.sha1(real.encode("utf-8")).hexdigest()[:8]


def dataset_tag(sf_dir: str) -> str:
    """Stable 8-hex-char identity tag for a dataset directory, derived
    from its canonical realpath (symlinks resolved). Fold this into any
    name that must be unique per dataset — scratch paths below, and
    catalog TABLE names (which live in a global namespace and would
    otherwise collide across same-basename sf_dirs)."""
    return _tag_of(os.path.realpath(sf_dir))


def scratch_dir(sf_dir: str, *parts: str) -> str:
    """Scratch path `<tmp>/geetl_spark/<basename>-<tag>/<parts...>` for
    dataset `sf_dir`. BOTH components derive from the resolved
    realpath — basename included — so a symlink and its target (two
    spellings of one dataset) share one scratch tree instead of
    materializing every layout twice. Does not create the directory —
    parquet/json writers do; callers creating bare files mkdir
    themselves."""
    real = os.path.realpath(sf_dir)
    # A dataset path that resolves to '/' has no basename; fall back to
    # 'root' so the component stays `<something>-<tag>` readable rather
    # than a bare '-<tag>'.
    base = os.path.basename(real.rstrip("/")) or "root"
    return os.path.join(
        tempfile.gettempdir(),
        "geetl_spark",
        f"{base}-{_tag_of(real)}",
        *parts,
    )
