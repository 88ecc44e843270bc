"""Per-process scratch root for roundtrip rows (ADVICE r13 #3).

Every Delta/stream roundtrip query materialises a table under a temp
dir at query-construction time and reads it back lazily at execution
time, so the dir must outlive the call — but before this helper each
invocation leaked one ``tempfile.mkdtemp`` dir per run (bench runs each
roundtrip 3x per set, so dirs accumulated across rounds).

``scratch_dir`` parents every such dir under ONE per-process root that
is removed at interpreter exit via ``atexit`` — the earliest point at
which no lazily-evaluated DataFrame can still need the files.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str = "mm_") -> str:
    """mkdtemp under a shared per-process root that self-cleans at exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="mm_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
