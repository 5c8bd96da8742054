"""Process-scoped scratch directories.

Gates that materialize intermediate parquet (result cache slices,
streaming checkpoint/work dirs) return DataFrames that lazily re-read
those files, so the directory cannot be removed before the caller
collects.  ``scratch_dir`` hands out a mkdtemp and registers ONE
atexit sweep for everything issued — repeated verify/bench sweeps in
one process reuse nothing but leak nothing once the process exits.
Gates whose result is materialized before returning (the maintenance
gates) should instead rmtree in a ``finally``.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ISSUED: list[str] = []


def _sweep() -> None:
    for d in _ISSUED:
        shutil.rmtree(d, ignore_errors=True)
    _ISSUED.clear()


atexit.register(_sweep)


def scratch_dir(prefix: str) -> str:
    """A temp directory removed at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _ISSUED.append(d)
    return d
