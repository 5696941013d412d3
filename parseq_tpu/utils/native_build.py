"""Build-on-first-use cache for the in-tree C++ cores.

`ensure_built` compiles `src` to `so` with g++ and records a sha256 of the
source in a `<so>.srchash` sidecar; the .so is rebuilt whenever the sidecar
is missing or no longer matches the source. Content hashing (not mtime) is
what makes this correct across fresh git checkouts, where file mtimes are
set at checkout time and say nothing about staleness.
"""

from __future__ import annotations

import hashlib
import logging
import subprocess
from pathlib import Path

log = logging.getLogger(__name__)


def _src_hash(src: Path) -> str:
    return hashlib.sha256(src.read_bytes()).hexdigest()


def ensure_built(src: Path, so: Path, extra_flags=(), timeout=120) -> bool:
    """Compile src -> so if missing or stale. Returns True iff so is usable."""
    src, so = Path(src), Path(so)
    sidecar = so.with_suffix(so.suffix + '.srchash')
    want = _src_hash(src)
    if so.exists() and sidecar.exists() and sidecar.read_text().strip() == want:
        return True
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17',
           str(src), '-o', str(so), *extra_flags]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=timeout)
    except (OSError, subprocess.SubprocessError) as e:
        log.info(f'native build of {src.name} failed ({e!r})')
        return False
    sidecar.write_text(want)
    return True
