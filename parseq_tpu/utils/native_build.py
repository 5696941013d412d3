"""Build-on-first-use cache for the in-tree C++ cores.

`ensure_built` compiles `src` to `so` with g++ and records a sha256 of the
source + compile command in a `<so>.srchash` sidecar; the .so is rebuilt
whenever the sidecar is missing or no longer matches. Content hashing (not
mtime) is what makes this correct across fresh git checkouts, where file
mtimes are set at checkout time and say nothing about staleness.

Concurrency: forked loader workers can hit the first build simultaneously
(configs default to data.num_workers=2), so the compile writes to a
pid-unique temp path and publishes with os.replace — losers overwrite the
winner's .so atomically with identical bytes; no partially-written library
is ever dlopen-able under the final name.
"""

from __future__ import annotations

import hashlib
import logging
import os
import subprocess
from pathlib import Path

log = logging.getLogger(__name__)


def _build_hash(src: Path, cmd: list[str]) -> str:
    h = hashlib.sha256(src.read_bytes())
    h.update('\0'.join(cmd).encode())
    return h.hexdigest()


def ensure_built(src: Path, so: Path, extra_flags=(), timeout=120) -> bool:
    """Compile src -> so if missing or stale. Returns True iff so is usable."""
    src, so = Path(src), Path(so)
    if not src.exists():
        log.info(f'native source {src} missing; using fallback path')
        return False
    sidecar = so.with_suffix(so.suffix + '.srchash')
    cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17',
           str(src), '-o', str(so), *extra_flags]
    want = _build_hash(src, cmd)
    try:
        if (so.exists() and sidecar.exists()
                and sidecar.read_text().strip() == want):
            return True
    except OSError:
        pass
    tmp_so = so.with_name(f'{so.name}.{os.getpid()}.tmp')
    tmp_sidecar = sidecar.with_name(f'{sidecar.name}.{os.getpid()}.tmp')
    build_cmd = cmd[:]
    build_cmd[build_cmd.index(str(so))] = str(tmp_so)
    try:
        subprocess.run(build_cmd, check=True, capture_output=True,
                       timeout=timeout)
        tmp_sidecar.write_text(want)
        os.replace(tmp_so, so)
        os.replace(tmp_sidecar, sidecar)
    except (OSError, subprocess.SubprocessError) as e:
        log.info(f'native build of {src.name} failed ({e!r})')
        for p in (tmp_so, tmp_sidecar):
            try:
                p.unlink(missing_ok=True)
            except OSError:
                pass
        return False
    return True
