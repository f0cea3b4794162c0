"""Shared DuckDB-oracle environment policy for the tools/ scripts.

Two concerns, factored here so check_oracle.py and certify_staged.py
cannot desynchronize (ADVICE r10):

- ``clamped_mem_gb()``: the oracle memory ceiling. Default =
  min(40 GB, ~65% of physical RAM) — a flat 40 would RAISE DuckDB's
  ceiling above RAM on a <64 GB host (its own default is 80% of RAM)
  and reinstate the kernel-OOM risk the bound exists to prevent
  (ADVICE r9). ``SPARK_GRAFT_ORACLE_MEM_GB`` overrides, unclamped on
  purpose (a dedicated box may raise it).

- ``spill_dir(prefix)``: a per-PID spill directory (DuckDB does not
  support two instances sharing a temp_directory — concurrent sf
  certifications would corrupt each other's spill files, ADVICE r9),
  registered for removal at interpreter exit so aborted runs don't
  leak multi-GB spill files into TMPDIR (ADVICE r10).
"""

from __future__ import annotations

import atexit
import os
import shutil


def clamped_mem_gb() -> str:
    mem_env = os.environ.get("SPARK_GRAFT_ORACLE_MEM_GB")
    if mem_env is not None:
        return mem_env
    try:
        ram_gb = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) / (1 << 30)
        return str(max(1, min(40, int(ram_gb * 0.65))))
    except (ValueError, OSError):
        return "40"


def spill_dir(prefix: str) -> str:
    tmp = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"{prefix}_{os.getpid()}"
    )
    os.makedirs(tmp, exist_ok=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return tmp
