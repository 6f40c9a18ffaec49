"""Builders/runners for the native CLI tools shipped with the framework.

Currently one tool: ``results2csv`` (results2csv.cpp), the native
counterpart of the reference's src/results2csv.c. Built on first use with
g++ and cached in native/build/, like the BP oracle (oracle.py).
"""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "results2csv.cpp"
_BIN = _HERE / "build" / "results2csv"


def build_results2csv() -> Path:
    """Compile the native converter if missing/stale; return the binary path."""
    _BIN.parent.mkdir(exist_ok=True)
    if (not _BIN.exists()) or _SRC.stat().st_mtime > _BIN.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", str(_BIN), str(_SRC)],
            check=True, capture_output=True)
    return _BIN


_SELFTEST_SRC = _HERE / "bp_selftest.cpp"
_SELFTEST_BIN = _HERE / "build" / "bp_selftest"


def build_bp_selftest() -> Path:
    """Compile the standalone BP-kernel self-test (bp_selftest.cpp + the
    oracle translation unit) if missing/stale; return the binary path.

    The native counterpart of the reference kernel's __DEBUG__ BSC
    self-test main (ldpc_jossy/src/c_ldpc.c:404-449)."""
    deps = [_SELFTEST_SRC, _HERE / "bp_ref.cpp",
            _HERE / "bp_selftest_data.h"]
    _SELFTEST_BIN.parent.mkdir(exist_ok=True)
    if (not _SELFTEST_BIN.exists()) or any(
            s.stat().st_mtime > _SELFTEST_BIN.stat().st_mtime for s in deps):
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-o", str(_SELFTEST_BIN),
             str(_SELFTEST_SRC), str(_HERE / "bp_ref.cpp")],
            check=True, capture_output=True)
    return _SELFTEST_BIN


def run_bp_selftest() -> str:
    """Build + run the standalone self-test; returns its stdout (raises on
    a FAIL exit code)."""
    binary = build_bp_selftest()
    proc = subprocess.run([str(binary)], check=True, capture_output=True,
                          text=True)
    return proc.stdout


def results2csv_native(txt_path, csv_path: Optional[Path] = None) -> str:
    """Run the native converter on ``txt_path``; return the CSV text.

    Same contract as io.results.results_txt_to_csv(style="reference") —
    the two are tested byte-identical on the reference's archived data.
    """
    binary = build_results2csv()
    argv = [str(binary), str(txt_path)]
    if csv_path is not None:
        argv.append(str(csv_path))
        subprocess.run(argv, check=True, capture_output=True)
        return Path(csv_path).read_text()
    proc = subprocess.run(argv, check=True, capture_output=True, text=True)
    return proc.stdout
